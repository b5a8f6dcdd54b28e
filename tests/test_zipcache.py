"""zipcache: the stamp-guarded zipimporter.invalidate_caches must skip
re-parsing unchanged archives but still observe real changes (the only
event the upstream unconditional re-read exists for)."""

import os
import time
import zipfile
import zipimport

import pytest

from time_series_spark_spark import zipcache


@pytest.fixture
def patched():
    orig_method = zipimport.zipimporter.invalidate_caches
    orig_installed = zipcache._installed
    zipcache._installed = False
    zipcache.install()
    yield
    zipimport.zipimporter.invalidate_caches = orig_method
    zipcache._installed = orig_installed


def _make_zip(path, payload):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("zc_probe_mod.py", payload)


def test_unchanged_archive_skips_reread(tmp_path, patched):
    zp = str(tmp_path / "a.zip")
    _make_zip(zp, "x = 1\n")
    imp = zipimport.zipimporter(zp)
    imp.invalidate_caches()  # first call under the guard: re-reads + stamps
    files_after_first = imp._files
    imp.invalidate_caches()  # unchanged: must skip
    assert imp._files is files_after_first


def test_changed_archive_is_rereadd(tmp_path, patched):
    zp = str(tmp_path / "a.zip")
    _make_zip(zp, "x = 1\n")
    imp = zipimport.zipimporter(zp)
    imp.invalidate_caches()
    assert "zc_probe_new.py" not in {
        os.path.basename(k) for k in imp._files
    }
    # rewrite with an extra member; ensure the stat stamp moves even on
    # coarse-mtime filesystems by nudging mtime explicitly
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("zc_probe_mod.py", "x = 2\n")
        zf.writestr("zc_probe_new.py", "y = 3\n")
    st = os.stat(zp)
    os.utime(zp, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    imp.invalidate_caches()
    assert "zc_probe_new.py" in {os.path.basename(k) for k in imp._files}


def test_deleted_archive_falls_back_to_original(tmp_path, patched):
    zp = str(tmp_path / "a.zip")
    _make_zip(zp, "x = 1\n")
    imp = zipimport.zipimporter(zp)
    imp.invalidate_caches()
    os.remove(zp)
    # upstream drops the cache on ZipImportError; the guard must defer
    imp.invalidate_caches()
    assert imp._files == {}


def test_install_is_idempotent(patched):
    fn = zipimport.zipimporter.invalidate_caches
    zipcache.install()
    assert zipimport.zipimporter.invalidate_caches is fn


def test_not_installed_in_plain_driver_process():
    # this pytest process is not a pyspark worker
    assert not zipcache.in_pyspark_worker()
