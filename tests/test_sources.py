"""A19 parquet layout audit: the distributed footer reader and the
flag semantics that feed the A17 compaction/maintenance story."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def test_parquet_layout_report_multifile_and_flag(spark, tmp_path):
    """(1) one output row per (file, row group), counts exact across a
    multi-file directory with heterogeneous layouts; (2) the
    one-giant-row-group defect (the round-9 100x lesson) is visible as
    a single group carrying all rows; (3) byte sizes are positive and
    the report is footer-only (runs in milliseconds on files whose data
    pages would take far longer)."""
    from time_series_spark_spark.sources.io import parquet_layout_report

    good = tmp_path / "good.parquet"
    bad = tmp_path / "bad.parquet"
    pq.write_table(
        pa.table({"x": list(range(10_000))}), good, row_group_size=1_000
    )
    pq.write_table(
        pa.table({"x": list(range(10_000))}), bad  # default: ONE group
    )
    rep = parquet_layout_report(
        spark, str(tmp_path / "*.parquet")
    ).toPandas()

    g = rep[rep["path"].str.endswith("good.parquet")]
    b = rep[rep["path"].str.endswith("bad.parquet")]
    assert len(g) == 10 and set(g["n_rows"]) == {1_000}
    assert list(g.sort_values("group_idx")["group_idx"]) == list(range(10))
    assert len(b) == 1 and int(b["n_rows"].iloc[0]) == 10_000
    assert (rep["n_bytes"] > 0).all()
    # per-file totals reconcile with the footers' own row counts
    assert g["n_rows"].sum() == 10_000 and b["n_rows"].sum() == 10_000

    # the maintenance predicate a pipeline alerts on: a file whose max
    # row-group row share is ~1.0 cannot parallelize
    share = b["n_rows"].max() / b["n_rows"].sum()
    assert share == 1.0
    assert g["n_rows"].max() / g["n_rows"].sum() == 0.1


def test_parquet_layout_report_distributed_shape(spark, tmp_path):
    """The file list fans out across tasks (mapInPandas over a
    repartitioned path frame) — no driver-side footer loop."""
    from time_series_spark_spark.sources.io import parquet_layout_report

    paths = []
    for i in range(8):
        p = tmp_path / f"f{i}.parquet"
        pq.write_table(pa.table({"x": list(range(100 * (i + 1)))}), p)
        paths.append(str(p))
    rep = parquet_layout_report(spark, paths)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    got = {
        r["path"].rsplit("/", 1)[-1]: r["n_rows"]
        for r in rep.collect()
    }
    assert got == {f"f{i}.parquet": 100 * (i + 1) for i in range(8)}


def test_compaction_heals_one_row_group_layout(spark, tmp_path):
    """A17 ∘ A19: the audit's flag predicate and the fix compose — a
    directory whose single file is ONE giant row group (scan
    parallelism 1) is rewritten by compact_parquet into multiple
    right-sized files, each its own splittable unit, and the audit
    verifies the heal with zero data loss."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from time_series_spark_spark.sources.io import (
        compact_parquet,
        parquet_layout_report,
    )

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(  # the round-9 defect: one file, one giant group
        pa.table({"x": list(range(50_000))}),
        src / "blob.parquet",
    )
    before = parquet_layout_report(
        spark, str(src / "*.parquet")
    ).toPandas()
    assert len(before) == 1  # 1 file x 1 group -> 1 scan task, flagged
    assert before["n_rows"].max() / before["n_rows"].sum() == 1.0

    dst = str(tmp_path / "dst")
    stats = compact_parquet(spark, str(src), dst, target_file_bytes=64 * 1024)
    after = parquet_layout_report(spark, f"{dst}/*.parquet").toPandas()
    # multiple independent splittable units now, same rows
    assert after["path"].nunique() > 1
    assert int(after["n_rows"].sum()) == 50_000
    assert after.groupby("path")["n_rows"].sum().max() < 50_000
    assert spark.read.parquet(dst).count() == 50_000
    assert stats["n_files_after"] == after["path"].nunique()


def test_versioned_table_through_subtree_filesystem(spark, tmp_path):
    """The fsio seam (round 10): the WHOLE A13 family — write (replace +
    carry-forward), time travel, OPTIMIZE, VACUUM + retention floor,
    and the (stream_id, batch_id) ledger — runs against a NON-DEFAULT
    pyarrow filesystem. A SubTreeFileSystem re-roots every storage call:
    if any code path bypassed the seam (a stray os/glob/open), it would
    look at the wrong directory and this test would see missing
    manifests or files."""
    from pyarrow import fs as pafs

    from time_series_spark_spark.sources.fsio import TableFS
    from time_series_spark_spark.sources.io import (
        committed_batch_ids,
        compact_versioned,
        read_versioned,
        retention_floor,
        vacuum_versioned,
        write_versioned,
    )

    base = tmp_path / "store"
    base.mkdir()
    sub = pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())
    # manifest I/O goes through the subtree FS (root-relative path);
    # Spark addresses the same directory via the composed local path
    tfs = TableFS("vt", filesystem=sub, spark_root=str(base / "vt"))

    assert write_versioned(spark.range(4).selectExpr("id"), tfs) == 0
    assert (
        write_versioned(
            spark.range(4, 6).selectExpr("id"),
            tfs,
            carry_forward=True,
            batch_id=0,
            stream_id="s1",
        )
        == 1
    )
    # every storage artifact landed under the SUBTREE root
    assert (base / "vt" / "_manifest.0.json").exists()
    assert (base / "vt" / "_manifest.1.json").exists()
    assert read_versioned(spark, tfs).count() == 6
    assert read_versioned(spark, tfs, as_of=0).count() == 4
    assert committed_batch_ids(tfs, "s1") == {0}

    stats = compact_versioned(spark, tfs, target_file_bytes=1 << 30)
    assert stats["version"] == 2 and stats["n_files_after"] >= 1
    assert read_versioned(spark, tfs).count() == 6

    vac = vacuum_versioned(tfs, keep_last=1)
    assert vac["floor"] == 2 == retention_floor(tfs)
    assert read_versioned(spark, tfs).count() == 6  # latest unaffected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="retention floor"):
        read_versioned(spark, tfs, as_of=0)
    # the ledger survives vacuum (manifests are kept)
    assert committed_batch_ids(tfs, "s1") == {0}
