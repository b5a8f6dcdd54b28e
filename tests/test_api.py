"""The public API façade (package __init__): every exported name
resolves to a callable in its implementing module, importing the
package alone stays cheap (no query-registry import), and a
representative operator works through the façade path."""

from __future__ import annotations

import subprocess
import sys


def test_every_api_name_resolves():
    import time_series_spark_spark as ts

    for name in ts.__all__:
        obj = getattr(ts, name)
        assert callable(obj), name


def test_package_import_does_not_load_query_registry():
    # fresh interpreter: importing the package must NOT pull in the
    # 200-query registry modules (lazy façade contract)
    code = (
        "import sys, time_series_spark_spark;"
        "bad = [m for m in sys.modules if 'queries' in m];"
        "print('LOADED', bad)"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "LOADED []" in out.stdout, out.stdout


def test_facade_operator_roundtrip(spark):
    import datetime as dt

    from time_series_spark_spark import ewma

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", t0 + dt.timedelta(days=i), float(i)) for i in range(5)],
        "key string, ds timestamp, y double",
    )
    out = ewma(df, ["key"], "ds", "y", alpha=0.5).collect()
    assert len(out) == 5
