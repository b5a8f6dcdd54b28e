"""Self-test for the dtype-strict oracle harness: the round-3 failures
were invisible precisely because the old harness coerced ints to floats,
so the comparator itself needs regression cover — it must FAIL on the
divergence classes the driver fails on, and PASS on the normalizations
the driver tolerates (calibrated against driver-green queries)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import compare, duck_connect  # noqa: E402


@pytest.fixture(scope="module")
def duck():
    con = duck_connect()
    yield con
    con.close()


def _run(spark, duck, fn, sql):
    return compare(spark, duck, "self-test", fn, sql, verbose=False)


def test_harness_passes_on_identical_results(spark, duck):
    fn = lambda s, d: s.range(3).select(F.col("id").alias("x"))
    assert _run(spark, duck, fn, "SELECT range AS x FROM range(3)")


def test_harness_fails_on_int_vs_float_kind(spark, duck):
    """The round-3 HUGEINT→float64 class: equal VALUES, different kind —
    must fail (the driver's hash does)."""
    fn = lambda s, d: s.range(3).select(F.col("id").alias("x"))
    assert not _run(
        spark, duck, fn, "SELECT CAST(range AS DOUBLE) AS x FROM range(3)"
    )


def test_harness_fails_on_value_diff(spark, duck):
    fn = lambda s, d: s.range(3).select(F.col("id").alias("x"))
    assert not _run(
        spark, duck, fn, "SELECT range + 1 AS x FROM range(3)"
    )


def test_harness_fails_on_rowcount_and_schema(spark, duck):
    fn = lambda s, d: s.range(3).select(F.col("id").alias("x"))
    assert not _run(spark, duck, fn, "SELECT range AS x FROM range(4)")
    assert not _run(spark, duck, fn, "SELECT range AS y FROM range(3)")


def test_harness_tolerates_integer_width(spark, duck):
    """int32 vs int64 width: NOT a driver mismatch (window_running_rev
    etc. driver-green with Spark int32 ranks) — must pass."""
    fn = lambda s, d: s.range(3).select(F.col("id").cast("int").alias("x"))
    assert _run(spark, duck, fn, "SELECT range AS x FROM range(3)")


def test_harness_tolerates_datetime_unit(spark, duck):
    """Spark datetime64[ns] vs DuckDB [us]: NOT a driver mismatch
    (events_hourly, asof_* driver-green) — must pass."""
    fn = lambda s, d: s.sql(
        "SELECT timestamp'2024-01-01 00:00:00' AS t UNION ALL "
        "SELECT timestamp'2024-01-02 00:00:00'"
    )
    assert _run(
        spark,
        duck,
        fn,
        "SELECT CAST('2024-01-01' AS TIMESTAMP) AS t UNION ALL "
        "SELECT CAST('2024-01-02' AS TIMESTAMP)",
    )


def test_harness_flags_unhashable_cells(spark, duck):
    """Array cells crash the driver canonicalizer (round-3
    docs_multimodal_features ERR) — the harness must fail, not pass."""
    fn = lambda s, d: s.range(2).select(F.array(F.col("id")).alias("a"))
    assert not _run(
        spark, duck, fn, "SELECT [range] AS a FROM range(2)"
    )
