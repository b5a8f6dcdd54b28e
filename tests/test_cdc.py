"""CDC operator semantics (operators/cdc.py): NULL-safe classification and
the diff→merge round-trip identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_spark_spark.operators.cdc import apply_changes, snapshot_diff
from time_series_spark_spark.sources.io import from_rows

SCHEMA = "k int, v string, n int"


def test_diff_classifies_null_transitions(spark):
    """NULL→value and value→NULL are UPDATES (eqNullSafe), a NULL-valued
    insert/delete still classifies by key presence, and unchanged rows —
    including ones whose compared values are both NULL — are dropped."""
    old = from_rows(
        spark,
        [(1, "a", 10), (2, None, 20), (3, "c", None), (4, None, None)],
        SCHEMA,
    )
    new = from_rows(
        spark,
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, None, 50)],
        SCHEMA,
    )
    rows = {
        r.k: r.op
        for r in snapshot_diff(old, new, ["k"], ["v", "n"]).collect()
    }
    assert rows == {
        2: "update",  # NULL -> 'b'
        3: "update",  # NULL -> 30
        4: "delete",  # all-NULL values, classified by key
        5: "insert",  # NULL-valued insert
    }  # k=1 unchanged -> absent


def test_merge_roundtrip_identity(spark):
    """apply_changes(old, snapshot_diff(old, new)) == new exactly."""
    old = from_rows(
        spark,
        [(1, "a", 10), (2, None, 20), (3, "c", None), (4, None, None)],
        SCHEMA,
    )
    new = from_rows(
        spark,
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, None, 50)],
        SCHEMA,
    )
    merged = apply_changes(
        old, snapshot_diff(old, new, ["k"], ["v", "n"]), ["k"], ["v", "n"]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_diff_single_shuffle_plan(spark):
    """The diff is ONE co-partitioned join: exactly two exchanges (one per
    side) and one join operator, nothing downstream reshuffles."""
    from time_series_spark_spark.plans.audit import executed_plan

    old = from_rows(spark, [(i, "x", i) for i in range(100)], SCHEMA)
    new = from_rows(spark, [(i, "y", i) for i in range(100)], SCHEMA)
    plan = executed_plan(snapshot_diff(old, new, ["k"], ["v", "n"]))
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1
