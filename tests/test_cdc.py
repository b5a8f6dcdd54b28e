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


def test_scd2_intervals_runs_and_null_boundary(spark):
    """M3: runs collapse to one interval each, valid_to chains to the
    next run's valid_from, the open run is current, and a NULL attr on
    a key's first event still opens a run (boundary detected via
    lag(ts), not lag(attr))."""
    import datetime as dt

    from time_series_spark_spark.operators.cdc import scd2_intervals

    base = dt.datetime(2024, 1, 1)

    def ts(h):
        return base + dt.timedelta(hours=h)

    rows = [
        (1, ts(0), 1, "A"), (1, ts(1), 2, "A"), (1, ts(2), 3, "B"),
        (1, ts(3), 4, "B"), (1, ts(4), 5, "A"),
        (2, ts(0), 6, None), (2, ts(1), 7, None), (2, ts(2), 8, "X"),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, event_id long, state string"
    )
    out = sorted(
        scd2_intervals(df, ["k"], "ts", ["state"], "event_id").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    k1 = [r for r in out if r.k == 1]
    assert [(r.state, r.n_events, r.is_current) for r in k1] == [
        ("A", 2, False), ("B", 2, False), ("A", 1, True),
    ]
    assert k1[0].valid_to == k1[1].valid_from == ts(2)
    assert k1[2].valid_to is None
    k2 = [r for r in out if r.k == 2]
    assert [(r.state, r.n_events) for r in k2] == [(None, 2), ("X", 1)]
    assert k2[0].valid_from == ts(0)  # NULL first-run opened correctly


def test_scd2_single_exchange_plan(spark):
    """All four SCD2 steps must share one hash(keys) partitioning — a
    second Exchange would reshuffle the full event log at 100 TB."""
    from time_series_spark_spark.operators.cdc import scd2_intervals
    from time_series_spark_spark.plans.audit import count_op
    from time_series_spark_spark.sources.io import load

    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    out = scd2_intervals(ev, ["user_id"], "ts", ["event_type"], "event_id")
    assert count_op(out, "Exchange") == 1


def test_pit_join_boundary_semantics(spark):
    """M4: a fact at exactly valid_from belongs to the NEW interval
    (half-open [from, to)), facts before any interval get NULL, facts
    after the last change hit the open current interval, and every fact
    matches at most one version."""
    import datetime as dt

    from time_series_spark_spark.operators.cdc import pit_join, scd2_intervals

    base = dt.datetime(2024, 1, 1)

    def ts(h):
        return base + dt.timedelta(hours=h)

    events = spark.createDataFrame(
        [(1, ts(10), 1, "A"), (1, ts(20), 2, "B"), (1, ts(30), 3, "C")],
        "k long, ts timestamp, event_id long, state string",
    )
    dim = scd2_intervals(events, ["k"], "ts", ["state"], "event_id")
    facts = spark.createDataFrame(
        [(1, ts(5)), (1, ts(10)), (1, ts(20)), (1, ts(25)), (1, ts(99))],
        "k long, fts timestamp",
    )
    out = {r.fts: r.state for r in pit_join(facts, dim, "k", "fts").collect()}
    assert len(out) == 5  # exactly one row per fact
    assert out[ts(5)] is None
    assert out[ts(10)] == "A"   # boundary: new interval
    assert out[ts(20)] == "B"
    assert out[ts(25)] == "B"
    assert out[ts(99)] == "C"   # open current interval


def test_incremental_join_delta_equals_recompute(spark):
    """Delta-rule maintenance reproduces the full inner join as a
    multiset, for an arbitrary (non-key-aligned) split with duplicate
    join keys on both sides."""
    from time_series_spark_spark.operators.cdc import incremental_join_delta

    l = spark.createDataFrame(
        [(k, f"l{i}") for i, k in enumerate([1, 1, 2, 3, 4, 4, 5])],
        "k long, lv string",
    )
    r = spark.createDataFrame(
        [(k, f"r{i}") for i, k in enumerate([1, 2, 2, 4, 5, 5, 6])],
        "k long, rv string",
    )
    l_old, l_new = l.filter("lv < 'l4'"), l.filter("lv >= 'l4'")
    r_old, r_new = r.filter("rv < 'r3'"), r.filter("rv >= 'r3'")
    full = l.join(r, "k")
    j_old = l_old.join(r_old, "k")
    inc = j_old.unionByName(
        incremental_join_delta(l_old, l_new, r_old, r_new, ["k"]).select(
            j_old.columns
        )
    )
    assert inc.exceptAll(full).count() == 0
    assert full.exceptAll(inc).count() == 0


def test_versioned_table_isolation_and_time_travel(spark, tmp_path):
    """A13: (1) versions are immutable — as-of reads return each commit
    exactly; (2) an uncommitted write (data files without a manifest) is
    INVISIBLE to readers; (3) the latest pointer tracks the last commit;
    (4) reading a never-committed version raises."""
    import os

    import pyspark.sql.functions as F
    import pytest as _pytest

    from time_series_spark_spark.sources.io import (
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    df = spark.range(100).withColumn("x", F.col("id") * 2)
    assert write_versioned(df.filter("id < 10"), path) == 0
    assert write_versioned(df.filter("id < 50"), path) == 1
    assert read_versioned(spark, path, as_of=0).count() == 10
    assert read_versioned(spark, path, as_of=1).count() == 50
    assert read_versioned(spark, path).count() == 50

    # crash simulation: data files land but the manifest never publishes
    df.write.mode("overwrite").parquet(os.path.join(path, "v=2"))
    assert read_versioned(spark, path).count() == 50  # still version 1
    with _pytest.raises(ValueError):
        read_versioned(spark, path, as_of=2)
    # the next commit supersedes the orphaned files atomically
    assert write_versioned(df, path) == 2
    assert read_versioned(spark, path).count() == 100


def test_incremental_agg_merge_equals_recompute(spark):
    """M6: merge-path ≡ recompute-path, including keys present only in
    the old view and only in the delta."""
    from pyspark.sql import functions as F

    from time_series_spark_spark.operators.cdc import incremental_agg_merge

    old_rows = [("a", 1, 10), ("a", 1, 20), ("b", 2, 5)]
    new_rows = [("a", 1, 7), ("c", 3, 100)]
    base = spark.createDataFrame(old_rows, ["k", "g", "v"])
    delta = spark.createDataFrame(new_rows, ["k", "g", "v"])

    def roll(df):
        return df.groupBy("k", "g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    merged = incremental_agg_merge(roll(base), roll(delta), ["k", "g"], ["n", "s"])
    full = roll(base.unionByName(delta))
    got = {(r["k"], r["g"]): (r["n"], r["s"]) for r in merged.collect()}
    exp = {(r["k"], r["g"]): (r["n"], r["s"]) for r in full.collect()}
    assert got == exp
    assert got[("b", 2)] == (1, 5)    # old-only key survives
    assert got[("c", 3)] == (1, 100)  # delta-only key appears


def test_merkle_bucket_diff_flags_exactly_touched_buckets(spark):
    """M7: identical tables -> zero flagged buckets; one modified row ->
    exactly that row's bucket flips; counts guard catches deletes."""
    from pyspark.sql import functions as F

    def fp_sum(df):
        fp = (
            "CAST(conv(substring(md5(concat(CAST(k AS STRING), '|', "
            "CAST(v AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        return (
            df.withColumn("bucket", F.col("k") % 8)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"), F.expr(f"bit_xor({fp})").alias("x"))
        )

    rows = [(i, i * 10) for i in range(100)]
    a = spark.createDataFrame(rows, ["k", "v"])
    b_same = spark.createDataFrame(list(rows), ["k", "v"])
    sa = {r["bucket"]: (r["n"], r["x"]) for r in fp_sum(a).collect()}
    sb = {r["bucket"]: (r["n"], r["x"]) for r in fp_sum(b_same).collect()}
    assert sa == sb
    # modify row k=42 (bucket 2)
    rows_mod = [(k, v if k != 42 else v + 1) for k, v in rows]
    sm = {r["bucket"]: (r["n"], r["x"]) for r in fp_sum(
        spark.createDataFrame(rows_mod, ["k", "v"])
    ).collect()}
    flipped = [bkt for bkt in sa if sa[bkt] != sm[bkt]]
    assert flipped == [42 % 8]
    # delete a row whose fingerprint XORs out: count guard still catches
    rows_del = [r for r in rows if r[0] != 7]
    sd = {r["bucket"]: (r["n"], r["x"]) for r in fp_sum(
        spark.createDataFrame(rows_del, ["k", "v"])
    ).collect()}
    assert sd[7 % 8][0] == sa[7 % 8][0] - 1


def test_merkle_registered_query_flags_known_changes(spark):
    from time_series_spark_spark.queries import REGISTRY

    rows = REGISTRY["orders_merkle_bucket_diff"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 128
    # the CDC snapshots differ by construction -> some buckets flagged,
    # and with ~1200 orders every bucket holds changed keys
    assert any(r["differs"] == 1 for r in rows)


def test_version_change_feed_laws(spark):
    """M8: CDF op counts match the snapshot construction (N/5 each) and
    the net revenue delta reconciles rev(v1) - rev(v0)."""
    from pyspark.sql import functions as F

    import time_series_spark_spark.queries as reg
    from time_series_spark_spark.queries_cdc import (
        _new_snapshot,
        _old_snapshot,
    )
    from time_series_spark_spark.sources.io import load

    sf = "/root/testdata/sf0.001"
    rows = {r["op"]: r for r in reg.REGISTRY["orders_version_change_feed"]
            .fn(spark, sf).collect()}
    n = load(spark, sf, "orders").count()
    assert set(rows) == {"insert", "delete", "update"}
    assert rows["insert"]["n_rows"] == n // 5
    assert rows["delete"]["n_rows"] == n // 5
    assert rows["update"]["n_rows"] == n // 5
    rev = lambda df: df.agg(F.sum("price_cents")).collect()[0][0]
    delta = rev(_new_snapshot(spark, sf)) - rev(_old_snapshot(spark, sf))
    assert sum(r["net_cents_delta"] for r in rows.values()) == delta


def test_change_feed_across_optimize_is_empty(spark, tmp_path):
    """M8 × A13l (round 13): a dataChange=false OPTIMIZE commit changes
    the layout, not the data — the snapshot diff between the
    pre-compaction and post-compaction versions is EMPTY, so the change
    feed surface is optimize-correct by construction (Delta's CDF skips
    dataChange=false files the same way)."""
    from time_series_spark_spark.operators.cdc import snapshot_diff
    from time_series_spark_spark.sources.io import (
        compact_versioned,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "vt")
    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_versioned(df.repartition(8), path)
    rep = compact_versioned(spark, path, target_file_bytes=1 << 30)
    assert rep["version"] == 1
    v0 = read_versioned(spark, path, as_of=0)
    v1 = read_versioned(spark, path, as_of=1)
    assert snapshot_diff(v0, v1, ["k"], ["v"]).count() == 0
