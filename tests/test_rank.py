"""operators/rank.py — scale-safe exact global order statistics.

Every helper must be BIT-IDENTICAL to the single-task global window it
replaces (that is what lets the six rewritten queries keep their DuckDB
oracles unchanged), while its plan funnels no row-scale frame through a
single-partition exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from time_series_spark_spark.operators.rank import (
    global_cummax,
    global_cumsum,
    global_lag_gaps,
    global_rank,
    ntile_expr,
)
from time_series_spark_spark.plans.audit import (
    rowscale_single_partition_exchanges,
)


def _toy(spark, n=500, seed=7):
    """Deterministic frame with heavy ties in v and a unique key."""
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.hash(F.col("id") + seed) % 17).alias("v"),
        (F.hash(F.col("id") * 3 + seed) % 1000).cast("long").alias("w"),
    )


def test_global_rank_matches_single_task_window(spark):
    df = _toy(spark)
    got = (
        global_rank(df, [("v", True), ("k", True)], "rnk", total_col="n",
                    num_partitions=7)
        .orderBy("k")
        .collect()
    )
    want = (
        df.withColumn("rnk", F.row_number().over(Window.orderBy("v", "k")))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["rnk"], r["n"]) for r in got] == [
        (r["k"], r["rnk"], r["n"]) for r in want
    ]


def test_global_rank_desc_order(spark):
    df = _toy(spark, n=200)
    got = (
        global_rank(df, [("v", False), ("k", True)], "rnk", num_partitions=5)
        .orderBy("k")
        .collect()
    )
    want = (
        df.withColumn(
            "rnk", F.row_number().over(Window.orderBy(F.desc("v"), F.asc("k")))
        )
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["rnk"]) for r in got] == [
        (r["k"], r["rnk"]) for r in want
    ]


def test_global_cumsum_matches_rows_frame_window(spark):
    df = _toy(spark)
    got = (
        global_cumsum(df, [("v", True), ("k", True)], ["w"], num_partitions=7)
        .orderBy("k")
        .collect()
    )
    w = (
        Window.orderBy("v", "k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("w", F.sum("w").over(w)).orderBy("k").collect()
    assert [(r["k"], r["w"]) for r in got] == [(r["k"], r["w"]) for r in want]


def test_global_cumsum_distinct_reduce_gives_range_ecdf(spark):
    """The documented RANGE-frame recipe: pre-reduce to distinct keys,
    then ROWS ≡ RANGE — the exact pooled-ECDF shape events_ks_two_sample
    is built on."""
    df = _toy(spark)
    per_v = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    got = (
        global_cumsum(per_v, [("v", True)], ["c"], num_partitions=5)
        .orderBy("v")
        .collect()
    )
    want = (
        df.select("v", F.lit(1).alias("one"))
        .withColumn("c", F.sum("one").over(Window.orderBy("v")))
        .groupBy("v")
        .agg(F.max("c").alias("c"))
        .orderBy("v")
        .collect()
    )
    assert [(r["v"], r["c"]) for r in got] == [(r["v"], r["c"]) for r in want]


def test_global_cummax_matches_window(spark):
    df = _toy(spark)
    got = (
        global_cummax(df, [("k", True)], ["w"], num_partitions=7)
        .orderBy("k")
        .collect()
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("w", F.max("w").over(w)).orderBy("k").collect()
    assert [(r["k"], r["w"]) for r in got] == [(r["k"], r["w"]) for r in want]


def test_global_lag_gaps_matches_lag_window(spark):
    # sparse unique ids with gaps of assorted sizes
    df = spark.range(2000).select(
        (F.col("id") * 7 % 4096).alias("event_id")
    ).distinct().filter(F.col("event_id") % 5 != 0)
    got = sorted(
        (r["prev_id"], r["event_id"])
        for r in global_lag_gaps(df, "event_id", num_partitions=9).collect()
    )
    s = df.withColumn(
        "prev_id", F.lag("event_id").over(Window.orderBy("event_id"))
    ).filter(
        F.col("prev_id").isNotNull()
        & (F.col("event_id") - F.col("prev_id") > 1)
    )
    want = sorted((r["prev_id"], r["event_id"]) for r in s.collect())
    assert got == want and len(got) > 50


@pytest.mark.parametrize("n,k", [(500, 4), (500, 5), (3, 5), (17, 4), (1, 3)])
def test_ntile_expr_matches_spark_ntile(spark, n, k):
    df = _toy(spark, n=n)
    got = (
        global_rank(df, [("v", True), ("k", True)], "rnk", total_col="n",
                    num_partitions=4)
        .select("k", ntile_expr(F.col("rnk"), F.col("n"), k).alias("q"))
        .orderBy("k")
        .collect()
    )
    want = (
        df.select(
            "k", F.ntile(k).over(Window.orderBy("v", "k")).alias("q")
        )
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["q"]) for r in got] == [
        (r["k"], r["q"]) for r in want
    ]


def test_rank_plan_has_no_rowscale_single_partition_exchange(spark, tmp_path):
    """The whole point: the construction must not funnel the row-scale
    frame through one task. (A parquet source is used so the audit's
    scan detector sees a real file scan.)"""
    p = str(tmp_path / "t.parquet")
    _toy(spark, n=1000).write.parquet(p)
    df = spark.read.parquet(p)
    out = global_rank(df, [("v", True), ("k", True)], "rnk", total_col="n",
                      num_partitions=4)
    assert rowscale_single_partition_exchanges(out) == []
    # and the audit DOES flag the single-task shape it replaces
    naive = df.withColumn(
        "rnk", F.row_number().over(Window.orderBy("v", "k"))
    )
    assert rowscale_single_partition_exchanges(naive) != []


def test_grouped_rank_matches_partitioned_window(spark):
    df = _toy(spark, n=400).withColumn("g", F.col("k") % 3)
    from time_series_spark_spark.operators.rank import grouped_rank

    got = (
        grouped_rank(df, ["g"], [("v", True), ("k", True)], "rnk",
                     total_col="n", num_partitions=5)
        .orderBy("k")
        .collect()
    )
    w = Window.partitionBy("g").orderBy("v", "k")
    wg = Window.partitionBy("g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    want = (
        df.withColumn("rnk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wg))
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["rnk"], r["n"]) for r in got] == [
        (r["k"], r["rnk"], r["n"]) for r in want
    ]


def test_grouped_cumsum_matches_partitioned_window(spark):
    df = _toy(spark, n=400).withColumn("g", F.col("k") % 3)
    from time_series_spark_spark.operators.rank import grouped_cumsum

    got = (
        grouped_cumsum(df, ["g"], [("v", True), ("k", True)], ["w"],
                       num_partitions=5)
        .orderBy("k")
        .collect()
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v", "k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("w", F.sum("w").over(w)).orderBy("k").collect()
    assert [(r["k"], r["w"]) for r in got] == [(r["k"], r["w"]) for r in want]


def test_rank_chain_deterministic_over_shuffled_input(spark):
    """Regression (round-7 RFM bug class): chaining rank constructions
    over a groupBy output (nondeterministic physical row order) must be
    deterministic. The old placement-based bucket ids (range exchange +
    spark_partition_id) disagreed between the local and offsets plan
    branches whenever exchange reuse failed; value-derived frozen
    boundaries cannot disagree with themselves."""
    from time_series_spark_spark.operators.rank import (
        global_rank,
        ntile_expr,
    )

    base = (
        spark.range(3000)
        .select((F.col("id") % 997).alias("k"), F.col("id").alias("x"))
        .groupBy("k")
        .agg(F.sum("x").alias("a"), F.count(F.lit(1)).alias("b"))
    )

    def score(df, order, out):
        r = global_rank(df, order, "__r", total_col="__n",
                        num_partitions=7)
        return r.withColumn(
            out, ntile_expr(F.col("__r"), F.col("__n"), 5)
        ).drop("__r", "__n")

    def run():
        s = score(base, [("a", False), ("k", True)], "qa")
        s = score(s, [("b", True), ("k", True)], "qb")
        return sorted(
            (r["k"], r["qa"], r["qb"]) for r in s.collect()
        )

    first = run()
    assert first == run() == run()


def test_global_rank_timestamp_and_date_leading_keys(spark):
    """TIMESTAMP/DATE leading keys bucket through their order-preserving
    integer encodings — no surrogate numeric column needed."""
    from time_series_spark_spark.operators.rank import (
        global_cummax,
        global_rank,
    )

    df = spark.range(300).select(
        F.col("id").alias("k"),
        # unique ts (prefix-max over a ROWS frame is ambiguous on ties)
        F.timestamp_micros(
            (F.hash("id") % 100000).cast("long") * 1000000
            + F.col("id") + 1577836800000000
        ).alias("ts"),
        (F.hash(F.col("id") + 9) % 50).cast("long").alias("w"),
    ).withColumn("d", F.to_date("ts"))
    got = (
        global_rank(df, [("ts", True), ("k", True)], "rnk",
                    num_partitions=6)
        .orderBy("k")
        .collect()
    )
    want = (
        df.withColumn("rnk", F.row_number().over(Window.orderBy("ts", "k")))
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["rnk"]) for r in got] == [
        (r["k"], r["rnk"]) for r in want
    ]
    got_d = (
        global_rank(df, [("d", True), ("k", True)], "rnk",
                    num_partitions=6)
        .orderBy("k")
        .collect()
    )
    want_d = (
        df.withColumn("rnk", F.row_number().over(Window.orderBy("d", "k")))
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["rnk"]) for r in got_d] == [
        (r["k"], r["rnk"]) for r in want_d
    ]
    # cummax over a timestamp order (the watermark-audit shape)
    got_m = (
        global_cummax(df, [("ts", True)], ["w"], num_partitions=6)
        .orderBy("ts", "k")
        .collect()
    )
    w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    want_m = df.withColumn("w", F.max("w").over(w)).orderBy("ts", "k").collect()
    assert [r["w"] for r in got_m] == [r["w"] for r in want_m]


def test_cumsum_null_semantics_match_window(spark):
    """The 'bit-identical to sum().over(orderBy)' contract on a NULL-
    bearing column (round-7 advice): a row whose prefix within its
    bucket is all-NULL must CARRY the prior running total when any
    earlier row contributed, and stay NULL only while NOTHING has
    contributed yet. Planted so the first bucket(s) are entirely NULL
    (leading rows exercise the stay-NULL branch) and later buckets
    begin with NULL runs (exercise the carry branch)."""
    from time_series_spark_spark.operators.rank import grouped_cumsum

    n = 400
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.col("id").alias("v"),
        (F.col("id") % 2).alias("g"),
        # NULL for the first 120 rows and for every 3rd row after —
        # all-NULL leading buckets + NULL runs inside later buckets
        F.when(
            (F.col("id") >= 120) & (F.col("id") % 3 != 0), F.col("id")
        ).alias("w"),
    )
    got = (
        global_cumsum(df, [("v", True), ("k", True)], ["w"], num_partitions=8)
        .orderBy("k")
        .collect()
    )
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("w", F.sum("w").over(w)).orderBy("k").collect()
    assert [(r["k"], r["w"]) for r in got] == [
        (r["k"], r["w"]) for r in want
    ]

    got_g = (
        grouped_cumsum(
            df, ["g"], [("v", True), ("k", True)], ["w"], num_partitions=8
        )
        .orderBy("k")
        .collect()
    )
    wg = (
        Window.partitionBy("g")
        .orderBy("v", "k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want_g = df.withColumn("w", F.sum("w").over(wg)).orderBy("k").collect()
    assert [(r["k"], r["w"]) for r in got_g] == [
        (r["k"], r["w"]) for r in want_g
    ]
