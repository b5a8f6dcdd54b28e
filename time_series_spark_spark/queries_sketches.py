"""Sketch-rollup query surface (operators/sketches.py).

Every query here follows the same two-phase shape: build FIXED-SIZE
mergeable partials at a finer grain than the answer needs (hourly, here),
then merge partials up to the answer grain — proving the
"persist partials, never re-scan raw data" pattern end-to-end inside one
lineage. At 100 TB the partials frame is what you would write to a table.

Oracle policy: the bitmap query is EXACT (bit-per-id), so it carries a
DuckDB ``count(DISTINCT ...)`` oracle. The HLL/KLL queries are estimates
from a sketch family DuckDB does not implement; they are rows-only here
and tolerance-checked against exact answers in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_spark_spark.operators.sketches import (
    bitmap_partials,
    bitmap_rollup,
    hll_pairwise_overlap,
    hll_partials,
    hll_rollup,
    kll_partials,
    kll_rollup_quantiles,
)
from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load


def _hourly_keyed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + (day, hour) bucket columns: the fine grain is hourly; the
    answer grain (daily) is derived by dropping the hour key at merge."""
    return load(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        "value",
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
    )


# --------------------------------------------------------------------------
# Exact mergeable distinct: bitmap partials (oracle-checked)
# --------------------------------------------------------------------------
@register(
    "events_bitmap_daily_users",
    """
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           count(DISTINCT user_id) AS n_distinct
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, d
    """,
    doc="Exact distinct users per (event_type, day), computed from HOURLY "
    "bitmap partials OR-merged up to daily — the mergeable-partial "
    "pattern with an exact (not estimated) result, so it is fully "
    "oracle-checkable against count(DISTINCT).",
)
def events_bitmap_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _hourly_keyed_events(spark, sf_dir)
    partials = bitmap_partials(ev, ["event_type", "d", "h"], "user_id")
    return bitmap_rollup(partials, ["event_type", "d"]).orderBy(
        "event_type", "d"
    )


# --------------------------------------------------------------------------
# HLL rollup (rows-only; tolerance-tested vs exact)
# --------------------------------------------------------------------------
@register(
    "events_hll_daily_users",
    None,
    doc="Approximate distinct users per day from hourly HLL partials "
    "(lossless union merge). Rows-only for the driver; "
    "tests/test_sketches.py bounds the error vs exact and asserts the "
    "merge is lossless (union of hourly == direct daily sketch).",
)
def events_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _hourly_keyed_events(spark, sf_dir)
    partials = hll_partials(ev, ["d", "h"], "user_id")
    return hll_rollup(partials, ["d"]).orderBy("d")


# --------------------------------------------------------------------------
# KLL quantile rollup (rows-only; tolerance-tested vs exact)
# --------------------------------------------------------------------------
@register(
    "events_kll_value_quantiles",
    None,
    doc="p50/p90/p99 of value per event_type, merged from hourly KLL "
    "partials (bounded fan-in fold over the pairwise merge scalar). "
    "Rows-only; rank-error vs exact percentiles bounded in tests.",
)
def events_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _hourly_keyed_events(spark, sf_dir)
    partials = kll_partials(ev, ["event_type", "h"], "value")
    return kll_rollup_quantiles(
        partials,
        ["event_type"],
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# HLL set algebra: pairwise audience overlap (rows-only; tested vs exact)
# --------------------------------------------------------------------------
@register(
    "events_hll_type_overlap",
    None,
    doc="Estimated distinct-user overlap for every pair of event types via "
    "inclusion-exclusion on HLL sketches: one pass over events builds one "
    "sketch per type; the pairwise grid joins G tiny sketch rows, never "
    "raw data. Rows-only; error vs exact intersections bounded in tests.",
)
def events_hll_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return hll_pairwise_overlap(ev, "event_type", "user_id").orderBy(
        "g1", "g2"
    )


@register(
    "docs_token_heavy_hitters",
    None,  # summary contents depend on partition layout → rows-only;
    # bounds + exact-recovery asserted in tests/test_sketches.py
    doc="Misra-Gries mergeable heavy hitters over document tokens: "
    "O(counters) memory per task, scalar merged error bound, top-k by "
    "upper bound — the bounded-memory alternative to the exact "
    "docs_top_terms explode+agg",
)
def docs_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.llm import tokens
    from time_series_spark_spark.operators.sketches import mg_heavy_hitters

    docs = load(spark, sf_dir, "documents")
    items = docs.select(F.explode(tokens()).alias("term"))
    return mg_heavy_hitters(items, "term", k=20, counters=4096)


@register(
    "events_cm_user_counts",
    None,
    doc="D20 Count-Min frequency estimation: one pass over events builds "
    "a bounded d×w cell sketch (mergeable by cell addition); the probe "
    "side estimates per-user event counts map-only against the ONE-row "
    "broadcast sketch. Rows-only for the driver (cell layout is "
    "xxhash-specific); never-undercount + ε·N bound + merge law pinned "
    "in tests/test_sketches.py.",
)
def events_cm_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.sketches import (
        cm_estimate,
        cm_partials,
    )

    ev = load(spark, sf_dir, "events")
    sketch = cm_partials(ev, F.col("user_id"))
    probes = ev.select("user_id").distinct().filter(F.col("user_id") < 20)
    return cm_estimate(
        probes, sketch, F.col("user_id"), ["user_id"]
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Fixed-bucket histogram rollup + interpolated quantile (round 4;
# oracle-checked: counts are exact, interpolation is deterministic)
# --------------------------------------------------------------------------
@register(
    "events_hist_p95_daily",
    """
    WITH e AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(least(63, greatest(0, CAST(floor(value / 8.0) AS INT)))
                    AS BIGINT) AS bucket
        FROM events
    ),
    p AS (
        SELECT event_type, d, bucket, count(*) AS cnt
        FROM e GROUP BY 1, 2, 3
    ),
    c AS (
        SELECT event_type, d, bucket, cnt,
               CAST(sum(cnt) OVER w AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY event_type, d) AS BIGINT)
                   AS total
        FROM p WINDOW w AS (PARTITION BY event_type, d ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, d,
           round(0.0 + 8.0 * (CAST(bucket AS DOUBLE)
                 + (0.95 * CAST(total AS DOUBLE)
                    - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)),
                 6) AS p95_est
    FROM c
    WHERE CAST(cum - cnt AS DOUBLE) < 0.95 * CAST(total AS DOUBLE)
      AND CAST(cum AS DOUBLE) >= 0.95 * CAST(total AS DOUBLE)
    ORDER BY event_type, d
    """,
    doc="Prometheus-style histogram_quantile rollup: hourly equi-width "
    "bucket counts (exact, bounded at keys x 64 rows) merged to daily by "
    "addition, then p95 by linear interpolation inside the rank bucket — "
    "any ad-hoc quantile re-answers from the partial log without touching "
    "raw events; estimate error is bounded by one bucket width (pinned "
    "in tests/test_sketches.py vs the exact percentile).",
)
def events_hist_p95_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.sketches import (
        hist_merge,
        hist_partials,
        hist_quantile,
    )

    ev = _hourly_keyed_events(spark, sf_dir)
    parts = hist_partials(
        ev, ["event_type", "d", "h"], "value", 0.0, 512.0, 64
    )
    daily = hist_merge(parts, ["event_type", "d"])
    return hist_quantile(
        daily, ["event_type", "d"], 0.95, 0.0, 512.0, 64
    ).orderBy("event_type", "d")


@register(
    "orders_lineitem_ams_join_size",
    None,  # randomized estimator family DuckDB lacks → rows-only;
    # error bound, merge law, and determinism pinned in tests/test_sketches.py
    doc="D22 AMS join-size estimation: |orders ⋈ lineitem| on orderkey "
    "predicted from two 256-counter signed-sum sketches (median of 16 "
    "group means of Z_j^R·Z_j^S) WITHOUT running the join — what a "
    "cost-based planner consults before picking a join strategy. The "
    "exact count is included as the verification column (cheap at test "
    "scale; at 100 TB you would ship only the constant-size partials). "
    "Partials are plain sums, so they merge by addition across "
    "partitions or micro-batches",
)
def orders_lineitem_ams_join_size(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.sketches import (
        ams_join_size,
        ams_partials,
    )

    # Explicit key null filters so the sketch branches' scans are
    # canonically identical to the exact branch's (whose inner join
    # infers IsNotNull on the keys) — without them the per-key count
    # exchanges cannot be reused across the branches (round 15; the
    # recs lesson). Orderkeys are never null, so the sketches are
    # unchanged on any real input.
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey").isNotNull()
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey").isNotNull()
    )
    lp = ams_partials(orders, "o_orderkey", n_sketches=256)
    rp = ams_partials(lineitem, "l_orderkey", n_sketches=256)
    est = ams_join_size(lp, rp, group_size=16, n_sketches=256)
    # Exact |orders ⋈ lineitem| as Σ_k c_orders(k)·c_lineitem(k) over the
    # SAME per-key count frames the sketches fan out from (round 15,
    # guide §2.4): the raw 600k-row self-join disappears and both count
    # exchanges are reused from the sketch branches (2 ReusedExchange in
    # the final plan). The result is the identical integer — the join
    # row count factorizes through per-key multiplicities. Combined with
    # the estimate via a tagged UNION + single-row aggregate, not a
    # broadcast cross-join: a broadcast subtree re-executes its whole
    # lineage (nested query-stage reuse does not fire across
    # broadcast-stage boundaries), while union branches share stages.
    co = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    cl = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    exact = (
        co.join(cl.withColumnRenamed("c", "cl"), "k")
        .agg(F.sum(F.col("c") * F.col("cl")).alias("exact_join_size"))
    )
    one = (
        est.select(
            F.col("join_size_estimate").alias("e"),
            F.lit(None).cast("long").alias("x"),
        )
        .unionAll(
            exact.select(
                F.lit(None).cast("double").alias("e"),
                F.col("exact_join_size").alias("x"),
            )
        )
        .agg(
            F.max("e").alias("join_size_estimate"),
            F.max("x").alias("exact_join_size"),
        )
    )
    return one.select(
        "join_size_estimate",
        "exact_join_size",
        F.round(
            F.abs(F.col("join_size_estimate") - F.col("exact_join_size"))
            / F.col("exact_join_size"),
            4,
        ).alias("rel_err"),
    )


@register(
    "emb_frequent_directions",
    None,  # matrix sketching is not SQL-expressible → rows-only;
    # the covariance error bound and low-rank recovery are pinned in
    # tests/test_sketches.py
    doc="D24 Frequent Directions matrix sketch over the embedding table "
    "(Liberty KDD'13): mergeable 16×64 sketch with ||A'A - B'B||_2 <= "
    "||A||_F^2/16 — per-partition mapInPandas partials (O(ell*d) state "
    "per task), one bounded merge pass over n_partitions*ell rows, "
    "deterministic via range-repartition + in-partition sort; output is "
    "the sketched spectrum (operators/sketches.py::frequent_directions)",
)
def emb_frequent_directions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.sketches import frequent_directions

    return frequent_directions(load(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# D22 theta (KMV) sketch distinct estimate vs exact
# ---------------------------------------------------------------------------
@register(
    "events_theta_sketch_users",
    """
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events
    ),
    ranked AS (
        SELECT event_type, hv,
               row_number() OVER (PARTITION BY event_type ORDER BY hv)
                   AS rk,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_exact
        FROM h
    )
    SELECT event_type, n_exact,
           round(CASE WHEN n_exact <= 64
                      THEN CAST(n_exact AS DOUBLE)
                      ELSE 63.0 * 1152921504606846976.0 / max(hv) END,
                 4) AS theta_est,
           round(100.0 * abs(CASE WHEN n_exact <= 64
                                  THEN CAST(n_exact AS DOUBLE)
                                  ELSE 63.0 * 1152921504606846976.0
                                       / max(hv) END
                             - n_exact) / n_exact, 4) AS rel_err_pct
    FROM ranked WHERE rk <= 64
    GROUP BY event_type, n_exact
    ORDER BY event_type
    """,
    doc="D22 theta / K-minimum-values sketch (k=64) for distinct users "
    "per event_type, reported against the exact count: hash each user "
    "to a 60-bit md5 integer, keep the k smallest per group, estimate "
    "(k-1)/theta with theta = kth-min / 2^60 (Bar-Yossef 2002; the "
    "k-th order statistic of uniforms) — the sketch family whose SET "
    "ALGEBRA (union = k smallest of the merged minima, intersection "
    "via theta-capped survivors) stays unbiased where D17's HLL "
    "inclusion-exclusion degrades. Deterministic md5 hashing = same "
    "estimate in both engines, small-set exact short-circuit at "
    "n <= k. One dedup reduce + one bounded top-k window per group; "
    "one row per type with estimate and realized relative error.",
)
def events_theta_sketch_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    h = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr(
                "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
                " 16, 10) AS BIGINT)"
            ).alias("hv"),
        )
        .distinct()
    )
    wp = Window.partitionBy("event_type")
    ranked = h.select(
        "event_type", "hv",
        F.row_number().over(wp.orderBy("hv")).alias("rk"),
        F.count(F.lit(1))
        .over(
            wp.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n_exact"),
    )
    est = (
        "CASE WHEN n_exact <= 64 THEN CAST(n_exact AS DOUBLE)"
        " ELSE 63.0 * 1152921504606846976.0 / max(hv) END"
    )
    return (
        ranked.filter(F.col("rk") <= 64)
        .groupBy("event_type", "n_exact")
        .agg(F.max("hv").alias("_kth"))
        .select(
            "event_type",
            "n_exact",
            F.expr(
                "round(CASE WHEN n_exact <= 64 THEN CAST(n_exact AS DOUBLE)"
                " ELSE 63.0 * 1152921504606846976.0 / _kth END, 4)"
            ).alias("theta_est"),
            F.expr(
                "round(100.0 * abs(CASE WHEN n_exact <= 64"
                " THEN CAST(n_exact AS DOUBLE)"
                " ELSE 63.0 * 1152921504606846976.0 / _kth END"
                " - n_exact) / n_exact, 4)"
            ).alias("rel_err_pct"),
        )
        .orderBy("event_type")
    )
