"""Continuous-analytics query surface (SURVEY.md §2.F extension, round 2):
OHLC bars, time-weighted average, counter increase, streaks, rolling
correlation, retention cohorts, ordered funnel, LTTB downsampling.

Determinism rules as everywhere (queries.py header): integer-µs time
math, integer-cents money math, padded-string arg_min/arg_max tie-break
keys, DuckDB sums CAST to BIGINT so the driver canonicalizer never sees
a HUGEINT, and fp emitted only as a final identical-operand division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_spark_spark.session import local_df

from time_series_spark_spark.operators.analytics import (
    counter_increase,
    funnel,
    lttb,
    ohlc,
    retention_cohorts,
    rolling_corr,
    seasonal_decompose,
    streaks,
    time_weighted_avg,
)
from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


_ORD_KEY = "printf('%020d-%012d', epoch_us(ts), event_id)"


@register(
    "events_ohlc_daily",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           event_type,
           arg_min(value, {_ORD_KEY}) AS open,
           max(value)                 AS high,
           min(value)                 AS low,
           arg_max(value, {_ORD_KEY}) AS close,
           CAST(count(*) AS BIGINT)   AS n,
           round(sum(value), 2)       AS volume
    FROM events GROUP BY 1, 2
    """,
    doc="OHLC candlestick bars per (day, event_type); open/close "
    "tie-broken by the padded (epoch_us, event_id) string key — one hash "
    "aggregation, no window pass",
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ohlc(_events(spark, sf_dir), "ts", "value", ["event_type"], "day")


@register(
    "events_twa_user",
    """
    WITH seg AS (
        SELECT user_id, epoch_us(ts) AS t,
               CAST(round(value * 100) AS BIGINT) AS c,
               lead(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS t_next
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           round(CAST(sum(CASE WHEN t_next IS NULL THEN 0
                               ELSE c * (t_next - t) END) AS DOUBLE)
                 / (max(t) - min(t)) / 100.0, 6) AS twa_value
    FROM seg GROUP BY user_id
    HAVING max(t) > min(t)
    """,
    doc="Time-weighted average value per user under LOCF interpolation "
    "(the TimescaleDB time_weight definition) — integer cents x integer "
    "µs throughout, one fp division at the end",
)
def events_twa_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_weighted_avg(_events(spark, sf_dir), "ts", "value", ["user_id"])


@register(
    "events_counter_increase_daily",
    """
    WITH s AS (
        SELECT user_id, ts,
               CAST(round(value * 100) AS BIGINT) AS c,
               lag(CAST(round(value * 100) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS prev
        FROM events
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
           CAST(sum(CASE WHEN prev IS NULL THEN 0
                         WHEN c >= prev THEN c - prev
                         ELSE c END) AS DOUBLE) / 100.0 AS total_increase,
           CAST(sum(CASE WHEN c < prev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_resets
    FROM s GROUP BY 1
    """,
    doc="Prometheus-style counter increase per day with reset handling "
    "(negative delta -> counter restarted; contributes the post-reset "
    "sample)",
)
def events_counter_increase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return counter_increase(
        _events(spark, sf_dir), "ts", "value", ["user_id"], "day"
    )


@register(
    "events_type_streaks",
    """
    WITH f AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
               CASE WHEN lag(event_type) OVER
                        (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                        IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
    ),
    i AS (
        SELECT user_id, event_type,
               sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS sid
        FROM f
    ),
    s AS (
        SELECT user_id, sid, min(event_type) AS event_type,
               CAST(count(*) AS BIGINT) AS len
        FROM i GROUP BY user_id, sid
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT)  AS n_streaks,
           CAST(max(len) AS BIGINT)  AS max_len,
           CAST(sum(len) AS BIGINT)  AS n_events
    FROM s GROUP BY 1, 2
    """,
    doc="Run-length streaks (gaps-and-islands): consecutive same-type "
    "runs per user, aggregated per (user, type) — change-flag lag + "
    "running-sum island id + two hash aggs, all on one user partitioning",
)
def events_type_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = streaks(_events(spark, sf_dir), "ts", "event_type", ["user_id"])
    return s.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("max_len"),
        F.sum("len").alias("n_events"),
    )


@register(
    "events_rolling_corr_7d",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    wnd AS (
        SELECT d, x, y,
               count(*)   OVER w AS n,
               sum(x)     OVER w AS sx,  sum(y)     OVER w AS sy,
               sum(x * y) OVER w AS sxy,
               sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
        FROM d
        WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT d, x, y,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN round((n * sxy - sx * sy)
                           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                              * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           END AS rolling_corr
    FROM wnd
    """,
    doc="Rolling 7-day Pearson correlation between daily click and "
    "purchase counts, computed from exact integer power sums so both "
    "engines divide identical operands (F.corr's streaming fp path "
    "would drift)",
)
def events_rolling_corr_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "y"
            ),
        )
    )
    return rolling_corr(daily, "d", "x", "y", n_preceding=6)


@register(
    "user_retention_weekly",
    """
    WITH pb AS (
        SELECT DISTINCT user_id AS u,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS b
        FROM events
    ),
    f AS (SELECT u, min(b) AS cohort FROM pb GROUP BY u)
    SELECT f.cohort,
           CAST(date_diff('day', f.cohort, pb.b) / 7 AS INT) AS offset,
           CAST(count(DISTINCT pb.u) AS BIGINT) AS n_active
    FROM pb JOIN f ON f.u = pb.u
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention: users bucketed by first-activity week; "
    "n_active at each week offset (offset 0 = cohort size). Both "
    "shuffles on user_id; cohort frame is per-user and co-partitioned",
)
def user_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_cohorts(_events(spark, sf_dir), "ts", "user_id", "week")


@register(
    "events_funnel_ordered",
    """
    WITH v AS (
        SELECT user_id AS u, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
        SELECT e.user_id AS u, min(e.ts) AS t1
        FROM events e JOIN v ON v.u = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1
    ),
    p AS (
        SELECT e.user_id AS u, min(e.ts) AS t2
        FROM events e JOIN c ON c.u = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1
    )
    SELECT 0 AS stage_idx, 'view' AS stage,
           CAST(count(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 1, 'click', CAST(count(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 2, 'purchase', CAST(count(*) AS BIGINT) FROM p
    """,
    doc="Ordered first-touch funnel view -> click -> purchase: stage k "
    "counts users whose earliest stage-k event strictly follows their "
    "earliest qualifying stage-(k-1) event",
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    return funnel(
        _events(spark, sf_dir),
        "ts",
        "user_id",
        "event_type",
        ["view", "click", "purchase"],
    )


@register(
    "events_lttb_user",
    None,  # sequential point selection is not SQL-expressible → rows-only;
    # shape/fidelity invariants asserted in tests/test_analytics.py
    doc="LTTB (largest-triangle-three-buckets) downsampling to 24 points "
    "per user series, on the packed grouped-map path",
)
def events_lttb_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lttb(_events(spark, sf_dir), "ts", "value", ["user_id"], n_out=24)


@register(
    "events_decompose_daily",
    """
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    ph AS (
        SELECT user_id, d, c,
               (epoch_us(d) // 86400000000) % 7 AS phase
        FROM daily
    ),
    framed AS (
        SELECT user_id, d, c, phase,
               CAST(sum(c) OVER w AS BIGINT)   AS fsum,
               CAST(count(*) OVER w AS BIGINT) AS fn
        FROM ph
        WINDOW w AS (PARTITION BY user_id ORDER BY d
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    dt AS (
        SELECT user_id, d, c, phase, fsum,
               c * 7 - fsum AS dtv
        FROM framed WHERE fn = 7
    ),
    seas AS (
        SELECT user_id, d, c, fsum, dtv,
               CAST(sum(dtv) OVER s AS BIGINT)   AS ssum,
               CAST(count(*) OVER s AS BIGINT)   AS sn
        FROM dt
        WINDOW s AS (PARTITION BY user_id, phase)
    )
    SELECT user_id, d,
           round(c / 100.0, 6)            AS y,
           round(fsum / 700.0, 6)         AS trend,
           round(ssum / (sn * 700.0), 6)  AS seasonal,
           round((dtv * sn - ssum) / (sn * 700.0), 6) AS resid
    FROM seas
    """,
    doc="Classical additive decomposition of each user's daily value "
    "series: centered 7-day MA trend, per-phase (epoch-day mod 7) mean "
    "seasonal, residual — integer numerators/denominators end-to-end, "
    "one fp division per emitted column",
)
def events_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_decompose(
        _events(spark, sf_dir), "ts", "value", ["user_id"], period=7
    )


@register(
    "events_rolling_median_7",
    """
    SELECT user_id, epoch_us(ts) AS t_us, event_id,
           round(quantile_cont(value, 0.5) OVER
                 (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
               AS rolling_q
    FROM events
    """,
    doc="Rolling exact median of value over the trailing 7 events per "
    "user (linear-interpolated order statistic, identical definition in "
    "both engines); the KLL sketch is the wide-frame scale path",
)
def events_rolling_median_7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.analytics import rolling_quantile

    return rolling_quantile(
        _events(spark, sf_dir), "ts", "value", ["user_id"], n_preceding=6
    )


@register(
    "events_value_histogram",
    """
    SELECT event_type,
           CAST(least(floor(value / 50), 9) AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events
    GROUP BY 1, 2
    """,
    doc="Equi-width histogram of value per event_type (10 buckets of "
    "width 50, top bucket open) — floor arithmetic, no width_bucket "
    "dialect dependency",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.least(F.floor(F.col("value") / 50), F.lit(9))
            .cast("int")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@register(
    "events_drift_psi",
    """
    WITH r AS (
        SELECT CAST(least(floor(value / 50), 9) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_ref
        FROM events WHERE ts < TIMESTAMP '2024-01-08' GROUP BY 1
    ),
    c AS (
        SELECT CAST(least(floor(value / 50), 9) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_cur
        FROM events WHERE ts >= TIMESTAMP '2024-01-24' GROUP BY 1
    ),
    j AS (
        SELECT coalesce(r.bucket, c.bucket) AS bucket,
               coalesce(n_ref, 0) AS n_ref,
               coalesce(n_cur, 0) AS n_cur
        FROM r FULL OUTER JOIN c ON r.bucket = c.bucket
    ),
    t AS (SELECT bucket, n_ref, n_cur,
                 sum(n_ref) OVER () AS tr, sum(n_cur) OVER () AS tc
          FROM j)
    SELECT bucket, n_ref, n_cur,
           CASE WHEN n_ref > 0 AND n_cur > 0 THEN
               round((n_ref / CAST(tr AS DOUBLE) - n_cur / CAST(tc AS DOUBLE))
                     * ln((n_ref / CAST(tr AS DOUBLE))
                          / (n_cur / CAST(tc AS DOUBLE))), 6)
           END AS psi_contrib
    FROM t
    """,
    doc="Population Stability Index drift of the value distribution, "
    "first week vs last week: per-bucket contributions from exact "
    "integer counts (cross-bucket fp sum left to the caller — it is "
    "association-order-dependent)",
)
def events_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.analytics import psi_drift

    ev = _events(spark, sf_dir)
    ref = ev.filter(F.col("ts") < "2024-01-08")
    cur = ev.filter(F.col("ts") >= "2024-01-24")
    return psi_drift(ref, cur, "value", 50.0, 10)


@register(
    "customer_active_periods",
    """
    WITH iv AS (
        SELECT o_custkey, o_orderkey,
               o_orderdate AS s,
               o_orderdate + INTERVAL 30 DAY AS e
        FROM orders
    ),
    f AS (
        SELECT o_custkey, s, e,
               CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) IS NULL
                      OR s > max(e) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS nw,
               o_orderkey
        FROM iv
    ),
    isl AS (
        SELECT o_custkey, s, e,
               sum(nw) OVER (PARTITION BY o_custkey ORDER BY s, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS pid
        FROM f
    ),
    periods AS (
        SELECT o_custkey, pid, min(s) AS ps, max(e) AS pe,
               CAST(count(*) AS BIGINT) AS n_iv
        FROM isl GROUP BY 1, 2
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT)                    AS n_periods,
           CAST(sum(date_diff('day', ps, pe)) AS BIGINT) AS covered_days,
           CAST(max(date_diff('day', ps, pe)) AS BIGINT) AS longest_days
    FROM periods GROUP BY 1
    """,
    doc="Interval coalescing (gaps-and-islands over intervals): each "
    "order opens a 30-day active window; overlapping windows merge into "
    "maximal periods per customer — running-max-of-ends island flags, "
    "one exchange end-to-end",
)
def customer_active_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.analytics import coalesce_intervals

    iv = (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("s"),
            (F.col("o_orderdate") + F.expr("interval 30 days")).alias("e"),
        )
    )
    periods = coalesce_intervals(iv, ["o_custkey"], "s", "e", "o_orderkey")
    days = F.datediff("period_end", "period_start")
    return periods.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.sum(days).alias("covered_days"),
        F.max(days).cast("long").alias("longest_days"),
    )


@register(
    "events_transition_matrix",
    """
    WITH t AS (
        SELECT user_id,
               lag(event_type) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS prev_type,
               event_type AS cur_type
        FROM events
    ),
    c AS (
        SELECT prev_type, cur_type, CAST(count(*) AS BIGINT) AS n
        FROM t WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, cur_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
               AS p
    FROM c
    """,
    doc="First-order Markov transition matrix of per-user event "
    "sequences: global (prev, cur) counts + row-normalized transition "
    "probability (integer counts, one identical division)",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("cur_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = t.groupBy("prev_type", "cur_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "cur_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot).cast("double"), 6).alias("p"),
    )


@register(
    "events_unpivot_daily",
    """
    WITH wide AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        FROM events GROUP BY 1
    )
    SELECT d, 'n_view' AS metric, n_view AS n FROM wide
    UNION ALL SELECT d, 'n_click', n_click FROM wide
    UNION ALL SELECT d, 'n_purchase', n_purchase FROM wide
    """,
    doc="Unpivot/melt (the inverse of D12 pivot): wide per-day metric "
    "columns back to long (day, metric, value) rows via DataFrame.unpivot",
)
def events_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            *[
                F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(
                    f"n_{t}"
                )
                for t in ("view", "click", "purchase")
            ]
        )
    )
    return wide.unpivot(
        ["d"], ["n_view", "n_click", "n_purchase"], "metric", "n"
    )


@register(
    "events_zorder_layout_report",
    None,  # layout evidence is file-level, not SQL-expressible → rows-only
    doc="A9 Z-order clustered layout, driver-visible: events written "
    "Morton-clustered on (user_id, day), then per-file parquet footer "
    "stats prove a narrow predicate on EITHER dimension skips files "
    "(multi-dimensional clustering — the OPTIMIZE ZORDER layout rule, "
    "no table format needed). Emits the probe row-counts (distributed "
    "reads over the clustered layout) plus the pruning verdicts.",
)
def events_zorder_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import tempfile

    import pyarrow.parquet as pq

    from time_series_spark_spark.sources.quality import write_parquet_zorder

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.dayofmonth("ts").alias("day"),
        # Z-order prerequisite: both dims scaled into comparable ranges so
        # BOTH contribute high interleaved bits (day 1..31 ×8 ≈ user 0..~255
        # — otherwise the narrow dim never reaches the z-key's top bits and
        # its files span the full range)
        (F.dayofmonth("ts") * 8).alias("day_scaled"),
        "value",
    )
    # every read below is eager (counts + footer scans), so the written
    # copy can be removed before returning — a registered query runs under
    # the oracle sweep, bench, and the driver, and must not leak /tmp dirs
    path = tempfile.mkdtemp(prefix="zorder_events_")
    try:
        write_parquet_zorder(ev, path, "user_id", "day_scaled", n_files=8, bits=8)

        back = spark.read.parquet(path)
        n_total = back.count()
        rows_probe_user = back.filter(F.col("user_id") < 10).count()
        rows_probe_day = back.filter(F.col("day") <= 3).count()

        def span(dim: str) -> list:
            out = []
            for f in glob.glob(path + "/*.parquet"):
                md = pq.ParquetFile(f).metadata
                lo = hi = None
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    for ci in range(row_group.num_columns):
                        col = row_group.column(ci)
                        if col.path_in_schema == dim and col.statistics:
                            s = col.statistics
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
                out.append((lo, hi))
            return out

        files_user = span("user_id")
        files_day = span("day")
        skip_user = sum(1 for lo, hi in files_user if lo is not None and lo >= 10)
        skip_day = sum(1 for lo, hi in files_day if lo is not None and lo > 3)
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    return local_df(spark, 
        [
            (
                int(n_total),
                len(files_user),
                int(rows_probe_user),
                int(rows_probe_day),
                bool(skip_user > 0),
                bool(skip_day > 0),
            )
        ],
        "n_rows long, n_files long, rows_user_probe long, rows_day_probe long, "
        "prunes_on_user boolean, prunes_on_day boolean",
    )


# --------------------------------------------------------------------------
# A10 per-column profiling report (round 4)
# --------------------------------------------------------------------------
@register(
    "orders_profile_numeric",
    """
    SELECT 'o_custkey' AS column_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           count(DISTINCT o_custkey) AS n_distinct,
           round(CAST(min(o_custkey) AS DOUBLE), 6) AS vmin,
           round(CAST(max(o_custkey) AS DOUBLE), 6) AS vmax,
           round(avg(CAST(o_custkey AS DOUBLE)), 6) AS vavg
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', count(*),
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderkey),
           round(CAST(min(o_orderkey) AS DOUBLE), 6),
           round(CAST(max(o_orderkey) AS DOUBLE), 6),
           round(avg(CAST(o_orderkey AS DOUBLE)), 6)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice),
           round(CAST(min(o_totalprice) AS DOUBLE), 6),
           round(CAST(max(o_totalprice) AS DOUBLE), 6),
           round(avg(CAST(o_totalprice AS DOUBLE)), 6)
    FROM orders
    ORDER BY column_name
    """,
    doc="A10 per-column numeric profiling report (dataset-card / "
    "expectation-suite input): count, nulls, exact distinct, min/max/mean "
    "per column in ONE wide aggregation over a single scan, melted with "
    "stack() — profiling cost is scan-bound regardless of table size.",
)
def orders_profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.sources.quality import profile_numeric

    orders = load(spark, sf_dir, "orders")
    return profile_numeric(
        orders, ["o_custkey", "o_orderkey", "o_totalprice"]
    ).orderBy("column_name")


# --------------------------------------------------------------------------
# F30 seasonal-baseline ratio anomaly (round 4)
# --------------------------------------------------------------------------
@register(
    "events_seasonal_ratio_anomaly",
    """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT event_type, d, n,
               CAST(sum(n) OVER w - n AS BIGINT)   AS peer_sum,
               CAST(count(*) OVER w - 1 AS BIGINT) AS peer_cnt
        FROM daily
        WINDOW w AS (PARTITION BY event_type, dayofweek(d))
    )
    SELECT event_type, d, n, peer_sum, peer_cnt,
           peer_cnt > 0 AND n * peer_cnt > 2 * peer_sum     AS is_spike,
           peer_cnt > 0 AND 2 * n * peer_cnt < peer_sum     AS is_drop
    FROM base
    ORDER BY event_type, d
    """,
    doc="F30 seasonal-baseline ratio anomaly: each (event_type, day) count "
    "is compared against the LEAVE-ONE-OUT mean of its day-of-week peers "
    "(self excluded, so an anomalous day cannot mask itself — the J7b "
    "principle in batch); spike = more than 2x the peer mean, drop = less "
    "than half. The comparisons are pure integer cross-multiplications "
    "(n*peer_cnt vs 2*peer_sum) — no fp division anywhere, so both "
    "engines agree bit-for-bit. Day-of-week origins differ across engines "
    "(Spark 1=Sun, DuckDB 0=Sun) but the dow value only PARTITIONS — it "
    "never appears in output — so no normalization is needed. One daily "
    "hash agg + one window on the tiny daily frame.",
)
def events_seasonal_ratio_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type", F.dayofweek("d"))
    base = daily.select(
        "event_type",
        "d",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("peer_sum"),
        (F.count(F.lit(1)).over(w) - F.lit(1)).cast("long").alias("peer_cnt"),
    )
    return base.select(
        "event_type",
        "d",
        "n",
        "peer_sum",
        "peer_cnt",
        (
            (F.col("peer_cnt") > 0)
            & (F.col("n") * F.col("peer_cnt") > 2 * F.col("peer_sum"))
        ).alias("is_spike"),
        (
            (F.col("peer_cnt") > 0)
            & (2 * F.col("n") * F.col("peer_cnt") < F.col("peer_sum"))
        ).alias("is_drop"),
    ).orderBy("event_type", "d")


# --------------------------------------------------------------------------
# F30+ contiguous sequence-pattern detection (round 4)
# --------------------------------------------------------------------------
@register(
    "events_pattern_view_click_purchase",
    f"""
    WITH seqs AS (
        SELECT user_id,
               string_agg(event_type, ',' ORDER BY {_ORD_KEY}) AS seq,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    ),
    hits AS (
        SELECT user_id, n_events,
               CAST((len(seq) - len(replace(seq, 'view,click,purchase', '')))
                    // len('view,click,purchase') AS BIGINT) AS n_matches,
               CASE WHEN position('view,click,purchase' IN seq) > 0
                    THEN CAST(len(seq[1:position('view,click,purchase' IN seq) - 1])
                         - len(replace(seq[1:position('view,click,purchase' IN seq) - 1],
                                       ',', '')) + 1 AS BIGINT)
                    ELSE NULL END AS first_match_pos
        FROM seqs
    )
    SELECT user_id, n_events, n_matches, first_match_pos
    FROM hits WHERE n_matches > 0
    """,
    doc="F30+ contiguous sequence-pattern detection (MATCH_RECOGNIZE-"
    "style, strictly adjacent steps — the stricter cousin of the F22 "
    "eventually-ordered funnel): per-user ordered event-type sequence "
    "scanned for the literal 'view,click,purchase' run; emits match "
    "count and the 1-based event position of the first match. One "
    "shuffle (groupBy user) + JVM string kernels — pattern matching "
    "over 100 TB of events is a per-key aggregate, never a self-join.",
)
def events_pattern_view_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.analytics import event_order_key

    ev = load(spark, sf_dir, "events")
    pat = "view,click,purchase"
    seqs = (
        ev.withColumn("_ok", event_order_key())
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_ok"), F.col("event_type")))
            ).alias("_s"),
        )
        .select(
            "user_id",
            F.concat_ws(",", F.expr("transform(_s, x -> x.event_type)")).alias(
                "seq"
            ),
            F.size("_s").cast("long").alias("n_events"),
        )
    )
    n_matches = (
        (F.length("seq") - F.length(F.replace(F.col("seq"), F.lit(pat))))
        / F.lit(len(pat))
    ).cast("long")
    prefix = F.expr(f"substring(seq, 1, instr(seq, '{pat}') - 1)")
    first_pos = F.when(
        F.instr(F.col("seq"), pat) > 0,
        (
            F.length(prefix)
            - F.length(F.replace(prefix, F.lit(",")))
            + F.lit(1)
        ).cast("long"),
    )
    return (
        seqs.select(
            "user_id",
            "n_events",
            n_matches.alias("n_matches"),
            first_pos.alias("first_match_pos"),
        )
        .filter(F.col("n_matches") > 0)
    )


# --------------------------------------------------------------------------
# Scale-engineering diagnostics (round 4): key-skew profile
# --------------------------------------------------------------------------
@register(
    "events_key_skew_profile",
    """
    WITH c AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT cnt,
               row_number() OVER (ORDER BY cnt, user_id) AS i,
               CAST(sum(cnt) OVER () AS BIGINT) AS total,
               count(*) OVER () AS n_keys
        FROM c
    )
    SELECT CAST(max(n_keys) AS BIGINT)                      AS n_keys,
           max(total)                                       AS n_rows,
           round(max(cnt) * 1.0 / max(total), 6)            AS top1_share,
           round(max(cnt) * 1.0
                 / (max(total) * 1.0 / max(n_keys)), 4)     AS max_over_mean,
           round(2.0 * sum(i * cnt) / (max(n_keys) * max(total))
                 - (max(n_keys) + 1.0) / max(n_keys), 6)    AS gini,
           round(-sum((cnt * 1.0 / total) * ln(cnt * 1.0 / total)), 4)
               AS entropy_nats
    FROM s
    """,
    doc="Shuffle-key skew diagnosis — the profile you run BEFORE picking "
    "a partitioning at 100 TB: per-key counts reduced to top-1 share, "
    "max/mean ratio, exact Gini (integer rank-weighted sum over the "
    "sorted counts; one window + one agg) and Shannon entropy of the "
    "key distribution. High top1/gini => salt this key (the repo's "
    "salted_join); near-uniform => hash partitioning is safe.",
)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from time_series_spark_spark.operators.rank import global_rank

    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    # Gini needs the exact key rank — the key dimension is billions at
    # 100 TB, so the rank is the range-partitioned two-pass
    # (operators/rank.py), with totals from a 1-row broadcast
    tot = c.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    s = (
        global_rank(c, [("cnt", True), ("user_id", True)], "i")
        .select("cnt", "i")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("cnt") * 1.0 / F.col("total")
    return s.agg(
        F.max("n_keys").cast("long").alias("n_keys"),
        F.max("total").cast("long").alias("n_rows"),
        F.round(F.max("cnt") * 1.0 / F.max("total"), 6).alias("top1_share"),
        F.round(
            F.max("cnt") * 1.0 / (F.max("total") * 1.0 / F.max("n_keys")), 4
        ).alias("max_over_mean"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("cnt"))
            / (F.max("n_keys") * F.max("total"))
            - (F.max("n_keys") + 1.0) / F.max("n_keys"),
            6,
        ).alias("gini"),
        F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"),
    )


@register(
    "events_interarrival_burstiness",
    f"""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY {_ORD_KEY}
               ) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(gap_us) AS BIGINT)          AS n_gaps,
           round(avg(gap_us), 2)                  AS mean_gap_us,
           round(stddev_samp(gap_us), 2)          AS sd_gap_us,
           round(stddev_samp(gap_us) / avg(gap_us), 4) AS cv,
           round((stddev_samp(gap_us) - avg(gap_us))
                 / (stddev_samp(gap_us) + avg(gap_us)), 4) AS burstiness
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
    doc="Inter-arrival burstiness per event_type: coefficient of "
    "variation and the Goh-Barabasi burstiness index B=(sigma-mu)/"
    "(sigma+mu) over lag-difference gaps (B~0 Poisson, B->1 bursty) — "
    "one window + one agg on the stream's own partitioning key",
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from time_series_spark_spark.operators.analytics import event_order_key

    ev = load(spark, sf_dir, "events").withColumn("_ok", event_order_key())
    w = Window.partitionBy("event_type").orderBy("_ok")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    mu, sd = F.avg("gap_us"), F.stddev_samp("gap_us")
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(mu, 2).alias("mean_gap_us"),
        F.round(sd, 2).alias("sd_gap_us"),
        F.round(sd / mu, 4).alias("cv"),
        F.round((sd - mu) / (sd + mu), 4).alias("burstiness"),
    )


# --------------------------------------------------------------------------
# Experiment / survival analytics (round 4)
# --------------------------------------------------------------------------
@register(
    "events_ab_welch_test",
    """
    WITH g AS (
        SELECT CAST(user_id % 2 AS INT) AS grp,
               CAST(count(*) AS BIGINT) AS n,
               avg(value)               AS mean,
               var_samp(value)          AS var
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT a.n AS n_a, b.n AS n_b,
               a.mean AS mean_a, b.mean AS mean_b,
               a.var / a.n + b.var / b.n AS se2
        FROM g a JOIN g b ON a.grp = 0 AND b.grp = 1
    )
    SELECT n_a, n_b,
           round(mean_a, 4) AS mean_a,
           round(mean_b, 4) AS mean_b,
           round(mean_b - mean_a, 4) AS lift,
           round((mean_b - mean_a) / sqrt(se2), 4) AS welch_z,
           round(mean_b - mean_a - 1.959964 * sqrt(se2), 4) AS ci_lo,
           round(mean_b - mean_a + 1.959964 * sqrt(se2), 4) AS ci_hi
    FROM w
    """,
    doc="Welch two-sample z-test (unequal variances) for an A/B split "
    "(user_id parity as assignment): lift, z statistic, 95% CI — two "
    "hash aggregates and scalar arithmetic, the experiment-analysis "
    "primitive at any scale",
)
def events_ab_welch_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy((F.col("user_id") % 2).cast("int").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    a = g.filter(F.col("grp") == 0).select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = g.filter(F.col("grp") == 1).select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    se2 = F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    lift = F.col("mean_b") - F.col("mean_a")
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round("mean_a", 4).alias("mean_a"),
        F.round("mean_b", 4).alias("mean_b"),
        F.round(lift, 4).alias("lift"),
        F.round(lift / F.sqrt(se2), 4).alias("welch_z"),
        F.round(lift - 1.959964 * F.sqrt(se2), 4).alias("ci_lo"),
        F.round(lift + 1.959964 * F.sqrt(se2), 4).alias("ci_hi"),
    )


@register(
    "users_kaplan_meier",
    """
    WITH span AS (SELECT max(ts) AS t_max FROM events),
    flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800000000
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    ),
    u AS (
        SELECT user_id, sid,
               CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                    // 60000000 AS BIGINT) AS duration_min,
               CASE WHEN max(ts) < t_max - INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS ended
        FROM sessions, span GROUP BY user_id, sid, t_max
    ),
    t AS (
        SELECT duration_min AS d,
               CAST(count(*) FILTER (WHERE ended = 1) AS BIGINT) AS deaths,
               CAST(count(*) AS BIGINT) AS leaving
        FROM u GROUP BY 1
    ),
    r AS (
        SELECT d, deaths, leaving,
               CAST(sum(leaving) OVER (ORDER BY d DESC) AS BIGINT) AS at_risk
        FROM t
    )
    SELECT d AS duration_min, deaths, at_risk,
           round(exp(sum(ln(1.0 - deaths * 1.0 / at_risk))
                     OVER (ORDER BY d)), 6) AS survival
    FROM r WHERE deaths > 0 AND deaths < at_risk
    """,
    doc="Kaplan-Meier survival estimator (Kaplan & Meier 1958) over "
    "SESSION lifetimes (30-min-gap sessions; a session still open at "
    "corpus end is right-censored): S(t) = prod(1 - d_i/n_i), computed "
    "as exp of a running ln-sum over a descending-risk window — two "
    "windows + one agg, no Python",
)
def users_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    span = ev.agg(F.max("ts").alias("t_max"))
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
             > 1_800_000_000)
            | F.lag("ts").over(wu).isNull(),
            1,
        ).otherwise(0).alias("new_s"),
    )
    sessions = flagged.withColumn(
        "sid",
        # cumsum ordered exactly like the flag window — ts alone could
        # interleave tied timestamps differently and split a session
        F.sum("new_s").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    u = (
        sessions.crossJoin(F.broadcast(span))
        .groupBy("user_id", "sid", "t_max")
        .agg(
            F.expr(
                "CAST((unix_micros(max(ts)) - unix_micros(min(ts)))"
                " DIV 60000000 AS BIGINT)"
            ).alias("duration_min"),
            F.when(
                F.max("ts") < F.expr("t_max - INTERVAL 30 MINUTE"), 1
            ).otherwise(0).alias("ended"),
        )
    )
    t = u.groupBy(F.col("duration_min").alias("d")).agg(
        F.sum(F.col("ended")).cast("long").alias("deaths"),
        F.count(F.lit(1)).cast("long").alias("leaving"),
    )
    r = t.withColumn(
        "at_risk",
        F.sum("leaving").over(Window.orderBy(F.desc("d"))).cast("long"),
    )
    surv = F.exp(
        F.sum(F.log(1.0 - F.col("deaths") * 1.0 / F.col("at_risk"))).over(
            Window.orderBy("d")
        )
    )
    return (
        r.withColumn("survival", F.round(surv, 6))
        .filter((F.col("deaths") > 0) & (F.col("deaths") < F.col("at_risk")))
        .select(
            F.col("d").alias("duration_min"), "deaths", "at_risk", "survival"
        )
    )


@register(
    "orders_decimal_exact_totals",
    """
    SELECT o_orderstatus,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
               AS total_exact,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Exact DECIMAL aggregation: money summed as DECIMAL(18,2) — "
    "order-independent, no fp association drift by construction (the "
    "alternative to this repo's integer-cents convention) — emitted as "
    "an engine-rendered string so both engines' exact decimal surfaces "
    "are compared literally",
)
def orders_decimal_exact_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("string")
        .alias("total_exact"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "events_session_window_batch",
    f"""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800000000
                      OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY {_ORD_KEY})
    ),
    s AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(min(ts) AS TIMESTAMP)       AS session_start,
           CAST(count(*) AS BIGINT)         AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="F5b native batch session_window: the built-in session-window "
    "aggregation (one groupBy, merging state machine inside the agg — "
    "no window-function pass) vs the gaps-and-islands oracle; same "
    "30-min gap as the F5/J5 pair, proving all three sessionizers "
    "agree",
)
def events_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


@register(
    "purchase_attribution_u_shaped",
    """
    WITH p AS (
        SELECT event_id AS pid, user_id, ts, value FROM events
        WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT p.pid, p.value, s.event_type AS touch, s.ts,
               count(*) OVER (PARTITION BY p.pid) AS n,
               row_number() OVER (
                   PARTITION BY p.pid
                   ORDER BY s.ts, s.event_id
               ) AS pos
        FROM p JOIN events s
          ON s.user_id = p.user_id AND s.event_type <> 'purchase'
         AND s.ts <= p.ts AND s.ts > p.ts - INTERVAL 7 DAY
    ),
    credited AS (
        SELECT touch, value,
               CASE WHEN n = 1 THEN 1.0
                    WHEN n = 2 THEN 0.5
                    WHEN pos = 1 OR pos = n THEN 0.4
                    ELSE 0.2 / (n - 2) END AS credit
        FROM touches
    )
    SELECT touch,
           round(sum(credit), 4)                AS total_credit,
           round(sum(credit * value), 2)        AS attributed_value
    FROM credited GROUP BY touch
    """,
    doc="U-shaped (position-based) multi-touch attribution: 40% first "
    "touch, 40% last, 20% spread over the middle of each purchase's "
    "7-day lookback path (the standard position-based model beside the "
    "C9 last-touch one) — one bounded range join + two windows on the "
    "purchase key",
)
def purchase_attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_uid"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("value"),
    )
    s = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("s_uid"),
        F.col("event_type").alias("touch"),
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_id"),
    )
    touches = p.join(
        s,
        (F.col("s_uid") == F.col("p_uid"))
        & (F.col("s_ts") <= F.col("p_ts"))
        & (F.col("s_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    )
    wp = Window.partitionBy("pid")
    wo = wp.orderBy("s_ts", "s_id")
    credited = touches.select(
        "touch",
        "value",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wo).alias("pos"),
    ).select(
        "touch",
        "value",
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
        .alias("credit"),
    )
    return credited.groupBy("touch").agg(
        F.round(F.sum("credit"), 4).alias("total_credit"),
        F.round(F.sum(F.col("credit") * F.col("value")), 2).alias(
            "attributed_value"
        ),
    )


@register(
    "events_ks_two_sample",
    """
    WITH s AS (
        SELECT value, CAST(user_id % 2 AS INT) AS grp FROM events
    ),
    n AS (
        SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM s
    ),
    e AS (
        SELECT value,
               sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END)
                   OVER (ORDER BY value) AS c0,
               sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                   OVER (ORDER BY value) AS c1
        FROM s
    )
    SELECT max(n0) AS n0, max(n1) AS n1,
           round(max(abs(c0 * 1.0 / n0 - c1 * 1.0 / n1)), 6) AS ks_d,
           round(max(abs(c0 * 1.0 / n0 - c1 * 1.0 / n1))
                 / sqrt((n0 + n1) * 1.0 / (n0 * n1)), 4) AS ks_scaled
    FROM e, n GROUP BY n.n0, n.n1
    """,
    doc="Kolmogorov-Smirnov two-sample statistic between the A/B value "
    "distributions: D = max |ECDF_a - ECDF_b|, exact. D changes only at "
    "distinct values, so the plan hash-reduces to per-distinct-value "
    "group counts and takes range-partitioned exact running sums "
    "(operators/rank.py two-pass construction) — bit-identical to the "
    "oracle's RANGE-framed pooled cumulative window but with no single-"
    "task global window; plus the sqrt(n0*n1/(n0+n1))-scaled statistic "
    "— the distribution-level companion to the Welch mean test",
)
def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.rank import global_cumsum

    ev = load(spark, sf_dir, "events")
    s = ev.select(
        "value", (F.col("user_id") % 2).cast("int").alias("grp")
    )
    # Exact pooled ECDF without a single-task window: D only changes at
    # DISTINCT values, and the oracle's RANGE-framed cumulative at any
    # tied row equals the cumulative at its distinct value — so reduce
    # to one row per distinct value (hash agg), then range-partitioned
    # exact running sums (operators/rank.py). Bit-identical to the
    # global ORDER BY value window, parallel at any scale.
    per_v = s.groupBy("value").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("c1"),
    )
    n = per_v.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum("c1").cast("long").alias("n1"),
    )
    e = global_cumsum(per_v, [("value", True)], ["c0", "c1"])
    d = F.abs(F.col("c0") * 1.0 / F.col("n0") - F.col("c1") * 1.0 / F.col("n1"))
    return (
        e.crossJoin(F.broadcast(n))
        .groupBy("n0", "n1")
        .agg(
            F.round(F.max(d), 6).alias("ks_d"),
            F.round(
                F.max(d)
                / F.sqrt((F.col("n0") + F.col("n1")) * 1.0 / (F.col("n0") * F.col("n1"))),
                4,
            ).alias("ks_scaled"),
        )
        .select("n0", "n1", "ks_d", "ks_scaled")
    )


@register(
    "events_chi2_independence",
    """
    WITH c AS (
        SELECT event_type, CAST(user_id % 2 AS INT) AS grp,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT c.*,
               sum(n) OVER (PARTITION BY event_type) AS n_row,
               sum(n) OVER (PARTITION BY grp) AS n_col,
               sum(n) OVER () AS n_all
        FROM c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           round(sum(power(n - n_row * 1.0 * n_col / n_all, 2)
                     / (n_row * 1.0 * n_col / n_all)), 4) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT grp) - 1) AS BIGINT) AS dof
    FROM m
    """,
    doc="Chi-square test of independence between event_type and the A/B "
    "assignment: observed vs expected cell counts from the two marginal "
    "windows, chi2 = sum (O-E)^2/E — contingency analysis as three "
    "windows + one agg, no Python",
)
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = c.select(
        "*",
        F.sum("n").over(Window.partitionBy("event_type")).alias("n_row"),
        F.sum("n").over(Window.partitionBy("grp")).alias("n_col"),
        F.sum("n").over(Window.partitionBy()).alias("n_all"),
    )
    exp = F.col("n_row") * 1.0 * F.col("n_col") / F.col("n_all")
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias("chi2"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("grp") - 1)
        ).cast("long").alias("dof"),
    )


@register(
    "events_mann_whitney_u",
    """
    WITH s AS (
        SELECT value, CAST(user_id % 2 AS INT) AS grp FROM events
    ),
    r AS (
        SELECT grp,
               avg(rn) OVER (PARTITION BY value) AS avg_rank
        FROM (SELECT grp, value,
                     row_number() OVER (ORDER BY value, grp) AS rn
              FROM s) t
    ),
    agg AS (
        SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
               CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               sum(CASE WHEN grp = 0 THEN avg_rank ELSE 0 END) AS r0
        FROM r
    )
    SELECT n0, n1,
           round(r0 - n0 * (n0 + 1.0) / 2, 2) AS u_stat,
           round((r0 - n0 * (n0 + 1.0) / 2) / (n0 * 1.0 * n1), 6)
               AS auc_effect
    FROM agg
    """,
    doc="Mann-Whitney U rank-sum test between the A/B value samples: "
    "tie-corrected average ranks reduced to the distinct-value frame "
    "(avg_rank = prefix count + (ties+1)/2, an exact fp half) with the "
    "prefix from the operators/rank.py range-partitioned running count "
    "— no row-scale global rank window, bit-identical to the row-level "
    "oracle formulation; U statistic and the U/(n0*n1) common-language "
    "effect size (= P(X0 > X1), the AUC reading) — the nonparametric "
    "companion to Welch (means) and KS (distributions)",
)
def events_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.rank import global_cumsum

    ev = load(spark, sf_dir, "events")
    s = ev.select("value", (F.col("user_id") % 2).cast("int").alias("grp"))
    # Tie-averaged ranks depend only on the DISTINCT value: avg_rank(v)
    # = s + (t+1)/2 with s = #rows below v, t = ties at v — both from a
    # hash reduce + the range-partitioned exact running count
    # (operators/rank.py), no row-scale global rank window. Exactness:
    # avg_rank is an exact fp half (x.0/x.5) and every product/sum here
    # stays under 2^52, so r0 is BIT-IDENTICAL to the oracle's
    # row-level avg-of-row_number formulation regardless of summation
    # order.
    per_v = s.groupBy("value").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("c0"),
        F.count(F.lit(1)).alias("ct"),
    )
    cum = global_cumsum(
        per_v.withColumn("cum_t", F.col("ct")), [("value", True)], ["cum_t"]
    )
    avg_rank = (
        (F.col("cum_t") - F.col("ct")) + (F.col("ct") + 1) / 2.0
    )
    agg = cum.agg(
        F.sum("c0").cast("long").alias("n0"),
        F.sum(F.col("ct") - F.col("c0")).cast("long").alias("n1"),
        F.sum(F.col("c0") * avg_rank).alias("r0"),
    )
    u = F.col("r0") - F.col("n0") * (F.col("n0") + 1.0) / 2
    return agg.select(
        "n0",
        "n1",
        F.round(u, 2).alias("u_stat"),
        F.round(u / (F.col("n0") * 1.0 * F.col("n1")), 6).alias("auc_effect"),
    )


@register(
    "events_trimmed_mean_by_type",
    """
    WITH r AS (
        SELECT event_type, value,
               percent_rank() OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS pr
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(value), 4)     AS trimmed_mean
    FROM r WHERE pr >= 0.1 AND pr <= 0.9
    GROUP BY event_type
    """,
    doc="10% two-sided trimmed mean of value per event_type (the robust "
    "location estimate): percent_rank with a deterministic (value, "
    "event_id) tiebreak defines the trim identically in both engines — "
    "one window + one agg",
)
def events_trimmed_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.rank import grouped_rank

    ev = load(spark, sf_dir, "events")
    # per-type percent_rank from the grouped two-pass (operators/rank.py)
    # — PARTITION BY event_type is ~5 corpus-scale tasks; with a unique
    # tiebreaker rank() == row_number(), so pr = (rnk-1)/(n-1) is the
    # same double both engines' percent_rank computes (0.0 when n = 1)
    r = grouped_rank(
        ev.select("event_type", "value", "event_id"),
        ["event_type"],
        [("value", True), ("event_id", True)],
        "rnk",
        total_col="n",
    ).select(
        "event_type",
        "value",
        F.expr(
            "CASE WHEN n = 1 THEN 0.0"
            " ELSE (rnk - 1) / CAST(n - 1 AS DOUBLE) END"
        ).alias("pr"),
    )
    return (
        r.filter((F.col("pr") >= 0.1) & (F.col("pr") <= 0.9))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("value"), 4).alias("trimmed_mean"),
        )
    )


@register(
    "cohort_ltv_curve",
    """
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
        FROM events GROUP BY user_id
    ),
    rev AS (
        SELECT e.user_id, f.cohort,
               CAST((epoch_us(date_trunc('week', e.ts))
                     - epoch_us(f.cohort)) // 604800000000 AS INT) AS wk,
               CAST(round(e.value * 100) AS BIGINT) AS cents
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
    ),
    wkrev AS (
        SELECT cohort, wk, CAST(sum(cents) AS BIGINT) AS cents
        FROM rev GROUP BY 1, 2
    ),
    sized AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
        FROM first_seen GROUP BY cohort
    )
    SELECT w.cohort, w.wk, s.cohort_users,
           CAST(sum(w.cents) OVER (PARTITION BY w.cohort ORDER BY w.wk)
                AS BIGINT) AS cum_cents,
           round(CAST(sum(w.cents) OVER (PARTITION BY w.cohort ORDER BY w.wk)
                      AS DOUBLE) / s.cohort_users / 100.0, 4)
               AS ltv_per_user
    FROM wkrev w JOIN sized s ON w.cohort = s.cohort
    """,
    doc="Cohort LTV curve: cumulative purchase revenue per signup-week "
    "cohort at each week offset, divided by cohort size — the "
    "money-side companion of the F21 retention triangle; integer-cents "
    "cumulative window, one fp division at the end",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            F.expr(
                "CAST((unix_micros(date_trunc('week', ts)) - "
                "unix_micros(cohort)) DIV 604800000000 AS INT)"
            ).alias("wk"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    wkrev = rev.groupBy("cohort", "wk").agg(F.sum("cents").alias("cents"))
    sized = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    w = Window.partitionBy("cohort").orderBy("wk")
    return (
        wkrev.join(sized, "cohort")
        .withColumn("cum_cents", F.sum("cents").over(w).cast("long"))
        .select(
            "cohort",
            "wk",
            "cohort_users",
            "cum_cents",
            F.round(
                F.col("cum_cents").cast("double")
                / F.col("cohort_users")
                / 100.0,
                4,
            ).alias("ltv_per_user"),
        )
    )


@register(
    "view_to_purchase_latency",
    """
    WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id,
               CAST(min(epoch_us(e.ts)) - v.first_view AS BIGINT)
                   AS latency_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) >= v.first_view
        GROUP BY e.user_id, v.first_view
    )
    , r AS (
        SELECT latency_us,
               row_number() OVER (ORDER BY latency_us) AS rn,
               count(*) OVER () AS n
        FROM p
    )
    SELECT CAST(max(n) AS BIGINT) AS n_converted,
           CAST(min(latency_us) AS BIGINT) AS min_us,
           CAST(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
                         THEN latency_us END) AS BIGINT) AS median_us,
           CAST(max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
                         THEN latency_us END) AS BIGINT) AS p90_us
    FROM r
    """,
    doc="Conversion latency: per user, first purchase at-or-after the "
    "first view; median/p90 of the gap as NEAREST-RANK order statistics "
    "(exact integers — interpolated percentiles differ by a half-ulp "
    "across engines and flip integer truncation)",
)
def view_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_view")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.unix_micros("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(
            (F.min(F.unix_micros("ts")) - F.col("first_view")).alias(
                "latency_us"
            )
        )
    )
    # nearest-rank order statistics (ceil(q*n)-th value): exact integers
    # in both engines — interpolated percentiles land a half-ulp apart
    # across engines and flip integer truncation
    from time_series_spark_spark.operators.rank import global_rank

    # conversion-pair frame is row-scale: exact rank picks via the
    # range-partitioned two-pass (operators/rank.py); ties in
    # latency_us are pick-safe (any rank in a tie class reads the
    # same value)
    r = global_rank(
        p.select("latency_us"), [("latency_us", True)], "rn", total_col="n"
    )
    pick = lambda q: F.max(  # noqa: E731 — tiny local helper
        F.when(
            F.col("rn") == F.ceil(F.col("n") * q).cast("long"),
            F.col("latency_us"),
        )
    ).cast("long")
    return r.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.min("latency_us").cast("long").alias("min_us"),
        pick(0.5).alias("median_us"),
        pick(0.9).alias("p90_us"),
    )


@register(
    "events_id_gap_audit",
    """
    WITH s AS (
        SELECT event_id,
               lag(event_id) OVER (ORDER BY event_id) AS prev_id
        FROM events
    )
    SELECT CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(coalesce(sum(event_id - prev_id - 1), 0) AS BIGINT)
               AS n_missing_ids,
           CAST(coalesce(max(event_id - prev_id - 1), 0) AS BIGINT)
               AS longest_run
    FROM s WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    """,
    doc="Sequence-id gap audit (ingestion-loss detector): missing-id runs "
    "in the event_id sequence — count of gaps, total missing ids, "
    "longest run; all integer, fully deterministic. Scale shape: range-"
    "partition by event_id, lag within partitions, recover the one "
    "missing pair per partition boundary from the bounded per-partition "
    "(min, max) frame (operators/rank.py global_lag_gaps) — no single-"
    "task global lag window",
)
def events_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.rank import global_lag_gaps

    ev = load(spark, sf_dir, "events").select("event_id")
    g = global_lag_gaps(ev, "event_id")
    return g.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.coalesce(
            F.sum(F.col("event_id") - F.col("prev_id") - 1), F.lit(0)
        ).cast("long").alias("n_missing_ids"),
        F.coalesce(
            F.max(F.col("event_id") - F.col("prev_id") - 1), F.lit(0)
        ).cast("long").alias("longest_run"),
    )


@register(
    "events_value_iqr_outliers",
    """
    WITH r AS (
        SELECT event_type, event_id, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    q AS (
        SELECT event_type,
               max(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT)
                        THEN value END) AS q1,
               max(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT)
                        THEN value END) AS q3
        FROM r GROUP BY event_type
    )
    SELECT r.event_type,
           CAST(count(*) AS BIGINT) AS n_outliers,
           round(min(r.value), 4)   AS min_outlier,
           round(max(r.value), 4)   AS max_outlier,
           round(max(q.q1), 4)      AS q1,
           round(max(q.q3), 4)      AS q3
    FROM r JOIN q ON r.event_type = q.event_type
    WHERE r.value < q.q1 - 1.5 * (q.q3 - q.q1)
       OR r.value > q.q3 + 1.5 * (q.q3 - q.q1)
    GROUP BY r.event_type
    """,
    doc="Tukey IQR outlier detection per event type: quartiles as "
    "NEAREST-RANK order statistics (the integer-exact dialect rule), "
    "1.5*IQR fences, per-type outlier counts and extremes — one window "
    "+ one broadcast-back join; events.value is right-tailed so the "
    "fences genuinely fire (~470 outliers at sf0.01)",
)
def events_value_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from time_series_spark_spark.operators.rank import grouped_rank

    ev = load(spark, sf_dir, "events")
    # per-type exact ranks via the grouped two-pass (operators/rank.py)
    # — no corpus-scale per-type window task
    r = grouped_rank(
        ev.select("event_type", "event_id", "value"),
        ["event_type"],
        [("value", True), ("event_id", True)],
        "rn",
        total_col="n",
    ).select("event_type", "event_id", "value", "rn", "n")
    q = r.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.25).cast("long"),
                F.col("value"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.75).cast("long"),
                F.col("value"),
            )
        ).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        r.join(F.broadcast(q), "event_type")
        .filter(
            (F.col("value") < F.col("q1") - 1.5 * iqr)
            | (F.col("value") > F.col("q3") + 1.5 * iqr)
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.round(F.min("value"), 4).alias("min_outlier"),
            F.round(F.max("value"), 4).alias("max_outlier"),
            F.round(F.max("q1"), 4).alias("q1"),
            F.round(F.max("q3"), 4).alias("q3"),
        )
    )


@register(
    "events_dow_hour_heatmap",
    """
    SELECT CAST((dayofweek(ts) + 1) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hr,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1, 2
    """,
    doc="Activity heatmap: counts and integer-cents value per (day-of-"
    "week, hour) cell — the first exploratory cut of any event stream; "
    "oracle normalizes DuckDB's 0=Sunday dayofweek to Spark's 1=Sunday",
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )


@register(
    "docs_length_log_histogram",
    """
    SELECT CAST(CASE WHEN n_chars <= 0 THEN 0
                     ELSE floor(ln(n_chars) / ln(2)) END AS INT)
               AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY 1
    """,
    doc="Log2-bucketed document-length histogram — the standard corpus "
    "length profile (lengths span orders of magnitude; linear buckets "
    "hide the tail); floor(ln/ln 2) of exact integers agrees across "
    "engines away from exact powers of two, and n_chars boundaries are "
    "covered by the min/max columns",
)
def docs_length_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    b = F.when(F.col("n_chars") <= 0, 0).otherwise(
        F.floor(F.log(F.col("n_chars").cast("double")) / F.log(F.lit(2.0)))
    ).cast("int")
    return d.groupBy(b.alias("log2_bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


@register(
    "events_compaction_plan",
    None,  # file-layout planning is not SQL-expressible → rows-only;
    # cover/fit/determinism laws pinned in tests/test_quality.py
    doc="A10 small-file compaction planner: events written as 64 small "
    "files (the degenerate layout streaming ingestion produces), then "
    "per-file sizes from the directory listing are FFD-bin-packed into "
    "merge groups capped at 4× the mean file size (adaptive so the plan "
    "exercises real grouping at every test scale; in production the cap "
    "is the fixed target file size, e.g. 1 GiB). Planning touches only "
    "metadata "
    "(n_files rows); executing a group is one read+coalesce+write per "
    "group, embarrassingly parallel. Report: one row per group with "
    "file count and bytes — the shape of OPTIMIZE/compact on any lake "
    "format, without needing a table format. Deterministic because the "
    "written layout is (hash-partition, sortWithinPartitions) fixed",
)
def events_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    from time_series_spark_spark.sources.quality import plan_compaction

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    path = tempfile.mkdtemp(prefix="compact_events_")
    try:
        # deterministic small-file layout: fixed hash partitioning and an
        # in-partition sort pin both file contents and therefore byte sizes
        (
            ev.repartition(64, "event_id")
            .sortWithinPartitions("event_id")
            .write.mode("overwrite")
            .parquet(path)
        )
        sizes = [
            (os.path.basename(f), os.path.getsize(f))
            for f in glob.glob(path + "/*.parquet")
        ]
    finally:
        shutil.rmtree(path, ignore_errors=True)
    target = max(4 * sum(s for _, s in sizes) // max(len(sizes), 1), 1)
    plan = plan_compaction(sizes, target_bytes=target)
    pdf = local_df(spark, 
        plan, "file string, group_id int, bytes long"
    )
    return (
        pdf.groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("bytes").cast("long").alias("total_bytes"),
        )
        .orderBy("group_id")
    )


# --------------------------------------------------------------------------
# Poisson bootstrap (round 5): single-pass resampling CI
# --------------------------------------------------------------------------
# Poisson(1) inverse-CDF ladder, computed once so the SAME repr literals
# appear in the Spark expressions and the DuckDB oracle SQL — with the
# md5-uniform bit-identical across engines, the replicate weights are
# exactly equal everywhere.
import math as _math

_POIS1_CDF: list[float] = []
_t, _f = 0.0, 1.0
for _k in range(9):
    if _k > 0:
        _f *= _k
    _t += _math.exp(-1.0) / _f
    _POIS1_CDF.append(_t)

_BOOT_R = 200  # replicates; 95% CI = nearest-rank 5 / 195 of 200

_BOOT_LADDER_SQL = " ".join(
    f"WHEN u < {t!r} THEN {k}" for k, t in enumerate(_POIS1_CDF)
)


@register(
    "events_bootstrap_ci",
    f"""
    WITH u AS (
        SELECT event_type, value, j,
               ('0x' || substring(md5('bs:' || CAST(event_id AS VARCHAR)
                   || ':' || CAST(j AS VARCHAR)), 1, 8))::BIGINT
                   / 4294967296.0 AS u
        FROM (SELECT event_type, value, event_id FROM events
              WHERE event_type IN ('purchase', 'view')) e
        CROSS JOIN range({_BOOT_R}) r(j)
    ),
    rep AS (
        SELECT event_type, value, j,
               CASE {_BOOT_LADDER_SQL} ELSE 9 END AS w
        FROM u
    ),
    m AS (
        SELECT event_type, j,
               round(sum(w * value) / sum(w), 6) AS mean_j
        FROM rep GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, j, mean_j,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY mean_j, j) AS rk
        FROM m
    ),
    s AS (
        SELECT event_type,
               round(stddev_samp(mean_j), 4) AS boot_se,
               max(CASE WHEN rk = 5 THEN mean_j END) AS lo,
               max(CASE WHEN rk = 195 THEN mean_j END) AS hi
        FROM r GROUP BY 1
    ),
    b AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
               round(avg(value), 4) AS mean_obs
        FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1
    )
    SELECT b.event_type, b.n_rows, b.mean_obs, s.boot_se,
           round(s.lo, 4) AS ci_lo, round(s.hi, 4) AS ci_hi
    FROM b JOIN s ON b.event_type = s.event_type
    """,
    doc="Poisson bootstrap 95% CI for the mean (per event type): each "
    "(row, replicate) draws a Poisson(1) weight from the md5-uniform via "
    "an inverse-CDF ladder — the single-pass resampling scheme used at "
    "cluster scale, since per-replicate partial sums map-side-combine to "
    "types x R cells and the shuffle never carries raw rows. Replicate "
    "means are rounded to 6dp BEFORE nearest-rank ranking (ties break on "
    "replicate id) so fp association drift cannot reorder engines; "
    "deterministic by construction — no RNG, the weights are a pure "
    "function of (event_id, replicate)",
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from time_series_spark_spark.operators.packed import fan_out

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select("event_type", "event_id", "value")
    )
    # the xR replicate explode + per-cell md5 is the whole cost of this
    # query; fan the slim scan out so it isn't serialized on the input's
    # split count (no-op when the scan has enough splits — guide §2.5)
    rep = fan_out(ev).withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1)))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bs:"),
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.when(u < _POIS1_CDF[0], 0)
    for _kk, _tt in enumerate(_POIS1_CDF[1:], start=1):
        w = w.when(u < _tt, _kk)
    w = w.otherwise(9)
    rep = rep.withColumn("w", w)
    m = rep.groupBy("event_type", "j").agg(
        F.round(
            F.sum(F.col("w") * F.col("value")) / F.sum("w"), 6
        ).alias("mean_j")
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy("mean_j", "j")
    )
    s = (
        m.withColumn("rk", rk)
        .groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("mean_j"), 4).alias("boot_se"),
            F.max(F.when(F.col("rk") == 5, F.col("mean_j"))).alias("lo"),
            F.max(F.when(F.col("rk") == 195, F.col("mean_j"))).alias("hi"),
        )
    )
    b = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg("value"), 4).alias("mean_obs"),
    )
    return b.join(s, on="event_type").select(
        "event_type",
        "n_rows",
        "mean_obs",
        "boot_se",
        F.round("lo", 4).alias("ci_lo"),
        F.round("hi", 4).alias("ci_hi"),
    )


@register(
    "explain_analyze_report",
    None,  # executed-plan metrics are engine-internal → rows-only;
    # determinism + row-count ground truth pinned in tests/test_plans.py
    doc="EXPLAIN ANALYZE (runtime profiler): executes the orders⋈customer "
    "revenue roll-up and reports each physical operator that actually ran "
    "with its EXECUTED output-row count and files read — AQE wrappers "
    "unwrapped to the final adaptive plan, counts taken from SQLMetrics "
    "where the rows were produced (plan.execute().count() is a pure "
    "JVM-side action; nothing is collected to the driver). The runtime "
    "counterpart of the static plan pins in tests/test_plans.py "
    "(plans/metrics.py)",
)
def explain_analyze_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.plans.metrics import explain_analyze

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    pipeline = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    return explain_analyze(pipeline).orderBy("op_seq")


@register(
    "events_theil_sen_trend",
    """
    WITH daily AS (
        SELECT user_id,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               round(sum(value), 6) AS y
        FROM events GROUP BY 1, 2
    ),
    pair AS (
        SELECT a.user_id, (b.y - a.y) / (b.x - a.x) AS s
        FROM daily a JOIN daily b
          ON a.user_id = b.user_id AND a.x < b.x
    ),
    sr AS (
        SELECT user_id, s,
               row_number() OVER (PARTITION BY user_id ORDER BY s) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM pair
    ),
    m AS (
        SELECT user_id, s AS m FROM sr
        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    ),
    res AS (
        SELECT d.user_id, m.m, d.y - m.m * d.x AS r
        FROM daily d JOIN m ON d.user_id = m.user_id
    ),
    rr AS (
        SELECT user_id, m, r,
               row_number() OVER (PARTITION BY user_id ORDER BY r) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM res
    ),
    fit AS (
        SELECT user_id, m, r AS b0, n AS n_points FROM rr
        WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    )
    SELECT user_id, round(m + 1e-9, 4) AS slope,
           round(b0 + 1e-9, 4) AS intercept,
           CAST(n_points AS BIGINT) AS n_points
    FROM fit
    """,
    doc="Theil-Sen robust trend per user over daily value sums: slope = "
    "median of C(days,2) pairwise slopes, intercept = median residual "
    "(Sen 1968; 29% breakdown point vs OLS's 0) — one co-partitioned "
    "self-join per series with pair count bounded by days² per user, "
    "never corpus² (operators/analytics.py::theil_sen_trend). Day sums "
    "are rounded before slope arithmetic, and both medians are "
    "NEAREST-RANK order statistics — the selected element is identical "
    "in both engines, where interpolated medians drift by ulps",
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.analytics import theil_sen_trend

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.unix_date(F.to_date("ts")).cast("long").alias("x")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    return theil_sen_trend(daily, "user_id", "x", "y")


@register(
    "events_diff_in_diff",
    """
    WITH cells AS (
        SELECT CAST(user_id % 2 AS INT) AS grp,
               CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
                    THEN 1 ELSE 0 END AS post,
               avg(value) AS mean_v,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    wide AS (
        SELECT
            max(CASE WHEN grp = 1 AND post = 1 THEN mean_v END) AS t_post,
            max(CASE WHEN grp = 1 AND post = 0 THEN mean_v END) AS t_pre,
            max(CASE WHEN grp = 0 AND post = 1 THEN mean_v END) AS c_post,
            max(CASE WHEN grp = 0 AND post = 0 THEN mean_v END) AS c_pre,
            CAST(sum(n) AS BIGINT) AS n_events
        FROM cells
    )
    SELECT round(t_pre, 4) AS treat_pre, round(t_post, 4) AS treat_post,
           round(c_pre, 4) AS ctrl_pre, round(c_post, 4) AS ctrl_post,
           round((t_post - t_pre) - (c_post - c_pre), 4) AS did_estimate,
           n_events
    FROM wide
    """,
    doc="Difference-in-differences: treatment (user parity) vs control "
    "means across a fixed pre/post split of the corpus month — the "
    "causal-inference baseline when assignment isn't randomized per "
    "exposure; ONE hash aggregate over (group, period) cells, then "
    "scalar arithmetic. The parallel-trends subtraction removes any "
    "group-level level difference",
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        (F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
        .cast("int")
        .alias("post"),
    ).agg(F.avg("value").alias("mean_v"), F.count(F.lit(1)).alias("n"))
    pick = lambda g, p: F.max(  # noqa: E731
        F.when((F.col("grp") == g) & (F.col("post") == p), F.col("mean_v"))
    )
    wide = cells.agg(
        pick(1, 1).alias("t_post"),
        pick(1, 0).alias("t_pre"),
        pick(0, 1).alias("c_post"),
        pick(0, 0).alias("c_pre"),
        F.sum("n").alias("n_events"),
    )
    return wide.select(
        F.round("t_pre", 4).alias("treat_pre"),
        F.round("t_post", 4).alias("treat_post"),
        F.round("c_pre", 4).alias("ctrl_pre"),
        F.round("c_post", 4).alias("ctrl_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            4,
        ).alias("did_estimate"),
        "n_events",
    )


@register(
    "events_cuped_adjusted_ab",
    """
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
               avg(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'
                        THEN value END) AS x,
               avg(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16'
                        THEN value END) AS y
        FROM events GROUP BY 1, 2
    ),
    complete AS (
        SELECT * FROM per_user WHERE x IS NOT NULL AND y IS NOT NULL
    ),
    theta AS (
        SELECT covar_samp(x, y) / var_samp(x) AS th, avg(x) AS mx
        FROM complete
    ),
    adj AS (
        SELECT c.grp, c.y, c.y - t.th * (c.x - t.mx) AS y_adj
        FROM complete c CROSS JOIN theta t
    )
    SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
           round(avg(y), 4) AS mean_raw,
           round(avg(y_adj), 4) AS mean_cuped,
           round(var_samp(y_adj) / var_samp(y), 4) AS var_ratio
    FROM adj GROUP BY grp
    """,
    doc="CUPED variance reduction (Deng et al. WSDM'13): per-user "
    "pre-period mean as the covariate, theta = cov(x,y)/var(x) pooled, "
    "adjusted metric y - theta*(x - E[x]) — the industry-standard A/B "
    "sensitivity boost; two hash aggregates (per-user reduce, then "
    "moments) + a broadcast scalar join, var_ratio < 1 quantifies the "
    "won sensitivity",
)
def events_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("grp")
    ).agg(
        F.avg(F.when(F.col("ts") < cut, F.col("value"))).alias("x"),
        F.avg(F.when(F.col("ts") >= cut, F.col("value"))).alias("y"),
    )
    complete = per_user.filter(
        F.col("x").isNotNull() & F.col("y").isNotNull()
    )
    theta = complete.agg(
        (F.covar_samp("x", "y") / F.var_samp("x")).alias("th"),
        F.avg("x").alias("mx"),
    )
    adj = complete.crossJoin(F.broadcast(theta)).select(
        "grp",
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))).alias(
            "y_adj"
        ),
    )
    return adj.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("y"), 4).alias("mean_raw"),
        F.round(F.avg("y_adj"), 4).alias("mean_cuped"),
        F.round(F.var_samp("y_adj") / F.var_samp("y"), 4).alias(
            "var_ratio"
        ),
    )


@register(
    "events_new_vs_returning_daily",
    """
    WITH first_seen AS (
        SELECT user_id,
               min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP))
                   AS TIMESTAMP)) AS first_day
        FROM events GROUP BY user_id
    ),
    tagged AS (
        SELECT CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP))
                    AS TIMESTAMP) AS d,
               e.user_id,
               CASE WHEN CAST(date_trunc('day', CAST(e.ts AS TIMESTAMP))
                         AS TIMESTAMP) = f.first_day
                    THEN 1 ELSE 0 END AS is_new
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT d,
           CAST(count(DISTINCT CASE WHEN is_new = 1 THEN user_id END)
                AS BIGINT) AS new_users,
           CAST(count(DISTINCT CASE WHEN is_new = 0 THEN user_id END)
                AS BIGINT) AS returning_users
    FROM tagged GROUP BY d
    """,
    doc="New-vs-returning daily split: each user's first-seen day from "
    "one per-user reduce, then every event day tags its users against "
    "it — two hash aggregates co-partitioned on user_id (the first-seen "
    "frame is per-user, so the join moves one row per user, the "
    "standard growth-accounting decomposition)",
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("d").alias("first_day"))
    tagged = ev.join(first_seen, on="user_id").withColumn(
        "is_new", (F.col("d") == F.col("first_day")).cast("int")
    )
    return tagged.groupBy("d").agg(
        F.countDistinct(
            F.when(F.col("is_new") == 1, F.col("user_id"))
        ).alias("new_users"),
        F.countDistinct(
            F.when(F.col("is_new") == 0, F.col("user_id"))
        ).alias("returning_users"),
    )


@register(
    "events_ab_power_mde",
    """
    WITH g AS (
        SELECT CAST(user_id % 2 AS INT) AS grp,
               CAST(count(*) AS BIGINT) AS n,
               var_samp(value) AS var
        FROM events GROUP BY 1
    ),
    pooled AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_total,
               min(n) AS n_min,
               sum((n - 1) * var) / sum(n - 1) AS var_pooled
        FROM g
    )
    SELECT n_total, CAST(n_min AS BIGINT) AS n_per_arm,
           round(var_pooled, 4) AS var_pooled,
           round((1.959964 + 0.841621)
                 * sqrt(2.0 * var_pooled / n_min), 4) AS mde_abs,
           round((1.959964 + 1.281552)
                 * sqrt(2.0 * var_pooled / n_min), 4) AS mde_abs_90
    FROM pooled
    """,
    doc="A/B power analysis: minimum detectable effect at alpha=0.05 "
    "two-sided with 80% and 90% power — MDE = (z_a + z_b) * "
    "sqrt(2*var/n) on the pooled variance, the pre-experiment sizing "
    "check beside the Welch test; one hash aggregate + scalar math "
    "(z literals identical in both engines)",
)
def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    g = ev.groupBy((F.col("user_id") % 2).cast("int").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"), F.var_samp("value").alias("var")
    )
    pooled = g.agg(
        F.sum("n").alias("n_total"),
        F.min("n").alias("n_min"),
        (
            F.sum((F.col("n") - 1) * F.col("var"))
            / F.sum(F.col("n") - 1)
        ).alias("var_pooled"),
    )
    mde = lambda zb: F.round(  # noqa: E731
        (1.959964 + zb) * F.sqrt(2.0 * F.col("var_pooled") / F.col("n_min")),
        4,
    )
    return pooled.select(
        "n_total",
        F.col("n_min").cast("long").alias("n_per_arm"),
        F.round("var_pooled", 4).alias("var_pooled"),
        mde(0.841621).alias("mde_abs"),
        mde(1.281552).alias("mde_abs_90"),
    )


# ---------------------------------------------------------------------------
# F85 cohort LTV curves
# ---------------------------------------------------------------------------
@register(
    "cohort_ltv_curves",
    """
    WITH p AS (
        SELECT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS w,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    firsts AS (SELECT user_id, min(w) AS cohort FROM p GROUP BY user_id),
    sizes AS (SELECT cohort, count(*) AS n_users FROM firsts GROUP BY cohort),
    rev AS (
        SELECT firsts.cohort,
               CAST(date_diff('day', firsts.cohort, p.w) // 7 AS BIGINT)
                   AS age_weeks,
               CAST(sum(p.cents) AS BIGINT) AS cents
        FROM p JOIN firsts ON p.user_id = firsts.user_id
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort, age_weeks, cents,
               CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age_weeks)
                    AS BIGINT) AS cum_cents
        FROM rev
    )
    SELECT cum.cohort AS cohort, age_weeks, n_users,
           cents AS week_cents, cum_cents,
           round(cum_cents * 1.0 / n_users, 4) AS ltv_cents_per_user
    FROM cum JOIN sizes ON cum.cohort = sizes.cohort
    ORDER BY cum.cohort, age_weeks
    """,
    doc="F85 cohort lifetime-value curves: users grouped by first-"
    "purchase week, cumulative purchase revenue per cohort-age divided "
    "by cohort size — the LTV panel beside F21's retention counts. "
    "Purchases reduce to (cohort, age) BEFORE the cumulative window, so "
    "the window sees cohorts x ages rows; the cohort-size join is "
    "broadcast-small. Exact integer cents; the per-user division is "
    "one IEEE-exact ratio.",
)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("week", "ts").alias("w"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    firsts = p.groupBy("user_id").agg(F.min("w").alias("cohort"))
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    rev = (
        p.join(firsts, on="user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("w"), F.col("cohort"))
             / F.lit(7)).cast("long").alias("age_weeks"),
        )
        .agg(F.sum("cents").alias("week_cents"))
    )
    cum = rev.withColumn(
        "cum_cents",
        F.sum("week_cents").over(
            W.partitionBy("cohort").orderBy("age_weeks")
        ),
    )
    return (
        cum.join(F.broadcast(sizes), on="cohort")
        .select(
            "cohort", "age_weeks", "n_users", "week_cents", "cum_cents",
            F.round(F.col("cum_cents") * 1.0 / F.col("n_users"), 4).alias(
                "ltv_cents_per_user"
            ),
        )
        .orderBy("cohort", "age_weeks")
    )


@register(
    "events_swinging_door_user",
    None,  # sequential two-door recursion per series → rows-only; the
    # reconstruction-error bound is the pinned property in tests
    doc="F89 swinging-door trending compression (Bristol 1990; the "
    "PI-historian deadband compressor): per-user daily value series "
    "reduced to the minimal-ish point set whose linear interpolation "
    "reconstructs every dropped point within ±$20 (noisy i.i.d.-ish daily sums compress ~17% — the bound, not the ratio, is the contract) — the error-"
    "BOUNDED downsampler beside LTTB (fixed budget) and M4 (pixel "
    "min/max). Day-grain reduce first, then the packed grouped-map "
    "path: one hash shuffle on user, many series per Arrow batch "
    "(operators/analytics.py::swinging_door).",
)
def events_swinging_door_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.analytics import swinging_door

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).agg(
        (F.round(F.sum(F.round(F.col("value") * 100, 0)), 0) / 100.0)
        .alias("v")
    )
    return swinging_door(daily, "d", "v", ["user_id"], tolerance=20.0).orderBy(
        "user_id", "d"
    )


@register(
    "orders_dpp_pruned_join",
    # round 11 (rows-only → oracle-backed): the selected years are the 2
    # smallest distinct order years — a closed-form relational spec; the
    # dpp_active literal 1 makes the oracle ENFORCE that the executed
    # plan contained a DynamicPruningExpression (a plan regression now
    # hash-mismatches instead of passing rows-only).
    """
    WITH y AS (SELECT DISTINCT year(o_orderdate) AS yr FROM orders),
    sel AS (SELECT yr FROM y ORDER BY yr LIMIT 2)
    SELECT (SELECT count(*) FROM y) AS n_years_total,
           CAST(2 AS BIGINT) AS n_years_selected,
           count(*) AS n_rows_selected,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents_selected,
           CAST(1 AS INT) AS dpp_active
    FROM orders WHERE year(o_orderdate) IN (SELECT yr FROM sel)
    """,
    doc="A16 dynamic partition pruning, driver-visible: orders written "
    "hive-partitioned by order YEAR, then joined to a small filtered "
    "year dimension — Catalyst injects the dim's build-side keys as a "
    "runtime partition filter (DynamicPruningExpression) so the fact "
    "scan reads ONLY the matching partition directories. At 100 TB "
    "this is the difference between scanning 2 of 7 years and all of "
    "them; the report row carries the selected-year aggregate plus the "
    "plan verdict, and tests/test_plans.py pins the pruning expression "
    "in the executed plan.",
)
def orders_dpp_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.year("o_orderdate").alias("o_year"),
    )
    path = tempfile.mkdtemp(prefix="dpp_orders_")
    try:
        orders.write.mode("overwrite").partitionBy("o_year").parquet(path)
        fact = spark.read.parquet(path)
        years = [r["o_year"] for r in fact.select("o_year").distinct().collect()]
        # NOT local_df: a LocalRelation build side gets its selective
        # Filter constant-folded away (ConvertToLocalRelation), and the
        # DPP rule then sees no selective predicate and never injects
        # DynamicPruningExpression — dpp_active would report 0. The
        # RDD-backed frame keeps the Filter node so pruning fires.
        dim = spark.createDataFrame(
            [(y, 1 if y in sorted(years)[:2] else 0) for y in years],
            "d_year int, is_selected int",
        )
        joined = fact.join(
            F.broadcast(dim.filter(F.col("is_selected") == 1)),
            fact["o_year"] == F.col("d_year"),
        )
        agg = joined.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows_selected"),
            F.sum("cents").cast("long").alias("cents_selected"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        row = agg.collect()[0]
        return local_df(spark, 
            [
                (
                    len(years),
                    2,
                    row["n_rows_selected"],
                    row["cents_selected"],
                    int("dynamicpruning" in plan.lower()),
                )
            ],
            "n_years_total long, n_years_selected long, "
            "n_rows_selected long, cents_selected long, dpp_active int",
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# A17: small-file compaction report (maintenance op, rows-only)
# --------------------------------------------------------------------------
@register(
    "orders_compaction_report",
    None,  # file-layout maintenance is not SQL-expressible → rows-only;
    # row-identity + layout assertions pinned in tests/test_quality.py
    doc="A17 small-file compaction, driver-visible: orders written "
    "deliberately fragmented (64 shuffle files — the streaming-"
    "micro-batch failure mode), then compact_parquet (sources/io.py) "
    "rewrites them into byte-budgeted files. The report row carries "
    "before/after file counts and bytes plus an xxhash64 XOR "
    "row-fingerprint equality proof (the M7 Merkle rule applied to a "
    "maintenance rewrite): compaction must change LAYOUT and never "
    "DATA. Temp dirs are cleaned before returning.",
)
def orders_compaction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from time_series_spark_spark.sources.io import compact_parquet

    orders = load(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="compact_orders_")
    src, dst = f"{base}/frag", f"{base}/compact"
    try:
        orders.repartition(64).write.parquet(src)

        def fingerprint(df):
            cols = [F.col(c).cast("string") for c in sorted(df.columns)]
            row = df.select(
                F.xxhash64(*cols).alias("h"), F.lit(1).alias("one")
            )
            agg = row.agg(
                F.expr("CAST(bit_xor(h) AS BIGINT)").alias("x"),
                F.sum("one").alias("n"),
            ).collect()[0]
            return agg["x"], agg["n"]

        stats = compact_parquet(
            spark, src, dst, target_file_bytes=1 * 1024 * 1024
        )
        x_before, n_before = fingerprint(spark.read.parquet(src))
        x_after, n_after = fingerprint(spark.read.parquet(dst))
        return local_df(spark, 
            [
                (
                    stats["n_files_before"],
                    stats["n_files_after"],
                    stats["n_out_planned"],
                    stats["bytes_before"],
                    stats["bytes_after"],
                    int(n_before),
                    int(n_after),
                    bool(x_before == x_after and n_before == n_after),
                )
            ],
            "n_files_before int, n_files_after int, n_out_planned int, "
            "bytes_before long, bytes_after long, n_rows_before long, "
            "n_rows_after long, rows_identical boolean",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# A18: schema-compatibility report (data contract check, rows-only)
# --------------------------------------------------------------------------
@register(
    "orders_schema_compat_report",
    # round 11 (rows-only → oracle-backed): the report is a pure
    # StructType diff of the FIXED orders schema against a FIXED
    # "evolved" schema — scale-independent and fully deterministic, so
    # the oracle is the expected verdict table verbatim (the same
    # VALUES-oracle pattern as synthetic_source_series_stats). Verdict
    # taxonomy laws remain pinned in tests/test_quality.py.
    """
    SELECT * FROM (VALUES
        ('o_channel', 'added', '-> string', TRUE),
        ('o_custkey', 'narrowed', 'bigint -> int', FALSE),
        ('o_orderdate', 'type_changed', 'timestamp_ntz -> timestamp', FALSE),
        ('o_orderkey', 'unchanged', 'bigint', TRUE),
        ('o_orderpriority', 'removed', 'string ->', FALSE),
        ('o_orderstatus', 'type_changed', 'string -> int', FALSE),
        ('o_totalprice', 'unchanged', 'double', TRUE)
    ) AS t("column", verdict, detail, compatible)
    ORDER BY "column"
    """,
    doc="A18 schema-compatibility report, driver-visible: the orders "
    "schema 'evolves' (drop o_orderpriority, widen o_custkey-like int "
    "column, add o_channel, retype o_orderstatus to int) and "
    "schema_compat_report (sources/io.py) issues per-column verdicts "
    "— added/widened compatible, removed/narrowed/type_changed "
    "breaking — the pre-deploy data-contract gate for a lake table "
    "(the metadata sibling of the A2c mergeSchema read). No data "
    "scan; pure StructType diff.",
)
def orders_schema_compat_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from time_series_spark_spark.sources.io import schema_compat_report

    old = load(spark, sf_dir, "orders").schema
    new = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.IntegerType()),  # narrowed
            T.StructField("o_orderstatus", T.IntegerType()),  # retyped
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            # o_orderpriority removed
            T.StructField("o_channel", T.StringType()),  # added
        ]
    )
    rows = schema_compat_report(old, new)
    return local_df(spark, 
        [(r["column"], r["verdict"], r["detail"], r["compatible"]) for r in rows],
        "column string, verdict string, detail string, compatible boolean",
    ).orderBy("column")


# --------------------------------------------------------------------------
# D27: materialized-view rollup navigation (aggregate reuse, rows-only)
# --------------------------------------------------------------------------
@register(
    "orders_mv_rollup_navigation",
    # round 11 (rows-only → oracle-backed): both the MV-derived and the
    # direct monthly rollups have closed forms over orders (exact-integer
    # cents, so MV-sum ≡ direct-sum bit-for-bit), and the scan-size
    # columns are the MV day count / fact row count — all relational.
    # Scan-source plan assertions remain pinned in tests/test_plans.py.
    """
    WITH mv AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1)
    SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS month,
           CAST(sum(n_orders) AS BIGINT) AS n_orders,
           CAST(sum(rev_cents) AS BIGINT) AS rev_cents_mv,
           CAST(sum(rev_cents) AS BIGINT) AS rev_cents_direct,
           TRUE AS navigation_exact,
           (SELECT CAST(count(*) AS INT) FROM mv) AS mv_rows_scanned,
           (SELECT CAST(count(*) AS INT) FROM orders) AS fact_rows_avoided
    FROM mv GROUP BY 1 ORDER BY 1
    """,
    doc="D27 materialized-view rollup navigation: a DAILY revenue MV "
    "(day, n_orders, rev_cents — additive measures only, the rule "
    "that makes a rollup navigable) is materialized once, and the "
    "MONTHLY question is answered by re-aggregating the MV — "
    "days-not-orders rows scanned, the classic warehouse aggregate-"
    "navigation contract (Spark has no automatic MV matching, so the "
    "navigation is explicit — same answer, documented equivalence). "
    "Report row per month carries both the MV-derived and the "
    "direct-from-fact revenue plus the match flag and the scan-size "
    "ratio; temp MV cleaned before returning.",
)
def orders_mv_rollup_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    orders = load(spark, sf_dir, "orders")
    mv_path = tempfile.mkdtemp(prefix="mv_orders_daily_")
    try:
        daily = orders.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).alias("day")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("rev_cents"),
        )
        daily.write.mode("overwrite").parquet(mv_path)
        mv = spark.read.parquet(mv_path)
        from_mv = mv.groupBy(
            F.date_trunc("month", F.col("day")).alias("month")
        ).agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("rev_cents").alias("rev_cents_mv"),
        )
        direct = orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month")
        ).agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("rev_cents_direct")
        )
        n_fact = orders.count()
        n_mv = mv.count()
        out = (
            from_mv.join(direct, "month")
            .select(
                "month",
                "n_orders",
                "rev_cents_mv",
                "rev_cents_direct",
                (F.col("rev_cents_mv") == F.col("rev_cents_direct")).alias(
                    "navigation_exact"
                ),
                F.lit(n_mv).alias("mv_rows_scanned"),
                F.lit(n_fact).alias("fact_rows_avoided"),
            )
            .orderBy("month")
        )
        rows = out.collect()  # materialize before the MV files vanish
        return local_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(mv_path, ignore_errors=True)


@register(
    "events_rate_limit_audit",
    None,  # sequential clamp recurrence -> rows-only; streaming
    # equivalence + hand-replay pinned in tests/test_streaming.py
    doc="F163 token-bucket rate-limit audit per user (capacity 2, one "
    "token per 6h): which events WOULD a production limiter have "
    "rejected — the pre-rollout throttling what-if. The clamped "
    "refill recurrence is not window-expressible (min() clamp "
    "between rows); state is the exact-integer scaled token count "
    "stok = tokens * P, so admission is deterministic bit-for-bit "
    "(operators/analytics.py::token_bucket_flags). One shuffle -> "
    "packed grouped map; per-user summary row with admit/reject "
    "counts and the first rejected event.",
)
def events_rate_limit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.analytics import (
        token_bucket_flags,
    )

    flags = token_bucket_flags(
        load(spark, sf_dir, "events"), "user_id", "ts"
    )
    return (
        flags.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("admitted").cast("long").alias("n_admitted"),
            F.sum(F.expr("1 - admitted")).cast("long").alias("n_rejected"),
            F.min(
                F.when(F.col("admitted") == 0, F.col("event_id"))
            ).alias("first_rejected_id"),
        )
        .orderBy("user_id")
    )


# A19: parquet row-group layout audit (round 9)
@register(
    "events_parquet_layout_audit",
    # the audited file is WRITTEN by the query itself (event_ids sorted,
    # row_group_size=1024), so the expected layout is a closed form of
    # the corpus row count: full 1024-row groups plus one remainder.
    """
    WITH n AS (SELECT count(*) AS c FROM events),
    g AS (
        SELECT unnest(generate_series(
                   0, CAST(ceil(c / 1024.0) AS BIGINT) - 1)) AS group_idx
        FROM n
    )
    SELECT CAST(group_idx AS BIGINT) AS group_idx,
           CAST(CASE WHEN (group_idx + 1) * 1024 <= (SELECT c FROM n)
                     THEN 1024
                     ELSE (SELECT c FROM n) - group_idx * 1024
                END AS BIGINT) AS n_rows
    FROM g ORDER BY group_idx
    """,
    doc="A19 parquet row-group LAYOUT audit: parquet splits only at "
    "row-group boundaries, so one giant row group serializes every "
    "downstream scan regardless of cluster size — the defect the "
    "round-9 100x stress run measured (single-task embedding scans, "
    "182 s -> 19 s after re-layout; PERF.md). parquet_layout_report "
    "reads ONLY FOOTERS, distributed via mapInPandas over the file "
    "list (thousands of O(KB) metadata reads at 100 TB, no data "
    "pages). The query writes a deterministic audit target (sorted "
    "event ids, row_group_size=1024 — a bounded one-column driver "
    "artifact, the demo harness, not the operator) and reports each "
    "group's row count; the oracle is the closed-form expected layout. "
    "Multi-file + flag semantics pinned in tests/test_sources.py.",
)
def events_parquet_layout_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from time_series_spark_spark.sources.io import parquet_layout_report

    ids = (
        load(spark, sf_dir, "events")
        .select("event_id")
        .orderBy("event_id")
        .toPandas()
    )
    d = tempfile.mkdtemp(prefix="tss_layout_")
    try:
        target = os.path.join(d, "audit.parquet")
        pq.write_table(
            pa.table({"event_id": ids["event_id"]}),
            target,
            row_group_size=1024,
        )
        out = (
            parquet_layout_report(spark, [target])
            .select("group_idx", "n_rows")
            .orderBy("group_idx")
        )
        rows = out.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return local_df(spark, rows, out.schema)
