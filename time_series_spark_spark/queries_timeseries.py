"""Time-series query surface (SURVEY.md §2.F, C8/C9/C10, E3/E6/E8, D13).

All time arithmetic goes through integer microseconds
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us``) so both engines compute
bit-identical doubles; ``events.ts`` is compared at µs precision (the ns
payload is all-zero sub-µs — verified against the corpus).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from time_series_spark_spark.operators.timeseries import (
    anomaly_flags,
    asof_join,
    densify,
    ewma,
    ffill,
    forecast_metrics,
    interpolate_linear,
    range_join_trailing,
    resample,
    series_stats,
    session_summary,
    time_split,
)
from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


def _daily_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily mean value on the dense global day grid (fixture for
    fill/interpolate operators).

    The mean is computed over INTEGER cents (scale → integer-round → avg →
    integer-round → unscale): integer sums are exact in fp regardless of
    partial-aggregation order, and integer (0-digit) rounds are safe on
    ties because dyadic .5 values are exactly representable — whereas
    ``round(avg(value), 4)`` of money-like 2-decimal data lands on exact
    decimal ties that Spark and DuckDB round differently.
    """
    daily = resample(
        _events(spark, sf_dir),
        "ts",
        "day",
        ["user_id"],
        [
            (
                F.round(F.avg(F.round(F.col("value") * 100, 0)) * 100, 0)
                / 10000.0
            ).alias("v")
        ],
        bucket_col="d",
    )
    return densify(daily, ["user_id"], "d", "interval 1 day")


_DAILY_USER_GRID_SQL = """
    daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               round(avg(round(value * 100)) * 100) / 10000 AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    grid AS (
        SELECT u.user_id, g.d
        FROM (SELECT DISTINCT user_id FROM daily) u
        CROSS JOIN (
            SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds),
                                          INTERVAL 1 DAY)) AS d
        ) g
    ),
    joined AS (
        SELECT grid.user_id, grid.d, daily.v
        FROM grid LEFT JOIN daily
          ON daily.user_id = grid.user_id AND daily.d = grid.d
    )
"""


# --------------------------------------------------------------------------
# F1 resample
# --------------------------------------------------------------------------
@register(
    "events_hourly",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
           event_type,
           count(*)               AS n,
           round(sum(value), 2)   AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="F1 resample irregular events onto an hourly grid",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample(
        _events(spark, sf_dir),
        "ts",
        "hour",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
    )


# --------------------------------------------------------------------------
# F2 gap fill / densify
# --------------------------------------------------------------------------
@register(
    "events_gap_fill_hourly",
    """
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
               count(*) AS n_raw
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM hourly),
    grid AS (
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (
            SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds),
                                          INTERVAL 1 HOUR)) AS bucket
        ) g
    )
    SELECT grid.event_type, grid.bucket,
           coalesce(hourly.n_raw, 0) AS n
    FROM grid LEFT JOIN hourly
      ON hourly.event_type = grid.event_type AND hourly.bucket = grid.bucket
    """,
    doc="F2 densify: every hourly bucket emitted, empty buckets zero-filled",
)
def events_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = resample(
        _events(spark, sf_dir),
        "ts",
        "hour",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_raw")],
    )
    return densify(hourly, ["event_type"], "bucket", "interval 1 hour").select(
        "event_type",
        "bucket",
        F.coalesce("n_raw", F.lit(0)).alias("n"),
    )


# --------------------------------------------------------------------------
# F3 forward fill
# --------------------------------------------------------------------------
@register(
    "events_ffill_daily",
    f"""
    WITH {_DAILY_USER_GRID_SQL}
    SELECT user_id, d,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING
           ) AS v_filled
    FROM joined
    """,
    doc="F3 ffill: carry last observation over per-user daily gaps",
)
def events_ffill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _daily_user_value(spark, sf_dir)
    return ffill(grid, ["user_id"], "d", ["v"]).select(
        "user_id", "d", F.col("v").alias("v_filled")
    )


# --------------------------------------------------------------------------
# F4 linear interpolation
# --------------------------------------------------------------------------
@register(
    "events_interpolate_daily",
    f"""
    WITH {_DAILY_USER_GRID_SQL},
    calc AS (
        SELECT user_id, d, v,
               last_value(v IGNORE NULLS) OVER wf AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                   OVER wf AS prev_t,
               first_value(v IGNORE NULLS) OVER wb AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
                   OVER wb AS next_t
        FROM joined
        WINDOW
            wf AS (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            wb AS (PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, d,
           round(CASE
               WHEN v IS NOT NULL THEN v
               WHEN prev_v IS NULL THEN next_v
               WHEN next_v IS NULL THEN prev_v
               WHEN epoch_us(next_t) = epoch_us(prev_t) THEN prev_v
               ELSE prev_v + (next_v - prev_v)
                    * CAST(epoch_us(d) - epoch_us(prev_t) AS DOUBLE)
                    / CAST(epoch_us(next_t) - epoch_us(prev_t) AS DOUBLE)
           END, 6) AS v_interp
    FROM calc
    """,
    doc="F4 linear interpolation between neighboring observations",
)
def events_interpolate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    grid = _daily_user_value(spark, sf_dir)
    out = interpolate_linear(grid, ["user_id"], "d", "v", "v_interp")
    return out.select("user_id", "d", F.round("v_interp", 6).alias("v_interp"))


# --------------------------------------------------------------------------
# F5 sessionization
# --------------------------------------------------------------------------
@register(
    "events_sessionize",
    """
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    flags AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM flags
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           min(ts)  AS session_start,
           max(ts)  AS session_end,
           count(*) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1e6
               AS duration_sec
    FROM sess
    GROUP BY user_id, session_id
    """,
    doc="F5 sessionization: 30-minute silence splits a user's stream",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_summary(_events(spark, sf_dir), "user_id", "ts", 1800)


# --------------------------------------------------------------------------
# F6 train/test time split
# --------------------------------------------------------------------------
@register(
    "train_test_split_daily",
    """
    WITH daily AS (
        SELECT l_returnflag AS key, date_trunc('day', l_shipdate) AS ds,
               round(sum(l_quantity), 2) AS y
        FROM lineitem GROUP BY 1, 2
    )
    SELECT key,
           CASE WHEN ds < TIMESTAMP '2000-01-01' THEN 'train' ELSE 'test' END
               AS split,
           count(*)            AS n,
           round(sum(y), 2)    AS total_y
    FROM daily
    GROUP BY 1, 2
    """,
    doc="F6 train/test split of per-series daily history at a time cutoff",
)
def train_test_split_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("key"),
            F.date_trunc("day", "l_shipdate").alias("ds"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("y"))
    )
    return (
        time_split(daily, "ds", "2000-01-01")
        .groupBy("key", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("y"), 2).alias("total_y"),
        )
    )


# --------------------------------------------------------------------------
# F9 forecast metrics (seasonal-naive baseline forecast)
# --------------------------------------------------------------------------
@register(
    "naive_forecast_metrics",
    """
    WITH daily AS (
        SELECT l_returnflag AS key, date_trunc('day', l_shipdate) AS ds,
               round(sum(l_quantity), 2) AS y
        FROM lineitem GROUP BY 1, 2
    ),
    pred AS (
        SELECT key, ds, y,
               lag(y, 7) OVER (PARTITION BY key ORDER BY ds) AS yhat
        FROM daily
    )
    SELECT key,
           count(*)                                              AS n,
           round(avg(abs(y - yhat)), 4)                          AS mae,
           round(avg((y - yhat) * (y - yhat)), 4)                AS mse,
           round(sqrt(avg((y - yhat) * (y - yhat))), 4)          AS rmse,
           round(avg(abs(y - yhat) / abs(y)), 6)                 AS mape,
           round(avg(2 * abs(y - yhat) / (abs(y) + abs(yhat))), 6) AS smape
    FROM pred WHERE yhat IS NOT NULL
    GROUP BY key
    """,
    doc="F9 MAE/MSE/RMSE/MAPE/sMAPE of a seasonal-naive (lag-7) forecast",
)
def naive_forecast_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("key"),
            F.date_trunc("day", "l_shipdate").alias("ds"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("y"))
    )
    w = Window.partitionBy("key").orderBy("ds")
    pred = daily.withColumn("yhat", F.lag("y", 7).over(w)).filter(
        F.col("yhat").isNotNull()
    )
    return forecast_metrics(pred, ["key"], "y", "yhat")


# --------------------------------------------------------------------------
# F10 seasonal profile
# --------------------------------------------------------------------------
@register(
    "seasonal_profile_dow",
    """
    SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
           event_type,
           count(*)              AS n,
           round(avg(value), 4)  AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="F10 day-of-week seasonal profile (Spark dayofweek: 1=Sunday)",
)
def seasonal_profile_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(F.dayofweek("ts").alias("dow"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# F11 rolling-statistics anomaly flag
# --------------------------------------------------------------------------
@register(
    "anomaly_rolling_z",
    """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, v,
           round(avg(v) OVER w, 4)         AS roll_mean,
           round(stddev_samp(v) OVER w, 4) AS roll_sd,
           abs(v - avg(v) OVER w) > 2 * stddev_samp(v) OVER w AS is_anomaly
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    """,
    doc="F11 anomaly flag: |y − rolling mean| > 2·rolling std (trailing 7)",
)
def anomaly_rolling_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = resample(
        _events(spark, sf_dir),
        "ts",
        "day",
        ["event_type"],
        [F.round(F.sum("value"), 2).alias("v")],
        bucket_col="d",
    )
    out = anomaly_flags(daily, ["event_type"], "d", "v", n_rows=7, n_sigmas=2.0)
    return out.select(
        "event_type",
        "d",
        "v",
        F.round("roll_mean", 4).alias("roll_mean"),
        F.round("roll_sd", 4).alias("roll_sd"),
        "is_anomaly",
    )


# --------------------------------------------------------------------------
# F12 per-series structural stats
# --------------------------------------------------------------------------
@register(
    "series_stats_users",
    """
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
               epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        FROM events
    )
    SELECT user_id,
           count(*)      AS n,
           min(ts)       AS first_ts,
           max(ts)       AS last_ts,
           CAST(max(us) - min(us) AS DOUBLE) / 1e6    AS span_sec,
           round(avg(us - prev_us)) / 1e6             AS mean_gap_sec,
           CAST(max(us - prev_us) AS DOUBLE) / 1e6    AS max_gap_sec
    FROM e
    GROUP BY user_id
    """,
    doc="F12 per-series stats: count, span, inter-arrival gaps",
)
def series_stats_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return series_stats(_events(spark, sf_dir), "user_id", "ts")


# --------------------------------------------------------------------------
# C9 as-of join
# --------------------------------------------------------------------------
@register(
    "asof_purchase_view",
    """
    SELECT p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.event_id, p.value,
           CAST(v.ts AS TIMESTAMP) AS view_ts, v.value AS view_value
    FROM (SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    doc="C9 as-of join: latest view at-or-before each purchase, per user "
    "(union+window strategy — one shuffle, no join; DuckDB native ASOF "
    "JOIN as oracle)",
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    out = asof_join(purchases, views, "user_id", "ts", "ts", ["value"])
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.col("ts_right").alias("view_ts"),
        F.col("value_right").alias("view_value"),
    )


@register(
    "asof_forward_next_view",
    """
    SELECT p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.event_id, p.value,
           CAST(v.ts AS TIMESTAMP) AS view_ts, v.value AS view_value
    FROM (SELECT user_id, ts, event_id, value FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    """,
    doc="C9 as-of join, FORWARD direction (round 3): earliest view "
    "at-or-after each purchase per user — same union+window single-"
    "shuffle strategy with the lookahead frame; DuckDB native ASOF "
    "JOIN (>=) as oracle",
)
def asof_forward_next_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, views, "user_id", "ts", "ts", ["value"], direction="forward"
    )
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.col("ts_right").alias("view_ts"),
        F.col("value_right").alias("view_value"),
    )


# --------------------------------------------------------------------------
# C8 range join (trailing window)
# --------------------------------------------------------------------------
@register(
    "range_join_views_1h",
    """
    SELECT p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.event_id,
           count(*) AS n_views, round(sum(v.value), 4) AS view_value_sum
    FROM events p
    JOIN events v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts <= p.ts
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    GROUP BY 1, 2, 3
    """,
    doc="C8 range join via time bucketing: views in the hour before each "
    "purchase (equi-join on coarse bucket + residual predicate — never BNLJ)",
)
def range_join_views_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    pairs = range_join_trailing(purchases, views, "user_id", "ts", "ts", 3600)
    return pairs.groupBy("user_id", "ts", "event_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.round(F.sum("value"), 4).alias("view_value_sum"),
    )


# --------------------------------------------------------------------------
# C10 / E3 lag & lead adjacent-event pairing
# --------------------------------------------------------------------------
@register(
    "lag_lead_event_pairs",
    """
    WITH e AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               lag(event_type)  OVER w AS prev_type,
               lead(event_type) OVER w AS next_type,
               CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS DOUBLE) / 1e6
                   AS prev_gap_sec
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, ts, prev_type, next_type, prev_gap_sec
    FROM e WHERE event_type = 'purchase'
    """,
    doc="C10/E3 adjacent-event pairing via lag/lead (cheaper than self-join)",
)
def lag_lead_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            (
                (
                    F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                ).cast("double")
                / 1e6
            ).alias("prev_gap_sec"),
        )
        .filter(F.col("event_type") == "purchase")
        .drop("event_type")
    )


# --------------------------------------------------------------------------
# E6 time-range window frame (irregular series)
# --------------------------------------------------------------------------
@register(
    "time_range_frame_3d",
    """
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d, v,
           round(sum(v) OVER (PARTITION BY event_type ORDER BY d
                 RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW), 4)
               AS trailing_3d
    FROM daily
    """,
    doc="E6 time-range frame: trailing 3-day sum over a (possibly sparse) "
    "daily series — RANGE, not ROWS",
)
def time_range_frame_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = resample(
        _events(spark, sf_dir),
        "ts",
        "day",
        ["event_type"],
        [F.round(F.sum("value"), 2).alias("v")],
        bucket_col="d",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("d").cast("long"))
        .rangeBetween(-3 * 86400, 0)
    )
    return daily.select(
        "event_type", "d", "v", F.round(F.sum("v").over(w), 4).alias("trailing_3d")
    )


# --------------------------------------------------------------------------
# E8 EWMA (grouped-map pandas UDF — rows-only check)
# --------------------------------------------------------------------------
@register(
    "ewma_user_daily",
    # round 12 (rows-only → oracle): adjust=True EWM has the closed form
    # y_t = Σ(x_i·w⁻ⁱ)/Σ(w⁻ⁱ) over running sums — invalid at production
    # series lengths (w⁻ⁱ = 0.7⁻ⁱ overflows float64 after ~2k rows,
    # exactly why the ENGINE uses the grouped-map recursion; see
    # operators/timeseries.py::ewma), but exact at the corpus's ≤90-day
    # daily series, so the ORACLE may use it: the hash match proves the
    # engine's recursive path against independent math, not a port of it.
    """
    WITH daily AS (
        -- daily mean derived from EXACT integer cents and left
        -- UNROUNDED: both engines divide the same integers, so v is
        -- bit-identical by IEEE-754 (raw avg(value) flips under fp
        -- association, and round(x, 4) itself flips at .00005
        -- boundaries — Spark HALF_UP on the shortest decimal repr vs
        -- DuckDB's scaled-binary rounding)
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / count(*) / 100.0 AS v
        FROM events GROUP BY 1, 2
    ),
    rn AS (
        SELECT user_id, d, v,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) - 1
                    AS DOUBLE) AS i
        FROM daily
    ),
    acc AS (
        SELECT user_id, d, v,
               sum(v * power(1.0 / 0.7, i)) OVER (
                   PARTITION BY user_id ORDER BY i
                   ROWS UNBOUNDED PRECEDING) AS s_num,
               sum(power(1.0 / 0.7, i)) OVER (
                   PARTITION BY user_id ORDER BY i
                   ROWS UNBOUNDED PRECEDING) AS s_den
        FROM rn
    )
    SELECT user_id, d, v, round(s_num / s_den, 6) AS ewma FROM acc
    """,
    doc="E8 EWMA per user over daily means (packed grouped map; pandas "
    "ewm semantics, adjust=True, alpha=0.3); oracle = the closed-form "
    "weighted-running-sum ratio, valid at test-scale series lengths",
)
def ewma_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # daily mean from exact integer cents (sum BIGINT / count / 100):
    # identical operands → identical doubles → identical round(…, 4) in
    # both engines, where raw avg(value) flips the 4th decimal under
    # cross-engine fp association (round-12 oracle upgrade)
    daily = resample(
        _events(spark, sf_dir),
        "ts",
        "day",
        ["user_id"],
        [
            (
                F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                .cast("double")
                / F.count(F.lit(1))
                / 100.0
            ).alias("v")
        ],
        bucket_col="d",
    )
    out = ewma(daily, ["user_id"], "d", "v", alpha=0.3)
    return out.select("user_id", "d", "v", F.round("ewma", 6).alias("ewma"))


# --------------------------------------------------------------------------
# D13 / L5 grouped-agg pandas UDAF
# --------------------------------------------------------------------------
@register(
    "geo_mean_grouped_udaf",
    """
    SELECT event_type, round(exp(avg(ln(value))), 6) AS geo_value
    FROM events WHERE value > 0
    GROUP BY event_type
    """,
    doc="D13/L5 grouped-agg pandas UDAF (geometric mean) vs closed-form SQL",
)
def geo_mean_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    return (
        _events(spark, sf_dir)
        .filter(F.col("value") > 0)  # ln(0) = -inf; zero-value events occur
        .groupBy("event_type")
        .agg(F.round(geo_mean("value"), 6).alias("geo_value"))
    )


# --------------------------------------------------------------------------
# F13 multi-resolution rollup cascade
# --------------------------------------------------------------------------
@register(
    "events_rollup_cascade",
    """
    WITH hourly AS (
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
               count(*) AS n_events,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_value_cents
        FROM events GROUP BY 1, 2
    ),
    daily AS (
        SELECT event_type,
               CAST(date_trunc('day', bucket_start) AS TIMESTAMP) AS bucket_start,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(sum(sum_value_cents) AS BIGINT) AS sum_value_cents
        FROM hourly GROUP BY 1, 2
    ),
    monthly AS (
        SELECT event_type,
               CAST(date_trunc('month', bucket_start) AS TIMESTAMP) AS bucket_start,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(sum(sum_value_cents) AS BIGINT) AS sum_value_cents
        FROM daily GROUP BY 1, 2
    )
    SELECT 'hour' AS grain, * FROM hourly
    UNION ALL SELECT 'day', * FROM daily
    UNION ALL SELECT 'month', * FROM monthly
    ORDER BY grain, event_type, bucket_start
    """,
    doc="F13 continuous-aggregate cascade: hour -> day -> month where each "
    "coarser grain re-aggregates the previous grain's algebraic partials "
    "(counts and integer-cent sums), so the raw table is scanned/shuffled "
    "once; ReusedExchange dedupes the shared hourly shuffle across union "
    "branches (pinned in tests/test_plans.py).",
)
def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.timeseries import rollup_cascade

    return rollup_cascade(
        _events(spark, sf_dir),
        "ts",
        ["event_type"],
        sum_cents_col="value",
    ).orderBy("grain", "event_type", "bucket_start")


# --------------------------------------------------------------------------
# F14 CUSUM change-point detection
# --------------------------------------------------------------------------
@register(
    "events_change_points",
    None,  # sequential per-series recursion -> rows-only; planted-shift
    # detection + false-positive bounds in tests/test_timeseries.py
    doc="F14 two-sided CUSUM mean-shift detector (Page 1954) per user over "
    "the daily value series; packed grouped-map path (one shuffle, many "
    "series per Arrow batch). h lowered to 3σ so the synthetic corpus "
    "yields a non-degenerate alarm set.",
)
def events_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.timeseries import change_points

    daily = resample(
        _events(spark, sf_dir),
        "ts",
        "day",
        ["user_id"],
        [F.avg("value").alias("v")],
        bucket_col="d",
    )
    return change_points(
        daily, ["user_id"], "d", "v", h_sigmas=3.0
    ).orderBy("user_id", "ts")


# --------------------------------------------------------------------------
# F15 sliding-window exact COUNT(DISTINCT)
# --------------------------------------------------------------------------
@register(
    "events_trailing_7d_users",
    """
    WITH pairs AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               user_id
        FROM events
    ),
    span AS (SELECT min(d) AS lo, max(d) AS hi FROM pairs),
    grid AS (
        SELECT unnest(generate_series((SELECT lo FROM span),
                                      (SELECT hi FROM span),
                                      INTERVAL 1 DAY)) AS d
    )
    SELECT g.d, count(DISTINCT p.user_id) AS users_7d
    FROM grid g JOIN pairs p ON p.d BETWEEN g.d - INTERVAL 6 DAY AND g.d
    GROUP BY g.d
    ORDER BY g.d
    """,
    doc="F15 trailing-7-day distinct users per day, EXACT: dedupe to "
    "(day, user) pairs first (the big reduction), then each active day "
    "contributes itself to the 7 window-ends it falls in (bounded explode "
    "on the deduped frame), then count distinct per window end — window "
    "functions cannot COUNT(DISTINCT) over a moving frame and "
    "collect_set-over-range would blow memory on hot windows.",
)
def events_trailing_7d_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.timeseries import trailing_distinct

    return trailing_distinct(
        _events(spark, sf_dir), "ts", "user_id", n_days=7
    ).select(
        "d", F.col("users_7d")
    ).orderBy("d")


@register(
    "events_sliding_hll_users",
    None,  # Apache DataSketches HLL binary sketches are engine-specific
    # → rows-only; error vs the exact F15 path bounded in pytest
    doc="F15's scale path: 7-day sliding APPROXIMATE distinct users via "
    "the built-in DataSketches HLL — one hash agg reduces each day to a "
    "fixed-size sketch (hll_sketch_agg), then hll_union_agg runs as a "
    "WINDOW aggregate over the bounded 7-row frame and "
    "hll_sketch_estimate reads the count. The window moves only "
    "kilobyte sketches, never user ids — at 100 TB the exact sliding "
    "COUNT(DISTINCT) re-shuffles every id into every window position "
    "while this ships 7 sketches per day; register-max union is "
    "order-independent, so the estimate is deterministic and "
    "partition-layout-invariant",
)
def events_sliding_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    daily.createOrReplaceTempView("daily_hll_sk")
    return spark.sql(
        """
        SELECT d,
               CAST(hll_sketch_estimate(
                   hll_union_agg(sk) OVER (
                       ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
                   )) AS BIGINT) AS users_7d_approx
        FROM daily_hll_sk
        ORDER BY d
        """
    )


@register(
    "events_local_date_nyc",
    """
    SELECT CAST(CAST(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS DATE) AS TIMESTAMP)
               AS local_date,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1
    """,
    doc="Local-time bucketing: events grouped by their America/New_York "
    "calendar date (convert_timezone from the UTC-normalized instant, "
    "then to_date) — the DST-correct way to bucket a global event "
    "stream into a market's business days; the oracle states the same "
    "conversion with AT TIME ZONE, proving the engines agree across the "
    "UTC-midnight boundary rows",
)
def events_local_date_nyc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    local_date = F.to_date(
        F.convert_timezone(F.lit("UTC"), F.lit("America/New_York"), "ts")
    ).cast("timestamp")
    return ev.groupBy(local_date.alias("local_date")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "event_type_corr_matrix",
    """
    WITH daily AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS d,
               event_type, sum(value) AS v
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               corr(a.v, b.v) AS c
        FROM daily a JOIN daily b ON a.d = b.d
          AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, round(c, 4) AS pearson_r
    FROM pairs
    """,
    doc="Pairwise Pearson correlation matrix of the per-type daily value "
    "series (upper triangle): one day-grain aggregate, a self-join on "
    "the day key ordered by type, and corr() per pair — the cross-metric "
    "dependence scan run before factor analysis; the day-grain reduce "
    "means the join moves days x types rows, never raw events",
)
def event_type_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(F.sum("value").alias("v"))
    a = daily.select(
        "d", F.col("event_type").alias("type_a"), F.col("v").alias("va")
    )
    b = daily.select(
        "d", F.col("event_type").alias("type_b"), F.col("v").alias("vb")
    )
    return (
        a.join(b, on="d")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.round(F.corr("va", "vb"), 4).alias("pearson_r"))
    )


# --------------------------------------------------------------------------
# F81 SLO multi-window burn-rate alerts
# --------------------------------------------------------------------------
# Error budget for a 75% success SLO; alert when BOTH the fast (1h) and
# slow (6h) windows burn at >= 1x budget — the multi-window multi-burn-rate
# rule (Google SRE Workbook ch. 5) that suppresses both blips and stale
# pages. All predicates compare IEEE-exact ratios of exact integer sums
# (no libm), so the alert bit is engine-independent; displayed rates are
# rounded per the repo fp rule.
_SLO_BUDGET = 0.25
_BURN_THRESH = 1.0


@register(
    "events_slo_burn_alerts",
    f"""
    WITH hourly AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
               count(*) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_err
        FROM events GROUP BY 1
    ),
    h AS (
        SELECT *, CAST(date_part('epoch', bucket) AS BIGINT) // 3600 AS hr
        FROM hourly
    ),
    wins AS (
        SELECT bucket, n, n_err,
               CAST(sum(n)     OVER w AS BIGINT) AS n_6h,
               CAST(sum(n_err) OVER w AS BIGINT) AS err_6h
        FROM h
        WINDOW w AS (ORDER BY hr RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket, n, n_err,
           round(n_err * 1.0 / n, 6)            AS err_rate_1h,
           round(err_6h * 1.0 / n_6h, 6)        AS err_rate_6h,
           round(n_err * 1.0 / n / {_SLO_BUDGET}, 4)     AS burn_1h,
           round(err_6h * 1.0 / n_6h / {_SLO_BUDGET}, 4) AS burn_6h,
           CAST(n_err * 1.0 / n / {_SLO_BUDGET} >= {_BURN_THRESH}
                AND err_6h * 1.0 / n_6h / {_SLO_BUDGET} >= {_BURN_THRESH}
                AS INT) AS alert
    FROM wins
    ORDER BY bucket
    """,
    doc="F81 SLO multi-window burn-rate alerting: hourly error rate vs a "
    "25% error budget, alert only when the 1h AND trailing-6h windows "
    "both burn at >= 1x (SRE Workbook multi-window rule). Raw events "
    "reduce to one row per hour FIRST; the range-frame window (keyed on "
    "integer epoch-hour, gap-correct) then runs over the tiny hourly "
    "frame — at 100 TB this is a per-service-key partitioned window over "
    "hours-per-service rows, never a window over raw events.",
)
def events_slo_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return slo_burn_alerts(load(spark, sf_dir, "events"))


def slo_burn_alerts(ev: DataFrame) -> DataFrame:
    """Core of F81, factored for toy-frame tests."""
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_err"),
    ).withColumn(
        "hr", F.expr("CAST(unix_timestamp(bucket) DIV 3600 AS BIGINT)")
    )
    # Production shape: .partitionBy(service_key) here; the corpus has one
    # global service, and the post-agg frame is hours-count sized.
    w6 = Window.orderBy("hr").rangeBetween(-5, 0)
    rate_1h = F.col("n_err") * 1.0 / F.col("n")
    rate_6h = F.col("err_6h") * 1.0 / F.col("n_6h")
    return (
        hourly.withColumn("n_6h", F.sum("n").over(w6))
        .withColumn("err_6h", F.sum("n_err").over(w6))
        .select(
            "bucket", "n", "n_err",
            F.round(rate_1h, 6).alias("err_rate_1h"),
            F.round(rate_6h, 6).alias("err_rate_6h"),
            F.round(rate_1h / _SLO_BUDGET, 4).alias("burn_1h"),
            F.round(rate_6h / _SLO_BUDGET, 4).alias("burn_6h"),
            (
                (rate_1h / _SLO_BUDGET >= _BURN_THRESH)
                & (rate_6h / _SLO_BUDGET >= _BURN_THRESH)
            ).cast("int").alias("alert"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# F105 debounce / burst-collapse (keep the first event per burst)
# --------------------------------------------------------------------------
@register(
    "events_debounce_user_type",
    """
    WITH e AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) > 300000000
                         OR lag(ts) OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events
    ),
    b AS (
        SELECT user_id, event_type, ts, event_id, is_start,
               CAST(sum(is_start) OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS burst
        FROM e
    ),
    agg AS (
        SELECT user_id, event_type, burst,
               CAST(count(*) AS BIGINT) AS n_collapsed,
               min(ts) AS first_ts,
               CAST(min_by(event_id, ts) AS BIGINT) AS keeper_event_id
        FROM b GROUP BY 1, 2, 3
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_bursts,
           CAST(sum(n_collapsed) AS BIGINT) AS n_events,
           CAST(max(n_collapsed) AS BIGINT) AS max_burst,
           CAST(sum(n_collapsed - 1) AS BIGINT) AS n_suppressed
    FROM agg
    GROUP BY 1, 2
    ORDER BY user_id, event_type
    """,
    doc="F105 debounce / burst-collapse: within each (user, event_type) "
    "stream, an event starts a new BURST when >5 min passed since the "
    "previous one (the F5 sessionize gap rule per composite key); only "
    "the burst's first event survives — the alerting/notification "
    "throttle shape. Reports per-key burst counts, raw counts, max "
    "burst length, and how many events the debounce suppressed. ONE "
    "hash((user,type)) exchange drives the lag window, the running "
    "burst-id sum, and both aggregates (superset-clustering reuse, the "
    "F5 plan property). min_by keeps the keeper deterministic on ties.",
)
def events_debounce_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    e = _events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(key)
                > 300_000_000
            )
            | F.lag("ts").over(key).isNull(),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    b = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.sum("is_start")
        .over(key.rowsBetween(Window.unboundedPreceding, 0))
        .alias("burst"),
    )
    agg = b.groupBy("user_id", "event_type", "burst").agg(
        F.count(F.lit(1)).alias("n_collapsed"),
        F.min("ts").alias("first_ts"),
        F.min_by("event_id", "ts").alias("keeper_event_id"),
    )
    return (
        agg.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_bursts"),
            F.sum("n_collapsed").alias("n_events"),
            F.max("n_collapsed").alias("max_burst"),
            F.sum(F.col("n_collapsed") - 1).alias("n_suppressed"),
        )
        .orderBy("user_id", "event_type")
    )
