"""Quantitative-indicator & concentration analytics (SURVEY.md §2.F
extension, round 5): Bollinger bands with breakout flags, drawdown from
running peak, rolling higher moments (skew/kurtosis), Cutler's RSI, Gini
concentration, and per-session path mining.

Dialect rules as everywhere (queries.py header): integer-cents money
math (`CAST(round(value * 100) AS BIGINT)` per row, then integer sums),
exact integer power sums inside window frames, and every fp value the
result of the SAME expression tree over identical integer operands in
both engines (sqrt/div only — no `pow`, whose libm rounding may differ
between the JVM and DuckDB's C runtime). Where the combination algebra
is long (the moment formulas) the Spark side is written with `F.expr`
using the same arithmetic text as the oracle so the operation order is
identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_spark_spark.session import local_df

from time_series_spark_spark.operators.timeseries import sessionize
from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


_CENTS = "CAST(round(value * 100) AS BIGINT)"


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, day) total value in exact integer cents."""
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("d")
        )
        .agg(F.sum(F.expr(_CENTS)).alias("v"))
    )


@register(
    "events_bollinger_daily",
    f"""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    wnd AS (
        SELECT event_type, d, v,
               count(*)   OVER w AS n,
               sum(v)     OVER w AS sx,
               sum(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) OVER w AS sxx
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, v AS v_cents,
           round(CAST(sx AS DOUBLE) / n, 4) AS ma_cents,
           round(sqrt(n * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n,
                 4) AS sd_cents,
           CASE WHEN CAST(v AS DOUBLE)
                     > CAST(sx AS DOUBLE) / n
                       + 2 * (sqrt(n * sxx - CAST(sx AS DOUBLE)
                                   * CAST(sx AS DOUBLE)) / n)
                THEN 'up'
                WHEN CAST(v AS DOUBLE)
                     < CAST(sx AS DOUBLE) / n
                       - 2 * (sqrt(n * sxx - CAST(sx AS DOUBLE)
                                   * CAST(sx AS DOUBLE)) / n)
                THEN 'down'
           END AS breakout
    FROM wnd
    """,
    doc="Bollinger bands (7-day mean ± 2 population σ) over daily value "
    "cents per event_type, with up/down breakout flags; σ from exact "
    "integer power sums so the band edges are identical doubles in both "
    "engines. One shuffle (the daily agg); the window runs on the same "
    "event_type partitioning",
)
def events_bollinger_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        _daily_cents(spark, sf_dir)
        .withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("sx", F.sum("v").over(w))
        # v² summed in DOUBLE: the BIGINT sum itself overflows once daily
        # cents reach ~1.3e9 (DuckDB would silently promote to HUGEINT
        # where Spark throws); ordered-frame double sums are
        # order-deterministic, so both engines still match bit-for-bit
        .withColumn(
            "sxx",
            F.sum(F.expr("CAST(v AS DOUBLE) * CAST(v AS DOUBLE)")).over(w),
        )
        .select(
            "event_type",
            "d",
            F.col("v").alias("v_cents"),
            F.expr("round(CAST(sx AS DOUBLE) / n, 4)").alias("ma_cents"),
            F.expr(
                "round(sqrt(n * sxx - CAST(sx AS DOUBLE)"
                " * CAST(sx AS DOUBLE)) / n, 4)"
            ).alias("sd_cents"),
            F.expr(
                """CASE WHEN CAST(v AS DOUBLE)
                             > CAST(sx AS DOUBLE) / n
                               + 2 * (sqrt(n * sxx - CAST(sx AS DOUBLE)
                                           * CAST(sx AS DOUBLE)) / n)
                        THEN 'up'
                        WHEN CAST(v AS DOUBLE)
                             < CAST(sx AS DOUBLE) / n
                               - 2 * (sqrt(n * sxx - CAST(sx AS DOUBLE)
                                           * CAST(sx AS DOUBLE)) / n)
                        THEN 'down'
                   END"""
            ).alias("breakout"),
        )
    )


@register(
    "orders_daily_drawdown",
    """
    WITH d AS (
        SELECT CAST(o_orderdate AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1
    )
    SELECT d, rev_cents,
           max(rev_cents) OVER w AS peak_cents,
           CAST((max(rev_cents) OVER w - rev_cents) * 10000
                // max(rev_cents) OVER w AS BIGINT) AS drawdown_bp
    FROM d
    WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)
    """,
    doc="Drawdown of the daily-revenue series from its running peak, in "
    "integer basis points (floor division of exact integer cents — no fp "
    "anywhere). The running max is a single ordered window over the "
    "one-row-per-day aggregate",
)
def orders_daily_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("timestamp").alias("d"))
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "rev_cents"
            )
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("peak_cents", F.max("rev_cents").over(w))
        .withColumn(
            "drawdown_bp",
            F.expr("(peak_cents - rev_cents) * 10000 div peak_cents"),
        )
    )


# The central-moment combinations below are evaluated in DOUBLE over the
# exact integer window sums; both engines execute the SAME expression text
# (the Spark side is F.expr of the identical string), so the fp results are
# bit-identical even where the algebra loses integer exactness.
# Every sum is CAST to DOUBLE before any product: the mixed-integer form
# overflows BIGINT at the 10× stress scale (s1⁴ with bursty daily counts),
# and DuckDB would silently promote to HUGEINT where Spark throws — casting
# first keeps the expression trees identical AND overflow-free (the window
# sums themselves stay exact integers well under 2^53).
_SKEW_EXPR = (
    "round((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s3 AS DOUBLE) "
    "- 3 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) "
    "+ 2 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) "
    "/ (CAST(b AS DOUBLE) * sqrt(CAST(b AS DOUBLE))), 6)"
)
_KURT_EXPR = (
    "round((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    " * CAST(s4 AS DOUBLE) "
    "- 4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " * CAST(s3 AS DOUBLE) "
    "+ 6 * CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " * CAST(s2 AS DOUBLE) "
    "- 3 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " * CAST(s1 AS DOUBLE)) "
    "/ (CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) - 3, 6)"
)


@register(
    "events_rolling_skew_kurt",
    f"""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    wnd AS (
        SELECT event_type, d, x,
               count(*)           OVER w AS n,
               sum(x)             OVER w AS s1,
               sum(x * x)         OVER w AS s2,
               sum(x * x * x)     OVER w AS s3,
               sum(x * x * x * x) OVER w AS s4
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    m AS (SELECT *, n * s2 - s1 * s1 AS b FROM wnd)
    SELECT event_type, d, x AS n_events, CAST(n AS BIGINT) AS win_n,
           CASE WHEN b > 0 THEN {_SKEW_EXPR} END AS skew,
           CASE WHEN b > 0 THEN {_KURT_EXPR} END AS kurtosis
    FROM m
    """,
    doc="Rolling 7-day population skewness and excess kurtosis of the "
    "daily event-count series per event_type, from exact integer power "
    "sums S1..S4 combined in an identical double expression tree in both "
    "engines (B*sqrt(B) instead of pow(B,1.5) — libm pow rounding is not "
    "portable, sqrt is)",
)
def events_rolling_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("d")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    return (
        daily.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.sum("x").over(w))
        .withColumn("s2", F.sum(F.expr("x * x")).over(w))
        .withColumn("s3", F.sum(F.expr("x * x * x")).over(w))
        .withColumn("s4", F.sum(F.expr("x * x * x * x")).over(w))
        .withColumn("b", F.expr("n * s2 - s1 * s1"))
        .select(
            "event_type",
            "d",
            F.col("x").alias("n_events"),
            F.col("n").cast("long").alias("win_n"),
            F.expr(f"CASE WHEN b > 0 THEN {_SKEW_EXPR} END").alias("skew"),
            F.expr(f"CASE WHEN b > 0 THEN {_KURT_EXPR} END").alias(
                "kurtosis"
            ),
        )
    )


@register(
    "events_rsi_cutler",
    f"""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    delta AS (
        SELECT event_type, d, v,
               v - lag(v) OVER (PARTITION BY event_type ORDER BY d) AS chg
        FROM d
    ),
    gl AS (
        SELECT event_type, d, v,
               CASE WHEN chg > 0 THEN chg ELSE 0 END AS gain,
               CASE WHEN chg < 0 THEN -chg ELSE 0 END AS loss
        FROM delta WHERE chg IS NOT NULL
    ),
    wnd AS (
        SELECT event_type, d, v,
               sum(gain) OVER w AS g, sum(loss) OVER w AS l,
               count(*)  OVER w AS n
        FROM gl
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d, v AS v_cents, CAST(n AS BIGINT) AS win_n,
           CASE WHEN g + l > 0
                THEN round(100 * CAST(g AS DOUBLE) / (g + l), 4) END AS rsi
    FROM wnd
    """,
    doc="Cutler's RSI (simple-average variant — window-expressible, "
    "unlike Wilder's recursive smoothing) over 14 days of daily "
    "value-cents changes per event_type; gains/losses stay exact "
    "integers until the one final division",
)
def events_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    lagw = Window.partitionBy("event_type").orderBy("d")
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-13, Window.currentRow)
    )
    return (
        _daily_cents(spark, sf_dir)
        .withColumn("chg", F.col("v") - F.lag("v").over(lagw))
        .filter(F.col("chg").isNotNull())
        .withColumn("gain", F.expr("CASE WHEN chg > 0 THEN chg ELSE 0 END"))
        .withColumn("loss", F.expr("CASE WHEN chg < 0 THEN -chg ELSE 0 END"))
        .withColumn("g", F.sum("gain").over(w))
        .withColumn("l", F.sum("loss").over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .select(
            "event_type",
            "d",
            F.col("v").alias("v_cents"),
            F.col("n").cast("long").alias("win_n"),
            F.expr(
                "CASE WHEN g + l > 0 "
                "THEN round(100 * CAST(g AS DOUBLE) / (g + l), 4) END"
            ).alias("rsi"),
        )
    )


@register(
    "customer_revenue_gini",
    """
    WITH cr AS (
        SELECT c.c_mktsegment, c.c_custkey,
               CAST(coalesce(sum(CAST(round(o.o_totalprice * 100)
                                      AS BIGINT)), 0) AS BIGINT) AS x
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    r AS (
        SELECT c_mktsegment, x,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY x, c_custkey) AS i
        FROM cr
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(x) AS BIGINT) AS total_cents,
           round((2 * sum(CAST(i AS DOUBLE) * CAST(x AS DOUBLE))
                  - (count(*) + 1) * CAST(sum(x) AS DOUBLE))
                 / (count(*) * CAST(sum(x) AS DOUBLE)), 6) AS gini
    FROM r GROUP BY 1
    """,
    doc="Gini concentration of customer revenue per market segment via "
    "the exact rank formula G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) — all "
    "integer until the final division. Customers without orders count as "
    "zero-revenue (LEFT JOIN), which is what makes the coefficient an "
    "honest inequality measure. Ranks are a per-segment window over the "
    "per-customer aggregate (bounded: |customers| rows, not |orders|)",
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    cr = (
        customer.join(
            orders, orders.o_custkey == customer.c_custkey, "left"
        )
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")),
                F.lit(0),
            )
            .cast("long")
            .alias("x")
        )
    )
    r = cr.withColumn(
        "i",
        F.row_number().over(
            Window.partitionBy("c_mktsegment").orderBy("x", "c_custkey")
        ),
    )
    return r.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("x").cast("long").alias("total_cents"),
        # Σ i·x in DOUBLE: the BIGINT sum overflows near sf10 (i ~ 3e5,
        # x ~ 5e8 cents); at test scales every addend is an exact double
        # so the engines still agree bit-for-bit under the 6dp round
        F.expr(
            "round((2 * sum(CAST(i AS DOUBLE) * CAST(x AS DOUBLE))"
            " - (count(*) + 1) * CAST(sum(x) AS DOUBLE))"
            " / (count(*) * CAST(sum(x) AS DOUBLE)), 6)"
        ).alias("gini"),
    )


@register(
    "session_top_paths",
    """
    WITH e AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
        FROM events
    ),
    flags AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM flags
    ),
    ranked AS (
        SELECT user_id, session_id, event_type,
               row_number() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts, event_id) AS rn
        FROM sess
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 5
        GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY 1
    ORDER BY n_sessions DESC, path LIMIT 25
    """,
    doc="Top-25 session journeys: 30-min-gap sessionization (same "
    "dialect as events_sessionize), path = first 5 event_types in "
    "(ts, event_id) order joined with '>', counted across all sessions. "
    "Spark orders the path deterministically by sorting collected "
    "(rn, event_type) structs — collect_list alone is order-unstable "
    "under retries/AQE. Limit carries the path tiebreaker",
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = sessionize(
        _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type"),
        "user_id",
        "ts",
        1800,
    )
    ranked = sess.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "session_id").orderBy(
                "ts", "event_id"
            )
        ),
    ).filter(F.col("rn") <= 5)
    paths = ranked.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(25)
    )


@register(
    "orders_business_day_revenue",
    """
    WITH s AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               CASE WHEN dayofweek(o_orderdate) = 6 THEN 2
                    WHEN dayofweek(o_orderdate) = 0 THEN 1
                    ELSE 0 END AS shift_days,
               o_orderdate + CAST(CASE WHEN dayofweek(o_orderdate) = 6 THEN 2
                                       WHEN dayofweek(o_orderdate) = 0 THEN 1
                                       ELSE 0 END || ' days' AS INTERVAL)
                   AS settle
        FROM orders
    )
    SELECT CAST(settle AS TIMESTAMP) AS settle_day,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN shift_days > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shifted,
           CAST(sum(cents) AS BIGINT) AS rev_cents
    FROM s GROUP BY 1
    """,
    doc="Business-day settlement alignment: weekend orders roll to the "
    "next Monday (Sat +2, Sun +1) before the daily revenue rollup — the "
    "calendar-dialect row: Spark dayofweek is 1=Sunday..7=Saturday, "
    "DuckDB's is 0=Sunday..6=Saturday, so the oracle tests Saturday as "
    "6 where Spark tests 7. Pure projection + one hash agg",
)
def orders_business_day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    s = o.select(
        "o_orderdate",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "CASE WHEN dayofweek(o_orderdate) = 7 THEN 2 "
            "WHEN dayofweek(o_orderdate) = 1 THEN 1 ELSE 0 END"
        ).alias("shift_days"),
    ).withColumn(
        "settle",
        F.expr("date_add(CAST(o_orderdate AS DATE), shift_days)"),
    )
    return (
        s.groupBy(F.col("settle").cast("timestamp").alias("settle_day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("shift_days") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_shifted"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )


@register(
    "full_outer_hourly_type_matrix",
    """
    WITH s AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(count(*) AS BIGINT) AS n_signup
        FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    e AS (
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(count(*) AS BIGINT) AS n_error
        FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT coalesce(s.h, e.h) AS h,
           coalesce(s.n_signup, 0) AS n_signup,
           coalesce(e.n_error, 0)  AS n_error,
           CASE WHEN s.h IS NULL THEN 'error_only'
                WHEN e.h IS NULL THEN 'signup_only'
                ELSE 'both' END AS presence
    FROM s FULL OUTER JOIN e ON s.h = e.h
    """,
    doc="C3's FULL OUTER member as a registered query (left/right were "
    "already driver-checked): hourly signup vs error counts "
    "null-extended on both sides — hours where only one series exists "
    "survive with the other side coalesced to 0. Both inputs are "
    "bounded hourly aggregates, so the outer join runs on tiny frames",
)
def full_outer_hourly_type_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)

    def hourly(t: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == t)
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    s, e = hourly("signup", "n_signup"), hourly("error", "n_error")
    return (
        s.join(e, "h", "full")
        .select(
            "h",
            F.coalesce("n_signup", F.lit(0)).alias("n_signup"),
            F.coalesce("n_error", F.lit(0)).alias("n_error"),
            F.when(F.col("n_signup").isNull(), "error_only")
            .when(F.col("n_error").isNull(), "signup_only")
            .otherwise("both")
            .alias("presence"),
        )
    )


@register(
    "events_anomaly_mad",
    f"""
    WITH d AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, v AS med FROM (
            SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY v, d) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM d
        ) WHERE rn = (n + 1) // 2
    ),
    dev AS (
        SELECT d.event_type, d.d, d.v, m.med, abs(d.v - m.med) AS ad
        FROM d JOIN m ON d.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, ad AS mad FROM (
            SELECT event_type, ad, d,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ad, d) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) WHERE rn = (n + 1) // 2
    )
    SELECT dev.event_type, dev.d, dev.v, dev.med, mad.mad,
           round(CAST(dev.v - dev.med AS DOUBLE) / mad.mad, 4) AS robust_z
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    WHERE mad.mad > 0 AND abs(dev.v - dev.med) > 3 * mad.mad
    """,
    doc="Median/MAD robust anomaly flags on daily value cents per type — "
    "the outlier-resistant companion to the mean/σ rolling-z (F11): one "
    "polluted spike day shifts a mean but not a nearest-rank median. "
    "Both medians are NEAREST-RANK order statistics (the F52 dialect "
    "rule) picked by row_number with a day tiebreak; all integer until "
    "the final division. Flag: |v − med| > 3·MAD",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily_cents(spark, sf_dir)
    wv = Window.partitionBy("event_type").orderBy("v", "d")
    wn = Window.partitionBy("event_type")
    m = (
        d.withColumn("rn", F.row_number().over(wv))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("v").alias("med"))
    )
    dev = d.join(m, "event_type").withColumn(
        "ad", F.abs(F.col("v") - F.col("med"))
    )
    wa = Window.partitionBy("event_type").orderBy("ad", "d")
    mad = (
        dev.withColumn("rn", F.row_number().over(wa))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.expr("rn = (n + 1) div 2"))
        .select("event_type", F.col("ad").alias("mad"))
    )
    return (
        dev.join(mad, "event_type")
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("v") - F.col("med")) > 3 * F.col("mad"))
        )
        .select(
            "event_type",
            "d",
            "v",
            "med",
            "mad",
            F.expr(
                "round(CAST(v - med AS DOUBLE) / mad, 4)"
            ).alias("robust_z"),
        )
    )


@register(
    "brand_discount_elasticity",
    """
    WITH x AS (
        SELECT p.p_brand,
               CAST(round(l.l_discount * 100) AS BIGINT) AS disc_pct,
               CAST(l.l_quantity AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
        SELECT p_brand,
               count(*)              AS n,
               sum(disc_pct)         AS sx,
               sum(qty)              AS sy,
               sum(disc_pct * qty)   AS sxy,
               sum(disc_pct * disc_pct) AS sxx
        FROM x GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
           CASE WHEN n * sxx - sx * sx > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx), 6) END AS slope_qty_per_pct,
           round(CAST(sy AS DOUBLE) / n, 4) AS avg_qty
    FROM s
    """,
    doc="Discount elasticity per brand: OLS slope of quantity on "
    "discount-percent from EXACT integer power sums (the engine-portable "
    "regression — regr_slope's streaming fp accumulation drifts across "
    "engines, identical integer operands cannot). Dim join on part, one "
    "hash agg on the fact",
)
def brand_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    x = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("disc_pct"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    s = x.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("disc_pct").alias("sx"),
        F.sum("qty").alias("sy"),
        F.sum(F.expr("disc_pct * qty")).alias("sxy"),
        F.sum(F.expr("disc_pct * disc_pct")).alias("sxx"),
    )
    return s.select(
        "p_brand",
        F.col("n").cast("long").alias("n_lines"),
        F.expr(
            "CASE WHEN n * sxx - sx * sx > 0 "
            "THEN round(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (n * sxx - sx * sx), 6) END"
        ).alias("slope_qty_per_pct"),
        F.expr("round(CAST(sy AS DOUBLE) / n, 4)").alias("avg_qty"),
    )


@register(
    "topk_parts_with_ties",
    """
    SELECT p_partkey, p_brand, p_retailprice, CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT p_partkey, p_brand, p_retailprice,
               rank() OVER (ORDER BY p_retailprice DESC) AS rnk
        FROM part
    ) WHERE rnk <= 10
    ORDER BY rnk, p_partkey
    """,
    doc="G+: top-k WITH TIES (rank-filter semantics — every row tied "
    "with the k-th survives, unlike row_number/LIMIT which truncates "
    "arbitrarily inside a tie class). The deterministic-output top-k "
    "when the sort key is non-unique and no tiebreaker is wanted",
)
def topk_parts_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w = Window.orderBy(F.desc("p_retailprice"))
    return (
        part.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("p_partkey", "p_brand", "p_retailprice", "rnk")
        .orderBy("rnk", "p_partkey")
    )


_RUNOFF_SQL = """
    WITH RECURSIVE q AS (
        SELECT CAST(date_trunc('quarter', CAST(o_orderdate AS DATE))
                    AS TIMESTAMP) AS qtr,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1
    ),
    o AS (
        SELECT qtr, rev,
               CAST(row_number() OVER (ORDER BY qtr) AS BIGINT) AS i
        FROM q
    ),
    cap AS (SELECT (2 * sum(rev)) {div} count(*) AS cap FROM q),
    t AS (
        SELECT o.i, o.qtr, o.rev,
               CASE WHEN o.rev >= c.cap THEN 0 ELSE o.rev END AS carry,
               CAST(CASE WHEN o.rev >= c.cap THEN 1 ELSE 0 END
                    AS BIGINT) AS n_resets
        FROM o CROSS JOIN cap c WHERE o.i = 1
        UNION ALL
        SELECT o.i, o.qtr, o.rev,
               CASE WHEN t.carry + o.rev >= c.cap THEN 0
                    ELSE t.carry + o.rev END,
               t.n_resets + CASE WHEN t.carry + o.rev >= c.cap
                                 THEN 1 ELSE 0 END
        FROM t JOIN o ON o.i = t.i + 1 CROSS JOIN cap c
    )
    SELECT qtr, rev, carry, n_resets FROM t
"""


@register(
    "orders_budget_runoff_rcte",
    _RUNOFF_SQL.format(div="//"),
    doc="§3.2 WITH RECURSIVE (Spark 4 recursive CTE, UNION ALL form): a "
    "budget-cap runoff over quarterly revenue — carry accumulates and "
    "RESETS to zero when it crosses the cap (2× mean quarterly revenue, "
    "integer floor-div). Reset-on-threshold state is genuinely "
    "sequential (not window-expressible: the reset point depends on the "
    "full prior state path), the textbook recursive-CTE case. Recursion "
    "depth = #quarters (~27), one tiny row per level; both engines run "
    "the SAME recursive SQL (only the floor-div spelling differs)",
)
def orders_budget_runoff_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RUNOFF_SQL.format(div="div"))


@register(
    "orders_param_sql_priority_summary",
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS rev_cents
    FROM orders
    WHERE o_totalprice >= 150000.0
    GROUP BY o_orderpriority
    """,
    doc="§3.2 parameterized SQL (Spark 4 named parameter markers): the "
    "threshold arrives via spark.sql(..., args={'thr': ...}) instead of "
    "string interpolation — the injection-safe plumbing for "
    "user-supplied predicates; Catalyst still constant-folds and pushes "
    "the bound literal down to the scan",
)
def orders_param_sql_priority_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM orders
        WHERE o_totalprice >= :thr
        GROUP BY o_orderpriority
        """,
        args={"thr": 150000.0},
    )


@register(
    "nation_revenue_share_of_region",
    """
    WITH r AS (
        SELECT n.n_nationkey, n.n_name, n.n_regionkey,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2, 3
    )
    SELECT n_name, n_regionkey, rev,
           round(CAST(rev AS DOUBLE)
                 / sum(rev) OVER (PARTITION BY n_regionkey), 6)
               AS share_of_region,
           round(CAST(rev AS DOUBLE) / sum(rev) OVER (), 6)
               AS share_of_total
    FROM r
    """,
    doc="Ratio-to-report / share-of-parent: nation revenue as a share of "
    "its region and of the grand total via windowed sums OVER the "
    "aggregate (the ratio_to_report pattern) — both denominators are "
    "window functions on the 25-row nation frame, so the global window's "
    "single-partition move is over a bounded aggregate, never raw facts",
)
def nation_revenue_share_of_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey", "n_name", "n_regionkey")
        .agg(
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).cast("long").alias("rev")
        )
    )
    wr = Window.partitionBy("n_regionkey")
    wt = Window.partitionBy()
    return r.select(
        "n_name",
        "n_regionkey",
        "rev",
        F.round(F.col("rev").cast("double") / F.sum("rev").over(wr), 6).alias(
            "share_of_region"
        ),
        F.round(F.col("rev").cast("double") / F.sum("rev").over(wt), 6).alias(
            "share_of_total"
        ),
    )


@register(
    "events_purchase_carry_forward",
    f"""
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
           last_value(CASE WHEN event_type = 'purchase'
                           THEN {_CENTS} END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id
                     ROWS UNBOUNDED PRECEDING) AS last_purchase_cents
    FROM events
    """,
    doc="E-surface IGNORE NULLS: every event annotated with the user's "
    "most recent purchase amount via last_value(... IGNORE NULLS) — the "
    "carry-forward idiom as an explicit window modifier (F3's ffill "
    "uses the same engine mechanism through last(ignoreNulls=True)); "
    "one shuffle on user_id",
)
def events_purchase_carry_forward(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(
        F.expr(
            "CASE WHEN event_type = 'purchase' "
            "THEN CAST(round(value * 100) AS BIGINT) END"
        ),
        ignorenulls=True,
    ).over(w)
    return ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        carried.alias("last_purchase_cents"),
    )


@register(
    "events_user_behavior_entropy",
    """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    n AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1)
    SELECT c.user_id, n.n AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           round(ln(CAST(n.n AS DOUBLE))
                 - sum(c.c * ln(CAST(c.c AS DOUBLE))) / n.n, 4)
               AS behavior_entropy_nats
    FROM c JOIN n ON c.user_id = n.user_id
    GROUP BY c.user_id, n.n
    """,
    doc="Per-user behavioral entropy over event-type frequencies (the "
    "K19 count identity H = ln N − (Σ c·ln c)/N applied to behavior): "
    "0 = single-action bots, high = diverse engagement — the "
    "segmentation feature beside RFM. Two hash aggs, both on user_id",
)
def events_user_behavior_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    c = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    n = c.groupBy("user_id").agg(F.sum("c").cast("long").alias("n"))
    return (
        c.join(n, "user_id")
        .groupBy("user_id", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.expr(
                "round(ln(CAST(n AS DOUBLE))"
                " - sum(c * ln(CAST(c AS DOUBLE))) / n, 4)"
            ).alias("behavior_entropy_nats"),
        )
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            "n_types",
            "behavior_entropy_nats",
        )
    )


@register(
    "supplier_part_bipartite_degree",
    """
    WITH e AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    sd AS (SELECT s, count(*) AS deg FROM e GROUP BY s),
    pd AS (SELECT p, count(*) AS deg FROM e GROUP BY p)
    SELECT 'supplier' AS side, CAST(deg AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM sd GROUP BY deg
    UNION ALL
    SELECT 'part' AS side, CAST(deg AS BIGINT) AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM pd GROUP BY deg
    """,
    doc="Degree distributions of the supplier-part bipartite graph "
    "induced by lineitem (DISTINCT edges first — multiplicity is "
    "shipment count, not connectivity): the graph-shape profile run "
    "before committing to a partitioning for graph algorithms "
    "(skewed degrees → salt hubs). Distinct + two hash aggs",
)
def supplier_part_bipartite_degree(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()

    def side(col: str, name: str) -> DataFrame:
        return (
            e.groupBy(col)
            .agg(F.count(F.lit(1)).alias("deg"))
            .groupBy("deg")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .select(
                F.lit(name).alias("side"),
                F.col("deg").cast("long").alias("degree"),
                "n_nodes",
            )
        )

    return side("s", "supplier").unionAll(side("p", "part"))


@register(
    "events_salted_user_enrichment",
    """
    WITH dim AS (
        SELECT c_custkey AS user_id, c_mktsegment
        FROM customer WHERE c_custkey < 150
    )
    SELECT d.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events e JOIN dim d ON d.user_id = e.user_id
    GROUP BY d.c_mktsegment
    """,
    doc="Skew-mitigation path under external verification: the fact side "
    "(events, hot users dominate) joins the per-user dim through "
    "operators/skew.py::salted_join — hot keys spread across 8 salts, "
    "dim replicated per salt — and the oracle is the PLAIN join, so the "
    "driver re-proves salted ≡ plain on every check (row-identity is "
    "the operator's whole contract). The aggregate collapses the result "
    "to segment grain so the check is layout-independent",
)
def events_salted_user_enrichment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.skew import salted_join

    ev = _events(spark, sf_dir)
    dim = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 150)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    joined = salted_join(ev, dim, on="user_id", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("value_cents"),
    )


@register(
    "bucketed_join_layout_report",
    # round 12 (rows-only → oracle): the per-priority join aggregates
    # are plain relational math, and join_key_exchanges is pinned to
    # the LITERAL 0 — the oracle now ENFORCES the exchange-free bucketed
    # plan (the A15 dpp_active=1 upgrade pattern): a layout regression
    # that reintroduces a shuffle hash-fails externally, not just in
    # tests/test_plans.py.
    """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents,
           CAST(0 AS BIGINT) AS join_key_exchanges
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="A4b/C1 co-located bucketed join, driver-visible: orders and "
    "lineitem written bucketBy(8, orderkey) into a temp warehouse, "
    "joined with broadcast disabled — the plan's Exchange count (0 on "
    "the join inputs; introspected from the executed plan) and the "
    "per-priority revenue totals prove the shuffle-free layout AND the "
    "join's correctness in one report. The write cost is the point: pay "
    "one shuffle at write time, join shuffle-free forever after. Temp "
    "tables/dirs dropped before returning",
)
def bucketed_join_layout_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    tag = uuid.uuid4().hex[:8]
    t_o, t_l = f"b_orders_{tag}", f"b_lineitem_{tag}"
    path = tempfile.mkdtemp(prefix="bucketed_")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        from time_series_spark_spark.sources.io import write_bucketed

        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        write_bucketed(orders, t_o, ["o_orderkey"], 8, path=f"{path}/o")
        write_bucketed(li, t_l, ["l_orderkey"], 8, path=f"{path}/l")
        bo, bl = spark.table(t_o), spark.table(t_l)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            bo.join(bl, bo.o_orderkey == bl.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_lines"),
                F.sum(
                    F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
                ).cast("long").alias("price_cents"),
            )
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange hashpartitioning(o_orderkey")
        rows = [
            (r["o_orderpriority"], r["n_lines"], r["price_cents"], n_exch)
            for r in joined.collect()
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_l}")
        shutil.rmtree(path, ignore_errors=True)
    return local_df(spark, 
        rows,
        "o_orderpriority string, n_lines long, price_cents long, "
        "join_key_exchanges long",
    ).orderBy("o_orderpriority")


@register(
    "supplier_cosupply_triangles",
    """
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_quantity > 45
    ),
    e AS (
        SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    deg AS (
        SELECT v, count(*) AS d
        FROM (SELECT s1 AS v FROM e UNION ALL SELECT s2 AS v FROM e)
        GROUP BY v
    ),
    w AS (
        SELECT e1.s1 AS a, e2.s2 AS c
        FROM e e1 JOIN e e2 ON e1.s2 = e2.s1
    ),
    t AS (
        SELECT count(*) AS n_tri
        FROM w JOIN e ON w.a = e.s1 AND w.c = e.s2
    )
    SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_vertices,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT sum(d * (d - 1) // 2) FROM deg) AS BIGINT)
               AS n_wedges,
           CAST((SELECT n_tri FROM t) AS BIGINT) AS n_triangles,
           round(3.0 * (SELECT n_tri FROM t)
                 / (SELECT sum(d * (d - 1) // 2) FROM deg), 6)
               AS global_clustering
    """,
    doc="Exact triangle count + global clustering coefficient of the "
    "supplier co-supply graph (suppliers co-occurring on high-quantity "
    "lineitems of the same order): ordered wedge-closing joins — each "
    "triangle {x<y<z} found exactly once as wedge (x,y)+(y,z) closed by "
    "edge (x,z); the wedge intermediate is bounded by forward×backward "
    "degree per middle vertex (degree-ordered relabeling is the hub "
    "control at scale) — operators/graph.py::triangle_stats",
)
def supplier_cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.graph import triangle_stats

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s1")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s2")
    )
    edges = (
        a.join(b, on="k")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    return triangle_stats(edges, src="s1", dst="s2")


@register(
    "supplier_cosupply_bfs_hops",
    """
    WITH RECURSIVE li AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_quantity > 45
    ),
    e0 AS (
        SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    e AS (
        SELECT s1, s2 FROM e0
        UNION ALL
        SELECT s2 AS s1, s1 AS s2 FROM e0
    ),
    walk(node, d) AS (
        SELECT (SELECT min(s1) FROM e), 0
        UNION
        SELECT e.s2, w.d + 1
        FROM walk w JOIN e ON e.s1 = w.node
        WHERE w.d < 6
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(min(d) AS BIGINT) AS hops
    FROM walk GROUP BY node
    """,
    doc="BFS shortest hop counts from the smallest supplier in the "
    "co-supply graph (≤ 6 hops): iterative frontier expansion — one "
    "frontier⋈edges hash join + visited anti-join per layer, O(diameter) "
    "rounds with eager lineage truncation (Pregel-style; "
    "operators/graph.py::bfs_hops). The oracle is a DuckDB RECURSIVE CTE "
    "walking (node, depth) pairs hop-bounded to the same horizon",
)
def supplier_cosupply_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.graph import bfs_hops

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s1")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s2")
    )
    edges = (
        a.join(b, on="k")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    source = edges.agg(F.min("s1")).first()[0]
    return bfs_hops(edges, source, src="s1", dst="s2", max_hops=6).select(
        F.col("node").cast("long").alias("node"),
        F.col("hops").cast("long").alias("hops"),
    )


@register(
    "supplier_cosupply_kcore",
    None,  # iterative set-shrinking peeling is not expressible as a
    # (monotone-accumulating) recursive CTE → rows-only; exact peeling
    # semantics pinned against a reference implementation in tests
    doc="15-core of the supplier co-supply graph (Seidman): iteratively "
    "peel vertices with degree < 15 until a fixpoint (k chosen just "
    "below the graph's core collapse threshold so the peel cascades for "
    "several rounds AND a nontrivial core survives) — one degree hash-agg "
    "+ two anti-joins per round, rounds bounded by peeling depth, eager "
    "lineage truncation (operators/graph.py::k_core). The density filter "
    "run before community detection; output is each surviving supplier "
    "with its within-core degree",
)
def supplier_cosupply_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.graph import k_core

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s1")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("s2")
    )
    edges = (
        a.join(b, on="k")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    return k_core(edges, k=15, src="s1", dst="s2").orderBy("node")


# ---------------------------------------------------------------------------
# F84 zero-floor clamped running balance (prefix-min closed form)
# ---------------------------------------------------------------------------
@register(
    "users_clamped_balance",
    """
    WITH tx AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100, 0) AS BIGINT)
                    ELSE -CAST(round(value * 100, 0) AS BIGINT) END AS delta
        FROM events WHERE event_type IN ('purchase', 'error')
    ),
    scanned AS (
        SELECT user_id, ts, event_id,
               CAST(sum(delta) OVER w AS BIGINT) AS s
        FROM tx
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    bal AS (
        SELECT user_id, ts, event_id,
               s - least(CAST(0 AS BIGINT),
                         CAST(min(s) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)) AS b
        FROM scanned
    )
    SELECT user_id,
           count(*) AS n_tx,
           CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_floor_hits,
           CAST(max(b) AS BIGINT) AS peak_cents,
           CAST(arg_max(b, ts || '-' || lpad(CAST(event_id AS VARCHAR),
                                             12, '0')) AS BIGINT)
               AS final_cents
    FROM bal GROUP BY user_id
    ORDER BY user_id
    """,
    doc="F84 zero-floor clamped running balance: purchases credit, "
    "errors debit (integer cents), balance never drops below 0. The "
    "clamp LOOKS like a sequential non-associative scan, but has the "
    "prefix-min closed form b_t = S_t - min(0, min_{j<=t} S_j), so it "
    "stays two window passes over the same (user, ts) partitioning - "
    "no grouped-map UDF, no per-row recursion, fully parallel at 100 "
    "TB. Per-user summary: tx count, floor hits, peak and final "
    "balance; exact integer arithmetic end to end.",
)
def users_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    tx = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id", "ts", "event_id",
        F.when(F.col("event_type") == "purchase", cents)
        .otherwise(-cents)
        .alias("delta"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    scanned = tx.withColumn("s", F.sum("delta").over(w))
    bal = scanned.withColumn(
        "b",
        F.col("s") - F.least(F.lit(0).cast("long"), F.min("s").over(w)),
    )
    # final = b at the max (ts, event_id); string key mirrors the oracle
    ord_key = F.concat_ws(
        "-", F.col("ts").cast("string"), F.lpad(F.col("event_id").cast("string"), 12, "0")
    )
    return (
        bal.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.sum(F.when(F.col("b") == 0, 1).otherwise(0)).alias(
                "n_floor_hits"
            ),
            F.max("b").alias("peak_cents"),
            F.max_by("b", ord_key).alias("final_cents"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Graph: label-propagation communities on the co-supply graph
# ---------------------------------------------------------------------------
@register(
    "part_copurchase_lpa_communities",
    None,  # iterative most-frequent-neighbor-label fixpoint is not
    # SQL-expressible; planted-community semantics and determinism are
    # pinned in tests/test_graph.py
    doc="Deterministic synchronous label-propagation communities "
    "(Raghavan 2007, smallest-label tie-break) over the part "
    "co-purchase graph (parts on the same order, both high-quantity; "
    "~1 edge/vertex, so real community structure — the denser supplier "
    "graph collapses to one label, measured and rejected as substrate). "
    "Unlike connected components, LPA splits weakly-bridged dense "
    "regions (two cliques joined by one edge keep separate labels; "
    "pinned in tests). Output: one row per community with size and "
    "min/max member id, size desc. Per sweep: one node-keyed join + "
    "two-level vote agg, |V|-row state, lineage truncated per sweep "
    "(operators/graph.py::label_propagation).",
)
def part_copurchase_lpa_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.graph import label_propagation

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    e = (
        li.alias("a")
        .join(li.alias("b"), on="l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("a"),
            F.col("b.l_partkey").alias("b"),
        )
        .distinct()
    )
    comm = label_propagation(e, "a", "b", max_iter=10)
    return (
        comm.groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .orderBy(F.desc("n_members"), "community")
    )


# ---------------------------------------------------------------------------
# F90 exact two-sample Kolmogorov-Smirnov drift
# ---------------------------------------------------------------------------
# D's sup is attained at a jump, so scanning distinct values suffices;
# the comparison is kept in INTEGERS (|i*n_b - j*n_a|) and divided once
# at the end — the only fp ops are that one division and the p-value's
# exp, both rounded.
@register(
    "orders_ks_drift",
    """
    WITH x AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 0 END AS in_a
        FROM orders
    ),
    per_v AS (
        SELECT v,
               CAST(sum(in_a) AS BIGINT) AS ca,
               CAST(sum(1 - in_a) AS BIGINT) AS cb
        FROM x GROUP BY v
    ),
    cum AS (
        SELECT v,
               CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS i,
               CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS j,
               CAST(sum(ca) OVER () AS BIGINT) AS na,
               CAST(sum(cb) OVER () AS BIGINT) AS nb
        FROM per_v
    )
    SELECT max(na) AS n_a, max(nb) AS n_b,
           CAST(max(abs(i * nb - j * na)) AS BIGINT) AS d_numer,
           round(max(abs(i * nb - j * na)) * 1.0 / (max(na) * max(nb)), 6)
               AS ks_d,
           round(2.0 * exp(-2.0 *
               pow((sqrt(max(na) * 1.0 * max(nb) / (max(na) + max(nb)))
                    + 0.12
                    + 0.11 / sqrt(max(na) * 1.0 * max(nb)
                                  / (max(na) + max(nb))))
                   * (max(abs(i * nb - j * na)) * 1.0
                      / (max(na) * max(nb))), 2)), 6) AS p_approx
    FROM cum
    """,
    doc="F90 exact two-sample Kolmogorov-Smirnov drift between pre-1998 "
    "and 1998+ order values: D's supremum is scanned over distinct "
    "values with the comparison held in INTEGERS (|i*n_b - j*n_a|, one "
    "division at the end) — no fp CDFs, no sampling; p-value by the "
    "Stephens small-sample approximation (libm exp/sqrt, rounded 6dp). "
    "One hash agg to distinct values, then a window over the distinct-"
    "value frame (partition by metric key at scale). Single summary "
    "row. Validity bound: |i*n_b - j*n_a| stays in BIGINT only while "
    "n_a*n_b < 2^63 (≈ n ≲ 3e9 rows total) — past that, non-ANSI Spark "
    "wraps silently while DuckDB promotes to HUGEINT; switch the "
    "deviation to DECIMAL(38,0) or double beyond that row count. "
    "ENFORCED at runtime: operators/guards.bigint_bound raises past "
    "the bound instead of diverging.",
)
def orders_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    x = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        F.when(
            F.col("o_orderdate") < "1998-01-01", 1
        ).otherwise(0).alias("in_a"),
    )
    from time_series_spark_spark.operators.rank import global_cumsum

    per_v = x.groupBy("v").agg(
        F.sum("in_a").alias("ca"),
        F.sum(F.lit(1) - F.col("in_a")).alias("cb"),
    )
    # distinct cents are near-unique -> the distinct-value frame is
    # row-scale; running counts via the range-partitioned two-pass
    # (operators/rank.py), totals via a 1-row broadcast
    tot = per_v.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    cum = global_cumsum(
        per_v.withColumn("i", F.col("ca")).withColumn("j", F.col("cb")),
        [("v", True)],
        ["i", "j"],
    ).select("i", "j").crossJoin(F.broadcast(tot))
    na, nb = F.max("na"), F.max("nb")
    d_num = F.max(F.abs(F.col("i") * F.col("nb") - F.col("j") * F.col("na")))
    ks_d = d_num * 1.0 / (na * nb)
    n_eff = F.sqrt(na * 1.0 * nb / (na + nb))
    lam = (n_eff + 0.12 + 0.11 / n_eff) * ks_d
    from time_series_spark_spark.operators.guards import bigint_bound

    return cum.agg(
        na.alias("n_a"),
        nb.alias("n_b"),
        # enforce (not just document) the validity bound: the deviation
        # |i*n_b - j*n_a| <= n_a*n_b must stay in BIGINT
        bigint_bound(d_num, na * 1.0 * nb, "n_a*n_b").alias("d_numer"),
        F.round(ks_d, 6).alias("ks_d"),
        F.round(2.0 * F.exp(-2.0 * F.pow(lam, 2)), 6).alias("p_approx"),
    )


# ---------------------------------------------------------------------------
# F91 exact Mann-Whitney rank-sum test
# ---------------------------------------------------------------------------
@register(
    "orders_mannwhitney_period",
    """
    WITH x AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 0 END AS in_a
        FROM orders
    ),
    per_v AS (
        SELECT v, CAST(sum(in_a) AS BIGINT) AS ca,
               CAST(count(*) AS BIGINT) AS t
        FROM x GROUP BY v
    ),
    cum AS (
        SELECT ca, t,
               CAST(COALESCE(sum(t) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS s,
               CAST(sum(ca) OVER () AS BIGINT) AS na,
               CAST(sum(t - ca) OVER () AS BIGINT) AS nb
        FROM per_v
    )
    SELECT max(na) AS n_a, max(nb) AS n_b,
           CAST(sum(ca * (2 * s + t + 1)) - max(na) * (max(na) + 1)
                AS BIGINT) AS u2_a,
           round((sum(ca * (2 * s + t + 1)) - max(na) * (max(na) + 1))
                 * 0.5 / (max(na) * max(nb)), 6) AS auc_effect
    FROM cum
    """,
    doc="F91 exact Mann-Whitney rank-sum: doubled tie-averaged rank sums "
    "stay INTEGER (2R_a = sum ca*(2s+t+1) over tie groups), so "
    "2U_a = 2R_a - n_a(n_a+1) is exact in both engines with zero fp "
    "rank arithmetic; the common-language effect size U/(n_a*n_b) (= "
    "AUC) is the single rounded division. Same scan shape as F90 "
    "(distinct-value reduce + window). Single summary row. Validity "
    "bound: sum ca*(2s+t+1) ~ n^2 must stay < 2^63 (n ≲ 3e9 rows) — "
    "non-ANSI Spark wraps silently past that while DuckDB promotes to "
    "HUGEINT; use DECIMAL(38,0)/double deviations beyond that count. "
    "ENFORCED at runtime via operators/guards.bigint_bound.",
)
def orders_mannwhitney_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    x = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        F.when(
            F.col("o_orderdate") < "1998-01-01", 1
        ).otherwise(0).alias("in_a"),
    )
    from time_series_spark_spark.operators.rank import global_cumsum

    per_v = x.groupBy("v").agg(
        F.sum("in_a").alias("ca"), F.count(F.lit(1)).alias("t")
    )
    # near-unique distinct cents: prefix counts via the range-
    # partitioned two-pass (operators/rank.py); s = inclusive - t
    cum = global_cumsum(
        per_v.withColumn("ct", F.col("t")), [("v", True)], ["ct"]
    ).select(
        "ca", "t", (F.col("ct") - F.col("t")).alias("s")
    )
    two_r_a = F.sum(F.col("ca") * (2 * F.col("s") + F.col("t") + 1))
    na = F.sum("ca")
    nb = F.sum(F.col("t") - F.col("ca"))
    u2_a = two_r_a - na * (na + 1)
    from time_series_spark_spark.operators.guards import bigint_bound

    n_all = (na + nb) * 1.0
    return cum.agg(
        na.alias("n_a"),
        nb.alias("n_b"),
        # enforce the documented bound: 2R_a = sum ca*(2s+t+1) ~ n^2
        bigint_bound(u2_a.cast("long"), n_all * n_all, "n^2 rank sum")
        .alias("u2_a"),
        F.round(u2_a * 0.5 / (na * nb), 6).alias("auc_effect"),
    )


# ---------------------------------------------------------------------------
# F92 chi-square independence + Cramér's V
# ---------------------------------------------------------------------------
@register(
    "events_chi2_type_dow",
    """
    WITH obs AS (
        SELECT event_type,
               CAST((CAST(dayofweek(ts) AS BIGINT) + 6) % 7 AS BIGINT)
                   AS dow,
               count(*) AS o
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, dow, o,
               CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
               CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS c,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM obs
    ),
    stat AS (
        SELECT max(n) AS n,
               count(DISTINCT event_type) AS nr,
               count(DISTINCT dow) AS nc,
               sum((o * n - r * c) * (o * n - r * c) * 1.0
                   / (n * 1.0 * r * c)) AS chi2
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_events,
           CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
           round(chi2, 4) AS chi2,
           round(sqrt(chi2 / (n * least(nr - 1, nc - 1))), 6) AS cramers_v
    FROM stat
    """,
    doc="F92 chi-square test of independence for event_type × day-of-"
    "week, with Cramér's V effect size: each cell's deviation is held "
    "as the integer (O·N − R·C) and squared before the one fp division "
    "per cell — no fractional expected-counts table; dow normalized to "
    "0=Monday in both engines (Spark dayofweek is 1=Sunday, DuckDB "
    "0=Sunday, §5.1 rule). One hash agg to the contingency table "
    "(|types|×7 rows), windows over it, single summary row. Validity "
    "bound: O·N − R·C ~ n^2 stays in BIGINT only while n < ~3e9 rows — "
    "non-ANSI Spark wraps silently past that while DuckDB promotes to "
    "HUGEINT; compute deviations in DECIMAL(38,0)/double beyond that. "
    "ENFORCED at runtime via operators/guards.bigint_bound.",
)
def events_chi2_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        ((F.dayofweek("ts").cast("long") + 5) % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    m = obs.select(
        "event_type", "dow", "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("r"),
        F.sum("o").over(W.partitionBy("dow")).alias("c"),
        F.sum("o").over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    dev = F.col("o") * F.col("n") - F.col("r") * F.col("c")
    stat = m.agg(
        F.max("n").alias("n"),
        F.countDistinct("event_type").alias("nr"),
        F.countDistinct("dow").alias("nc"),
        F.sum(
            dev * dev * 1.0 / (F.col("n") * 1.0 * F.col("r") * F.col("c"))
        ).alias("chi2"),
    )
    from time_series_spark_spark.operators.guards import bigint_bound

    return stat.select(
        # enforce the documented bound: each cell deviation O*N - R*C
        # is at most n^2 in magnitude
        bigint_bound(
            F.col("n"), F.col("n") * 1.0 * F.col("n"), "cell deviation n^2"
        ).alias("n_events"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).alias("dof"),
        F.round("chi2", 4).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# F93 Benford first-digit forensic audit
# ---------------------------------------------------------------------------
@register(
    "orders_benford_audit",
    """
    WITH d AS (
        SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)
                    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
        WHERE o_totalprice > 0
    ),
    obs AS (
        SELECT digit, count(*) AS o,
               CAST(sum(count(*)) OVER () AS BIGINT) AS n
        FROM d GROUP BY digit
    )
    SELECT digit, o AS n_orders,
           round(o * 1.0 / n, 6) AS observed_p,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_p,
           round(o * 1.0 / n - ln(1.0 + 1.0 / digit) / ln(10.0), 6)
               AS deviation
    FROM obs
    ORDER BY digit
    """,
    doc="F93 Benford's-law first-digit audit of order values — the "
    "forensic screen for fabricated or truncated numeric data: observed "
    "first-digit shares vs log10(1+1/d), per-digit deviation. (The "
    "synthetic corpus's uniform-ish prices will NOT be Benford — the "
    "audit's job is to SHOW that, not to pass it.) One scan + 9-row "
    "agg; libm ln rounded 6dp per the repo rule.",
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("long")
                .cast("string"),
                1, 1,
            ).cast("long").alias("digit")
        )
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("o")).select(
        "digit", "o",
        F.sum("o").over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("n"),
    )
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return obs.select(
        "digit",
        F.col("o").alias("n_orders"),
        F.round(F.col("o") * 1.0 / F.col("n"), 6).alias("observed_p"),
        F.round(benford, 6).alias("benford_p"),
        F.round(F.col("o") * 1.0 / F.col("n") - benford, 6).alias(
            "deviation"
        ),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# F94 VWAP (volume-weighted average price)
# ---------------------------------------------------------------------------
@register(
    "lineitem_vwap_monthly",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                      AS DOUBLE)
                 / sum(CAST(l_quantity AS BIGINT)) / 100.0, 4) AS vwap
    FROM lineitem
    GROUP BY 1 ORDER BY 1
    """,
    doc="F94 volume-weighted average price per ship month: "
    "sum(extendedprice)/sum(quantity), the execution-quality benchmark "
    "every trading/market system reports. Both numerator (integer "
    "cents) and denominator (integer units) are EXACT integer sums — "
    "order-insensitive at any scale — with a single fp division and "
    "round at the end. One hash aggregation, output = |months|.",
)
def lineitem_vwap_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            ).alias("_cents"),
        )
        .select(
            "ship_month",
            "total_qty",
            F.round(
                F.col("_cents").cast("double") / F.col("total_qty") / 100.0, 4
            ).alias("vwap"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# F95 Page-Hinkley sequential drift detection
# ---------------------------------------------------------------------------
@register(
    "events_page_hinkley_drift",
    f"""
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    dev AS (
        SELECT d, v,
               CAST(v AS DOUBLE)
               - CAST(sum(v) OVER w AS DOUBLE) / count(*) OVER w
               - 500.0 AS dev
        FROM d
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    cum AS (
        SELECT d, v, sum(dev) OVER w AS m
        FROM dev
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ),
    ph AS (
        SELECT d, v, m, min(m) OVER w AS m_min
        FROM cum
        WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    )
    SELECT d, v AS total_cents, round(m - m_min, 4) AS ph_stat,
           CAST(m - m_min > 100000.0 AS INT) AS alarm
    FROM ph ORDER BY d
    """,
    doc="F95 Page-Hinkley sequential drift test over the daily total "
    "(Page 1954, the streaming-drift standard in river/MOA): cumulative "
    "deviation from the RUNNING mean minus slack delta=500 cents, "
    "alarmed when it exceeds its own running minimum by lambda=1000.00. "
    "Daily totals are exact integer cents; the running mean is the one "
    "division and every cumulative sum is evaluated in deterministic "
    "frame order, so both engines produce bit-identical doubles. "
    "Windows here are over the 30-row daily aggregate (partition by "
    "series key for fleets of series at scale).",
)
def events_page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("v"))
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    dev = d.select(
        "d", "v",
        (
            F.col("v").cast("double")
            - F.sum("v").over(w).cast("double") / F.count(F.lit(1)).over(w)
            - F.lit(500.0)
        ).alias("dev"),
    )
    ph = dev.select(
        "d", "v",
        F.sum("dev").over(w).alias("m"),
    ).select("d", "v", "m", F.min("m").over(w).alias("m_min"))
    return ph.select(
        "d",
        F.col("v").alias("total_cents"),
        F.round(F.col("m") - F.col("m_min"), 4).alias("ph_stat"),
        ((F.col("m") - F.col("m_min")) > 100000.0).cast("int").alias("alarm"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# F96 Dickey-Fuller unit-root test
# ---------------------------------------------------------------------------
@register(
    "events_adf_unit_root",
    f"""
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    lagd AS (
        SELECT v - lag(v) OVER (ORDER BY d) AS dy,
               lag(v) OVER (ORDER BY d) AS yl
        FROM d
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(yl) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
               CAST(sum(yl * yl) AS BIGINT) AS sxx,
               CAST(sum(yl * dy) AS BIGINT) AS sxy,
               CAST(sum(dy * dy) AS BIGINT) AS syy
        FROM lagd WHERE yl IS NOT NULL
    ),
    c AS (
        SELECT n,
               CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS cxx,
               CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS cxy,
               CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy
        FROM s
    )
    SELECT n AS n_obs,
           round(cxy / cxx, 8) AS beta,
           round((cxy / cxx)
                 / sqrt(((cyy - (cxy / cxx) * cxy) / (n - 2)) / cxx), 6)
               AS adf_t
    FROM c
    """,
    doc="F96 Dickey-Fuller unit-root test on the daily total: regress "
    "Δy_t on y_(t-1) with intercept; the DF statistic β̂/se(β̂) "
    "measures mean reversion (≈0 → random walk, strongly negative → "
    "stationary). All power sums are EXACT BIGINTs (order-insensitive; "
    "valid while Σy² < 2^63, ≈ daily totals ≲ 5e8 cents over ~30 "
    "days — beyond that switch the sums to DECIMAL(38,0)); the "
    "centered-moment algebra runs on doubles cast from identical "
    "integers with the same expression text in both engines. One hash "
    "agg + one lag window over the |days| frame; single summary row.",
)
def events_adf_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("v"))
    )
    lagd = d.select(
        (F.col("v") - F.lag("v").over(W.orderBy("d"))).alias("dy"),
        F.lag("v").over(W.orderBy("d")).alias("yl"),
    ).filter(F.col("yl").isNotNull())
    s = lagd.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yl").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("yl") * F.col("yl")).alias("sxx"),
        F.sum(F.col("yl") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    c = s.select(
        "n",
        F.expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n").alias("cxx"),
        F.expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n").alias("cxy"),
        F.expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n").alias("cyy"),
    )
    return c.select(
        F.col("n").alias("n_obs"),
        F.round(F.expr("cxy / cxx"), 8).alias("beta"),
        F.expr(
            "round((cxy / cxx)"
            " / sqrt(((cyy - (cxy / cxx) * cxy) / (n - 2)) / cxx), 6)"
        ).alias("adf_t"),
    )


# ---------------------------------------------------------------------------
# F97 Granger causality (lag-1, daily view -> purchase)
# ---------------------------------------------------------------------------
@register(
    "events_granger_view_purchase",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    lagd AS (
        SELECT y AS yt, lag(y) OVER (ORDER BY d) AS yl,
               lag(x) OVER (ORDER BY d) AS xl
        FROM d
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(yl) AS DOUBLE) AS sy1, CAST(sum(xl) AS DOUBLE) AS sx1,
               CAST(sum(yl * yl) AS DOUBLE) AS syy1,
               CAST(sum(xl * xl) AS DOUBLE) AS sxx1,
               CAST(sum(yl * xl) AS DOUBLE) AS syx1,
               CAST(sum(yt) AS DOUBLE) AS sy,
               CAST(sum(yt * yl) AS DOUBLE) AS syt1,
               CAST(sum(yt * xl) AS DOUBLE) AS sxt1,
               CAST(sum(yt * yt) AS DOUBLE) AS syy
        FROM lagd WHERE yl IS NOT NULL
    ),
    u AS (
        SELECT n, sy, syt1, sxt1, syy, sy1, syx1, sxx1, syy1, sx1,
               n * (syy1 * sxx1 - syx1 * syx1)
               - sy1 * (sy1 * sxx1 - syx1 * sx1)
               + sx1 * (sy1 * syx1 - syy1 * sx1) AS det
        FROM s
    ),
    coefs AS (
        SELECT n, sy, syt1, sxt1, syy, syy1, sy1,
               (sy * (syy1 * sxx1 - syx1 * syx1)
                - sy1 * (syt1 * sxx1 - syx1 * sxt1)
                + sx1 * (syt1 * syx1 - syy1 * sxt1)) / det AS a_u,
               (n * (syt1 * sxx1 - syx1 * sxt1)
                - sy * (sy1 * sxx1 - syx1 * sx1)
                + sx1 * (sy1 * sxt1 - syt1 * sx1)) / det AS b_u,
               (n * (syy1 * sxt1 - syt1 * syx1)
                - sy1 * (sy1 * sxt1 - syt1 * sx1)
                + sy * (sy1 * syx1 - syy1 * sx1)) / det AS c_u,
               (n * syt1 - sy * sy1) / (n * syy1 - sy1 * sy1) AS b_r
        FROM u
    ),
    rss AS (
        SELECT n,
               syy - a_u * sy - b_u * syt1 - c_u * sxt1 AS rss_u,
               syy - ((sy - b_r * sy1) / n) * sy - b_r * syt1 AS rss_r,
               c_u
        FROM coefs
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           round(c_u, 6) AS x_coef,
           round((rss_r - rss_u) / (rss_u / (n - 3)), 6) AS f_stat
    FROM rss
    """,
    doc="F97 Granger causality, lag 1: does yesterday's VIEW count "
    "improve today's PURCHASE-count prediction beyond yesterday's "
    "purchases? Unrestricted y_t ~ 1 + y_(t-1) + x_(t-1) solved in "
    "closed form by Cramer's rule on the 3x3 normal equations; "
    "restricted drops x. F = (RSS_r - RSS_u)/(RSS_u/(n-3)). Count "
    "sums are exact integers cast once to double; every derived "
    "quantity uses the SAME expression text in both engines, so fp "
    "results agree bit-for-bit. One hash agg to days, one lag window, "
    "one reduce; single summary row.",
)
def events_granger_view_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
    )
    lagd = d.select(
        F.col("y").alias("yt"),
        F.lag("y").over(W.orderBy("d")).alias("yl"),
        F.lag("x").over(W.orderBy("d")).alias("xl"),
    ).filter(F.col("yl").isNotNull())
    s = lagd.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("yl").cast("double").alias("sy1"),
        F.sum("xl").cast("double").alias("sx1"),
        F.sum(F.col("yl") * F.col("yl")).cast("double").alias("syy1"),
        F.sum(F.col("xl") * F.col("xl")).cast("double").alias("sxx1"),
        F.sum(F.col("yl") * F.col("xl")).cast("double").alias("syx1"),
        F.sum("yt").cast("double").alias("sy"),
        F.sum(F.col("yt") * F.col("yl")).cast("double").alias("syt1"),
        F.sum(F.col("yt") * F.col("xl")).cast("double").alias("sxt1"),
        F.sum(F.col("yt") * F.col("yt")).cast("double").alias("syy"),
    )
    u = s.withColumn(
        "det",
        F.expr(
            "n * (syy1 * sxx1 - syx1 * syx1)"
            " - sy1 * (sy1 * sxx1 - syx1 * sx1)"
            " + sx1 * (sy1 * syx1 - syy1 * sx1)"
        ),
    )
    coefs = u.select(
        "n", "sy", "syt1", "sxt1", "syy", "syy1", "sy1",
        F.expr(
            "(sy * (syy1 * sxx1 - syx1 * syx1)"
            " - sy1 * (syt1 * sxx1 - syx1 * sxt1)"
            " + sx1 * (syt1 * syx1 - syy1 * sxt1)) / det"
        ).alias("a_u"),
        F.expr(
            "(n * (syt1 * sxx1 - syx1 * sxt1)"
            " - sy * (sy1 * sxx1 - syx1 * sx1)"
            " + sx1 * (sy1 * sxt1 - syt1 * sx1)) / det"
        ).alias("b_u"),
        F.expr(
            "(n * (syy1 * sxt1 - syt1 * syx1)"
            " - sy1 * (sy1 * sxt1 - syt1 * sx1)"
            " + sy * (sy1 * syx1 - syy1 * sx1)) / det"
        ).alias("c_u"),
        F.expr(
            "(n * syt1 - sy * sy1) / (n * syy1 - sy1 * sy1)"
        ).alias("b_r"),
    )
    rss = coefs.select(
        "n", "c_u",
        F.expr("syy - a_u * sy - b_u * syt1 - c_u * sxt1").alias("rss_u"),
        F.expr(
            "syy - ((sy - b_r * sy1) / n) * sy - b_r * syt1"
        ).alias("rss_r"),
    )
    return rss.select(
        F.col("n").cast("long").alias("n_obs"),
        F.round("c_u", 6).alias("x_coef"),
        F.expr(
            "round((rss_r - rss_u) / (rss_u / (n - 3)), 6)"
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# F98 one-way ANOVA across event types
# ---------------------------------------------------------------------------
@register(
    "events_anova_value_by_type",
    f"""
    WITH g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum({_CENTS}) AS BIGINT) AS s,
               CAST(sum({_CENTS} * {_CENTS}) AS BIGINT) AS ss
        FROM events GROUP BY 1
    ),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS n_tot,
               CAST(sum(s) AS BIGINT) AS s_tot,
               CAST(sum(ss) AS BIGINT) AS ss_tot,
               sum(CAST(s AS DOUBLE) * s / n) AS sum_sq_over_n
        FROM g
    ),
    f AS (
        SELECT k, n_tot,
               sum_sq_over_n - CAST(s_tot AS DOUBLE) * s_tot / n_tot AS ssb,
               CAST(ss_tot AS DOUBLE) - sum_sq_over_n AS ssw
        FROM t
    )
    SELECT CAST(k AS BIGINT) AS k_groups, n_tot AS n_obs,
           round(ssb / (k - 1), 4) AS ms_between,
           round(ssw / (n_tot - k), 4) AS ms_within,
           round((ssb / (k - 1)) / (ssw / (n_tot - k)), 6) AS f_stat,
           round(ssb / (ssb + ssw), 6) AS eta_squared
    FROM f
    """,
    doc="F98 one-way ANOVA: does mean event value differ across the 5 "
    "event types? F = MS_between/MS_within from the sum decomposition "
    "SSB = Σ s_g²/n_g − S²/N, SSW = SS − Σ s_g²/n_g, with η² effect "
    "size. Completes the hypothesis-test family (Welch t, KS, "
    "Mann-Whitney, chi², Granger): the k-group mean comparison. All "
    "power sums EXACT BIGINTs (cents² sums < 2^63 up to ~10^10 rows at "
    "these magnitudes); the fp algebra is the same expression text in "
    "both engines. ONE hash aggregation to k rows, then scalar math.",
)
def events_anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_CENTS)).alias("s"),
            F.sum(F.expr(f"{_CENTS} * {_CENTS}")).alias("ss"),
        )
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.sum(F.expr("CAST(s AS DOUBLE) * s / n")).alias("sum_sq_over_n"),
    )
    f = t.select(
        "k", "n_tot",
        F.expr(
            "sum_sq_over_n - CAST(s_tot AS DOUBLE) * s_tot / n_tot"
        ).alias("ssb"),
        F.expr("CAST(ss_tot AS DOUBLE) - sum_sq_over_n").alias("ssw"),
    )
    return f.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("n_tot").alias("n_obs"),
        F.expr("round(ssb / (k - 1), 4)").alias("ms_between"),
        F.expr("round(ssw / (n_tot - k), 4)").alias("ms_within"),
        F.expr(
            "round((ssb / (k - 1)) / (ssw / (n_tot - k)), 6)"
        ).alias("f_stat"),
        F.expr("round(ssb / (ssb + ssw), 6)").alias("eta_squared"),
    )


# ---------------------------------------------------------------------------
# F99 Engle-Granger cointegration test
# ---------------------------------------------------------------------------
@register(
    "events_cointegration_view_click",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(x * y) AS DOUBLE) AS sxy
        FROM d
    ),
    ols AS (
        SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a
        FROM s
    ),
    resid AS (
        SELECT d.d, y - a - b * x AS e FROM d CROSS JOIN ols
    ),
    lagr AS (
        SELECT e - lag(e) OVER (ORDER BY d) AS de,
               lag(e) OVER (ORDER BY d) AS el
        FROM resid
    ),
    adf AS (
        SELECT CAST(count(*) AS DOUBLE) AS m,
               sum(el * de) AS sed, sum(el * el) AS see,
               sum(de * de) AS sdd
        FROM lagr WHERE el IS NOT NULL
    )
    SELECT CAST(m AS BIGINT) AS n_obs,
           round((SELECT b FROM ols), 6) AS hedge_ratio,
           round(sed / see, 6) AS gamma,
           round((sed / see)
                 / sqrt(((sdd - (sed / see) * sed) / (m - 1)) / see), 6)
               AS eg_t
    FROM adf
    """,
    doc="F99 Engle-Granger two-step cointegration between daily VIEW and "
    "CLICK counts: (1) closed-form OLS y ~ a + b·x gives the hedge "
    "ratio; (2) a no-constant Dickey-Fuller regression on the "
    "residuals (Δe_t = γ·e_(t-1)) gives the EG statistic — strongly "
    "negative means the spread mean-reverts (the pairs-trading / "
    "metric-coupling test). Integer count sums cast once to double; "
    "identical expression text in both engines. Shape: one hash agg to "
    "days, a 1-row OLS broadcast back, one lag window, one reduce.",
)
def events_cointegration_view_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("y"),
        )
    )
    s = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    ols = s.select(
        F.expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)").alias("b"),
        F.expr(
            "(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n"
        ).alias("a"),
    )
    resid = d.crossJoin(F.broadcast(ols)).select(
        "d", F.expr("y - a - b * x").alias("e"), "b"
    )
    lagr = resid.select(
        "b",
        (F.col("e") - F.lag("e").over(W.orderBy("d"))).alias("de"),
        F.lag("e").over(W.orderBy("d")).alias("el"),
    ).filter(F.col("el").isNotNull())
    adf = lagr.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum(F.col("el") * F.col("de")).alias("sed"),
        F.sum(F.col("el") * F.col("el")).alias("see"),
        F.sum(F.col("de") * F.col("de")).alias("sdd"),
        F.first("b").alias("b"),
    )
    return adf.select(
        F.col("m").cast("long").alias("n_obs"),
        F.round("b", 6).alias("hedge_ratio"),
        F.expr("round(sed / see, 6)").alias("gamma"),
        F.expr(
            "round((sed / see)"
            " / sqrt(((sdd - (sed / see) * sed) / (m - 1)) / see), 6)"
        ).alias("eg_t"),
    )


# ---------------------------------------------------------------------------
# F100 Mann-Kendall trend test (exact integer S + tie-corrected variance)
# ---------------------------------------------------------------------------
@register(
    "events_mann_kendall_daily",
    f"""
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT v, row_number() OVER (ORDER BY d) AS i FROM d
    ),
    p AS (
        SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM r a JOIN r b ON b.i > a.i
    ),
    t AS (
        SELECT CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_adj
        FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM d GROUP BY v)
    ),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d)
    SELECT n AS n_days, s AS s_stat,
           CAST(n * (n - 1) * (2 * n + 5) - tie_adj AS BIGINT) AS var_s_x18,
           round(CASE WHEN s > 0 THEN (s - 1.0)
                    / sqrt((n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0)
                 WHEN s < 0 THEN (s + 1.0)
                    / sqrt((n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0)
                 ELSE 0.0 END, 6) AS z
    FROM p CROSS JOIN t CROSS JOIN g
    """,
    doc="F100 Mann-Kendall nonparametric trend test on the daily "
    "total-cents series: S = sum over i<j of sign(v_j - v_i) is an "
    "EXACT INTEGER (no fp rank arithmetic), the variance keeps its "
    "x18 numerator exact with the standard tie-group correction "
    "sum t(t-1)(2t+5), and the continuity-corrected Z is the only fp "
    "step (identical expression text both engines). The O(days^2) "
    "self-join runs AFTER the reduce to calendar days — bounded by "
    "days^2 (= 435 pairs for a 30-day corpus, ~133k for a year), "
    "independent of event-row count, so the heavy work is the one "
    "hash agg. Single summary row.",
)
def events_mann_kendall_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    r = d.select(
        "v", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    a = r.select(F.col("i").alias("ia"), F.col("v").alias("va"))
    b = r.select(F.col("i").alias("ib"), F.col("v").alias("vb"))
    p = (
        a.join(F.broadcast(b), F.col("ib") > F.col("ia"))
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    t = (
        d.groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).alias("tie_adj")
        )
    )
    g = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        p.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(g))
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("s_stat"),
            F.expr(
                "CAST(n * (n - 1) * (2 * n + 5) - tie_adj AS BIGINT)"
            ).alias("var_s_x18"),
            F.expr(
                "round(CASE WHEN s > 0 THEN (s - 1.0)"
                " / sqrt((n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0)"
                " WHEN s < 0 THEN (s + 1.0)"
                " / sqrt((n * (n - 1) * (2 * n + 5) - tie_adj) / 18.0)"
                " ELSE 0.0 END, 6)"
            ).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# F101 Wald-Wolfowitz runs test for randomness
# ---------------------------------------------------------------------------
@register(
    "events_runs_test_daily",
    f"""
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    g AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
    med AS (
        SELECT v AS m
        FROM (SELECT v, row_number() OVER (ORDER BY v) AS rnk FROM d)
        CROSS JOIN g
        WHERE rnk = CAST(floor((n + 1) / 2.0) AS BIGINT)
    ),
    k AS (
        SELECT d.d, CASE WHEN d.v > m THEN 1 ELSE 0 END AS s
        FROM d CROSS JOIN med WHERE d.v <> m
    ),
    seq AS (SELECT s, lag(s) OVER (ORDER BY d) AS ps FROM k),
    agg AS (
        SELECT CAST(sum(s) AS BIGINT) AS n1,
               CAST(sum(1 - s) AS BIGINT) AS n2,
               CAST(1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps
                                 THEN 1 ELSE 0 END) AS BIGINT) AS runs
        FROM seq
    )
    SELECT n1 + n2 AS n_kept, n1 AS n_above, n2 AS n_below, runs,
           round((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1))),
                 6) AS z
    FROM agg
    """,
    doc="F101 Wald-Wolfowitz runs test for randomness of the daily "
    "total-cents series: days are classified above/below the EXACT "
    "lower median (row_number rank pick at floor((n+1)/2) — no fp "
    "percentile interpolation; ties with the median dropped, the "
    "textbook rule), the run count R is an ordered-lag integer, and "
    "the normal-approximation Z from exact integer n1/n2/R is the "
    "single fp expression (identical text both engines). Too few runs "
    "means positive serial dependence (trend/clustering), too many "
    "means oscillation. One hash agg to days, rank window, lag "
    "window, single summary row.",
)
def events_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    g = d.agg(F.count(F.lit(1)).alias("n"))
    med = (
        d.select("v", F.row_number().over(Window.orderBy("v")).alias("rnk"))
        .crossJoin(F.broadcast(g))
        .filter(F.expr("rnk = CAST(floor((n + 1) / 2.0) AS BIGINT)"))
        .select(F.col("v").alias("m"))
    )
    k = (
        d.crossJoin(F.broadcast(med))
        .filter(F.col("v") != F.col("m"))
        .select(
            "d", F.when(F.col("v") > F.col("m"), 1).otherwise(0).alias("s")
        )
    )
    seq = k.select("s", F.lag("s").over(Window.orderBy("d")).alias("ps"))
    agg = seq.agg(
        F.sum("s").alias("n1"),
        F.sum(F.lit(1) - F.col("s")).alias("n2"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("ps").isNotNull() & (F.col("s") != F.col("ps")), 1
                ).otherwise(0)
            )
        ).alias("runs"),
    )
    return agg.select(
        (F.col("n1") + F.col("n2")).alias("n_kept"),
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        "runs",
        F.expr(
            "round((runs - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))"
            " / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
            " / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1))), 6)"
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# F102 Ljung-Box portmanteau test (lags 1..7, exact power sums)
# ---------------------------------------------------------------------------
@register(
    "events_ljung_box_daily",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    r AS (SELECT x, row_number() OVER (ORDER BY d) AS i FROM d),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS q2
        FROM r
    ),
    ks AS (SELECT CAST(range AS BIGINT) AS k FROM range(1, 8)),
    p AS (
        SELECT k,
               CAST(sum(a.x * b.x) AS BIGINT) AS pk,
               CAST(sum(a.x) AS BIGINT) AS ak,
               CAST(sum(b.x) AS BIGINT) AS bk
        FROM ks JOIN r a ON true JOIN r b ON b.i = a.i + k
        GROUP BY k
    ),
    rho AS (
        SELECT k, n - k AS n_pairs, n,
               (pk - (CAST(s AS DOUBLE) / n) * (ak + bk)
                   + (n - k) * (CAST(s AS DOUBLE) / n)
                     * (CAST(s AS DOUBLE) / n))
               / (q2 - n * (CAST(s AS DOUBLE) / n)
                       * (CAST(s AS DOUBLE) / n)) AS rho
        FROM p CROSS JOIN g
    ),
    q AS (
        SELECT k, n_pairs, rho,
               n * (n + 2.0) * sum(rho * rho / (n - k))
                   OVER (ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS q
        FROM rho
    )
    SELECT CAST(k AS INT) AS k, n_pairs,
           round(rho, 6) AS rho, round(q, 6) AS q_stat
    FROM q
    """,
    doc="F102 Ljung-Box portmanteau test on the daily event-count "
    "series, lags 1..7: the autocovariance numerators are assembled "
    "from EXACT BIGINT power sums (sum x_t*x_(t+k), head/tail range "
    "sums, sum x, sum x^2) via the F47 lag-fanout join, so the only fp "
    "steps are the shared-expression-text mean substitution and the "
    "final rho/Q algebra; Q_k accumulates rho^2/(n-k) in deterministic "
    "frame order (the F95 bit-identical running-sum pattern) and "
    "Q ~ chi2(k) under the no-autocorrelation null — the residual "
    "whiteness check behind every F7 forecast. Validity bound: "
    "sum x^2 and sum x_t*x_(t+k) stay in BIGINT while daily counts "
    "are < ~3e9 (~n*max(x)^2 < 2^63); cast to DOUBLE beyond that "
    "(ENFORCED at runtime via operators/guards.bigint_bound). "
    "One hash agg to days, a 7-way bounded fanout join, one 7-row "
    "window — heavy work is the reduce.",
)
def events_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    r = d.select("x", F.row_number().over(Window.orderBy("d")).alias("i"))
    g = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q2"),
        F.max("x").alias("mx"),
    )
    ks = d.sparkSession.range(1, 8).select(F.col("id").alias("k"))
    a = r.select(F.col("i").alias("ia"), F.col("x").alias("xa"))
    b = r.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    p = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("ib") == F.col("ia") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("xa") * F.col("xb")).alias("pk"),
            F.sum("xa").alias("ak"),
            F.sum("xb").alias("bk"),
        )
    )
    from time_series_spark_spark.operators.guards import bigint_bound

    rho = p.crossJoin(F.broadcast(g)).select(
        "k",
        # enforce the documented bound: the exact power sums q2 and pk
        # are at most n * max(x)^2 — guard BEFORE they could have
        # wrapped, from the double estimate of that magnitude
        bigint_bound(
            F.col("n") - F.col("k"),
            F.col("n") * 1.0 * F.col("mx") * F.col("mx"),
            "n*max(x)^2 power sum",
        ).alias("n_pairs"),
        "n",
        F.expr(
            "(pk - (CAST(s AS DOUBLE) / n) * (ak + bk)"
            " + (n - k) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"
            " / (q2 - n * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"
        ).alias("rho"),
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    q = rho.select(
        "k",
        "n_pairs",
        "rho",
        (
            F.col("n")
            * (F.col("n") + F.lit(2.0))
            * F.sum(
                F.col("rho") * F.col("rho") / (F.col("n") - F.col("k"))
            ).over(w)
        ).alias("q"),
    )
    return q.select(
        F.col("k").cast("int").alias("k"),
        "n_pairs",
        F.round("rho", 6).alias("rho"),
        F.round("q", 6).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# F103 historical VaR / CVaR (exact-rank quantile, integer tail mean)
# ---------------------------------------------------------------------------
@register(
    "orders_var_cvar_daily",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    l AS (
        SELECT d, lag(v) OVER (ORDER BY d) - v AS loss
        FROM d QUALIFY loss IS NOT NULL
    ),
    r AS (
        SELECT loss,
               row_number() OVER (ORDER BY loss, d) AS rnk,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM l
    ),
    k AS (SELECT CAST(ceiling(max(m) * 0.95) AS BIGINT) AS k,
                 max(m) AS m FROM r)
    SELECT m AS n_losses,
           (SELECT loss FROM r CROSS JOIN k WHERE rnk = k) AS var95_cents,
           CAST((SELECT sum(loss) FROM r CROSS JOIN k WHERE rnk >= k)
                AS BIGINT) AS tail_sum_cents,
           m - k + 1 AS n_tail,
           round(CAST((SELECT sum(loss) FROM r CROSS JOIN k
                       WHERE rnk >= k) AS DOUBLE)
                 / (m - k + 1), 4) AS cvar95_cents,
           (SELECT max(loss) FROM l) AS worst_loss_cents
    FROM k
    """,
    doc="F103 historical VaR/CVaR on the daily order-revenue series: "
    "loss = day-over-day revenue DROP in exact integer cents; VaR95 is "
    "an EXACT-RANK pick (row_number over (loss, d) at k = ceil(0.95m) "
    "— no fp percentile interpolation, the F87 discretization rule), "
    "CVaR95 (expected shortfall) is the exact integer tail sum over "
    "the (m-k+1) worst losses with ONE rounded division. One hash agg "
    "to days, one lag window, one rank window; single summary row. "
    "At scale the series per risk key is calendar-bounded, so the "
    "windows run per-key after the reduce.",
)
def orders_var_cvar_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "orders").groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("v")
    )
    loss = d.select(
        "d", (F.lag("v").over(Window.orderBy("d")) - F.col("v")).alias("loss")
    ).filter(F.col("loss").isNotNull())
    r = loss.select(
        "loss",
        F.row_number().over(Window.orderBy("loss", "d")).alias("rnk"),
        F.count(F.lit(1))
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("m"),
    )
    k = r.agg(
        F.expr("CAST(ceiling(max(m) * 0.95) AS BIGINT)").alias("k"),
        F.max("m").alias("m_tot"),
    )
    tail = (
        r.drop("m")
        .crossJoin(F.broadcast(k))
        .filter(F.col("rnk") >= F.col("k"))
        .agg(
            F.min(F.when(F.col("rnk") == F.col("k"), F.col("loss"))).alias(
                "var95_cents"
            ),
            F.sum("loss").alias("tail_sum_cents"),
            F.max("m_tot").alias("m"),
            F.max("k").alias("k"),
        )
    )
    worst = loss.agg(F.max("loss").alias("worst_loss_cents"))
    return tail.crossJoin(F.broadcast(worst)).select(
        F.col("m").alias("n_losses"),
        "var95_cents",
        F.col("tail_sum_cents").cast("long").alias("tail_sum_cents"),
        (F.col("m") - F.col("k") + 1).alias("n_tail"),
        F.expr(
            "round(CAST(tail_sum_cents AS DOUBLE) / (m - k + 1), 4)"
        ).alias("cvar95_cents"),
        "worst_loss_cents",
    )


# ---------------------------------------------------------------------------
# F104 item-item co-purchase recommender (exact cosine^2 rank key)
# ---------------------------------------------------------------------------
@register(
    "part_item_item_recs",
    """
    WITH b AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    item AS (
        SELECT p, CAST(count(*) AS BIGINT) AS ci FROM b GROUP BY p
    ),
    pair AS (
        SELECT a.p AS i, c.p AS j, CAST(count(*) AS BIGINT) AS cij
        FROM b a JOIN b c ON a.o = c.o AND a.p <> c.p
        GROUP BY a.p, c.p
    ),
    scored AS (
        SELECT i, j, cij,
               CAST(cij * cij AS DOUBLE) / (ia.ci * ja.ci) AS cos2,
               ia.ci AS ci, ja.ci AS cj
        FROM pair
        JOIN item ia ON ia.p = i
        JOIN item ja ON ja.p = j
        WHERE ia.ci >= 5
    ),
    ranked AS (
        SELECT i, j, cij, ci, cj, cos2,
               row_number() OVER (PARTITION BY i
                                  ORDER BY cos2 DESC, cij DESC, j) AS rnk
        FROM scored
    )
    SELECT i AS part_id, rnk, j AS rec_part_id, cij AS n_coorders,
           ci AS n_orders_i, cj AS n_orders_j,
           round(sqrt(cos2), 6) AS cosine
    FROM ranked WHERE rnk <= 3
    """,
    doc="F104 item-item collaborative-filtering recommender over the "
    "order-basket bipartite graph: co-occurrence counts c_ij from "
    "WITHIN-order pair expansion (baskets are small — TPC-H <= ~17 "
    "lines/order — so pair mass is sum(basket^2), LINEAR in orders, "
    "never an all-pairs item join), cosine(i,j) = c_ij/sqrt(c_i*c_j) "
    "ranked by its SQUARE c_ij^2/(c_i*c_j) — an exact-integer "
    "division, bit-identical cross-engine, monotone in cosine — so "
    "the fp sqrt only ever formats the report, never decides the "
    "ranking (ties broken by (c_ij DESC, j)). Top-3 partners per "
    "item with support >= 5 orders. One distinct reduce, one "
    "basket-bounded self-join, broadcastable item-count joins, one "
    "per-item window.",
)
def part_item_item_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.packed import shuffle_parallelism

    # One basket subtree behind one hash(o) exchange (round 15, guide
    # §2.4): the naive form planned FOUR lineitem scans + four distinct
    # aggs (side a, side c, item counts twice) and broadcast the 600k-row
    # basket relation. The explicit null filter makes every branch's scan
    # canonically identical, so AQE's runtime exchange reuse collapses
    # them to ONE scan + one hash(o) exchange (3 ReusedExchange in the
    # final plan); dedupe rides the o-exchange (hash(o) satisfies the
    # (o,p) clustering), and the pair aggregation is keyed hash(i) so the
    # per-i window reuses it instead of re-shuffling the 2.4M pair rows.
    # No skew lever: the measured (i,j) histogram is flat (max cij=3,
    # per-i fanout max/avg < 2), so the win is structure, not salting.
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull()
        )
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
    )
    P = shuffle_parallelism(li)
    b = (
        li.repartition(P, "o")
        .groupBy("o", "p")
        .agg(F.lit(1))
        .select("o", "p")
    )
    item = b.groupBy("p").agg(F.count(F.lit(1)).alias("ci"))
    a = b.select(F.col("o"), F.col("p").alias("i"))
    c = b.select(F.col("o"), F.col("p").alias("j"))
    pair = (
        a.join(c, "o")
        .filter(F.col("i") != F.col("j"))
        .select("i", "j")
        .repartition(P, "i")
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("cij"))
    )
    ia = item.select(F.col("p").alias("i"), F.col("ci").alias("ci"))
    ja = item.select(F.col("p").alias("j"), F.col("ci").alias("cj"))
    scored = (
        pair.join(ia, "i")  # 20k-row item counts: AQE broadcasts locally,
        .join(ja, "j")      # and may not at 100 TB (parts scale with SF)
        .filter(F.col("ci") >= 5)
        .select(
            "i", "j", "cij", "ci", "cj",
            F.expr(
                "CAST(cij * cij AS DOUBLE) / (ci * cj)"
            ).alias("cos2"),
        )
    )
    w = Window.partitionBy("i").orderBy(
        F.col("cos2").desc(), F.col("cij").desc(), F.col("j")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("i").alias("part_id"),
            "rnk",
            F.col("j").alias("rec_part_id"),
            F.col("cij").alias("n_coorders"),
            F.col("ci").alias("n_orders_i"),
            F.col("cj").alias("n_orders_j"),
            F.round(F.sqrt("cos2"), 6).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# G7 weighted single-source shortest paths (unrolled Bellman-Ford)
# ---------------------------------------------------------------------------
@register(
    "supplier_cosupply_sssp",
    """
    WITH li AS (
        SELECT l_orderkey, l_suppkey,
               CAST(max(l_quantity) AS BIGINT) AS q
        FROM lineitem WHERE l_quantity > 45 GROUP BY 1, 2
    ),
    e0 AS (
        SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
               CAST(100 - max(least(a.q, b.q)) AS BIGINT) AS w
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2
    ),
    e AS (
        SELECT s1 AS u, s2 AS v, w FROM e0
        UNION ALL
        SELECT s2 AS u, s1 AS v, w FROM e0
    ),
    r0 AS (
        SELECT (SELECT min(s1) FROM e0) AS node, CAST(0 AS BIGINT) AS d
    ),
    r1 AS (
        SELECT node, min(d) AS d FROM (
            SELECT node, d FROM r0
            UNION ALL
            SELECT e.v, r0.d + e.w FROM r0 JOIN e ON e.u = r0.node
        ) GROUP BY node
    ),
    r2 AS (
        SELECT node, min(d) AS d FROM (
            SELECT node, d FROM r1
            UNION ALL
            SELECT e.v, r1.d + e.w FROM r1 JOIN e ON e.u = r1.node
        ) GROUP BY node
    ),
    r3 AS (
        SELECT node, min(d) AS d FROM (
            SELECT node, d FROM r2
            UNION ALL
            SELECT e.v, r2.d + e.w FROM r2 JOIN e ON e.u = r2.node
        ) GROUP BY node
    ),
    r4 AS (
        SELECT node, min(d) AS d FROM (
            SELECT node, d FROM r3
            UNION ALL
            SELECT e.v, r3.d + e.w FROM r3 JOIN e ON e.u = r3.node
        ) GROUP BY node
    )
    SELECT node, d AS dist FROM r4 ORDER BY node
    """,
    doc="G7 weighted single-source shortest paths on the supplier "
    "co-supply graph, Bellman-Ford UNROLLED to 4 relaxation rounds "
    "(shortest distance using <= 4 edges — well-defined, hence "
    "oracle-checkable, unlike a convergence loop): edge weight "
    "100 - max(least(qa,qb)) over shared orders keeps stronger "
    "co-supply ties shorter, all integer. Each round is one "
    "vertex-partitioned hash join + min reduce — no driver-side "
    "convergence scalar at all, the whole expansion is one "
    "declarative plan (operators/graph.py::sssp_bounded). The oracle "
    "unrolls the same four rounds as chained CTEs.",
)
def supplier_cosupply_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.graph import sssp_bounded

    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_quantity").cast("long").alias("q"))
    )
    a = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_suppkey").alias("s1"),
        F.col("q").alias("qa"),
    )
    b = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_suppkey").alias("s2"),
        F.col("q").alias("qb"),
    )
    edges = (
        a.join(b, on="k")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            (F.lit(100) - F.max(F.least("qa", "qb")))
            .cast("long")
            .alias("w")
        )
    )
    source = edges.agg(F.min("s1")).first()[0]
    # Self-loop seed: suppliers surviving the quantity filter — a cheap
    # scan+distinct SUPERSET of the edge endpoints (endpoints come from
    # the same filtered rows via the o-key self-join). Without it the
    # operator derives self-loops from distinct(sym) and the edge
    # pipeline (scan+join+agg) is embedded TWICE per unrolled round —
    # 8 copies in the plan at 4 rounds vs 4 (AQE deduped the execution;
    # planning/stage-bookkeeping still paid per copy).
    loop_nodes = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_suppkey")
    )
    return (
        sssp_bounded(edges, source, max_rounds=4, nodes=loop_nodes)
        .select("node", "dist")
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# F106 generalized ESD (Rosner) outlier iterations, unrolled
# ---------------------------------------------------------------------------
def _esd_round(i: int) -> str:
    """One unrolled ESD round as oracle CTE text: stats over d{i-1},
    integer-exact argmax pick, residual set d{i}. The rank key
    abs(v*n - s) is an EXACT INTEGER (|v - mean| scaled by n), so the
    removal order is bit-identical cross-engine even though the
    reported R statistic is fp."""
    p = i - 1
    return f"""
    g{i} AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
               sum(CAST(v AS DOUBLE) * v) AS q2
        FROM d{p}
    ),
    r{i} AS (
        SELECT d, v, n, s, q2,
               row_number() OVER (ORDER BY abs(v * n - s) DESC, d) AS rnk
        FROM d{p} CROSS JOIN g{i}
    ),
    o{i} AS (
        SELECT {i} AS round, d AS day_removed, v AS value_cents,
               round((CAST(abs(v * n - s) AS DOUBLE) / n)
                     / sqrt((q2 - CAST(s AS DOUBLE) * s / n) / (n - 1)),
                     4) AS r_stat,
               n AS n_remaining
        FROM r{i} WHERE rnk = 1
    ),
    d{i} AS (SELECT d, v FROM r{i} WHERE rnk > 1)"""


@register(
    "events_esd_outliers",
    """
    WITH d0 AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),"""
    + ",".join(_esd_round(i) for i in (1, 2, 3))
    + """
    SELECT round, day_removed, value_cents, r_stat, n_remaining
    FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2
          UNION ALL SELECT * FROM o3)
    ORDER BY round
    """,
    doc="F106 generalized ESD (Rosner 1983) outlier iterations on the "
    "daily total-cents series, UNROLLED to 3 rounds (the G7 "
    "fixed-rounds-for-oracle-checkability rule): each round computes "
    "the test statistic R_i = max|v - mean|/sd over the REMAINING "
    "days and removes the argmax — the removal ORDER is decided by "
    "the exact integer |v*n - s| (|v - mean| scaled by n), so "
    "cross-engine fp never picks different outliers; R itself is the "
    "single rounded fp expression per round (sample sd from power "
    "sums; q2 summed in DOUBLE — the BIGINT v² sum would overflow at "
    "~1.3e9 daily cents). The masking-robust multi-outlier test "
    "beside the single-shot MAD/z anomaly queries; compare R_i to "
    "the Rosner lambda table for a formal verdict. One hash agg then "
    "three reduce+rank rounds over the bounded day frame.",
)
def events_esd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    outs = []
    for i in (1, 2, 3):
        g = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.expr("CAST(v AS DOUBLE) * v")).alias("q2"),
        )
        r = d.crossJoin(F.broadcast(g)).select(
            "d", "v", "n", "s", "q2",
            F.row_number()
            .over(
                Window.orderBy(
                    F.abs(F.col("v") * F.col("n") - F.col("s")).desc(),
                    F.col("d"),
                )
            )
            .alias("rnk"),
        )
        outs.append(
            r.filter(F.col("rnk") == 1).select(
                F.lit(i).alias("round"),
                F.col("d").alias("day_removed"),
                F.col("v").alias("value_cents"),
                F.expr(
                    "round((CAST(abs(v * n - s) AS DOUBLE) / n)"
                    " / sqrt((q2 - CAST(s AS DOUBLE) * s / n) / (n - 1)),"
                    " 4)"
                ).alias("r_stat"),
                F.col("n").alias("n_remaining"),
            )
        )
        d = r.filter(F.col("rnk") > 1).select("d", "v")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("round")


# ---------------------------------------------------------------------------
# F107 Kaplan-Meier survival estimator (user lifetime, right-censored)
# ---------------------------------------------------------------------------
@register(
    "users_lifetime_kaplan_meier",
    """
    WITH bounds AS (
        SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS horizon
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_d,
               CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS last_d
        FROM events GROUP BY user_id
    ),
    lif AS (
        SELECT CAST(datediff('day', first_d, last_d) AS BIGINT) AS t,
               CASE WHEN datediff('day', last_d, horizon) > 0
                    THEN 1 ELSE 0 END AS died
        FROM u CROSS JOIN bounds
    ),
    per_t AS (
        SELECT t, CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM lif GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               CAST(sum(leaving) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_risk
        FROM per_t
    ),
    km AS (
        SELECT t, d, n_risk,
               sum(CASE WHEN d > 0
                        THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                        ELSE 0.0 END)
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS log_s
        FROM risk
    )
    SELECT t AS t_days, n_risk, d AS n_deaths,
           round(exp(log_s), 6) AS survival
    FROM km
    ORDER BY t_days
    """,
    doc="F107 Kaplan-Meier product-limit survival over user LIFETIMES "
    "(the ACCOUNT-churn granularity, vs the registered session-lifetime "
    "KM in queries_analytics.py) "
    "(days between a user's first and last event; a user still active "
    "on the corpus horizon DAY is right-CENSORED — at risk, not "
    "churned; on this synthetic 30-day corpus a 7-day rule would mark "
    "ZERO deaths, measured, so the curve would be vacuously 1.0): n_risk at each distinct lifetime is "
    "a reverse-ordered running sum of EXACT INTEGER counts, and the "
    "product-limit S(t) = prod(1 - d_i/n_i) is accumulated in LOG "
    "space by a forward frame-ordered window (the F95 bit-identical "
    "running-sum device; ln/exp with identical expression text both "
    "engines, one rounded exp at the end). The churn/retention "
    "estimator handling censoring correctly, vs the F21 cohort "
    "retention that ignores it. One user reduce, one t reduce, two "
    "ordered windows over the bounded lifetime frame.",
)
def users_lifetime_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_d"),
        F.date_trunc("day", F.max("ts")).alias("last_d"),
    )
    # horizon from the per-user aggregate, not a second events scan:
    # date_trunc is monotone, so max_user(trunc(max_user ts)) ==
    # trunc(max ts) exactly. greatest(first_d, last_d) == last_d (min
    # <= max) but keeps BOTH aggregates alive in this branch, so column
    # pruning cannot specialize it and the broadcast subtree stays
    # canonically equal to u's hash(user_id) exchange — AQE stage reuse
    # then scans and partially aggregates events ONCE for the whole
    # query (ReusedExchange in the final plan).
    bounds = u.agg(
        F.max(F.greatest("first_d", "last_d")).alias("horizon")
    )
    lif = u.crossJoin(F.broadcast(bounds)).select(
        F.expr("CAST(datediff(last_d, first_d) AS BIGINT)").alias("t"),
        F.expr(
            "CASE WHEN datediff(horizon, last_d) > 0 THEN 1 ELSE 0 END"
        ).alias("died"),
    )
    per_t = lif.groupBy("t").agg(
        F.sum("died").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_fwd = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.select(
        "t", "d",
        F.sum("leaving").over(w_rev).alias("n_risk"),
    )
    km = risk.select(
        "t", "d", "n_risk",
        F.sum(
            F.when(
                F.col("d") > 0,
                F.log(
                    F.expr("CAST(n_risk - d AS DOUBLE)") / F.col("n_risk")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_fwd)
        .alias("log_s"),
    )
    return km.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("n_deaths"),
        F.round(F.exp("log_s"), 6).alias("survival"),
    ).orderBy("t_days")


# ---------------------------------------------------------------------------
# F108 binary-segmentation changepoints (2 levels, exact prefix sums)
# ---------------------------------------------------------------------------
@register(
    "events_binseg_changepoints",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT d, v,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
               CAST(sum(v) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(count(*) OVER () AS BIGINT) AS n,
               CAST(sum(v) OVER () AS BIGINT) AS s
        FROM d
    ),
    g1 AS (
        SELECT d, i,
               (CAST(cum * (n - i) - (s - cum) * i AS DOUBLE)
                * (cum * (n - i) - (s - cum) * i)) / (i * (n - i)) AS gain,
               row_number() OVER (ORDER BY
                   (CAST(cum * (n - i) - (s - cum) * i AS DOUBLE)
                    * (cum * (n - i) - (s - cum) * i)) / (i * (n - i))
                   DESC, i) AS rnk
        FROM r WHERE i < n
    ),
    k1 AS (SELECT i AS k, d AS split_d, gain FROM g1 WHERE rnk = 1),
    sided AS (
        SELECT r.d, r.v, r.i,
               CASE WHEN r.i <= k1.k THEN 0 ELSE 1 END AS side
        FROM r CROSS JOIN k1
    ),
    r2 AS (
        SELECT d, v, i, side,
               CAST(row_number() OVER (PARTITION BY side ORDER BY i)
                    AS BIGINT) AS j,
               CAST(sum(v) OVER (PARTITION BY side ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(count(*) OVER (PARTITION BY side) AS BIGINT) AS n,
               CAST(sum(v) OVER (PARTITION BY side) AS BIGINT) AS s
        FROM sided
    ),
    g2 AS (
        SELECT side, d, j,
               (CAST(cum * (n - j) - (s - cum) * j AS DOUBLE)
                * (cum * (n - j) - (s - cum) * j)) / (j * (n - j)) AS gain,
               row_number() OVER (PARTITION BY side ORDER BY
                   (CAST(cum * (n - j) - (s - cum) * j AS DOUBLE)
                    * (cum * (n - j) - (s - cum) * j)) / (j * (n - j))
                   DESC, j) AS rnk
        FROM r2 WHERE j < n
    )
    SELECT CAST(1 AS INT) AS level, CAST(-1 AS INT) AS side,
           split_d AS split_day, round(gain, 4) AS gain
    FROM k1
    UNION ALL
    SELECT CAST(2 AS INT) AS level, CAST(side AS INT) AS side,
           d AS split_day, round(gain, 4) AS gain
    FROM g2 WHERE rnk = 1
    ORDER BY level, side
    """,
    doc="F108 binary-segmentation changepoints on the daily total-cents "
    "series, 2 levels unrolled (the G7/F106 "
    "fixed-rounds-for-oracle-checkability rule): at each level the "
    "split maximizes the between-segment sum-of-squares gain "
    "(S1*n2 - S2*n1)^2 / (n1*n2) whose NUMERATOR is built from exact "
    "integer prefix sums (frame-ordered windows) — the double "
    "conversion of an exact <2^53 integer and one IEEE multiply/"
    "divide are bit-identical cross-engine, so the argmax never "
    "diverges (i tie-break). Level 2 re-splits each side with the "
    "SAME windows partitioned by side — the shape that scales to "
    "per-key segmentation. The multi-changepoint complement to F14 "
    "CUSUM (single drift) and F95 Page-Hinkley (sequential). "
    "Validity: |S1*n2 - S2*n1| < 2^53 needs days*max_daily_cents "
    "< ~9e15 — calendar-bounded, generous.",
)
def events_binseg_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = d.select(
        "d", "v",
        F.row_number().over(Window.orderBy("d")).cast("long").alias("i"),
        F.sum("v")
        .over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("v").over(w_all).alias("s"),
    )
    gain_txt = (
        "(CAST(cum * (n - i) - (s - cum) * i AS DOUBLE)"
        " * (cum * (n - i) - (s - cum) * i)) / (i * (n - i))"
    )
    g1 = r.filter(F.col("i") < F.col("n")).select(
        "d", "i",
        F.expr(gain_txt).alias("gain"),
    )
    g1 = g1.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("gain").desc(), F.col("i"))),
    )
    k1 = g1.filter(F.col("rnk") == 1).select(
        F.col("i").alias("k"), F.col("d").alias("split_d"), F.col("gain")
    )
    sided = r.select("d", "v", "i").crossJoin(F.broadcast(k1.select("k"))).select(
        "d", "v",
        F.when(F.col("i") <= F.col("k"), 0).otherwise(1).alias("side"),
        "i",
    )
    w_side = Window.partitionBy("side")
    r2 = sided.select(
        "d", "v", "side",
        F.row_number().over(w_side.orderBy("i")).cast("long").alias("j"),
        F.sum("v")
        .over(
            w_side.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("cum"),
        F.count(F.lit(1))
        .over(w_side.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
        F.sum("v")
        .over(w_side.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("s"),
    )
    gain2_txt = (
        "(CAST(cum * (n - j) - (s - cum) * j AS DOUBLE)"
        " * (cum * (n - j) - (s - cum) * j)) / (j * (n - j))"
    )
    g2 = r2.filter(F.col("j") < F.col("n")).select(
        "side", "d", "j",
        F.expr(gain2_txt).alias("gain"),
    )
    g2 = g2.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("side").orderBy(
                F.col("gain").desc(), F.col("j")
            )
        ),
    )
    lvl1 = k1.select(
        F.lit(1).cast("int").alias("level"),
        F.lit(-1).cast("int").alias("side"),
        F.col("split_d").alias("split_day"),
        F.round("gain", 4).alias("gain"),
    )
    lvl2 = g2.filter(F.col("rnk") == 1).select(
        F.lit(2).cast("int").alias("level"),
        F.col("side").cast("int").alias("side"),
        F.col("d").alias("split_day"),
        F.round("gain", 4).alias("gain"),
    )
    return lvl1.unionAll(lvl2).orderBy("level", "side")



# ---------------------------------------------------------------------------
# F109 log-rank test (two-group survival comparison)
# ---------------------------------------------------------------------------
@register(
    "users_logrank_heavy_light",
    """
    WITH bounds AS (
        SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS horizon
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_d,
               CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS last_d,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    g AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
    med AS (
        SELECT cnt AS m
        FROM (SELECT cnt,
                     row_number() OVER (ORDER BY cnt, user_id) AS rnk
              FROM u)
        CROSS JOIN g
        WHERE rnk = CAST(floor((nu + 1) / 2.0) AS BIGINT)
    ),
    lif AS (
        SELECT CAST(datediff('day', first_d, last_d) AS BIGINT) AS t,
               CASE WHEN datediff('day', last_d, horizon) > 0
                    THEN 1 ELSE 0 END AS died,
               CASE WHEN cnt >= m THEN 1 ELSE 0 END AS grp
        FROM u CROSS JOIN bounds CROSS JOIN med
    ),
    per_t AS (
        SELECT t,
               CAST(sum(died * grp) AS BIGINT) AS d1,
               CAST(sum(died) AS BIGINT) AS d,
               CAST(sum(grp) AS BIGINT) AS l1,
               CAST(count(*) AS BIGINT) AS l
        FROM lif GROUP BY t
    ),
    risk AS (
        SELECT t, d1, d,
               CAST(sum(l) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n,
               CAST(sum(l1) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n1
        FROM per_t
    ),
    terms AS (
        SELECT sum(CASE WHEN d > 0 THEN d1 ELSE 0 END) OVER w AS o1,
               sum(CASE WHEN d > 0 THEN d ELSE 0 END) OVER w AS dtot,
               sum(CASE WHEN d > 0
                        THEN CAST(d AS DOUBLE) * n1 / n ELSE 0.0 END)
                   OVER w AS e1,
               sum(CASE WHEN d > 0 AND n > 1
                        THEN (CAST(d AS DOUBLE) * n1 / n)
                             * (1 - CAST(n1 AS DOUBLE) / n)
                             * (n - d) / (n - 1)
                        ELSE 0.0 END)
                   OVER w AS v,
               row_number() OVER (ORDER BY t DESC) AS rn
        FROM risk
        WINDOW w AS (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(dtot AS BIGINT) AS n_deaths,
           CAST(o1 AS BIGINT) AS o1,
           round(e1, 6) AS e1,
           round(v, 6) AS var_o1,
           round(CASE WHEN v > 0 THEN (o1 - e1) / sqrt(v)
                 ELSE 0.0 END, 6) AS z,
           round(CASE WHEN v > 0 THEN (o1 - e1) * (o1 - e1) / v
                 ELSE 0.0 END, 6) AS chi2
    FROM terms WHERE rn = 1
    """,
    doc="F109 log-rank (Mantel-Cox) test comparing the F107 survival "
    "curves of HEAVY vs light users (total event count >= the "
    "EXACT-RANK median — the F101 rank-pick rule, no fp percentile; "
    "the corpus has no behavioral split that isn't universal, so the "
    "null is approximately TRUE and an honest chi2 is small): at each "
    "distinct lifetime with deaths, observed heavy-group deaths vs "
    "the hypergeometric expectation d*n1/n and variance "
    "d*(n1/n)(1-n1/n)(n-d)/(n-1); O/E/V accumulate in deterministic "
    "FRAME ORDER (the F95 bit-identical device — a plain fp SUM would "
    "be aggregation-order-sensitive cross-engine), the last frame row "
    "carries the totals, and v=0 degrades to z=0 instead of dividing "
    "by zero. At-risk counts are reverse-ordered integer running sums "
    "exactly as in F107. Single summary row.",
)
def users_logrank_heavy_light(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bounds = ev.agg(F.date_trunc("day", F.max("ts")).alias("horizon"))
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_d"),
        F.date_trunc("day", F.max("ts")).alias("last_d"),
        F.count(F.lit(1)).alias("cnt"),
    )
    g = u.agg(F.count(F.lit(1)).alias("nu"))
    from time_series_spark_spark.operators.rank import global_rank

    # user-dimension median split via the range-partitioned two-pass
    med = (
        global_rank(
            u.select("cnt", "user_id"),
            [("cnt", True), ("user_id", True)],
            "rnk",
        )
        .crossJoin(F.broadcast(g))
        .filter(F.expr("rnk = CAST(floor((nu + 1) / 2.0) AS BIGINT)"))
        .select(F.col("cnt").alias("m"))
    )
    lif = (
        u.crossJoin(F.broadcast(bounds))
        .crossJoin(F.broadcast(med))
        .select(
            F.expr("CAST(datediff(last_d, first_d) AS BIGINT)").alias("t"),
            F.expr(
                "CASE WHEN datediff(horizon, last_d) > 0 THEN 1 ELSE 0 END"
            ).alias("died"),
            F.expr("CASE WHEN cnt >= m THEN 1 ELSE 0 END").alias("grp"),
        )
    )
    per_t = lif.groupBy("t").agg(
        F.sum(F.col("died") * F.col("grp")).alias("d1"),
        F.sum("died").alias("d"),
        F.sum("grp").alias("l1"),
        F.count(F.lit(1)).alias("l"),
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = per_t.select(
        "t", "d1", "d",
        F.sum("l").over(w_rev).alias("n"),
        F.sum("l1").over(w_rev).alias("n1"),
    )
    w_fwd = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    terms = risk.select(
        F.sum(F.when(F.col("d") > 0, F.col("d1")).otherwise(0))
        .over(w_fwd)
        .alias("o1"),
        F.sum(F.when(F.col("d") > 0, F.col("d")).otherwise(0))
        .over(w_fwd)
        .alias("dtot"),
        F.sum(
            F.when(F.col("d") > 0, F.expr("CAST(d AS DOUBLE) * n1 / n"))
            .otherwise(F.lit(0.0))
        )
        .over(w_fwd)
        .alias("e1"),
        F.sum(
            F.when(
                (F.col("d") > 0) & (F.col("n") > 1),
                F.expr(
                    "(CAST(d AS DOUBLE) * n1 / n)"
                    " * (1 - CAST(n1 AS DOUBLE) / n)"
                    " * (n - d) / (n - 1)"
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_fwd)
        .alias("v"),
        F.row_number().over(Window.orderBy(F.col("t").desc())).alias("rn"),
    )
    return terms.filter(F.col("rn") == 1).select(
        F.col("dtot").cast("long").alias("n_deaths"),
        F.col("o1").cast("long").alias("o1"),
        F.round("e1", 6).alias("e1"),
        F.round("v", 6).alias("var_o1"),
        F.expr(
            "round(CASE WHEN v > 0 THEN (o1 - e1) / sqrt(v)"
            " ELSE 0.0 END, 6)"
        ).alias("z"),
        F.expr(
            "round(CASE WHEN v > 0 THEN (o1 - e1) * (o1 - e1) / v"
            " ELSE 0.0 END, 6)"
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# F110 Kendall tau-b rank correlation (exact integer C/D/tie counts)
# ---------------------------------------------------------------------------
@register(
    "events_kendall_tau_daily",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    p AS (
        SELECT
            CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) > 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(sum(CASE WHEN (b.x - a.x) * (b.y - a.y) < 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS disc,
            CAST(sum(CASE WHEN b.x = a.x AND b.y <> a.y
                          THEN 1 ELSE 0 END) AS BIGINT) AS tx,
            CAST(sum(CASE WHEN b.y = a.y AND b.x <> a.x
                          THEN 1 ELSE 0 END) AS BIGINT) AS ty,
            CAST(count(*) AS BIGINT) AS n0
        FROM d a JOIN d b ON b.d > a.d
    )
    SELECT n0 AS n_pairs, c AS concordant, disc AS discordant,
           tx AS ties_x_only, ty AS ties_y_only,
           round((c - disc)
                 / sqrt(CAST(n0 - tx AS DOUBLE) * (n0 - ty)), 6) AS tau_b
    FROM p
    """,
    doc="F110 Kendall tau-b between daily VIEW and CLICK counts: "
    "concordant/discordant/tie pair counts are EXACT INTEGERS from "
    "one O(days^2) self-join AFTER the calendar reduce (the F100 "
    "bound — pair mass is days^2, never row count), and the tie-"
    "corrected tau-b = (C-D)/sqrt((n0-tx)(n0-ty)) is the single fp "
    "expression. The robust, outlier-insensitive complement to the "
    "F75 Pearson matrix. Single summary row.",
)
def events_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("y"),
    )
    a = d.select(
        F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = d.select(
        F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    dx = F.col("xb") - F.col("xa")
    dy = F.col("yb") - F.col("ya")
    p = a.join(F.broadcast(b), F.col("db") > F.col("da")).agg(
        F.sum(F.when(dx * dy > 0, 1).otherwise(0)).alias("c"),
        F.sum(F.when(dx * dy < 0, 1).otherwise(0)).alias("disc"),
        F.sum(
            F.when((F.col("xb") == F.col("xa")) & (F.col("yb") != F.col("ya")), 1)
            .otherwise(0)
        ).alias("tx"),
        F.sum(
            F.when((F.col("yb") == F.col("ya")) & (F.col("xb") != F.col("xa")), 1)
            .otherwise(0)
        ).alias("ty"),
        F.count(F.lit(1)).alias("n0"),
    )
    return p.select(
        F.col("n0").alias("n_pairs"),
        F.col("c").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.col("tx").alias("ties_x_only"),
        F.col("ty").alias("ties_y_only"),
        F.expr(
            "round((c - disc)"
            " / sqrt(CAST(n0 - tx AS DOUBLE) * (n0 - ty)), 6)"
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# F111 Spearman rank correlation (exact doubled tie-averaged ranks)
# ---------------------------------------------------------------------------
@register(
    "events_spearman_daily",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT d,
               CAST(2 * rank() OVER (ORDER BY x)
                    + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx,
               CAST(2 * rank() OVER (ORDER BY y)
                    + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry
        FROM d
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rx) AS BIGINT) AS sx,
               CAST(sum(ry) AS BIGINT) AS sy,
               CAST(sum(rx * rx) AS BIGINT) AS sxx,
               CAST(sum(ry * ry) AS BIGINT) AS syy,
               CAST(sum(rx * ry) AS BIGINT) AS sxy
        FROM r
    )
    SELECT n AS n_days,
           round((n * sxy - sx * sy)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * (n * syy - sy * sy)), 6) AS spearman_rho
    FROM s
    """,
    doc="F111 Spearman rank correlation between daily VIEW and CLICK "
    "counts with EXACT tie handling: the doubled tie-averaged rank "
    "2r = 2*min_rank + tie_count - 1 is an INTEGER (no fp rank "
    "arithmetic — the F91 doubled-rank device), so all five power "
    "sums are exact BIGINTs and Pearson-on-ranks is one closed-form "
    "fp expression with identical text both engines. Validity: rank "
    "power sums ~ n^3 stay in BIGINT while days < ~2e6 — centuries "
    "of daily data. Single summary row.",
)
def events_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("x"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("y"),
    )
    r = d.select(
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("x"))
            - 1
        )
        .cast("long")
        .alias("rx"),
        (
            2 * F.rank().over(Window.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        )
        .cast("long")
        .alias("ry"),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.expr(
            "round((n * sxy - sx * sy)"
            " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
            " * (n * syy - sy * sy)), 6)"
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# F112 trimmed & winsorized mean (exact-rank cuts)
# ---------------------------------------------------------------------------
@register(
    "orders_trimmed_winsorized_price",
    """
    WITH x AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
               o_orderkey
        FROM orders
    ),
    r AS (
        SELECT v,
               row_number() OVER (ORDER BY v, o_orderkey) AS rnk,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM x
    ),
    k AS (
        SELECT CAST(floor(max(n) * 0.05) AS BIGINT) AS cut,
               max(n) AS n_tot
        FROM r
    ),
    caps AS (
        SELECT
            (SELECT v FROM r CROSS JOIN k WHERE rnk = cut + 1) AS lo_cap,
            (SELECT v FROM r CROSS JOIN k WHERE rnk = n_tot - cut) AS hi_cap
    ),
    agg AS (
        SELECT
            CAST(sum(CASE WHEN rnk > cut AND rnk <= n_tot - cut
                          THEN v ELSE 0 END) AS BIGINT) AS trim_sum,
            CAST(sum(CASE WHEN rnk > cut AND rnk <= n_tot - cut
                          THEN 1 ELSE 0 END) AS BIGINT) AS trim_n,
            CAST(sum(CASE WHEN v < lo_cap THEN lo_cap
                          WHEN v > hi_cap THEN hi_cap
                          ELSE v END) AS BIGINT) AS wins_sum,
            max(n_tot) AS n, max(cut) AS cut
        FROM r CROSS JOIN k CROSS JOIN caps
    )
    SELECT n AS n_orders, cut AS n_cut_each_side,
           round(CAST(trim_sum AS DOUBLE) / trim_n, 4) AS trimmed_mean_cents,
           round(CAST(wins_sum AS DOUBLE) / n, 4) AS winsorized_mean_cents
    FROM agg
    """,
    doc="F112 5% trimmed and winsorized means of order price: the cut "
    "points are EXACT-RANK picks over a (value, key) total order (the "
    "F87/F101 rule — no fp percentile interpolation, bit-identical "
    "cross-engine), the trimmed mean drops the bottom/top floor(0.05n) "
    "rows by rank, the winsorized mean clamps values to the cap "
    "VALUES; both numerators are exact integer sums with one rounded "
    "division each — the robust-location pair beside the F106 "
    "outlier detector. The rank is the operators/rank.py range-"
    "partitioned two-pass (no single-task window), then one reduce. "
    "Single summary row.",
)
def orders_trimmed_winsorized_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.rank import global_rank

    x = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        "o_orderkey",
    )
    r = global_rank(
        x, [("v", True), ("o_orderkey", True)], "rnk", total_col="n"
    ).select("v", "rnk", "n")
    k = r.agg(
        F.expr("CAST(floor(max(n) * 0.05) AS BIGINT)").alias("cut"),
        F.max("n").alias("n_tot"),
    )
    rk = r.crossJoin(F.broadcast(k))
    lo = rk.filter(F.expr("rnk = cut + 1")).select(
        F.col("v").alias("lo_cap")
    )
    hi = rk.filter(F.expr("rnk = n_tot - cut")).select(
        F.col("v").alias("hi_cap")
    )
    agg = (
        rk.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN rnk > cut AND rnk <= n_tot - cut"
                    " THEN v ELSE 0 END"
                )
            ).alias("trim_sum"),
            F.sum(
                F.expr(
                    "CASE WHEN rnk > cut AND rnk <= n_tot - cut"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("trim_n"),
            F.sum(
                F.expr(
                    "CASE WHEN v < lo_cap THEN lo_cap"
                    " WHEN v > hi_cap THEN hi_cap ELSE v END"
                )
            ).alias("wins_sum"),
            F.max("n").alias("n"),
            F.max("cut").alias("cut"),
        )
    )
    return agg.select(
        F.col("n").alias("n_orders"),
        F.col("cut").alias("n_cut_each_side"),
        F.expr(
            "round(CAST(trim_sum AS DOUBLE) / trim_n, 4)"
        ).alias("trimmed_mean_cents"),
        F.expr(
            "round(CAST(wins_sum AS DOUBLE) / n, 4)"
        ).alias("winsorized_mean_cents"),
    )


# ---------------------------------------------------------------------------
# F113 seasonal-hybrid ESD (per-DOW exact-rank median detrend + ESD rounds)
# ---------------------------------------------------------------------------
@register(
    "events_shesd_outliers",
    """
    WITH d0 AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST((dayofweek(CAST(date_trunc('day', ts) AS TIMESTAMP))
                     + 5) % 7 AS BIGINT) AS dow,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT d, dow, v,
               row_number() OVER (PARTITION BY dow ORDER BY v, d) AS rnk,
               CAST(count(*) OVER (PARTITION BY dow) AS BIGINT) AS nd
        FROM d0
    ),
    med AS (
        SELECT dow, v AS m FROM ranked
        WHERE rnk = CAST(floor((nd + 1) / 2.0) AS BIGINT)
    ),
    resid0 AS (
        SELECT r.d, CAST(r.v - m.m AS BIGINT) AS v
        FROM d0 r JOIN med m ON m.dow = r.dow
    ),"""
    + ",".join(
        f"""
    g{i} AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s,
               sum(CAST(v AS DOUBLE) * v) AS q2
        FROM resid{i - 1}
    ),
    r{i} AS (
        SELECT d, v, n, s, q2,
               row_number() OVER (ORDER BY abs(v * n - s) DESC, d) AS rnk
        FROM resid{i - 1} CROSS JOIN g{i}
    ),
    o{i} AS (
        SELECT {i} AS round, d AS day_removed, v AS resid_cents,
               round((CAST(abs(v * n - s) AS DOUBLE) / n)
                     / sqrt((q2 - CAST(s AS DOUBLE) * s / n) / (n - 1)),
                     4) AS r_stat,
               n AS n_remaining
        FROM r{i} WHERE rnk = 1
    ),
    resid{i} AS (SELECT d, v FROM r{i} WHERE rnk > 1)"""
        for i in (1, 2)
    )
    + """
    SELECT round, day_removed, resid_cents, r_stat, n_remaining
    FROM (SELECT * FROM o1 UNION ALL SELECT * FROM o2)
    ORDER BY round
    """,
    doc="F113 seasonal-hybrid ESD (the Twitter AnomalyDetection S-H-ESD "
    "shape): daily totals are first detrended by their PER-WEEKDAY "
    "EXACT-RANK median (the F101 rank pick, partitioned by dow — "
    "robust seasonal component, no fp percentile), then the F106 ESD "
    "iteration runs 2 unrolled rounds on the residuals with the same "
    "integer-exact |v*n - s| removal order. Catches anomalies that "
    "plain ESD misses because weekday seasonality inflates the sd — "
    "and vice versa ignores weekend dips that are structural. Same "
    "scale shape as F106: one hash agg, per-dow rank windows over the "
    "bounded day frame, two reduce+rank rounds.",
)
def events_shesd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d0 = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.expr(
            "CAST((dayofweek(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " + 5) % 7 AS BIGINT)"
        ).alias("dow"),
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    wd = Window.partitionBy("dow")
    ranked = d0.select(
        "d", "dow", "v",
        F.row_number().over(wd.orderBy("v", "d")).alias("rnk"),
        F.count(F.lit(1))
        .over(wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("nd"),
    )
    med = ranked.filter(
        F.expr("rnk = CAST(floor((nd + 1) / 2.0) AS BIGINT)")
    ).select("dow", F.col("v").alias("m"))
    resid = (
        d0.join(F.broadcast(med), "dow")
        .select("d", (F.col("v") - F.col("m")).cast("long").alias("v"))
    )
    outs = []
    for i in (1, 2):
        g = resid.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.expr("CAST(v AS DOUBLE) * v")).alias("q2"),
        )
        r = resid.crossJoin(F.broadcast(g)).select(
            "d", "v", "n", "s", "q2",
            F.row_number()
            .over(
                Window.orderBy(
                    F.abs(F.col("v") * F.col("n") - F.col("s")).desc(),
                    F.col("d"),
                )
            )
            .alias("rnk"),
        )
        outs.append(
            r.filter(F.col("rnk") == 1).select(
                F.lit(i).alias("round"),
                F.col("d").alias("day_removed"),
                F.col("v").alias("resid_cents"),
                F.expr(
                    "round((CAST(abs(v * n - s) AS DOUBLE) / n)"
                    " / sqrt((q2 - CAST(s AS DOUBLE) * s / n) / (n - 1)),"
                    " 4)"
                ).alias("r_stat"),
                F.col("n").alias("n_remaining"),
            )
        )
        resid = r.filter(F.col("rnk") > 1).select("d", "v")
    return outs[0].unionAll(outs[1]).orderBy("round")


# ---------------------------------------------------------------------------
# F114 Gorilla-style compressibility report (exact integer bit accounting)
# ---------------------------------------------------------------------------
@register(
    "events_compression_report",
    """
    WITH e AS (
        SELECT event_type,
               epoch_us(ts) AS t_us,
               CAST(round(value * 100) AS BIGINT) AS v,
               event_id
        FROM events
    ),
    d1 AS (
        SELECT event_type, t_us, event_id,
               t_us - lag(t_us) OVER w AS delta,
               xor(v, lag(v) OVER w) AS vx
        FROM e
        WINDOW w AS (PARTITION BY event_type ORDER BY t_us, event_id)
    ),
    lagged AS (
        SELECT event_type, delta,
               lag(delta) OVER (PARTITION BY event_type
                                ORDER BY t_us, event_id) AS prev_delta,
               vx
        FROM d1
    ),
    bits AS (
        SELECT event_type,
               CASE WHEN delta - prev_delta = 0 THEN 1
                    ELSE 2 + length(bin(abs(delta - prev_delta))) END
                   AS ts_bits,
               CASE WHEN vx = 0 THEN 1
                    ELSE 2 + length(bin(vx)) END AS val_bits
        FROM lagged
        WHERE delta IS NOT NULL AND prev_delta IS NOT NULL AND vx IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(ts_bits) AS BIGINT) AS ts_bits_total,
           CAST(sum(val_bits) AS BIGINT) AS val_bits_total,
           round(CAST(sum(ts_bits) AS DOUBLE) / count(*), 4) AS ts_bits_avg,
           round(CAST(sum(val_bits) AS DOUBLE) / count(*), 4) AS val_bits_avg,
           round(CAST(128 AS DOUBLE) * count(*)
                 / (sum(ts_bits) + sum(val_bits)), 4) AS compression_x
    FROM bits
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="F114 Gorilla-style compressibility report per event_type "
    "(Pelkonen et al., VLDB 2015 — the Facebook/Prometheus TSDB "
    "encoding): timestamp cost via DELTA-OF-DELTA (1 bit when the "
    "cadence repeats, else a 2-bit tag + the dod's binary magnitude) "
    "and value cost via XOR of consecutive integer cents (1 bit when "
    "unchanged, else tag + significant XOR bits). Bit lengths are "
    "EXACT INTEGERS computed as length(bin(x)) — string-length of the "
    "binary rendering, portable to the digit both engines — never "
    "floor(log2(x)) whose libm rounding can disagree AT POWERS OF "
    "TWO. A simplified cost model (no leading-zero window reuse), "
    "useful as the storage-planning analytic: which series compress, "
    "what the storage budget buys. One hash((type)) exchange for the "
    "lag windows, then a hash agg; compression_x is raw 128-bit "
    "(ts,value) pairs over modeled bits.",
)
def events_compression_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = Window.partitionBy("event_type").orderBy("t_us", "event_id")
    e = _events(spark, sf_dir).select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.expr(_CENTS).alias("v"),
        "event_id",
    )
    d1 = e.select(
        "event_type", "t_us", "event_id",
        (F.col("t_us") - F.lag("t_us").over(key)).alias("delta"),
        F.col("v").bitwiseXOR(F.lag("v").over(key)).alias("vx"),
    )
    lagged = d1.select(
        "event_type", "delta",
        F.lag("delta").over(key).alias("prev_delta"),
        "vx",
    )
    bits = lagged.filter(
        F.col("delta").isNotNull()
        & F.col("prev_delta").isNotNull()
        & F.col("vx").isNotNull()
    ).select(
        "event_type",
        F.expr(
            "CASE WHEN delta - prev_delta = 0 THEN 1"
            " ELSE 2 + length(bin(abs(delta - prev_delta))) END"
        ).alias("ts_bits"),
        F.expr(
            "CASE WHEN vx = 0 THEN 1 ELSE 2 + length(bin(vx)) END"
        ).alias("val_bits"),
    )
    return (
        bits.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("ts_bits").cast("long").alias("ts_bits_total"),
            F.sum("val_bits").cast("long").alias("val_bits_total"),
            F.expr(
                "round(CAST(sum(ts_bits) AS DOUBLE) / count(*), 4)"
            ).alias("ts_bits_avg"),
            F.expr(
                "round(CAST(sum(val_bits) AS DOUBLE) / count(*), 4)"
            ).alias("val_bits_avg"),
            F.expr(
                "round(CAST(128 AS DOUBLE) * count(*)"
                " / (sum(ts_bits) + sum(val_bits)), 4)"
            ).alias("compression_x"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# F115 quantile normalization across groups (exact-rank alignment)
# ---------------------------------------------------------------------------
@register(
    "events_quantile_normalize_types",
    """
    WITH d AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, d, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY v, d) AS rnk
        FROM d
    ),
    ref AS (
        SELECT rnk,
               CAST(sum(v) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS c
        FROM r GROUP BY rnk
    )
    SELECT r.event_type, r.d, r.v AS raw_cents,
           round(CAST(ref.s AS DOUBLE) / ref.c, 4) AS normalized_cents
    FROM r JOIN ref ON ref.rnk = r.rnk
    ORDER BY r.event_type, r.d
    """,
    doc="F115 quantile normalization of the per-type daily series (the "
    "batch-effect corrector of genomics/feature pipelines, Bolstad "
    "2003): each group's r-th order statistic maps to the MEAN of the "
    "r-th order statistics ACROSS groups, so every group ends up with "
    "an identical marginal distribution. Ranks are EXACT (row_number "
    "over (v, d) — the F87 total-order rule), the reference "
    "distribution is an exact integer sum over <=|groups| values per "
    "rank with ONE rounded division. Two hash exchanges (per-type "
    "rank, per-rank reduce) + one bounded join — all frames are "
    "days x types.",
)
def events_quantile_normalize_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    r = d.select(
        "event_type", "d", "v",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("v", "d"))
        .alias("rnk"),
    )
    ref = r.groupBy("rnk").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    return (
        r.join(F.broadcast(ref), "rnk")
        .select(
            "event_type",
            "d",
            F.col("v").alias("raw_cents"),
            F.expr("round(CAST(s AS DOUBLE) / c, 4)").alias(
                "normalized_cents"
            ),
        )
        .orderBy("event_type", "d")
    )


# ---------------------------------------------------------------------------
# F116 seasonal Mann-Kendall (Hirsch-Slack, per-weekday blocks)
# ---------------------------------------------------------------------------
@register(
    "events_seasonal_mann_kendall",
    f"""
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST((dayofweek(CAST(date_trunc('day', ts) AS TIMESTAMP))
                     + 5) % 7 AS BIGINT) AS dow,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    r AS (
        SELECT dow, v,
               row_number() OVER (PARTITION BY dow ORDER BY d) AS i
        FROM d
    ),
    s_g AS (
        SELECT a.dow,
               CAST(sum(CASE WHEN b.v > a.v THEN 1
                             WHEN b.v < a.v THEN -1 ELSE 0 END)
                    AS BIGINT) AS s
        FROM r a JOIN r b ON b.dow = a.dow AND b.i > a.i
        GROUP BY a.dow
    ),
    t_g AS (
        SELECT dow,
               CAST(sum(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tie_adj
        FROM (SELECT dow, CAST(count(*) AS BIGINT) AS c
              FROM d GROUP BY dow, v)
        GROUP BY dow
    ),
    n_g AS (SELECT dow, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY dow),
    tot AS (
        SELECT CAST(sum(s) AS BIGINT) AS s,
               CAST(sum(n_g.n * (n_g.n - 1) * (2 * n_g.n + 5)
                        - t_g.tie_adj) AS BIGINT) AS var18,
               CAST(count(*) AS BIGINT) AS n_seasons
        FROM s_g JOIN t_g ON t_g.dow = s_g.dow
                 JOIN n_g ON n_g.dow = s_g.dow
    )
    SELECT n_seasons, s AS s_stat, var18 AS var_s_x18,
           round(CASE WHEN s > 0 THEN (s - 1.0) / sqrt(var18 / 18.0)
                 WHEN s < 0 THEN (s + 1.0) / sqrt(var18 / 18.0)
                 ELSE 0.0 END, 6) AS z
    FROM tot
    """,
    doc="F116 seasonal Mann-Kendall (Hirsch & Slack 1984): the F100 "
    "test computed WITHIN each weekday block and summed — S = sum S_g "
    "and Var = sum Var_g stay EXACT INTEGERS (x18 numerator, per-block "
    "tie correction), so a weekly cycle can never masquerade as trend "
    "(the raw test compares Mondays to Sundays; this one never "
    "does). Pair mass is sum over blocks of (days/7)^2 — even more "
    "bounded than F100. Single summary row; identical continuity-"
    "corrected Z expression both engines.",
)
def events_seasonal_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"),
        F.expr(
            "CAST((dayofweek(CAST(date_trunc('day', ts) AS TIMESTAMP))"
            " + 5) % 7 AS BIGINT)"
        ).alias("dow"),
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    r = d.select(
        "dow", "v",
        F.row_number()
        .over(Window.partitionBy("dow").orderBy("d"))
        .alias("i"),
    )
    a = r.select(
        F.col("dow"), F.col("i").alias("ia"), F.col("v").alias("va")
    )
    b = r.select(
        F.col("dow").alias("dowb"),
        F.col("i").alias("ib"),
        F.col("v").alias("vb"),
    )
    s_g = (
        a.join(
            F.broadcast(b),
            (F.col("dowb") == F.col("dow")) & (F.col("ib") > F.col("ia")),
        )
        .groupBy("dow")
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    t_g = (
        d.groupBy("dow", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("dow")
        .agg(
            F.sum(
                F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
            ).alias("tie_adj")
        )
    )
    n_g = d.groupBy("dow").agg(F.count(F.lit(1)).alias("n"))
    tot = (
        s_g.join(t_g, "dow")
        .join(n_g, "dow")
        .agg(
            F.sum("s").alias("s"),
            F.sum(
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_adj")
            ).alias("var18"),
            F.count(F.lit(1)).alias("n_seasons"),
        )
    )
    return tot.select(
        "n_seasons",
        F.col("s").alias("s_stat"),
        F.col("var18").alias("var_s_x18"),
        F.expr(
            "round(CASE WHEN s > 0 THEN (s - 1.0) / sqrt(var18 / 18.0)"
            " WHEN s < 0 THEN (s + 1.0) / sqrt(var18 / 18.0)"
            " ELSE 0.0 END, 6)"
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# F117 Cramér-von Mises two-sample test (exact doubled-midrank U)
# ---------------------------------------------------------------------------
@register(
    "orders_cvm_drift",
    """
    WITH x AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
               o_orderkey,
               CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                    THEN 1 ELSE 0 END AS in_a
        FROM orders
    ),
    r AS (
        SELECT in_a,
               CAST(2 * rank() OVER (ORDER BY v)
                    + count(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS dr,
               CAST(2 * row_number() OVER (PARTITION BY in_a
                                           ORDER BY v, o_orderkey)
                    AS BIGINT) AS di
        FROM x
    ),
    agg AS (
        SELECT
            CAST(sum(CASE WHEN in_a = 1
                          THEN (dr - di) * (dr - di) END) AS BIGINT) AS ua4,
            CAST(sum(CASE WHEN in_a = 0
                          THEN (dr - di) * (dr - di) END) AS BIGINT) AS ub4,
            CAST(sum(in_a) AS BIGINT) AS n,
            CAST(sum(1 - in_a) AS BIGINT) AS m
        FROM r
    )
    SELECT n AS n_a, m AS n_b, ua4 AS u4_a, ub4 AS u4_b,
           round((n * (CAST(ua4 AS DOUBLE) / 4)
                  + m * (CAST(ub4 AS DOUBLE) / 4))
                     / (CAST(n AS DOUBLE) * m * (n + m))
                 - (CAST(4 AS DOUBLE) * n * m - 1) / (6 * (n + m)),
                 6) AS cvm_t
    FROM agg
    """,
    doc="F117 two-sample Cramér-von Mises drift test (Anderson 1962 "
    "rank form) between pre-1998 and 1998+ order values — the "
    "INTEGRAL-distance complement to F90 KS's supremum (CvM sees "
    "distributed small shifts KS misses): U's rank deviations are "
    "held as EXACT INTEGERS via doubled midranks (2r = 2*min_rank + "
    "tie_count - 1, the F91/F111 device) against doubled within-"
    "sample positions; per distinct value the class sum of (2r-2i)^2 "
    "has a closed BIGINT form, so the whole statistic reduces to the "
    "distinct-value frame + range-partitioned running counts "
    "(operators/rank.py) — no row-scale rank windows; "
    "the n*u4 product is cast to DOUBLE before multiplying (it "
    "overflows BIGINT past ~1e5 rows — noted), and T's closed form "
    "is the single fp expression. Same distinct-value scan shape as "
    "F90/F91. Single summary row.",
)
def orders_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        "o_orderkey",
        F.when(F.col("o_orderdate") < "1998-01-01", 1)
        .otherwise(0)
        .alias("in_a"),
    )
    from time_series_spark_spark.operators.rank import global_cumsum

    # Reduce to the distinct-value frame: within a tie class of value v,
    # dr is constant and the sample's doubled positions enumerate
    # consecutive evens 2(s_g+1)..2(s_g+c_g), so the class's
    # sum (dr - di)^2 has the exact closed form
    #   c*D^2 - 2*D*c*(c+1) + 4*(c*(c+1)*(2c+1) div 6),  D = dr - 2*s_g
    # — all BIGINT, identical to the oracle's per-row window sums, with
    # the prefixes from the range-partitioned running counts
    # (operators/rank.py) instead of row-scale global rank windows.
    per_v = x.groupBy("v").agg(
        F.sum("in_a").alias("ca"), F.count(F.lit(1)).alias("t")
    )
    cum = global_cumsum(
        per_v.withColumn("cum_t", F.col("t")).withColumn(
            "cum_a", F.col("ca")
        ),
        [("v", True)],
        ["cum_t", "cum_a"],
    )
    cls = cum.select(
        "ca",
        "t",
        (F.col("t") - F.col("ca")).alias("cb"),
        (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1).alias("dr"),
        (F.col("cum_a") - F.col("ca")).alias("sa"),
        ((F.col("cum_t") - F.col("t")) - (F.col("cum_a") - F.col("ca")))
        .alias("sb"),
    )

    def _class_sum(c: str, s: str) -> F.Column:
        # Σ_{j=1..c}(D - 2j)^2, D = dr - 2s — SQL `div` keeps the
        # c(c+1)(2c+1)/6 term exact BIGINT (it is always divisible by 6)
        return F.expr(
            f"{c} * (dr - 2*{s}) * (dr - 2*{s})"
            f" - 2 * (dr - 2*{s}) * {c} * ({c} + 1)"
            f" + 4 * (({c} * ({c} + 1) * (2*{c} + 1)) div 6)"
        )

    agg = cls.agg(
        F.sum(_class_sum("ca", "sa")).alias("ua4"),
        F.sum(_class_sum("cb", "sb")).alias("ub4"),
        F.sum("ca").alias("n"),
        F.sum("cb").alias("m"),
    )
    return agg.select(
        F.col("n").alias("n_a"),
        F.col("m").alias("n_b"),
        F.col("ua4").cast("long").alias("u4_a"),
        F.col("ub4").cast("long").alias("u4_b"),
        F.expr(
            "round((n * (CAST(ua4 AS DOUBLE) / 4)"
            " + m * (CAST(ub4 AS DOUBLE) / 4))"
            " / (CAST(n AS DOUBLE) * m * (n + m))"
            " - (CAST(4 AS DOUBLE) * n * m - 1) / (6 * (n + m)), 6)"
        ).alias("cvm_t"),
    )


# ---------------------------------------------------------------------------
# F118 Jonckheere-Terpstra ordered-alternative test (rank formulation)
# ---------------------------------------------------------------------------
@register(
    "orders_jonckheere_priority",
    """
    WITH x AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g
        FROM orders
    ),
    per_v AS (
        SELECT v,
               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
               CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
               CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
               CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
               CAST(sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
        FROM x GROUP BY v
    ),
    cum AS (
        SELECT c1, c2, c3, c4, c5,
               CAST(coalesce(sum(c1) OVER w, 0) AS BIGINT) AS l1,
               CAST(coalesce(sum(c2) OVER w, 0) AS BIGINT) AS l2,
               CAST(coalesce(sum(c3) OVER w, 0) AS BIGINT) AS l3,
               CAST(coalesce(sum(c4) OVER w, 0) AS BIGINT) AS l4
        FROM per_v
        WINDOW w AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    j AS (
        SELECT CAST(sum(
                   c2 * (2 * l1 + c1)
                 + c3 * (2 * (l1 + l2) + c1 + c2)
                 + c4 * (2 * (l1 + l2 + l3) + c1 + c2 + c3)
                 + c5 * (2 * (l1 + l2 + l3 + l4) + c1 + c2 + c3 + c4)
               ) AS BIGINT) AS j2
        FROM cum
    ),
    sizes AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN g = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
               CAST(sum(CASE WHEN g = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
               CAST(sum(CASE WHEN g = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n5
        FROM x
    ),
    ties AS (
        SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS t_a,
               CAST(sum(t * (t - 1) * (t - 2)) AS BIGINT) AS t_b,
               CAST(sum(t * (t - 1)) AS BIGINT) AS t_c
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM x GROUP BY v)
    ),
    gsum AS (
        SELECT n,
               n1*n1 + n2*n2 + n3*n3 + n4*n4 + n5*n5 AS sn2,
               n1*(n1-1)*(2*n1+5) + n2*(n2-1)*(2*n2+5)
             + n3*(n3-1)*(2*n3+5) + n4*(n4-1)*(2*n4+5)
             + n5*(n5-1)*(2*n5+5) AS g_a,
               n1*(n1-1)*(n1-2) + n2*(n2-1)*(n2-2) + n3*(n3-1)*(n3-2)
             + n4*(n4-1)*(n4-2) + n5*(n5-1)*(n5-2) AS g_b,
               n1*(n1-1) + n2*(n2-1) + n3*(n3-1) + n4*(n4-1) + n5*(n5-1)
                   AS g_c
        FROM sizes
    )
    SELECT n AS n_orders, j2 AS j2_stat,
           CAST((n * n - sn2) / 2.0 AS BIGINT) AS e2j,
           round(((j2 - (n * n - sn2) / 2.0) / 2.0)
                 / sqrt(
                     (n*(n-1)*(2*n+5) - g_a - t_a) / 72.0
                   + (CAST(g_b AS DOUBLE) * t_b)
                     / (36.0 * n * (n-1) * (n-2))
                   + (CAST(g_c AS DOUBLE) * t_c) / (8.0 * n * (n-1))
                 ), 6) AS z
    FROM j CROSS JOIN gsum CROSS JOIN ties
    """,
    doc="F118 Jonckheere-Terpstra test for a MONOTONE ordering of order "
    "value across the five priority levels (the ordered-alternative "
    "test that beats Kruskal-Wallis when the hypothesis IS the "
    "ordering): J is assembled in its RANK formulation — per distinct "
    "value, each group's count pairs with the strictly-lower "
    "cumulative counts of LOWER groups (doubled, ties counting once — "
    "the midrank convention), so the pair mass never materializes "
    "(F90's distinct-value window shape, NOT an O(N^2) join); 2J and "
    "E[2J] = (N^2 - sum(n_g^2))/2 are EXACT INTEGERS (the difference is always even), and the z uses the "
    "full Hollander-Wolfe tie-corrected variance (A/B/C terms from "
    "exact group/tie power sums, double-cast products). Single "
    "summary row. On this corpus priorities are value-independent, "
    "so z honestly hovers near 0.",
)
def orders_jonckheere_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = load(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("v"),
        F.substring("o_orderpriority", 1, 1).cast("long").alias("g"),
    )
    cs = [
        F.sum(F.when(F.col("g") == i, 1).otherwise(0)).alias(f"c{i}")
        for i in range(1, 6)
    ]
    from time_series_spark_spark.operators.rank import global_cumsum

    per_v = x.groupBy("v").agg(*cs)
    # near-unique distinct cents: prefix counts via the range-
    # partitioned two-pass (operators/rank.py); exclusive = incl - c
    incl = per_v
    for i in range(1, 5):
        incl = incl.withColumn(f"l{i}", F.col(f"c{i}"))
    incl = global_cumsum(
        incl, [("v", True)], [f"l{i}" for i in range(1, 5)]
    )
    cum = incl.select(
        *[f"c{i}" for i in range(1, 6)],
        *[
            (F.col(f"l{i}") - F.col(f"c{i}")).alias(f"l{i}_x")
            for i in range(1, 5)
        ],
    ).select(
        *[f"c{i}" for i in range(1, 6)],
        *[F.col(f"l{i}_x").alias(f"l{i}") for i in range(1, 5)],
    )
    j = cum.agg(
        F.sum(
            F.expr(
                "c2 * (2 * l1 + c1)"
                " + c3 * (2 * (l1 + l2) + c1 + c2)"
                " + c4 * (2 * (l1 + l2 + l3) + c1 + c2 + c3)"
                " + c5 * (2 * (l1 + l2 + l3 + l4) + c1 + c2 + c3 + c4)"
            )
        ).alias("j2")
    )
    sizes = x.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(F.col("g") == i, 1).otherwise(0)).alias(f"n{i}")
            for i in range(1, 6)
        ],
    )
    ties = (
        x.groupBy("v")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("t_a"),
            F.sum(
                F.col("t") * (F.col("t") - 1) * (F.col("t") - 2)
            ).alias("t_b"),
            F.sum(F.col("t") * (F.col("t") - 1)).alias("t_c"),
        )
    )
    gsum = sizes.select(
        "n",
        F.expr("n1*n1 + n2*n2 + n3*n3 + n4*n4 + n5*n5").alias("sn2"),
        F.expr(
            "n1*(n1-1)*(2*n1+5) + n2*(n2-1)*(2*n2+5)"
            " + n3*(n3-1)*(2*n3+5) + n4*(n4-1)*(2*n4+5)"
            " + n5*(n5-1)*(2*n5+5)"
        ).alias("g_a"),
        F.expr(
            "n1*(n1-1)*(n1-2) + n2*(n2-1)*(n2-2) + n3*(n3-1)*(n3-2)"
            " + n4*(n4-1)*(n4-2) + n5*(n5-1)*(n5-2)"
        ).alias("g_b"),
        F.expr(
            "n1*(n1-1) + n2*(n2-1) + n3*(n3-1) + n4*(n4-1) + n5*(n5-1)"
        ).alias("g_c"),
    )
    return (
        j.crossJoin(F.broadcast(gsum))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_orders"),
            F.col("j2").alias("j2_stat"),
            F.expr("CAST((n * n - sn2) / 2.0 AS BIGINT)").alias("e2j"),
            F.expr(
                "round(((j2 - (n * n - sn2) / 2.0) / 2.0)"
                " / sqrt("
                " (n*(n-1)*(2*n+5) - g_a - t_a) / 72.0"
                " + (CAST(g_b AS DOUBLE) * t_b)"
                " / (36.0 * n * (n-1) * (n-2))"
                " + (CAST(g_c AS DOUBLE) * t_c) / (8.0 * n * (n-1))"
                " ), 6)"
            ).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# F119 Brown-Forsythe variance-homogeneity test (median-centered Levene)
# ---------------------------------------------------------------------------
@register(
    "events_brown_forsythe_value",
    """
    WITH x AS (
        SELECT event_type AS g,
               CAST(round(value * 100) AS BIGINT) AS v,
               event_id
        FROM events
    ),
    r AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v, event_id)
                   AS rnk,
               CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS ng
        FROM x
    ),
    med AS (
        SELECT g, v AS m FROM r
        WHERE rnk = CAST(floor((ng + 1) / 2.0) AS BIGINT)
    ),
    z AS (
        SELECT r.g, CAST(abs(r.v - med.m) AS BIGINT) AS z
        FROM x r JOIN med ON med.g = r.g
    ),
    per_g AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(z) AS BIGINT) AS s,
               CAST(sum(z * z) AS BIGINT) AS q
        FROM z GROUP BY g
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(s) AS BIGINT) AS ss,
               CAST(sum(q) AS BIGINT) AS qq,
               sum((CAST(s AS DOUBLE) / n) * s) AS sb
        FROM per_g
    )
    SELECT k AS n_groups, nn AS n_events,
           round((sb - (CAST(ss AS DOUBLE) / nn) * ss) / (k - 1)
                 / ((qq - sb) / (nn - k)), 6) AS bf_f
    FROM tot
    """,
    doc="F119 Brown-Forsythe test for variance homogeneity across event "
    "types (the robust Levene variant — one-way ANOVA on deviations "
    "from the GROUP MEDIAN, not the mean, so heavy tails don't "
    "inflate the test): medians are EXACT-RANK picks per group (F101 "
    "rule), deviations |v - m| are exact integers, and SSB/SSW come "
    "from the same exact power-sum algebra as F98 ANOVA (the "
    "CAST-DOUBLE group terms sum over k=5 rows — order-safe because "
    "the final agg is a 5-row reduce; per_g sums themselves are "
    "integer-exact). F ~ F(k-1, N-k) under equal variances — the "
    "check that should PASS before trusting F98's equal-variance "
    "assumption. Per-group rank window + two hash aggs.",
)
def events_brown_forsythe_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = _events(spark, sf_dir).select(
        F.col("event_type").alias("g"),
        F.expr(_CENTS).alias("v"),
        "event_id",
    )
    wg = Window.partitionBy("g")
    r = x.select(
        "g", "v",
        F.row_number().over(wg.orderBy("v", "event_id")).alias("rnk"),
        F.count(F.lit(1))
        .over(wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("ng"),
    )
    med = r.filter(
        F.expr("rnk = CAST(floor((ng + 1) / 2.0) AS BIGINT)")
    ).select("g", F.col("v").alias("m"))
    z = x.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("v") - F.col("m")).cast("long").alias("z")
    )
    per_g = z.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("z").alias("s"),
        F.sum(F.col("z") * F.col("z")).alias("q"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(F.expr("(CAST(s AS DOUBLE) / n) * s")).alias("sb"),
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_events"),
        F.expr(
            "round((sb - (CAST(ss AS DOUBLE) / nn) * ss) / (k - 1)"
            " / ((qq - sb) / (nn - k)), 6)"
        ).alias("bf_f"),
    )


# ---------------------------------------------------------------------------
# F120 Friedman rank test (complete blocks: days x event types)
# ---------------------------------------------------------------------------
@register(
    "events_friedman_daily",
    f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    k AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS kk FROM daily),
    full_d AS (
        SELECT d FROM daily GROUP BY d
        HAVING count(*) = (SELECT kk FROM k)
    ),
    r AS (
        SELECT event_type,
               CAST(2 * rank() OVER (PARTITION BY daily.d ORDER BY v)
                    + count(*) OVER (PARTITION BY daily.d, v) - 1
                    AS BIGINT) AS dr
        FROM daily JOIN full_d ON full_d.d = daily.d
    ),
    per_t AS (
        SELECT event_type, CAST(sum(dr) AS BIGINT) AS dsum,
               CAST(sum(dr * dr) AS BIGINT) AS d2sum,
               CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(sum(d2sum) AS BIGINT) AS a2,
               CAST(min(n) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS kk,
               CAST(sum(dsum) AS BIGINT) AS sd,
               CAST(sum(dsum * dsum) AS BIGINT) AS sd2
        FROM per_t
    )
    SELECT n AS n_days, kk AS k_types, a2 AS a2_ranks,
           round(CASE WHEN a2 - n * kk * (kk + 1) * (kk + 1) = 0 THEN 0.0
                      ELSE CAST((kk - 1) AS DOUBLE)
                           * (sd2 - 2 * n * (kk + 1) * sd
                              + kk * n * n * (kk + 1) * (kk + 1))
                           / (a2 - n * kk * (kk + 1) * (kk + 1)) END,
                 6) AS q_friedman
    FROM tot
    """,
    doc="F120 Friedman rank test for treatment effects in complete "
    "blocks — blocks are calendar DAYS, treatments are event types, "
    "the response is the daily value-cents total: do the types keep "
    "the same daily ordering beyond chance? Within-block ranks are "
    "held as EXACT INTEGER doubled midranks (the F91/F111/F117 "
    "device: 2r = 2*min_rank + tie_count - 1), so the per-type rank "
    "sums D_j, the squared-rank total A2 = 4*sum(r^2), and the "
    "tie-corrected Conover statistic's numerator/denominator are all "
    "exact BIGINTs; Q = (k-1)*sum(D_j - n(k+1))^2 / (A2 - nk(k+1)^2) "
    "is the single fp division (denominator 0 — every block fully "
    "tied — short-circuits to 0, not a crash). Only complete blocks "
    "(days with all k types) enter, per the textbook design. "
    "Pre-reduces to the days x types frame, so the rank windows are "
    "corpus-size-invariant. Single summary row.",
)
def events_friedman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(spark, sf_dir)
    k = daily.agg(
        F.countDistinct("event_type").cast("long").alias("kk")
    )
    full_d = (
        daily.groupBy("d")
        .agg(F.count(F.lit(1)).alias("nt"))
        .join(F.broadcast(k), F.col("nt") == F.col("kk"), "left_semi")
        .select("d")
    )
    r = daily.join(F.broadcast(full_d), "d").select(
        "event_type",
        (
            2 * F.rank().over(Window.partitionBy("d").orderBy("v"))
            + F.count(F.lit(1)).over(Window.partitionBy("d", "v"))
            - 1
        )
        .cast("long")
        .alias("dr"),
    )
    per_t = r.groupBy("event_type").agg(
        F.sum("dr").alias("dsum"),
        F.sum(F.col("dr") * F.col("dr")).alias("d2sum"),
        F.count(F.lit(1)).alias("n"),
    )
    tot = per_t.agg(
        F.sum("d2sum").alias("a2"),
        F.min("n").alias("n"),
        F.count(F.lit(1)).alias("kk"),
        F.sum("dsum").alias("sd"),
        F.sum(F.col("dsum") * F.col("dsum")).alias("sd2"),
    )
    return tot.select(
        F.col("n").alias("n_days"),
        F.col("kk").alias("k_types"),
        F.col("a2").alias("a2_ranks"),
        F.expr(
            "round(CASE WHEN a2 - n * kk * (kk + 1) * (kk + 1) = 0 THEN 0.0"
            " ELSE CAST((kk - 1) AS DOUBLE)"
            " * (sd2 - 2 * n * (kk + 1) * sd"
            " + kk * n * n * (kk + 1) * (kk + 1))"
            " / (a2 - n * kk * (kk + 1) * (kk + 1)) END, 6)"
        ).alias("q_friedman"),
    )


# ---------------------------------------------------------------------------
# F121 Durbin-Watson serial-correlation test on linear-detrend residuals
# ---------------------------------------------------------------------------
@register(
    "events_durbin_watson_daily",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT d, y,
               CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS t
        FROM daily
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS st,
               CAST(sum(t * t) AS BIGINT) AS st2,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(t * y) AS BIGINT) AS sty
        FROM idx
    ),
    e AS (
        SELECT d,
               CAST(y AS DOUBLE)
               - (CAST(sy AS DOUBLE)
                  - (CAST(n * sty - st * sy AS DOUBLE) / (n * st2 - st * st))
                    * st) / n
               - (CAST(n * sty - st * sy AS DOUBLE) / (n * st2 - st * st))
                 * t AS e,
               n
        FROM idx CROSS JOIN s
    ),
    l AS (
        SELECT d, n, e, lag(e) OVER (ORDER BY d) AS ep FROM e
    ),
    c AS (
        SELECT n,
               sum(e * e) OVER w AS den,
               sum(CASE WHEN ep IS NULL THEN 0.0
                        ELSE (e - ep) * (e - ep) END) OVER w AS num,
               row_number() OVER (ORDER BY d) AS rn
        FROM l
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT n AS n_days, round(num / den, 6) AS dw
    FROM c WHERE rn = n
    """,
    doc="F121 Durbin-Watson first-order serial-correlation test on the "
    "residuals of an OLS linear detrend of daily value-cents totals: "
    "DW = sum((e_t - e_(t-1))^2) / sum(e_t^2), ~2 under whiteness, "
    "->0 under positive autocorrelation — the classic companion to "
    "F102 Ljung-Box for trend-fit residuals specifically. The OLS "
    "slope/intercept come from EXACT BIGINT sums (n, sum t, sum t^2, "
    "sum y, sum t*y; valid while n*sum(t*y) < 2^63, i.e. daily cents "
    "x days^2 below ~9e18 — noted), residuals share one expression "
    "text in both engines, and both quadratic-form sums accumulate "
    "in DETERMINISTIC frame order (the F95/F102 running-sum device), "
    "so DW is bit-identical. Pre-reduces to the calendar-day frame; "
    "windows are corpus-size-invariant. Single summary row.",
)
def events_durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    idx = daily.select(
        "d", "y",
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("long")
        .alias("t"),
    )
    s = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("st2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
    )
    e = idx.crossJoin(F.broadcast(s)).select(
        "d",
        "n",
        F.expr(
            "CAST(y AS DOUBLE)"
            " - (CAST(sy AS DOUBLE)"
            " - (CAST(n * sty - st * sy AS DOUBLE) / (n * st2 - st * st))"
            " * st) / n"
            " - (CAST(n * sty - st * sy AS DOUBLE) / (n * st2 - st * st))"
            " * t"
        ).alias("e"),
    )
    wl = Window.orderBy("d")
    wc = wl.rowsBetween(Window.unboundedPreceding, 0)
    l = e.select("d", "n", "e", F.lag("e").over(wl).alias("ep"))
    c = l.select(
        "n",
        F.sum(F.col("e") * F.col("e")).over(wc).alias("den"),
        F.sum(
            F.when(F.col("ep").isNull(), F.lit(0.0)).otherwise(
                (F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))
            )
        )
        .over(wc)
        .alias("num"),
        F.row_number().over(wl).alias("rn"),
    )
    return c.filter(F.col("rn") == F.col("n")).select(
        F.col("n").alias("n_days"),
        F.round(F.col("num") / F.col("den"), 6).alias("dw"),
    )


# ---------------------------------------------------------------------------
# F122 Jarque-Bera normality test on daily totals
# ---------------------------------------------------------------------------
@register(
    "events_jarque_bera_daily",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
        FROM daily
    ),
    e AS (
        SELECT d, CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n AS e, n
        FROM daily CROSS JOIN s
    ),
    c AS (
        SELECT n,
               sum(e * e) OVER w AS s2,
               sum(e * e * e) OVER w AS s3,
               sum(e * e * e * e) OVER w AS s4,
               row_number() OVER (ORDER BY d) AS rn
        FROM e
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT n AS n_days,
           round((s3 / n) / ((s2 / n) * sqrt(s2 / n)), 6) AS skewness,
           round((s4 / n) / ((s2 / n) * (s2 / n)), 6) AS kurtosis,
           round(n / 6.0
                 * ( ((s3 / n) / ((s2 / n) * sqrt(s2 / n)))
                     * ((s3 / n) / ((s2 / n) * sqrt(s2 / n)))
                   + ((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0)
                     * ((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0) / 4.0),
                 6) AS jb_stat
    FROM c WHERE rn = n
    """,
    doc="F122 Jarque-Bera normality test on daily value-cents totals: "
    "JB = n/6*(S^2 + (K-3)^2/4) from the sample skewness S and "
    "kurtosis K, ~chi2(2) under normality — the distributional "
    "companion to F121 (serial correlation) and F102 (whiteness) for "
    "residual/total diagnostics. The mean is the one exact-integer "
    "division; centered moment sums e^2, e^3, e^4 accumulate in "
    "DETERMINISTIC frame order (the F95 running-sum device — an "
    "unordered double SUM would drift across engines), and S/K/JB "
    "share one expression text (sqrt/div/mult only, no pow) so all "
    "three are bit-identical doubles. Pre-reduces to the calendar-day "
    "frame. Single summary row.",
)
def events_jarque_bera_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    s = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    e = daily.crossJoin(F.broadcast(s)).select(
        "d",
        "n",
        F.expr("CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n").alias("e"),
    )
    wl = Window.orderBy("d")
    wc = wl.rowsBetween(Window.unboundedPreceding, 0)
    c = e.select(
        "n",
        F.sum(F.col("e") * F.col("e")).over(wc).alias("s2"),
        F.sum(F.col("e") * F.col("e") * F.col("e")).over(wc).alias("s3"),
        F.sum(F.col("e") * F.col("e") * F.col("e") * F.col("e"))
        .over(wc)
        .alias("s4"),
        F.row_number().over(wl).alias("rn"),
    )
    return c.filter(F.col("rn") == F.col("n")).select(
        F.col("n").alias("n_days"),
        F.expr(
            "round((s3 / n) / ((s2 / n) * sqrt(s2 / n)), 6)"
        ).alias("skewness"),
        F.expr("round((s4 / n) / ((s2 / n) * (s2 / n)), 6)").alias(
            "kurtosis"
        ),
        F.expr(
            "round(n / 6.0"
            " * ( ((s3 / n) / ((s2 / n) * sqrt(s2 / n)))"
            " * ((s3 / n) / ((s2 / n) * sqrt(s2 / n)))"
            " + ((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0)"
            " * ((s4 / n) / ((s2 / n) * (s2 / n)) - 3.0) / 4.0), 6)"
        ).alias("jb_stat"),
    )


# ---------------------------------------------------------------------------
# F123 Nelson-Aalen cumulative hazard (companion to F107 Kaplan-Meier)
# ---------------------------------------------------------------------------
@register(
    "users_nelson_aalen_hazard",
    """
    WITH bounds AS (
        SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS horizon
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_d,
               CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS last_d
        FROM events GROUP BY user_id
    ),
    lif AS (
        SELECT CAST(datediff('day', first_d, last_d) AS BIGINT) AS t,
               CASE WHEN datediff('day', last_d, horizon) > 0
                    THEN 1 ELSE 0 END AS died
        FROM u CROSS JOIN bounds
    ),
    per_t AS (
        SELECT t, CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM lif GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               CAST(sum(leaving) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_risk
        FROM per_t
    ),
    na AS (
        SELECT t, d, n_risk,
               sum(CAST(d AS DOUBLE) / n_risk) OVER w AS h,
               sum(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * n_risk))
                   OVER w AS vh
        FROM risk
        WINDOW w AS (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT t AS t_days, n_risk, d AS n_deaths,
           round(h, 6) AS na_cumhaz,
           round(vh, 6) AS na_var,
           round(exp(-h), 6) AS fh_survival
    FROM na
    ORDER BY t_days
    """,
    doc="F123 Nelson-Aalen cumulative-hazard estimator over the SAME "
    "right-censored user-lifetime frame as F107 Kaplan-Meier: "
    "H(t) = sum(d_i/n_i) over event times <= t, its Poisson variance "
    "sum(d_i/n_i^2), and the Fleming-Harrington survival exp(-H) — "
    "the hazard-scale view KM cannot give (additive risk increments; "
    "FH and KM converge for large n_risk, FH is the better small-n "
    "estimator). Risk sets are reverse-ordered EXACT INTEGER running "
    "sums; both hazard sums accumulate in DETERMINISTIC frame order "
    "(F95 device), div-only fp with shared expression text. One user "
    "reduce, one t reduce, ordered windows over the bounded lifetime "
    "frame — corpus-size-invariant.",
)
def users_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bounds = ev.agg(F.date_trunc("day", F.max("ts")).alias("horizon"))
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_d"),
        F.date_trunc("day", F.max("ts")).alias("last_d"),
    )
    lif = u.crossJoin(F.broadcast(bounds)).select(
        F.expr("CAST(datediff(last_d, first_d) AS BIGINT)").alias("t"),
        F.expr(
            "CASE WHEN datediff(horizon, last_d) > 0 THEN 1 ELSE 0 END"
        ).alias("died"),
    )
    per_t = lif.groupBy("t").agg(
        F.sum("died").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_fwd = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.select(
        "t", "d", F.sum("leaving").over(w_rev).alias("n_risk")
    )
    na = risk.select(
        "t", "d", "n_risk",
        F.sum(F.expr("CAST(d AS DOUBLE) / n_risk")).over(w_fwd).alias("h"),
        F.sum(
            F.expr("CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * n_risk)")
        )
        .over(w_fwd)
        .alias("vh"),
    )
    return na.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("n_deaths"),
        F.round("h", 6).alias("na_cumhaz"),
        F.round("vh", 6).alias("na_var"),
        F.round(F.exp(-F.col("h")), 6).alias("fh_survival"),
    ).orderBy("t_days")


# ---------------------------------------------------------------------------
# F124 Mood's median test across event types (distinct-value median)
# ---------------------------------------------------------------------------
@register(
    "events_mood_median_test",
    f"""
    WITH x AS (
        SELECT event_type AS g, {_CENTS} AS v FROM events
    ),
    per_v AS (
        SELECT v, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY v
    ),
    cum AS (
        SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cm,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM per_v
    ),
    med AS (
        SELECT min(v) AS m FROM cum
        WHERE cm >= CAST(floor((n + 1) / 2.0) AS BIGINT)
    ),
    per_g AS (
        SELECT g, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(CASE WHEN v > (SELECT m FROM med)
                             THEN 1 ELSE 0 END) AS BIGINT) AS ag
        FROM x GROUP BY g
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(ag) AS BIGINT) AS a,
               sum((CAST(n * ag - ng * a AS DOUBLE)
                    * (n * ag - ng * a)) / ng) AS sdel
        FROM per_g
             CROSS JOIN (SELECT CAST(sum(ng2) AS BIGINT) AS n,
                                CAST(sum(ag2) AS BIGINT) AS a
                         FROM (SELECT count(*) AS ng2,
                                      sum(CASE WHEN v > (SELECT m FROM med)
                                               THEN 1 ELSE 0 END) AS ag2
                               FROM x GROUP BY g))
    )
    SELECT n AS n_events, k AS k_types,
           (SELECT m FROM med) AS pooled_median_cents,
           a AS n_above,
           round(sdel / (CAST(a AS DOUBLE) * (n - a)), 6) AS chi2_mood
    FROM tot
    """,
    doc="F124 Mood's median test — do the k event types share a common "
    "median value? Pooled LOWER MEDIAN is an exact-rank pick over the "
    "DISTINCT-VALUE frame (per-v counts + running sum, the F90/F117 "
    "shape — never a corpus-sized sort window), per-group above-"
    "median counts are exact integers, and the 2xk chi-square "
    "collapses algebraically to sum(delta_g^2/n_g)/(A*B) with "
    "delta_g = N*a_g - n_g*A an EXACT BIGINT (cast to DOUBLE only "
    "before squaring — delta^2 would overflow past ~3e9 rows, noted); "
    "chi2 ~ chi2(k-1) under a common median. The median-only "
    "complement to F119 Brown-Forsythe (scale) and F98 ANOVA (mean). "
    "Two hash aggs + one bounded distinct-value window.",
)
def events_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = _events(spark, sf_dir).select(
        F.col("event_type").alias("g"), F.expr(_CENTS).alias("v")
    )
    from time_series_spark_spark.operators.rank import global_cumsum

    per_v = x.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    # near-unique distinct cents: running count via the range-
    # partitioned two-pass (operators/rank.py), total via broadcast
    tot = per_v.agg(F.sum("c").cast("long").alias("n"))
    cum = (
        global_cumsum(
            per_v.withColumn("cm", F.col("c")), [("v", True)], ["cm"]
        )
        .select("v", "cm")
        .crossJoin(F.broadcast(tot))
    )
    med = (
        cum.filter(
            F.expr("cm >= CAST(floor((n + 1) / 2.0) AS BIGINT)")
        )
        .agg(F.min("v").alias("m"))
    )
    per_g = x.crossJoin(F.broadcast(med)).groupBy("g").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.when(F.col("v") > F.col("m"), 1).otherwise(0)).alias("ag"),
        F.min("m").alias("m"),
    )
    scal = per_g.agg(
        F.sum("ng").alias("n"), F.sum("ag").alias("a")
    )
    tot = per_g.crossJoin(F.broadcast(scal)).agg(
        F.count(F.lit(1)).alias("k"),
        F.min("n").alias("n"),
        F.min("a").alias("a"),
        F.min("m").alias("m"),
        F.sum(
            F.expr(
                "(CAST(n * ag - ng * a AS DOUBLE) * (n * ag - ng * a)) / ng"
            )
        ).alias("sdel"),
    )
    return tot.select(
        F.col("n").alias("n_events"),
        F.col("k").alias("k_types"),
        F.col("m").alias("pooled_median_cents"),
        F.col("a").alias("n_above"),
        F.expr(
            "round(sdel / (CAST(a AS DOUBLE) * (n - a)), 6)"
        ).alias("chi2_mood"),
    )


# ---------------------------------------------------------------------------
# F125 empirical-Bayes shrunk per-user purchase rates
# ---------------------------------------------------------------------------
@register(
    "users_eb_purchase_rates",
    """
    WITH u AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k
        FROM events GROUP BY user_id
    ),
    per_n AS (
        SELECT n, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY n
    ),
    mcum AS (
        SELECT n, c,
               CAST(sum(c) OVER (ORDER BY n
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cm,
               CAST(sum(c) OVER () AS BIGINT) AS m
        FROM per_n
    ),
    prior AS (
        SELECT (SELECT min(n) FROM mcum
                WHERE cm >= CAST(floor((m + 1) / 2.0) AS BIGINT)) AS mm,
               CAST(sum(k) AS BIGINT) AS sk,
               CAST(sum(n) AS BIGINT) AS sn
        FROM u
    )
    SELECT user_id, n AS n_events, k AS n_purchases,
           round(CAST(k AS DOUBLE) / n, 6) AS raw_rate,
           round((k + (CAST(sk AS DOUBLE) / sn) * mm)
                 / CAST(n + mm AS DOUBLE), 6) AS shrunk_rate
    FROM u CROSS JOIN prior
    """,
    doc="F125 empirical-Bayes (beta-binomial pseudo-count) shrinkage of "
    "per-user purchase rates — the estimator a training-data pipeline "
    "needs wherever a per-key rate from few trials ranks keys (domain "
    "quality rates, dedup-cluster keep rates): shrunk = (k + mu*M) / "
    "(n + M), pulling low-n users toward the pooled rate mu = "
    "sum(k)/sum(n) while high-n users keep their own. The prior "
    "strength M is the MEDIAN events-per-user — an EXACT-RANK integer "
    "pick over the bounded distinct-n frame (F124 device), so the "
    "whole release is deterministic: integer sums, one shared-text "
    "division each for mu/raw/shrunk. Two hash aggs + one bounded "
    "distinct-n window; output is the per-user frame.",
)
def users_eb_purchase_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
    )
    per_n = u.groupBy("n").agg(F.count(F.lit(1)).alias("c"))
    w_all = Window.orderBy("n").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mcum = per_n.select(
        "n",
        F.sum("c")
        .over(Window.orderBy("n").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cm"),
        F.sum("c").over(w_all).alias("m"),
    )
    mm = (
        mcum.filter(F.expr("cm >= CAST(floor((m + 1) / 2.0) AS BIGINT)"))
        .agg(F.min("n").alias("mm"))
    )
    prior = (
        u.agg(F.sum("k").alias("sk"), F.sum("n").alias("sn"))
        .crossJoin(F.broadcast(mm))
    )
    return u.crossJoin(F.broadcast(prior)).select(
        "user_id",
        F.col("n").alias("n_events"),
        F.col("k").alias("n_purchases"),
        F.expr("round(CAST(k AS DOUBLE) / n, 6)").alias("raw_rate"),
        F.expr(
            "round((k + (CAST(sk AS DOUBLE) / sn) * mm)"
            " / CAST(n + mm AS DOUBLE), 6)"
        ).alias("shrunk_rate"),
    )


# ---------------------------------------------------------------------------
# F126 market-concentration report (HHI + CR-k from exact power sums)
# ---------------------------------------------------------------------------
@register(
    "customer_concentration_report",
    """
    WITH c AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS rnk
        FROM c
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rev) AS BIGINT) AS t,
               CAST(sum(CAST(rev AS DECIMAL(18,0))
                        * CAST(rev AS DECIMAL(18,0))) AS DOUBLE) AS s2,
               CAST(sum(CASE WHEN rnk <= 1 THEN rev ELSE 0 END)
                    AS BIGINT) AS top1,
               CAST(sum(CASE WHEN rnk <= 4 THEN rev ELSE 0 END)
                    AS BIGINT) AS top4,
               CAST(sum(CASE WHEN rnk <= 8 THEN rev ELSE 0 END)
                    AS BIGINT) AS top8
        FROM r
    )
    SELECT n AS n_customers, t AS total_cents,
           round(10000.0 * s2 / (CAST(t AS DOUBLE) * t), 6) AS hhi_bp,
           round(CAST(top1 AS DOUBLE) / t, 6) AS cr1,
           round(CAST(top4 AS DOUBLE) / t, 6) AS cr4,
           round(CAST(top8 AS DOUBLE) / t, 6) AS cr8
    FROM tot
    """,
    doc="F126 revenue-concentration report over customers: Herfindahl-"
    "Hirschman index in basis points (10000*sum(s_i^2), the antitrust "
    "scale) plus CR1/CR4/CR8 concentration ratios. HHI's power sum "
    "sum(rev^2) is EXACT via DECIMAL(18,0) products (BIGINT would "
    "overflow at ~3e9-cent customers; decimal keeps 36 digits, summed "
    "exactly in both engines, converted to DOUBLE once — the dialect's "
    "HUGEINT-avoidance rule) over exact integer per-customer revenue; "
    "CR-k picks are rank-windowed with a custkey tiebreak. The rank "
    "window runs over the per-customer AGGREGATE (the documented RFM "
    "posture: swap to a broadcast top-k when the dimension outgrows "
    "one task). One hash agg + one aggregate-frame window; single "
    "summary row.",
)
def customer_concentration_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("rev")
    )
    from time_series_spark_spark.operators.rank import global_rank

    # customer dimension rank via the range-partitioned two-pass
    r = global_rank(
        c, [("rev", False), ("o_custkey", True)], "rnk"
    ).select("rev", "rnk")
    tot = r.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("t"),
        F.sum(
            F.expr(
                "CAST(rev AS DECIMAL(18,0)) * CAST(rev AS DECIMAL(18,0))"
            )
        )
        .cast("double")
        .alias("s2"),
        F.sum(F.when(F.col("rnk") <= 1, F.col("rev")).otherwise(0)).alias(
            "top1"
        ),
        F.sum(F.when(F.col("rnk") <= 4, F.col("rev")).otherwise(0)).alias(
            "top4"
        ),
        F.sum(F.when(F.col("rnk") <= 8, F.col("rev")).otherwise(0)).alias(
            "top8"
        ),
    )
    return tot.select(
        F.col("n").alias("n_customers"),
        F.col("t").alias("total_cents"),
        F.expr(
            "round(10000.0 * s2 / (CAST(t AS DOUBLE) * t), 6)"
        ).alias("hhi_bp"),
        F.expr("round(CAST(top1 AS DOUBLE) / t, 6)").alias("cr1"),
        F.expr("round(CAST(top4 AS DOUBLE) / t, 6)").alias("cr4"),
        F.expr("round(CAST(top8 AS DOUBLE) / t, 6)").alias("cr8"),
    )


# ---------------------------------------------------------------------------
# F127 two-sample Poisson rate test (conditional binomial score z)
# ---------------------------------------------------------------------------
@register(
    "events_poisson_rate_test",
    """
    WITH bounds AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1
        FROM events
    ),
    split AS (
        SELECT d0,
               CAST(datediff('day', d0, d1) + 1 AS BIGINT) AS n_days,
               CAST(floor((datediff('day', d0, d1) + 1) / 2.0) AS BIGINT)
                   AS half
        FROM bounds
    ),
    x AS (
        SELECT CASE WHEN datediff('day', d0, CAST(date_trunc('day', ts)
                                             AS TIMESTAMP)) < half
                    THEN 1 ELSE 0 END AS in_a
        FROM events CROSS JOIN split
        WHERE event_type = 'purchase'
    ),
    k AS (
        SELECT CAST(sum(in_a) AS BIGINT) AS k1,
               CAST(sum(1 - in_a) AS BIGINT) AS k2
        FROM x
    )
    SELECT half AS days_a, n_days - half AS days_b, k1, k2,
           round(CAST(k1 AS DOUBLE) / half, 6) AS rate_a,
           round(CAST(k2 AS DOUBLE) / (n_days - half), 6) AS rate_b,
           round((k1 - (k1 + k2) * (CAST(half AS DOUBLE) / n_days))
                 / sqrt((k1 + k2) * (CAST(half AS DOUBLE) / n_days)
                        * (CAST(n_days - half AS DOUBLE) / n_days)), 6)
               AS z_score
    FROM k CROSS JOIN split
    """,
    doc="F127 two-sample Poisson rate test on daily purchase counts, "
    "first half of the corpus calendar vs second: conditional on the "
    "total K = k1+k2, k1 ~ Binomial(K, t1/(t1+t2)) under equal rates, "
    "so the score z = (k1 - K*w) / sqrt(K*w*(1-w)) with w = t1/T "
    "needs only EXACT INTEGER counts and day spans — no variance "
    "estimation, the standard epidemiology/SRE rate-comparison form "
    "(complements F84 variant props, which compares proportions per "
    "USER, not rates per DAY). Exposure halves via exact floor "
    "division of the day span. One filtered scan + a 2-cell reduce; "
    "single summary row.",
)
def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    split = bounds.select(
        "d0",
        F.expr("CAST(datediff(d1, d0) + 1 AS BIGINT)").alias("n_days"),
        F.expr(
            "CAST(floor((datediff(d1, d0) + 1) / 2.0) AS BIGINT)"
        ).alias("half"),
    )
    x = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(split))
        .select(
            F.expr(
                "CASE WHEN datediff(date_trunc('day', ts), d0) < half"
                " THEN 1 ELSE 0 END"
            ).alias("in_a")
        )
    )
    k = x.agg(
        F.sum("in_a").alias("k1"),
        F.sum(F.lit(1) - F.col("in_a")).alias("k2"),
    )
    return k.crossJoin(F.broadcast(split)).select(
        F.col("half").alias("days_a"),
        (F.col("n_days") - F.col("half")).alias("days_b"),
        "k1",
        "k2",
        F.expr("round(CAST(k1 AS DOUBLE) / half, 6)").alias("rate_a"),
        F.expr(
            "round(CAST(k2 AS DOUBLE) / (n_days - half), 6)"
        ).alias("rate_b"),
        F.expr(
            "round((k1 - (k1 + k2) * (CAST(half AS DOUBLE) / n_days))"
            " / sqrt((k1 + k2) * (CAST(half AS DOUBLE) / n_days)"
            " * (CAST(n_days - half AS DOUBLE) / n_days)), 6)"
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# F128 mutual information / normalized MI for event_type x day-of-week
# ---------------------------------------------------------------------------
@register(
    "events_mutual_info_type_dow",
    """
    WITH obs AS (
        SELECT event_type,
               CAST((CAST(dayofweek(ts) AS BIGINT) + 6) % 7 AS BIGINT)
                   AS dow,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, dow, o,
               CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
               CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS c,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM obs
    ),
    mi AS (
        SELECT n,
               sum((CAST(o AS DOUBLE) / n)
                   * ln((CAST(o AS DOUBLE) * n) / (CAST(r AS DOUBLE) * c)))
                   OVER (ORDER BY event_type, dow
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS mi,
               row_number() OVER (ORDER BY event_type, dow) AS rn,
               count(*) OVER () AS cells
        FROM m
    ),
    hr AS (
        SELECT sum(-(CAST(r AS DOUBLE) / n)
                   * ln(CAST(r AS DOUBLE) / n))
                   OVER (ORDER BY event_type
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS h,
               row_number() OVER (ORDER BY event_type) AS rn,
               count(*) OVER () AS k
        FROM (SELECT event_type, CAST(sum(o) AS BIGINT) AS r,
                     CAST(sum(sum(o)) OVER () AS BIGINT) AS n
              FROM obs GROUP BY event_type)
    ),
    hc AS (
        SELECT sum(-(CAST(c AS DOUBLE) / n)
                   * ln(CAST(c AS DOUBLE) / n))
                   OVER (ORDER BY dow
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS h,
               row_number() OVER (ORDER BY dow) AS rn,
               count(*) OVER () AS k
        FROM (SELECT dow, CAST(sum(o) AS BIGINT) AS c,
                     CAST(sum(sum(o)) OVER () AS BIGINT) AS n
              FROM obs GROUP BY dow)
    )
    SELECT (SELECT max(n) FROM m) AS n_events,
           round((SELECT mi FROM mi WHERE rn = cells), 6) AS mi_nats,
           round((SELECT h FROM hr WHERE rn = k), 6) AS h_type,
           round((SELECT h FROM hc WHERE rn = k), 6) AS h_dow,
           round((SELECT mi FROM mi WHERE rn = cells)
                 / sqrt((SELECT h FROM hr WHERE rn = k)
                        * (SELECT h FROM hc WHERE rn = k)), 6) AS nmi
    """,
    doc="F128 mutual information between event_type and day-of-week in "
    "nats, with marginal entropies and the sqrt-normalized NMI in "
    "[0,1] — the effect-size companion to F92's chi-square (MI is the "
    "G-statistic/2N, additive across cells and comparable across "
    "tables; NMI is the clustering-agreement standard). Counts are "
    "EXACT BIGINTs from one contingency reduce; every entropy/MI sum "
    "accumulates in DETERMINISTIC frame order over the bounded "
    "|types|x7 frame (F95 device), ln/div with one shared expression "
    "text. Dow normalized to 0=Monday in both engines (§5.1). Single "
    "summary row.",
)
def events_mutual_info_type_dow(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    obs = ev.groupBy(
        "event_type",
        ((F.dayofweek("ts").cast("long") + 5) % 7).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("o"))
    w_all = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    m = obs.select(
        "event_type", "dow", "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("r"),
        F.sum("o").over(W.partitionBy("dow")).alias("c"),
        F.sum("o").over(w_all).alias("n"),
    )
    w_mi = W.orderBy("event_type", "dow").rowsBetween(
        W.unboundedPreceding, 0
    )
    mi = m.select(
        "n",
        F.sum(
            F.expr(
                "(CAST(o AS DOUBLE) / n)"
                " * ln((CAST(o AS DOUBLE) * n) / (CAST(r AS DOUBLE) * c))"
            )
        )
        .over(w_mi)
        .alias("mi"),
        F.row_number().over(W.orderBy("event_type", "dow")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cells"),
    ).filter(F.col("rn") == F.col("cells")).select("n", "mi")

    def _marginal(col: str):
        g = obs.groupBy(col).agg(F.sum("o").alias("x"))
        g = g.select(col, "x", F.sum("x").over(w_all).alias("n"))
        return (
            g.select(
                F.sum(
                    F.expr(
                        "-(CAST(x AS DOUBLE) / n) * ln(CAST(x AS DOUBLE) / n)"
                    )
                )
                .over(W.orderBy(col).rowsBetween(W.unboundedPreceding, 0))
                .alias("h"),
                F.row_number().over(W.orderBy(col)).alias("rn"),
                F.count(F.lit(1)).over(w_all).alias("k"),
            )
            .filter(F.col("rn") == F.col("k"))
            .select("h")
        )

    hr = _marginal("event_type").select(F.col("h").alias("h_type"))
    hc = _marginal("dow").select(F.col("h").alias("h_dow"))
    return (
        mi.crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
        .select(
            F.col("n").alias("n_events"),
            F.round("mi", 6).alias("mi_nats"),
            F.round("h_type", 6).alias("h_type"),
            F.round("h_dow", 6).alias("h_dow"),
            F.expr("round(mi / sqrt(h_type * h_dow), 6)").alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# F129 Benjamini-Hochberg FDR control over a per-type rate-test family
# ---------------------------------------------------------------------------
_PHI_TAIL = (
    "(2.0 * (exp(-az * az / 2.0) / 2.5066282746310002)"
    " * (0.319381530 * t - 0.356563782 * t * t"
    " + 1.781477937 * t * t * t - 1.821255978 * t * t * t * t"
    " + 1.330274429 * t * t * t * t * t))"
)


@register(
    "events_bh_fdr_type_drift",
    f"""
    WITH bounds AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(datediff('day', CAST(date_trunc('day', min(ts))
                                         AS TIMESTAMP),
                             CAST(date_trunc('day', max(ts))
                                  AS TIMESTAMP)) + 1 AS BIGINT) AS n_days
        FROM events
    ),
    split AS (
        SELECT d0, n_days,
               CAST(floor(n_days / 2.0) AS BIGINT) AS half
        FROM bounds
    ),
    k AS (
        SELECT event_type,
               CAST(sum(CASE WHEN datediff('day', d0,
                        CAST(date_trunc('day', ts) AS TIMESTAMP)) < half
                        THEN 1 ELSE 0 END) AS BIGINT) AS k1,
               CAST(sum(CASE WHEN datediff('day', d0,
                        CAST(date_trunc('day', ts) AS TIMESTAMP)) < half
                        THEN 0 ELSE 1 END) AS BIGINT) AS k2
        FROM events CROSS JOIN split GROUP BY event_type
    ),
    z AS (
        SELECT event_type, k1, k2,
               (k1 - (k1 + k2) * (CAST(half AS DOUBLE) / n_days))
               / sqrt((k1 + k2) * (CAST(half AS DOUBLE) / n_days)
                      * (CAST(n_days - half AS DOUBLE) / n_days)) AS z
        FROM k CROSS JOIN split
    ),
    p AS (
        SELECT event_type, k1, k2, z, {_PHI_TAIL} AS p
        FROM (SELECT event_type, k1, k2, z, abs(z) AS az,
                     1.0 / (1.0 + 0.2316419 * abs(z)) AS t
              FROM z)
    ),
    bh AS (
        SELECT event_type, k1, k2, z, p,
               row_number() OVER (ORDER BY p, event_type) AS p_rank,
               count(*) OVER () AS m
        FROM p
    ),
    cut AS (
        SELECT event_type, k1, k2, z, p, p_rank,
               CAST(p_rank AS DOUBLE) * 0.05 / m AS bh_cutoff,
               max(CASE WHEN p <= CAST(p_rank AS DOUBLE) * 0.05 / m
                        THEN p_rank ELSE 0 END) OVER () AS kstar
        FROM bh
    )
    SELECT event_type, k1, k2, round(z, 6) AS z,
           round(p, 6) AS p_value,
           CAST(p_rank AS BIGINT) AS p_rank,
           round(bh_cutoff, 6) AS bh_cutoff,
           CASE WHEN p_rank <= kstar THEN 1 ELSE 0 END AS rejected
    FROM cut ORDER BY p_rank
    """,
    doc="F129 Benjamini-Hochberg step-up FDR control (alpha=0.05) over "
    "a FAMILY of per-event-type calendar-drift tests (each type's "
    "first-vs-second-half event count compared by the F127 "
    "conditional-binomial score z): p-values via the Abramowitz-"
    "Stegun 26.2.17 normal-tail polynomial (|err| < 7.5e-8; exp/mult "
    "only, SHARED expression text so both engines produce bit-equal "
    "doubles — neither engine has a builtin erf), then the BH "
    "step-up: rank p ascending, k* = max{{k : p_k <= k*alpha/m}}, "
    "reject ranks <= k*. THE multiple-testing guard every metrics "
    "platform needs once it runs a test per segment — F92/F98 alone "
    "inflate false positives across k segments. Counts exact "
    "BIGINTs; rank/threshold comparisons on identical doubles. One "
    "contingency reduce + windows over the k-types frame.",
)
def events_bh_fdr_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.expr(
            "CAST(datediff(date_trunc('day', max(ts)),"
            " date_trunc('day', min(ts))) + 1 AS BIGINT)"
        ).alias("n_days"),
    )
    split = bounds.select(
        "d0", "n_days",
        F.expr("CAST(floor(n_days / 2.0) AS BIGINT)").alias("half"),
    )
    k = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN datediff(date_trunc('day', ts), d0) < half"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("k1"),
            F.sum(
                F.expr(
                    "CASE WHEN datediff(date_trunc('day', ts), d0) < half"
                    " THEN 0 ELSE 1 END"
                )
            ).alias("k2"),
        )
    )
    z = k.crossJoin(F.broadcast(split)).select(
        "event_type", "k1", "k2",
        F.expr(
            "(k1 - (k1 + k2) * (CAST(half AS DOUBLE) / n_days))"
            " / sqrt((k1 + k2) * (CAST(half AS DOUBLE) / n_days)"
            " * (CAST(n_days - half AS DOUBLE) / n_days))"
        ).alias("z"),
    )
    p = z.withColumn("az", F.expr("abs(z)")).withColumn(
        "t", F.expr("1.0 / (1.0 + 0.2316419 * abs(z))")
    ).withColumn("p", F.expr(_PHI_TAIL)).drop("az", "t")
    w_all = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    bh = p.select(
        "event_type", "k1", "k2", "z", "p",
        F.row_number().over(W.orderBy("p", "event_type")).alias("p_rank"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    cut = bh.select(
        "event_type", "k1", "k2", "z", "p", "p_rank",
        F.expr("CAST(p_rank AS DOUBLE) * 0.05 / m").alias("bh_cutoff"),
        F.max(
            F.expr(
                "CASE WHEN p <= CAST(p_rank AS DOUBLE) * 0.05 / m THEN p_rank ELSE 0 END"
            )
        )
        .over(w_all)
        .alias("kstar"),
    )
    return cut.select(
        "event_type", "k1", "k2",
        F.round("z", 6).alias("z"),
        F.round("p", 6).alias("p_value"),
        F.col("p_rank").cast("long").alias("p_rank"),
        F.round("bh_cutoff", 6).alias("bh_cutoff"),
        F.expr(
            "CASE WHEN p_rank <= kstar THEN 1 ELSE 0 END"
        ).alias("rejected"),
    ).orderBy("p_rank")


# ---------------------------------------------------------------------------
# F130 Cochran's Q test (binary repeated measures: users x types)
# ---------------------------------------------------------------------------
@register(
    "users_cochran_q_types",
    """
    WITH split AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(floor((datediff('day',
                        CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
                        CAST(date_trunc('day', max(ts)) AS TIMESTAMP))
                    + 1) / 2.0) AS BIGINT) AS half
        FROM events
    ),
    x AS (
        SELECT user_id, event_type,
               CAST(max(CASE WHEN datediff('day', d0,
                            CAST(date_trunc('day', ts) AS TIMESTAMP))
                            >= half THEN 1 ELSE 0 END) AS BIGINT) AS hit
        FROM events CROSS JOIN split
        GROUP BY user_id, event_type
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    users AS (SELECT DISTINCT user_id FROM events),
    grid AS (
        SELECT u.user_id, t.event_type,
               CAST(coalesce(x.hit, 0) AS BIGINT) AS hit
        FROM users u CROSS JOIN types t
        LEFT JOIN x ON x.user_id = u.user_id
                   AND x.event_type = t.event_type
    ),
    rows_ AS (
        SELECT user_id, CAST(sum(hit) AS BIGINT) AS r
        FROM grid GROUP BY user_id
    ),
    cols_ AS (
        SELECT event_type, CAST(sum(hit) AS BIGINT) AS c
        FROM grid GROUP BY event_type
    ),
    agg AS (
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM rows_) AS b,
               (SELECT CAST(count(*) AS BIGINT) FROM cols_) AS k,
               (SELECT CAST(sum(r) AS BIGINT) FROM rows_) AS n,
               (SELECT CAST(sum(r * r) AS BIGINT) FROM rows_) AS sr2,
               (SELECT CAST(sum(c * c) AS BIGINT) FROM cols_) AS sc2
    )
    SELECT b AS n_users, k AS k_types, n AS n_hits,
           round(CASE WHEN k * n - sr2 = 0 THEN 0.0
                      ELSE CAST((k - 1) AS DOUBLE) * (k * sc2 - n * n)
                           / (k * n - sr2) END, 6) AS q_cochran
    FROM agg
    """,
    doc="F130 Cochran's Q test for equality of k binary treatment rates "
    "under blocking — blocks are USERS, treatments are event types, "
    "the response is 'did the user perform that type in the SECOND "
    "half of the calendar' (per-user binary engagement — the matched "
    "design that a naive per-type proportion test would get wrong by "
    "ignoring user effects; Q is McNemar's generalization to k>2): "
    "Q = (k-1)(k*sum(C_j^2) - N^2) / (k*N - sum(R_i^2)), every term "
    "an EXACT BIGINT (users who hit all types or none contribute "
    "R(k-R)=0 and drop out through the algebra; an all-degenerate "
    "denominator short-circuits to 0); ~chi2(k-1) under exchangeable "
    "types. The user x type grid is densified with a bounded "
    "types-dimension cross join (missing cell = 0). Two hash aggs + "
    "a 5-row reduce; single summary row.",
)
def users_cochran_q_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    split = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.expr(
            "CAST(floor((datediff(date_trunc('day', max(ts)),"
            " date_trunc('day', min(ts))) + 1) / 2.0) AS BIGINT)"
        ).alias("half"),
    )
    x = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("user_id", "event_type")
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN datediff(date_trunc('day', ts), d0) >= half"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("hit")
        )
    )
    types = ev.select("event_type").distinct()
    users = ev.select("user_id").distinct()
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(x, ["user_id", "event_type"], "left")
        .select(
            "user_id", "event_type",
            F.coalesce(F.col("hit"), F.lit(0)).cast("long").alias("hit"),
        )
    )
    rows_ = grid.groupBy("user_id").agg(F.sum("hit").alias("r"))
    cols_ = grid.groupBy("event_type").agg(F.sum("hit").alias("c"))
    ragg = rows_.agg(
        F.count(F.lit(1)).alias("b"),
        F.sum("r").alias("n"),
        F.sum(F.col("r") * F.col("r")).alias("sr2"),
    )
    cagg = cols_.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    agg = ragg.crossJoin(F.broadcast(cagg))
    return agg.select(
        F.col("b").alias("n_users"),
        F.col("k").alias("k_types"),
        F.col("n").alias("n_hits"),
        F.expr(
            "round(CASE WHEN k * n - sr2 = 0 THEN 0.0"
            " ELSE CAST((k - 1) AS DOUBLE) * (k * sc2 - n * n)"
            " / (k * n - sr2) END, 6)"
        ).alias("q_cochran"),
    )


# ---------------------------------------------------------------------------
# F131 Ansari-Bradley scale test (view vs click; distinct-value frame)
# ---------------------------------------------------------------------------
@register(
    "events_ansari_bradley_scale",
    f"""
    WITH x AS (
        SELECT {_CENTS} AS v,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS in_a
        FROM events WHERE event_type IN ('view', 'click')
    ),
    per_v AS (
        SELECT v, CAST(sum(in_a) AS BIGINT) AS ca,
               CAST(count(*) AS BIGINT) AS c
        FROM x GROUP BY v
    ),
    cum AS (
        SELECT v, ca, c,
               CAST(coalesce(sum(c) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS before,
               CAST(sum(c) OVER () AS BIGINT) AS nn
        FROM per_v
    ),
    scored AS (
        SELECT ca, c, nn,
               least(2 * before + c + 1,
                     2 * (nn + 1) - (2 * before + c + 1)) AS d
        FROM cum
    ),
    agg AS (
        SELECT CAST(max(nn) AS BIGINT) AS nn,
               CAST(sum(ca) AS BIGINT) AS m,
               CAST(sum(ca * d) AS BIGINT) AS t2,
               CAST(sum(c * d * d) AS BIGINT) AS sd2
        FROM scored
    )
    SELECT m AS n_click, nn - m AS n_view, t2 AS t2_ab,
           round(CASE WHEN nn % 2 = 0 THEN
                    (t2 - m * (nn + 2) / 2.0)
                    / sqrt(CAST(m AS DOUBLE) * (nn - m)
                           * (4.0 * sd2 - CAST(nn AS DOUBLE) * (nn + 2)
                              * (nn + 2))
                           / (4.0 * nn * (nn - 1)))
                 ELSE
                    (t2 - m * (CAST(nn + 1 AS DOUBLE) * (nn + 1)) / (2.0 * nn))
                    / sqrt(CAST(m AS DOUBLE) * (nn - m)
                           * (4.0 * nn * sd2
                              - (CAST(nn + 1 AS DOUBLE) * (nn + 1))
                                * (CAST(nn + 1 AS DOUBLE) * (nn + 1)))
                           / (4.0 * CAST(nn AS DOUBLE) * nn * (nn - 1)))
                 END, 6) AS z_ab
    FROM agg
    """,
    doc="F131 Ansari-Bradley rank test for a SCALE (dispersion) "
    "difference between click and view event values — ranks folded "
    "from both ends (score = min(rank, N+1-rank): extreme values get "
    "small scores, so a low/high mean score in one sample means "
    "wider/narrower spread), the nonparametric complement to F119 "
    "Brown-Forsythe that needs no location estimate (it assumes "
    "equal medians). Scores are EXACT INTEGERS via the doubled-"
    "midrank fold d = min(2r, 2(N+1)-2r) over the DISTINCT-VALUE "
    "frame (F90/F124 shape — never a corpus sort), T2 = sum of "
    "sample-A doubled scores and sum(c*d^2) are exact BIGINTs "
    "(validity: sum(d^2) ~ N^3/3 < 2^63 while the two-type row count "
    "stays under ~3e6 — beyond that accumulate sd2 in DOUBLE over "
    "the ordered distinct-value frame), and the tie-aware normal "
    "approximation (Hollander-Wolfe, parity-split) is one shared fp "
    "expression. One hash agg + bounded distinct-value windows; "
    "single summary row.",
)
def events_ansari_bradley_scale(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            F.expr(_CENTS).alias("v"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("in_a"),
        )
    )
    from time_series_spark_spark.operators.rank import global_cumsum

    per_v = x.groupBy("v").agg(
        F.sum("in_a").alias("ca"), F.count(F.lit(1)).alias("c")
    )
    # near-unique distinct cents: prefix via the range-partitioned
    # two-pass (operators/rank.py), total via broadcast
    tot = per_v.agg(F.sum("c").cast("long").alias("nn"))
    cum = (
        global_cumsum(
            per_v.withColumn("ct", F.col("c")), [("v", True)], ["ct"]
        )
        .select(
            "v", "ca", "c",
            (F.col("ct") - F.col("c")).cast("long").alias("before"),
        )
        .crossJoin(F.broadcast(tot))
    )
    scored = cum.select(
        "ca", "c", "nn",
        F.expr(
            "least(2 * before + c + 1,"
            " 2 * (nn + 1) - (2 * before + c + 1))"
        ).alias("d"),
    )
    agg = scored.agg(
        F.max("nn").alias("nn"),
        F.sum("ca").alias("m"),
        F.sum(F.col("ca") * F.col("d")).alias("t2"),
        F.sum(F.col("c") * F.col("d") * F.col("d")).alias("sd2"),
    )
    return agg.select(
        F.col("m").alias("n_click"),
        (F.col("nn") - F.col("m")).alias("n_view"),
        F.col("t2").alias("t2_ab"),
        F.expr(
            "round(CASE WHEN nn % 2 = 0 THEN"
            " (t2 - m * (nn + 2) / 2.0)"
            " / sqrt(CAST(m AS DOUBLE) * (nn - m)"
            " * (4.0 * sd2 - CAST(nn AS DOUBLE) * (nn + 2) * (nn + 2))"
            " / (4.0 * nn * (nn - 1)))"
            " ELSE"
            " (t2 - m * (CAST(nn + 1 AS DOUBLE) * (nn + 1)) / (2.0 * nn))"
            " / sqrt(CAST(m AS DOUBLE) * (nn - m)"
            " * (4.0 * nn * sd2"
            " - (CAST(nn + 1 AS DOUBLE) * (nn + 1))"
            " * (CAST(nn + 1 AS DOUBLE) * (nn + 1)))"
            " / (4.0 * CAST(nn AS DOUBLE) * nn * (nn - 1)))"
            " END, 6)"
        ).alias("z_ab"),
    )


# ---------------------------------------------------------------------------
# F132 Allan variance of the daily event-count series (taus 1,2,4,8)
# ---------------------------------------------------------------------------
@register(
    "events_allan_variance_daily",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT x, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i
        FROM d
    ),
    taus AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS tau),
    blocks AS (
        SELECT tau,
               CAST(floor((i * 1.0) / tau) AS BIGINT) AS b,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS cnt
        FROM idx CROSS JOIN taus
        GROUP BY tau, CAST(floor((i * 1.0) / tau) AS BIGINT)
    ),
    full_b AS (
        SELECT tau, b, s,
               lead(s) OVER (PARTITION BY tau ORDER BY b) AS s_next,
               lead(cnt) OVER (PARTITION BY tau ORDER BY b) AS cnt_next,
               cnt
        FROM blocks
    ),
    diffs AS (
        SELECT tau,
               CAST(sum((s_next - s) * (s_next - s)) AS BIGINT) AS ssd,
               CAST(count(*) AS BIGINT) AS m_pairs
        FROM full_b
        WHERE cnt = tau AND cnt_next = tau
        GROUP BY tau
    )
    SELECT tau, m_pairs, ssd AS sum_sq_diff,
           round(CAST(ssd AS DOUBLE)
                 / (2.0 * tau * tau * m_pairs), 6) AS avar,
           round(sqrt(CAST(ssd AS DOUBLE)
                      / (2.0 * tau * tau * m_pairs)), 6) AS adev
    FROM diffs ORDER BY tau
    """,
    doc="F132 non-overlapping Allan variance of the daily event-count "
    "series at averaging windows tau = 1,2,4,8 days — the stability-"
    "vs-averaging-time diagnostic (clock/SRE heritage): white noise "
    "shows AVAR ~ 1/tau, a random-walk rate shows AVAR ~ tau, so the "
    "slope of adev(tau) identifies which regime a counter is in "
    "(F102/F121 only test lag-1 structure). AVAR(tau) = "
    "sum((S_(b+1)-S_b)^2) / (2 tau^2 (M-1)) over consecutive FULL "
    "tau-day block sums: block sums, their differences, and the "
    "squared-diff total are all EXACT BIGINTs (bound: tau*max_daily "
    "< ~3e9); the normalization is the single fp step. One day "
    "reduce, a 4-way bounded tau fanout, per-tau lead windows on the "
    "bounded block frame. One row per tau.",
)
def events_allan_variance_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("x"))
    idx = d.select(
        "x",
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("long")
        .alias("i"),
    )
    taus = d.sparkSession.range(0, 4).select(
        F.expr("CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT)").alias("tau")
    )
    blocks = (
        idx.crossJoin(F.broadcast(taus))
        .groupBy(
            "tau",
            F.expr("CAST(floor((i * 1.0) / tau) AS BIGINT)").alias("b"),
        )
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("tau").orderBy("b")
    full_b = blocks.select(
        "tau", "s", "cnt",
        F.lead("s").over(w).alias("s_next"),
        F.lead("cnt").over(w).alias("cnt_next"),
    )
    diffs = (
        full_b.filter(
            (F.col("cnt") == F.col("tau"))
            & (F.col("cnt_next") == F.col("tau"))
        )
        .groupBy("tau")
        .agg(
            F.sum(
                (F.col("s_next") - F.col("s"))
                * (F.col("s_next") - F.col("s"))
            ).alias("ssd"),
            F.count(F.lit(1)).alias("m_pairs"),
        )
    )
    return diffs.select(
        "tau",
        "m_pairs",
        F.col("ssd").alias("sum_sq_diff"),
        F.expr(
            "round(CAST(ssd AS DOUBLE) / (2.0 * tau * tau * m_pairs), 6)"
        ).alias("avar"),
        F.expr(
            "round(sqrt(CAST(ssd AS DOUBLE)"
            " / (2.0 * tau * tau * m_pairs)), 6)"
        ).alias("adev"),
    ).orderBy("tau")


# ---------------------------------------------------------------------------
# F133 Pettitt single-changepoint test (exact rank identity)
# ---------------------------------------------------------------------------
@register(
    "events_pettitt_changepoint",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT d,
               CAST(2 * rank() OVER (ORDER BY y)
                    + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS dr,
               CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    u AS (
        SELECT d, t, n,
               t * (n + 1)
               - CAST(sum(dr) OVER (ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS ut
        FROM r
    ),
    k AS (
        SELECT d, t, n, ut, abs(ut) AS aut,
               row_number() OVER (ORDER BY abs(ut) DESC, t) AS rk
        FROM u WHERE t < n
    )
    SELECT n AS n_days, aut AS k_stat, t AS t_star, d AS change_day,
           round(2 * exp(-6.0 * aut * aut
                         / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)),
                 6) AS p_approx
    FROM k WHERE rk = 1
    """,
    doc="F133 Pettitt nonparametric single-changepoint test on daily "
    "value-cents totals — the rank-based Mann-Whitney scan that finds "
    "WHERE a distribution shifted without assuming normality (the "
    "location complement to F108 binseg's mean-split and F94 CUSUM's "
    "parametric drift): U_t = sum_(i<=t, j>t) sgn(y_j - y_i) collapses "
    "by the midrank identity to t(n+1) - sum_(i<=t) 2r_i, so with "
    "DOUBLED midranks (F91/F120 device) every U_t is an EXACT BIGINT "
    "running sum; K = max|U_t| picks the change day (earliest on "
    "ties), and the classic approximation p ~ 2exp(-6K^2/(n^3+n^2)) "
    "is the single fp expression. Pre-reduces to the calendar-day "
    "frame. Single summary row.",
)
def events_pettitt_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w_all = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = daily.select(
        "d",
        (
            2 * F.rank().over(Window.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        )
        .cast("long")
        .alias("dr"),
        F.row_number().over(Window.orderBy("d")).cast("long").alias("t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    u = r.select(
        "d", "t", "n",
        (
            F.col("t") * (F.col("n") + 1)
            - F.sum("dr")
            .over(
                Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
            )
            .cast("long")
        ).alias("ut"),
    )
    k = u.filter(F.col("t") < F.col("n")).select(
        "d", "t", "n", F.abs("ut").alias("aut"),
        F.row_number()
        .over(Window.orderBy(F.abs("ut").desc(), "t"))
        .alias("rk"),
    )
    return k.filter(F.col("rk") == 1).select(
        F.col("n").alias("n_days"),
        F.col("aut").alias("k_stat"),
        F.col("t").alias("t_star"),
        F.col("d").alias("change_day"),
        F.expr(
            "round(2 * exp(-6.0 * aut * aut"
            " / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)), 6)"
        ).alias("p_approx"),
    )


# ---------------------------------------------------------------------------
# F134 KPSS level-stationarity test (Bartlett long-run variance)
# ---------------------------------------------------------------------------
@register(
    "events_kpss_stationarity",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
        FROM daily
    ),
    e AS (
        SELECT d, CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n AS e, n,
               CAST(floor(4.0 * sqrt(sqrt(n / 100.0))) AS BIGINT) AS l,
               row_number() OVER (ORDER BY d) AS i
        FROM daily CROSS JOIN g
    ),
    s AS (
        SELECT n, l, i,
               sum(e) OVER w AS st,
               sum(e * e) OVER w AS g0
        FROM e
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    num AS (
        SELECT n, l, g0,
               sum(st * st) OVER (ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ss2,
               row_number() OVER (ORDER BY i) AS rn
        FROM s
    ),
    numf AS (SELECT n, l, g0, ss2 FROM num WHERE rn = n),
    ks AS (SELECT CAST(range AS BIGINT) AS k FROM range(1, 32)),
    lag_p AS (
        SELECT a.n, a.l, b.k,
               sum(a.e * c.e) OVER (PARTITION BY b.k ORDER BY a.i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS gk,
               row_number() OVER (PARTITION BY b.k ORDER BY a.i) AS rn,
               count(*) OVER (PARTITION BY b.k) AS cnt
        FROM e a JOIN ks b ON b.k <= a.l JOIN e c ON c.i = a.i - b.k
    ),
    gks AS (
        SELECT n, l, k, gk FROM lag_p WHERE rn = cnt
    ),
    lrv AS (
        SELECT n, l,
               sum(2.0 * (1.0 - CAST(k AS DOUBLE) / (l + 1)) * gk)
                   OVER (ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS tail,
               row_number() OVER (ORDER BY k) AS rn,
               count(*) OVER () AS cnt
        FROM gks
    )
    SELECT numf.n AS n_days, numf.l AS lag_l,
           round((numf.ss2 / (CAST(numf.n AS DOUBLE) * numf.n))
                 / ((numf.g0 + lrv.tail) / numf.n), 6) AS eta_kpss
    FROM numf CROSS JOIN lrv WHERE lrv.rn = lrv.cnt
    """,
    doc="F134 KPSS test of level stationarity on daily value-cents "
    "totals — the NULL-reversed complement to F96 ADF (ADF's null is "
    "a unit root, KPSS's null is stationarity; agreeing verdicts from "
    "the pair are the textbook pre-modeling check): eta = "
    "n^-2 sum(S_t^2) / s^2(l), partial sums S_t of the demeaned "
    "series, long-run variance via Bartlett weights w_k = 1-k/(l+1) "
    "up to l = floor(4(n/100)^(1/4)) (computed as nested sqrt — the "
    "no-pow dialect rule). Autocovariance tails come from the F102 "
    "lag-fanout join; EVERY fp sum (S_t, S_t^2, gamma_k, the "
    "Bartlett tail) accumulates in DETERMINISTIC frame order, shared "
    "expression text throughout. Pre-reduces to the calendar-day "
    "frame; the fanout is days x l, corpus-size-invariant. Single "
    "summary row.",
)
def events_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    g = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    e = daily.crossJoin(F.broadcast(g)).select(
        "d",
        F.expr("CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n").alias("e"),
        "n",
        F.expr(
            "CAST(floor(4.0 * sqrt(sqrt(n / 100.0))) AS BIGINT)"
        ).alias("l"),
        F.row_number().over(Window.orderBy("d")).alias("i"),
    )
    w_d = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    s = e.select(
        "n", "l", "i",
        F.sum("e").over(w_d).alias("st"),
        F.sum(F.col("e") * F.col("e")).over(w_d).alias("g0"),
    )
    w_i = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    num = s.select(
        "n", "l", "g0",
        F.sum(F.col("st") * F.col("st")).over(w_i).alias("ss2"),
        F.row_number().over(Window.orderBy("i")).alias("rn"),
    )
    numf = num.filter(F.col("rn") == F.col("n")).select(
        "n", "l", "g0", "ss2"
    )
    ks = daily.sparkSession.range(1, 32).select(F.col("id").alias("k"))
    a = e.select("n", "l", "i", F.col("e").alias("ea"))
    c = e.select(F.col("i").alias("ic"), F.col("e").alias("ec"))
    w_k = Window.partitionBy("k").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_kp = Window.partitionBy("k")
    lag_p = (
        a.crossJoin(F.broadcast(ks))
        .filter(F.col("k") <= F.col("l"))
        .join(c, F.col("ic") == F.col("i") - F.col("k"))
        .select(
            "n", "l", "k", "i",
            F.sum(F.col("ea") * F.col("ec")).over(w_k).alias("gk"),
            F.row_number().over(
                Window.partitionBy("k").orderBy("i")
            ).alias("rn"),
            F.count(F.lit(1))
            .over(
                w_kp.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("cnt"),
        )
    )
    gks = lag_p.filter(F.col("rn") == F.col("cnt")).select(
        "n", "l", "k", "gk"
    )
    w_tail = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lrv = gks.select(
        F.sum(
            F.expr("2.0 * (1.0 - CAST(k AS DOUBLE) / (l + 1)) * gk")
        )
        .over(w_tail)
        .alias("tail"),
        F.row_number().over(Window.orderBy("k")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    ).filter(F.col("rn") == F.col("cnt")).select("tail")
    return numf.crossJoin(F.broadcast(lrv)).select(
        F.col("n").alias("n_days"),
        F.col("l").alias("lag_l"),
        F.expr(
            "round((ss2 / (CAST(n AS DOUBLE) * n))"
            " / ((g0 + tail) / n), 6)"
        ).alias("eta_kpss"),
    )


# ---------------------------------------------------------------------------
# F136 Bartels rank von-Neumann randomness test
# ---------------------------------------------------------------------------
@register(
    "events_bartels_rank_test",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    r AS (
        SELECT d,
               CAST(2 * rank() OVER (ORDER BY y)
                    + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS dr,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    l AS (
        SELECT dr, n, lead(dr) OVER (ORDER BY d) AS dr_next
        FROM r
    ),
    agg AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
               CAST(sum(CASE WHEN dr_next IS NULL THEN 0
                             ELSE (dr - dr_next) * (dr - dr_next) END)
                    AS BIGINT) AS num4,
               CAST(sum((dr - (n + 1)) * (dr - (n + 1))) AS BIGINT) AS den4
        FROM l
    )
    SELECT n AS n_days, num4, den4,
           round(CAST(num4 AS DOUBLE) / den4, 6) AS rvn,
           round((CAST(num4 AS DOUBLE) / den4 - 2.0)
                 / sqrt(4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9)
                        / (5.0 * n * (n + 1)
                           * (CAST(n - 1 AS DOUBLE) * (n - 1)))), 6)
               AS z_rvn
    FROM agg
    """,
    doc="F136 Bartels rank von-Neumann ratio test for randomness of the "
    "daily value-cents sequence: RVN = sum((r_t - r_(t+1))^2) / "
    "sum((r_t - rbar)^2) on TIME-ordered ranks — the rank analogue of "
    "F121 Durbin-Watson (~2 under randomness, ->0 under positive "
    "serial dependence, ->4 under alternation), more powerful than "
    "F101's binary runs test because it keeps rank magnitudes. With "
    "DOUBLED midranks both quadratic forms are EXACT BIGINTs (the "
    "doubled rank mean is exactly n+1 since sum(2r) = n(n+1), ties "
    "included), so RVN is one exact-integer division and z uses the "
    "Bartels (1982) variance 4(n-2)(5n^2-2n-9)/(5n(n+1)(n-1)^2) in "
    "one shared fp expression. Pre-reduces to the calendar-day frame. "
    "Single summary row.",
)
def events_bartels_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w_all = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = daily.select(
        "d",
        (
            2 * F.rank().over(Window.orderBy("y"))
            + F.count(F.lit(1)).over(Window.partitionBy("y"))
            - 1
        )
        .cast("long")
        .alias("dr"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    l = r.select(
        "dr", "n", F.lead("dr").over(Window.orderBy("d")).alias("dr_next")
    )
    agg = l.agg(
        F.max("n").alias("n"),
        F.sum(
            F.when(F.col("dr_next").isNull(), 0).otherwise(
                (F.col("dr") - F.col("dr_next"))
                * (F.col("dr") - F.col("dr_next"))
            )
        ).alias("num4"),
        F.sum(
            (F.col("dr") - (F.col("n") + 1))
            * (F.col("dr") - (F.col("n") + 1))
        ).alias("den4"),
    )
    return agg.select(
        F.col("n").alias("n_days"),
        "num4",
        "den4",
        F.expr("round(CAST(num4 AS DOUBLE) / den4, 6)").alias("rvn"),
        F.expr(
            "round((CAST(num4 AS DOUBLE) / den4 - 2.0)"
            " / sqrt(4.0 * (n - 2) * (5.0 * n * n - 2 * n - 9)"
            " / (5.0 * n * (n + 1)"
            " * (CAST(n - 1 AS DOUBLE) * (n - 1)))), 6)"
        ).alias("z_rvn"),
    )


# ---------------------------------------------------------------------------
# F137 Bayesian A/B: posterior probability of superiority
# ---------------------------------------------------------------------------
@register(
    "events_bayes_ab_superiority",
    f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 0 ELSE 1 END AS grp,
               CAST(max(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id
    ),
    k AS (
        SELECT CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
               CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb,
               CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT)
                   AS ka,
               CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT)
                   AS kb
        FROM u
    ),
    post AS (
        SELECT na, nb, ka, kb,
               (CAST(ka AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 1.0) AS ma,
               (CAST(kb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 1.0) AS mb,
               ((CAST(ka AS DOUBLE) + 0.5) * (CAST(na - ka AS DOUBLE) + 0.5))
                   / ((CAST(na AS DOUBLE) + 1.0) * (CAST(na AS DOUBLE) + 1.0) * (CAST(na AS DOUBLE) + 2.0)) AS va,
               ((CAST(kb AS DOUBLE) + 0.5) * (CAST(nb - kb AS DOUBLE) + 0.5))
                   / ((CAST(nb AS DOUBLE) + 1.0) * (CAST(nb AS DOUBLE) + 1.0) * (CAST(nb AS DOUBLE) + 2.0)) AS vb
        FROM k
    ),
    zed AS (
        SELECT na, nb, ka, kb, ma, mb,
               (mb - ma) / sqrt(va + vb) AS z
        FROM post
    )
    SELECT na AS n_users_a, nb AS n_users_b, ka AS conv_a, kb AS conv_b,
           round(ma, 6) AS post_mean_a, round(mb, 6) AS post_mean_b,
           round(z, 6) AS z_post,
           round(CASE WHEN z >= 0
                      THEN 1.0 - {{tail}} / 2.0
                      ELSE {{tail}} / 2.0 END, 6) AS p_b_beats_a
    FROM (SELECT *, abs(z) AS az,
                 1.0 / (1.0 + 0.2316419 * abs(z)) AS t
          FROM zed)
    """.format(tail=_PHI_TAIL),
    doc="F137 Bayesian A/B on per-user purchase conversion under the "
    "md5-split (same fair-coin hash family as K12/F129): Jeffreys "
    "Beta(k+1/2, n-k+1/2) posteriors per arm, normal approximation "
    "of the difference, and P(B beats A) = Phi(z) via the A&S "
    "26.2.17 tail polynomial (F129's portable normal CDF, signed-"
    "branch form) — the DECISION quantity stakeholders actually ask "
    "for, vs F84/F85's frequentist p-values (a direct probability "
    "statement about the lift, valid at any peek). Posterior moments "
    "are closed-form rationals of EXACT BIGINT counts: mean "
    "(k+1/2)/(n+1), variance ab/((a+b)^2(a+b+1)); one shared fp "
    "expression tree end-to-end. One user reduce + a 4-cell reduce; "
    "single summary row.",
)
def events_bayes_ab_superiority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("conv")
        )
        .select(
            F.expr(
                "CASE WHEN substring(md5(CAST(user_id AS STRING)), 1, 1)"
                " < '8' THEN 0 ELSE 1 END"
            ).alias("grp"),
            "conv",
        )
    )
    k = u.agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("grp") == 0, F.col("conv")).otherwise(0)).alias(
            "ka"
        ),
        F.sum(F.when(F.col("grp") == 1, F.col("conv")).otherwise(0)).alias(
            "kb"
        ),
    )
    post = k.select(
        "na", "nb", "ka", "kb",
        F.expr("(CAST(ka AS DOUBLE) + 0.5) / (CAST(na AS DOUBLE) + 1.0)").alias("ma"),
        F.expr("(CAST(kb AS DOUBLE) + 0.5) / (CAST(nb AS DOUBLE) + 1.0)").alias("mb"),
        F.expr(
            "((CAST(ka AS DOUBLE) + 0.5) * (CAST(na - ka AS DOUBLE) + 0.5))"
            " / ((CAST(na AS DOUBLE) + 1.0) * (CAST(na AS DOUBLE) + 1.0)"
            " * (CAST(na AS DOUBLE) + 2.0))"
        ).alias("va"),
        F.expr(
            "((CAST(kb AS DOUBLE) + 0.5) * (CAST(nb - kb AS DOUBLE) + 0.5))"
            " / ((CAST(nb AS DOUBLE) + 1.0) * (CAST(nb AS DOUBLE) + 1.0)"
            " * (CAST(nb AS DOUBLE) + 2.0))"
        ).alias("vb"),
    )
    zed = post.select(
        "na", "nb", "ka", "kb", "ma", "mb",
        F.expr("(mb - ma) / sqrt(va + vb)").alias("z"),
    ).withColumn("az", F.expr("abs(z)")).withColumn(
        "t", F.expr("1.0 / (1.0 + 0.2316419 * abs(z))")
    )
    return zed.select(
        F.col("na").alias("n_users_a"),
        F.col("nb").alias("n_users_b"),
        F.col("ka").alias("conv_a"),
        F.col("kb").alias("conv_b"),
        F.round("ma", 6).alias("post_mean_a"),
        F.round("mb", 6).alias("post_mean_b"),
        F.round("z", 6).alias("z_post"),
        F.expr(
            "round(CASE WHEN z >= 0"
            f" THEN 1.0 - {_PHI_TAIL} / 2.0"
            f" ELSE {_PHI_TAIL} / 2.0 END, 6)"
        ).alias("p_b_beats_a"),
    )


# ---------------------------------------------------------------------------
# F138 Buishand range test (rescaled cumulative-deviation range)
# ---------------------------------------------------------------------------
@register(
    "events_buishand_range",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS sy
        FROM daily
    ),
    s AS (
        SELECT d, n,
               n * CAST(sum(y) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT)
               - sy * CAST(row_number() OVER (ORDER BY d) AS BIGINT)
                   AS sk_n,
               row_number() OVER (ORDER BY d) AS k
        FROM daily CROSS JOIN g
    ),
    dev AS (
        SELECT max(n) AS n,
               CAST(max(sk_n) AS BIGINT) AS smax_n,
               CAST(min(sk_n) AS BIGINT) AS smin_n
        FROM s
    ),
    var_ AS (
        SELECT n,
               sum((CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n)
                   * (CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n))
                   OVER (ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ssq,
               row_number() OVER (ORDER BY d) AS rn
        FROM daily CROSS JOIN g
    ),
    sd AS (SELECT sqrt(ssq / n) AS s FROM var_ WHERE rn = n),
    loc AS (
        SELECT d AS change_day, abs(sk_n) AS a_n,
               row_number() OVER (ORDER BY abs(sk_n) DESC, d) AS rk
        FROM s WHERE k < n
    )
    SELECT dev.n AS n_days,
           round((CAST(smax_n AS DOUBLE) - smin_n)
                 / (dev.n * (SELECT s FROM sd))
                 / sqrt(CAST(dev.n AS DOUBLE)), 6) AS r_rescaled,
           (SELECT change_day FROM loc WHERE rk = 1) AS change_day
    FROM dev
    """,
    doc="F138 Buishand range test for homogeneity of the daily value-"
    "cents series — the parametric CUSUM-range complement to F133 "
    "Pettitt (same question, deviation magnitudes instead of ranks; "
    "the hydrology-standard pair): partial sums of deviations are "
    "held EXACTLY as n-scaled integers S*_k*n = n*cumsum(y) - k*sum(y) "
    "(no fp until the end; bound n*sum(y) < 2^63, ~daily cents x "
    "days^2 under 9e18 — the F121 bound), the range max-min is order-"
    "independent, the std uses one frame-ordered deviation sum, and "
    "R/(s*sqrt(n)) is the rescaled statistic (~1.0-1.5 under "
    "homogeneity, large under a level break). Also reports the "
    "argmax |S_k| day — the most likely break location. Pre-reduces "
    "to the calendar-day frame. Single summary row.",
)
def events_buishand_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    g = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    w_ord = Window.orderBy("d")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    s = daily.crossJoin(F.broadcast(g)).select(
        "d", "n",
        (
            F.col("n") * F.sum("y").over(w_cum).cast("long")
            - F.col("sy") * F.row_number().over(w_ord).cast("long")
        ).alias("sk_n"),
        F.row_number().over(w_ord).alias("k"),
    )
    dev = s.agg(
        F.max("n").alias("n"),
        F.max("sk_n").alias("smax_n"),
        F.min("sk_n").alias("smin_n"),
    )
    var_ = daily.crossJoin(F.broadcast(g)).select(
        "n",
        F.sum(
            F.expr(
                "(CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n)"
                " * (CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n)"
            )
        )
        .over(w_cum)
        .alias("ssq"),
        F.row_number().over(w_ord).alias("rn"),
    )
    sd = var_.filter(F.col("rn") == F.col("n")).select(
        F.expr("sqrt(ssq / n)").alias("s")
    )
    loc = (
        s.filter(F.col("k") < F.col("n"))
        .select(
            F.col("d").alias("change_day"),
            F.abs("sk_n").alias("a_n"),
            F.row_number()
            .over(Window.orderBy(F.abs("sk_n").desc(), "d"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select("change_day")
    )
    return (
        dev.crossJoin(F.broadcast(sd))
        .crossJoin(F.broadcast(loc))
        .select(
            F.col("n").alias("n_days"),
            F.expr(
                "round((CAST(smax_n AS DOUBLE) - smin_n) / (n * s)"
                " / sqrt(CAST(n AS DOUBLE)), 6)"
            ).alias("r_rescaled"),
            "change_day",
        )
    )


# ---------------------------------------------------------------------------
# F140 Tukey median polish (2 sweeps, lower medians, exact integers)
# ---------------------------------------------------------------------------
@register(
    "events_median_polish_effects",
    f"""
    WITH x AS (
        SELECT event_type AS t, CAST(date_trunc('day', ts) AS TIMESTAMP)
                   AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    r1m AS (
        SELECT d, v AS m FROM (
            SELECT d, v,
                   row_number() OVER (PARTITION BY d ORDER BY v, t) AS rn,
                   count(*) OVER (PARTITION BY d) AS c
            FROM x
        ) WHERE rn = CAST(floor((c + 1) / 2.0) AS BIGINT)
    ),
    v1 AS (
        SELECT x.t, x.d, CAST(x.v - r1m.m AS BIGINT) AS v
        FROM x JOIN r1m ON r1m.d = x.d
    ),
    c1m AS (
        SELECT t, v AS m FROM (
            SELECT t, v,
                   row_number() OVER (PARTITION BY t ORDER BY v, d) AS rn,
                   count(*) OVER (PARTITION BY t) AS c
            FROM v1
        ) WHERE rn = CAST(floor((c + 1) / 2.0) AS BIGINT)
    ),
    v2 AS (
        SELECT v1.t, v1.d, CAST(v1.v - c1m.m AS BIGINT) AS v
        FROM v1 JOIN c1m ON c1m.t = v1.t
    ),
    r2m AS (
        SELECT d, v AS m FROM (
            SELECT d, v,
                   row_number() OVER (PARTITION BY d ORDER BY v, t) AS rn,
                   count(*) OVER (PARTITION BY d) AS c
            FROM v2
        ) WHERE rn = CAST(floor((c + 1) / 2.0) AS BIGINT)
    ),
    v3 AS (
        SELECT v2.t, v2.d, CAST(v2.v - r2m.m AS BIGINT) AS v
        FROM v2 JOIN r2m ON r2m.d = v2.d
    ),
    c2m AS (
        SELECT t, v AS m FROM (
            SELECT t, v,
                   row_number() OVER (PARTITION BY t ORDER BY v, d) AS rn,
                   count(*) OVER (PARTITION BY t) AS c
            FROM v3
        ) WHERE rn = CAST(floor((c + 1) / 2.0) AS BIGINT)
    ),
    v4 AS (
        SELECT v3.t, v3.d, CAST(v3.v - c2m.m AS BIGINT) AS v
        FROM v3 JOIN c2m ON c2m.t = v3.t
    )
    SELECT v4.t AS event_type,
           CAST(c1m.m + c2m.m AS BIGINT) AS col_effect_cents,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(max(abs(v4.v)) AS BIGINT) AS max_abs_resid
    FROM v4 JOIN c1m ON c1m.t = v4.t JOIN c2m ON c2m.t = v4.t
    GROUP BY v4.t, c1m.m, c2m.m
    ORDER BY event_type
    """,
    doc="F140 Tukey median polish of the day x event-type value matrix, "
    "TWO full sweeps (row medians then column medians, twice) with "
    "exact-rank LOWER medians — the robust two-way decomposition "
    "(overall + day effect + type effect + residual) that F23's "
    "mean-based seasonal decomposition is not: a single outlier day "
    "cannot drag the effects. Every intermediate is an EXACT BIGINT "
    "(integer cents minus integer medians stays integer; the lower-"
    "median rank pick is the F119/F124 device), so both engines agree "
    "exactly with zero fp anywhere. Reports per-type total column "
    "effect and the max |residual| — the outlier-cell screen. Four "
    "bounded window+join rounds over the days x types frame.",
)
def events_median_polish_effects(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = (
        _events(spark, sf_dir)
        .groupBy(
            F.col("event_type").alias("t"),
            F.date_trunc("day", F.col("ts")).alias("d"),
        )
        .agg(F.sum(F.expr(_CENTS)).alias("v"))
    )

    # Each polish sweep subtracts the partition's lower median AS A WINDOW
    # EXPRESSION over the same exchange, instead of joining the frame with
    # a median-of-itself subframe. The join form doubled the lineage per
    # sweep (v_i referenced v_{i-1} twice), so four sweeps re-planned the
    # events scan+agg 16x — 154 Exchange nodes for a days x types frame.
    # Windowed, the lineage is a chain: one exchange per sweep, alternating
    # d/t. Arithmetic is identical (exact BIGINT; same rank pick, same
    # (v, tiebreak) order), pinned by the unchanged oracle.
    def polish(df, part, order_tb, keep=()):
        w_ord = Window.partitionBy(part).orderBy("v", order_tb)
        w_all = Window.partitionBy(part).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        ranked = df.withColumn("rn", F.row_number().over(w_ord)).withColumn(
            "c", F.count(F.lit(1)).over(w_all)
        )
        m = F.max(
            F.when(
                F.expr("rn = CAST(floor((c + 1) / 2.0) AS BIGINT)"),
                F.col("v"),
            )
        ).over(w_all)
        return ranked.select(
            "t",
            "d",
            *keep,
            (F.col("v") - m).cast("long").alias("v"),
            m.alias("_m"),
        )

    v1 = polish(x, "d", "t").drop("_m")
    v2 = polish(v1, "t", "d").withColumnRenamed("_m", "m1")
    v3 = polish(v2, "d", "t", keep=("m1",)).drop("_m")
    v4 = polish(v3, "t", "d", keep=("m1",)).withColumnRenamed("_m", "m2")
    return (
        v4.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.max(F.abs("v")).alias("max_abs_resid"),
            F.max("m1").alias("m1"),  # constant within t (per-t median)
            F.max("m2").alias("m2"),
        )
        .select(
            F.col("t").alias("event_type"),
            (F.col("m1") + F.col("m2")).cast("long").alias(
                "col_effect_cents"
            ),
            "n_days",
            F.col("max_abs_resid").cast("long").alias("max_abs_resid"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# F141 circular time-of-day statistics + Rayleigh uniformity test
# ---------------------------------------------------------------------------
import math as _math

_CIRC_COS = ", ".join(
    "%.17g" % _math.cos(2 * _math.pi * (h + 0.5) / 24) for h in range(24)
)
_CIRC_SIN = ", ".join(
    "%.17g" % _math.sin(2 * _math.pi * (h + 0.5) / 24) for h in range(24)
)


@register(
    "events_circular_daypart",
    f"""
    WITH h AS (
        SELECT event_type,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hh,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    trig AS (
        SELECT event_type, hh, c,
               ([{_CIRC_COS}]::DOUBLE[])[hh + 1] AS ch,
               ([{_CIRC_SIN}]::DOUBLE[])[hh + 1] AS sh
        FROM h
    ),
    acc AS (
        SELECT event_type,
               sum(c * ch) OVER w AS sc,
               sum(c * sh) OVER w AS ss,
               sum(c) OVER (PARTITION BY event_type) AS n,
               row_number() OVER (PARTITION BY event_type ORDER BY hh)
                   AS rn,
               count(*) OVER (PARTITION BY event_type) AS bins
        FROM trig
        WINDOW w AS (PARTITION BY event_type ORDER BY hh
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    peak AS (
        SELECT event_type, hh AS peak_hour,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, hh) AS pk
        FROM h
    )
    SELECT acc.event_type, CAST(n AS BIGINT) AS n_events,
           round(sqrt(sc * sc + ss * ss) / n, 6) AS rbar,
           round(n * ((sc * sc + ss * ss) / (CAST(n AS DOUBLE) * n)), 6)
               AS rayleigh_z,
           (SELECT peak_hour FROM peak
            WHERE peak.event_type = acc.event_type AND pk = 1)
               AS peak_hour
    FROM acc WHERE rn = bins ORDER BY event_type
    """,
    doc="F141 circular statistics of event time-of-day per type: the "
    "mean resultant length rbar = |sum e^(i theta)|/n and the "
    "Rayleigh uniformity test z = n*rbar^2 (z ~ Exp(1) under a "
    "uniform clock; large z = a real daily rush hour) — the CIRCULAR "
    "treatment the F-series dow/hour heatmap can't give (2300 and "
    "0100 are 2h apart on the clock, 22h apart linearly). Hours are "
    "binned to 24 cells with PRECOMPUTED bin-center cos/sin literal "
    "tables shared by both engines (no runtime trig — JVM and C libm "
    "sin/cos are not bit-identical, the pow lesson), so sums are "
    "exact-count x literal products accumulated in frame order. One "
    "contingency reduce + windows over the bounded 24 x types frame.",
)
def events_circular_daypart(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _events(spark, sf_dir).groupBy(
        "event_type",
        F.expr("CAST(EXTRACT(hour FROM ts) AS BIGINT)").alias("hh"),
    ).agg(F.count(F.lit(1)).alias("c"))
    trig = h.select(
        "event_type", "hh", "c",
        F.expr(
            f"CAST(array({_CIRC_COS}) AS array<double>)[CAST(hh AS INT)]"
        ).alias("ch"),
        F.expr(
            f"CAST(array({_CIRC_SIN}) AS array<double>)[CAST(hh AS INT)]"
        ).alias("sh"),
    )
    wp = Window.partitionBy("event_type")
    w_cum = wp.orderBy("hh").rowsBetween(Window.unboundedPreceding, 0)
    w_all = wp.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    acc = trig.select(
        "event_type",
        F.sum(F.col("c") * F.col("ch")).over(w_cum).alias("sc"),
        F.sum(F.col("c") * F.col("sh")).over(w_cum).alias("ss"),
        F.sum("c").over(w_all).alias("n"),
        F.row_number().over(wp.orderBy("hh")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("bins"),
    ).filter(F.col("rn") == F.col("bins"))
    peak = (
        h.select(
            F.col("event_type").alias("pt"),
            F.col("hh").alias("peak_hour"),
            F.row_number()
            .over(
                Window.partitionBy("event_type").orderBy(
                    F.col("c").desc(), "hh"
                )
            )
            .alias("pk"),
        )
        .filter(F.col("pk") == 1)
        .drop("pk")
    )
    return (
        acc.join(F.broadcast(peak), F.col("pt") == F.col("event_type"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.expr("round(sqrt(sc * sc + ss * ss) / n, 6)").alias("rbar"),
            F.expr(
                "round(n * ((sc * sc + ss * ss)"
                " / (CAST(n AS DOUBLE) * n)), 6)"
            ).alias("rayleigh_z"),
            "peak_hour",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# F142 Markov conditional entropy / predictability of event sequences
# ---------------------------------------------------------------------------
@register(
    "events_markov_entropy_rate",
    """
    WITH seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    m AS (
        SELECT cur, nxt, c,
               CAST(sum(c) OVER (PARTITION BY cur) AS BIGINT) AS rc,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM pairs
    ),
    hcond AS (
        SELECT n,
               sum(-(CAST(c AS DOUBLE) / n)
                   * ln(CAST(c AS DOUBLE) / rc)) OVER w AS h_cond,
               row_number() OVER (ORDER BY cur, nxt) AS rn,
               count(*) OVER () AS cells
        FROM m
        WINDOW w AS (ORDER BY cur, nxt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    hmarg AS (
        SELECT sum(-(CAST(rc AS DOUBLE) / n) * ln(CAST(rc AS DOUBLE) / n))
                   OVER (ORDER BY cur
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS h_marg,
               row_number() OVER (ORDER BY cur) AS rn,
               count(*) OVER () AS k
        FROM (SELECT cur, CAST(sum(c) AS BIGINT) AS rc,
                     CAST(sum(sum(c)) OVER () AS BIGINT) AS n
              FROM pairs GROUP BY cur)
    )
    SELECT (SELECT max(n) FROM m) AS n_transitions,
           round((SELECT h_cond FROM hcond WHERE rn = cells), 6)
               AS h_conditional,
           round((SELECT h_marg FROM hmarg WHERE rn = k), 6) AS h_marginal,
           round(1.0 - (SELECT h_cond FROM hcond WHERE rn = cells)
                       / (SELECT h_marg FROM hmarg WHERE rn = k), 6)
               AS predictability
    FROM (SELECT 1)
    """,
    doc="F142 entropy rate of the per-user event-type Markov chain: "
    "conditional entropy H(X_t | X_(t-1)) = -sum p(i,j) ln p(j|i) "
    "from the empirical transition counts, the marginal entropy "
    "H(X) of the source distribution, and the predictability index "
    "1 - H_cond/H_marg in [0,1] (0 = the next action is as random as "
    "the base rate; 1 = fully determined by the previous action) — "
    "the information-theoretic summary of the F-series transition "
    "matrix and the sequence-level companion to F128's MI. Counts "
    "are EXACT BIGINTs from one lag window + hash reduce; entropy "
    "sums accumulate in DETERMINISTIC frame order over the bounded "
    "k x k frame (F95/F128 device), shared ln/div text. Single "
    "summary row.",
)
def events_markov_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    seq = _events(spark, sf_dir).select(
        F.col("event_type").alias("cur"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("nxt"),
    )
    pairs = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_all = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    m = pairs.select(
        "cur", "nxt", "c",
        F.sum("c").over(W.partitionBy("cur")).alias("rc"),
        F.sum("c").over(w_all).alias("n"),
    )
    hcond = (
        m.select(
            "n",
            F.sum(
                F.expr(
                    "-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / rc)"
                )
            )
            .over(
                W.orderBy("cur", "nxt").rowsBetween(
                    W.unboundedPreceding, 0
                )
            )
            .alias("h_cond"),
            F.row_number().over(W.orderBy("cur", "nxt")).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("cells"),
        )
        .filter(F.col("rn") == F.col("cells"))
        .select("n", "h_cond")
    )
    marg = pairs.groupBy("cur").agg(F.sum("c").alias("rc"))
    marg = marg.select("cur", "rc", F.sum("rc").over(w_all).alias("n"))
    hmarg = (
        marg.select(
            F.sum(
                F.expr(
                    "-(CAST(rc AS DOUBLE) / n) * ln(CAST(rc AS DOUBLE) / n)"
                )
            )
            .over(W.orderBy("cur").rowsBetween(W.unboundedPreceding, 0))
            .alias("h_marg"),
            F.row_number().over(W.orderBy("cur")).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("k"),
        )
        .filter(F.col("rn") == F.col("k"))
        .select("h_marg")
    )
    return hcond.crossJoin(F.broadcast(hmarg)).select(
        F.col("n").alias("n_transitions"),
        F.round("h_cond", 6).alias("h_conditional"),
        F.round("h_marg", 6).alias("h_marginal"),
        F.expr("round(1.0 - h_cond / h_marg, 6)").alias("predictability"),
    )


# ---------------------------------------------------------------------------
# F143 activity h-index of the user base
# ---------------------------------------------------------------------------
@register(
    "users_activity_h_index",
    """
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT n, CAST(row_number() OVER (ORDER BY n DESC, user_id)
                       AS BIGINT) AS rk
        FROM u
    )
    SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_users,
           CAST(coalesce(max(CASE WHEN n >= rk THEN rk END), 0)
                AS BIGINT) AS h_index,
           CAST(coalesce(max(CASE WHEN n >= rk THEN rk END), 0)
                * coalesce(max(CASE WHEN n >= rk THEN rk END), 0)
                AS BIGINT) AS g_core_min_events
    FROM r
    """,
    doc="F143 h-index of the user base: the largest h such that h users "
    "each produced >= h events — the single-scalar engagement-"
    "concentration summary bibliometrics standardized (robust to both "
    "the long tail and superuser outliers, unlike mean or max), plus "
    "h^2 as the minimum event mass of that core. Pure EXACT-INTEGER "
    "rank scan: one user reduce, one rank window over the per-user "
    "AGGREGATE (RFM posture), a conditional max. Single summary row.",
)
def users_activity_h_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    r = u.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), "user_id"))
        .cast("long")
        .alias("rk"),
    )
    total = u.agg(F.count(F.lit(1)).alias("n_users"))
    h = r.agg(
        F.coalesce(
            F.max(F.when(F.col("n") >= F.col("rk"), F.col("rk"))),
            F.lit(0),
        )
        .cast("long")
        .alias("h_index")
    )
    return total.crossJoin(F.broadcast(h)).select(
        "n_users",
        "h_index",
        (F.col("h_index") * F.col("h_index"))
        .cast("long")
        .alias("g_core_min_events"),
    )


# ---------------------------------------------------------------------------
# F144 restricted mean survival time (area under the KM curve)
# ---------------------------------------------------------------------------
@register(
    "users_rmst_lifetime",
    """
    WITH bounds AS (
        SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS horizon
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_d,
               CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS last_d
        FROM events GROUP BY user_id
    ),
    lif AS (
        SELECT CAST(datediff('day', first_d, last_d) AS BIGINT) AS t,
               CASE WHEN datediff('day', last_d, horizon) > 0
                    THEN 1 ELSE 0 END AS died
        FROM u CROSS JOIN bounds
    ),
    per_t AS (
        SELECT t, CAST(sum(died) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM lif GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               CAST(sum(leaving) OVER (ORDER BY t DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_risk
        FROM per_t
    ),
    km AS (
        SELECT t, exp(sum(CASE WHEN d > 0
                        THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk)
                        ELSE 0.0 END)
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                   AS s,
               lead(t) OVER (ORDER BY t) AS t_next
        FROM risk
    ),
    area AS (
        SELECT sum(CASE WHEN t_next IS NULL THEN 0.0
                        ELSE s * (t_next - t) END)
                   OVER (ORDER BY t
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS tail_area,
               row_number() OVER (ORDER BY t) AS rn,
               count(*) OVER () AS cnt
        FROM km
    )
    SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_users,
           round((SELECT CAST(min(t) AS DOUBLE) FROM per_t)
                 + (SELECT tail_area FROM area WHERE rn = cnt), 6)
               AS rmst_days
    FROM (SELECT 1)
    """,
    doc="F144 restricted mean survival time over the F107 right-"
    "censored user-lifetime frame: the area under the Kaplan-Meier "
    "curve up to the last observed lifetime — 'expected active days "
    "per user within the window', the single-number effect scale "
    "regulators now prefer to hazard ratios (it needs no proportional-"
    "hazards assumption; pairs with F109's log-rank). Step-function "
    "area: S=1 on [0, t_min) contributes exactly t_min, then each "
    "interval adds S(t_i) x its exact integer width; fp sums frame-ordered "
    "(F95 device), KM factors in log space as in F107. One user "
    "reduce + ordered windows over the bounded lifetime frame. "
    "Single summary row.",
)
def users_rmst_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    bounds = ev.agg(F.date_trunc("day", F.max("ts")).alias("horizon"))
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_d"),
        F.date_trunc("day", F.max("ts")).alias("last_d"),
    )
    lif = u.crossJoin(F.broadcast(bounds)).select(
        F.expr("CAST(datediff(last_d, first_d) AS BIGINT)").alias("t"),
        F.expr(
            "CASE WHEN datediff(horizon, last_d) > 0 THEN 1 ELSE 0 END"
        ).alias("died"),
    )
    per_t = lif.groupBy("t").agg(
        F.sum("died").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_fwd = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.select(
        "t", "d", F.sum("leaving").over(w_rev).alias("n_risk")
    )
    km = risk.select(
        "t",
        F.exp(
            F.sum(
                F.when(
                    F.col("d") > 0,
                    F.log(
                        F.expr("CAST(n_risk - d AS DOUBLE)")
                        / F.col("n_risk")
                    ),
                ).otherwise(F.lit(0.0))
            ).over(w_fwd)
        ).alias("s"),
        F.lead("t").over(Window.orderBy("t")).alias("t_next"),
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    area = km.select(
        F.sum(
            F.when(F.col("t_next").isNull(), F.lit(0.0)).otherwise(
                F.col("s") * (F.col("t_next") - F.col("t"))
            )
        )
        .over(w_fwd)
        .alias("tail_area"),
        F.row_number().over(Window.orderBy("t")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    ).filter(F.col("rn") == F.col("cnt"))
    t_min = per_t.agg(
        F.expr("CAST(min(t) AS DOUBLE)").alias("t_min")
    )
    n_users = u.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        n_users.crossJoin(F.broadcast(area))
        .crossJoin(F.broadcast(t_min))
        .select(
            "n_users",
            F.round(F.col("t_min") + F.col("tail_area"), 6).alias(
                "rmst_days"
            ),
        )
    )


# ---------------------------------------------------------------------------
# F145 peaks-over-threshold GPD tail fit (method of moments)
# ---------------------------------------------------------------------------
@register(
    "events_gpd_tail_fit",
    f"""
    WITH x AS (SELECT {_CENTS} AS v FROM events),
    per_v AS (
        SELECT v, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY v
    ),
    cum AS (
        SELECT v, c,
               CAST(sum(c) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cm,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM per_v
    ),
    thr AS (
        SELECT min(v) AS u, max(n) AS n FROM cum
        WHERE cm >= CAST(ceil(n * 0.95) AS BIGINT)
    ),
    exc AS (
        SELECT CAST(v - u AS BIGINT) AS y FROM x CROSS JOIN thr
        WHERE v > u
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(y * y) AS BIGINT) AS syy,
               (SELECT u FROM thr) AS u,
               (SELECT n FROM thr) AS n
        FROM exc
    ),
    fit AS (
        SELECT k, u, n,
               CAST(sy AS DOUBLE) / k AS m,
               (syy - (CAST(sy AS DOUBLE) / k) * sy) / (k - 1) AS s2
        FROM mom
    )
    SELECT u AS threshold_cents, k AS n_exceedances,
           round(0.5 * (1.0 - m * m / s2), 6) AS xi,
           round(0.5 * m * (1.0 + m * m / s2), 6) AS sigma,
           round(CASE WHEN abs(0.5 * (1.0 - m * m / s2)) < 1e-9
                      THEN u + m * ln(CAST(k AS DOUBLE) / (n * 0.01))
                      ELSE u + (0.5 * m * (1.0 + m * m / s2))
                           / (0.5 * (1.0 - m * m / s2))
                           * (exp((0.5 * (1.0 - m * m / s2))
                                  * ln(CAST(k AS DOUBLE) / (n * 0.01)))
                              - 1.0) END, 4) AS level_1pct_cents
    FROM fit
    """,
    doc="F145 peaks-over-threshold extreme-value fit of event values: "
    "generalized Pareto distribution over exceedances of the exact-"
    "rank p95 threshold (F124 distinct-value pick), method-of-moments "
    "xi = (1 - m^2/s^2)/2 and sigma = m(1 + m^2/s^2)/2 from EXACT "
    "BIGINT exceedance power sums (bound: sum(y^2) < 2^63 while "
    "cents-above-threshold^2 x rows < 9e18 — noted), and the once-"
    "per-100-events return level u + sigma/xi((k/0.01n)^xi - 1) with "
    "the power as exp(xi ln .) — shared text, and the xi->0 "
    "exponential limit guarded. THE tail-risk complement to F103 "
    "VaR/CVaR: VaR reads the empirical tail, the GPD EXTRAPOLATES "
    "beyond it (Pickands-Balkema-de Haan). One distinct-value window "
    "+ one filtered reduce; single summary row.",
)
def events_gpd_tail_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = _events(spark, sf_dir).select(F.expr(_CENTS).alias("v"))
    from time_series_spark_spark.operators.rank import global_cumsum

    per_v = x.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    # near-unique distinct cents: running count via the range-
    # partitioned two-pass (operators/rank.py), total via broadcast
    tot = per_v.agg(F.sum("c").cast("long").alias("n"))
    cum = (
        global_cumsum(
            per_v.withColumn("cm", F.col("c")), [("v", True)], ["cm"]
        )
        .select("v", "cm")
        .crossJoin(F.broadcast(tot))
    )
    thr = cum.filter(
        F.expr("cm >= CAST(ceil(n * 0.95) AS BIGINT)")
    ).agg(F.min("v").alias("u"), F.max("n").alias("n"))
    exc = (
        x.crossJoin(F.broadcast(thr))
        .filter(F.col("v") > F.col("u"))
        .select((F.col("v") - F.col("u")).cast("long").alias("y"), "u", "n")
    )
    mom = exc.groupBy("u", "n").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    fit = mom.select(
        "k", "u", "n",
        F.expr("CAST(sy AS DOUBLE) / k").alias("m"),
        F.expr("(syy - (CAST(sy AS DOUBLE) / k) * sy) / (k - 1)").alias(
            "s2"
        ),
    )
    return fit.select(
        F.col("u").alias("threshold_cents"),
        F.col("k").alias("n_exceedances"),
        F.expr("round(0.5 * (1.0 - m * m / s2), 6)").alias("xi"),
        F.expr("round(0.5 * m * (1.0 + m * m / s2), 6)").alias("sigma"),
        F.expr(
            "round(CASE WHEN abs(0.5 * (1.0 - m * m / s2)) < 1e-9"
            " THEN u + m * ln(CAST(k AS DOUBLE) / (n * 0.01))"
            " ELSE u + (0.5 * m * (1.0 + m * m / s2))"
            " / (0.5 * (1.0 - m * m / s2))"
            " * (exp((0.5 * (1.0 - m * m / s2))"
            " * ln(CAST(k AS DOUBLE) / (n * 0.01)))"
            " - 1.0) END, 4)"
        ).alias("level_1pct_cents"),
    )


# ---------------------------------------------------------------------------
# F146 ratio-metric A/B test with delta-method variance
# ---------------------------------------------------------------------------
@register(
    "events_ratio_metric_ab",
    f"""
    WITH u AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 0 ELSE 1 END AS grp,
               CAST(sum({_CENTS}) AS BIGINT) AS y,
               CAST(count(*) AS BIGINT) AS m
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT grp,
               CAST(count(*) AS BIGINT) AS nu,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(m) AS BIGINT) AS sm,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(m * m) AS BIGINT) AS smm,
               CAST(sum(y * m) AS BIGINT) AS sym
        FROM u GROUP BY grp
    ),
    d AS (
        SELECT grp, nu, sy, sm,
               CAST(sy AS DOUBLE) / sm AS r,
               ((syy - (CAST(sy AS DOUBLE) / nu) * sy)
                - 2.0 * (CAST(sy AS DOUBLE) / sm)
                      * (sym - (CAST(sy AS DOUBLE) / nu) * sm)
                + (CAST(sy AS DOUBLE) / sm) * (CAST(sy AS DOUBLE) / sm)
                      * (smm - (CAST(sm AS DOUBLE) / nu) * sm))
               / (nu - 1)
               / ((CAST(sm AS DOUBLE) / nu) * (CAST(sm AS DOUBLE) / nu))
               / nu AS var_r
        FROM s
    )
    SELECT a.nu AS n_users_a, b.nu AS n_users_b,
           round(a.r, 6) AS value_per_event_a,
           round(b.r, 6) AS value_per_event_b,
           round((b.r - a.r) / sqrt(a.var_r + b.var_r), 6) AS z_delta
    FROM d a JOIN d b ON a.grp = 0 AND b.grp = 1
    """,
    doc="F146 A/B test on the RATIO metric value-per-event with the "
    "delta-method variance — the correct treatment of per-user "
    "clustering that a naive event-level t-test gets wrong (events "
    "within a user correlate; the unit of randomization is the USER): "
    "R = sum(Y)/sum(M) per arm, Var(R) ~ (S_YY - 2R S_YM + R^2 "
    "S_MM) / (n-1) / Mbar^2 / n from per-user EXACT BIGINT moment "
    "sums (bound: per-user cents^2 x users < 2^63 — noted; the "
    "md5 split is the F129/F137 fair coin). Completes the experiment "
    "toolkit: F85 Welch (means), F84 props, F97 CUPED, F137 Bayes, "
    "J14 SPRT — this one for ratios. Two hash aggs; single row.",
)
def events_ratio_metric_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(F.expr(_CENTS)).alias("y"),
            F.count(F.lit(1)).alias("m"),
        )
        .select(
            F.expr(
                "CASE WHEN substring(md5(CAST(user_id AS STRING)), 1, 1)"
                " < '8' THEN 0 ELSE 1 END"
            ).alias("grp"),
            "y",
            "m",
        )
    )
    s = u.groupBy("grp").agg(
        F.count(F.lit(1)).alias("nu"),
        F.sum("y").alias("sy"),
        F.sum("m").alias("sm"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
        F.sum(F.col("y") * F.col("m")).alias("sym"),
    )
    d = s.select(
        "grp", "nu",
        F.expr("CAST(sy AS DOUBLE) / sm").alias("r"),
        F.expr(
            "((syy - (CAST(sy AS DOUBLE) / nu) * sy)"
            " - 2.0 * (CAST(sy AS DOUBLE) / sm)"
            " * (sym - (CAST(sy AS DOUBLE) / nu) * sm)"
            " + (CAST(sy AS DOUBLE) / sm) * (CAST(sy AS DOUBLE) / sm)"
            " * (smm - (CAST(sm AS DOUBLE) / nu) * sm))"
            " / (nu - 1)"
            " / ((CAST(sm AS DOUBLE) / nu) * (CAST(sm AS DOUBLE) / nu))"
            " / nu"
        ).alias("var_r"),
    )
    a = d.filter(F.col("grp") == 0).select(
        F.col("nu").alias("n_users_a"),
        F.col("r").alias("ra"),
        F.col("var_r").alias("va"),
    )
    b = d.filter(F.col("grp") == 1).select(
        F.col("nu").alias("n_users_b"),
        F.col("r").alias("rb"),
        F.col("var_r").alias("vb"),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_users_a", "n_users_b",
        F.round("ra", 6).alias("value_per_event_a"),
        F.round("rb", 6).alias("value_per_event_b"),
        F.expr("round((rb - ra) / sqrt(va + vb), 6)").alias("z_delta"),
    )


# ---------------------------------------------------------------------------
# F148 session concurrency profile (sweep-line over session intervals)
# ---------------------------------------------------------------------------
@register(
    "events_session_concurrency",
    """
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) - 1 AS sid,
               ts
        FROM marked
    ),
    intervals AS (
        SELECT user_id, sid, min(ts) AS s, max(ts) AS e
        FROM sess GROUP BY user_id, sid
    ),
    pts AS (
        SELECT s AS t, CAST(1 AS BIGINT) AS delta FROM intervals
        UNION ALL
        SELECT e + INTERVAL 1 MICROSECOND, CAST(-1 AS BIGINT)
        FROM intervals
    ),
    curve AS (
        SELECT t,
               CAST(sum(sum(delta)) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS conc
        FROM pts GROUP BY t
    )
    SELECT CAST(date_trunc('hour', t) AS TIMESTAMP) AS h,
           CAST(max(conc) AS BIGINT) AS peak_concurrency
    FROM curve GROUP BY 1 ORDER BY h
    """,
    doc="F148 peak concurrent sessions per hour — the capacity-planning "
    "curve (how many 30-min-gap F5 sessions overlap at once): "
    "sessionize (same exact-microsecond gap rule as F5), collapse to "
    "(start, end) intervals, then the classic SWEEP-LINE — +1 at "
    "start, -1 just after end, running sum over the time-ordered "
    "event points = instantaneous concurrency, maxed per hour. All "
    "EXACT INTEGERS end to end (the +1us closing point keeps the "
    "interval end-inclusive without fp). The ordered sweep runs over "
    "the session-boundary frame (2 points per session, not per "
    "event); at 1000-executor scale the curve would be computed per "
    "time-bucket partition with carried offsets — noted. One "
    "session reduce + one ordered window; one row per active hour.",
)
def events_session_concurrency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.timeseries import sessionize

    sess = sessionize(_events(spark, sf_dir), "user_id", "ts", 1800)
    intervals = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    pts = intervals.select(
        F.col("s").alias("t"), F.lit(1).cast("long").alias("delta")
    ).unionAll(
        intervals.select(
            F.expr("e + INTERVAL 1 MICROSECOND").alias("t"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    curve = (
        pts.groupBy("t")
        .agg(F.sum("delta").alias("d"))
        .select(
            "t",
            F.sum("d")
            .over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .cast("long")
            .alias("conc"),
        )
    )
    return (
        curve.groupBy(F.date_trunc("hour", F.col("t")).alias("h"))
        .agg(F.max("conc").cast("long").alias("peak_concurrency"))
        .orderBy("h")
    )


# ---------------------------------------------------------------------------
# F149 partial correlation of daily type counts (controlling a third)
# ---------------------------------------------------------------------------
@register(
    "events_partial_corr_types",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS z
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(z) AS BIGINT) AS sz,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(z * z) AS BIGINT) AS szz,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * z) AS BIGINT) AS sxz,
               CAST(sum(y * z) AS BIGINT) AS syz
        FROM d
    ),
    r AS (
        SELECT n,
               (n * sxy - sx * sy)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * (n * syy - sy * sy)) AS rxy,
               (n * sxz - sx * sz)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * (n * szz - sz * sz)) AS rxz,
               (n * syz - sy * sz)
                   / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                          * (n * szz - sz * sz)) AS ryz
        FROM s
    )
    SELECT n AS n_days,
           round(rxy, 6) AS r_view_purchase,
           round(rxz, 6) AS r_view_click,
           round(ryz, 6) AS r_purchase_click,
           round((rxy - rxz * ryz)
                 / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
               AS partial_r
    FROM r
    """,
    doc="F149 partial correlation of daily view and purchase counts "
    "CONTROLLING for clicks — does the view-purchase association "
    "survive once the shared click driver is removed? (the classic "
    "confounder screen; F80's raw correlation matrix can't tell a "
    "direct link from a common cause): all three Pearson r's from "
    "EXACT BIGINT power sums (n*sxy - sx*sy etc., the F92 deviation "
    "device; bound n*sum(xy) < 2^63 noted), the partial r closed "
    "form is one shared fp expression. One day reduce + one 10-sum "
    "reduce; single summary row.",
)
def events_partial_corr_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "x"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "z"
        ),
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )
    r = s.select(
        "n",
        F.expr(
            "(n * sxy - sx * sy) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
            " * (n * syy - sy * sy))"
        ).alias("rxy"),
        F.expr(
            "(n * sxz - sx * sz) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
            " * (n * szz - sz * sz))"
        ).alias("rxz"),
        F.expr(
            "(n * syz - sy * sz) / sqrt(CAST(n * syy - sy * sy AS DOUBLE)"
            " * (n * szz - sz * sz))"
        ).alias("ryz"),
    )
    return r.select(
        F.col("n").alias("n_days"),
        F.round("rxy", 6).alias("r_view_purchase"),
        F.round("rxz", 6).alias("r_view_click"),
        F.round("ryz", 6).alias("r_purchase_click"),
        F.expr(
            "round((rxy - rxz * ryz)"
            " / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)"
        ).alias("partial_r"),
    )


# ---------------------------------------------------------------------------
# F150 odds ratio / relative risk 2x2 report (click -> purchase)
# ---------------------------------------------------------------------------
@register(
    "users_click_purchase_odds",
    """
    WITH u AS (
        SELECT user_id,
               CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS clicked,
               CAST(max(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS purchased
        FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT CAST(sum(clicked * purchased) AS BIGINT) AS a,
               CAST(sum(clicked * (1 - purchased)) AS BIGINT) AS b,
               CAST(sum((1 - clicked) * purchased) AS BIGINT) AS c,
               CAST(sum((1 - clicked) * (1 - purchased)) AS BIGINT) AS d
        FROM u
    )
    SELECT a AS n_click_buy, b AS n_click_nobuy,
           c AS n_noclick_buy, d AS n_noclick_nobuy,
           round(((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)) / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)), 6)
               AS odds_ratio,
           round(((CAST(a AS DOUBLE) + 0.5) / (CAST(a + b AS DOUBLE) + 1.0))
                 / ((CAST(c AS DOUBLE) + 0.5) / (CAST(c + d AS DOUBLE) + 1.0)), 6) AS relative_risk,
           round(ln(((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)) / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)))
                 - 1.959964 * sqrt(1.0/(CAST(a AS DOUBLE) + 0.5) + 1.0/(CAST(b AS DOUBLE) + 0.5)
                                   + 1.0/(CAST(c AS DOUBLE) + 0.5) + 1.0/(CAST(d AS DOUBLE) + 0.5)), 6)
               AS log_or_ci_lo,
           round(ln(((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)) / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)))
                 + 1.959964 * sqrt(1.0/(CAST(a AS DOUBLE) + 0.5) + 1.0/(CAST(b AS DOUBLE) + 0.5)
                                   + 1.0/(CAST(c AS DOUBLE) + 0.5) + 1.0/(CAST(d AS DOUBLE) + 0.5)), 6)
               AS log_or_ci_hi
    FROM cells
    """,
    doc="F150 epidemiology 2x2 for click -> purchase at the USER grain: "
    "odds ratio ad/bc, relative risk, and the Woolf 95% CI for "
    "ln(OR) (+-1.96 sqrt(1/a+1/b+1/c+1/d)) — the effect-size report "
    "behind every 'does X drive Y' question, complementing F92's "
    "chi-square (which only says WHETHER they associate, not how "
    "strongly, and is event-weighted rather than user-weighted). "
    "Cells are EXACT BIGINT user counts from one reduce; OR/RR/CI "
    "use the Haldane-Anscombe +0.5 continuity correction on every "
    "cell (the standard zero-cell treatment — the sf0.001 corpus "
    "really has an empty no-click-buy cell, and ANSI Spark would "
    "otherwise raise DIVIDE_BY_ZERO where DuckDB returns inf), with "
    "raw cells reported alongside. Two hash reduces; single row.",
)
def users_click_purchase_odds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        )
        .cast("long")
        .alias("clicked"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("purchased"),
    )
    cells = u.agg(
        F.sum(F.col("clicked") * F.col("purchased")).alias("a"),
        F.sum(F.col("clicked") * (1 - F.col("purchased"))).alias("b"),
        F.sum((1 - F.col("clicked")) * F.col("purchased")).alias("c"),
        F.sum((1 - F.col("clicked")) * (1 - F.col("purchased"))).alias(
            "d"
        ),
    )
    return cells.select(
        F.col("a").alias("n_click_buy"),
        F.col("b").alias("n_click_nobuy"),
        F.col("c").alias("n_noclick_buy"),
        F.col("d").alias("n_noclick_nobuy"),
        F.expr(
            "round(((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)) / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)), 6)"
        ).alias("odds_ratio"),
        F.expr(
            "round(((CAST(a AS DOUBLE) + 0.5) / (CAST(a + b AS DOUBLE) + 1.0))"
            " / ((CAST(c AS DOUBLE) + 0.5) / (CAST(c + d AS DOUBLE) + 1.0)), 6)"
        ).alias("relative_risk"),
        F.expr(
            "round(ln(((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)) / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)))"
            " - 1.959964 * sqrt(1.0/(CAST(a AS DOUBLE) + 0.5) + 1.0/(CAST(b AS DOUBLE) + 0.5)"
            " + 1.0/(CAST(c AS DOUBLE) + 0.5) + 1.0/(CAST(d AS DOUBLE) + 0.5)), 6)"
        ).alias("log_or_ci_lo"),
        F.expr(
            "round(ln(((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)) / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5)))"
            " + 1.959964 * sqrt(1.0/(CAST(a AS DOUBLE) + 0.5) + 1.0/(CAST(b AS DOUBLE) + 0.5)"
            " + 1.0/(CAST(c AS DOUBLE) + 0.5) + 1.0/(CAST(d AS DOUBLE) + 0.5)), 6)"
        ).alias("log_or_ci_hi"),
    )


# ---------------------------------------------------------------------------
# F151 intraclass correlation + design effect (user clustering)
# ---------------------------------------------------------------------------
@register(
    "events_icc_design_effect",
    f"""
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS ni,
               CAST(sum({_CENTS}) AS BIGINT) AS si,
               CAST(sum(CAST({_CENTS} AS DOUBLE) * {_CENTS}) AS DOUBLE)
                   AS qi
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(ni) AS BIGINT) AS n,
               CAST(sum(si) AS BIGINT) AS t
        FROM u
    ),
    ordered AS (
        SELECT u.*, tot.k, tot.n, tot.t,
               sum((CAST(si AS DOUBLE) / ni) * si)
                   OVER (ORDER BY user_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_sb,
               sum(qi) OVER (ORDER BY user_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_q,
               row_number() OVER (ORDER BY user_id) AS rn
        FROM u CROSS JOIN tot
    ),
    ms AS (
        SELECT k, n,
               (cum_sb - (CAST(t AS DOUBLE) / n) * t) / (k - 1) AS msb,
               (cum_q - cum_sb) / (n - k) AS msw,
               (CAST(n AS DOUBLE)
                - (SELECT sum(CAST(o2.ni AS DOUBLE) * o2.ni)
                   FROM u o2) / n) / (k - 1) AS n0
        FROM ordered WHERE rn = k
    )
    SELECT k AS n_users, n AS n_events,
           round((msb - msw) / (msb + (n0 - 1) * msw), 6) AS icc,
           round(1.0 + (CAST(n AS DOUBLE) / k - 1.0)
                       * ((msb - msw) / (msb + (n0 - 1) * msw)), 6)
               AS design_effect
    FROM ms
    """,
    doc="F151 one-way random-effects intraclass correlation of event "
    "values within users, and the Kish design effect DEFF = 1 + "
    "(mbar-1)*ICC — the number that says how much an event-level "
    "experiment analysis UNDERSTATES variance when randomization is "
    "per-user (the quantitative justification for F146's delta "
    "method; DEFF=3 means your effective sample is a third of your "
    "event count): ANOVA MSB/MSW from per-user exact integer sums "
    "(qi in DOUBLE — cents^2 sums overflow BIGINT at scale; per-user "
    "products are exact, cross-user accumulation is FRAME-ORDERED by "
    "user_id, the F95 device on the aggregate frame), unbalanced-"
    "design n0 correction included. One user reduce + one ordered "
    "window over the user aggregate (RFM posture). Single row.",
)
def events_icc_design_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum(F.expr(_CENTS)).alias("si"),
        F.sum(
            F.expr(f"CAST({_CENTS} AS DOUBLE) * {_CENTS}")
        ).alias("qi"),
    )
    tot = u.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("ni").alias("n"),
        F.sum("si").alias("t"),
    )
    sn2 = u.agg(
        F.sum(F.expr("CAST(ni AS DOUBLE) * ni")).alias("sn2")
    )
    w_cum = Window.orderBy("user_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ordered = u.crossJoin(F.broadcast(tot)).select(
        "k", "n", "t",
        F.sum(F.expr("(CAST(si AS DOUBLE) / ni) * si"))
        .over(w_cum)
        .alias("cum_sb"),
        F.sum("qi").over(w_cum).alias("cum_q"),
        F.row_number().over(Window.orderBy("user_id")).alias("rn"),
    )
    ms = (
        ordered.filter(F.col("rn") == F.col("k"))
        .crossJoin(F.broadcast(sn2))
        .select(
            "k", "n",
            F.expr(
                "(cum_sb - (CAST(t AS DOUBLE) / n) * t) / (k - 1)"
            ).alias("msb"),
            F.expr("(cum_q - cum_sb) / (n - k)").alias("msw"),
            F.expr(
                "(CAST(n AS DOUBLE) - sn2 / n) / (k - 1)"
            ).alias("n0"),
        )
    )
    return ms.select(
        F.col("k").alias("n_users"),
        F.col("n").alias("n_events"),
        F.expr(
            "round((msb - msw) / (msb + (n0 - 1) * msw), 6)"
        ).alias("icc"),
        F.expr(
            "round(1.0 + (CAST(n AS DOUBLE) / k - 1.0)"
            " * ((msb - msw) / (msb + (n0 - 1) * msw)), 6)"
        ).alias("design_effect"),
    )


# ---------------------------------------------------------------------------
# F152 distribution-free median CI (binomial order statistics)
# ---------------------------------------------------------------------------
@register(
    "events_median_ci_by_type",
    f"""
    WITH x AS (
        SELECT event_type AS g, {_CENTS} AS v, event_id FROM events
    ),
    r AS (
        SELECT g, v,
               row_number() OVER (PARTITION BY g ORDER BY v, event_id)
                   AS rk,
               CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
        FROM x
    ),
    bounds AS (
        SELECT g, n,
               CAST(floor((n + 1) / 2.0) AS BIGINT) AS med_rk,
               greatest(CAST(floor(n / 2.0 - 0.979982
                        * sqrt(n / 4.0)) AS BIGINT), 1) AS lo_rk,
               least(CAST(ceil(1.0 + n / 2.0 + 0.979982
                        * sqrt(n / 4.0)) AS BIGINT), n) AS hi_rk
        FROM (SELECT DISTINCT g, n FROM r)
    )
    SELECT b.g AS event_type, b.n AS n_events,
           max(CASE WHEN r.rk = b.med_rk THEN r.v END) AS median_cents,
           max(CASE WHEN r.rk = b.lo_rk THEN r.v END) AS ci95_lo_cents,
           max(CASE WHEN r.rk = b.hi_rk THEN r.v END) AS ci95_hi_cents
    FROM bounds b JOIN r ON r.g = b.g
                        AND r.rk IN (b.med_rk, b.lo_rk, b.hi_rk)
    GROUP BY b.g, b.n
    ORDER BY event_type
    """,
    doc="F152 distribution-free 95% confidence interval for the MEDIAN "
    "value per event type via binomial order statistics: the interval "
    "[X_(l), X_(u)] with l = floor(n/2 - z*sqrt(n/4)), u = ceil(1 + "
    "n/2 + z*sqrt(n/4)) covers the true median with ~95% probability "
    "for ANY continuous distribution (no normality, no bootstrap — "
    "the rank-pick CI every robust report should carry next to its "
    "point median; z = 2.24 here because rank CUTS are discrete... "
    "z = 0.979982*2 at the sqrt(n/4) scale is the standard 1.96). "
    "Ranks and picks are EXACT integers (F124 device); the only fp "
    "is the rank-cut formula itself, shared text. One rank window "
    "per group + a 3-rank filter join. One row per type.",
)
def events_median_ci_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = _events(spark, sf_dir).select(
        F.col("event_type").alias("g"),
        F.expr(_CENTS).alias("v"),
        "event_id",
    )
    from time_series_spark_spark.operators.rank import grouped_rank

    # per-type exact ranks via the grouped two-pass (operators/rank.py):
    # PARTITION BY event_type is ~5 tasks each holding a corpus-scale
    # slice — the grouped construction buckets by value instead
    r = grouped_rank(
        x, ["g"], [("v", True), ("event_id", True)], "rk", total_col="n"
    ).select("g", "v", "rk", "n")
    bounds = (
        r.select("g", "n")
        .distinct()
        .select(
            "g",
            F.expr("CAST(floor((n + 1) / 2.0) AS BIGINT)").alias("med_rk"),
            F.expr(
                "greatest(CAST(floor(n / 2.0 - 0.979982"
                " * sqrt(n / 4.0)) AS BIGINT), 1)"
            ).alias("lo_rk"),
            F.expr(
                "least(CAST(ceil(1.0 + n / 2.0 + 0.979982"
                " * sqrt(n / 4.0)) AS BIGINT), n)"
            ).alias("hi_rk"),
        )
    )
    joined = r.join(F.broadcast(bounds), "g").filter(
        (F.col("rk") == F.col("med_rk"))
        | (F.col("rk") == F.col("lo_rk"))
        | (F.col("rk") == F.col("hi_rk"))
    )
    return (
        joined.groupBy("g", "n")
        .agg(
            F.max(
                F.when(F.col("rk") == F.col("med_rk"), F.col("v"))
            ).alias("median_cents"),
            F.max(
                F.when(F.col("rk") == F.col("lo_rk"), F.col("v"))
            ).alias("ci95_lo_cents"),
            F.max(
                F.when(F.col("rk") == F.col("hi_rk"), F.col("v"))
            ).alias("ci95_hi_cents"),
        )
        .select(
            F.col("g").alias("event_type"),
            F.col("n").alias("n_events"),
            "median_cents", "ci95_lo_cents", "ci95_hi_cents",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# F153 rolling 30-day regression beta (purchases on views)
# ---------------------------------------------------------------------------
@register(
    "events_rolling_beta_daily",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    wnd AS (
        SELECT d, x, y,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(x) OVER w AS BIGINT) AS sx,
               CAST(sum(y) OVER w AS BIGINT) AS sy,
               CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
               CAST(sum(x * y) OVER w AS BIGINT) AS sxy
        FROM d
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT d, n AS n_days,
           round(CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                      ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                           / (n * sxx - sx * sx) END, 6) AS beta,
           round((CAST(sy AS DOUBLE)
                  - CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                         ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                              / (n * sxx - sx * sx) END * sx) / n, 6)
               AS alpha
    FROM wnd WHERE n >= 10 ORDER BY d
    """,
    doc="F153 rolling 30-day OLS regression of daily purchases on daily "
    "views: per day, the trailing-window slope beta (marginal "
    "purchases per additional view — the moving conversion "
    "elasticity) and intercept, from EXACT BIGINT window power sums "
    "(n*sxy - sx*sy etc., the F121/F149 deviation device inside a "
    "ROWS frame; degenerate windows — constant x — short-circuit to "
    "0); emitted once the window holds >= 10 days. The time-varying "
    "companion to F149's static correlation. One day reduce + one "
    "ordered window over the calendar frame. One row per day.",
)
def events_rolling_beta_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "x"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    w = Window.orderBy("d").rowsBetween(-29, 0)
    wnd = d.select(
        "d", "x", "y",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    return (
        wnd.filter(F.col("n") >= 10)
        .select(
            "d",
            F.col("n").alias("n_days"),
            F.expr(
                "round(CASE WHEN n * sxx - sx * sx = 0 THEN 0.0"
                " ELSE CAST(n * sxy - sx * sy AS DOUBLE)"
                " / (n * sxx - sx * sx) END, 6)"
            ).alias("beta"),
            F.expr(
                "round((CAST(sy AS DOUBLE)"
                " - CASE WHEN n * sxx - sx * sx = 0 THEN 0.0"
                " ELSE CAST(n * sxy - sx * sy AS DOUBLE)"
                " / (n * sxx - sx * sx) END * sx) / n, 6)"
            ).alias("alpha"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# F154 Hodges-Lehmann pseudomedian of daily totals
# ---------------------------------------------------------------------------
@register(
    "events_hodges_lehmann_daily",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT y, row_number() OVER (ORDER BY d) AS i FROM daily
    ),
    walsh AS (
        SELECT CAST(a.y + b.y AS BIGINT) AS w2
        FROM idx a JOIN idx b ON b.i >= a.i
    ),
    r AS (
        SELECT w2,
               row_number() OVER (ORDER BY w2) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM walsh
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           (SELECT m FROM r WHERE rk = 1) AS n_walsh,
           round((SELECT CAST(w2 AS DOUBLE) / 2.0 FROM r
                  WHERE rk = CAST(floor((m + 1) / 2.0) AS BIGINT)), 1)
               AS hl_cents
    FROM (SELECT 1)
    """,
    doc="F154 Hodges-Lehmann pseudomedian of daily value-cents totals — "
    "the location estimator dual to the Wilcoxon signed-rank test "
    "(median of all n(n+1)/2 pairwise Walsh averages (y_i+y_j)/2, "
    "i <= j): 29% breakdown like the median but ~96% Gaussian "
    "efficiency vs the median's 64% — the robust center a reporting "
    "layer should prefer to both mean and median. Walsh averages are "
    "held DOUBLED (y_i + y_j, exact BIGINTs) so the lower-median "
    "rank pick (F124 device) never touches fp; the single /2.0 is "
    "the output. Pair fanout is the day-frame squared (bounded by "
    "the calendar, never the corpus — same posture as F133 Pettitt). "
    "Single summary row.",
)
def events_hodges_lehmann_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    idx = daily.select(
        "y", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    a = idx.select(F.col("y").alias("ya"), F.col("i").alias("ia"))
    b = idx.select(F.col("y").alias("yb"), F.col("i").alias("ib"))
    walsh = a.join(b, F.col("ib") >= F.col("ia")).select(
        (F.col("ya") + F.col("yb")).cast("long").alias("w2")
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = walsh.select(
        "w2",
        F.row_number().over(Window.orderBy("w2")).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    hl = r.filter(
        F.expr("rk = CAST(floor((m + 1) / 2.0) AS BIGINT)")
    ).select(
        F.col("m").alias("n_walsh"),
        F.expr("round(CAST(w2 AS DOUBLE) / 2.0, 1)").alias("hl_cents"),
    )
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return n.crossJoin(F.broadcast(hl)).select(
        "n_days", "n_walsh", "hl_cents"
    )


# ---------------------------------------------------------------------------
# F155 Deming regression (errors in both variables, lambda = 1)
# ---------------------------------------------------------------------------
@register(
    "events_deming_view_click",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM d
    ),
    c AS (
        SELECT n,
               CAST(n * syy - sy * sy AS DOUBLE) AS dyy,
               CAST(n * sxx - sx * sx AS DOUBLE) AS dxx,
               CAST(n * sxy - sx * sy AS DOUBLE) AS dxy,
               CAST(sx AS DOUBLE) / n AS mx,
               CAST(sy AS DOUBLE) / n AS my
        FROM s
    )
    SELECT n AS n_days,
           round((dyy - dxx + sqrt((dyy - dxx) * (dyy - dxx)
                                   + 4.0 * dxy * dxy))
                 / (2.0 * dxy), 6) AS deming_slope,
           round(my - ((dyy - dxx + sqrt((dyy - dxx) * (dyy - dxx)
                                         + 4.0 * dxy * dxy))
                       / (2.0 * dxy)) * mx, 6) AS deming_intercept,
           round(dxy / dxx, 6) AS ols_slope
    FROM c
    """,
    doc="F155 Deming regression of daily clicks on daily views (equal "
    "error variances, lambda=1 — orthogonal regression): slope = "
    "(Syy - Sxx + sqrt((Syy-Sxx)^2 + 4Sxy^2)) / (2Sxy), the "
    "errors-in-BOTH-variables fit OLS cannot give (OLS attenuates "
    "the slope toward 0 when x is noisy — reported side by side so "
    "the attenuation is visible). All deviation moments are EXACT "
    "BIGINT n-scaled forms (n*sxy - sx*sy, the F149 device) cast "
    "once; slope/intercept are one shared sqrt/div expression. One "
    "day reduce + a 6-sum reduce; single summary row.",
)
def events_deming_view_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "x"
        ),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "y"
        ),
    )
    s = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    c = s.select(
        "n",
        F.expr("CAST(n * syy - sy * sy AS DOUBLE)").alias("dyy"),
        F.expr("CAST(n * sxx - sx * sx AS DOUBLE)").alias("dxx"),
        F.expr("CAST(n * sxy - sx * sy AS DOUBLE)").alias("dxy"),
        F.expr("CAST(sx AS DOUBLE) / n").alias("mx"),
        F.expr("CAST(sy AS DOUBLE) / n").alias("my"),
    )
    return c.select(
        F.col("n").alias("n_days"),
        F.expr(
            "round((dyy - dxx + sqrt((dyy - dxx) * (dyy - dxx)"
            " + 4.0 * dxy * dxy)) / (2.0 * dxy), 6)"
        ).alias("deming_slope"),
        F.expr(
            "round(my - ((dyy - dxx + sqrt((dyy - dxx) * (dyy - dxx)"
            " + 4.0 * dxy * dxy)) / (2.0 * dxy)) * mx, 6)"
        ).alias("deming_intercept"),
        F.expr("round(dxy / dxx, 6)").alias("ols_slope"),
    )


# ---------------------------------------------------------------------------
# F156 Hill tail-index estimator of user activity
# ---------------------------------------------------------------------------
@register(
    "users_hill_tail_index",
    """
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    r AS (
        SELECT n,
               row_number() OVER (ORDER BY n DESC, user_id) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS m
        FROM u
    ),
    kk AS (
        SELECT CAST(greatest(floor(max(m) / 10.0), 2) AS BIGINT) AS k,
               CAST(max(m) AS BIGINT) AS m
        FROM r
    ),
    thr AS (
        SELECT r.n AS xk1, kk.k, kk.m FROM r CROSS JOIN kk
        WHERE r.rk = kk.k + 1
    ),
    tail AS (
        SELECT t.k, t.m,
               sum(ln(CAST(r.n AS DOUBLE) / t.xk1))
                   OVER (ORDER BY r.rk
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s,
               row_number() OVER (ORDER BY r.rk) AS j
        FROM r CROSS JOIN thr t WHERE r.rk <= t.k
    )
    SELECT m AS n_users, k AS k_tail,
           round(CAST(k AS DOUBLE) / s, 6) AS hill_alpha,
           round(s / k, 6) AS mean_log_excess
    FROM tail WHERE j = k
    """,
    doc="F156 Hill estimator of the power-law tail index of user "
    "activity (events per user): alpha = k / sum(ln(x_(i)/x_(k+1))) "
    "over the top k = m/10 order statistics — the standard tail-"
    "heaviness gauge (alpha < 2: infinite variance, capacity planning "
    "must size for whales; complements F53 Zipf on words and F143's "
    "h-index with an actual exponent). Order statistics are EXACT "
    "integer rank picks on the per-user aggregate (RFM posture); the "
    "ln-excess sum accumulates in DETERMINISTIC rank order (F95 "
    "device). One user reduce + one rank window; single summary row.",
)
def users_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = u.select(
        "n",
        F.row_number()
        .over(Window.orderBy(F.col("n").desc(), "user_id"))
        .alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    kk = r.agg(
        F.expr("CAST(greatest(floor(max(m) / 10.0), 2) AS BIGINT)").alias(
            "k"
        ),
        F.max("m").alias("m"),
    )
    thr = (
        r.crossJoin(F.broadcast(kk.select("k")))
        .filter(F.col("rk") == F.col("k") + 1)
        .select(F.col("n").alias("xk1"), "k")
    )
    tail = (
        r.crossJoin(F.broadcast(thr))
        .filter(F.col("rk") <= F.col("k"))
        .select(
            "k", "m",
            F.sum(F.expr("ln(CAST(n AS DOUBLE) / xk1)"))
            .over(
                Window.orderBy("rk").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("s"),
            F.row_number().over(Window.orderBy("rk")).alias("j"),
        )
    )
    return tail.filter(F.col("j") == F.col("k")).select(
        F.col("m").alias("n_users"),
        F.col("k").alias("k_tail"),
        F.expr("round(CAST(k AS DOUBLE) / s, 6)").alias("hill_alpha"),
        F.expr("round(s / k, 6)").alias("mean_log_excess"),
    )


# ---------------------------------------------------------------------------
# F157 pairwise KS distance matrix across event types
# ---------------------------------------------------------------------------
@register(
    "events_pairwise_ks_matrix",
    f"""
    WITH x AS (
        SELECT event_type AS g, {_CENTS} AS v FROM events
    ),
    types AS (SELECT DISTINCT g FROM x),
    pairs AS (
        SELECT a.g AS ga, b.g AS gb FROM types a JOIN types b ON a.g < b.g
    ),
    tagged AS (
        SELECT p.ga, p.gb, x.v,
               CASE WHEN x.g = p.ga THEN 1 ELSE 0 END AS in_a
        FROM x JOIN pairs p ON x.g = p.ga OR x.g = p.gb
    ),
    per_v AS (
        SELECT ga, gb, v,
               CAST(sum(in_a) AS BIGINT) AS ca,
               CAST(sum(1 - in_a) AS BIGINT) AS cb
        FROM tagged GROUP BY ga, gb, v
    ),
    cum AS (
        SELECT ga, gb,
               CAST(sum(ca) OVER w AS BIGINT) AS fa,
               CAST(sum(cb) OVER w AS BIGINT) AS fb,
               CAST(sum(ca) OVER (PARTITION BY ga, gb) AS BIGINT) AS na,
               CAST(sum(cb) OVER (PARTITION BY ga, gb) AS BIGINT) AS nb
        FROM per_v
        WINDOW w AS (PARTITION BY ga, gb ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT ga AS type_a, gb AS type_b,
           CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
           CAST(max(abs(fa * nb - fb * na)) AS BIGINT) AS d_num,
           round(CAST(max(abs(fa * nb - fb * na)) AS DOUBLE)
                 / (CAST(max(na) AS DOUBLE) * max(nb)), 6) AS ks_d
    FROM cum GROUP BY ga, gb ORDER BY type_a, type_b
    """,
    doc="F157 pairwise two-sample Kolmogorov-Smirnov distance matrix "
    "across ALL event-type pairs — which types share a value "
    "distribution and which don't, in one pass (F90 does one pair; "
    "this is the k(k-1)/2 panel a segmentation review wants): per "
    "pair, D = max|F_a - F_b| is held as the EXACT INTEGER cross "
    "max|cum_a*n_b - cum_b*n_a| over the distinct-value frame (F90 "
    "device), divided once. The pair fanout multiplies the scan by "
    "k-1 (k = 5 types), bounded by the type count, and all windows "
    "run on (pair, distinct-value) frames. One row per type pair.",
)
def events_pairwise_ks_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = _events(spark, sf_dir).select(
        F.col("event_type").alias("g"), F.expr(_CENTS).alias("v")
    )
    types = x.select("g").distinct()
    a = types.select(F.col("g").alias("ga"))
    b = types.select(F.col("g").alias("gb"))
    pairs = a.join(b, F.col("ga") < F.col("gb"))
    tagged = x.join(
        F.broadcast(pairs),
        (F.col("g") == F.col("ga")) | (F.col("g") == F.col("gb")),
    ).select(
        "ga", "gb", "v",
        F.when(F.col("g") == F.col("ga"), 1).otherwise(0).alias("in_a"),
    )
    per_v = tagged.groupBy("ga", "gb", "v").agg(
        F.sum("in_a").alias("ca"),
        F.sum(F.lit(1) - F.col("in_a")).alias("cb"),
    )
    from time_series_spark_spark.operators.rank import grouped_cumsum

    # per-pair running counts via the grouped two-pass
    # (operators/rank.py) — a plain PARTITION BY (ga, gb) window is
    # k(k-1)/2 tasks each holding a corpus-scale distinct-value slice;
    # per-pair totals ride a bounded broadcast join
    tot = per_v.groupBy("ga", "gb").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    cum = (
        grouped_cumsum(
            per_v.withColumn("fa", F.col("ca")).withColumn(
                "fb", F.col("cb")
            ),
            ["ga", "gb"],
            [("v", True)],
            ["fa", "fb"],
        )
        .select("ga", "gb", "fa", "fb")
        .join(F.broadcast(tot), ["ga", "gb"])
    )
    return (
        cum.groupBy("ga", "gb")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            F.max(
                F.abs(F.col("fa") * F.col("nb") - F.col("fb") * F.col("na"))
            ).alias("d_num"),
        )
        .select(
            F.col("ga").alias("type_a"),
            F.col("gb").alias("type_b"),
            "n_a", "n_b", "d_num",
            F.expr(
                "round(CAST(d_num AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * n_b), 6)"
            ).alias("ks_d"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# F158 record-days test (running-max breaks vs harmonic expectation)
# ---------------------------------------------------------------------------
@register(
    "events_record_days_test",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    rec AS (
        SELECT d, y,
               CASE WHEN y > coalesce(max(y) OVER (ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -9223372036854775808)
                    THEN 1 ELSE 0 END AS is_rec,
               row_number() OVER (ORDER BY d) AS i,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    h AS (
        SELECT n,
               sum(1.0 / CAST(i AS DOUBLE)) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS hn,
               sum(1.0 / (CAST(i AS DOUBLE) * i)) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS h2n,
               row_number() OVER (ORDER BY i) AS rn
        FROM rec
    ),
    agg AS (
        SELECT CAST(sum(is_rec) AS BIGINT) AS n_rec,
               CAST(max(n) AS BIGINT) AS n
        FROM rec
    )
    SELECT agg.n AS n_days, n_rec AS n_records,
           round(h.hn, 6) AS expected_records,
           round((n_rec - h.hn) / sqrt(h.hn - h.h2n), 6) AS z_records
    FROM agg CROSS JOIN h WHERE h.rn = agg.n
    """,
    doc="F158 record-days test: how many days set a NEW all-time-high "
    "daily total, against the iid expectation H_n (under exchange-"
    "ability the i-th day is a record with probability exactly 1/i, "
    "so E = harmonic(n), Var = H_n - H2_n — a beautiful distribution-"
    "FREE trend detector: a trending series smashes records far "
    "above H_n ~ ln n, no ranks or moments needed; complements F100 "
    "Mann-Kendall with an interpretable count). Record flags are "
    "exact integer running-max comparisons; the harmonic sums "
    "accumulate in DETERMINISTIC frame order (F95 device). "
    "Pre-reduces to the calendar-day frame. Single summary row.",
)
def events_record_days_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w_prev = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rec = daily.select(
        "d", "y",
        F.when(
            F.col("y")
            > F.coalesce(
                F.max("y").over(w_prev), F.lit(-9223372036854775808)
            ),
            1,
        )
        .otherwise(0)
        .alias("is_rec"),
        F.row_number().over(Window.orderBy("d")).alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    w_cum = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    h = rec.select(
        F.sum(F.expr("1.0 / CAST(i AS DOUBLE)")).over(w_cum).alias("hn"),
        F.sum(F.expr("1.0 / (CAST(i AS DOUBLE) * i)"))
        .over(w_cum)
        .alias("h2n"),
        F.row_number().over(Window.orderBy("i")).alias("rn"),
    )
    agg = rec.agg(
        F.sum("is_rec").alias("n_rec"), F.max("n").alias("n")
    )
    return (
        agg.crossJoin(F.broadcast(h))
        .filter(F.col("rn") == F.col("n"))
        .select(
            F.col("n").alias("n_days"),
            F.col("n_rec").alias("n_records"),
            F.round("hn", 6).alias("expected_records"),
            F.expr(
                "round((n_rec - hn) / sqrt(hn - h2n), 6)"
            ).alias("z_records"),
        )
    )


# ---------------------------------------------------------------------------
# F159 turning-points randomness test
# ---------------------------------------------------------------------------
@register(
    "events_turning_points_test",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    tp AS (
        SELECT CASE WHEN (y > lag(y) OVER w AND y > lead(y) OVER w)
                      OR (y < lag(y) OVER w AND y < lead(y) OVER w)
                    THEN 1 ELSE 0 END AS is_tp,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily WINDOW w AS (ORDER BY d)
    )
    SELECT CAST(max(n) AS BIGINT) AS n_days,
           CAST(sum(is_tp) AS BIGINT) AS n_turning,
           round(2.0 * CAST(max(n) - 2 AS DOUBLE) / 3.0, 6) AS expected_tp,
           round((sum(is_tp) - 2.0 * CAST(max(n) - 2 AS DOUBLE) / 3.0)
                 / sqrt((16.0 * max(n) - 29.0) / 90.0), 6) AS z_tp
    FROM tp
    """,
    doc="F159 turning-points test (Bienayme): count strict local maxima "
    "+ minima in the daily total series; under iid exchangeability "
    "E = 2(n-2)/3 and Var = (16n-29)/90, so z flags BOTH too-smooth "
    "series (trend/AR: fewer turns, z < 0) and oscillatory ones "
    "(negative autocorrelation: more turns, z > 0) — the third "
    "classic randomness lens beside F101 runs (signs) and F136 "
    "Bartels (rank gradients). Turning flags are exact integer "
    "lag/lead comparisons; the moments are closed forms. Pre-reduces "
    "to the calendar-day frame. Single summary row.",
)
def events_turning_points_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w = Window.orderBy("d")
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tp = daily.select(
        F.when(
            (
                (F.col("y") > F.lag("y").over(w))
                & (F.col("y") > F.lead("y").over(w))
            )
            | (
                (F.col("y") < F.lag("y").over(w))
                & (F.col("y") < F.lead("y").over(w))
            ),
            1,
        )
        .otherwise(0)
        .alias("is_tp"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return tp.agg(
        F.max("n").alias("n_days"),
        F.sum("is_tp").alias("n_turning"),
        F.expr(
            "round(2.0 * CAST(max(n) - 2 AS DOUBLE) / 3.0, 6)"
        ).alias("expected_tp"),
        F.expr(
            "round((sum(is_tp) - 2.0 * CAST(max(n) - 2 AS DOUBLE) / 3.0)"
            " / sqrt((16.0 * max(n) - 29.0) / 90.0), 6)"
        ).alias("z_tp"),
    )


# ---------------------------------------------------------------------------
# F160 transition-latency matrix (mean dwell between type transitions)
# ---------------------------------------------------------------------------
@register(
    "events_transition_latency",
    """
    WITH seq AS (
        SELECT event_type AS src,
               lead(event_type) OVER w AS dst,
               CAST(epoch_us(lead(ts) OVER w) - epoch_us(ts) AS BIGINT)
                   AS gap_us
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT src, dst,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(gap_us) AS BIGINT) AS total_us,
           round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 4)
               AS mean_gap_sec,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM seq WHERE dst IS NOT NULL
    GROUP BY src, dst ORDER BY src, dst
    """,
    doc="F160 transition-LATENCY matrix: for every (from, to) event-"
    "type pair within a user's stream, the count, total, mean, and "
    "max inter-event time — the TIMING companion to the F29 "
    "transition-count matrix and F142's entropy (counts say WHERE "
    "users go next; this says HOW LONG they dwell before each hop — "
    "the view->purchase cell is the consideration time). Gaps are "
    "EXACT BIGINT microsecond diffs from one lag window; sums exact, "
    "one fp division per cell. One window + one k^2-cell reduce. "
    "One row per observed transition pair.",
)
def events_transition_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = _events(spark, sf_dir).select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        F.expr("CAST(unix_micros(ts) AS BIGINT)").alias("t0"),
        F.lead(F.expr("CAST(unix_micros(ts) AS BIGINT)")).over(w).alias(
            "t1"
        ),
    )
    return (
        seq.filter(F.col("dst").isNotNull())
        .select("src", "dst", (F.col("t1") - F.col("t0")).alias("gap_us"))
        .groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum("gap_us").alias("total_us"),
            F.expr(
                "round(CAST(sum(gap_us) AS DOUBLE) / count(*)"
                " / 1000000.0, 4)"
            ).alias("mean_gap_sec"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("src", "dst")
    )


# ---------------------------------------------------------------------------
# F161 weekly growth accounting (new / retained / resurrected / churned)
# ---------------------------------------------------------------------------
@register(
    "users_growth_accounting_weekly",
    """
    WITH presence AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
        FROM events
    ),
    firstw AS (
        SELECT user_id, min(w) AS fw FROM presence GROUP BY user_id
    ),
    flags AS (
        SELECT p.w, p.user_id,
               CASE WHEN p.w = f.fw THEN 1 ELSE 0 END AS is_new,
               CASE WHEN lag(p.w) OVER (PARTITION BY p.user_id ORDER BY p.w)
                         = p.w - INTERVAL 7 DAY
                    THEN 1 ELSE 0 END AS is_retained
        FROM presence p JOIN firstw f ON f.user_id = p.user_id
    ),
    active AS (
        SELECT w,
               CAST(count(*) AS BIGINT) AS active,
               CAST(sum(is_new) AS BIGINT) AS new_users,
               CAST(sum(is_retained) AS BIGINT) AS retained,
               CAST(sum(CASE WHEN is_new = 0 AND is_retained = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        FROM flags GROUP BY w
    ),
    churn AS (
        SELECT p.w + INTERVAL 7 DAY AS w, CAST(count(*) AS BIGINT) AS churned
        FROM presence p
        LEFT JOIN presence nx ON nx.user_id = p.user_id
                             AND nx.w = p.w + INTERVAL 7 DAY
        WHERE nx.user_id IS NULL
        GROUP BY p.w
    )
    SELECT a.w AS week, a.active, a.new_users, a.retained, a.resurrected,
           CAST(coalesce(c.churned, 0) AS BIGINT) AS churned_in,
           round(CASE WHEN lag(a.active) OVER (ORDER BY a.w) IS NULL
                      THEN NULL
                      ELSE CAST(a.retained AS DOUBLE)
                           / lag(a.active) OVER (ORDER BY a.w) END, 6)
               AS quick_ratio_retention
    FROM active a LEFT JOIN churn c ON c.w = a.w
    ORDER BY week
    """,
    doc="F161 weekly growth accounting — the MAU-accounting identity "
    "every growth team reports (Social Capital convention): per week, "
    "ACTIVE = NEW (first-ever week) + RETAINED (also present the "
    "prior week) + RESURRECTED (returned after a gap), plus CHURNED "
    "attributed to the week a user went missing; retained/active_prev "
    "is the week-over-week retention quick ratio. The identity "
    "active = new + retained + resurrected holds EXACTLY by "
    "construction (flags partition presence — pinned in pytest along "
    "with active_w - active_(w-1) = new + resurrected - churned). "
    "All exact integer set logic: one distinct reduce, one first-week "
    "reduce, a per-user lag window, an anti-join for churn. The "
    "F21-cohort-triangle complement at the TOTALS grain. One row "
    "per week.",
)
def users_growth_accounting_weekly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    presence = (
        _events(spark, sf_dir)
        .select(
            "user_id", F.date_trunc("week", F.col("ts")).alias("w")
        )
        .distinct()
    )
    firstw = presence.groupBy("user_id").agg(F.min("w").alias("fw"))
    flags = presence.join(firstw, "user_id").select(
        "w", "user_id",
        F.when(F.col("w") == F.col("fw"), 1).otherwise(0).alias("is_new"),
        F.when(
            F.lag("w").over(W.partitionBy("user_id").orderBy("w"))
            == F.expr("w - INTERVAL 7 DAY"),
            1,
        )
        .otherwise(0)
        .alias("is_retained"),
    )
    active = flags.groupBy("w").agg(
        F.count(F.lit(1)).alias("active"),
        F.sum("is_new").alias("new_users"),
        F.sum("is_retained").alias("retained"),
        F.sum(
            F.when(
                (F.col("is_new") == 0) & (F.col("is_retained") == 0), 1
            ).otherwise(0)
        ).alias("resurrected"),
    )
    nx = presence.select(
        F.col("user_id").alias("nu"), F.col("w").alias("nw")
    )
    churn = (
        presence.join(
            nx,
            (F.col("nu") == F.col("user_id"))
            & (F.col("nw") == F.expr("w + INTERVAL 7 DAY")),
            "left",
        )
        .filter(F.col("nu").isNull())
        .select(F.expr("w + INTERVAL 7 DAY").alias("cw"))
        .groupBy("cw")
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    out = active.join(churn, active.w == churn.cw, "left").select(
        F.col("w").alias("week"),
        "active", "new_users", "retained", "resurrected",
        F.coalesce(F.col("churned"), F.lit(0))
        .cast("long")
        .alias("churned_in"),
    )
    w_ord = W.orderBy("week")
    return out.select(
        "week", "active", "new_users", "retained", "resurrected",
        "churned_in",
        F.expr(
            "round(CASE WHEN lag(active) OVER (ORDER BY week) IS NULL"
            " THEN NULL ELSE CAST(retained AS DOUBLE)"
            " / lag(active) OVER (ORDER BY week) END, 6)"
        ).alias("quick_ratio_retention"),
    ).orderBy("week")


# ---------------------------------------------------------------------------
# F162 Haar wavelet multiresolution energy of the daily series
# ---------------------------------------------------------------------------
@register(
    "events_haar_energy_daily",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT y, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    lv AS (SELECT * FROM (VALUES (CAST(1 AS BIGINT), CAST(2 AS BIGINT),
                                  CAST(1 AS BIGINT)),
                                 (2, 4, 2), (3, 8, 4), (4, 16, 8),
                                 (5, 32, 16)) AS t(k, w, h)),
    blocks AS (
        SELECT k, w,
               CAST(floor(i / (w * 1.0)) AS BIGINT) AS j,
               CAST(sum(CASE WHEN i % w < h THEN y ELSE -y END)
                    AS BIGINT) AS det,
               CAST(count(*) AS BIGINT) AS cnt
        FROM idx CROSS JOIN lv
        GROUP BY k, w, CAST(floor(i / (w * 1.0)) AS BIGINT)
    ),
    en AS (
        SELECT k, w,
               CAST(count(*) AS BIGINT) AS n_blocks,
               CAST(sum(det * det) AS BIGINT) AS sum_d2
        FROM blocks WHERE cnt = w
        GROUP BY k, w
    ),
    tot AS (
        SELECT k, w, n_blocks, sum_d2,
               CAST(sum_d2 AS DOUBLE) / w AS energy,
               sum(CAST(sum_d2 AS DOUBLE) / w)
                   OVER (ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND UNBOUNDED FOLLOWING) AS total_e
        FROM en
    )
    SELECT k AS level, w AS scale_days, n_blocks, sum_d2,
           round(energy, 4) AS energy,
           round(energy / total_e, 6) AS energy_frac
    FROM tot ORDER BY level
    """,
    doc="F162 Haar wavelet multiresolution energy of daily value-cents "
    "totals, levels 1-5 (scales 2..32 days): the detail coefficient "
    "of each complete 2^k-day block is the EXACT INTEGER first-half "
    "minus second-half sum, its orthonormal energy d^2/2^k, and the "
    "per-level energy fraction says WHICH TIMESCALE the variance "
    "lives at (day-to-day noise vs weekly cycle vs monthly drift) — "
    "the orthogonal-decomposition companion to F132 Allan variance "
    "(Parseval on a dyadic planted series is pinned in pytest). "
    "Block sums are grouped integer reduces (no sequential pass); "
    "the 5-row fraction window is frame-ordered. Pre-reduces to the "
    "calendar-day frame. One row per level.",
)
def events_haar_energy_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w_all_rows = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        "y",
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("long")
        .alias("i"),
        F.count(F.lit(1)).over(w_all_rows).alias("n"),
    )
    lv = local_df(daily.sparkSession, 
        [(1, 2, 1), (2, 4, 2), (3, 8, 4), (4, 16, 8), (5, 32, 16)],
        "k long, w long, h long",
    )
    blocks = (
        idx.crossJoin(F.broadcast(lv))
        .groupBy(
            "k", "w",
            F.expr("CAST(floor(i / (w * 1.0)) AS BIGINT)").alias("j"),
        )
        .agg(
            F.sum(
                F.expr("CASE WHEN i % w < h THEN y ELSE -y END")
            ).alias("det"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    en = (
        blocks.filter(F.col("cnt") == F.col("w"))
        .groupBy("k", "w")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("det") * F.col("det")).alias("sum_d2"),
        )
    )
    w_ordered_all = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = en.select(
        "k", "w", "n_blocks", "sum_d2",
        F.expr("CAST(sum_d2 AS DOUBLE) / w").alias("energy"),
        F.sum(F.expr("CAST(sum_d2 AS DOUBLE) / w"))
        .over(w_ordered_all)
        .alias("total_e"),
    )
    return tot.select(
        F.col("k").alias("level"),
        F.col("w").alias("scale_days"),
        "n_blocks", "sum_d2",
        F.round("energy", 4).alias("energy"),
        F.expr("round(energy / total_e, 6)").alias("energy_frac"),
    ).orderBy("level")


# ---------------------------------------------------------------------------
# F164 top-mover users (largest activity-share shifts between halves)
# ---------------------------------------------------------------------------
@register(
    "users_top_movers",
    """
    WITH split AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(floor((datediff('day',
                        CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
                        CAST(date_trunc('day', max(ts)) AS TIMESTAMP))
                    + 1) / 2.0) AS BIGINT) AS half
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(sum(CASE WHEN datediff('day', d0,
                        CAST(date_trunc('day', ts) AS TIMESTAMP)) < half
                        THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN datediff('day', d0,
                        CAST(date_trunc('day', ts) AS TIMESTAMP)) < half
                        THEN 0 ELSE 1 END) AS BIGINT) AS n2
        FROM events CROSS JOIN split GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2
        FROM u
    ),
    delta AS (
        SELECT user_id, n1, n2,
               CAST(abs(n2 * t1 - n1 * t2) AS BIGINT) AS d_num,
               t1, t2,
               row_number() OVER (ORDER BY abs(n2 * t1 - n1 * t2) DESC,
                                  user_id) AS rk
        FROM u CROSS JOIN tot
    )
    SELECT CAST(rk AS BIGINT) AS rank, user_id, n1 AS n_first_half,
           n2 AS n_second_half,
           round(10000.0 * (CAST(n2 AS DOUBLE) / t2
                            - CAST(n1 AS DOUBLE) / t1), 4)
               AS share_shift_bp
    FROM delta WHERE rk <= 20 ORDER BY rank
    """,
    doc="F164 top-mover users: the 20 users whose SHARE of total "
    "activity shifted most between the first and second calendar "
    "halves — the entity-level drill-down behind every aggregate "
    "drift alarm (F90 says THAT the distribution moved; this says "
    "WHO moved it). Shift ranking uses the EXACT INTEGER cross "
    "|n2*t1 - n1*t2| (share comparison without fp — the F124 "
    "device), ties to user_id; the reported shift is one fp "
    "expression in basis points. One user reduce + one rank window "
    "over the user aggregate (top-k would swap to a broadcast "
    "heap at dimension scale — RFM posture). 20 rows.",
)
def users_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    split = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.expr(
            "CAST(floor((datediff(date_trunc('day', max(ts)),"
            " date_trunc('day', min(ts))) + 1) / 2.0) AS BIGINT)"
        ).alias("half"),
    )
    u = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN datediff(date_trunc('day', ts), d0) < half"
                    " THEN 1 ELSE 0 END"
                )
            ).alias("n1"),
            F.sum(
                F.expr(
                    "CASE WHEN datediff(date_trunc('day', ts), d0) < half"
                    " THEN 0 ELSE 1 END"
                )
            ).alias("n2"),
        )
    )
    tot = u.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    delta = u.crossJoin(F.broadcast(tot)).select(
        "user_id", "n1", "n2", "t1", "t2",
        F.row_number()
        .over(
            Window.orderBy(
                F.expr("abs(n2 * t1 - n1 * t2)").desc(), "user_id"
            )
        )
        .alias("rk"),
    )
    return (
        delta.filter(F.col("rk") <= 20)
        .select(
            F.col("rk").cast("long").alias("rank"),
            "user_id",
            F.col("n1").alias("n_first_half"),
            F.col("n2").alias("n_second_half"),
            F.expr(
                "round(10000.0 * (CAST(n2 AS DOUBLE) / t2"
                " - CAST(n1 AS DOUBLE) / t1), 4)"
            ).alias("share_shift_bp"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# F165 trend slope with Newey-West (HAC) standard error
# ---------------------------------------------------------------------------
@register(
    "events_trend_hac_inference",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT d, y,
               CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS t
        FROM daily
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(t) AS BIGINT) AS st,
               CAST(sum(t * t) AS BIGINT) AS st2,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(t * y) AS BIGINT) AS sty
        FROM idx
    ),
    e AS (
        SELECT d, t, n,
               CAST(floor(4.0 * sqrt(sqrt(n / 100.0))) AS BIGINT) AS l,
               (CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / n)
                   * (CAST(y AS DOUBLE)
                      - (CAST(sy AS DOUBLE)
                         - (CAST(n * sty - st * sy AS DOUBLE)
                            / (n * st2 - st * st)) * st) / n
                      - (CAST(n * sty - st * sy AS DOUBLE)
                         / (n * st2 - st * st)) * t) AS u,
               CAST(n * st2 - st * st AS DOUBLE) / n AS sxx,
               (CAST(n * sty - st * sy AS DOUBLE) / (n * st2 - st * st))
                   AS beta,
               row_number() OVER (ORDER BY d) AS i
        FROM idx CROSS JOIN s
    ),
    g0 AS (
        SELECT n, l, sxx, beta,
               sum(u * u) OVER (ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS s0,
               row_number() OVER (ORDER BY i) AS rn
        FROM e
    ),
    g0f AS (SELECT n, l, sxx, beta, s0 FROM g0 WHERE rn = n),
    ks AS (SELECT CAST(range AS BIGINT) AS j FROM range(1, 32)),
    lagp AS (
        SELECT a.n, b.j,
               sum(a.u * c.u) OVER (PARTITION BY b.j ORDER BY a.i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sj,
               row_number() OVER (PARTITION BY b.j ORDER BY a.i) AS rn,
               count(*) OVER (PARTITION BY b.j) AS cnt
        FROM e a JOIN ks b ON b.j <= a.l JOIN e c ON c.i = a.i - b.j
    ),
    tail AS (
        SELECT g0f.n, g0f.l, g0f.sxx, g0f.beta, g0f.s0,
               coalesce(sum(2.0 * (1.0 - CAST(lagp.j AS DOUBLE)
                                   / (g0f.l + 1)) * lagp.sj), 0.0) AS stail
        FROM g0f LEFT JOIN lagp ON lagp.rn = lagp.cnt
        GROUP BY g0f.n, g0f.l, g0f.sxx, g0f.beta, g0f.s0
    )
    SELECT n AS n_days, l AS hac_lags,
           round(beta, 6) AS slope_cents_per_day,
           round(sqrt(s0 + stail) / sxx, 6) AS hac_se,
           round(beta * sxx / sqrt(s0 + stail), 6) AS t_hac
    FROM tail
    """,
    doc="F165 OLS trend slope on daily value-cents with Newey-West "
    "(HAC, Bartlett kernel) standard errors — trend INFERENCE that "
    "stays honest under the serial correlation F121/F102 detect "
    "(naive OLS SEs are anti-conservative exactly when DW < 2): "
    "slope from exact integer sums (F121 device), residual score "
    "u_t = (t - tbar)*e_t, long-run variance (u_0 autocovariance + "
    "Bartlett tail to l = floor(4(n/100)^(1/4)), the F134 lag-fanout "
    "machinery), SE = sqrt(LRV/(n*Sxx^2/n^2))... assembled as "
    "sqrt((s0+tail)/(n*sxx^2)) with sxx = Sxx/n. Every fp sum "
    "frame-ordered. Single summary row.",
)
def events_trend_hac_inference(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    idx = daily.select(
        "d", "y",
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("long")
        .alias("t"),
    )
    s = idx.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum(F.col("t") * F.col("t")).alias("st2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
    )
    e = idx.crossJoin(F.broadcast(s)).select(
        "d",
        F.col("t"),
        "n",
        F.expr(
            "CAST(floor(4.0 * sqrt(sqrt(n / 100.0))) AS BIGINT)"
        ).alias("l"),
        F.expr(
            "(CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / n)"
            " * (CAST(y AS DOUBLE)"
            " - (CAST(sy AS DOUBLE)"
            " - (CAST(n * sty - st * sy AS DOUBLE)"
            " / (n * st2 - st * st)) * st) / n"
            " - (CAST(n * sty - st * sy AS DOUBLE)"
            " / (n * st2 - st * st)) * t)"
        ).alias("u"),
        F.expr("CAST(n * st2 - st * st AS DOUBLE) / n").alias("sxx"),
        F.expr(
            "(CAST(n * sty - st * sy AS DOUBLE) / (n * st2 - st * st))"
        ).alias("beta"),
        F.row_number().over(Window.orderBy("d")).alias("i"),
    )
    w_i = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    g0 = e.select(
        "n", "l", "sxx", "beta",
        F.sum(F.col("u") * F.col("u")).over(w_i).alias("s0"),
        F.row_number().over(Window.orderBy("i")).alias("rn"),
    )
    g0f = g0.filter(F.col("rn") == F.col("n")).select(
        "n", "l", "sxx", "beta", "s0"
    )
    ks = daily.sparkSession.range(1, 32).select(F.col("id").alias("j"))
    a = e.select("n", "l", "i", F.col("u").alias("ua"))
    c = e.select(F.col("i").alias("ic"), F.col("u").alias("uc"))
    w_j = Window.partitionBy("j").orderBy("i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lagp = (
        a.crossJoin(F.broadcast(ks))
        .filter(F.col("j") <= F.col("l"))
        .join(c, F.col("ic") == F.col("i") - F.col("j"))
        .select(
            "j", "i",
            F.sum(F.col("ua") * F.col("uc")).over(w_j).alias("sj"),
            F.row_number().over(
                Window.partitionBy("j").orderBy("i")
            ).alias("rn"),
            F.count(F.lit(1))
            .over(
                Window.partitionBy("j").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("cnt"),
        )
    )
    lasts = lagp.filter(F.col("rn") == F.col("cnt")).select("j", "sj")
    tail = g0f.crossJoin(F.broadcast(lasts)).groupBy(
        "n", "l", "sxx", "beta", "s0"
    ).agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "CASE WHEN j <= l THEN"
                    " 2.0 * (1.0 - CAST(j AS DOUBLE) / (l + 1)) * sj"
                    " ELSE 0.0 END"
                )
            ),
            F.lit(0.0),
        ).alias("stail")
    )
    return tail.select(
        F.col("n").alias("n_days"),
        F.col("l").alias("hac_lags"),
        F.round("beta", 6).alias("slope_cents_per_day"),
        F.expr("round(sqrt(s0 + stail) / sxx, 6)").alias("hac_se"),
        F.expr("round(beta * sxx / sqrt(s0 + stail), 6)").alias("t_hac"),
    )


# ---------------------------------------------------------------------------
# F166 QQ pairs between calendar halves (plot-ready drift diagnostics)
# ---------------------------------------------------------------------------
@register(
    "events_qq_halves",
    f"""
    WITH split AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(floor((datediff('day',
                        CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
                        CAST(date_trunc('day', max(ts)) AS TIMESTAMP))
                    + 1) / 2.0) AS BIGINT) AS half
        FROM events
    ),
    x AS (
        SELECT {_CENTS} AS v, event_id,
               CASE WHEN datediff('day', d0,
                        CAST(date_trunc('day', ts) AS TIMESTAMP)) < half
                    THEN 0 ELSE 1 END AS grp
        FROM events CROSS JOIN split
    ),
    r AS (
        SELECT grp, v,
               row_number() OVER (PARTITION BY grp ORDER BY v, event_id)
                   AS rk,
               CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
        FROM x
    ),
    qs AS (SELECT CAST(range AS BIGINT) AS q FROM range(1, 20)),
    picks AS (
        SELECT r.grp, qs.q, r.v
        FROM r JOIN qs
          ON r.rk = greatest(CAST(ceil(qs.q * r.n / 20.0) AS BIGINT), 1)
    )
    SELECT a.q AS vigintile,
           round(CAST(a.q AS DOUBLE) * 5.0, 1) AS pct,
           max(CASE WHEN a.grp = 0 THEN a.v END) AS q_first_cents,
           max(CASE WHEN a.grp = 1 THEN a.v END) AS q_second_cents,
           CAST(max(CASE WHEN a.grp = 1 THEN a.v END)
                - max(CASE WHEN a.grp = 0 THEN a.v END) AS BIGINT)
               AS shift_cents
    FROM picks a GROUP BY a.q ORDER BY vigintile
    """,
    doc="F166 QQ pairs between the first and second calendar halves at "
    "every vigintile (5%..95%) — the PLOT-READY drift diagnostic "
    "behind F90 KS / F117 CvM (the scalar tests say THAT the "
    "distribution moved; the QQ table says WHERE — tail-only vs "
    "uniform shift — which decides the remediation). Quantiles are "
    "NEAREST-RANK exact picks (ceil(q*n/20), the §5.1 integer-"
    "quantile rule) on exact cents, per-half rank windows, shift in "
    "exact integer cents. 19 rows.",
)
def events_qq_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    split = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.expr(
            "CAST(floor((datediff(date_trunc('day', max(ts)),"
            " date_trunc('day', min(ts))) + 1) / 2.0) AS BIGINT)"
        ).alias("half"),
    )
    x = ev.crossJoin(F.broadcast(split)).select(
        F.expr(_CENTS).alias("v"),
        "event_id",
        F.expr(
            "CASE WHEN datediff(date_trunc('day', ts), d0) < half"
            " THEN 0 ELSE 1 END"
        ).alias("grp"),
    )
    from time_series_spark_spark.operators.rank import grouped_rank

    # per-half exact ranks via the grouped two-pass (operators/rank.py):
    # a plain PARTITION BY grp window is TWO tasks each holding half
    # the corpus — the grouped construction buckets by value instead
    r = grouped_rank(
        x, ["grp"], [("v", True), ("event_id", True)], "rk", total_col="n"
    ).select("grp", "v", "rk", "n")
    qs = ev.sparkSession.range(1, 20).select(F.col("id").alias("q"))
    picks = r.join(
        F.broadcast(qs),
        F.col("rk")
        == F.expr("greatest(CAST(ceil(q * n / 20.0) AS BIGINT), 1)"),
    )
    return (
        picks.groupBy("q")
        .agg(
            F.max(F.when(F.col("grp") == 0, F.col("v"))).alias(
                "q_first_cents"
            ),
            F.max(F.when(F.col("grp") == 1, F.col("v"))).alias(
                "q_second_cents"
            ),
        )
        .select(
            F.col("q").alias("vigintile"),
            F.expr("round(CAST(q AS DOUBLE) * 5.0, 1)").alias("pct"),
            "q_first_cents",
            "q_second_cents",
            (F.col("q_second_cents") - F.col("q_first_cents"))
            .cast("long")
            .alias("shift_cents"),
        )
        .orderBy("vigintile")
    )


# ---------------------------------------------------------------------------
# F167 Hampel filter (rolling exact median +- 4.4478 MAD outlier flags)
# ---------------------------------------------------------------------------
@register(
    "events_hampel_outliers",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    wins AS (
        SELECT d, y,
               list_sort(list(y) OVER (ORDER BY d
                    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS w
        FROM daily
    ),
    med AS (
        SELECT d, y,
               CAST(w[CAST(floor((len(w) + 1) / 2.0) AS BIGINT)]
                    AS BIGINT) AS med,
               w
        FROM wins
    ),
    mad AS (
        SELECT d, y, med,
               CAST(list_sort(list_transform(w, x -> abs(x - med)))
                    [CAST(floor((len(w) + 1) / 2.0) AS BIGINT)]
                    AS BIGINT) AS mad
        FROM med
    )
    SELECT d, y AS y_cents, med AS med7_cents, mad AS mad7_cents,
           CASE WHEN CAST(abs(y - med) AS DOUBLE) > 4.4478 * mad
                THEN 1 ELSE 0 END AS is_outlier
    FROM mad ORDER BY d
    """,
    doc="F167 Hampel identifier on daily value-cents totals: a day is "
    "an outlier when it sits more than 3 robust sigmas (= 3 x 1.4826 "
    "= 4.4478 MADs) from the CENTERED 7-day rolling median — the "
    "despiking standard (a rolling MEAN filter drags toward the "
    "spike it should flag; median/MAD have 50% breakdown inside the "
    "window). The window's 7 values are collected in frame order, "
    "sorted, and the LOWER MEDIAN is an exact integer element pick "
    "(F124 rule; MAD the same over |y - med|) — no fp until the "
    "single threshold comparison, shared text. One bounded centered "
    "window over the calendar frame. One row per day with flags.",
)
def events_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    wins = daily.select(
        "d", "y",
        F.array_sort(F.collect_list("y").over(w)).alias("w"),
    )
    med = wins.select(
        "d", "y", "w",
        F.expr(
            "CAST(element_at(w, CAST(floor((size(w) + 1) / 2.0) AS INT))"
            " AS BIGINT)"
        ).alias("med"),
    )
    mad = med.select(
        "d", "y", "med",
        F.expr(
            "CAST(element_at(array_sort(transform(w, x -> abs(x - med))),"
            " CAST(floor((size(w) + 1) / 2.0) AS INT)) AS BIGINT)"
        ).alias("mad"),
    )
    return mad.select(
        "d",
        F.col("y").alias("y_cents"),
        F.col("med").alias("med7_cents"),
        F.col("mad").alias("mad7_cents"),
        F.expr(
            "CASE WHEN CAST(abs(y - med) AS DOUBLE) > 4.4478 * mad"
            " THEN 1 ELSE 0 END"
        ).alias("is_outlier"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# F168 activation latency: days from first to 10th event, quartiles
# ---------------------------------------------------------------------------
@register(
    "users_activation_latency",
    """
    WITH seq AS (
        SELECT user_id, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS k,
               min(ts) OVER (PARTITION BY user_id) AS first_ts
        FROM events
    ),
    lat AS (
        SELECT user_id,
               CAST(epoch_us(ts) - epoch_us(first_ts) AS BIGINT) AS us10
        FROM seq WHERE k = 10
    ),
    r AS (
        SELECT us10,
               row_number() OVER (ORDER BY us10, user_id) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM lat
    )
    SELECT (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
               AS n_users,
           (SELECT n FROM r WHERE rk = 1) AS n_activated,
           round((SELECT us10 FROM r
                  WHERE rk = greatest(CAST(ceil(n * 0.25) AS BIGINT), 1))
                 / CAST(86400000000 AS DOUBLE), 4) AS p25_days,
           round((SELECT us10 FROM r
                  WHERE rk = greatest(CAST(ceil(n * 0.50) AS BIGINT), 1))
                 / CAST(86400000000 AS DOUBLE), 4) AS p50_days,
           round((SELECT us10 FROM r
                  WHERE rk = greatest(CAST(ceil(n * 0.75) AS BIGINT), 1))
                 / CAST(86400000000 AS DOUBLE), 4) AS p75_days
    FROM (SELECT 1)
    """,
    doc="F168 activation latency: per user, the exact microsecond span "
    "from the first to the TENTH event (the 'reached habit' "
    "milestone), with nearest-rank quartiles across activated users "
    "— the onboarding-speed metric product teams pair with F161's "
    "growth accounting (how FAST users reach depth, not just whether "
    "they return). One rank window per user (exact integer "
    "microseconds), one global rank pick at each quartile (§5.1 "
    "nearest-rank rule), reported in fractional days. Single "
    "summary row.",
)
def users_activation_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    wu = W.partitionBy("user_id")
    seq = ev.select(
        "user_id", "ts",
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("k"),
        F.min("ts").over(wu).alias("first_ts"),
    )
    lat = seq.filter(F.col("k") == 10).select(
        "user_id",
        F.expr(
            "CAST(unix_micros(ts) - unix_micros(first_ts) AS BIGINT)"
        ).alias("us10"),
    )
    from time_series_spark_spark.operators.rank import global_rank

    # exact global quartile ranks over the activated-user frame via the
    # range-partitioned two-pass (users at 100 TB are billions — same
    # class as the RFM rewrite, no single-task window)
    r = global_rank(
        lat, [("us10", True), ("user_id", True)], "rk", total_col="n"
    ).select("us10", "rk", "n")

    def pick(p: str):
        return (
            r.filter(
                F.expr(
                    f"rk = greatest(CAST(ceil(n * {p}) AS BIGINT), 1)"
                )
            )
            .select("us10")
        )

    n_users = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    n_act = r.agg(F.max("n").alias("n_activated"))
    p25 = pick("0.25").select(F.col("us10").alias("u25"))
    p50 = pick("0.50").select(F.col("us10").alias("u50"))
    p75 = pick("0.75").select(F.col("us10").alias("u75"))
    return (
        n_users.crossJoin(F.broadcast(n_act))
        .crossJoin(F.broadcast(p25))
        .crossJoin(F.broadcast(p50))
        .crossJoin(F.broadcast(p75))
        .select(
            "n_users", "n_activated",
            F.expr("round(u25 / CAST(86400000000 AS DOUBLE), 4)").alias("p25_days"),
            F.expr("round(u50 / CAST(86400000000 AS DOUBLE), 4)").alias("p50_days"),
            F.expr("round(u75 / CAST(86400000000 AS DOUBLE), 4)").alias("p75_days"),
        )
    )


# ---------------------------------------------------------------------------
# F169 engagement aging curve (events per active user by tenure week)
# ---------------------------------------------------------------------------
@register(
    "users_tenure_activity_curve",
    """
    WITH f AS (
        SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP)
                   AS first_d
        FROM events GROUP BY user_id
    ),
    x AS (
        SELECT e.user_id,
               CAST(floor(datediff('day', f.first_d,
                        CAST(date_trunc('day', e.ts) AS TIMESTAMP))
                    / 7.0) AS BIGINT) AS tw
        FROM events e JOIN f ON f.user_id = e.user_id
    )
    SELECT tw AS tenure_week,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users,
           round(CAST(count(*) AS DOUBLE) / count(DISTINCT user_id), 4)
               AS events_per_active_user
    FROM x GROUP BY tw ORDER BY tenure_week
    """,
    doc="F169 engagement aging curve: events per ACTIVE user at each "
    "tenure week (weeks since the user's own first event) — the "
    "intensity companion to retention (F21 counts who comes back; "
    "this says how hard they use it as they age; a rising curve = "
    "habit formation, falling = novelty decay). Tenure weeks are "
    "exact integer floor(day-diff/7) against the per-user first day "
    "(one user reduce + broadcast-joinable dim); counts exact, one "
    "fp division per row. One row per tenure week.",
)
def users_tenure_activity_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    f = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_d")
    )
    x = ev.join(f, "user_id").select(
        "user_id",
        F.expr(
            "CAST(floor(datediff(date_trunc('day', ts), first_d)"
            " / 7.0) AS BIGINT)"
        ).alias("tw"),
    )
    return (
        x.groupBy("tw")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("long").alias(
                "n_active_users"
            ),
        )
        .select(
            F.col("tw").alias("tenure_week"),
            "n_events",
            "n_active_users",
            F.expr(
                "round(CAST(n_events AS DOUBLE) / n_active_users, 4)"
            ).alias("events_per_active_user"),
        )
        .orderBy("tenure_week")
    )


# ---------------------------------------------------------------------------
# F170 paired Wilcoxon signed-rank + sign test between calendar halves
# ---------------------------------------------------------------------------
@register(
    "events_wilcoxon_signed_rank",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT y, CAST(row_number() OVER (ORDER BY d) - 1 AS BIGINT) AS i,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM daily
    ),
    pairs AS (
        SELECT b.y - a.y AS diff
        FROM idx a JOIN idx b
          ON b.i = a.i + CAST(floor(a.n / 2.0) AS BIGINT)
        WHERE a.i < CAST(floor(a.n / 2.0) AS BIGINT)
    ),
    nz AS (
        SELECT diff, abs(diff) AS ad FROM pairs WHERE diff <> 0
    ),
    r AS (
        SELECT diff,
               CAST(2 * rank() OVER (ORDER BY ad)
                    + count(*) OVER (PARTITION BY ad) - 1 AS BIGINT)
                   AS dr,
               ad
        FROM nz
    ),
    ties AS (
        SELECT CAST(sum(t * t * t - t) AS BIGINT) AS t3t
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM nz GROUP BY ad)
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(CASE WHEN diff > 0 THEN dr ELSE 0 END)
                    AS BIGINT) AS w2,
               CAST(sum(CASE WHEN diff > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pos
        FROM r
    ),
    drops AS (
        SELECT CAST(count(*) AS BIGINT) AS n_zero FROM pairs
        WHERE diff = 0
    )
    SELECT m AS n_pairs, n_zero AS n_zero_dropped, w2 AS w2_plus, n_pos,
           round((w2 - CAST(m AS DOUBLE) * (m + 1) / 2.0)
                 / sqrt(CAST(m AS DOUBLE) * (m + 1) * (2 * m + 1) / 6.0
                        - CAST(t3t AS DOUBLE) / 12.0), 6) AS z_wilcoxon,
           round((n_pos - CAST(m AS DOUBLE) / 2.0)
                 / sqrt(CAST(m AS DOUBLE) / 4.0), 6) AS z_sign
    FROM agg CROSS JOIN ties CROSS JOIN drops
    """,
    doc="F170 paired Wilcoxon signed-rank AND sign tests: day k of the "
    "first calendar half paired with day k of the second (same "
    "position in the period, so weekday mix cancels), on the exact "
    "integer cents difference — the PAIRED location tests the "
    "unpaired F91 Mann-Whitney is not (pairing removes the shared "
    "day-position variance). Zero diffs drop (reported), |d| ranks "
    "are DOUBLED midranks so W2+ = 2W+ and the tie term sum(t^3-t) "
    "stay exact BIGINTs; z uses Var(W2) = m(m+1)(2m+1)/6 - T/12, and "
    "the sign test needs only the positive count. Day-frame join + "
    "distinct-|d| rank windows. Single summary row.",
)
def events_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    idx = daily.select(
        "y",
        (F.row_number().over(Window.orderBy("d")) - 1)
        .cast("long")
        .alias("i"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    a = idx.select(
        F.col("y").alias("ya"), F.col("i").alias("ia"), "n"
    )
    b = idx.select(F.col("y").alias("yb"), F.col("i").alias("ib"))
    pairs = a.join(
        b,
        F.col("ib")
        == F.col("ia") + F.expr("CAST(floor(n / 2.0) AS BIGINT)"),
    ).filter(
        F.col("ia") < F.expr("CAST(floor(n / 2.0) AS BIGINT)")
    ).select((F.col("yb") - F.col("ya")).alias("diff"))
    nz = pairs.filter(F.col("diff") != 0).select(
        "diff", F.abs("diff").alias("ad")
    )
    r = nz.select(
        "diff",
        (
            2 * F.rank().over(Window.orderBy("ad"))
            + F.count(F.lit(1)).over(Window.partitionBy("ad"))
            - 1
        )
        .cast("long")
        .alias("dr"),
    )
    ties = (
        nz.groupBy("ad")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("t3t")
        )
    )
    agg = r.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.when(F.col("diff") > 0, F.col("dr")).otherwise(0)).alias(
            "w2"
        ),
        F.sum(F.when(F.col("diff") > 0, 1).otherwise(0)).alias("n_pos"),
    )
    drops = pairs.filter(F.col("diff") == 0).agg(
        F.count(F.lit(1)).alias("n_zero")
    )
    return (
        agg.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(drops))
        .select(
            F.col("m").alias("n_pairs"),
            F.col("n_zero").alias("n_zero_dropped"),
            F.col("w2").alias("w2_plus"),
            "n_pos",
            F.expr(
                "round((w2 - CAST(m AS DOUBLE) * (m + 1) / 2.0)"
                " / sqrt(CAST(m AS DOUBLE) * (m + 1) * (2 * m + 1) / 6.0"
                " - CAST(t3t AS DOUBLE) / 12.0), 6)"
            ).alias("z_wilcoxon"),
            F.expr(
                "round((n_pos - CAST(m AS DOUBLE) / 2.0)"
                " / sqrt(CAST(m AS DOUBLE) / 4.0), 6)"
            ).alias("z_sign"),
        )
    )


# ---------------------------------------------------------------------------
# F171 stickiness panel: DAU / WAU / MAU ratios per day
# ---------------------------------------------------------------------------
@register(
    "users_stickiness_panel",
    """
    WITH pairs AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               user_id
        FROM events
    ),
    span AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
               CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
        FROM events
    ),
    days AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM span
    ),
    dau AS (
        SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM pairs GROUP BY d
    ),
    wau AS (
        SELECT days.d, CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM days JOIN pairs p
          ON p.d <= days.d AND p.d > days.d - INTERVAL 7 DAY
        GROUP BY days.d
    ),
    mau AS (
        SELECT days.d, CAST(count(DISTINCT p.user_id) AS BIGINT) AS mau
        FROM days JOIN pairs p
          ON p.d <= days.d AND p.d > days.d - INTERVAL 28 DAY
        GROUP BY days.d
    )
    SELECT mau.d AS d, coalesce(dau.dau, 0) AS dau,
           coalesce(wau.wau, 0) AS wau, mau.mau,
           round(CAST(coalesce(dau.dau, 0) AS DOUBLE) / mau.mau, 6)
               AS dau_mau,
           round(CAST(coalesce(wau.wau, 0) AS DOUBLE) / mau.mau, 6)
               AS wau_mau
    FROM mau LEFT JOIN dau ON dau.d = mau.d
             LEFT JOIN wau ON wau.d = mau.d
    ORDER BY d
    """,
    doc="F171 stickiness panel: exact DAU, trailing-7d WAU, trailing-"
    "28d MAU and the DAU/MAU + WAU/MAU ratios per day — the habit "
    "metric growth teams track daily (DAU/MAU ~ usage days per "
    "month/28). The trailing distinct counts use the F15 scale shape "
    "(dedupe to (day, user) FIRST, then each active day contributes "
    "to its n trailing window-ends via a bounded explode — never "
    "collect_set over a moving frame); the oracle mirrors with "
    "windowed distinct joins. All counts exact; two fp ratios per "
    "row. One row per observed day.",
)
def users_stickiness_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.timeseries import (
        trailing_distinct,
    )

    ev = _events(spark, sf_dir)
    dau = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("d"), "user_id"
        )
        .distinct()
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("dau"))
    )
    wau = trailing_distinct(ev, "ts", "user_id", n_days=7).select(
        F.col("d").alias("dw"), F.col("users_7d").alias("wau")
    )
    mau = trailing_distinct(ev, "ts", "user_id", n_days=28).select(
        F.col("d").alias("dm"), F.col("users_28d").alias("mau")
    )
    return (
        mau.join(dau, F.col("dm") == F.col("d"), "left")
        .join(wau, F.col("dm") == F.col("dw"), "left")
        .select(
            F.col("dm").alias("d"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.coalesce(F.col("wau"), F.lit(0)).cast("long").alias("wau"),
            F.col("mau").cast("long").alias("mau"),
            F.expr(
                "round(CAST(coalesce(dau, 0) AS DOUBLE) / mau, 6)"
            ).alias("dau_mau"),
            F.expr(
                "round(CAST(coalesce(wau, 0) AS DOUBLE) / mau, 6)"
            ).alias("wau_mau"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# F172 customer spend-quartile migration matrix between halves
# ---------------------------------------------------------------------------
@register(
    "users_spend_migration_matrix",
    f"""
    WITH split AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(floor((datediff('day',
                        CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
                        CAST(date_trunc('day', max(ts)) AS TIMESTAMP))
                    + 1) / 2.0) AS BIGINT) AS half
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                         AND datediff('day', d0,
                             CAST(date_trunc('day', ts) AS TIMESTAMP))
                             < half
                        THEN {_CENTS} ELSE 0 END) AS BIGINT) AS s1,
               CAST(sum(CASE WHEN event_type = 'purchase'
                         AND datediff('day', d0,
                             CAST(date_trunc('day', ts) AS TIMESTAMP))
                             >= half
                        THEN {_CENTS} ELSE 0 END) AS BIGINT) AS s2
        FROM events CROSS JOIN split GROUP BY user_id
    ),
    q1 AS (
        SELECT user_id,
               CASE WHEN s1 = 0 THEN 0
                    ELSE CAST(ceil(4.0 * CAST(row_number() OVER (
                             PARTITION BY CASE WHEN s1 > 0 THEN 1 END
                             ORDER BY s1, user_id) AS DOUBLE)
                         / sum(CASE WHEN s1 > 0 THEN 1 ELSE 0 END)
                               OVER ()) AS BIGINT) END AS qa
        FROM u
    ),
    q2 AS (
        SELECT user_id,
               CASE WHEN s2 = 0 THEN 0
                    ELSE CAST(ceil(4.0 * CAST(row_number() OVER (
                             PARTITION BY CASE WHEN s2 > 0 THEN 1 END
                             ORDER BY s2, user_id) AS DOUBLE)
                         / sum(CASE WHEN s2 > 0 THEN 1 ELSE 0 END)
                               OVER ()) AS BIGINT) END AS qb
        FROM u
    )
    SELECT q1.qa AS quartile_first, q2.qb AS quartile_second,
           CAST(count(*) AS BIGINT) AS n_users
    FROM q1 JOIN q2 ON q2.user_id = q1.user_id
    GROUP BY q1.qa, q2.qb
    ORDER BY quartile_first, quartile_second
    """,
    doc="F172 customer spend-quartile migration matrix: each user's "
    "purchase spend is bucketed into quartiles (0 = no spend, 1..4 = "
    "exact-rank quartile among that half's spenders) in the first "
    "and second calendar halves, and the matrix counts who moved "
    "where — the CRM segment-migration report behind churn/upsell "
    "programs (the cell (4,0) is lost whales; (0,4) is new whales). "
    "Quartiles are ceil(4*rank/n) EXACT integer rank buckets "
    "(user_id tiebreak; the zero class is carved out first so the "
    "positive ranks are dense), counts exact. One user reduce + two "
    "rank windows over the user aggregate. One row per occupied "
    "cell.",
)
def users_spend_migration_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    split = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.expr(
            "CAST(floor((datediff(date_trunc('day', max(ts)),"
            " date_trunc('day', min(ts))) + 1) / 2.0) AS BIGINT)"
        ).alias("half"),
    )
    u = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN event_type = 'purchase'"
                    " AND datediff(date_trunc('day', ts), d0) < half"
                    f" THEN {_CENTS} ELSE 0 END"
                )
            ).alias("s1"),
            F.sum(
                F.expr(
                    "CASE WHEN event_type = 'purchase'"
                    " AND datediff(date_trunc('day', ts), d0) >= half"
                    f" THEN {_CENTS} ELSE 0 END"
                )
            ).alias("s2"),
        )
    )

    def quart(col, out):
        pos = Window.partitionBy(
            F.when(F.col(col) > 0, 1)
        ).orderBy(col, "user_id")
        n_pos = Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return u.select(
            "user_id",
            F.when(F.col(col) == 0, F.lit(0))
            .otherwise(
                F.expr(
                    f"CAST(ceil(4.0 * _rn / _np) AS BIGINT)"
                )
            )
            .alias(out),
        )

    # assemble with explicit helper columns (window exprs can't nest in
    # the CASE cleanly across engines otherwise)
    n_pos1 = u.agg(
        F.sum(F.when(F.col("s1") > 0, 1).otherwise(0)).alias("np1"),
        F.sum(F.when(F.col("s2") > 0, 1).otherwise(0)).alias("np2"),
    )
    w1 = Window.partitionBy(
        F.when(F.col("s1") > 0, 1)
    ).orderBy("s1", "user_id")
    w2 = Window.partitionBy(
        F.when(F.col("s2") > 0, 1)
    ).orderBy("s2", "user_id")
    ranked = (
        u.crossJoin(F.broadcast(n_pos1))
        .withColumn("r1", F.row_number().over(w1))
        .withColumn("r2", F.row_number().over(w2))
        .select(
            "user_id",
            F.when(F.col("s1") == 0, F.lit(0))
            .otherwise(
                F.expr("CAST(ceil(4.0 * CAST(r1 AS DOUBLE) / np1) AS BIGINT)")
            )
            .alias("quartile_first"),
            F.when(F.col("s2") == 0, F.lit(0))
            .otherwise(
                F.expr("CAST(ceil(4.0 * CAST(r2 AS DOUBLE) / np2) AS BIGINT)")
            )
            .alias("quartile_second"),
        )
    )
    return (
        ranked.groupBy("quartile_first", "quartile_second")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("quartile_first", "quartile_second")
    )


# ---------------------------------------------------------------------------
# F173 Kruskal-Wallis k-group rank test
# ---------------------------------------------------------------------------
@register(
    "events_kruskal_wallis_value",
    f"""
    WITH x AS (
        SELECT event_type AS g, {_CENTS} AS v FROM events
    ),
    r AS (
        SELECT g,
               CAST(2 * rank() OVER (ORDER BY v)
                    + count(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS dr
        FROM x
    ),
    per_g AS (
        SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dr) AS BIGINT) AS dsum
        FROM r GROUP BY g
    ),
    ties AS (
        SELECT CAST(sum(t * t * t - t) AS BIGINT) AS t3t
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM x GROUP BY v)
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS nn,
               sum((CAST(dsum AS DOUBLE) / (2.0 * n)) * (dsum / 2.0))
                   AS sr2
        FROM per_g
    )
    SELECT k AS k_groups, nn AS n_events,
           round((12.0 * sr2 / (CAST(nn AS DOUBLE) * (nn + 1))
                  - 3.0 * (nn + 1))
                 / (1.0 - CAST(t3t AS DOUBLE)
                          / (CAST(nn AS DOUBLE) * nn * nn - nn)), 6)
               AS h_kw
    FROM agg CROSS JOIN ties
    """,
    doc="F173 Kruskal-Wallis rank test — do the k event types share a "
    "value distribution? THE standard k-group nonparametric omnibus "
    "(the rank ANOVA: F98 assumes normal errors, F91 handles only "
    "two groups; H ~ chi2(k-1) feeds the F129 BH family): per-group "
    "rank sums from EXACT BIGINT doubled midranks (F91/F120 device; "
    "the R_j^2/n_j terms cast to DOUBLE before squaring — D^2 "
    "overflows BIGINT past ~2e9 rows, noted — summed over the k=5 "
    "frame, the F119 small-reduce argument), the tie correction "
    "1 - sum(t^3-t)/(N^3-N) exact-integer. Doubled midranks come from "
    "the distinct-value reduce + range-partitioned running count "
    "(operators/rank.py) — no row-scale rank window. Single row.",
)
def events_kruskal_wallis_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.rank import global_cumsum

    x = _events(spark, sf_dir).select(
        F.col("event_type").alias("g"), F.expr(_CENTS).alias("v")
    )
    # doubled midrank depends only on the DISTINCT value: dr(v) =
    # 2*prefix + ties + 1 (exact BIGINT), prefix from the range-
    # partitioned running count — no row-scale global rank window;
    # per-group rank sums are then sum(c_g(v) * dr(v)), the same
    # integers the oracle's per-row window produces
    per_vg = x.groupBy("v", "g").agg(F.count(F.lit(1)).alias("c"))
    per_v = per_vg.groupBy("v").agg(F.sum("c").alias("t"))
    cum = global_cumsum(
        per_v.withColumn("cum_t", F.col("t")), [("v", True)], ["cum_t"]
    )
    dr_v = cum.select(
        "v",
        "t",
        (2 * F.col("cum_t") - F.col("t") + 1).cast("long").alias("dr"),
    )
    per_g = (
        per_vg.join(dr_v.select("v", "dr"), "v")
        .groupBy("g")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.col("dr")).alias("dsum"),
        )
    )
    ties = dr_v.agg(
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("t3t")
    )
    agg = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum(
            F.expr("(CAST(dsum AS DOUBLE) / (2.0 * n)) * (dsum / 2.0)")
        ).alias("sr2"),
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        F.col("k").alias("k_groups"),
        F.col("nn").alias("n_events"),
        F.expr(
            "round((12.0 * sr2 / (CAST(nn AS DOUBLE) * (nn + 1))"
            " - 3.0 * (nn + 1))"
            " / (1.0 - CAST(t3t AS DOUBLE)"
            " / (CAST(nn AS DOUBLE) * nn * nn - nn)), 6)"
        ).alias("h_kw"),
    )


# ---------------------------------------------------------------------------
# F174 p-chart: weekly late-shipment rate with 3-sigma control limits
# ---------------------------------------------------------------------------
@register(
    "lineitem_return_rate_pchart",
    """
    WITH x AS (
        SELECT CAST(date_trunc('week', l_shipdate) AS TIMESTAMP) AS w,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS late
        FROM lineitem
    ),
    per_w AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(late) AS BIGINT) AS k
        FROM x GROUP BY w
    ),
    pbar AS (
        SELECT CAST(sum(k) AS BIGINT) AS tk, CAST(sum(n) AS BIGINT) AS tn
        FROM per_w
    )
    SELECT w AS week, n AS n_lines, k AS n_returned,
           round(CAST(k AS DOUBLE) / n, 6) AS p_hat,
           round(CAST(tk AS DOUBLE) / tn, 6) AS p_bar,
           round(CAST(tk AS DOUBLE) / tn
                 - 3.0 * sqrt((CAST(tk AS DOUBLE) / tn)
                              * (1.0 - CAST(tk AS DOUBLE) / tn) / n), 6)
               AS lcl,
           round(CAST(tk AS DOUBLE) / tn
                 + 3.0 * sqrt((CAST(tk AS DOUBLE) / tn)
                              * (1.0 - CAST(tk AS DOUBLE) / tn) / n), 6)
               AS ucl,
           CASE WHEN CAST(k AS DOUBLE) / n
                     > CAST(tk AS DOUBLE) / tn
                       + 3.0 * sqrt((CAST(tk AS DOUBLE) / tn)
                                    * (1.0 - CAST(tk AS DOUBLE) / tn) / n)
                  OR CAST(k AS DOUBLE) / n
                     < CAST(tk AS DOUBLE) / tn
                       - 3.0 * sqrt((CAST(tk AS DOUBLE) / tn)
                                    * (1.0 - CAST(tk AS DOUBLE) / tn) / n)
                THEN 1 ELSE 0 END AS out_of_control
    FROM per_w CROSS JOIN pbar
    ORDER BY week
    """,
    doc="F174 Shewhart p-chart on the weekly RETURNED-line rate "
    "(l_returnflag = 'R'): per-week proportion against the pooled "
    "center line with the classic 3-sigma binomial limits "
    "p_bar +- 3 sqrt(p_bar(1-p_bar)/n_w) — VARIABLE limits because "
    "week sizes differ, the part naive dashboards get wrong — and an "
    "out-of-control flag per week; the attribute-chart complement to "
    "F56 Bollinger (measurements) and F95 Page-Hinkley (sequential). "
    "Counts exact; one shared fp expression family. One reduce + a "
    "broadcast scalar. One row per week.",
)
def lineitem_return_rate_pchart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    x = load(spark, sf_dir, "lineitem").select(
        F.date_trunc("week", F.col("l_shipdate")).alias("w"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias(
            "late"
        ),
    )
    per_w = x.groupBy("w").agg(
        F.count(F.lit(1)).alias("n"), F.sum("late").alias("k")
    )
    pbar = per_w.agg(
        F.sum("k").alias("tk"), F.sum("n").alias("tn")
    )
    lim = (
        "3.0 * sqrt((CAST(tk AS DOUBLE) / tn)"
        " * (1.0 - CAST(tk AS DOUBLE) / tn) / n)"
    )
    return per_w.crossJoin(F.broadcast(pbar)).select(
        F.col("w").alias("week"),
        F.col("n").alias("n_lines"),
        F.col("k").alias("n_returned"),
        F.expr("round(CAST(k AS DOUBLE) / n, 6)").alias("p_hat"),
        F.expr("round(CAST(tk AS DOUBLE) / tn, 6)").alias("p_bar"),
        F.expr(f"round(CAST(tk AS DOUBLE) / tn - {lim}, 6)").alias("lcl"),
        F.expr(f"round(CAST(tk AS DOUBLE) / tn + {lim}, 6)").alias("ucl"),
        F.expr(
            f"CASE WHEN CAST(k AS DOUBLE) / n"
            f" > CAST(tk AS DOUBLE) / tn + {lim}"
            f" OR CAST(k AS DOUBLE) / n"
            f" < CAST(tk AS DOUBLE) / tn - {lim}"
            " THEN 1 ELSE 0 END"
        ).alias("out_of_control"),
    ).orderBy("week")


# ---------------------------------------------------------------------------
# F175 c-chart: daily error counts with Poisson control limits
# ---------------------------------------------------------------------------
@register(
    "events_error_cchart",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(count(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'error' GROUP BY 1
    ),
    cbar AS (
        SELECT CAST(sum(c) AS BIGINT) AS tc,
               CAST(count(*) AS BIGINT) AS nd
        FROM d
    )
    SELECT d.d, c AS n_errors,
           round(CAST(tc AS DOUBLE) / nd, 6) AS c_bar,
           round(greatest(CAST(tc AS DOUBLE) / nd
                 - 3.0 * sqrt(CAST(tc AS DOUBLE) / nd), 0.0), 6) AS lcl,
           round(CAST(tc AS DOUBLE) / nd
                 + 3.0 * sqrt(CAST(tc AS DOUBLE) / nd), 6) AS ucl,
           CASE WHEN c > CAST(tc AS DOUBLE) / nd
                        + 3.0 * sqrt(CAST(tc AS DOUBLE) / nd)
                  OR c < greatest(CAST(tc AS DOUBLE) / nd
                        - 3.0 * sqrt(CAST(tc AS DOUBLE) / nd), 0.0)
                THEN 1 ELSE 0 END AS out_of_control
    FROM d CROSS JOIN cbar ORDER BY d.d
    """,
    doc="F175 Shewhart c-chart on daily ERROR-event counts: Poisson "
    "3-sigma limits c_bar +- 3 sqrt(c_bar) (floored at 0) around the "
    "pooled mean, out-of-control flags per day — the incident-rate "
    "monitoring chart (counts with constant exposure; pairs with "
    "F174's p-chart for proportions with varying exposure). Counts "
    "exact, one shared fp family. One filtered reduce + broadcast "
    "scalar. One row per day with errors.",
)
def events_error_cchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cbar = d.agg(
        F.sum("c").alias("tc"), F.count(F.lit(1)).alias("nd")
    )
    lim = "3.0 * sqrt(CAST(tc AS DOUBLE) / nd)"
    return d.crossJoin(F.broadcast(cbar)).select(
        "d",
        F.col("c").alias("n_errors"),
        F.expr("round(CAST(tc AS DOUBLE) / nd, 6)").alias("c_bar"),
        F.expr(
            f"round(greatest(CAST(tc AS DOUBLE) / nd - {lim}, 0.0), 6)"
        ).alias("lcl"),
        F.expr(f"round(CAST(tc AS DOUBLE) / nd + {lim}, 6)").alias("ucl"),
        F.expr(
            f"CASE WHEN c > CAST(tc AS DOUBLE) / nd + {lim}"
            f" OR c < greatest(CAST(tc AS DOUBLE) / nd - {lim}, 0.0)"
            " THEN 1 ELSE 0 END"
        ).alias("out_of_control"),
    ).orderBy("d")


# ---------------------------------------------------------------------------
# F176 Lorenz curve of customer revenue (decile points)
# ---------------------------------------------------------------------------
@register(
    "customer_lorenz_curve",
    """
    WITH c AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev, o_custkey) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS n,
               CAST(sum(rev) OVER (ORDER BY rev, o_custkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum,
               CAST(sum(rev) OVER () AS BIGINT) AS tot
        FROM c
    )
    SELECT CAST(d AS BIGINT) AS decile,
           round(CAST(d AS DOUBLE) / 10.0, 1) AS pop_share,
           round(CAST(max(CASE WHEN rk = CAST(floor(d * n / 10.0)
                                            AS BIGINT)
                              THEN cum END) AS DOUBLE) / max(tot), 6)
               AS rev_share
    FROM r CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS d)
    WHERE rk = CAST(floor(d * n / 10.0) AS BIGINT)
    GROUP BY d ORDER BY decile
    """,
    doc="F176 Lorenz curve of customer revenue at population deciles: "
    "the cumulative revenue share held by the poorest d/10 of "
    "customers — the PLOT behind the F-series Gini scalar (Gini is "
    "twice the area between this curve and the diagonal) and the "
    "exact-rank, integer-cents counterpart of the Pareto 80/20 "
    "report. Customers sort ascending by revenue (custkey tiebreak); "
    "cum sums are exact ordered BIGINTs; one fp share per decile. "
    "One reduce + one rank window over the customer aggregate "
    "(RFM posture). 10 rows, rev_share monotone with decile and "
    "rev_share(10) = 1.",
)
def customer_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("rev")
    )
    w_ord = Window.orderBy("rev", "o_custkey")
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = c.select(
        "rev",
        F.row_number().over(w_ord).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("rev")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("rev").over(w_all).alias("tot"),
    )
    ds = c.sparkSession.range(1, 11).select(F.col("id").alias("d"))
    return (
        r.crossJoin(F.broadcast(ds))
        .filter(
            F.col("rk") == F.expr("CAST(floor(d * n / 10.0) AS BIGINT)")
        )
        .groupBy("d")
        .agg(
            F.expr(
                "round(CAST(max(cum) AS DOUBLE) / max(tot), 6)"
            ).alias("rev_share")
        )
        .select(
            F.col("d").cast("long").alias("decile"),
            F.expr("round(CAST(d AS DOUBLE) / 10.0, 1)").alias("pop_share"),
            "rev_share",
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# F177 Theil inequality index with between/within-nation decomposition
# ---------------------------------------------------------------------------
@register(
    "customer_theil_decomposition",
    """
    WITH c AS (
        SELECT cu.c_nationkey AS nk,
               CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev,
               o.o_custkey
        FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
        GROUP BY cu.c_nationkey, o.o_custkey
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev) AS BIGINT)
                   AS x
        FROM c
    ),
    per_cust AS (
        SELECT nk, rev, n, x,
               sum((CAST(rev AS DOUBLE) / x)
                   * ln((CAST(rev AS DOUBLE) / x) * n))
                   OVER (ORDER BY nk, o_custkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_t,
               row_number() OVER (ORDER BY nk, o_custkey) AS rn
        FROM c CROSS JOIN tot WHERE rev > 0
    ),
    t_total AS (
        SELECT cum_t AS t_tot, n, x FROM per_cust
        WHERE rn = (SELECT count(*) FROM c WHERE rev > 0)
    ),
    per_nat AS (
        SELECT nk, CAST(count(*) AS BIGINT) AS ng,
               CAST(sum(rev) AS BIGINT) AS xg
        FROM c WHERE rev > 0 GROUP BY nk
    ),
    t_between AS (
        SELECT sum((CAST(xg AS DOUBLE) / t.x)
                   * ln((CAST(xg AS DOUBLE) / t.x)
                        * (CAST(t.n AS DOUBLE) / ng)))
                   OVER (ORDER BY nk
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_b,
               row_number() OVER (ORDER BY nk) AS rn,
               count(*) OVER () AS k
        FROM per_nat CROSS JOIN t_total t
    )
    SELECT (SELECT n FROM t_total) AS n_customers,
           round((SELECT t_tot FROM t_total), 6) AS theil_total,
           round((SELECT cum_b FROM t_between WHERE rn = k), 6)
               AS theil_between,
           round((SELECT t_tot FROM t_total)
                 - (SELECT cum_b FROM t_between WHERE rn = k), 6)
               AS theil_within
    FROM (SELECT 1)
    """,
    doc="F177 Theil-T inequality index of customer revenue with the "
    "exact between/within-NATION decomposition — the inequality "
    "measure that decomposes additively (Gini does not): T = "
    "sum(s_i ln(s_i N)), T_between over nation revenue shares, "
    "T_within = T - T_between by the Theil identity (pinned in "
    "pytest on planted data). Every entropy sum accumulates in "
    "DETERMINISTIC (nation, custkey) frame order over the customer "
    "AGGREGATE (F95 device at RFM posture; zero-revenue customers "
    "excluded as ln's domain requires). One join + reduces + ordered "
    "windows. Single summary row.",
)
def customer_theil_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nk"), "o_custkey")
        .agg(
            F.sum(
                F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
            ).alias("rev")
        )
        .filter(F.col("rev") > 0)
    )
    tot = c.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev").alias("x")
    )
    w_ord = Window.orderBy("nk", "o_custkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    per_cust = c.crossJoin(F.broadcast(tot)).select(
        "n", "x",
        F.sum(
            F.expr(
                "(CAST(rev AS DOUBLE) / x)"
                " * ln((CAST(rev AS DOUBLE) / x) * n)"
            )
        )
        .over(w_ord)
        .alias("cum_t"),
        F.row_number().over(Window.orderBy("nk", "o_custkey")).alias(
            "rn"
        ),
        F.count(F.lit(1)).over(w_all).alias("cnt"),
    )
    t_total = per_cust.filter(F.col("rn") == F.col("cnt")).select(
        "n", "x", F.col("cum_t").alias("t_tot")
    )
    per_nat = c.groupBy("nk").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("rev").alias("xg")
    )
    t_between = (
        per_nat.crossJoin(F.broadcast(t_total))
        .select(
            F.sum(
                F.expr(
                    "(CAST(xg AS DOUBLE) / x)"
                    " * ln((CAST(xg AS DOUBLE) / x)"
                    " * (CAST(n AS DOUBLE) / ng))"
                )
            )
            .over(
                Window.orderBy("nk").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("cum_b"),
            F.row_number().over(Window.orderBy("nk")).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("k"),
        )
        .filter(F.col("rn") == F.col("k"))
        .select(F.col("cum_b").alias("t_bet"))
    )
    return t_total.crossJoin(F.broadcast(t_between)).select(
        F.col("n").alias("n_customers"),
        F.round("t_tot", 6).alias("theil_total"),
        F.round("t_bet", 6).alias("theil_between"),
        F.expr("round(t_tot - t_bet, 6)").alias("theil_within"),
    )


# ---------------------------------------------------------------------------
# F178 ARCH-LM volatility-clustering test (Engle 1982, q = 1)
# ---------------------------------------------------------------------------
@register(
    "events_arch_lm_test",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    diffs AS (
        SELECT d, CAST(y - lag(y) OVER (ORDER BY d) AS BIGINT) AS u
        FROM daily QUALIFY u IS NOT NULL
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS nd, CAST(sum(u) AS BIGINT) AS su
        FROM diffs
    ),
    sq AS (
        SELECT d,
               (CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / nd)
               * (CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / nd) AS s
        FROM diffs CROSS JOIN m
    ),
    pairs AS (
        SELECT d, s, lag(s) OVER (ORDER BY d) AS sp
        FROM sq QUALIFY sp IS NOT NULL
    ),
    acc AS (
        SELECT count(*) OVER () AS n,
               sum(s) OVER w AS sx, sum(sp) OVER w AS sy,
               sum(s * s) OVER w AS sxx, sum(sp * sp) OVER w AS syy,
               sum(s * sp) OVER w AS sxy,
               row_number() OVER (ORDER BY d) AS rn
        FROM pairs
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS rho1_sq,
           round(n * ((n * sxy - sx * sy)
                      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
                   * ((n * sxy - sx * sy)
                      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))),
                 6) AS arch_lm
    FROM acc WHERE rn = n
    """,
    doc="F178 Engle's ARCH-LM test (q=1) for volatility clustering in "
    "daily value changes: LM = n * rho^2 where rho is the lag-1 "
    "autocorrelation of SQUARED demeaned first differences — "
    "LM ~ chi2(1) under constant conditional variance; a large LM "
    "says calm and turbulent days cluster (the GARCH-worthiness "
    "pre-test; F102 Ljung-Box tests the LEVEL series, this tests its "
    "VARIANCE). First differences are exact BIGINTs; squared "
    "deviations are doubles with EVERY sum frame-ordered (F95 "
    "device), shared expression text. Pre-reduces to the calendar "
    "frame. Single summary row.",
)
def events_arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w_ord = Window.orderBy("d")
    diffs = daily.select(
        "d",
        (F.col("y") - F.lag("y").over(w_ord)).cast("long").alias("u"),
    ).filter(F.col("u").isNotNull())
    m = diffs.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("u").alias("su")
    )
    sq = diffs.crossJoin(F.broadcast(m)).select(
        "d",
        F.expr(
            "(CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / nd)"
            " * (CAST(u AS DOUBLE) - CAST(su AS DOUBLE) / nd)"
        ).alias("s"),
    )
    pairs = sq.select(
        "d", "s", F.lag("s").over(w_ord).alias("sp")
    ).filter(F.col("sp").isNotNull())
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    acc = pairs.select(
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("s").over(w_cum).alias("sx"),
        F.sum("sp").over(w_cum).alias("sy"),
        F.sum(F.col("s") * F.col("s")).over(w_cum).alias("sxx"),
        F.sum(F.col("sp") * F.col("sp")).over(w_cum).alias("syy"),
        F.sum(F.col("s") * F.col("sp")).over(w_cum).alias("sxy"),
        F.row_number().over(w_ord).alias("rn"),
    )
    rho = (
        "(n * sxy - sx * sy)"
        " / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))"
    )
    return acc.filter(F.col("rn") == F.col("n")).select(
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(f"round({rho}, 6)").alias("rho1_sq"),
        F.expr(f"round(n * ({rho}) * ({rho}), 6)").alias("arch_lm"),
    )


# ---------------------------------------------------------------------------
# F179 Cronbach's alpha: internal consistency of engagement items
# ---------------------------------------------------------------------------
@register(
    "users_cronbach_alpha",
    """
    WITH m AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x1,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x2,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x3,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x4,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x5
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x1*x1) AS BIGINT)
                   AS q1,
               CAST(sum(x2) AS BIGINT) AS s2, CAST(sum(x2*x2) AS BIGINT)
                   AS q2,
               CAST(sum(x3) AS BIGINT) AS s3, CAST(sum(x3*x3) AS BIGINT)
                   AS q3,
               CAST(sum(x4) AS BIGINT) AS s4, CAST(sum(x4*x4) AS BIGINT)
                   AS q4,
               CAST(sum(x5) AS BIGINT) AS s5, CAST(sum(x5*x5) AS BIGINT)
                   AS q5,
               CAST(sum(x1+x2+x3+x4+x5) AS BIGINT) AS st,
               CAST(sum((x1+x2+x3+x4+x5)*(x1+x2+x3+x4+x5)) AS BIGINT)
                   AS qt
        FROM m
    )
    SELECT n AS n_users,
           round((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n
                  + CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n
                  + CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n
                  + CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * s4 / n
                  + CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE) * s5 / n)
                 / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n), 6)
               AS item_total_var_ratio,
           round((5.0 / 4.0)
                 * (1.0
                    - (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n
                       + CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n
                       + CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n
                       + CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * s4 / n
                       + CAST(q5 AS DOUBLE) - CAST(s5 AS DOUBLE) * s5 / n)
                      / (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n)),
                 6) AS cronbach_alpha
    FROM s
    """,
    doc="F179 Cronbach's alpha over the five per-user engagement items "
    "(counts of each event type): alpha = k/(k-1) * (1 - sum(item "
    "variances)/variance(total)) — the internal-consistency "
    "reliability of treating 'engagement' as one scale (alpha near 1 "
    "= the items co-move and a composite score is meaningful; near 0 "
    "= they measure different things; the psychometrics standard "
    "imported to product scoring). Every variance is assembled from "
    "EXACT BIGINT power sums (q - s^2/n, the F149 device; bound "
    "sum(total^2) < 2^63 while per-user events < ~3e6 — noted). One "
    "user reduce + one 12-sum reduce; single summary row.",
)
def users_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    types = ["view", "click", "purchase", "signup", "error"]
    m = _events(spark, sf_dir).groupBy("user_id").agg(
        *[
            F.sum(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            ).alias(f"x{i+1}")
            for i, t in enumerate(types)
        ]
    )
    tot = " + ".join(f"x{i+1}" for i in range(5))
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(5):
        aggs.append(F.sum(f"x{i+1}").alias(f"s{i+1}"))
        aggs.append(
            F.sum(F.col(f"x{i+1}") * F.col(f"x{i+1}")).alias(f"q{i+1}")
        )
    aggs.append(F.sum(F.expr(tot)).alias("st"))
    aggs.append(F.sum(F.expr(f"({tot}) * ({tot})")).alias("qt"))
    s = m.agg(*aggs)
    item_vars = " + ".join(
        f"CAST(q{i+1} AS DOUBLE) - CAST(s{i+1} AS DOUBLE) * s{i+1} / n"
        for i in range(5)
    )
    tot_var = "CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * st / n"
    return s.select(
        F.col("n").alias("n_users"),
        F.expr(f"round(({item_vars}) / ({tot_var}), 6)").alias(
            "item_total_var_ratio"
        ),
        F.expr(
            f"round((5.0 / 4.0) * (1.0 - ({item_vars}) / ({tot_var})), 6)"
        ).alias("cronbach_alpha"),
    )


# ---------------------------------------------------------------------------
# F180 renewal check: exponential QQ correlation of order interarrivals
# ---------------------------------------------------------------------------
@register(
    "orders_cadence_renewal_check",
    """
    WITH ia AS (
        SELECT CAST(datediff('day', lag(o_orderdate) OVER w, o_orderdate)
                    AS BIGINT) AS gap
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        QUALIFY gap IS NOT NULL AND gap > 0
    ),
    per_g AS (
        SELECT gap, CAST(count(*) AS BIGINT) AS t FROM ia GROUP BY gap
    ),
    cum AS (
        SELECT gap, t,
               CAST(sum(t) OVER (ORDER BY gap
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS ct,
               CAST(sum(t) OVER () AS BIGINT) AS n
        FROM per_g
    ),
    q AS (
        SELECT gap, t, n,
               -ln(1.0 - ((ct - t) + t / 2.0) / n) AS eq
        FROM cum
    ),
    acc AS (
        SELECT n,
               sum(CAST(t AS DOUBLE) * gap) OVER w AS sx,
               sum(CAST(t AS DOUBLE) * eq) OVER w AS sy,
               sum(CAST(t AS DOUBLE) * gap * gap) OVER w AS sxx,
               sum(CAST(t AS DOUBLE) * eq * eq) OVER w AS syy,
               sum(CAST(t AS DOUBLE) * gap * eq) OVER w AS sxy,
               row_number() OVER (ORDER BY gap) AS rn,
               count(*) OVER () AS ng
        FROM q
        WINDOW w AS (ORDER BY gap
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(n AS BIGINT) AS n_gaps,
           round((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
               AS qq_corr_exponential
    FROM acc WHERE rn = ng
    """,
    doc="F180 renewal-process check on customer order cadence: the QQ "
    "correlation between sorted positive interarrival days and "
    "exponential plotting positions — r near 1 says reorder gaps are "
    "memoryless (a Poisson renewal process, so 'time since last "
    "order' carries no churn signal); materially lower r says aging "
    "matters and F107/F123's hazard machinery is the right model. "
    "Tied gaps share their class-MIDRANK plotting position "
    "-ln(1-(midrank-1/2)/n) (the standard tie treatment), weighted by "
    "class size — which collapses the frame to DISTINCT integer-day "
    "gaps (domain-bounded like a calendar), so every window here runs "
    "over a bounded frame: no row-scale global rank window. Gaps are "
    "exact integer days from one per-customer lag window; every fp "
    "sum frame-ordered in gap order (F95 device) with shared ln text. "
    "Single summary row.",
)
def orders_cadence_renewal_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ia = (
        load(spark, sf_dir, "orders")
        .select(
            F.expr(
                "CAST(datediff(o_orderdate, lag(o_orderdate) OVER ("
                "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
                ")) AS BIGINT)"
            ).alias("gap")
        )
        .filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
    )
    # distinct-gap reduce first: all windows below run over the bounded
    # integer-day gap domain, never the row-scale pair frame
    per_g = ia.groupBy("gap").agg(F.count(F.lit(1)).alias("t"))
    w_all = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    w_cum = W.orderBy("gap").rowsBetween(W.unboundedPreceding, 0)
    cum = per_g.select(
        "gap", "t",
        F.sum("t").over(w_cum).cast("long").alias("ct"),
        F.sum("t").over(w_all).cast("long").alias("n"),
    )
    q = cum.select(
        "gap", "t", "n",
        F.expr("-ln(1.0 - ((ct - t) + t / 2.0) / n)").alias("eq"),
    )
    acc = q.select(
        "n",
        F.sum(F.expr("CAST(t AS DOUBLE) * gap")).over(w_cum).alias("sx"),
        F.sum(F.expr("CAST(t AS DOUBLE) * eq")).over(w_cum).alias("sy"),
        F.sum(F.expr("CAST(t AS DOUBLE) * gap * gap")).over(w_cum).alias(
            "sxx"
        ),
        F.sum(F.expr("CAST(t AS DOUBLE) * eq * eq")).over(w_cum).alias(
            "syy"
        ),
        F.sum(F.expr("CAST(t AS DOUBLE) * gap * eq")).over(w_cum).alias(
            "sxy"
        ),
        F.row_number().over(W.orderBy("gap")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("ng"),
    )
    return acc.filter(F.col("rn") == F.col("ng")).select(
        F.col("n").cast("long").alias("n_gaps"),
        F.expr(
            "round((n * sxy - sx * sy)"
            " / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)"
        ).alias("qq_corr_exponential"),
    )


# ---------------------------------------------------------------------------
# F181 daily type-mix KL divergence from the corpus mix
# ---------------------------------------------------------------------------
@register(
    "events_daily_mix_divergence",
    """
    WITH cell AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, event_type,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    day_tot AS (
        SELECT d, CAST(sum(c) AS BIGINT) AS nd FROM cell GROUP BY d
    ),
    gl AS (
        SELECT event_type, CAST(sum(c) AS BIGINT) AS g,
               CAST(sum(sum(c)) OVER () AS BIGINT) AS n
        FROM cell GROUP BY event_type
    ),
    kl AS (
        SELECT cell.d,
               sum((CAST(c AS DOUBLE) / nd)
                   * ln((CAST(c AS DOUBLE) / nd)
                        / (CAST(g AS DOUBLE) / n)))
                   OVER (PARTITION BY cell.d ORDER BY cell.event_type
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS cum_kl,
               row_number() OVER (PARTITION BY cell.d
                                  ORDER BY cell.event_type) AS rn,
               count(*) OVER (PARTITION BY cell.d) AS k,
               max(nd) OVER (PARTITION BY cell.d) AS nd
        FROM cell
        JOIN day_tot ON day_tot.d = cell.d
        JOIN gl ON gl.event_type = cell.event_type
    )
    SELECT d, CAST(nd AS BIGINT) AS n_events,
           round(cum_kl, 6) AS kl_nats
    FROM kl WHERE rn = k ORDER BY d
    """,
    doc="F181 per-day KL divergence of the event-type mix from the "
    "corpus-wide mix: KL(day || global) in nats — the composition-"
    "shift trace that catches a day whose VOLUME looks normal but "
    "whose mix is off (error storms, bot floods; the daily companion "
    "to F63's PSI which needs binned numerics). Counts exact; the "
    "per-day entropy sum accumulates in DETERMINISTIC type order "
    "over the bounded k-types frame (F128 device; absent types "
    "contribute their true limit 0). One contingency reduce + "
    "bounded windows. One row per day.",
)
def events_daily_mix_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    cell = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    day_tot = cell.groupBy("d").agg(F.sum("c").alias("nd"))
    w_all = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    gl = cell.groupBy("event_type").agg(F.sum("c").alias("g"))
    gl = gl.select(
        "event_type", "g", F.sum("g").over(w_all).alias("n")
    )
    wd = W.partitionBy("d")
    kl = (
        cell.join(day_tot, "d")
        .join(F.broadcast(gl), "event_type")
        .select(
            "d",
            F.sum(
                F.expr(
                    "(CAST(c AS DOUBLE) / nd)"
                    " * ln((CAST(c AS DOUBLE) / nd)"
                    " / (CAST(g AS DOUBLE) / n))"
                )
            )
            .over(
                wd.orderBy("event_type").rowsBetween(
                    W.unboundedPreceding, 0
                )
            )
            .alias("cum_kl"),
            F.row_number().over(wd.orderBy("event_type")).alias("rn"),
            F.count(F.lit(1))
            .over(
                wd.rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            )
            .alias("k"),
            F.max("nd")
            .over(
                wd.rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            )
            .alias("nd"),
        )
    )
    return (
        kl.filter(F.col("rn") == F.col("k"))
        .select(
            "d",
            F.col("nd").cast("long").alias("n_events"),
            F.round("cum_kl", 6).alias("kl_nats"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# F182 Weibull plot fit of churned-user lifetimes (rank regression)
# ---------------------------------------------------------------------------
@register(
    "users_weibull_lifetime_fit",
    """
    WITH bounds AS (
        SELECT CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS horizon
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS first_d,
               CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS last_d
        FROM events GROUP BY user_id
    ),
    died AS (
        SELECT CAST(datediff('day', first_d, last_d) + 1 AS BIGINT) AS t
        FROM u CROSS JOIN bounds
        WHERE datediff('day', last_d, horizon) > 0
    ),
    r AS (
        SELECT t,
               CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS n
        FROM died
    ),
    xy AS (
        SELECT ln(CAST(t AS DOUBLE)) AS x,
               ln(-ln(1.0 - (rk - 0.3) / (n + 0.4))) AS y,
               rk, n
        FROM r
    ),
    acc AS (
        SELECT n,
               sum(x) OVER w AS sx, sum(y) OVER w AS sy,
               sum(x * x) OVER w AS sxx, sum(x * y) OVER w AS sxy,
               row_number() OVER (ORDER BY rk) AS rn
        FROM xy
        WINDOW w AS (ORDER BY rk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(n AS BIGINT) AS n_churned,
           CASE WHEN n < 3 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                END AS weibull_shape_k,
           CASE WHEN n < 3 OR n * sxx - sx * sx = 0 THEN NULL
                ELSE round(exp(-((sy - ((n * sxy - sx * sy)
                              / (n * sxx - sx * sx)) * sx) / n)
                     / ((n * sxy - sx * sy) / (n * sxx - sx * sx))), 4)
                END AS weibull_scale_days
    FROM acc WHERE rn = n
    """,
    doc="F182 Weibull plot fit of CHURNED user lifetimes (rank "
    "regression / median-rank probability plotting, the reliability-"
    "engineering standard): ln(-ln(1-F_i)) on ln(t_i) with Bernard "
    "median ranks (i-0.3)/(n+0.4) is linear iff lifetimes are "
    "Weibull; the slope IS the shape k (k < 1 = infant mortality — "
    "churn risk is highest right after signup; k > 1 = wear-out) and "
    "exp(-intercept/k) the scale — the PARAMETRIC summary beside the "
    "nonparametric F107/F123/F144 family, fit only on uncensored "
    "users. Lifetimes exact integer days (+1 so single-day users "
    "keep ln finite); ranks exact; every fp sum frame-ordered with "
    "shared ln/exp text. Single summary row.",
)
def users_weibull_lifetime_fit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _events(spark, sf_dir)
    bounds = ev.agg(F.date_trunc("day", F.max("ts")).alias("horizon"))
    u = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("first_d"),
        F.date_trunc("day", F.max("ts")).alias("last_d"),
    )
    died = (
        u.crossJoin(F.broadcast(bounds))
        .filter(F.expr("datediff(horizon, last_d) > 0"))
        .select(
            F.expr(
                "CAST(datediff(last_d, first_d) + 1 AS BIGINT)"
            ).alias("t")
        )
    )
    w_all = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    r = died.select(
        "t",
        F.row_number().over(W.orderBy("t")).cast("long").alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    xy = r.select(
        "rk", "n",
        F.expr("ln(CAST(t AS DOUBLE))").alias("x"),
        F.expr("ln(-ln(1.0 - (rk - 0.3) / (n + 0.4)))").alias("y"),
    )
    w_cum = W.orderBy("rk").rowsBetween(W.unboundedPreceding, 0)
    acc = xy.select(
        "n",
        F.sum("x").over(w_cum).alias("sx"),
        F.sum("y").over(w_cum).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w_cum).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w_cum).alias("sxy"),
        F.row_number().over(W.orderBy("rk")).alias("rn"),
    )
    slope = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
    guard = "n < 3 OR n * sxx - sx * sx = 0"
    return acc.filter(F.col("rn") == F.col("n")).select(
        F.col("n").cast("long").alias("n_churned"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL ELSE round({slope}, 6) END"
        ).alias("weibull_shape_k"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            f" ELSE round(exp(-((sy - ({slope}) * sx) / n)"
            f" / ({slope})), 4) END"
        ).alias("weibull_scale_days"),
    )


# ---------------------------------------------------------------------------
# F183 market-model regression: per-type beta to the aggregate
# ---------------------------------------------------------------------------
@register(
    "events_market_model_betas",
    f"""
    WITH cell AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, event_type,
               CAST(sum({_CENTS}) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    mkt AS (
        SELECT d, CAST(sum(v) AS BIGINT) AS m FROM cell GROUP BY d
    ),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS sv,
               CAST(sum(m) AS BIGINT) AS sm,
               sum(CAST(v AS DOUBLE) * m) AS svm,
               sum(CAST(m AS DOUBLE) * m) AS smm,
               sum(CAST(v AS DOUBLE) * v) AS svv
        FROM cell JOIN mkt ON mkt.d = cell.d
        GROUP BY event_type
    )
    SELECT event_type, n AS n_days,
           round((n * svm - CAST(sv AS DOUBLE) * sm)
                 / (n * smm - CAST(sm AS DOUBLE) * sm), 6) AS beta,
           round((CAST(sv AS DOUBLE)
                  - ((n * svm - CAST(sv AS DOUBLE) * sm)
                     / (n * smm - CAST(sm AS DOUBLE) * sm)) * sm) / n, 4)
               AS alpha_cents,
           round(((n * svm - CAST(sv AS DOUBLE) * sm)
                  * (n * svm - CAST(sv AS DOUBLE) * sm))
                 / ((n * smm - CAST(sm AS DOUBLE) * sm)
                    * (n * svv - CAST(sv AS DOUBLE) * sv)), 6) AS r2
    FROM s ORDER BY event_type
    """,
    doc="F183 market-model regression per event type: daily type "
    "revenue on the daily AGGREGATE (the 'market'), reporting beta "
    "(systematic sensitivity — beta > 1 amplifies corpus-wide "
    "swings), alpha (idiosyncratic level) and R^2 (how much of the "
    "type's variance the aggregate explains) — the portfolio-"
    "analytics decomposition applied to revenue streams, feeding "
    "mix-shift risk (a high-beta type dominates drawdowns). Linear "
    "sums stay EXACT BIGINTs; the POWER sums accumulate as doubles "
    "(daily-cents^2 x days overflows BIGINT at 10x stress, measured "
    "- the F119 bounded-frame reduce argument covers the drift); one "
    "shared fp expression per column. Two reduces + a "
    "day-frame join. One row per type.",
)
def events_market_model_betas(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cell = _events(spark, sf_dir).groupBy(
        F.date_trunc("day", F.col("ts")).alias("d"), "event_type"
    ).agg(F.sum(F.expr(_CENTS)).alias("v"))
    mkt = cell.groupBy("d").agg(F.sum("v").alias("m"))
    s = (
        cell.join(mkt, "d")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.sum("m").alias("sm"),
            F.sum(F.expr("CAST(v AS DOUBLE) * m")).alias("svm"),
            F.sum(F.expr("CAST(m AS DOUBLE) * m")).alias("smm"),
            F.sum(F.expr("CAST(v AS DOUBLE) * v")).alias("svv"),
        )
    )
    beta = ("(n * svm - CAST(sv AS DOUBLE) * sm)"
            " / (n * smm - CAST(sm AS DOUBLE) * sm)")
    return s.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.expr(f"round({beta}, 6)").alias("beta"),
        F.expr(
            f"round((CAST(sv AS DOUBLE) - ({beta}) * sm) / n, 4)"
        ).alias("alpha_cents"),
        F.expr(
            "round(((n * svm - CAST(sv AS DOUBLE) * sm)"
            " * (n * svm - CAST(sv AS DOUBLE) * sm))"
            " / ((n * smm - CAST(sm AS DOUBLE) * sm)"
            " * (n * svv - CAST(sv AS DOUBLE) * sv)), 6)"
        ).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# F184 time under water: drawdown duration per day
# ---------------------------------------------------------------------------
@register(
    "orders_time_under_water",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    peaks AS (
        SELECT d, v,
               CAST(max(v) OVER (ORDER BY d
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS peak
        FROM d
    ),
    flagged AS (
        SELECT d, v, peak,
               CASE WHEN v = peak THEN 1 ELSE 0 END AS at_peak,
               CAST(sum(CASE WHEN v = peak THEN 1 ELSE 0 END)
                    OVER (ORDER BY d
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT) AS epoch
        FROM peaks
    ),
    tuw AS (
        SELECT d, v, peak, at_peak,
               CAST(row_number() OVER (PARTITION BY epoch ORDER BY d) - 1
                    AS BIGINT) AS days_under_water
        FROM flagged
    )
    SELECT d, v AS rev_cents, peak AS peak_cents, days_under_water
    FROM tuw ORDER BY d
    """,
    doc="F184 time under water: for each day, how many consecutive days "
    "daily revenue has sat below its running all-time peak — the "
    "DURATION dimension of drawdown risk the F-series drawdown-depth "
    "report lacks (a shallow 6-month slump and a deep 2-day dip are "
    "different failures). The running peak is an exact integer "
    "prefix max; peak days open a new epoch via an exact integer "
    "cumulative flag (gaps-and-islands), and days-under-water is "
    "the 0-based position within the epoch. Pure integer windows "
    "over the calendar frame. One row per day.",
)
def orders_time_under_water(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "orders").groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("d")
    ).agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("v")
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    peaks = d.select(
        "d", "v", F.max("v").over(w_cum).cast("long").alias("peak")
    )
    flagged = peaks.select(
        "d", "v", "peak",
        F.when(F.col("v") == F.col("peak"), 1).otherwise(0).alias(
            "at_peak"
        ),
        F.sum(F.when(F.col("v") == F.col("peak"), 1).otherwise(0))
        .over(w_cum)
        .cast("long")
        .alias("epoch"),
    )
    tuw = flagged.select(
        "d", "v", "peak",
        (
            F.row_number().over(
                Window.partitionBy("epoch").orderBy("d")
            )
            - 1
        )
        .cast("long")
        .alias("days_under_water"),
    )
    return tuw.select(
        "d",
        F.col("v").alias("rev_cents"),
        F.col("peak").alias("peak_cents"),
        "days_under_water",
    ).orderBy("d")


# ---------------------------------------------------------------------------
# F185 trend & seasonal strength of the daily series (Hyndman indices)
# ---------------------------------------------------------------------------
@register(
    "events_strength_indices",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    tr AS (
        SELECT d, y,
               CASE WHEN count(*) OVER w7 = 7
                    THEN CAST(sum(y) OVER w7 AS DOUBLE) / 7.0 END AS t
        FROM daily
        WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
        SELECT d, y, t, CAST(y AS DOUBLE) - t AS dt_,
               CAST((CAST(datediff('day', TIMESTAMP '2024-01-01', d)
                     AS BIGINT) % 7 + 7) % 7 AS BIGINT) AS dow
        FROM tr WHERE t IS NOT NULL
    ),
    seas AS (
        SELECT dow, avg(dt_) AS s FROM detr GROUP BY dow
    ),
    parts AS (
        SELECT detr.d, detr.y, detr.t, seas.s,
               detr.dt_ - seas.s AS r
        FROM detr JOIN seas ON seas.dow = detr.dow
    ),
    acc AS (
        SELECT count(*) OVER () AS n,
               sum(r) OVER w AS sr, sum(r * r) OVER w AS srr,
               sum(t + r) OVER w AS str_, sum((t + r) * (t + r)) OVER w
                   AS strr,
               sum(s + r) OVER w AS ssr, sum((s + r) * (s + r)) OVER w
                   AS ssrr,
               row_number() OVER (ORDER BY d) AS rn
        FROM parts
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           round(greatest(0.0, 1.0 - (srr - sr * sr / n)
                                 / (strr - str_ * str_ / n)), 6)
               AS trend_strength,
           round(greatest(0.0, 1.0 - (srr - sr * sr / n)
                                 / (ssrr - ssr * ssr / n)), 6)
               AS seasonal_strength
    FROM acc WHERE rn = n
    """,
    doc="F185 Hyndman trend and seasonal strength of the daily total: "
    "classical additive decomposition (centered 7-day MA trend, "
    "per-weekday mean seasonal on the detrended series, residual), "
    "then F_T = max(0, 1 - Var(R)/Var(T+R)) and F_S = max(0, 1 - "
    "Var(R)/Var(S+R)) — the two [0,1] scalars that rank thousands of "
    "series by how trended/seasonal they are (the feature-based "
    "forecasting triage; F23 emits the components, this emits the "
    "summary). Trend is an exact integer 7-sum / 7.0; weekday via "
    "exact epoch-day mod; every variance from frame-ordered sums "
    "(F95 device). Single summary row.",
)
def events_strength_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    tr = daily.select(
        "d", "y",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.sum("y").over(w7).cast("double") / 7.0,
        ).alias("t"),
    )
    detr = tr.filter(F.col("t").isNotNull()).select(
        "d", "y", "t",
        (F.col("y").cast("double") - F.col("t")).alias("dt_"),
        F.expr(
            "CAST((CAST(datediff(d, TIMESTAMP '2024-01-01') AS BIGINT)"
            " % 7 + 7) % 7 AS BIGINT)"
        ).alias("dow"),
    )
    seas = detr.groupBy("dow").agg(F.avg("dt_").alias("s"))
    parts = detr.join(F.broadcast(seas), "dow").select(
        "d", "t", "s", (F.col("dt_") - F.col("s")).alias("r")
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    acc = parts.select(
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("r").over(w_cum).alias("sr"),
        F.sum(F.col("r") * F.col("r")).over(w_cum).alias("srr"),
        F.sum(F.col("t") + F.col("r")).over(w_cum).alias("str_"),
        F.sum((F.col("t") + F.col("r")) * (F.col("t") + F.col("r")))
        .over(w_cum)
        .alias("strr"),
        F.sum(F.col("s") + F.col("r")).over(w_cum).alias("ssr"),
        F.sum((F.col("s") + F.col("r")) * (F.col("s") + F.col("r")))
        .over(w_cum)
        .alias("ssrr"),
        F.row_number().over(Window.orderBy("d")).alias("rn"),
    )
    return acc.filter(F.col("rn") == F.col("n")).select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "round(greatest(0.0, 1.0 - (srr - sr * sr / n)"
            " / (strr - str_ * str_ / n)), 6)"
        ).alias("trend_strength"),
        F.expr(
            "round(greatest(0.0, 1.0 - (srr - sr * sr / n)"
            " / (ssrr - ssr * ssr / n)), 6)"
        ).alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# F186 AR(1) mean-reversion half-life of the daily series
# ---------------------------------------------------------------------------
@register(
    "events_mean_reversion_halflife",
    f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum({_CENTS}) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT d, CAST(y AS DOUBLE) AS y,
               CAST(lag(y) OVER (ORDER BY d) AS DOUBLE) AS yp
        FROM daily QUALIFY yp IS NOT NULL
    ),
    acc AS (
        SELECT count(*) OVER () AS n,
               sum(y) OVER w AS sy, sum(yp) OVER w AS sp,
               sum(y * yp) OVER w AS syp, sum(yp * yp) OVER w AS spp,
               row_number() OVER (ORDER BY d) AS rn
        FROM pairs
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           round((n * syp - sy * sp) / (n * spp - sp * sp), 6) AS ar1_rho,
           CASE WHEN (n * syp - sy * sp) / (n * spp - sp * sp) <= 0
                  OR (n * syp - sy * sp) / (n * spp - sp * sp) >= 1
                THEN NULL
                ELSE round(-ln(2.0)
                           / ln((n * syp - sy * sp)
                                / (n * spp - sp * sp)), 4) END
               AS halflife_days
    FROM acc WHERE rn = n
    """,
    doc="F186 mean-reversion half-life: the AR(1) coefficient rho of "
    "the daily total (OLS of y_t on y_(t-1)) mapped to ln(2)/-ln(rho) "
    "days — how long a shock takes to decay halfway back, THE number "
    "a capacity planner or trader reads off F96 ADF's verdict "
    "(stationary says IT reverts; this says HOW FAST). rho outside "
    "(0,1) returns NULL honestly (no reversion). Every sum frame-"
    "ordered; one shared ln expression. Single summary row.",
)
def events_mean_reversion_halflife(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.expr(_CENTS)).alias("y"))
    )
    w_ord = Window.orderBy("d")
    pairs = daily.select(
        "d",
        F.col("y").cast("double").alias("y"),
        F.lag("y").over(w_ord).cast("double").alias("yp"),
    ).filter(F.col("yp").isNotNull())
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    acc = pairs.select(
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("y").over(w_cum).alias("sy"),
        F.sum("yp").over(w_cum).alias("sp"),
        F.sum(F.col("y") * F.col("yp")).over(w_cum).alias("syp"),
        F.sum(F.col("yp") * F.col("yp")).over(w_cum).alias("spp"),
        F.row_number().over(w_ord).alias("rn"),
    )
    rho = "(n * syp - sy * sp) / (n * spp - sp * sp)"
    return acc.filter(F.col("rn") == F.col("n")).select(
        F.col("n").cast("long").alias("n_pairs"),
        F.expr(f"round({rho}, 6)").alias("ar1_rho"),
        F.expr(
            f"CASE WHEN {rho} <= 0 OR {rho} >= 1 THEN NULL"
            f" ELSE round(-ln(2.0) / ln({rho}), 4) END"
        ).alias("halflife_days"),
    )


# ---------------------------------------------------------------------------
# F187 Cochran-Armitage trend test (purchase rate across activity bands)
# ---------------------------------------------------------------------------
@register(
    "users_cochran_armitage_trend",
    """
    WITH u AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
               CAST(max(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id
    ),
    banded AS (
        SELECT conv,
               CAST(least(floor(n_ev / 20.0), 4) AS BIGINT) AS band
        FROM u
    ),
    per_b AS (
        SELECT band, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) AS BIGINT) AS k
        FROM banded GROUP BY band
    ),
    tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(k) AS BIGINT) AS kk,
               CAST(sum(band * n) AS BIGINT) AS swn,
               CAST(sum(band * k) AS BIGINT) AS swk,
               CAST(sum(band * band * n) AS BIGINT) AS sw2n
        FROM per_b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM per_b) AS n_bands,
           nn AS n_users, kk AS n_converters,
           CAST(nn * swk - kk * swn AS BIGINT) AS trend_num,
           CASE WHEN kk = 0 OR kk = nn
                  OR nn * sw2n - swn * swn = 0 THEN NULL
                ELSE round(CAST(nn * swk - kk * swn AS DOUBLE)
                 / sqrt(CAST(kk AS DOUBLE) * (nn - kk)
                        * (CAST(nn AS DOUBLE) * sw2n
                           - CAST(swn AS DOUBLE) * swn) / nn), 6)
                END AS z_trend
    FROM tot
    """,
    doc="F187 Cochran-Armitage trend test: does purchase conversion "
    "rise MONOTONICALLY across activity bands (events-per-user "
    "bucketed 0..4 with integer scores)? The categorical dose-"
    "response test (F118 Jonckheere handles continuous responses; "
    "this is its 2xk proportions sibling, and the one-df trend chi-"
    "square is far more powerful than F92's omnibus when the "
    "alternative is ordered): z = (N*sum(w k) - K*sum(w n)) / "
    "sqrt(K(N-K)(N*sum(w^2 n) - (sum(w n))^2)/N), every sum an "
    "EXACT BIGINT (bound: N*sum(w^2 n) ~ 16N^2 < 2^63 while users "
    "< ~7e8 — noted; all-convert / no-convert / one-band corpora "
    "return NULL honestly — the sf0.001 everyone-buys case). One "
    "user reduce + a 5-row reduce. Single row.",
)
def users_cochran_armitage_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv"),
    )
    banded = u.select(
        "conv",
        F.expr("CAST(least(floor(n_ev / 20.0), 4) AS BIGINT)").alias(
            "band"
        ),
    )
    per_b = banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    tot = per_b.agg(
        F.count(F.lit(1)).alias("n_bands"),
        F.sum("n").alias("nn"),
        F.sum("k").alias("kk"),
        F.sum(F.col("band") * F.col("n")).alias("swn"),
        F.sum(F.col("band") * F.col("k")).alias("swk"),
        F.sum(F.col("band") * F.col("band") * F.col("n")).alias("sw2n"),
    )
    return tot.select(
        "n_bands",
        F.col("nn").alias("n_users"),
        F.col("kk").alias("n_converters"),
        (F.col("nn") * F.col("swk") - F.col("kk") * F.col("swn"))
        .cast("long")
        .alias("trend_num"),
        F.expr(
            "CASE WHEN kk = 0 OR kk = nn"
            " OR nn * sw2n - swn * swn = 0 THEN NULL"
            " ELSE round(CAST(nn * swk - kk * swn AS DOUBLE)"
            " / sqrt(CAST(kk AS DOUBLE) * (nn - kk)"
            " * (CAST(nn AS DOUBLE) * sw2n"
            " - CAST(swn AS DOUBLE) * swn) / nn), 6) END"
        ).alias("z_trend"),
    )


# ---------------------------------------------------------------------------
# F188 Chapman capture-recapture population estimate
# ---------------------------------------------------------------------------
@register(
    "users_capture_recapture",
    """
    WITH split AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(floor((datediff('day',
                        CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
                        CAST(date_trunc('day', max(ts)) AS TIMESTAMP))
                    + 1) / 2.0) AS BIGINT) AS half
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(max(CASE WHEN datediff('day', d0,
                        CAST(date_trunc('day', ts) AS TIMESTAMP)) < half
                        THEN 1 ELSE 0 END) AS BIGINT) AS in1,
               CAST(max(CASE WHEN datediff('day', d0,
                        CAST(date_trunc('day', ts) AS TIMESTAMP)) >= half
                        THEN 1 ELSE 0 END) AS BIGINT) AS in2
        FROM events CROSS JOIN split GROUP BY user_id
    ),
    c AS (
        SELECT CAST(sum(in1) AS BIGINT) AS n1,
               CAST(sum(in2) AS BIGINT) AS n2,
               CAST(sum(in1 * in2) AS BIGINT) AS m,
               CAST(count(*) AS BIGINT) AS observed
        FROM u
    )
    SELECT n1 AS n_first, n2 AS n_second, m AS n_both, observed,
           round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1.0, 4)
               AS chapman_estimate,
           round(sqrt((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)
                       * (n1 - m) * (n2 - m))
                      / ((CAST(m + 1 AS DOUBLE) * (m + 1) * (m + 2)))),
                 4) AS chapman_se
    FROM c
    """,
    doc="F188 Chapman capture-recapture estimate of the TRUE user "
    "population from two observation windows (calendar halves as the "
    "two 'captures'): N_hat = (n1+1)(n2+1)/(m+1) - 1 with its "
    "standard error — the ecology-standard bias-corrected Lincoln-"
    "Petersen, imported to data work as 'how many users exist that "
    "we have NEVER observed' (log-coverage gaps, dedup-universe "
    "sizing; observed <= N_hat, and N_hat - observed is the blind "
    "spot). Assumes independence of the two captures (violated by "
    "loyal users — reported beside the raw observed count so the "
    "gap reads as a bound, not gospel). All counts EXACT BIGINTs, "
    "two shared fp expressions. One user reduce. Single row.",
)
def users_capture_recapture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    split = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.expr(
            "CAST(floor((datediff(date_trunc('day', max(ts)),"
            " date_trunc('day', min(ts))) + 1) / 2.0) AS BIGINT)"
        ).alias("half"),
    )
    u = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("user_id")
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN datediff(date_trunc('day', ts), d0) < half"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("in1"),
            F.max(
                F.expr(
                    "CASE WHEN datediff(date_trunc('day', ts), d0) >= half"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("in2"),
        )
    )
    c = u.agg(
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).alias("m"),
        F.count(F.lit(1)).alias("observed"),
    )
    return c.select(
        F.col("n1").alias("n_first"),
        F.col("n2").alias("n_second"),
        F.col("m").alias("n_both"),
        "observed",
        F.expr(
            "round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1.0, 4)"
        ).alias("chapman_estimate"),
        F.expr(
            "round(sqrt((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)"
            " * (n1 - m) * (n2 - m))"
            " / ((CAST(m + 1 AS DOUBLE) * (m + 1) * (m + 2)))), 4)"
        ).alias("chapman_se"),
    )


# ---------------------------------------------------------------------------
# F189 McNemar's test + F190 Cohen's kappa on paired buyer status
# ---------------------------------------------------------------------------
@register(
    "users_mcnemar_kappa_halves",
    """
    WITH split AS (
        SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
               CAST(floor((datediff('day',
                        CAST(date_trunc('day', min(ts)) AS TIMESTAMP),
                        CAST(date_trunc('day', max(ts)) AS TIMESTAMP))
                    + 1) / 2.0) AS BIGINT) AS half
        FROM events
    ),
    u AS (
        SELECT user_id,
               CAST(max(CASE WHEN event_type = 'purchase'
                         AND datediff('day', d0,
                             CAST(date_trunc('day', ts) AS TIMESTAMP))
                             < half THEN 1 ELSE 0 END) AS BIGINT) AS b1,
               CAST(max(CASE WHEN event_type = 'purchase'
                         AND datediff('day', d0,
                             CAST(date_trunc('day', ts) AS TIMESTAMP))
                             >= half THEN 1 ELSE 0 END) AS BIGINT) AS b2
        FROM events CROSS JOIN split GROUP BY user_id
    ),
    cells AS (
        SELECT CAST(sum(b1 * b2) AS BIGINT) AS a,
               CAST(sum(b1 * (1 - b2)) AS BIGINT) AS b,
               CAST(sum((1 - b1) * b2) AS BIGINT) AS c,
               CAST(sum((1 - b1) * (1 - b2)) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS n
        FROM u
    )
    SELECT a AS n_both, b AS n_lost, c AS n_gained, d AS n_never,
           CASE WHEN b + c = 0 THEN NULL
                ELSE round((CAST(abs(b - c) AS DOUBLE) - 1.0)
                           * (abs(b - c) - 1.0) / (b + c), 6) END
               AS mcnemar_chi2,
           CASE WHEN (CAST(a + b AS DOUBLE) * (a + c)
                      + CAST(c + d AS DOUBLE) * (b + d))
                     = CAST(n AS DOUBLE) * n THEN NULL
                ELSE round((CAST(a + d AS DOUBLE) / n
                  - ((CAST(a + b AS DOUBLE) * (a + c)
                      + CAST(c + d AS DOUBLE) * (b + d))
                     / (CAST(n AS DOUBLE) * n)))
                 / (1.0
                    - ((CAST(a + b AS DOUBLE) * (a + c)
                        + CAST(c + d AS DOUBLE) * (b + d))
                       / (CAST(n AS DOUBLE) * n))), 6)
                END AS cohen_kappa
    FROM cells
    """,
    doc="F189+F190 on the paired buyer-status 2x2 (same users, first vs "
    "second calendar half): McNemar's continuity-corrected chi-square "
    "(|b-c|-1)^2/(b+c) asks whether conversion CHANGED — only the "
    "discordant cells matter, the within-subject design F84's "
    "unpaired test wastes (NULL when no discordance); Cohen's kappa "
    "gives the chance-corrected AGREEMENT between halves (kappa ~ 0 "
    "means this half's buyers tell you nothing about next half's — "
    "targeting churn models need kappa >> 0; the scalar summary of "
    "F172's migration matrix diagonal; a degenerate all-agree "
    "marginal — pe = 1, the sf0.001 everyone-buys case — returns "
    "NULL, not NaN). Cells EXACT BIGINTs from one "
    "user reduce; shared fp expressions. Single summary row.",
)
def users_mcnemar_kappa_halves(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    split = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.expr(
            "CAST(floor((datediff(date_trunc('day', max(ts)),"
            " date_trunc('day', min(ts))) + 1) / 2.0) AS BIGINT)"
        ).alias("half"),
    )
    u = (
        ev.crossJoin(F.broadcast(split))
        .groupBy("user_id")
        .agg(
            F.max(
                F.expr(
                    "CASE WHEN event_type = 'purchase'"
                    " AND datediff(date_trunc('day', ts), d0) < half"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("b1"),
            F.max(
                F.expr(
                    "CASE WHEN event_type = 'purchase'"
                    " AND datediff(date_trunc('day', ts), d0) >= half"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("b2"),
        )
    )
    cells = u.agg(
        F.sum(F.col("b1") * F.col("b2")).alias("a"),
        F.sum(F.col("b1") * (1 - F.col("b2"))).alias("b"),
        F.sum((1 - F.col("b1")) * F.col("b2")).alias("c"),
        F.sum((1 - F.col("b1")) * (1 - F.col("b2"))).alias("d"),
        F.count(F.lit(1)).alias("n"),
    )
    pe = (
        "((CAST(a + b AS DOUBLE) * (a + c)"
        " + CAST(c + d AS DOUBLE) * (b + d))"
        " / (CAST(n AS DOUBLE) * n))"
    )
    return cells.select(
        F.col("a").alias("n_both"),
        F.col("b").alias("n_lost"),
        F.col("c").alias("n_gained"),
        F.col("d").alias("n_never"),
        F.expr(
            "CASE WHEN b + c = 0 THEN NULL"
            " ELSE round((CAST(abs(b - c) AS DOUBLE) - 1.0)"
            " * (abs(b - c) - 1.0) / (b + c), 6) END"
        ).alias("mcnemar_chi2"),
        F.expr(
            f"CASE WHEN {pe} = 1.0 THEN NULL"
            f" ELSE round((CAST(a + d AS DOUBLE) / n - {pe})"
            f" / (1.0 - {pe}), 6) END"
        ).alias("cohen_kappa"),
    )


# ---------------------------------------------------------------------------
# F191 directly standardized conversion rates (activity-band strata)
# ---------------------------------------------------------------------------
@register(
    "users_standardized_rates",
    """
    WITH u AS (
        SELECT user_id,
               CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 'A' ELSE 'B' END AS grp,
               CAST(least(floor(count(*) / 20.0), 4) AS BIGINT) AS band,
               CAST(max(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY user_id
    ),
    std AS (
        SELECT band, CAST(count(*) AS BIGINT) AS w,
               CAST(sum(count(*)) OVER () AS BIGINT) AS wt
        FROM u GROUP BY band
    ),
    cell AS (
        SELECT grp, band, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(conv) AS BIGINT) AS k
        FROM u GROUP BY grp, band
    ),
    rates AS (
        SELECT grp,
               sum(CAST(k AS DOUBLE) / n) AS crude_unused,
               sum(CAST(cell.k AS DOUBLE) * std.w
                   / (CAST(cell.n AS DOUBLE) * std.wt))
                   AS std_rate,
               CAST(sum(k) AS BIGINT) AS kk,
               CAST(sum(n) AS BIGINT) AS nn
        FROM cell JOIN std ON std.band = cell.band
        GROUP BY grp
    )
    SELECT grp, nn AS n_users, kk AS n_converters,
           round(CAST(kk AS DOUBLE) / nn, 6) AS crude_rate,
           round(std_rate, 6) AS standardized_rate
    FROM rates ORDER BY grp
    """,
    doc="F191 directly standardized conversion rates: each md5 arm's "
    "per-activity-band conversion rates are re-weighted to the "
    "POOLED band mix (the epidemiology age-standardization recipe "
    "on engagement strata) — crude rates can order A ahead of B "
    "purely because A holds more heavy users (Simpson's trap; the "
    "standardized pair compares like with like and feeds F146's "
    "clustered machinery an honest point estimate). Counts exact; "
    "the 5-stratum weighted sum is a bounded reduce (F119 argument). "
    "One row per arm with crude vs standardized side by side.",
)
def users_standardized_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    u = _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("long")
        .alias("conv"),
    ).select(
        F.expr(
            "CASE WHEN substring(md5(CAST(user_id AS STRING)), 1, 1)"
            " < '8' THEN 'A' ELSE 'B' END"
        ).alias("grp"),
        F.expr("CAST(least(floor(n_ev / 20.0), 4) AS BIGINT)").alias(
            "band"
        ),
        "conv",
    )
    from pyspark.sql.window import Window as W

    std = u.groupBy("band").agg(F.count(F.lit(1)).alias("w"))
    std = std.select(
        "band", "w",
        F.sum("w")
        .over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .alias("wt"),
    )
    cell = u.groupBy("grp", "band").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    rates = (
        cell.join(F.broadcast(std), "band")
        .groupBy("grp")
        .agg(
            F.sum(
                F.expr(
                    "CAST(k AS DOUBLE) * w / (CAST(n AS DOUBLE) * wt)"
                )
            ).alias("std_rate"),
            F.sum("k").alias("kk"),
            F.sum("n").alias("nn"),
        )
    )
    return rates.select(
        "grp",
        F.col("nn").alias("n_users"),
        F.col("kk").alias("n_converters"),
        F.expr("round(CAST(kk AS DOUBLE) / nn, 6)").alias("crude_rate"),
        F.round("std_rate", 6).alias("standardized_rate"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# F192 Wilson score intervals for per-type user reach
# ---------------------------------------------------------------------------
@register(
    "events_type_reach_wilson",
    """
    WITH tot AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events
    ),
    reach AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS k
        FROM events GROUP BY event_type
    )
    SELECT event_type, k AS n_reached, n AS n_users,
           round(CAST(k AS DOUBLE) / n, 6) AS p_hat,
           round((CAST(k AS DOUBLE) / n + 3.841459 / (2.0 * n)
                  - 1.959964 * sqrt((CAST(k AS DOUBLE) / n)
                        * (1.0 - CAST(k AS DOUBLE) / n) / n
                        + 3.841459 / (4.0 * CAST(n AS DOUBLE) * n)))
                 / (1.0 + 3.841459 / n), 6) AS wilson_lo,
           round((CAST(k AS DOUBLE) / n + 3.841459 / (2.0 * n)
                  + 1.959964 * sqrt((CAST(k AS DOUBLE) / n)
                        * (1.0 - CAST(k AS DOUBLE) / n) / n
                        + 3.841459 / (4.0 * CAST(n AS DOUBLE) * n)))
                 / (1.0 + 3.841459 / n), 6) AS wilson_hi
    FROM reach CROSS JOIN tot ORDER BY event_type
    """,
    doc="F192 user reach per event type with WILSON score 95% "
    "intervals: p_hat = distinct users touching the type / all "
    "users, and the score interval (z=1.959964, z^2=3.841459) — the "
    "binomial CI that stays inside [0,1] and behaves at p near 0 or "
    "1 where the Wald interval (F85's +-1.96 sqrt(pq/n) habit) "
    "collapses — completing the interval toolkit (Woolf for ORs, "
    "order statistics for medians, Wilson for proportions). Counts "
    "exact; one shared fp expression per bound. One row per type.",
)
def events_type_reach_wilson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir)
    tot = ev.agg(F.countDistinct("user_id").cast("long").alias("n"))
    reach = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("k")
    )
    ph = "CAST(k AS DOUBLE) / n"
    rad = (
        f"1.959964 * sqrt(({ph}) * (1.0 - {ph}) / n"
        " + 3.841459 / (4.0 * CAST(n AS DOUBLE) * n))"
    )
    return reach.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("k").alias("n_reached"),
        F.col("n").alias("n_users"),
        F.expr(f"round({ph}, 6)").alias("p_hat"),
        F.expr(
            f"round(({ph} + 3.841459 / (2.0 * n) - {rad})"
            " / (1.0 + 3.841459 / n), 6)"
        ).alias("wilson_lo"),
        F.expr(
            f"round(({ph} + 3.841459 / (2.0 * n) + {rad})"
            " / (1.0 + 3.841459 / n), 6)"
        ).alias("wilson_hi"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# G8 degree assortativity of the supplier co-supply graph
# ---------------------------------------------------------------------------
@register(
    "supplier_cosupply_assortativity",
    """
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        WHERE l_quantity > 45
    ),
    e AS (
        SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    deg AS (
        SELECT v, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT s1 AS v FROM e UNION ALL SELECT s2 AS v FROM e)
        GROUP BY v
    ),
    ends AS (
        SELECT da.d AS j, db.d AS k FROM e
        JOIN deg da ON da.v = e.s1
        JOIN deg db ON db.v = e.s2
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS m,
               CAST(sum(j + k) AS BIGINT) AS s1,
               CAST(sum(j * k) AS BIGINT) AS sjk,
               CAST(sum(j * j + k * k) AS BIGINT) AS s2
        FROM ends
    )
    SELECT m AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           CASE WHEN 2.0 * m * s2 - CAST(s1 AS DOUBLE) * s1 = 0 THEN NULL
                ELSE round((4.0 * m * sjk - CAST(s1 AS DOUBLE) * s1)
                           / (2.0 * m * s2 - CAST(s1 AS DOUBLE) * s1), 6)
                END AS assortativity_r
    FROM s
    """,
    doc="G8 degree assortativity of the supplier co-supply graph "
    "(Newman 2002): the Pearson correlation of endpoint degrees over "
    "edges, r = (4m*sum(jk) - (sum(j+k))^2) / (2m*sum(j^2+k^2) - "
    "(sum(j+k))^2) — positive means hubs link hubs (resilient core), "
    "negative means hub-and-spoke (single-point fragility); THE "
    "topology scalar the G-series (triangles, k-core, CC, PageRank) "
    "still lacked. Degree joins are two broadcast-able dim joins on "
    "the edge list; all sums EXACT BIGINTs (d <= vertices, sum(j*k) "
    "< m*d_max^2 — bound noted), one shared fp expression, regular "
    "(all-equal-degree) graphs return NULL honestly. Single row.",
)
def supplier_cosupply_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("s2")
    )
    e = (
        a.join(
            b,
            (F.col("ok") == F.col("ok2")) & (F.col("s1") < F.col("s2")),
        )
        .select("s1", "s2")
        .distinct()
    )
    deg = (
        e.select(F.col("s1").alias("v"))
        .unionAll(e.select(F.col("s2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ends = (
        e.join(
            F.broadcast(deg.select(F.col("v").alias("s1"),
                                   F.col("d").alias("j"))),
            "s1",
        )
        .join(
            F.broadcast(deg.select(F.col("v").alias("s2"),
                                   F.col("d").alias("k"))),
            "s2",
        )
        .select("j", "k")
    )
    s = ends.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("j") + F.col("k")).alias("s1"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum(
            F.col("j") * F.col("j") + F.col("k") * F.col("k")
        ).alias("s2"),
    )
    nv = deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    return s.crossJoin(F.broadcast(nv)).select(
        F.col("m").alias("n_edges"),
        "n_vertices",
        F.expr(
            "CASE WHEN 2.0 * m * s2 - CAST(s1 AS DOUBLE) * s1 = 0"
            " THEN NULL"
            " ELSE round((4.0 * m * sjk - CAST(s1 AS DOUBLE) * s1)"
            " / (2.0 * m * s2 - CAST(s1 AS DOUBLE) * s1), 6) END"
        ).alias("assortativity_r"),
    )
