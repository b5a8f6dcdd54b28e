"""Time-series mining query surface (SURVEY.md §2.F extension, round 4):
M4 visualization downsampling, PAA/SAX symbolization, lead-lag
cross-correlation, DTW top-k similarity search, matrix-profile motif /
discord discovery.

These cover the "time-series similarity search" axis of the retrieved
paper corpus (PAPERS.md: distributed top-k trajectory similarity;
similarity search for streaming time-series) that the engine had not yet
surfaced as queries. Determinism rules as everywhere (queries.py
header): integer-µs bucket math with integer DIV (never float floor),
padded-string order keys for first/last, fp emitted rounded identically
in both engines, BIGINT casts on DuckDB integer sums.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_spark_spark.session import local_df

from time_series_spark_spark.operators.analytics import event_order_key
from time_series_spark_spark.operators.tsmining import (
    dtw_topk_sparse_self,
    lead_lag_corr,
    m4_downsample,
    matrix_profile,
    paa_sax,
    sax_words,
    series_vectors,
)
from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events")


_ORD_KEY = "printf('%020d-%012d', epoch_us(ts), event_id)"


# --------------------------------------------------------------------------
# F31 M4 downsampling
# --------------------------------------------------------------------------
@register(
    "events_m4_type",
    f"""
    WITH span AS (
        SELECT min(epoch_us(ts)) AS t_lo, max(epoch_us(ts)) AS t_hi
        FROM events
    ),
    b AS (
        SELECT event_type,
               CAST(least(99, ((epoch_us(ts) - t_lo) * 100)
                              // (t_hi - t_lo + 1)) AS INT) AS bucket,
               value,
               {_ORD_KEY} AS ok
        FROM events, span
    )
    SELECT event_type, bucket,
           min(value)               AS v_min,
           max(value)               AS v_max,
           arg_min(value, ok)       AS v_first,
           arg_max(value, ok)       AS v_last,
           CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY 1, 2
    """,
    doc="F31 M4 per-pixel downsampling (Jugel et al., VLDB 2014): 100 "
    "equal-width buckets over the global time range, min/max/first/last "
    "per (event_type, bucket) — the exact aggregation for pixel-perfect "
    "line rendering; one scalar-broadcast join + one hash aggregation, "
    "bucket math in integer µs with integer DIV so both engines agree "
    "bit-for-bit",
)
def events_m4_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return m4_downsample(
        _events(spark, sf_dir),
        "ts",
        "value",
        ["event_type"],
        event_order_key(),
        n_buckets=100,
    )


# --------------------------------------------------------------------------
# F32 PAA + SAX
# --------------------------------------------------------------------------
_PAA_ORACLE_CORE = f"""
    z AS (
        SELECT user_id,
               CASE WHEN stddev_samp(value) OVER w IS NULL
                      OR stddev_samp(value) OVER w = 0 THEN 0.0
                    ELSE (value - avg(value) OVER w)
                         / stddev_samp(value) OVER w END AS z,
               CAST(((row_number() OVER (PARTITION BY user_id ORDER BY {_ORD_KEY})
                      - 1) * 8) // (count(*) OVER w) AS INT) AS seg
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    ),
    p AS (
        SELECT user_id, seg, avg(z) AS paa_raw,
               CAST(count(*) AS BIGINT) AS n_points
        FROM z GROUP BY 1, 2
    )
"""


@register(
    "events_paa_sax_user",
    f"""
    WITH {_PAA_ORACLE_CORE}
    SELECT user_id, seg, round(paa_raw, 4) AS paa,
           CASE WHEN paa_raw < -0.6745 THEN 'a'
                WHEN paa_raw < 0      THEN 'b'
                WHEN paa_raw < 0.6745 THEN 'c'
                ELSE 'd' END AS symbol,
           n_points
    FROM p
    """,
    doc="F32 PAA + SAX (Lin/Keogh et al., DMKD 2003): per-user series "
    "z-normalized, split into 8 equal-count segments, per-segment mean "
    "mapped to a 4-letter Gaussian-breakpoint alphabet — window + hash "
    "agg only, no Python; symbols computed from the UNROUNDED mean in "
    "both engines so rounding can never flip a breakpoint comparison",
)
def events_paa_sax_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("_ok", event_order_key())
    out = paa_sax(ev, ["user_id"], "_ok", "value", n_segments=8)
    return out.select(
        "user_id",
        "seg",
        F.round("paa", 4).alias("paa"),
        "symbol",
        "n_points",
    )


@register(
    "events_sax_words_user",
    f"""
    WITH {_PAA_ORACLE_CORE}
    SELECT user_id,
           string_agg(CASE WHEN paa_raw < -0.6745 THEN 'a'
                           WHEN paa_raw < 0      THEN 'b'
                           WHEN paa_raw < 0.6745 THEN 'c'
                           ELSE 'd' END, '' ORDER BY seg) AS sax,
           CAST(count(*) AS INT) AS n_segments
    FROM p GROUP BY user_id
    """,
    doc="F32b one SAX word per user series — the indexable symbolization "
    "unit (equal words => bounded PAA distance); purely symbolic output, "
    "immune to fp rounding entirely",
)
def events_sax_words_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("_ok", event_order_key())
    return sax_words(ev, ["user_id"], "_ok", "value", n_segments=8)


# --------------------------------------------------------------------------
# F33 lead-lag cross-correlation
# --------------------------------------------------------------------------
@register(
    "events_lead_lag_corr",
    """
    WITH hourly AS (
        SELECT event_type,
               epoch_us(CAST(date_trunc('hour', ts) AS TIMESTAMP)) AS bkt,
               sum(value) AS v
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2
    ),
    a AS (SELECT bkt, v FROM hourly WHERE event_type = 'click'),
    b AS (SELECT bkt, v FROM hourly WHERE event_type = 'purchase'),
    lags AS (SELECT CAST(range AS INT) AS lag FROM range(-6, 7))
    SELECT lag,
           round(corr(a.v, b.v), 4)  AS r,
           CAST(count(*) AS BIGINT)  AS n_overlap
    FROM lags
    CROSS JOIN a
    JOIN b ON b.bkt = a.bkt + lag * 3600000000
    GROUP BY lag
    """,
    doc="F33 lead-lag scan: Pearson r between the hourly click-value and "
    "purchase-value series at every lag in [-6h, +6h] (positive lag => "
    "purchases trail clicks). One explode + one equi-join on the shifted "
    "bucket + one hash agg — no per-lag jobs; the distributed shape of "
    "cross-correlation feature scans",
)
def events_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            "event_type",
            F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("bkt"),
        )
        .agg(F.sum("value").alias("v"))
    )
    a = hourly.filter(F.col("event_type") == "click").select("bkt", "v")
    b = hourly.filter(F.col("event_type") == "purchase").select("bkt", "v")
    out = lead_lag_corr(a, b, "bkt", "v", max_lag=6, lag_step_us=3_600_000_000)
    return out.select(
        "lag", F.round("r", 4).alias("r"), F.col("n_overlap")
    )


# --------------------------------------------------------------------------
# F34 DTW top-k similarity search (rows-only: DP is not SQL-expressible)
# --------------------------------------------------------------------------
@register(
    "events_dtw_topk_user",
    None,  # dynamic-programming DTW is not SQL-expressible → rows-only;
    # exactness is pinned by tests/test_tsmining.py against the
    # brute-force all-candidates path (LB_Keogh admissibility)
    doc="F34 exact top-5 DTW-nearest user series to user 0's daily-sum "
    "series (Sakoe-Chiba band 10%, z-normalized), LB_Keogh-pruned: O(n) "
    "envelope bound for every candidate, exact O(n*band) DTW only for "
    "the k best-by-LB plus the provably-needed LB<=tau remainder "
    "(Keogh & Ratanamahatana, KAIS 2005) — the distributed shape of the "
    "retrieved top-k trajectory-similarity paper",
)
def events_dtw_topk_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sparse path (round 14, guide §4.2): ship (user, day-index, v) rows
    # and densify numpy-side inside the Arrow stage via dtw_topk_sparse.
    # The JVM map_from_entries + transform(sequence) dense build this
    # replaces ran per element INTERPRETED — 0.24 s single-threaded at
    # sf0.1, linear in corpus — while the scatter is one vectorized
    # assignment per batch. v values, the [0, n) grid, and the zero fill
    # are identical to the dense form (byte-identical output, pinned by
    # test_dtw_sparse_matches_dense and the brute-force exactness tests).
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    long = daily.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.datediff("d", "lo").alias("i"),
        "v",
        (F.datediff("hi", "lo") + F.lit(1)).alias("n"),
    )
    # The query user's series is folded into the plan (round 15, r14
    # verdict item 3): dtw_topk_sparse_self replicates user 0's sparse
    # rows to every shuffle partition (P × ~370 rows) and builds q, the
    # band and the Keogh envelope per task from the same float64 values
    # the driver-side collect produced — byte-identical top-k, no full
    # aggregation pass at query BUILD.
    return dtw_topk_sparse_self(
        long, "user_id", "i", "v", "n", query_key=0, k=5, band_frac=0.1
    )


# --------------------------------------------------------------------------
# F35 matrix profile (rows-only: FFT/DP per series, not SQL-expressible)
# --------------------------------------------------------------------------
@register(
    "events_matrix_profile_type",
    None,  # per-series FFT sliding-dot-product DP → rows-only; MASS
    # correctness is pinned by tests/test_tsmining.py against the O(n^2 m)
    # brute-force z-normalized distance profile
    doc="F35 matrix profile per event_type over the dense hourly count "
    "series (m=24h, MASS FFT sliding dot products, +-m/2 exclusion "
    "zone; Yeh et al., ICDM 2016): motif = most-repeated day-shape, "
    "discord = most anomalous day — per-series numpy parallelized "
    "across series on the packed grouped-map path",
)
def events_matrix_profile_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("double").alias("v")
    )
    return matrix_profile(dense, ["event_type"], "h", "v", m=24).orderBy(
        "event_type"
    )


# --------------------------------------------------------------------------
# F36 Kalman local-level smoothing (rows-only: recursive state, not SQL)
# --------------------------------------------------------------------------
@register(
    "events_kalman_user_daily",
    None,  # forward/backward state recursion → rows-only; smoothed mean
    # is pinned against the dense tridiagonal MAP solve in
    # tests/test_tsmining.py (exact equivalence, not a tolerance check)
    doc="F36 Kalman filter + RTS smoother (local-level state-space "
    "model, diffuse init) over each user's daily-sum series: the "
    "optimal linear denoiser with per-point posterior variance — O(n) "
    "per series on the packed grouped-map path, exact-MAP-equivalent "
    "by test",
)
def events_kalman_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import kalman_smooth

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.round(F.sum("value"), 6).alias("v"))
    out = kalman_smooth(daily, ["user_id"], "d", "v", q_var=4.0, r_var=25.0)
    return out.orderBy("user_id", "d")


# --------------------------------------------------------------------------
# F37 Kleinberg burst detection (rows-only: Viterbi DP, not SQL)
# --------------------------------------------------------------------------
@register(
    "events_bursts_per_user",
    None,  # 2-state Viterbi over inter-arrival gaps → rows-only;
    # planted-burst detection + Poisson-quietness pinned in
    # tests/test_tsmining.py
    doc="F37 Kleinberg 2-state burst automaton (KDD 2002) per user: "
    "maximal high-rate intervals (burst_start/end, n_events) from the "
    "exponential-gap Viterbi path — O(n) per series on the packed "
    "grouped-map path",
)
def events_bursts_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import kleinberg_bursts

    ev = _events(spark, sf_dir).select("user_id", "ts")
    return kleinberg_bursts(ev, ["user_id"], "ts", s=3.0, gamma=1.0).orderBy(
        "user_id", "burst_start"
    )


# --------------------------------------------------------------------------
# F46 series-shape clustering (rows-only: KMeans)
# --------------------------------------------------------------------------
@register(
    "events_series_shape_clusters",
    None,  # KMeans assignment → rows-only; planted ramp-vs-sine shape
    # separation pinned in tests/test_tsmining.py
    doc="F46 whole-series shape clustering: each user's daily series "
    "reduces to its z-normalized 8-segment PAA vector (scale/offset "
    "invariant) and MLlib KMeans groups the shapes — cluster sizes "
    "reported; the feature frame is one row per SERIES, so clustering "
    "cost is independent of points-per-series",
)
def events_series_shape_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import cluster_series_shapes

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum("value").alias("v"))
    out = cluster_series_shapes(
        daily, ["user_id"], "d", "v", n_segments=8, n_clusters=4
    )
    return (
        out.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_series"))
        .orderBy("cluster")
    )


# --------------------------------------------------------------------------
# F47 autocorrelation function (oracle-checked)
# --------------------------------------------------------------------------
@register(
    "events_acf_daily_total",
    """
    WITH d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT lag AS k, d.c AS y,
               lag(d.c, lag) OVER (PARTITION BY lag ORDER BY d.d) AS y_lag
        FROM d CROSS JOIN (SELECT CAST(range AS INT) AS lag
                           FROM range(1, 8))
    )
    SELECT k,
           CAST(count(y_lag) AS BIGINT) AS n_pairs,
           round(corr(CAST(y AS DOUBLE), CAST(y_lag AS DOUBLE)), 4) AS acf
    FROM lagged WHERE y_lag IS NOT NULL
    GROUP BY k
    """,
    doc="F47 autocorrelation function of the daily total-value series at "
    "lags 1..7 (the diagnostic behind every seasonality/stationarity "
    "decision): integer-cents daily sums, one lag-fanout cross join + "
    "per-lag window + corr — Pearson on identical integer operands in "
    "both engines",
)
def events_acf_daily_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    )
    # Spark's lag() needs a literal offset — fan the lags out by joining
    # each k to its row_number-shifted copy instead (the oracle's
    # per-partition lag(c, lag) computes the same pairs)
    rn = d.select(
        "c", F.row_number().over(Window.orderBy("d")).alias("i")
    )
    a = rn.select(F.col("i").alias("ia"), F.col("c").alias("y"))
    b = rn.select(F.col("i").alias("ib"), F.col("c").alias("y_lag"))
    ks = d.sparkSession.range(1, 8).select(F.col("id").cast("int").alias("k"))
    pairs = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("ib") == F.col("ia") - F.col("k"))
    )
    return pairs.groupBy("k").agg(
        F.count("y_lag").cast("long").alias("n_pairs"),
        F.round(
            F.corr(F.col("y").cast("double"), F.col("y_lag").cast("double")), 4
        ).alias("acf"),
    )


@register(
    "events_dominant_period",
    # round 12 (rows-only → oracle): the rfft periodogram is the DFT,
    # so each bin is a closed-form trig sum over the OLS-detrended
    # series (regr_slope/intercept ≡ polyfit deg-1 analytically); bins
    # 0 and 1 are excluded exactly as the engine zeroes them, argmax
    # breaks ties at the lowest bin like np.argmax, and power_frac is
    # the peak's share of the retained bins' total. ~1.3M trig terms in
    # DuckDB at test scale — an oracle cost, not an engine cost (the
    # engine stays O(n log n) FFT per series).
    """
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(count(*) AS DOUBLE) AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (SELECT unnest(generate_series(
                        (SELECT lo FROM span), (SELECT hi FROM span),
                        INTERVAL 1 HOUR)) AS h) g
    ),
    dense AS (
        SELECT g.event_type, g.h, coalesce(hh.v, 0.0) AS v,
               CAST(row_number() OVER (PARTITION BY g.event_type
                                       ORDER BY g.h) - 1 AS DOUBLE) AS t,
               count(*) OVER (PARTITION BY g.event_type) AS n
        FROM grid g LEFT JOIN hourly hh USING (event_type, h)
    ),
    fit AS (
        SELECT event_type, regr_slope(v, t) AS sl, regr_intercept(v, t) AS ic
        FROM dense GROUP BY 1 HAVING count(*) >= 8
    ),
    resid AS (
        SELECT d.event_type, d.t, d.n, d.v - (f.sl * d.t + f.ic) AS r
        FROM dense d JOIN fit f USING (event_type)
    ),
    js AS (
        SELECT unnest(generate_series(
            2, (SELECT max(n) // 2 FROM dense))) AS j
    ),
    bins AS (
        SELECT r.event_type, js.j, any_value(r.n) AS n,
               sum(r.r * cos(2 * pi() * js.j * r.t / r.n)) AS cr,
               sum(r.r * sin(2 * pi() * js.j * r.t / r.n)) AS sr
        FROM resid r JOIN js ON js.j <= r.n // 2
        GROUP BY 1, 2
    ),
    spec AS (
        SELECT event_type, j, n, cr * cr + sr * sr AS p,
               sum(cr * cr + sr * sr) OVER (PARTITION BY event_type)
                   AS total,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cr * cr + sr * sr DESC, j)
                   AS rk
        FROM bins
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_points,
           round(n / j, 4) AS period, round(p / total, 4) AS power_frac
    FROM spec WHERE rk = 1 AND total > 0
    ORDER BY event_type
    """,
    doc="F48 dominant-period estimation per event_type: least-squares "
    "detrend + periodogram peak over the dense hourly count series — "
    "the automatic season detector feeding F7/F7b period choices; "
    "packed grouped map, O(n log n) per series",
)
def events_dominant_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import dominant_periods

    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("v"))
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("v", F.lit(0.0)).alias("v")
    )
    return dominant_periods(dense, ["event_type"], "h", "v").orderBy(
        "event_type"
    )


@register(
    "events_hurst_user",
    # round 12 (rows-only → oracle): R/S analysis is block-local window
    # math end-to-end — per (user, scale w): disjoint blocks of w points,
    # R = range of the mean-adjusted cumulative sum, S = population std,
    # rs_w = mean(R/S over blocks with S>0); H = OLS slope of ln(rs) on
    # ln(w) (regr_slope; r² = corr² — identical to the engine's polyfit
    # analytically). The doubling scale ladder is a fixed list filtered
    # by w <= n//2, exactly the engine's loop. Only the log-log fit's
    # last digits are fp-sensitive; round(…, 4) matches the engine's.
    """
    WITH hourly AS (
        SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT min(h) AS lo, max(h) AS hi FROM hourly),
    grid AS (
        SELECT u.user_id, g.h
        FROM (SELECT DISTINCT user_id FROM hourly) u
        CROSS JOIN (SELECT unnest(generate_series(
                        (SELECT lo FROM span), (SELECT hi FROM span),
                        INTERVAL 1 HOUR)) AS h) g
    ),
    dense AS (
        SELECT g.user_id, g.h,
               CAST(coalesce(hh.v, 0) AS DOUBLE) AS v,
               row_number() OVER (PARTITION BY g.user_id ORDER BY g.h) - 1
                   AS idx,
               count(*) OVER (PARTITION BY g.user_id) AS n
        FROM grid g LEFT JOIN hourly hh USING (user_id, h)
    ),
    scales AS (SELECT unnest([8, 16, 32, 64, 128, 256, 512, 1024, 2048,
                              4096, 8192, 16384]) AS w),
    blocks AS (
        SELECT d.user_id, s.w, CAST(floor(d.idx / s.w) AS BIGINT) AS b,
               d.idx, d.v
        FROM dense d JOIN scales s ON s.w <= d.n // 2
        WHERE d.idx < (d.n // s.w) * s.w
    ),
    bm AS (
        SELECT user_id, w, b, avg(v) AS m, stddev_pop(v) AS s
        FROM blocks GROUP BY 1, 2, 3
    ),
    cums AS (
        SELECT bl.user_id, bl.w, bl.b,
               sum(bl.v - bm.m) OVER (
                   PARTITION BY bl.user_id, bl.w, bl.b
                   ORDER BY bl.idx ROWS UNBOUNDED PRECEDING) AS y
        FROM blocks bl JOIN bm USING (user_id, w, b)
    ),
    rs_block AS (
        SELECT user_id, w, b, max(y) - min(y) AS r
        FROM cums GROUP BY 1, 2, 3
    ),
    rs AS (
        SELECT rb.user_id, rb.w, avg(rb.r / bm.s) AS rs_w
        FROM rs_block rb JOIN bm USING (user_id, w, b)
        WHERE bm.s > 0
        GROUP BY 1, 2
    ),
    fit AS (
        SELECT user_id,
               regr_slope(ln(rs_w), ln(CAST(w AS DOUBLE))) AS hexp,
               CASE WHEN var_pop(ln(rs_w)) = 0 THEN 1.0
                    ELSE corr(ln(rs_w), ln(CAST(w AS DOUBLE))) ** 2
               END AS r2,
               CAST(count(*) AS BIGINT) AS n_scales
        FROM rs GROUP BY user_id HAVING count(*) >= 2
    )
    SELECT f.user_id, CAST(d.n AS BIGINT) AS n_points,
           round(f.hexp, 4) AS hurst, round(f.r2, 4) AS fit_r2,
           f.n_scales
    FROM fit f JOIN (SELECT DISTINCT user_id, n FROM dense) d
      USING (user_id)
    WHERE isfinite(f.hexp) AND d.n >= 32
    ORDER BY f.user_id
    """,
    doc="Hurst exponent (R/S, Mandelbrot-Wallis) per user over the dense "
    "0-filled HOURLY value-cents series (the 30-day corpus gives ~720 "
    "hourly points — six R/S scales — where daily would give one): "
    "H≈0.5 noise, >0.5 persistent, <0.5 mean-reverting — the "
    "long-memory diagnostic that says whether momentum features carry "
    "signal for F7 forecasting. Dense grid (inactive hours are real "
    "zeros, not missing data) via one sequence explode; then the packed "
    "grouped-map shape shared with matrix profile / Kalman",
)
def events_hurst_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import hurst_rs_sparse

    # The dense zero-filled hourly grid is 1500 users × 720 hours = 1.08M
    # rows, but only ~96k cells are non-zero: ship the SPARSE cells
    # (hour index within the shared [lo, hi] grid) and scatter into the
    # dense numpy vector inside the Arrow stage — the grid explode, the
    # dense left join, and the 11×-larger shuffle/Arrow transfer never
    # happen. UTC session + hour-aligned lo make the index arithmetic
    # exact ((unix(ts) − unix(lo)) div 3600 == position of
    # date_trunc('hour', ts) in sequence(lo, hi, interval 1 hour)).
    ev = _events(spark, sf_dir)
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    sparse = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            (
                (F.col("ts").cast("long") - F.col("lo").cast("long"))
                / F.lit(3600)
            )
            .cast("long")
            .alias("idx"),
            (
                (F.col("hi").cast("long") - F.col("lo").cast("long"))
                / F.lit(3600)
                + 1
            )
            .cast("long")
            .alias("n"),
        )
        .agg(F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("v"))
        .withColumn("v", F.col("v").cast("double"))
    )
    return hurst_rs_sparse(
        sparse, ["user_id"], "idx", "n", "v"
    ).orderBy("user_id")


@register(
    "events_cluster_silhouette_scan",
    None,  # KMeans + evaluator → rows-only; monotone/boundary laws and
    # planted two-cluster recovery pinned in tests/test_tsmining.py
    doc="N5b clustering model selection: squared-Euclidean silhouette "
    "(MLlib ClusteringEvaluator) scanned over k ∈ {2,3,4,6} on the N5 "
    "z-PAA shape features of per-user daily series — the k-chooser "
    "report a user runs before trusting N5's clusters. One cached "
    "one-row-per-series feature frame; each fit touches only it",
)
def events_cluster_silhouette_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import (
        cluster_silhouette_report,
    )

    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.sum("value").alias("v"))
    return cluster_silhouette_report(
        daily, ["user_id"], "d", "v"
    ).orderBy("k")


@register(
    "events_pacf_daily_total",
    # round 12 (rows-only → oracle): the Durbin-Levinson recursion is 7
    # rounds of scalar arithmetic over the 8 autocovariances, so a
    # RECURSIVE CTE carrying the φ vector as a DuckDB list runs the
    # IDENTICAL recurrence (same fold order as the engine's Python
    # sums — left-assoc); only the distributed γ_k sums differ in fp
    # association, absorbed by the 6-decimal rounding.
    """
    WITH RECURSIVE d AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    st AS (SELECT count(*) AS n, avg(c) AS mu FROM d),
    rn AS (
        SELECT CAST(c AS DOUBLE) - (SELECT mu FROM st) AS y,
               row_number() OVER (ORDER BY d) AS i
        FROM d
    ),
    g AS (
        SELECT k.k, sum(a.y * b.y) / (SELECT n FROM st) AS g
        FROM rn a
        CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k) k
        JOIN rn b ON b.i = a.i - k.k
        GROUP BY k.k
    ),
    rho AS (
        SELECT [max(CASE WHEN k = 1 THEN g END) / max(CASE WHEN k = 0 THEN g END),
                max(CASE WHEN k = 2 THEN g END) / max(CASE WHEN k = 0 THEN g END),
                max(CASE WHEN k = 3 THEN g END) / max(CASE WHEN k = 0 THEN g END),
                max(CASE WHEN k = 4 THEN g END) / max(CASE WHEN k = 0 THEN g END),
                max(CASE WHEN k = 5 THEN g END) / max(CASE WHEN k = 0 THEN g END),
                max(CASE WHEN k = 6 THEN g END) / max(CASE WHEN k = 0 THEN g END),
                max(CASE WHEN k = 7 THEN g END) / max(CASE WHEN k = 0 THEN g END)]
            AS r
        FROM g
    ),
    dl AS (
        SELECT 1 AS k, [r[1]] AS phi FROM rho
        UNION ALL
        SELECT dl.k + 1,
               list_append(
                   list_transform(generate_series(1, dl.k), j ->
                       dl.phi[j]
                       - ((rho.r[dl.k + 1]
                           - list_sum(list_transform(
                                 generate_series(1, dl.k),
                                 jj -> dl.phi[jj] * rho.r[dl.k + 1 - jj])))
                          / (1.0
                             - list_sum(list_transform(
                                   generate_series(1, dl.k),
                                   jj -> dl.phi[jj] * rho.r[jj]))))
                         * dl.phi[dl.k + 1 - j]),
                   (rho.r[dl.k + 1]
                    - list_sum(list_transform(generate_series(1, dl.k),
                          jj -> dl.phi[jj] * rho.r[dl.k + 1 - jj])))
                   / (1.0
                      - list_sum(list_transform(generate_series(1, dl.k),
                            jj -> dl.phi[jj] * rho.r[jj]))))
        FROM dl, rho WHERE dl.k < 7
    )
    SELECT CAST(k AS INTEGER) AS k, round(phi[k], 6) AS pacf
    FROM dl ORDER BY k
    """,
    doc="F47b partial autocorrelation function of the daily total-value "
    "series at lags 1..7 — the other half of the Box-Jenkins "
    "identification panel next to F47's ACF (PACF cutoff picks AR "
    "order, ACF cutoff picks MA order). Biased autocovariances "
    "gamma_k are computed distributed (demeaned integer-cents daily "
    "series, lag-fanout join exactly like F47); only the 8 gamma "
    "scalars reach the driver, where the Durbin-Levinson recursion "
    "(= Yule-Walker solve) is O(maxlag^2) arithmetic.",
)
def events_pacf_daily_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    maxlag = 7
    ev = _events(spark, sf_dir)
    d = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("d")).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c")
    )
    # (n, mu) folded into the plan as a broadcast cross-joined 1-row
    # aggregate instead of a driver collect at query BUILD (round 15,
    # r14 verdict item 3) — the demean and the /n normalization read
    # the same doubles from the joined columns, so the gammas are
    # bit-identical; only the 8 gamma scalars still reach the driver
    # (they feed the O(maxlag²) Durbin-Levinson recursion, which IS the
    # query's final local arithmetic).
    stats = d.agg(
        F.count(F.lit(1)).alias("__n"), F.avg(F.col("c")).alias("__mu")
    )
    rn = d.crossJoin(F.broadcast(stats)).select(
        (F.col("c").cast("double") - F.col("__mu")).alias("y"),
        F.row_number().over(Window.orderBy("d")).alias("i"),
        "__n",
    )
    a = rn.select(F.col("i").alias("ia"), F.col("y").alias("ya"), "__n")
    b = rn.select(F.col("i").alias("ib"), F.col("y").alias("yb"))
    ks = d.sparkSession.range(0, maxlag + 1).select(
        F.col("id").cast("int").alias("k")
    )
    gam = {
        r["k"]: float(r["g"])
        for r in (
            a.crossJoin(F.broadcast(ks))
            .join(b, F.col("ib") == F.col("ia") - F.col("k"))
            .groupBy("k")
            .agg(
                (
                    F.sum(F.col("ya") * F.col("yb")) / F.first("__n")
                ).alias("g")
            )
            .collect()
        )
    }
    # Durbin-Levinson on the driver: 8 scalars in, 7 PACF values out
    rho = [gam[k] / gam[0] for k in range(maxlag + 1)]
    pacf = []
    phi_prev: list[float] = []
    for k in range(1, maxlag + 1):
        if k == 1:
            phi_kk = rho[1]
            phi = [phi_kk]
        else:
            num = rho[k] - sum(
                phi_prev[j] * rho[k - 1 - j] for j in range(k - 1)
            )
            den = 1.0 - sum(phi_prev[j] * rho[j + 1] for j in range(k - 1))
            phi_kk = num / den
            phi = [
                phi_prev[j] - phi_kk * phi_prev[k - 2 - j]
                for j in range(k - 1)
            ] + [phi_kk]
        pacf.append((k, round(phi_kk, 6)))
        phi_prev = phi
    return local_df(spark, pacf, "k int, pacf double")


@register(
    "events_lomb_scargle_user",
    # round 12 (rows-only → oracle): the Lomb-Scargle periodogram on a
    # FIXED 8-period grid is closed-form trig-sum math — two aggregation
    # passes (sin/cos sums → tau, then the tau-shifted component sums)
    # and a first-max argmax (row_number over p DESC, grid index ASC ≡
    # np.argmax's first-occurrence rule). t is seconds from each
    # series' first sample via epoch_ns/1e9, the engine's exact
    # derivation, so both engines feed identical doubles into the same
    # formula; ls_power rounds at 4.
    """
    WITH pts AS (
        SELECT user_id,
               epoch_ns(ts) / 1000000000.0 AS tsec,
               CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS v
        FROM events
    ),
    base AS (
        SELECT user_id,
               tsec - min(tsec) OVER (PARTITION BY user_id) AS t, v
        FROM pts
    ),
    stats AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               avg(v) AS ybar, var_samp(v) AS s2
        FROM base GROUP BY user_id
        HAVING count(*) >= 16 AND var_samp(v) > 0
    ),
    wgrid AS (
        SELECT gi, ph, 2 * pi() / (ph * 3600.0) AS w
        FROM (VALUES (1, 6.0), (2, 12.0), (3, 24.0), (4, 48.0),
                     (5, 84.0), (6, 168.0), (7, 336.0), (8, 672.0))
            AS g(gi, ph)
    ),
    s1 AS (
        SELECT b.user_id, g.gi, g.ph, g.w,
               sum(sin(2 * g.w * b.t)) AS s2w,
               sum(cos(2 * g.w * b.t)) AS c2w
        FROM base b JOIN stats st USING (user_id) CROSS JOIN wgrid g
        GROUP BY 1, 2, 3, 4
    ),
    tau AS (
        SELECT user_id, gi, ph, w, atan2(s2w, c2w) / (2 * w) AS tau
        FROM s1
    ),
    comp AS (
        SELECT b.user_id, ta.gi, ta.ph,
               sum(cos(ta.w * b.t - ta.w * ta.tau) * (b.v - st.ybar)) AS cd,
               sum(sin(ta.w * b.t - ta.w * ta.tau) * (b.v - st.ybar)) AS sd,
               sum(cos(ta.w * b.t - ta.w * ta.tau) ** 2) AS cc,
               sum(sin(ta.w * b.t - ta.w * ta.tau) ** 2) AS ss
        FROM base b
        JOIN stats st USING (user_id)
        JOIN tau ta ON ta.user_id = b.user_id
        GROUP BY 1, 2, 3
    ),
    pw AS (
        SELECT c.user_id, c.gi, c.ph,
               (c.cd * c.cd / c.cc
                + c.sd * c.sd / greatest(c.ss, 1e-300)) / (2 * st.s2) AS p
        FROM comp c JOIN stats st USING (user_id)
    ),
    best AS (
        SELECT user_id, ph, p,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY p DESC, gi) AS rk
        FROM pw
    )
    SELECT b.user_id, st.n AS n_points, b.ph AS best_period_hours,
           round(b.p, 4) AS ls_power
    FROM best b JOIN stats st USING (user_id)
    WHERE b.rk = 1 ORDER BY b.user_id
    """,
    doc="F135 Lomb-Scargle dominant period per user over the RAW "
    "irregular event stream (timestamps as sampled, values in cents) "
    "— the period detector for series F48's FFT cannot handle "
    "(no densification, no regular grid; the astronomy-standard "
    "estimator for uneven sampling). Fixed period grid 6h..28d, "
    "variance-normalized power (P ~ Exp(1) per frequency under white "
    "noise). One hash shuffle on user_id -> packed grouped map, "
    "numpy outer-product over the whole grid per Arrow batch.",
)
def events_lomb_scargle_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import (
        lomb_scargle_periods,
    )

    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").cast("double").alias(
            "v"
        ),
    )
    return lomb_scargle_periods(ev, ["user_id"], "ts", "v").orderBy(
        "user_id"
    )


@register(
    "events_pelt_changepoints",
    None,  # optimal DP segmentation -> rows-only; exact equivalence with
    # the unpruned O(n^2) DP and planted recovery pinned in
    # tests/test_tsmining.py
    doc="F139 PELT optimal multi-changepoint segmentation of the daily "
    "value-cents series per event_type (Killick 2012): exact minimum "
    "of sum SSE + beta*k via the pruned DP — the OPTIMAL counterpart "
    "to greedy F108 binseg (binseg can misplace breaks when shifts "
    "interact; PELT provably cannot) with beta = 2*sigma^2*ln(n) from "
    "the lag-1 difference variance. One hash shuffle to pre-reduce to "
    "(type, day), one packed grouped map over the bounded day frame; "
    "output one row per detected segment with start day, length, and "
    "mean (operators/tsmining.py::pelt_changepoints).",
)
def events_pelt_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.tsmining import pelt_changepoints

    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("d")
        )
        .agg(
            F.expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)")
            .alias("v")
        )
    )
    return pelt_changepoints(daily, ["event_type"], "d", "v").orderBy(
        "event_type", "seg_idx"
    )
