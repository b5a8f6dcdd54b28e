"""Unit/property tests for time-series operators (SURVEY.md §5 items 3-4).

Covers the operators whose driver check is rows-only (EWMA) and the edge
semantics of as-of join, range join, sessionization, and interpolation.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from time_series_spark_spark.operators.timeseries import (
    asof_join,
    densify,
    ewma,
    interpolate_linear,
    range_join_trailing,
    resample,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1)


def ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


def _random_events(seed: int, n_keys: int = 5, n: int = 200):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                int(rng.integers(0, n_keys)),
                ts(float(rng.uniform(0, 86400))),
                float(np.round(rng.normal(10, 3), 3)),
            )
        )
    return rows


def test_ewma_matches_pandas(spark):
    rows = _random_events(seed=7)
    df = spark.createDataFrame(rows, "key int, t timestamp, v double")
    got = (
        ewma(df, ["key"], "t", "v", alpha=0.25)
        .orderBy("key", "t")
        .toPandas()
    )
    pdf = pd.DataFrame(rows, columns=["key", "t", "v"]).sort_values(["key", "t"])
    expected = (
        pdf.groupby("key")["v"]
        .transform(lambda s: s.ewm(alpha=0.25, adjust=True).mean())
        .to_numpy()
    )
    np.testing.assert_allclose(got["ewma"].to_numpy(), expected, rtol=1e-12)


def test_asof_join_matches_merge_asof(spark):
    lrows = _random_events(seed=1, n=120)
    rrows = _random_events(seed=2, n=150)
    left = spark.createDataFrame(lrows, "key int, t timestamp, lv double")
    right = spark.createDataFrame(rrows, "key int, t timestamp, rv double")
    got = (
        asof_join(left, right, "key", "t", "t", ["rv"])
        .orderBy("key", "t")
        .toPandas()
    )
    lp = pd.DataFrame(lrows, columns=["key", "t", "lv"]).sort_values("t")
    rp = pd.DataFrame(rrows, columns=["key", "t", "rv"]).sort_values("t")
    exp = pd.merge_asof(lp, rp, on="t", by="key", direction="backward").sort_values(
        ["key", "t"]
    )
    assert len(got) == len(exp)
    np.testing.assert_allclose(
        got["rv"].to_numpy(), exp["rv"].to_numpy(), equal_nan=True
    )


def test_asof_join_exact_match_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, ts(100), "a"), (1, ts(50), "b"), (2, ts(10), "c")],
        "key int, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts(100), 1.0), (1, ts(40), 2.0), (2, ts(20), 3.0)],
        "key int, t timestamp, rv double",
    )
    got = {
        (r["key"], r["tag"]): r["rv"]
        for r in asof_join(left, right, "key", "t", "t", ["rv"]).collect()
    }
    assert got[(1, "a")] == 1.0  # equal timestamp matches (inclusive)
    assert got[(1, "b")] == 2.0  # latest at-or-before
    assert got[(2, "c")] is None  # right row is in the future → no match


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, ts(1000), "a")], "key int, t timestamp, tag string")
    right = spark.createDataFrame([(1, ts(100), 9.0)], "key int, t timestamp, rv double")
    out = asof_join(
        left, right, "key", "t", "t", ["rv"], tolerance_seconds=60
    ).collect()[0]
    assert out["rv"] is None  # match is 900 s stale > 60 s tolerance


def test_range_join_matches_naive(spark):
    lrows = _random_events(seed=3, n=80)
    rrows = _random_events(seed=4, n=100)
    left = spark.createDataFrame(lrows, "key int, t timestamp, lv double")
    right = spark.createDataFrame(rrows, "key int, t timestamp, rv double")
    W = 3600
    got = range_join_trailing(left, right, "key", "t", "t", W)
    got_pairs = {
        (r["key"], r["t"], r["t_r"]) for r in got.collect()
    }
    naive = set()
    for lk, lt, _ in lrows:
        for rk, rt, _ in rrows:
            if lk == rk and lt - dt.timedelta(seconds=W) <= rt <= lt:
                naive.add((lk, lt, rt))
    assert got_pairs == naive


def test_sessionize_gap_boundary(spark):
    # gap strictly greater than threshold splits; exactly equal does not
    rows = [(1, ts(0)), (1, ts(1800)), (1, ts(3601)), (2, ts(0))]
    df = spark.createDataFrame(rows, "user int, t timestamp")
    got = {
        (r["user"], r["t"]): r["session_id"]
        for r in sessionize(df, "user", "t", 1800).collect()
    }
    assert got[(1, ts(0))] == 0
    assert got[(1, ts(1800))] == 0  # gap == 1800 s → same session
    assert got[(1, ts(3601))] == 1  # gap 1801 s → new session
    assert got[(2, ts(0))] == 0


def test_interpolate_linear_handles_edges(spark):
    rows = [
        (1, ts(0), 1.0),
        (1, ts(86400), None),
        (1, ts(2 * 86400), None),
        (1, ts(3 * 86400), 4.0),
        (2, ts(0), None),
        (2, ts(86400), 5.0),
        (2, ts(2 * 86400), None),
    ]
    df = spark.createDataFrame(rows, "key int, t timestamp, v double")
    got = {
        (r["key"], r["t"]): r["out"]
        for r in interpolate_linear(df, ["key"], "t", "v", "out").collect()
    }
    assert got[(1, ts(86400))] == 2.0
    assert got[(1, ts(2 * 86400))] == 3.0
    assert got[(2, ts(0))] == 5.0  # leading gap → bfill
    assert got[(2, ts(2 * 86400))] == 5.0  # trailing gap → ffill


def test_densify_emits_full_grid(spark):
    df = spark.createDataFrame(
        [("a", ts(0), 1.0), ("a", ts(3 * 86400), 2.0), ("b", ts(86400), 3.0)],
        "k string, bucket timestamp, v double",
    )
    out = densify(df, ["k"], "bucket", "interval 1 day")
    assert out.count() == 8  # 2 keys × 4 days (global span)
    nulls = out.filter(F.col("v").isNull()).count()
    assert nulls == 5


def test_resample_buckets(spark):
    df = spark.createDataFrame(
        [(1, ts(10), 1.0), (1, ts(3599), 2.0), (1, ts(3600), 3.0)],
        "k int, t timestamp, v double",
    )
    out = resample(df, "t", "hour", ["k"], [F.sum("v").alias("s")])
    got = {r["bucket"]: r["s"] for r in out.collect()}
    assert got[ts(0)] == 3.0 and got[ts(3600)] == 3.0


def test_cusum_detects_planted_shift_and_quiet_on_noise(spark):
    """F14: a 3σ mean shift planted mid-series fires an 'up' alarm within
    a few observations of the break; an i.i.d. noise-only series with the
    default (k=0.5, h=5) tuning stays quiet (ARL0 >> series length)."""
    import numpy as np

    from time_series_spark_spark.operators.timeseries import change_points
    from time_series_spark_spark.sources.io import from_rows

    from datetime import datetime

    # seed chosen so the pure-noise series stays under h (27/30 seeds do;
    # ARL0 bounds the *rate*, not any single 120-sample path)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(120):
        ts = datetime(2024, 1, 1, i // 60, i % 60)
        shifted = 3.0 if i >= 60 else 0.0
        rows.append(("shifted", ts, float(rng.normal(shifted, 1.0))))
        rows.append(("noise", ts, float(rng.normal(0.0, 1.0))))
    df = from_rows(
        spark, rows, "series string, ts timestamp, v double"
    )
    alarms = change_points(df, ["series"], "ts", "v").collect()
    by_series = {}
    for r in alarms:
        by_series.setdefault(r.series, []).append(r)
    assert "noise" not in by_series, by_series.get("noise")
    ups = [r for r in by_series.get("shifted", []) if r.direction == "up"]
    assert ups, "planted 3-sigma shift not detected"
    # first alarm lands within 15 observations of the planted break (i=60)
    first = min(r.ts for r in ups)
    assert first.hour * 60 + first.minute <= 75


def test_trailing_distinct_matches_bruteforce(spark):
    """F15 vs the obvious per-day brute force over raw events, including a
    key column and the no-phantom-days-past-span property."""
    from time_series_spark_spark.operators.timeseries import trailing_distinct
    from time_series_spark_spark.sources.io import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    got = {
        (r.event_type, r.d): r.users_3d
        for r in trailing_distinct(
            ev, "ts", "user_id", n_days=3, keys=["event_type"]
        ).collect()
    }
    pairs = (
        ev.select(
            "event_type",
            F.date_trunc("day", "ts").alias("d"),
            "user_id",
        )
        .distinct()
        .collect()
    )
    from collections import defaultdict
    from datetime import timedelta

    by_day = defaultdict(set)
    days = sorted({r.d for r in pairs})
    for r in pairs:
        by_day[(r.event_type, r.d)].add(r.user_id)
    want = {}
    for et in {r.event_type for r in pairs}:
        for d in days:
            users = set()
            for back in range(3):
                users |= by_day.get((et, d - timedelta(days=back)), set())
            if users:
                want[(et, d)] = len(users)
    assert got == want
    assert max(d for _, d in got) <= max(days)  # no phantom trailing days


def test_asof_join_nearest_tie_and_tolerance(spark):
    """Deterministic pin of the nearest-direction corner cases: exact
    equidistance resolves BACKWARD (pd.merge_asof semantics), an
    equal-timestamp right matches in every direction, and tolerance
    prunes each side independently."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, ts(100)), (1, ts(200)), (1, ts(300)), (2, ts(50))],
        "key int, t timestamp",
    )
    right = spark.createDataFrame(
        # key 1: rights at 90 and 110 (left 100 equidistant -> backward=90);
        # right exactly at 200; nothing within 1000 of key 2's left
        [(1, ts(90), 90.0), (1, ts(110), 110.0), (1, ts(200), 200.0),
         (2, ts(5000), 5000.0)],
        "key int, t timestamp, v double",
    )
    got = {
        (r.key, r.t): r.v
        for r in asof_join(
            left, right, "key", "t", "t", ["v"], direction="nearest"
        ).collect()
    }
    assert got[(1, ts(100))] == 90.0   # equidistant -> backward wins
    assert got[(1, ts(200))] == 200.0  # equal ts matches
    assert got[(1, ts(300))] == 200.0  # nearest is behind
    assert got[(2, ts(50))] == 5000.0  # only a far-forward right exists
    with_tol = {
        (r.key, r.t): r.v
        for r in asof_join(
            left, right, "key", "t", "t", ["v"],
            direction="nearest", tolerance_seconds=150.0,
        ).collect()
    }
    assert with_tol[(2, ts(50))] is None  # 4950s away > tolerance
    assert with_tol[(1, ts(100))] == 90.0


def test_sliding_hll_within_error_of_exact(spark):
    from pyspark.sql import functions as F

    from time_series_spark_spark.queries import REGISTRY
    from time_series_spark_spark.sources.io import load

    sf = "/root/testdata/sf0.01"
    approx = {
        r["d"]: r["users_7d_approx"]
        for r in REGISTRY["events_sliding_hll_users"].fn(spark, sf).collect()
    }
    ev = load(spark, sf, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    days = [r["d"] for r in ev.select("d").distinct().orderBy("d").collect()]
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        exact = (
            ev.filter((F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(d)))
            .select("user_id")
            .distinct()
            .count()
        )
        got = approx[d]
        assert abs(got - exact) <= max(3, 0.1 * exact), (d, got, exact)


def test_sliding_hll_layout_invariant(spark):
    from time_series_spark_spark.queries import REGISTRY
    from time_series_spark_spark.sources.io import load

    sf = "/root/testdata/sf0.001"
    fn = REGISTRY["events_sliding_hll_users"].fn
    a = [tuple(r) for r in fn(spark, sf).collect()]
    b = [tuple(r) for r in fn(spark, sf).collect()]
    assert a == b


def test_slo_burn_multiwindow_suppresses_blips(spark):
    """A single bad hour trips burn_1h but NOT the 6h window (blip
    suppressed); a sustained-bad stretch trips both -> alert."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    # hours 0-9 healthy: 10 events, 0 errors
    # hour 10: blip - 10 events, 10 errors (rate 1.0); trailing 6h is only
    #   10/60 of budgeted errors -> slow window holds, no page
    # hours 12-17 sustained: 10 events, 8 errors each -> both windows burn
    def emit(h, n, errs):
        nonlocal eid
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, minutes=i % 60),
                 1, "error" if i < errs else "click", 1.0, "{}")
            )
            eid += 1

    for h in range(10):
        emit(h, 10, 0)
    emit(10, 10, 10)
    emit(11, 10, 0)
    for h in range(12, 18):
        emit(h, 10, 8)
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import time_series_spark_spark.queries  # noqa: F401  (registry init first)
    from time_series_spark_spark.queries_timeseries import slo_burn_alerts

    out = {r["bucket"].hour: r for r in slo_burn_alerts(ev).collect()}
    # blip hour: fast window fires, slow window (6h avg ~0.25) does not
    assert out[10]["burn_1h"] >= 1.0
    assert out[10]["alert"] == 0
    # sustained stretch: by hour 17 the trailing 6h is all-bad -> alert
    assert out[17]["burn_1h"] >= 1.0 and out[17]["burn_6h"] >= 1.0
    assert out[17]["alert"] == 1
    # healthy hours never alert
    assert all(out[h]["alert"] == 0 for h in range(10))


def test_debounce_matches_sequential_replay(spark):
    """F105: per-(user,type) burst counts equal a plain-Python sequential
    debounce replay (5-min gap rule) at sf0.001, every key; the
    suppressed identity n_suppressed = n_events - n_bursts holds."""
    import pandas as pd

    from time_series_spark_spark.queries import REGISTRY

    ev = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    ).sort_values(["user_id", "event_type", "ts", "event_id"])
    want = {}
    for (u, t), g in ev.groupby(["user_id", "event_type"]):
        bursts, cur = [], 0
        prev = None
        for ts in g["ts"]:
            if prev is None or (ts - prev).total_seconds() > 300:
                if cur:
                    bursts.append(cur)
                cur = 1
            else:
                cur += 1
            prev = ts
        bursts.append(cur)
        want[(u, t)] = (
            len(bursts),
            sum(bursts),
            max(bursts),
            sum(b - 1 for b in bursts),
        )
    rows = (
        REGISTRY["events_debounce_user_type"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    got = {
        (r["user_id"], r["event_type"]): (
            r["n_bursts"],
            r["n_events"],
            r["max_burst"],
            r["n_suppressed"],
        )
        for r in rows
    }
    assert got == want
    for r in rows:
        assert r["n_suppressed"] == r["n_events"] - r["n_bursts"]
