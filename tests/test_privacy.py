"""Privacy operators: k-anonymity report semantics and the
deterministic ε-DP count release (operators/privacy.py)."""

import math

from pyspark.sql import functions as F

from time_series_spark_spark.operators.privacy import (
    dp_noisy_counts,
    k_anonymity_report,
)

SF = "/root/testdata/sf0.001"


def _toy(spark):
    rows = [
        ("en", "web"), ("en", "web"), ("en", "web"),
        ("en", "web"), ("en", "web"),          # n=5, not at risk (k=5)
        ("en", "book"), ("en", "book"),        # n=2, at risk
        ("fr", "web"),                         # n=1, at risk
    ]
    return spark.createDataFrame(rows, ["lang", "source"])


def test_k_anonymity_flags_exactly_below_k(spark):
    rep = k_anonymity_report(_toy(spark), ["lang", "source"], k=5)
    got = {
        (r["lang"], r["source"]): (r["n_rows"], r["at_risk"])
        for r in rep.collect()
    }
    assert got == {
        ("en", "web"): (5, 0),
        ("en", "book"): (2, 1),
        ("fr", "web"): (1, 1),
    }
    # dataset k-anonymity value = min class size
    k_val = rep.agg(F.min("n_rows")).collect()[0][0]
    assert k_val == 1


def test_k_anonymity_group_sizes_sum_to_rows(spark):
    df = _toy(spark)
    rep = k_anonymity_report(df, ["lang", "source"], k=3)
    assert rep.agg(F.sum("n_rows")).collect()[0][0] == df.count()


def test_dp_release_deterministic_and_hides_truth(spark):
    df = _toy(spark)
    a = dp_noisy_counts(df, ["lang", "source"], epsilon=1.0).collect()
    b = dp_noisy_counts(df, ["lang", "source"], epsilon=1.0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # schema exposes only the noisy value + params, never the raw count
    cols = set(dp_noisy_counts(df, ["lang", "source"]).columns)
    assert cols == {"lang", "source", "noisy_n", "epsilon"}


def test_dp_noise_bounded_and_nonzero(spark):
    df = _toy(spark)
    truth = {
        (r["lang"], r["source"]): r["n"]
        for r in df.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rel = dp_noisy_counts(df, ["lang", "source"], epsilon=1.0).collect()
    noises = []
    for r in rel:
        noise = r["noisy_n"] - truth[(r["lang"], r["source"])]
        noises.append(noise)
        # Laplace(1): P(|noise| > 25) = e^-25 — a bound violation means
        # the inverse-CDF is wrong, not bad luck.
        assert abs(noise) < 25.0
    # the release actually perturbs (not the identity map)
    assert any(abs(n) > 1e-9 for n in noises)


def test_dp_seed_tag_changes_release(spark):
    df = _toy(spark)
    a = {
        (r["lang"], r["source"]): r["noisy_n"]
        for r in dp_noisy_counts(df, ["lang", "source"], seed_tag="s1").collect()
    }
    b = {
        (r["lang"], r["source"]): r["noisy_n"]
        for r in dp_noisy_counts(df, ["lang", "source"], seed_tag="s2").collect()
    }
    assert a.keys() == b.keys()
    assert any(not math.isclose(a[k], b[k]) for k in a)


def test_dp_epsilon_scales_noise(spark):
    """Same uniform draw, scale 1/ε: ε=0.1 noise is exactly 10× ε=1 noise."""
    df = _toy(spark)
    truth = {
        (r["lang"], r["source"]): r["n"]
        for r in df.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    def noises(eps):
        return {
            (r["lang"], r["source"]): r["noisy_n"] - truth[(r["lang"], r["source"])]
            for r in dp_noisy_counts(df, ["lang", "source"], epsilon=eps).collect()
        }

    n1, n01 = noises(1.0), noises(0.1)
    for k in n1:
        # released values are rounded 6 dp, so the 10× law holds to ~1e-5
        assert math.isclose(n01[k], 10.0 * n1[k], rel_tol=1e-4, abs_tol=1e-4)


def test_registered_privacy_queries_run(spark):
    from time_series_spark_spark.queries import REGISTRY

    for name in ("docs_k_anonymity_report", "docs_dp_noisy_counts"):
        df = REGISTRY[name].fn(spark, SF)
        assert df.count() > 0
