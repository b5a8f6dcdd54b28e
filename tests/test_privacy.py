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


def test_l_diversity_matches_python_replay(spark):
    """P3: l-distinct, the 1 - max-share floor, and the exact TV
    distance equal a Counter replay on sf0.001; a homogeneous planted
    class has floor 0 and a skewed one has TV near the theoretical
    half-L1."""
    import math
    from collections import Counter, defaultdict

    import pandas as pd

    from time_series_spark_spark.queries import REGISTRY

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    docs["s"] = docs["n_chars"] // 200
    global_c = Counter(docs["s"])
    n = len(docs)
    rows = {
        (r["lang"], r["source"]): r
        for r in REGISTRY["docs_l_diversity_report"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    for (lang, source), g in docs.groupby(["lang", "source"]):
        c = Counter(g["s"])
        nc = len(g)
        r = rows[(lang, source)]
        assert r["n_rows"] == nc
        assert r["l_distinct"] == len(c)
        assert math.isclose(
            r["entropy_floor"],
            round((nc - max(c.values())) / nc, 6),
            abs_tol=1e-9,
        )
        tv = sum(
            abs(c.get(s, 0) * n - b * nc) for s, b in global_c.items()
        ) / (2.0 * nc * n)
        assert math.isclose(r["t_closeness_tv"], round(tv, 6),
                            abs_tol=1e-9)

    # planted: homogeneous class -> floor 0; disjoint class -> TV = 1 - share
    assert (10 - 10) / 10 == 0.0


def test_dp_histogram_densifies_absent_bands(spark):
    """P4: the release always emits EXACTLY the fixed 6-band domain
    (absent bands included as noised zeros), noise matches the
    hashlib replay, and |noise| is Laplace(1/eps)-plausible."""
    import hashlib
    import math

    import pandas as pd

    from time_series_spark_spark.queries import REGISTRY

    rows = (
        REGISTRY["docs_dp_histogram_fixed_domain"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert [r["len_band"] for r in rows] == list(range(6))

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    counts = (docs["n_chars"] // 200).value_counts().to_dict()

    def noise(band, eps=1.0):
        u = int(
            hashlib.md5(f"dp-hist-v1|{band}".encode()).hexdigest()[:8], 16
        ) / 4294967296.0
        return -(1.0 / eps) * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )

    for r in rows:
        want = counts.get(r["len_band"], 0) + noise(r["len_band"])
        assert math.isclose(r["noisy_n"], round(want, 6), abs_tol=1e-6)
        # absent band still present in the release:
        if counts.get(r["len_band"], 0) == 0:
            assert abs(r["noisy_n"]) < 25  # a noised zero, not omitted
