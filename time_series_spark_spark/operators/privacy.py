"""Privacy / disclosure-risk operators: k-anonymity reporting and a
differentially-private count release with DETERMINISTIC noise.

Reference surface: reconstructed from SURVEY.md §2 (the K-family LLM
curation pipeline — PII redaction K10 already ships; these are its
aggregate-disclosure twins a data-release pipeline needs before
publishing corpus statistics).

Scale posture (100 TB): both operators are single hash-aggregations on
the quasi-identifier / release keys — one shuffle, partial aggregation
map-side, output cardinality = distinct key combinations (bounded,
orders of magnitude below row count). No joins, no windows over raw
rows, no Python.

Determinism: DP noise is usually sampled; an oracle-checkable release
derives it from the md5-uniform construction (bit-identical across
Spark and DuckDB: ``int(md5(key)[:8], 16) / 2**32`` — power-of-two
division is exact). The inverse-CDF Laplace transform goes through
libm ``ln`` (ulp-drift across runtimes), so the noisy value is rounded
to 6 dp BEFORE it is released/compared — the repo-wide libm rule
(SURVEY.md §5.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Per-equivalence-class disclosure risk under quasi-identifiers.

    Groups by the quasi-identifier columns; every group smaller than
    ``k`` is flagged at-risk (its members are re-identifiable within
    fewer than k candidates). The dataset's k-anonymity value is the
    min group size — derivable from this report with one more agg.

    One hash aggregation; output = distinct QI combinations.
    """
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("at_risk", (F.col("n_rows") < F.lit(k)).cast("int"))
    )


def laplace_noise(u: Column, scale: float) -> Column:
    """Inverse-CDF Laplace(0, scale) from a uniform u ∈ (0,1).

    noise = -scale * sign(u - 1/2) * ln(1 - 2|u - 1/2|).

    ``u`` exactly 0 or 1 would produce ±inf; the md5-uniform grid
    (multiples of 2^-32, and 0 only for one hash value in 4 billion)
    makes that a measure-zero non-event on release keys; callers that
    cannot tolerate it clamp u first.
    """
    d = u - F.lit(0.5)
    return (
        F.lit(-scale)
        * F.signum(d)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(d))
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed_tag: str = "dp-v1",
) -> DataFrame:
    """ε-DP count release with deterministic (seeded) Laplace noise.

    Counting queries have L1 sensitivity 1, so Laplace(1/ε) noise on
    each group's count gives ε-differential privacy *for a fresh random
    draw*. Here the draw is derandomized — md5(seed_tag | group key) →
    uniform → inverse-CDF — so releases are reproducible and
    oracle-checkable; treat ``seed_tag`` as the secret: determinism is
    a reproducibility device, and a public seed would void the DP
    guarantee (noise becomes predictable).

    Cross-release composition caveats (the determinism is NOT free):

    - noise is a pure function of ``(seed_tag, group key)``, so two
      releases with the SAME seed_tag over changed data reuse identical
      noise per key — differencing them reveals exact count deltas. Every
      release MUST use a fresh ``seed_tag``, and the privacy budget
      composes across releases (k releases at ε each spend k·ε total).
    - groups absent from ``df`` are omitted from the output, which leaks
      membership (an absent key reads as "count was 0, exactly"). When
      the key domain is public, left-join this release onto the fixed
      domain first so absent groups get noised zeros too.
    """
    key = F.concat_ws(
        "|", F.lit(seed_tag), *[F.col(c).cast("string") for c in group_cols]
    )
    u = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
        / F.lit(float(2**32))
    )
    counted = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    return counted.select(
        *group_cols,
        F.round(
            F.col("_n").cast("double") + laplace_noise(u, 1.0 / epsilon), 6
        ).alias("noisy_n"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
