"""Privacy / disclosure queries over the documents corpus: k-anonymity
risk report and a deterministic ε-DP count release.

Dialect notes (SURVEY.md §5.1): integer counts stay BIGINT in both
engines (DuckDB count(*) is BIGINT — no HUGEINT promotion to cast
away); the DP release goes through libm ``ln``, so the noisy value is
rounded to 6 dp in BOTH engines before comparison; the md5-uniform is
bit-identical cross-engine (power-of-two division exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_spark_spark.operators.privacy import (
    dp_noisy_counts,
    k_anonymity_report,
)
from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load

_K = 5
_EPS = 1.0
_SEED = "dp-v1"

# Quasi-identifiers for documents: language, source, and a 200-char
# length band — the columns a linker could cross-reference. Integer
# floor division in both engines (DIV / //) — never fp-divide-then-cast
# (Spark truncates, DuckDB rounds).
_BAND_SPARK = "CAST(n_chars DIV 200 AS BIGINT)"
_BAND_SQL = "CAST(n_chars // 200 AS BIGINT)"


@register(
    "docs_k_anonymity_report",
    f"""
    SELECT lang, source, {_BAND_SQL} AS len_band,
           count(*) AS n_rows,
           CAST(count(*) < {_K} AS INT) AS at_risk
    FROM documents
    GROUP BY lang, source, len_band
    ORDER BY lang, source, len_band
    """,
    doc="K-anonymity disclosure-risk report under (lang, source, "
    "200-char length band) quasi-identifiers: per-equivalence-class "
    "size and an at-risk flag for classes smaller than k=5. One hash "
    "aggregation, output = distinct QI combinations (operators/"
    "privacy.py::k_anonymity_report).",
)
def docs_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").withColumn(
        "len_band", F.expr(_BAND_SPARK)
    )
    rep = k_anonymity_report(docs, ["lang", "source", "len_band"], k=_K)
    return rep.orderBy("lang", "source", "len_band")


# DuckDB twin of the md5-uniform → inverse-CDF Laplace construction.
# Expression text mirrors operators/privacy.py::dp_noisy_counts exactly;
# sign/abs/ln are portable, the one libm call (ln) is rounded away at 6 dp.
_DP_U = (
    f"(('0x' || substring(md5('{_SEED}' || '|' || lang || '|' || source),"
    " 1, 8))::BIGINT / 4294967296.0)"
)
_DP_NOISE = (
    f"(-(1.0/{_EPS}) * sign({_DP_U} - 0.5)"
    f" * ln(1.0 - 2.0 * abs({_DP_U} - 0.5)))"
)


@register(
    "docs_dp_noisy_counts",
    f"""
    SELECT lang, source,
           round(count(*)::DOUBLE + {_DP_NOISE}, 6) AS noisy_n,
           {_EPS!r}::DOUBLE AS epsilon
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="ε-DP (ε=1) per-(lang, source) count release with DETERMINISTIC "
    "Laplace noise: md5-uniform(seed|key) → inverse-CDF, so the release "
    "is reproducible and oracle-checkable; true counts are never "
    "emitted. Noise rounded 6 dp (libm ln rule). One hash aggregation "
    "(operators/privacy.py::dp_noisy_counts).",
)
def docs_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    rel = dp_noisy_counts(
        docs, ["lang", "source"], epsilon=_EPS, seed_tag=_SEED
    )
    return rel.orderBy("lang", "source")
