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


@register(
    "docs_l_diversity_report",
    f"""
    WITH x AS (
        SELECT lang, source, {_BAND_SQL} AS s FROM documents
    ),
    cls AS (
        SELECT lang, source, s, CAST(count(*) AS BIGINT) AS a
        FROM x GROUP BY lang, source, s
    ),
    per_cls AS (
        SELECT lang, source,
               CAST(sum(a) AS BIGINT) AS nc,
               CAST(count(*) AS BIGINT) AS l_distinct,
               CAST(max(a) AS BIGINT) AS a_max
        FROM cls GROUP BY lang, source
    ),
    gl AS (
        SELECT s, CAST(count(*) AS BIGINT) AS b,
               CAST(sum(count(*)) OVER () AS BIGINT) AS n
        FROM x GROUP BY s
    ),
    tv AS (
        SELECT c.lang, c.source,
               CAST(sum(abs(coalesce(cls.a, 0) * gl.n
                            - gl.b * c.nc)) AS BIGINT) AS tv_num,
               CAST(max(c.nc) AS BIGINT) AS nc,
               CAST(max(gl.n) AS BIGINT) AS n
        FROM per_cls c CROSS JOIN gl
        LEFT JOIN cls ON cls.lang = c.lang AND cls.source = c.source
                     AND cls.s = gl.s
        GROUP BY c.lang, c.source
    )
    SELECT p.lang, p.source, p.nc AS n_rows, p.l_distinct,
           round(CAST(p.nc - p.a_max AS DOUBLE) / p.nc, 6)
               AS entropy_floor,
           round(CAST(tv.tv_num AS DOUBLE) / (2.0 * tv.nc * tv.n), 6)
               AS t_closeness_tv
    FROM per_cls p JOIN tv ON tv.lang = p.lang AND tv.source = p.source
    ORDER BY p.lang, p.source
    """,
    doc="P3 l-diversity + t-closeness report: per (lang, source) "
    "equivalence class, the number of DISTINCT sensitive values "
    "(the 200-char length band as the sensitive attribute), the "
    "recursive-diversity floor 1 - max_share (0 means one value "
    "dominates — the homogeneity attack k-anonymity misses), and "
    "t-closeness as the exact total-variation distance between the "
    "class's sensitive distribution and the corpus-wide one — "
    "computed as integer cross-products |a*N - b*n_c| summed over "
    "the DENSIFIED band domain (absent bands count, the skew attack) "
    "and divided ONCE, so both engines agree exactly. Two hash "
    "reduces + a bounded class x band join. One row per class.",
)
def docs_l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    x = load(spark, sf_dir, "documents").select(
        "lang", "source", F.expr(_BAND_SPARK).alias("s")
    )
    cls = x.groupBy("lang", "source", "s").agg(
        F.count(F.lit(1)).alias("a")
    )
    per_cls = cls.groupBy("lang", "source").agg(
        F.sum("a").alias("nc"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.max("a").alias("a_max"),
    )
    from pyspark.sql.window import Window as W

    glob = x.groupBy("s").agg(F.count(F.lit(1)).alias("b"))
    glob = glob.select(
        "s", "b",
        F.sum("b")
        .over(
            W.partitionBy().rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        )
        .alias("n"),
    )
    joined = (
        per_cls.crossJoin(F.broadcast(glob))
        .join(
            cls.withColumnRenamed("a", "a_cls"),
            ["lang", "source", "s"],
            "left",
        )
        .groupBy("lang", "source")
        .agg(
            F.sum(
                F.abs(
                    F.coalesce(F.col("a_cls"), F.lit(0)) * F.col("n")
                    - F.col("b") * F.col("nc")
                )
            ).alias("tv_num"),
            F.max("nc").alias("nc"),
            F.max("n").alias("n"),
        )
    )
    return (
        per_cls.join(
            joined.select(
                "lang", "source", "tv_num",
                F.col("nc").alias("nc2"),
                "n",
            ),
            ["lang", "source"],
        )
        .select(
            "lang", "source",
            F.col("nc").alias("n_rows"),
            "l_distinct",
            F.expr(
                "round(CAST(nc - a_max AS DOUBLE) / nc, 6)"
            ).alias("entropy_floor"),
            F.expr(
                "round(CAST(tv_num AS DOUBLE) / (2.0 * nc * n), 6)"
            ).alias("t_closeness_tv"),
        )
        .orderBy("lang", "source")
    )


@register(
    "docs_dp_histogram_fixed_domain",
    f"""
    WITH domain AS (
        SELECT CAST(range AS BIGINT) AS len_band FROM range(0, 6)
    ),
    counts AS (
        SELECT {_BAND_SQL} AS len_band, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
    )
    SELECT d.len_band,
           round(coalesce(n, 0)::DOUBLE
                 + (-(1.0/{_EPS})
                    * sign((('0x' || substring(md5('dp-hist-v1|'
                             || CAST(d.len_band AS VARCHAR)), 1, 8))::BIGINT
                            / 4294967296.0) - 0.5)
                    * ln(1.0 - 2.0 * abs((('0x' || substring(md5('dp-hist-v1|'
                             || CAST(d.len_band AS VARCHAR)), 1, 8))::BIGINT
                            / 4294967296.0) - 0.5))), 6) AS noisy_n
    FROM domain d LEFT JOIN counts ON counts.len_band = d.len_band
    ORDER BY d.len_band
    """,
    doc="P4 ε-DP histogram over a PUBLIC FIXED domain (length bands "
    "0..5): the release left-joins the count table onto the known "
    "domain so ABSENT bands emit noised zeros — closing the "
    "membership leak dp_noisy_counts documents (a missing key reads "
    "as 'exactly 0'); per-band Laplace(1/ε) noise from the md5-"
    "uniform inverse-CDF with a release-specific seed tag. CAVEAT — "
    "NOT a real DP release: the seed tag 'dp-hist-v1' is a hardcoded "
    "PUBLIC constant, so any consumer can recompute and subtract the "
    "noise exactly; it exists only so the DuckDB oracle can verify the "
    "mechanism cross-engine. A production release must draw the seed "
    "from out-of-band secret config (dp_noisy_counts documents the "
    "same rule). One hash reduce + a 6-row broadcast domain join.",
)
def docs_dp_histogram_fixed_domain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    counts = (
        load(spark, sf_dir, "documents")
        .groupBy(F.expr(_BAND_SPARK).alias("len_band"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    domain = counts.sparkSession.range(0, 6).select(
        F.col("id").alias("len_band")
    )
    u = (
        "(CAST(conv(substring(md5(concat('dp-hist-v1|',"
        " CAST(len_band AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        " / 4294967296.0)"
    )
    noise = (
        f"(-(1.0/{_EPS}) * sign({u} - 0.5)"
        f" * ln(1.0 - 2.0 * abs({u} - 0.5)))"
    )
    return (
        domain.join(counts, "len_band", "left")
        .select(
            "len_band",
            F.expr(
                f"round(CAST(coalesce(n, 0) AS DOUBLE) + {noise}, 6)"
            ).alias("noisy_n"),
        )
        .orderBy("len_band")
    )
