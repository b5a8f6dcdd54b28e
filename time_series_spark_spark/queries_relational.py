"""Relational query surface: scans, filters, joins, aggregations, windows,
sort/limit, set ops, scalar functions (SURVEY.md §2 B/C/D/E/G/H/I).

Each query is deliberately expressed with the declarative DataFrame API so
Catalyst gets full freedom: filter/project pushdown into the parquet scan,
broadcast selection for dim joins, two-phase hash aggregation, AQE runtime
coalescing. Explicit ``F.broadcast`` hints mark the joins that must stay
broadcast at 100 TB regardless of statistics drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# B + D + G: the TPC-H Q1 shape — filter, grouped agg, sort
# --------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                               AS sum_qty,
           round(sum(l_extendedprice), 2)                          AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)       AS sum_disc_price,
           round(avg(l_quantity), 4)                               AS avg_qty,
           round(avg(l_extendedprice), 4)                          AS avg_price,
           round(avg(l_discount), 6)                               AS avg_disc,
           count(*)                                                AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="B2 filter + D1 hash agg + G sort (TPC-H Q1 shape)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
