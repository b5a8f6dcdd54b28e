"""Relational query surface: scans, filters, joins, aggregations, windows,
sort/limit, set ops, scalar functions (SURVEY.md §2 B/C/D/E/G/H/I).

Each query is deliberately expressed with the declarative DataFrame API so
Catalyst gets full freedom: filter/project pushdown into the parquet scan,
broadcast selection for dim joins, two-phase hash aggregation, AQE runtime
coalescing. Explicit ``F.broadcast`` hints mark the joins that must stay
broadcast at 100 TB regardless of statistics drift.

Determinism rules (SURVEY.md §5.1): every computed column aliased the same
in both engines; fp aggregates rounded identically in both engines; under
LIMIT the ORDER BY always includes the *rounded* value plus a unique
tiebreaker so both engines cut the same row set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ==========================================================================
# B + D + G — filter / grouped agg / sort
# ==========================================================================
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


# ==========================================================================
# C — joins
# ==========================================================================
@register(
    "q3_top_revenue_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o    ON c.c_custkey = o.o_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="C1 3-way join + D1 + G top-10 (TPC-H Q3 shape)",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="C1/C2 star join with broadcast dims + D1 (TPC-H Q5 shape)",
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # region/nation/supplier are bounded dims at any scale → explicit
    # broadcast hints keep this a shuffle-free map-side join at 100 TB.
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("n_name")
    )


@register(
    "left_join_customer_orders",
    """
    SELECT c.c_custkey,
           count(o.o_orderkey)                          AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2)   AS total_spent
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
    doc="C3 left outer join + B6 coalesce (customers with zero orders kept)",
)
def left_join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
        .orderBy("c_custkey")
    )


@register(
    "semi_join_active_customers",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
    ORDER BY c_custkey
    """,
    doc="C4 left-semi join (existence filter)",
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "anti_join_orderless_customers",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    ORDER BY c_custkey
    """,
    doc="C5 left-anti join (customers with no pending orders)",
)
def anti_join_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    pending = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti")
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


@register(
    "cross_join_region_pairs",
    """
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    ORDER BY from_region, to_region
    """,
    doc="C6 cross join (guarded: bounded dim × dim only)",
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("ak"), F.col("r_name").alias("from_region")
    )
    b = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("bk"), F.col("r_name").alias("to_region")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("ak") != F.col("bk"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@register(
    "theta_join_late_shipments",
    """
    SELECT l.l_orderkey, count(*) AS n_late_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
    GROUP BY l.l_orderkey
    ORDER BY l.l_orderkey
    """,
    doc="C7 equi+theta join (key equality plus range residual, stays SMJ)",
)
def theta_join_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 120 DAY")),
        )
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
        .orderBy("l_orderkey")
    )


# ==========================================================================
# B — predicate forms
# ==========================================================================
@register(
    "filter_in_between",
    """
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 1000 AND 2000
    ORDER BY o_orderkey
    """,
    doc="B4 IN + BETWEEN predicates (pushed to parquet scan)",
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderstatus").isin("F", "P")
            & F.col("o_totalprice").between(1000, 2000)
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "filter_like_regexp",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%red%'
       OR regexp_matches(p_name, '^blue .*(bolt|ring)$')
    ORDER BY p_partkey
    """,
    doc="B3/B5 boolean combo of LIKE and regexp predicates",
)
def filter_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .filter(
            F.col("p_name").like("%red%")
            | F.col("p_name").rlike("^blue .*(bolt|ring)$")
        )
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@register(
    "distinct_projection",
    """
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
    doc="B7 distinct on a projection",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment")
        .distinct()
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "case_when_price_bands",
    """
    SELECT CASE WHEN o_totalprice < 1000 THEN 'low'
                WHEN o_totalprice < 5000 THEN 'mid'
                ELSE 'high' END AS band,
           count(*)                    AS n,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY band
    ORDER BY band
    """,
    doc="B8 CASE WHEN bucketing + D1",
)
def case_when_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    band = (
        F.when(F.col("o_totalprice") < 1000, "low")
        .when(F.col("o_totalprice") < 5000, "mid")
        .otherwise("high")
    )
    return (
        load(spark, sf_dir, "orders")
        .groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("band")
    )


# ==========================================================================
# D — aggregations
# ==========================================================================
@register(
    "global_agg_lineitem",
    """
    SELECT count(*)                           AS n_rows,
           round(sum(l_quantity), 2)          AS total_qty,
           round(min(l_extendedprice), 2)     AS min_price,
           round(max(l_extendedprice), 2)     AS max_price,
           round(avg(l_discount), 6)          AS avg_discount
    FROM lineitem
    """,
    doc="D2 global aggregate without grouping keys",
)
def global_agg_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
    )


@register(
    "count_distinct_customers",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="D3 exact count-distinct (two-phase expand handled by Catalyst)",
)
def count_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "approx_count_distinct_users",
    None,  # approximate → rows-only check (HLL++ sketches differ per engine)
    doc="D4 approx_count_distinct (HLL++); asserted vs exact in unit tests",
)
def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
        .orderBy("event_type")
    )


@register(
    "stats_aggs_lineitem",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)            AS sd_qty,
           round(var_samp(l_extendedprice), 2)          AS var_price,
           round(corr(l_quantity, l_extendedprice), 6)  AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="D5 statistical aggregates",
)
def stats_aggs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias(
                "cov_qty_disc"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "percentiles_quantity",
    """
    SELECT l_linestatus,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.50), 4) AS median_qty,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="D6 exact interpolated percentiles (Spark percentile ≡ quantile_cont)",
)
def percentiles_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
            F.round(F.expr("percentile(l_quantity, 0.50)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "minby_maxby_customers",
    """
    SELECT c_nationkey,
           arg_max(c_name, c_acctbal) AS richest,
           arg_min(c_name, c_acctbal) AS poorest
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="D7 max_by/min_by per-group representative",
)
def minby_maxby_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.expr("max_by(c_name, c_acctbal)").alias("richest"),
            F.expr("min_by(c_name, c_acctbal)").alias("poorest"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "collect_sorted_nations",
    """
    SELECT r.r_name,
           array_to_string(list_sort(list(n.n_name)), ',') AS nations,
           count(*)                                        AS n_nations
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc=(
        "D8 collect_list + sort_array for deterministic array aggs. The sorted "
        "array is joined to a CSV string so the driver's canonicalizer (pandas "
        "sort_values cannot factorize ndarray cells) sees only scalars; the "
        "sort_array step still exercises the D8 semantics end-to-end."
    ),
)
def collect_sorted_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )


@register(
    "rollup_orders",
    """
    SELECT year(o_orderdate)            AS order_year,
           o_orderpriority,
           count(*)                     AS n_orders,
           round(sum(o_totalprice), 2)  AS total
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    ORDER BY order_year NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="D9 rollup subtotal hierarchy",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .rollup(F.year("o_orderdate").alias("order_year"), F.col("o_orderpriority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(F.asc_nulls_first("order_year"), F.asc_nulls_first("o_orderpriority"))
    )


@register(
    "cube_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus,
           count(*)                  AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="D10 cube over two dimensions",
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy(
            F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
        )
    )


@register(
    "grouping_sets_orders",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="D11 explicit grouping sets (SQL entry point)",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "pivot_docs_lang_source",
    """
    SELECT lang,
           count(*) FILTER (WHERE source = 'src0') AS src0,
           count(*) FILTER (WHERE source = 'src1') AS src1,
           count(*) FILTER (WHERE source = 'src2') AS src2,
           count(*) FILTER (WHERE source = 'src3') AS src3
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    doc="D12 pivot (categories → columns)",
)
def pivot_docs_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .pivot("source", ["src0", "src1", "src2", "src3"])
        .count()
        .na.fill(0, ["src0", "src1", "src2", "src3"])
        .orderBy("lang")
    )


# ==========================================================================
# E — window functions
# ==========================================================================
@register(
    "window_running_rev",
    """
    WITH daily AS (
        SELECT o_orderdate AS d, round(sum(o_totalprice), 2) AS day_rev
        FROM orders GROUP BY o_orderdate
    )
    SELECT d, day_rev,
           row_number() OVER (ORDER BY d)                    AS rn,
           round(sum(day_rev) OVER (ORDER BY d
                 ROWS UNBOUNDED PRECEDING), 2)               AS cum_rev
    FROM daily
    ORDER BY d
    LIMIT 100
    """,
    doc="E1/E4 row_number + running sum over daily revenue",
)
def window_running_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("day_rev"))
    )
    w = Window.orderBy("d")
    return (
        daily.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "cum_rev",
            F.round(
                F.sum("day_rev").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
            ),
        )
        .orderBy("d")
        .limit(100)
    )


@register(
    "window_rank_distribution",
    """
    SELECT c_custkey, c_nationkey,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_nationkey, rnk, c_custkey
    """,
    doc="E1/E2 rank family + distribution ranks per partition",
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            # NOT rounded: (rank-1)/(n-1) divides identical integers in
            # both engines → bit-identical doubles; a 6-digit round would
            # REINTRODUCE cross-engine drift on exact decimal ties (Spark
            # rounds the shortest decimal repr, DuckDB the binary value).
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cdist"),
        )
        .orderBy("c_nationkey", "rnk", "c_custkey")
    )


@register(
    "window_moving_avg",
    """
    WITH daily AS (
        SELECT o_orderdate AS d, sum(o_totalprice) AS day_rev
        FROM orders GROUP BY o_orderdate
    )
    SELECT d,
           round(day_rev, 2) AS day_rev,
           round(avg(day_rev) OVER (ORDER BY d ROWS 6 PRECEDING), 2) AS ma7,
           round(min(day_rev) OVER (ORDER BY d ROWS 6 PRECEDING), 2) AS min7,
           round(max(day_rev) OVER (ORDER BY d ROWS 6 PRECEDING), 2) AS max7
    FROM daily
    ORDER BY d
    """,
    doc="E5 moving 7-row window stats over a daily series",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("raw_rev"))
    )
    w7 = Window.orderBy("d").rowsBetween(-6, 0)
    return (
        daily.select(
            "d",
            F.round("raw_rev", 2).alias("day_rev"),
            F.round(F.avg("raw_rev").over(w7), 2).alias("ma7"),
            F.round(F.min("raw_rev").over(w7), 2).alias("min7"),
            F.round(F.max("raw_rev").over(w7), 2).alias("max7"),
        )
        .orderBy("d")
    )


@register(
    "window_first_last",
    """
    SELECT c_nationkey, c_custkey,
           round(c_acctbal, 2) AS acctbal,
           round(first_value(c_acctbal) OVER w, 2) AS top_bal,
           round(last_value(c_acctbal)  OVER w, 2) AS bottom_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY c_nationkey, acctbal DESC, c_custkey
    """,
    doc="E7 first/last value over full-partition frame",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round(F.first("c_acctbal").over(w), 2).alias("top_bal"),
            F.round(F.last("c_acctbal").over(w), 2).alias("bottom_bal"),
        )
        .orderBy("c_nationkey", F.desc("acctbal"), "c_custkey")
    )


@register(
    "topk_parts_per_brand",
    """
    WITH part_rev AS (
        SELECT p.p_brand, p.p_partkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, p.p_partkey
    )
    SELECT p_brand, p_partkey, revenue
    FROM (
        SELECT *, row_number() OVER (PARTITION BY p_brand
                                     ORDER BY revenue DESC, p_partkey) AS rk
        FROM part_rev
    )
    WHERE rk <= 3
    ORDER BY p_brand, rk
    """,
    doc="E9 top-k per group (rank + filter; TakeOrdered per partition)",
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    part_rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("revenue"), F.asc("p_partkey"))
    return (
        part_rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "revenue")
        .orderBy("p_brand", F.desc("revenue"), "p_partkey")
    )


@register(
    "top_orders_global",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY total DESC, o_orderkey
    LIMIT 20
    """,
    doc="G global top-k (TakeOrderedAndProject — no full sort at scale)",
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.desc("total"), "o_orderkey")
        .limit(20)
    )


# ==========================================================================
# H — set operations
# ==========================================================================
@register(
    "union_all_high_value_keys",
    """
    SELECT k, count(*) AS n FROM (
        SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 9000
    ) GROUP BY k ORDER BY k
    """,
    doc="H1 union all + agg",
)
def union_all_high_value_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"))
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 9000)
        .select(F.col("o_custkey").alias("k"))
    )
    return (
        a.unionByName(b).groupBy("k").agg(F.count(F.lit(1)).alias("n")).orderBy("k")
    )


@register(
    "union_distinct_nation_keys",
    """
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        UNION
        SELECT s_nationkey AS nk FROM supplier
    ) ORDER BY nk
    """,
    doc="H2 union distinct",
)
def union_distinct_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    b = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return a.unionByName(b).distinct().orderBy("nk")


@register(
    "intersect_building_f_orders",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY c_custkey
    """,
    doc="H3 intersect",
)
def intersect_building_f_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b).orderBy("c_custkey")


@register(
    "except_inactive_customers",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ORDER BY c_custkey
    """,
    doc="H4 except (set difference: customers minus pending-order customers)",
)
def except_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load(spark, sf_dir, "customer").select("c_custkey")
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.exceptAll(b).distinct().orderBy("c_custkey")


# ==========================================================================
# I — scalar function surface
# ==========================================================================
@register(
    "string_funcs_nation",
    """
    SELECT n_nationkey,
           lower(n_name)                       AS lo,
           upper(n_name)                       AS up,
           substr(n_name, 1, 6)                AS pre,
           length(n_name)                      AS len,
           concat_ws('-', n_name, 'X')         AS joined,
           levenshtein(n_name, 'NATION_1')     AS lev,
           md5(n_name)                         AS h,
           replace(translate(n_name, '_', '#'), 'NATION', 'N') AS tr
    FROM nation
    ORDER BY n_nationkey
    """,
    doc="I string functions 1:1 with DuckDB",
)
def string_funcs_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = F.col("n_name")
    return (
        load(spark, sf_dir, "nation")
        .select(
            "n_nationkey",
            F.lower(n).alias("lo"),
            F.upper(n).alias("up"),
            F.substring(n, 1, 6).alias("pre"),
            F.length(n).alias("len"),
            F.concat_ws("-", n, F.lit("X")).alias("joined"),
            F.levenshtein(n, F.lit("NATION_1")).alias("lev"),
            F.md5(n).alias("h"),
            F.regexp_replace(
                F.translate(n, "_", "#"), "NATION", "N"
            ).alias("tr"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "date_funcs_orders",
    """
    SELECT year(o_orderdate)                           AS y,
           month(o_orderdate)                          AS m,
           count(*)                                    AS n,
           min(dayofweek(o_orderdate) + 1)             AS min_dow,
           max(day(o_orderdate))                       AS max_dom,
           min(cast(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS month_start,
           min(o_orderdate + INTERVAL 90 DAY)          AS min_due
    FROM orders
    GROUP BY year(o_orderdate), month(o_orderdate)
    ORDER BY y, m
    """,
    doc="I date/time functions (dayofweek origin normalized: Spark 1=Sun)",
)
def date_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("o_orderdate")
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.year(d).alias("y"), F.month(d).alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.dayofweek(d)).alias("min_dow"),
            F.max(F.dayofmonth(d)).alias("max_dom"),
            F.min(F.date_trunc("month", d)).alias("month_start"),
            F.min(d + F.expr("INTERVAL 90 DAY")).alias("min_due"),
        )
        .orderBy("y", "m")
    )


@register(
    "math_funcs_summary",
    """
    SELECT l_returnflag,
           round(sqrt(sum(l_quantity)), 6)          AS sqrt_qty,
           round(ln(sum(l_extendedprice)), 6)       AS ln_price,
           round(log10(sum(l_extendedprice)), 6)    AS log10_price,
           round(pow(avg(l_discount), 2), 8)        AS disc_sq,
           CAST(ceil(avg(l_quantity)) AS BIGINT)    AS ceil_qty,
           CAST(floor(avg(l_quantity)) AS BIGINT)   AS floor_qty,
           round(abs(min(l_quantity) - max(l_quantity)), 2) AS qty_range,
           greatest(max(l_tax), max(l_discount))    AS max_rate
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="I math functions over aggregates",
)
def math_funcs_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sqrt(F.sum("l_quantity")), 6).alias("sqrt_qty"),
            F.round(F.log(F.sum("l_extendedprice")), 6).alias("ln_price"),
            F.round(F.log10(F.sum("l_extendedprice")), 6).alias("log10_price"),
            F.round(F.pow(F.avg("l_discount"), 2), 8).alias("disc_sq"),
            F.ceil(F.avg("l_quantity")).alias("ceil_qty"),
            F.floor(F.avg("l_quantity")).alias("floor_qty"),
            F.round(F.abs(F.min("l_quantity") - F.max("l_quantity")), 2).alias(
                "qty_range"
            ),
            F.greatest(F.max("l_tax"), F.max("l_discount")).alias("max_rate"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "array_funcs_embeddings",
    """
    SELECT vec_id,
           len(embedding)                                          AS dim,
           round(embedding[1], 6)                                  AS first_val,
           round(list_sum(list_transform(embedding::DOUBLE[],
                                         x -> x * x)), 6)          AS sq_norm,
           round(list_sort(embedding::DOUBLE[])[1], 6)             AS min_val
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
    doc="I array + higher-order functions (fold = dot-product building block)",
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.expr("transform(embedding, x -> cast(x AS double))")
    return (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at("embedding", 1), 6).alias("first_val"),
            F.round(
                F.expr(
                    "aggregate(transform(embedding, x -> cast(x AS double)),"
                    " 0D, (s, x) -> s + x * x)"
                ),
                6,
            ).alias("sq_norm"),
            F.round(F.element_at(F.sort_array(emb), 1), 6).alias("min_val"),
        )
        .orderBy("vec_id")
    )


@register(
    "json_funcs_events",
    """
    SELECT event_type,
           count(*)                                          AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT)  AS sum_k,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS DOUBLE) / count(*) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc=(
        "I JSON extraction from string column (events.props). Oracle hygiene: "
        "DuckDB sum(BIGINT) is HUGEINT, so it is cast back to BIGINT to match "
        "Spark's long; the mean is an explicit sum/count double division (exact "
        "IEEE op on integer-valued operands) on BOTH sides instead of "
        "round(avg(...), k), per the cross-engine rounding rule in "
        "queries_composite.py."
    ),
)
def json_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        load(spark, sf_dir, "events")
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Correlated subqueries (SURVEY.md §4.1 subquery decorrelation, via the
# §3.2 SQL entry point — Catalyst rewrites these to joins; no custom work)
# --------------------------------------------------------------------------
@register(
    "scalar_subquery_big_spenders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 1.5 * (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o_orderkey
    """,
    doc="correlated scalar subquery: orders 1.5x above their customer's "
    "average (decorrelated by Catalyst into an aggregate + join)",
)
def scalar_subquery_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 1.5 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
        """
    )


@register(
    "not_exists_idle_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey
          AND l.l_shipdate > TIMESTAMP '2001-11-01'
    )
    ORDER BY s_suppkey
    """,
    doc="correlated NOT EXISTS: suppliers with no shipment after a cutoff "
    "(decorrelated into a left-anti join)",
)
def not_exists_idle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey
              AND l.l_shipdate > TIMESTAMP '2001-11-01'
        )
        ORDER BY s_suppkey
        """
    )


# --------------------------------------------------------------------------
# I6 Variant semi-structured type + I7 collation-aware semantics (round 4)
# --------------------------------------------------------------------------
@register(
    "events_variant_props",
    """
    SELECT event_type,
           CAST(CAST(props->>'$.k' AS INT) // 10 AS INT) AS k_band,
           CAST(count(*) AS BIGINT)                      AS n,
           CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1, 2
    """,
    doc="I6 semi-structured Variant path (Spark 4): props parsed ONCE "
    "into a VariantType column (parse_json), typed extraction via "
    "variant_get — the open-schema ingestion shape that replaces "
    "per-field get_json_object re-parsing; aggregation over the decade "
    "band of the extracted int",
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy(
            "event_type",
            F.expr("CAST(k DIV 10 AS INT)").alias("k_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


@register(
    "nation_collation_fold",
    """
    WITH variants AS (
        SELECT upper(n_name) AS v FROM nation
        UNION ALL SELECT lower(n_name) FROM nation
        UNION ALL
        SELECT upper(substr(n_name, 1, 1)) || lower(substr(n_name, 2))
        FROM nation
    )
    SELECT lower(v) AS name_ci, CAST(count(*) AS BIGINT) AS n_variants
    FROM variants GROUP BY 1
    """,
    doc="I7 collation-aware grouping (Spark 4 UTF8_LCASE): three case "
    "variants of every nation name collapse to one case-insensitive "
    "group under collate(..., 'UTF8_LCASE') WITHOUT rewriting the data "
    "to lowercase — the engine-level collation path (oracle folds with "
    "lower(), proving the collation's equivalence classes match)",
)
def nation_collation_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    variants = (
        n.select(F.upper("n_name").alias("v"))
        .unionAll(n.select(F.lower("n_name").alias("v")))
        .unionAll(n.select(F.initcap(F.lower("n_name")).alias("v")))
    )
    return (
        variants.groupBy(F.collate(F.col("v"), "UTF8_LCASE").alias("_g"))
        .agg(F.count(F.lit(1)).alias("n_variants"))
        .select(F.lower(F.col("_g")).alias("name_ci"), "n_variants")
    )


# --------------------------------------------------------------------------
# SQL-entry modern surface (round 4): pipe syntax + LATERAL join
# --------------------------------------------------------------------------
@register(
    "orders_pipe_summary",
    """
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)      AS n_orders,
           round(sum(o_totalprice), 2)   AS total,
           round(max(o_totalprice), 2)   AS biggest
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    GROUP BY o_orderstatus
    """,
    doc="SQL pipe syntax (Spark 4 |> operators): the same logical plan "
    "as the classic GROUP BY — filter |> aggregate |> project — parsed "
    "from the pipeline dialect; proves the modern SQL entry surface "
    "end-to-end against a classic-SQL oracle",
)
def orders_pipe_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe")
    return spark.sql(
        """
        FROM orders_pipe
        |> WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS total,
                     round(max(o_totalprice), 2) AS biggest
           GROUP BY o_orderstatus
        |> SELECT o_orderstatus, CAST(n_orders AS BIGINT) AS n_orders,
                  total, biggest
        """
    )


@register(
    "lateral_customer_order_stats",
    """
    SELECT c.c_custkey, c.c_name, t.n_orders, t.top_price
    FROM customer c, LATERAL (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               round(max(o.o_totalprice), 2) AS top_price
        FROM orders o WHERE o.o_custkey = c.c_custkey
    ) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc="LATERAL correlated table subquery (Spark 4 SQL): per-customer "
    "aggregate computed in a lateral derived table — Catalyst "
    "decorrelates it to one outer-join + aggregate, never a per-row "
    "re-execution (the property that makes LATERAL usable at 100 TB); "
    "orderless customers keep the aggregate's (0, NULL) row",
)
def lateral_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, t.n_orders, t.top_price
        FROM customer_lat c, LATERAL (
            SELECT CAST(count(*) AS BIGINT) AS n_orders,
                   round(max(o.o_totalprice), 2) AS top_price
            FROM orders_lat o WHERE o.o_custkey = c.c_custkey
        ) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


# --------------------------------------------------------------------------
# Data-quality analytics (round 4): Jaro-Winkler, Benford, integrity report
# --------------------------------------------------------------------------
@register(
    "nation_name_jw_pairs",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           round(jaro_winkler_similarity(a.n_name, b.n_name), 6) AS jw
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE jaro_winkler_similarity(a.n_name, b.n_name) >= 0.75
    """,
    doc="K2f Jaro-Winkler name-pair similarity: a vectorized pandas-UDF "
    "JW kernel (match window, half-transpositions, Winkler prefix "
    "boost) cross-checked against DuckDB's NATIVE "
    "jaro_winkler_similarity — an independent reference "
    "implementation, the strongest oracle form a custom Python kernel "
    "can have; guarded small-dim pair join",
)
def nation_name_jw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.functions.udfs import jaro_winkler_pandas_udf

    jw = jaro_winkler_pandas_udf()
    n = load(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("ka"), F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("kb"), F.col("n_name").alias("name_b"))
    return (
        a.join(F.broadcast(b), F.col("ka") < F.col("kb"))
        .withColumn("jw", F.round(jw("name_a", "name_b"), 6))
        .filter(F.col("jw") >= 0.75)
        .select("name_a", "name_b", "jw")
    )


@register(
    "orders_benford_first_digit",
    """
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           round(n * 1.0 / total, 6) AS observed,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_expected,
           round(n * 1.0 / total - log10(1.0 + 1.0 / digit), 6) AS deviation
    FROM c, t
    """,
    doc="Benford's-law first-digit audit on order totals (Newcomb 1881 / "
    "Benford 1938; the standard forensic data-quality screen): observed "
    "first-digit frequencies vs log10(1+1/d), per-digit deviation — one "
    "scan, one hash agg, scalar-broadcast total",
)
def orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("observed"),
        F.round(expected, 6).alias("benford_expected"),
        F.round(F.col("n") * 1.0 / F.col("total") - expected, 6).alias(
            "deviation"
        ),
    )


@register(
    "star_integrity_report",
    """
    SELECT 'orders_orphan_custkey' AS check_name,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_bad
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer_dup_pk',
           CAST((SELECT count(*) FROM (
                     SELECT c_custkey FROM customer
                     GROUP BY c_custkey HAVING count(*) > 1))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_null_orderdate',
           CAST((SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_nonpositive_qty',
           CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
                AS BIGINT)
    """,
    doc="Star-schema integrity audit (the expectation-suite core): FK "
    "orphans via anti joins, duplicate PKs, null/domain violations — "
    "each check a broadcast anti join or single agg, unioned into one "
    "report frame",
)
def star_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n_bad")).select(
            F.lit(name).alias("check_name"), "n_bad"
        )

    orphan_orders = o.join(
        F.broadcast(c.select("c_custkey")),
        o["o_custkey"] == c["c_custkey"],
        "left_anti",
    )
    orphan_li = li.join(
        o.select("o_orderkey"),
        li["l_orderkey"] == o["o_orderkey"],
        "left_anti",
    )
    dup_pk = (
        c.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > 1)
    )
    return (
        one("orders_orphan_custkey", orphan_orders)
        .unionByName(one("lineitem_orphan_orderkey", orphan_li))
        .unionByName(one("customer_dup_pk", dup_pk))
        .unionByName(
            one("orders_null_orderdate", o.filter(F.col("o_orderdate").isNull()))
        )
        .unionByName(
            one("lineitem_nonpositive_qty", li.filter(F.col("l_quantity") <= 0))
        )
    )


@register(
    "orders_group_by_all",
    """
    SELECT o_orderstatus,
           year(o_orderdate) AS yr,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
    """,
    doc="GROUP BY ALL / ORDER BY ALL (the DuckDB-pioneered QoL syntax, "
    "now in Spark 4): grouping keys inferred from the non-aggregate "
    "select items — both engines parse the SAME dialect here, so the "
    "oracle is literally the same text modulo nothing",
)
def orders_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba")
    return spark.sql(
        """
        SELECT o_orderstatus,
               year(o_orderdate) AS yr,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_gba
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@register(
    "lineitem_try_arithmetic",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_discount,
           round(sum(coalesce(l_extendedprice / nullif(l_discount, 0), 0)),
                 2) AS sum_price_per_discount,
           CAST(sum(CASE WHEN TRY_CAST(l_comment_like AS INT) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_uncastable
    FROM (SELECT l_returnflag, l_discount, l_extendedprice,
                 substr(l_returnflag, 1, 1) AS l_comment_like
          FROM lineitem) t
    GROUP BY l_returnflag
    """,
    doc="Error-safe arithmetic family (Spark try_divide / try_cast vs "
    "DuckDB's x/nullif + TRY_CAST): division by zero and failed casts "
    "yield NULL instead of errors or ±Inf — the semantics ELT pipelines "
    "need when raw data is hostile; NULL-producing rows counted and the "
    "safe division aggregated",
)
def lineitem_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_discount",
        "l_extendedprice",
        F.substring("l_returnflag", 1, 1).alias("l_comment_like"),
    )
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_discount") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero_discount"),
        F.round(
            F.sum(
                F.coalesce(
                    F.try_divide("l_extendedprice", F.nullif("l_discount", F.lit(0))),
                    F.lit(0.0),
                )
            ),
            2,
        ).alias("sum_price_per_discount"),
        F.sum(
            F.when(F.try_to_number("l_comment_like", F.lit("9")).isNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_uncastable"),
    )


@register(
    "order_ship_leadtime_by_priority",
    """
    WITH lt AS (
        SELECT o.o_orderpriority AS priority,
               CAST((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                    // 86400000000 AS BIGINT) AS days,
               l.l_orderkey, l.l_linenumber
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    r AS (
        SELECT priority, days,
               row_number() OVER (PARTITION BY priority
                                  ORDER BY days, l_orderkey, l_linenumber)
                   AS rn,
               count(*) OVER (PARTITION BY priority) AS n
        FROM lt
    )
    SELECT priority,
           CAST(max(n) AS BIGINT) AS n_lines,
           CAST(min(days) AS BIGINT) AS min_days,
           CAST(max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
                         THEN days END) AS BIGINT) AS median_days,
           CAST(max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT)
                         THEN days END) AS BIGINT) AS p95_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM r GROUP BY priority
    """,
    doc="Order-to-ship lead time per priority class: integer-day deltas, "
    "median/p95 as nearest-rank order statistics with a deterministic "
    "(days, orderkey, linenumber) tiebreak — the supply-chain SLA "
    "profile; one join + one window + one agg",
)
def order_ship_leadtime_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lt = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(
            "CAST((unix_micros(CAST(l_shipdate AS TIMESTAMP)) - "
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)))"
            " DIV 86400000000 AS BIGINT)"
        ).alias("days"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("priority").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    r = lt.select(
        "priority",
        "days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("priority")).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.col("n") * q).cast("long"), F.col("days")
        )
    ).cast("long")
    return r.groupBy("priority").agg(
        F.max("n").cast("long").alias("n_lines"),
        F.min("days").cast("long").alias("min_days"),
        pick(0.5).alias("median_days"),
        pick(0.95).alias("p95_days"),
        F.max("days").cast("long").alias("max_days"),
    )


@register(
    "part_revenue_pareto",
    """
    WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents DESC, l_partkey) AS rn,
               count(*) OVER () AS n_parts,
               sum(cents) OVER () AS total
        FROM rev
    ),
    decile AS (
        SELECT CAST(least(9, ((rn - 1) * 10) // n_parts) AS INT) AS decile,
               cents, total
        FROM ranked
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS cents,
           round(sum(cents) * 1.0 / max(total), 6) AS revenue_share
    FROM decile GROUP BY decile
    """,
    doc="Pareto / revenue-concentration analysis: parts ranked by "
    "integer-cents revenue, split into rank deciles with each decile's "
    "revenue share (the 80/20 curve every catalog owner checks) — one "
    "hash agg + one ranked window + integer-DIV decile assignment",
)
def part_revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long")
        ).alias("cents")
    )
    ranked = rev.select(
        "cents",
        F.row_number()
        .over(Window.orderBy(F.desc("cents"), "l_partkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_parts"),
        F.sum("cents").over(Window.partitionBy()).alias("total"),
    )
    decile = ranked.select(
        F.expr("CAST(LEAST(9, ((rn - 1) * 10) DIV n_parts) AS INT)").alias(
            "decile"
        ),
        "cents",
        "total",
    )
    return decile.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("cents").cast("long").alias("cents"),
        F.round(F.sum("cents") * 1.0 / F.max("total"), 6).alias(
            "revenue_share"
        ),
    )


@register(
    "region_nations_listagg",
    """
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nation_csv,
           CAST(count(*) AS BIGINT) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    doc="Spark 4 listagg / SQL:2016 LISTAGG ... WITHIN GROUP: ordered "
    "string aggregation per group (DuckDB twin: string_agg with ORDER "
    "BY) — the D8 collect-and-join pattern as the modern one-function "
    "form; deterministic because WITHIN GROUP imposes a total order",
)
def region_nations_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_la")
    return spark.sql(
        """
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                   AS nation_csv,
               CAST(count(*) AS BIGINT) AS n_nations
        FROM nation_la GROUP BY n_regionkey
        """
    )


@register(
    "orders_constraint_suite",
    """
    WITH base AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS p_price,
               CAST(sum(CASE WHEN o_orderdate IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS p_date,
               CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
                    THEN 1 ELSE 0 END) AS BIGINT) AS p_status,
               CAST(sum(CASE WHEN o_orderpriority LIKE '%-%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS p_priority
        FROM orders
    )
    SELECT 'positive_total_price' AS check_name, n AS n_rows,
           p_price AS n_pass, round(p_price / CAST(n AS DOUBLE), 6)
               AS pass_ratio,
           p_price / CAST(n AS DOUBLE) >= 1.0 AS passed
    FROM base
    UNION ALL
    SELECT 'orderdate_not_null', n, p_date,
           round(p_date / CAST(n AS DOUBLE), 6),
           p_date / CAST(n AS DOUBLE) >= 1.0
    FROM base
    UNION ALL
    SELECT 'status_in_domain', n, p_status,
           round(p_status / CAST(n AS DOUBLE), 6),
           p_status / CAST(n AS DOUBLE) >= 1.0
    FROM base
    UNION ALL
    SELECT 'priority_has_dash', n, p_priority,
           round(p_priority / CAST(n AS DOUBLE), 6),
           p_priority / CAST(n AS DOUBLE) >= 0.95
    FROM base
    """,
    doc="Declarative constraint suite (Deequ VerificationSuite shape): "
    "four row-level checks over orders evaluated as conditional "
    "aggregates in ONE scan — adding a check adds a counter, never a "
    "pass; one report row per check with pass ratio and verdict "
    "(sources/quality.py::check_constraints)",
)
def orders_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.sources.quality import check_constraints

    return check_constraints(
        load(spark, sf_dir, "orders"),
        [
            ("positive_total_price", "o_totalprice > 0", 1.0),
            ("orderdate_not_null", "o_orderdate IS NOT NULL", 1.0),
            ("status_in_domain", "o_orderstatus IN ('O','F','P')", 1.0),
            ("priority_has_dash", "o_orderpriority LIKE '%-%'", 0.95),
        ],
    )


@register(
    "supplier_order_counts_merge_join",
    """
    SELECT s.s_suppkey, s.s_name,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lineitems,
           round(sum(COALESCE(l.l_extendedprice, 0)), 2) AS total_price
    FROM supplier s LEFT JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="Join-strategy control: the same left join FORCED onto "
    "sort-merge with the MERGE hint (supplier is broadcast-sized, so "
    "Catalyst would otherwise pick BroadcastHashJoin) — the knob used "
    "at 100 TB when the 'small' side outgrows driver memory or a "
    "broadcast storm must be avoided; tests/test_plans.py pins "
    "SortMergeJoin in the physical plan while the oracle proves the "
    "result is strategy-invariant",
)
def supplier_order_counts_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    joined = supp.hint("merge").join(
        li, li.l_suppkey == supp.s_suppkey, "left"
    )
    return joined.groupBy("s_suppkey", "s_name").agg(
        F.count("l_orderkey").alias("n_lineitems"),
        F.round(F.sum(F.coalesce(F.col("l_extendedprice"), F.lit(0.0))), 2).alias(
            "total_price"
        ),
    )


@register(
    "orders_pivot_sql",
    """
    SELECT o_orderpriority,
           CAST(COALESCE(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0)
                AS BIGINT) AS st_open,
           CAST(COALESCE(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0)
                AS BIGINT) AS st_filled,
           CAST(COALESCE(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0)
                AS BIGINT) AS st_partial
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="SQL PIVOT clause (the syntax form of D12's DataFrame pivot): "
    "order counts by priority pivoted across the status domain — "
    "Catalyst rewrites PIVOT into exactly the conditional-aggregate "
    "plan the oracle states explicitly, one hash aggregate wide",
)
def orders_pivot_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_pv")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COALESCE(st_open, 0) AS BIGINT) AS st_open,
               CAST(COALESCE(st_filled, 0) AS BIGINT) AS st_filled,
               CAST(COALESCE(st_partial, 0) AS BIGINT) AS st_partial
        FROM (SELECT o_orderpriority, o_orderstatus FROM orders_pv)
        PIVOT (
            count(*) FOR o_orderstatus
            IN ('O' AS st_open, 'F' AS st_filled, 'P' AS st_partial)
        )
        """
    )


@register(
    "lineitem_weighted_median_price",
    """
    WITH w AS (
        SELECT l_returnflag,
               round(l_extendedprice, 2) AS price,
               CAST(l_quantity AS BIGINT) AS wt,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    c AS (
        SELECT l_returnflag, price, wt, l_orderkey, l_linenumber,
               sum(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY price, l_orderkey, l_linenumber
                             ROWS UNBOUNDED PRECEDING) AS cum,
               sum(wt) OVER (PARTITION BY l_returnflag) AS total
        FROM w
    ),
    qualified AS (
        SELECT l_returnflag, price,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY price, l_orderkey, l_linenumber)
                   AS rn
        FROM c WHERE 2 * cum >= total
    )
    SELECT l_returnflag, price AS weighted_median_price
    FROM qualified WHERE rn = 1
    """,
    doc="Weighted median (quantity-weighted median extended price per "
    "return flag): cumulative-weight nearest-rank — the first value "
    "whose running weight reaches half the total, so both engines "
    "select the identical element; integer weights keep the running "
    "sums exact. Scale shape (round 9, after the 100x stress run "
    "measured the old per-flag single-task window at 65x/73 s): "
    "(1) PRE-REDUCE to (flag, price) with summed weights — the selected "
    "median PRICE is invariant to intra-price tiebreak order, and the "
    "reduced frame is bounded by the rounded-price DOMAIN, not the "
    "corpus; (2) grouped_cumsum (operators/rank.py frozen-boundary "
    "two-pass) for the per-flag running weight — no single-task sort "
    "at any scale; (3) broadcast per-flag totals, min(price) over the "
    "qualifying rows ≡ the oracle's rn=1 pick since prices are distinct "
    "per flag after the reduce. Oracle unchanged — bit-identical "
    "result. 100x stress: 64.9x -> ~2x (PERF.md round-9 table)",
)
def lineitem_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.rank import grouped_cumsum

    byprice = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.round("l_extendedprice", 2).alias("price"),
            F.col("l_quantity").cast("long").alias("wt"),
        )
        .groupBy("l_returnflag", "price")
        .agg(F.sum("wt").alias("w"))
    )
    cum = grouped_cumsum(
        byprice.withColumn("cum", F.col("w")),
        ["l_returnflag"],
        [("price", True)],
        ["cum"],
    )
    totals = byprice.groupBy("l_returnflag").agg(
        F.sum("w").alias("total")
    )
    return (
        cum.join(F.broadcast(totals), "l_returnflag")
        .filter(2 * F.col("cum") >= F.col("total"))
        .groupBy("l_returnflag")
        .agg(F.min("price").alias("weighted_median_price"))
        .select("l_returnflag", "weighted_median_price")
    )


@register(
    "users_mode_event_type",
    """
    WITH counts AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT user_id, event_type, n,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY n DESC, event_type) AS rn
        FROM counts
    )
    SELECT user_id, event_type AS mode_type, n AS n_occurrences
    FROM ranked WHERE rn = 1
    """,
    doc="Deterministic MODE per group: most frequent event type per user "
    "with ties broken lexicographically — the count+rank idiom instead "
    "of the built-in mode() whose tie choice is partition-order-"
    "dependent (the determinism rule that makes the aggregate "
    "oracle-checkable and layout-invariant)",
)
def users_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    counts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.desc("n"), F.col("event_type")
        )
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("n").alias("n_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# B9 duplicate-payment detection (same payer, same amount, close in time)
# ---------------------------------------------------------------------------
@register(
    "orders_duplicate_payments",
    """
    WITH o AS (
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CAST(floor(round(o_totalprice, 0) / 100.0) AS BIGINT)
                   AS band
        FROM orders
    )
    SELECT a.o_custkey AS custkey, a.band AS amount_band,
           a.cents AS cents_a, b.cents AS cents_b,
           a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           CAST(datediff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
               AS gap_days
    FROM o a JOIN o b
      ON b.o_custkey = a.o_custkey
     AND b.band = a.band
     AND b.o_orderkey > a.o_orderkey
     AND b.o_orderdate >= a.o_orderdate
     AND b.o_orderdate <= a.o_orderdate + INTERVAL 90 DAY
    ORDER BY custkey, amount_band, key_a, key_b
    """,
    doc="B9 duplicate-payment candidates: pairs of orders from the SAME "
    "customer in the SAME $100 amount band within 90 days — the "
    "AP-audit / fin-crime screen (banded rather than exact-cents: "
    "TPC-H prices are near-unique, and real double-payments differ by "
    "fees; both sides' exact cents are reported for the analyst). The "
    "join is EQUI on (custkey, band) — Catalyst plans a hash join, "
    "never a cartesian — with the 90-day residual post-match and "
    "key_a < key_b dedup so each pair reports once. Pair mass is "
    "bounded by per-(customer, band) multiplicity. One shuffle on "
    "the composite key.",
)
def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
        F.expr(
            "CAST(floor(round(o_totalprice, 0) / 100.0) AS BIGINT)"
        ).alias("band"),
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("band").alias("amount_band"),
        F.col("cents").alias("cents_a"),
        F.col("o_orderkey").alias("key_a"),
        F.col("o_orderdate").alias("date_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey_b"),
        F.col("band").alias("band_b"),
        F.col("cents").alias("cents_b"),
        F.col("o_orderkey").alias("key_b"),
        F.col("o_orderdate").alias("date_b"),
    )
    pairs = a.join(
        b,
        (F.col("custkey_b") == F.col("custkey"))
        & (F.col("band_b") == F.col("amount_band"))
        & (F.col("key_b") > F.col("key_a"))
        & (F.col("date_b") >= F.col("date_a"))
        & (F.col("date_b") <= F.expr("date_a + INTERVAL 90 DAY")),
    )
    return pairs.select(
        "custkey", "amount_band", "cents_a", "cents_b", "key_a", "key_b",
        F.expr("CAST(datediff(date_b, date_a) AS BIGINT)").alias(
            "gap_days"
        ),
    ).orderBy("custkey", "amount_band", "key_a", "key_b")


# ---------------------------------------------------------------------------
# B10 calendar-aligned year-over-year growth
# ---------------------------------------------------------------------------
@register(
    "orders_yoy_growth_monthly",
    """
    WITH m AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
               CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev
        FROM orders GROUP BY 1, 2
    )
    SELECT cur.y AS year, cur.mo AS month,
           cur.rev AS rev_cents, prev.rev AS prev_year_cents,
           round(10000.0 * CAST(cur.rev - prev.rev AS DOUBLE) / prev.rev, 4)
               AS yoy_bp
    FROM m cur JOIN m prev
      ON prev.y = cur.y - 1 AND prev.mo = cur.mo
    ORDER BY year, month
    """,
    doc="B10 calendar-ALIGNED year-over-year growth per month — the "
    "seasonality-free growth read (same-month comparison cancels the "
    "seasonal profile that the F-series MoM growth can't), in basis "
    "points from exact integer cents (one fp division, the dialect "
    "rule). Self-join on the shifted (year-1, month) key — a bounded "
    "months x months equi-join on the AGGREGATE, never the fact "
    "table. One hash agg + one tiny join.",
)
def orders_yoy_growth_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = load(spark, sf_dir, "orders").groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        F.sum(
            F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")
        ).alias("rev")
    )
    cur = m.select(
        F.col("y").alias("year"),
        F.col("mo").alias("month"),
        F.col("rev").alias("rev_cents"),
    )
    prev = m.select(
        (F.col("y") + 1).alias("py"),
        F.col("mo").alias("pmo"),
        F.col("rev").alias("prev_year_cents"),
    )
    return (
        cur.join(
            prev,
            (F.col("py") == F.col("year"))
            & (F.col("pmo") == F.col("month")),
        )
        .select(
            "year", "month", "rev_cents", "prev_year_cents",
            F.expr(
                "round(10000.0 * CAST(rev_cents - prev_year_cents AS DOUBLE)"
                " / prev_year_cents, 4)"
            ).alias("yoy_bp"),
        )
        .orderBy("year", "month")
    )


# ---------------------------------------------------------------------------
# B11 pricing waterfall (gross -> discount -> net -> tax -> charged)
# ---------------------------------------------------------------------------
@register(
    "lineitem_pricing_waterfall",
    """
    WITH l AS (
        SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS gross,
               CAST(round(l_extendedprice * l_discount * 100, 0)
                    AS BIGINT) AS disc,
               CAST(round(l_extendedprice * (1 - l_discount) * l_tax
                          * 100, 0) AS BIGINT) AS tax
        FROM lineitem
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(gross) AS BIGINT) AS gross_cents,
           CAST(sum(disc) AS BIGINT) AS discount_cents,
           CAST(sum(gross) - sum(disc) AS BIGINT) AS net_cents,
           CAST(sum(tax) AS BIGINT) AS tax_cents,
           CAST(sum(gross) - sum(disc) + sum(tax) AS BIGINT)
               AS charged_cents,
           round(10000.0 * CAST(sum(disc) AS DOUBLE) / sum(gross), 4)
               AS discount_bp,
           round(10000.0 * CAST(sum(tax) AS DOUBLE)
                 / (sum(gross) - sum(disc)), 4) AS effective_tax_bp
    FROM l
    """,
    doc="B11 pricing waterfall over lineitem: gross extended price -> "
    "discount taken -> net -> tax -> amount charged, every tier an "
    "EXACT BIGINT total from per-line integer-cents rounding (the "
    "q1 dialect discipline applied to the full revenue bridge — the "
    "finance close-out report where a one-cent drift is a reconcile "
    "failure), plus discount and effective-tax rates in basis "
    "points. One scan, one reduce; single summary row.",
)
def lineitem_pricing_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").alias(
            "gross"
        ),
        F.expr(
            "CAST(round(l_extendedprice * l_discount * 100, 0) AS BIGINT)"
        ).alias("disc"),
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * l_tax"
            " * 100, 0) AS BIGINT)"
        ).alias("tax"),
    )
    return l.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("gross").alias("gross_cents"),
        F.sum("disc").alias("discount_cents"),
        (F.sum("gross") - F.sum("disc")).cast("long").alias("net_cents"),
        F.sum("tax").alias("tax_cents"),
        (F.sum("gross") - F.sum("disc") + F.sum("tax"))
        .cast("long")
        .alias("charged_cents"),
        F.expr(
            "round(10000.0 * CAST(sum(disc) AS DOUBLE) / sum(gross), 4)"
        ).alias("discount_bp"),
        F.expr(
            "round(10000.0 * CAST(sum(tax) AS DOUBLE)"
            " / (sum(gross) - sum(disc)), 4)"
        ).alias("effective_tax_bp"),
    )


# ---------------------------------------------------------------------------
# B12 4-4-5 fiscal-calendar revenue rollup
# ---------------------------------------------------------------------------
@register(
    "orders_fiscal_445_rollup",
    """
    WITH base AS (
        SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
               CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate)
                    AS BIGINT) AS doff
        FROM orders
    ),
    fis AS (
        SELECT cents,
               CAST(floor(doff / 364.0) AS BIGINT) AS fy,
               CAST(floor((doff % 364) / 91.0) AS BIGINT) AS fq,
               CASE WHEN CAST((doff % 364) % 91 AS BIGINT) < 28 THEN 0
                    WHEN CAST((doff % 364) % 91 AS BIGINT) < 56 THEN 1
                    ELSE 2 END AS pin_q,
               CAST(floor((doff % 364) / 7.0) AS BIGINT) AS fw
        FROM base WHERE doff >= 0
    )
    SELECT fy AS fiscal_year, fq AS fiscal_quarter,
           CAST(fq * 3 + pin_q AS BIGINT) AS fiscal_period,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS rev_cents,
           CAST(min(fw) AS BIGINT) AS first_week,
           CAST(max(fw) AS BIGINT) AS last_week
    FROM fis
    GROUP BY fy, fq, pin_q
    ORDER BY fiscal_year, fiscal_quarter, fiscal_period
    """,
    doc="B12 4-4-5 fiscal-calendar rollup (retail/NRF convention): each "
    "364-day fiscal year (epoch 1992-01-01) splits into four 91-day "
    "quarters of 4+4+5 whole weeks, so every fiscal period contains "
    "complete weeks and period-over-period comparisons are weekday-"
    "mix-clean — the calendar dimension Gregorian months break (a "
    "month's extra Saturday inflates retail revenue ~3%). All "
    "bucketing is EXACT integer day arithmetic (floor/mod on day "
    "offsets — no fp dates); revenue in exact cents. The 53rd-week "
    "leap residue lands in the final period per the NRF restatement "
    "rule. One scan + one hash reduce; one row per fiscal period.",
)
def orders_fiscal_445_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    base = load(spark, sf_dir, "orders").select(
        F.expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
        F.expr(
            "CAST(datediff(o_orderdate, TIMESTAMP '1992-01-01') AS BIGINT)"
        ).alias("doff"),
    )
    fis = base.filter(F.col("doff") >= 0).select(
        "cents",
        F.expr("CAST(floor(doff / 364.0) AS BIGINT)").alias("fy"),
        F.expr("CAST(floor((doff % 364) / 91.0) AS BIGINT)").alias("fq"),
        F.expr(
            "CASE WHEN CAST((doff % 364) % 91 AS BIGINT) < 28 THEN 0"
            " WHEN CAST((doff % 364) % 91 AS BIGINT) < 56 THEN 1"
            " ELSE 2 END"
        ).alias("pin_q"),
        F.expr("CAST((doff % 364) DIV 7 AS BIGINT)").alias("fw"),
    )
    return (
        fis.groupBy("fy", "fq", "pin_q")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("rev_cents"),
            F.min("fw").alias("first_week"),
            F.max("fw").alias("last_week"),
        )
        .select(
            F.col("fy").alias("fiscal_year"),
            F.col("fq").alias("fiscal_quarter"),
            (F.col("fq") * 3 + F.col("pin_q"))
            .cast("long")
            .alias("fiscal_period"),
            "n_orders", "rev_cents", "first_week", "last_week",
        )
        .orderBy("fiscal_year", "fiscal_quarter", "fiscal_period")
    )


# ---------------------------------------------------------------------------
# B13 Laspeyres / Paasche / Fisher price indices by year
# ---------------------------------------------------------------------------
@register(
    "lineitem_price_indices_yearly",
    """
    WITH li AS (
        SELECT l.l_partkey AS pk,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS y,
               CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS rev,
               CAST(sum(CAST(round(l.l_quantity, 0) AS BIGINT))
                    AS BIGINT) AS qty
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
    ),
    base AS (
        SELECT pk, rev AS rev0, qty AS qty0 FROM li
        WHERE y = (SELECT min(y) FROM li)
    ),
    matched AS (
        SELECT li.y, li.pk, li.rev, li.qty, b.rev0, b.qty0
        FROM li JOIN base b ON b.pk = li.pk
        WHERE li.qty > 0 AND b.qty0 > 0
    ),
    agg AS (
        SELECT y,
               CAST(count(*) AS BIGINT) AS n_parts,
               sum((CAST(rev AS DOUBLE) / qty) * qty0) AS p1q0,
               sum((CAST(rev0 AS DOUBLE) / qty0) * qty0) AS p0q0,
               sum((CAST(rev AS DOUBLE) / qty) * qty) AS p1q1,
               sum((CAST(rev0 AS DOUBLE) / qty0) * qty) AS p0q1
        FROM matched GROUP BY y
    )
    SELECT y AS year, n_parts,
           round(100.0 * p1q0 / p0q0, 4) AS laspeyres,
           round(100.0 * p1q1 / p0q1, 4) AS paasche,
           round(100.0 * sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 4)
               AS fisher
    FROM agg ORDER BY year
    """,
    doc="B13 index-number theory on part prices by year (base = first "
    "year): Laspeyres (base-quantity weights — overstates inflation "
    "under substitution), Paasche (current weights — understates), "
    "and Fisher's ideal geometric mean, over the parts present in "
    "both the base and comparison year (matched-model). Unit prices "
    "are exact-cents revenue / integer quantity per (part, year); "
    "the four cross-sums are double but each term is a ratio of "
    "exact integers times an exact integer — and the sums aggregate "
    "UNORDERED, so the result is rounded at 4dp where association "
    "drift cannot reach (term magnitudes ~1e6, 53-bit mantissa "
    "headroom ~1e9 terms — the F119 small-reduce argument at the "
    "parts-per-year scale; at 1e9+ matched parts switch to the "
    "ordered-cumulative device). One join + two reduces; one row "
    "per year.",
)
def lineitem_price_indices_yearly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").select(
                "o_orderkey", F.year("o_orderdate").cast("long").alias("y")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("pk"), "y")
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)")
            ).alias("rev"),
            F.sum(
                F.expr("CAST(round(l_quantity, 0) AS BIGINT)")
            ).alias("qty"),
        )
    )
    y0 = li.agg(F.min("y").alias("y0"))
    base = (
        li.crossJoin(F.broadcast(y0))
        .filter(F.col("y") == F.col("y0"))
        .select(
            F.col("pk").alias("bpk"),
            F.col("rev").alias("rev0"),
            F.col("qty").alias("qty0"),
        )
    )
    matched = li.join(base, li.pk == base.bpk).filter(
        (F.col("qty") > 0) & (F.col("qty0") > 0)
    )
    agg = matched.groupBy("y").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.expr("(CAST(rev AS DOUBLE) / qty) * qty0")).alias("p1q0"),
        F.sum(F.expr("(CAST(rev0 AS DOUBLE) / qty0) * qty0")).alias(
            "p0q0"
        ),
        F.sum(F.expr("(CAST(rev AS DOUBLE) / qty) * qty")).alias("p1q1"),
        F.sum(F.expr("(CAST(rev0 AS DOUBLE) / qty0) * qty")).alias(
            "p0q1"
        ),
    )
    return agg.select(
        F.col("y").alias("year"),
        "n_parts",
        F.expr("round(100.0 * p1q0 / p0q0, 4)").alias("laspeyres"),
        F.expr("round(100.0 * p1q1 / p0q1, 4)").alias("paasche"),
        F.expr(
            "round(100.0 * sqrt((p1q0 / p0q0) * (p1q1 / p0q1)), 4)"
        ).alias("fisher"),
    ).orderBy("year")
