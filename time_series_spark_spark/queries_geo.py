"""Geospatial queries: grid-bucketed radius self-join, broadcast
nearest-neighbor against a dimension, and grid-cell density — over
coordinates derived deterministically from entity keys (operators/geo.py),
so the DuckDB oracle sees the identical geometry.

Dialect notes (SURVEY.md §5.1): the md5-uniform coordinates are
bit-identical across engines (power-of-two division + affine map); trig
drifts by ulps between libm implementations, so every distance is rounded
BEFORE it participates in a filter or an ordering, and the rounded value
is what both engines compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_spark_spark.operators.geo import (
    grid_cells,
    grid_radius_join,
    hash_point,
    nearest_neighbor_join,
)
from time_series_spark_spark.queries import register
from time_series_spark_spark.sources.io import load

# Bounding box (Western-Europe-sized so a 50 km radius is meaningful),
# and grid cells sized ≥ the radius at the box's worst latitude:
# 0.5° lat = 55.6 km ≥ 50; 0.75° lon at 50°N = 111.195·cos(50°)·0.75
# = 53.6 km ≥ 50 — the grid_radius_join cell contract holds.
LAT_MIN, LAT_MAX = 40.0, 50.0
LON_MIN, LON_MAX = -10.0, 10.0
RADIUS_KM = 50.0
LAT_CELL, LON_CELL = 0.5, 0.75

# DuckDB-side derivations, bit-identical to operators/geo.hash_point.
def _sql_coord(tag: str, key_expr: str, lo: float, hi: float) -> str:
    return (
        f"{lo!r} + {hi - lo!r} * (('0x' || substring(md5('{tag}:' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"
    )


_SQL_HAVERSINE = (
    "2.0 * 6371.0088 * asin(sqrt("
    "pow(sin(radians(lat_b - lat_a) / 2), 2)"
    " + cos(radians(lat_a)) * cos(radians(lat_b))"
    " * pow(sin(radians(lon_b - lon_a) / 2), 2)))"
)


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    lat, lon = hash_point(
        F.col("c_custkey"), LAT_MIN, LAT_MAX, LON_MIN, LON_MAX
    )
    return cust.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        lat.alias("lat"), lon.alias("lon"),
    )


@register(
    "geo_radius_pairs",
    f"""
    WITH pts AS (
        SELECT c_custkey,
               {_sql_coord('lat', 'c_custkey', LAT_MIN, LAT_MAX)} AS lat,
               {_sql_coord('lon', 'c_custkey', LON_MIN, LON_MAX)} AS lon
        FROM customer WHERE c_nationkey < 5
    ),
    pairs AS (
        SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
               a.lat AS lat_a, a.lon AS lon_a,
               b.lat AS lat_b, b.lon AS lon_b
        FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
    )
    SELECT cust_a, cust_b, round({_SQL_HAVERSINE}, 3) AS dist_km
    FROM pairs
    WHERE round({_SQL_HAVERSINE}, 3) <= {RADIUS_KM!r}
    """,
    doc="Geo radius self-join: all customer pairs within 50 km, via "
    "spatial-grid bucketing (3x3 neighbor-cell probe, one equi-join on "
    "cell id, candidates bounded by points-per-cell) — the oracle is the "
    "naive O(n^2) cross join on a nation-restricted slice, verifying the "
    "bucketed plan finds EXACTLY the same pairs (operators/geo.py)",
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _customer_points(spark, sf_dir).filter(F.col("c_nationkey") < 5)
    pairs = grid_radius_join(
        pts,
        id_col="c_custkey",
        radius_km=RADIUS_KM,
        lat_cell_deg=LAT_CELL,
        lon_cell_deg=LON_CELL,
    )
    return pairs.select(
        F.col("id_a").alias("cust_a"),
        F.col("id_b").alias("cust_b"),
        "dist_km",
    )


@register(
    "geo_nearest_supplier",
    f"""
    WITH cust AS (
        SELECT c_custkey,
               {_sql_coord('lat', 'c_custkey', LAT_MIN, LAT_MAX)} AS lat_a,
               {_sql_coord('lon', 'c_custkey', LON_MIN, LON_MAX)} AS lon_a
        FROM customer WHERE c_custkey <= 600
    ),
    supp AS (
        SELECT s_suppkey,
               {_sql_coord('slat', 's_suppkey', LAT_MIN, LAT_MAX)} AS lat_b,
               {_sql_coord('slon', 's_suppkey', LON_MIN, LON_MAX)} AS lon_b
        FROM supplier
    ),
    ranked AS (
        SELECT c_custkey, s_suppkey,
               round({_SQL_HAVERSINE}, 6) AS d,
               row_number() OVER (
                   PARTITION BY c_custkey
                   ORDER BY round({_SQL_HAVERSINE}, 6), s_suppkey
               ) AS rk
        FROM cust CROSS JOIN supp
    )
    SELECT c_custkey, s_suppkey AS nearest_s_suppkey,
           round(d, 3) AS dist_km
    FROM ranked WHERE rk = 1
    """,
    doc="Geo nearest-neighbor against a dimension: each customer's "
    "closest supplier by haversine — broadcast the (small) supplier "
    "points and partial-min aggregate min(struct(dist, id)) per customer, "
    "so the shuffle carries one row per customer; ties break on the "
    "6dp-rounded distance then supplier key, matching the oracle's "
    "row_number ordering exactly (operators/geo.py)",
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _customer_points(spark, sf_dir).filter(F.col("c_custkey") <= 600)
    supp = load(spark, sf_dir, "supplier")
    slat, slon = hash_point(
        F.col("s_suppkey"), LAT_MIN, LAT_MAX, LON_MIN, LON_MAX, tag="s"
    )
    supp_pts = supp.select(
        "s_suppkey", slat.alias("lat"), slon.alias("lon")
    )
    return nearest_neighbor_join(
        cust, supp_pts, probe_id="c_custkey", dim_id="s_suppkey"
    )


@register(
    "geo_grid_density",
    f"""
    WITH pts AS (
        SELECT c_acctbal,
               {_sql_coord('lat', 'c_custkey', LAT_MIN, LAT_MAX)} AS lat,
               {_sql_coord('lon', 'c_custkey', LON_MIN, LON_MAX)} AS lon
        FROM customer
    )
    SELECT CAST(floor(lat / {LAT_CELL!r}) AS INT) AS cell_i,
           CAST(floor(lon / {LON_CELL!r}) AS INT) AS cell_j,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(avg(c_acctbal), 4) AS avg_acctbal
    FROM pts
    GROUP BY 1, 2
    ORDER BY n_customers DESC, cell_i, cell_j
    LIMIT 15
    """,
    doc="Geo grid-cell density: customers hashed into 0.5x0.75-degree "
    "cells, top-15 cells by count — the geohash-bucketing aggregation "
    "pattern (one hash agg on the cell id; at 100 TB the cell id is also "
    "the natural partition/cluster key for spatial locality)",
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _customer_points(spark, sf_dir)
    ci, cj = grid_cells(F.col("lat"), F.col("lon"), LAT_CELL, LON_CELL)
    return (
        pts.groupBy(ci.alias("cell_i"), cj.alias("cell_j"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy(F.desc("n_customers"), "cell_i", "cell_j")
        .limit(15)
    )


@register(
    "geo_supplier_coverage",
    f"""
    WITH cust AS (
        SELECT c_custkey,
               {_sql_coord('lat', 'c_custkey', LAT_MIN, LAT_MAX)} AS lat_a,
               {_sql_coord('lon', 'c_custkey', LON_MIN, LON_MAX)} AS lon_a
        FROM customer WHERE c_nationkey < 10
    ),
    supp AS (
        SELECT s_suppkey,
               {_sql_coord('slat', 's_suppkey', LAT_MIN, LAT_MAX)} AS lat_b,
               {_sql_coord('slon', 's_suppkey', LON_MIN, LON_MAX)} AS lon_b
        FROM supplier
    ),
    pairs AS (
        SELECT s_suppkey, round({_SQL_HAVERSINE}, 3) AS d
        FROM cust CROSS JOIN supp
    )
    SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_customers_100km,
           round(min(d), 3) AS nearest_km
    FROM pairs WHERE d <= 100.0
    GROUP BY s_suppkey
    """,
    doc="Two-table geo radius join: customers within 100 km of each "
    "supplier, counted per supplier — grid-bucketed (1.0°×1.5° cells "
    "cover the 100 km radius at the box's worst latitude), replication "
    "split by axis (left fans to 3 lat-neighbor cells, right to 3 "
    "lon-neighbor cells), one equi-join on cell id; the oracle "
    "is the naive cross join on a nation-restricted slice "
    "(operators/geo.py::grid_radius_join_two)",
)
def geo_supplier_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.geo import grid_radius_join_two

    cust = _customer_points(spark, sf_dir).filter(F.col("c_nationkey") < 10)
    supp = load(spark, sf_dir, "supplier")
    slat, slon = hash_point(
        F.col("s_suppkey"), LAT_MIN, LAT_MAX, LON_MIN, LON_MAX, tag="s"
    )
    supp_pts = supp.select("s_suppkey", slat.alias("lat"), slon.alias("lon"))
    pairs = grid_radius_join_two(
        cust,
        supp_pts,
        left_id="c_custkey",
        right_id="s_suppkey",
        radius_km=100.0,
        lat_cell_deg=1.0,
        lon_cell_deg=1.5,
    )
    return pairs.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_customers_100km"),
        F.round(F.min("dist_km"), 3).alias("nearest_km"),
    )


# DBSCAN-on-a-grid: cells ≥ 1.25x the mean occupancy are "dense" (the
# integer cross-multiplied predicate n*4*n_cells >= 5*n_pts is exact in
# both engines); dense cells connect through their 8-neighborhood and
# clusters are the connected components — the classic scalable DBSCAN
# surrogate (cell side >= eps ⇒ adjacent dense cells are eps-reachable).
_DBSCAN_CELL_ID = "(ci + 1000) * 100000 + (cj + 1000)"


@register(
    "geo_grid_dbscan_clusters",
    f"""
    WITH RECURSIVE pts AS (
        SELECT {_sql_coord('lat', 'c_custkey', LAT_MIN, LAT_MAX)} AS lat,
               {_sql_coord('lon', 'c_custkey', LON_MIN, LON_MAX)} AS lon
        FROM customer
    ),
    cells AS (
        SELECT CAST(floor(lat / {LAT_CELL!r}) AS INT) AS ci,
               CAST(floor(lon / {LON_CELL!r}) AS INT) AS cj,
               count(*) AS n
        FROM pts GROUP BY 1, 2
    ),
    tot AS (
        SELECT count(*) AS n_cells, CAST(sum(n) AS BIGINT) AS n_pts
        FROM cells
    ),
    dense AS (
        SELECT ci, cj, n, CAST({_DBSCAN_CELL_ID} AS BIGINT) AS cell
        FROM cells, tot WHERE n * 4 * tot.n_cells >= 5 * tot.n_pts
    ),
    edges AS (
        SELECT a.cell AS src, b.cell AS dst
        FROM dense a JOIN dense b
          ON abs(a.ci - b.ci) <= 1 AND abs(a.cj - b.cj) <= 1
         AND a.cell <> b.cell
    ),
    reach(cell, lab) AS (
        SELECT cell, cell FROM dense
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.cell
    ),
    lbl AS (SELECT cell, min(lab) AS cluster_id FROM reach GROUP BY cell)
    SELECT cluster_id,
           count(*) AS n_cells,
           CAST(sum(n) AS BIGINT) AS n_points,
           min(ci) AS ci_min, max(ci) AS ci_max,
           min(cj) AS cj_min, max(cj) AS cj_max
    FROM dense JOIN lbl ON dense.cell = lbl.cell
    GROUP BY cluster_id
    ORDER BY n_points DESC, cluster_id
    LIMIT 20
    """,
    doc="Grid-DBSCAN spatial clustering: customers bucketed into grid "
    "cells, cells >= 1.25x mean occupancy marked dense (exact integer "
    "cross-multiplied threshold), dense cells joined through their "
    "8-neighborhood (exploded-offset EQUI-join, never a theta join) and "
    "clustered by pointer-jumping connected components "
    "(operators/graph.py) — top-20 clusters with size and bbox. The "
    "scalable DBSCAN surrogate: density is one hash agg, adjacency is "
    "bounded (<= 8 edges/cell), CC is O(log n) rounds; the DuckDB "
    "oracle recomputes components via a recursive CTE.",
)
def geo_grid_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from time_series_spark_spark.operators.graph import connected_components

    pts = _customer_points(spark, sf_dir)
    ci, cj = grid_cells(F.col("lat"), F.col("lon"), LAT_CELL, LON_CELL)
    cells = pts.groupBy(ci.alias("ci"), cj.alias("cj")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("n").alias("n_pts")
    )
    dense = (
        cells.crossJoin(F.broadcast(tot))
        .filter(
            F.col("n") * 4 * F.col("n_cells") >= 5 * F.col("n_pts")
        )
        .withColumn(
            "cell",
            ((F.col("ci") + 1000) * 100000 + (F.col("cj") + 1000)).cast(
                "long"
            ),
        )
        .select("ci", "cj", "n", "cell")
    )
    offs = [
        (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
    ]
    nbr = dense.select(
        "cell",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in offs
                ]
            )
        ).alias("off"),
        (F.col("ci")).alias("ci0"),
        (F.col("cj")).alias("cj0"),
    ).select(
        "cell",
        (F.col("ci0") + F.col("off.dx")).alias("ci"),
        (F.col("cj0") + F.col("off.dy")).alias("cj"),
    )
    edges = nbr.join(
        dense.select(F.col("cell").alias("cell_b"), "ci", "cj"),
        on=["ci", "cj"],
    ).select(F.col("cell").alias("id_a"), F.col("cell_b").alias("id_b"))
    comp = connected_components(edges)
    lab = dense.join(comp, dense.cell == comp.id, "left").withColumn(
        "cluster_id", F.coalesce("component", "cell")
    )
    return (
        lab.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").alias("n_points"),
            F.min(lab.ci).alias("ci_min"),
            F.max(lab.ci).alias("ci_max"),
            F.min(lab.cj).alias("cj_min"),
            F.max(lab.cj).alias("cj_max"),
        )
        .orderBy(F.desc("n_points"), "cluster_id")
        .limit(20)
    )
