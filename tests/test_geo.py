"""Geospatial operators (operators/geo.py): the grid-bucketed radius join
must find EXACTLY the naive-cross-join pair set, the broadcast NN must
match brute force, haversine must be right on known geometry, and the
Poisson bootstrap must be deterministic with calibrated weights."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from time_series_spark_spark.operators.geo import (
    grid_radius_join,
    hash_point,
    haversine_km,
    nearest_neighbor_join,
)
from time_series_spark_spark.sources.io import load

SF = "/root/testdata/sf0.001"


def _points(spark, n_nations: int = 25):
    cust = load(spark, SF, "customer").filter(
        F.col("c_nationkey") < n_nations
    )
    lat, lon = hash_point(F.col("c_custkey"), 40.0, 50.0, -10.0, 10.0)
    return cust.select(
        "c_custkey", lat.alias("lat"), lon.alias("lon")
    )


def test_haversine_known_distance(spark):
    # Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ≈ 343.5 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    )
    d = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("d")
    ).first()["d"]
    assert abs(d - 343.5) < 1.0


def test_haversine_zero_and_symmetry(spark):
    df = spark.createDataFrame(
        [(45.0, 5.0, 45.0, 5.0), (41.0, -3.0, 49.0, 8.0)],
        "a double, b double, c double, d double",
    )
    rows = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("ab"),
        haversine_km(F.col("c"), F.col("d"), F.col("a"), F.col("b")).alias("ba"),
    ).collect()
    assert rows[0]["ab"] == 0.0
    assert math.isclose(rows[1]["ab"], rows[1]["ba"], rel_tol=1e-12)


def test_grid_radius_join_equals_bruteforce(spark):
    pts = _points(spark)
    got = {
        (r["id_a"], r["id_b"], r["dist_km"])
        for r in grid_radius_join(
            pts, "c_custkey", radius_km=50.0, lat_cell_deg=0.5,
            lon_cell_deg=0.75,
        ).collect()
    }
    a = pts.select(
        F.col("c_custkey").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
    )
    b = pts.select(
        F.col("c_custkey").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
    )
    dist = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ),
        3,
    )
    naive = {
        (r["id_a"], r["id_b"], r["dist_km"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= 50.0)
        .collect()
    }
    assert naive  # the fixture box must actually produce pairs
    assert got == naive


def test_grid_radius_join_emits_each_pair_once(spark):
    pts = _points(spark)
    out = grid_radius_join(
        pts, "c_custkey", radius_km=50.0, lat_cell_deg=0.5,
        lon_cell_deg=0.75,
    )
    n = out.count()
    assert out.select("id_a", "id_b").distinct().count() == n


def test_nearest_neighbor_matches_bruteforce(spark):
    cust = _points(spark).limit(40)
    supp = load(spark, SF, "supplier")
    slat, slon = hash_point(
        F.col("s_suppkey"), 40.0, 50.0, -10.0, 10.0, tag="s"
    )
    supp_pts = supp.select("s_suppkey", slat.alias("lat"), slon.alias("lon"))
    got = {
        (r["c_custkey"], r["nearest_s_suppkey"], r["dist_km"])
        for r in nearest_neighbor_join(
            cust, supp_pts, "c_custkey", "s_suppkey"
        ).collect()
    }
    cl = {r["c_custkey"]: (r["lat"], r["lon"]) for r in cust.collect()}
    sl = {r["s_suppkey"]: (r["lat"], r["lon"]) for r in supp_pts.collect()}

    def hav(p, q):
        dphi = math.radians(q[0] - p[0])
        dl = math.radians(q[1] - p[1])
        a = (
            math.sin(dphi / 2) ** 2
            + math.cos(math.radians(p[0]))
            * math.cos(math.radians(q[0]))
            * math.sin(dl / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(a))

    for ck, p in cl.items():
        best = min(
            (round(hav(p, q), 6), sk) for sk, q in sl.items()
        )
        want = (ck, best[1], round(best[0], 3))
        assert want in got, (want, [g for g in got if g[0] == ck])
    assert len(got) == len(cl)


def test_bootstrap_ci_deterministic_and_calibrated(spark):
    from time_series_spark_spark.queries import REGISTRY

    fn = REGISTRY["events_bootstrap_ci"].fn
    a = {tuple(r) for r in fn(spark, SF).collect()}
    b = {tuple(r) for r in fn(spark, SF).collect()}
    assert a == b  # pure function of the data, no RNG
    for row in fn(spark, SF).collect():
        d = row.asDict()
        # the 95% bootstrap CI must bracket the observed mean, width > 0
        assert d["ci_lo"] < d["mean_obs"] < d["ci_hi"], d
        assert d["boot_se"] > 0


def test_bootstrap_poisson_weights_mean_near_one(spark):
    # mean of Poisson(1) weights over rows x replicates ≈ 1
    from time_series_spark_spark import queries_analytics as qa

    ev = (
        load(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(49))))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bs:"),
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("j").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.when(u < qa._POIS1_CDF[0], 0)
    for k, t in enumerate(qa._POIS1_CDF[1:], start=1):
        w = w.when(u < t, k)
    w = w.otherwise(9)
    stats = ev.select(w.alias("w")).agg(
        F.avg("w").alias("m"), F.var_samp("w").alias("v")
    ).first()
    assert abs(stats["m"] - 1.0) < 0.05  # Poisson(1): mean 1
    assert abs(stats["v"] - 1.0) < 0.10  # Poisson(1): var 1


def test_grid_radius_join_two_equals_bruteforce(spark):
    from time_series_spark_spark.operators.geo import grid_radius_join_two

    cust = _points(spark).limit(60).select(
        F.col("c_custkey").alias("cid"), "lat", "lon"
    )
    supp = load(spark, SF, "supplier")
    slat, slon = hash_point(
        F.col("s_suppkey"), 40.0, 50.0, -10.0, 10.0, tag="s"
    )
    sp = supp.select("s_suppkey", slat.alias("lat"), slon.alias("lon"))
    got = {
        (r["cid"], r["s_suppkey"], r["dist_km"])
        for r in grid_radius_join_two(
            cust, sp, "cid", "s_suppkey",
            radius_km=100.0, lat_cell_deg=1.0, lon_cell_deg=1.5,
        ).collect()
    }
    a = cust.select("cid", F.col("lat").alias("lat_a"), F.col("lon").alias("lon_a"))
    b = sp.select("s_suppkey", F.col("lat").alias("lat_b"), F.col("lon").alias("lon_b"))
    dist = F.round(
        haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")), 3
    )
    naive = {
        (r["cid"], r["s_suppkey"], r["dist_km"])
        for r in a.crossJoin(b)
        .select("cid", "s_suppkey", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= 100.0)
        .collect()
    }
    assert naive
    assert got == naive


def test_grid_radius_join_property_random_geometry(spark):
    """Hypothesis-style sweep without the fixture corpus: random boxes,
    radii, and cell sizes SATISFYING the cell contract must reproduce the
    brute-force pair set exactly."""
    import math as m
    import random

    rng = random.Random(11)
    for trial in range(3):
        lat0 = rng.uniform(-60, 50)
        lon0 = rng.uniform(-170, 150)
        box_lat, box_lon = 8.0, 12.0
        radius = rng.choice([20.0, 60.0, 120.0])
        worst_lat = max(abs(lat0), abs(lat0 + box_lat))
        lat_cell = radius / 111.195 * 1.05
        lon_cell = radius / (111.195 * m.cos(m.radians(worst_lat))) * 1.05
        n = 120
        pts = [
            (
                i,
                lat0 + rng.random() * box_lat,
                lon0 + rng.random() * box_lon,
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        got = {
            (r["id_a"], r["id_b"], r["dist_km"])
            for r in grid_radius_join(
                df, "id", radius_km=radius,
                lat_cell_deg=lat_cell, lon_cell_deg=lon_cell,
            ).collect()
        }
        a = df.select(
            F.col("id").alias("id_a"),
            F.col("lat").alias("lat_a"),
            F.col("lon").alias("lon_a"),
        )
        b = df.select(
            F.col("id").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
        )
        dist = F.round(
            haversine_km(
                F.col("lat_a"), F.col("lon_a"),
                F.col("lat_b"), F.col("lon_b"),
            ),
            3,
        )
        naive = {
            (r["id_a"], r["id_b"], r["dist_km"])
            for r in a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", dist.alias("dist_km"))
            .filter(F.col("dist_km") <= radius)
            .collect()
        }
        assert got == naive, (trial, lat0, lon0, radius)


def test_grid_dbscan_cluster_report_properties(spark):
    """Cluster report invariants at sf0.001: clusters are disjoint cell
    sets (sum of n_cells <= dense cells), every cluster's bbox is
    consistent, and the report is rerun-deterministic."""
    from time_series_spark_spark.queries import REGISTRY

    fn = REGISTRY["geo_grid_dbscan_clusters"].fn
    sf = "/root/testdata/sf0.001"
    rows = fn(spark, sf).collect()
    assert rows, "no clusters found at sf0.001"
    for r in rows:
        assert r["n_cells"] >= 1 and r["n_points"] >= r["n_cells"]
        assert r["ci_min"] <= r["ci_max"] and r["cj_min"] <= r["cj_max"]
        # bbox is at most the cluster's cell count in each direction
        assert (r["ci_max"] - r["ci_min"] + 1) * (
            r["cj_max"] - r["cj_min"] + 1
        ) >= r["n_cells"]
    again = fn(spark, sf).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
