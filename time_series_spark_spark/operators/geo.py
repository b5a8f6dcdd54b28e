"""Geospatial operators: haversine distance, hash-derived deterministic
coordinates, grid-bucketed radius self-join, and broadcast nearest-neighbor
join.

The synthetic star schema carries no coordinates, so points are DERIVED
deterministically from entity keys via the repo's standard md5-uniform
construction (SURVEY.md §5.1 determinism rules): ``u = int(md5(tag:key)[:8],
16) / 2**32`` is bit-identical in Spark and DuckDB (the division by a power
of two and the affine map into the bounding box are exact / identically
rounded IEEE doubles), so both engines see the SAME geometry and the
DuckDB oracle can verify the distributed join exactly.

Scale design (100 TB): the naive radius self-join is O(n²). The shipped
shape is the standard spatial-grid bucketing — each point lands in a
``(⌊lat/Δlat⌋, ⌊lon/Δlon⌋)`` cell with Δ chosen ≥ the search radius, the
probe side explodes to its 3×3 cell neighborhood (a bounded ×9 fan-out of
a key+coords projection, done AFTER column pruning), and one hash-shuffle
equi-join on the cell id generates candidates bounded by points-per-cell
— the same candidate-bounding discipline as the LSH/IVF paths in
operators/llm.py. Pair distance is verified with the exact haversine
formula, entirely in built-in JVM expressions (no Python in the hot path).

Nearest-neighbor against a DIMENSION table (suppliers, stores, cells) is
the broadcast argmin: cross-join the broadcast dim, partial-min aggregate
``min(struct(dist, id))`` per probe row — map-side combine means the
shuffle carries one row per probe key, which IS the scale-correct plan
when the right side is a dim (for point-vs-point NN at corpus scale, use
:func:`grid_radius_join` with an expanding-radius retry instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
KM_PER_DEG_LAT = 111.1950793  # 2*pi*R/360 at the IUGG radius


def hash_uniform(tag: str, key: Column) -> Column:
    """Deterministic uniform in [0, 1): ``int(md5(tag:key)[:8], 16) / 2**32``.

    Bit-identical to the DuckDB expression
    ``('0x' || substring(md5('tag:' || CAST(k AS VARCHAR)), 1, 8))::BIGINT
    / 4294967296.0`` — the integer is < 2^32 so the power-of-two division
    is exact in both engines.
    """
    h = F.md5(F.concat(F.lit(tag + ":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(
        4294967296.0
    )


def hash_point(
    key: Column,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    tag: str = "",
) -> tuple[Column, Column]:
    """(lat, lon) derived from ``key``, uniform over the bounding box.
    ``tag`` namespaces the hash so entity families with overlapping keys
    (custkey vs suppkey) don't land on coincident points."""
    lat = lat_min + (lat_max - lat_min) * hash_uniform(tag + "lat", key)
    lon = lon_min + (lon_max - lon_min) * hash_uniform(tag + "lon", key)
    return lat, lon


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine, IUGG mean radius) — pure
    built-in trig, whole-stage-codegen friendly."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.pow(F.sin(dlmb / 2), 2)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cells(
    lat: Column, lon: Column, lat_cell_deg: float, lon_cell_deg: float
) -> tuple[Column, Column]:
    """Integer grid-cell ids for a point."""
    return (
        F.floor(lat / lat_cell_deg).cast("int"),
        F.floor(lon / lon_cell_deg).cast("int"),
    )


def grid_radius_join(
    pts: DataFrame,
    id_col: str,
    radius_km: float,
    lat_cell_deg: float,
    lon_cell_deg: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    round_dp: int = 3,
) -> DataFrame:
    """All pairs (a, b) with ``id_a < id_b`` and haversine distance ≤
    ``radius_km``, via spatial-grid candidate bucketing.

    Contract: ``lat_cell_deg ≥ radius/111.195`` and ``lon_cell_deg ≥
    radius/(111.195·cos(max|lat|))`` over the data's latitude range, so
    any qualifying pair differs by ≤ 1 cell per axis. Replication is
    SPLIT BY AXIS (guide §2.3 — shuffle fewer bytes): the probe side
    fans to its 3 lat-neighbor cells at its home lon, the build side to
    its 3 lon-neighbor cells at its home lat, and the join on the cell
    key matches a qualifying pair at exactly one (di, dj) — ``di =
    ci_b − ci_a`` and ``dj = cj_a − cj_b``, both in {−1, 0, 1} — so
    each pair is still found exactly once (``id_a < id_b`` fixes the
    orientation) while 3N+3N rows shuffle instead of the one-sided
    3×3 neighborhood's 9N+N.

    The distance filter compares the ROUNDED distance (``round_dp``) so
    the inclusion boundary is identical across engines despite libm ulp
    drift in trig (SURVEY.md §5.1).

    Output: ``id_a, id_b, dist_km`` (rounded).
    """
    ci, cj = grid_cells(
        F.col(lat_col), F.col(lon_col), lat_cell_deg, lon_cell_deg
    )
    base = pts.select(
        F.col(id_col), F.col(lat_col), F.col(lon_col),
        ci.alias("ci"), cj.alias("cj"),
    )
    lat_neighbors = F.array(
        *[
            F.struct(
                (F.col("ci") + di).alias("ci"), F.col("cj").alias("cj")
            )
            for di in (-1, 0, 1)
        ]
    )
    lon_neighbors = F.array(
        *[
            F.struct(
                F.col("ci").alias("ci"), (F.col("cj") + dj).alias("cj")
            )
            for dj in (-1, 0, 1)
        ]
    )
    probe = base.select(
        F.col(id_col).alias("id_a"),
        F.col(lat_col).alias("lat_a"),
        F.col(lon_col).alias("lon_a"),
        F.explode(lat_neighbors).alias("cell"),
    ).select("id_a", "lat_a", "lon_a", "cell.ci", "cell.cj")
    build = base.select(
        F.col(id_col).alias("id_b"),
        F.col(lat_col).alias("lat_b"),
        F.col(lon_col).alias("lon_b"),
        F.explode(lon_neighbors).alias("cell"),
    ).select("id_b", "lat_b", "lon_b", "cell.ci", "cell.cj")
    dist = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ),
        round_dp,
    )
    return (
        probe.join(build, on=["ci", "cj"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= radius_km)
    )


def nearest_neighbor_join(
    probes: DataFrame,
    dims: DataFrame,
    probe_id: str,
    dim_id: str,
    round_dp: int = 6,
    out_dp: int = 3,
) -> DataFrame:
    """For each probe point, the nearest dim point (broadcast argmin).

    Both inputs need ``lat``/``lon`` columns. Ties on the ``round_dp``-
    rounded distance break by smallest ``dim_id`` — the struct-min
    ordering ``(dist, id)`` matches a ``row_number() OVER (ORDER BY
    dist, id) = 1`` oracle exactly. Output: ``probe_id, nearest_<dim_id>,
    dist_km`` (rounded to ``out_dp``).
    """
    d = dims.select(
        F.col(dim_id),
        F.col("lat").alias("_dlat"),
        F.col("lon").alias("_dlon"),
    )
    dist = F.round(
        haversine_km(F.col("lat"), F.col("lon"), F.col("_dlat"), F.col("_dlon")),
        round_dp,
    )
    best = (
        probes.select(probe_id, "lat", "lon")
        .crossJoin(F.broadcast(d))
        .groupBy(probe_id)
        .agg(
            F.min(F.struct(dist.alias("d"), F.col(dim_id).alias("id"))).alias(
                "best"
            )
        )
    )
    return best.select(
        probe_id,
        F.col("best.id").alias(f"nearest_{dim_id}"),
        F.round(F.col("best.d"), out_dp).alias("dist_km"),
    )


def grid_radius_join_two(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    radius_km: float,
    lat_cell_deg: float,
    lon_cell_deg: float,
    round_dp: int = 3,
) -> DataFrame:
    """Two-table radius join: all (left, right) pairs within ``radius_km``.
    Same cell contract and axis-split bucketing as
    :func:`grid_radius_join` — the left side fans to its 3 lat-neighbor
    cells, the right side to its 3 lon-neighbor cells, and a qualifying
    pair meets at exactly one (di, dj), so each is found exactly once
    (no ordering constraint — the id spaces are distinct) while 3N+3M
    rows shuffle instead of 9N+M. Both inputs need ``lat``/``lon``
    columns. Output: ``<left_id>, <right_id>, dist_km`` (rounded)."""
    lci, lcj = grid_cells(F.col("lat"), F.col("lon"), lat_cell_deg, lon_cell_deg)
    lbase = left.select(
        F.col(left_id), F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"), lci.alias("ci"), lcj.alias("cj"),
    )
    lat_neighbors = F.array(
        *[
            F.struct(
                (F.col("ci") + di).alias("ci"), F.col("cj").alias("cj")
            )
            for di in (-1, 0, 1)
        ]
    )
    lon_neighbors = F.array(
        *[
            F.struct(
                F.col("ci").alias("ci"), (F.col("cj") + dj).alias("cj")
            )
            for dj in (-1, 0, 1)
        ]
    )
    probe = lbase.select(
        left_id, "lat_a", "lon_a", F.explode(lat_neighbors).alias("cell")
    ).select(left_id, "lat_a", "lon_a", "cell.ci", "cell.cj")
    rci, rcj = grid_cells(F.col("lat"), F.col("lon"), lat_cell_deg, lon_cell_deg)
    rbase = right.select(
        F.col(right_id), F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"), rci.alias("ci"), rcj.alias("cj"),
    )
    build = rbase.select(
        right_id, "lat_b", "lon_b", F.explode(lon_neighbors).alias("cell")
    ).select(right_id, "lat_b", "lon_b", "cell.ci", "cell.cj")
    dist = F.round(
        haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        ),
        round_dp,
    )
    return (
        probe.join(build, on=["ci", "cj"])
        .select(left_id, right_id, dist.alias("dist_km"))
        .filter(F.col("dist_km") <= radius_km)
    )
