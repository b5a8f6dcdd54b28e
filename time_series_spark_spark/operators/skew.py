"""Skew mitigation (SURVEY.md §7.3.5 — the 100 TB design discipline).

Order of preference when a join key is skewed:

1. **Broadcast** the small side (`F.broadcast`) — no shuffle of the big
   side at all; used throughout `queries_relational.py` for dims.
2. **AQE skew-join** (`spark.sql.adaptive.skewJoin.enabled`, on by default
   in the engine session) — splits oversized post-shuffle partitions at
   runtime. This is the default answer for moderately skewed sort-merge /
   shuffled-hash joins.
3. **Manual salting** (this module) — for *degenerate* keys (one key =
   double-digit percent of a 100 TB fact table) where even a split
   partition is one task's worth of a single key, or where the engine runs
   with AQE off. Salting trades an ``n_salts``-fold replication of the
   small side for an even spread of the hot key.

Aggregation skew needs none of this: Spark's partial (map-side) aggregation
already collapses hot groups before the shuffle — see
``tests/test_plans.py::test_forecast_two_stage_shuffle_shape``. Grouped-map
UDF skew (one giant series in F7) is prevented upstream by aggregating to a
bounded grid (days) before the regroup, so no group exceeds
horizon-resolution size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed ``left`` against a (much smaller) ``right``.

    The hot left keys spread uniformly over ``n_salts`` sub-keys; the right
    side is replicated once per salt so every sub-key still finds its
    match. Result is row-identical to ``left.join(right, on, how)``.

    Scale note: replication multiplies the right side's shuffle volume by
    ``n_salts`` — only worth it when the left's skew dominates; pick
    ``n_salts`` ≈ (hot-key rows) / (target partition rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_left = left.withColumn(
        "_salt", (F.rand(seed=0) * n_salts).cast("int")
    )
    salted_right = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return (
        salted_left.join(salted_right, [on, "_salt"], how)
        .drop("_salt")
    )
