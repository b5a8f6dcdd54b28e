"""Change-data-capture operators: snapshot diff and changelog merge.

Warehouse pipelines re-land full snapshots of upstream tables; the two
primitives every incremental system needs are:

- ``snapshot_diff``: given yesterday's and today's snapshot, emit the
  changelog (insert / delete / update rows) — ONE full-outer equi-join on
  the business key, classification in pure column expressions.
- ``apply_changes``: given a base snapshot and a changelog, produce the
  next snapshot (MERGE semantics: delete drops, update overwrites, insert
  adds) — one outer join + coalesce, no iterative logic.

Scale shape: both are single co-partitioned shuffles on the business key.
If base and changelog are bucketed on the key (sources/io.py A4's bucketed
writer), the join is exchange-free; AQE handles skewed hot keys. The diff
never materializes "unchanged" rows (the overwhelming majority at 100 TB)
— they are filtered before the changelog leaves the join stage.

Reference parity: /root/reference is empty (SURVEY.md §0); the spec is the
standard MERGE / CDC semantics of warehouse engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OPS = ("insert", "delete", "update")


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare: list[str]
) -> DataFrame:
    """Changelog between two snapshots keyed by ``keys``.

    Output: keys + op ∈ {insert, delete, update} + ``old_<c>`` /
    ``new_<c>`` for every compared column. Unchanged rows never leave the
    join stage. NULL-safe comparison (`<=>`) so NULL→value and value→NULL
    transitions classify as updates, not misses.
    """
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    cond = [F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}")) for k in keys]
    joined = o.join(n, on=cond, how="full_outer")
    in_old = F.col(f"_ok_{keys[0]}").isNotNull()
    in_new = F.col(f"_nk_{keys[0]}").isNotNull()
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(in_old & ~in_new, F.lit("delete"))
        .when(~in_old & in_new, F.lit("insert"))
        .when(~same, F.lit("update"))
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
                for k in keys
            ],
            "op",
            *[F.col(f"old_{c}") for c in compare],
            *[F.col(f"new_{c}") for c in compare],
        )
    )


def apply_changes(
    base: DataFrame, changes: DataFrame, keys: list[str], cols: list[str]
) -> DataFrame:
    """Next snapshot = MERGE(base, changelog): deletes drop the key,
    updates/inserts take the changelog's ``new_<c>`` values, untouched base
    rows pass through. One left join on the key."""
    ch = changes.select(
        *keys, "op", *[F.col(f"new_{c}").alias(f"_ch_{c}") for c in cols]
    )
    joined = base.select(*keys, *cols).join(ch, on=keys, how="full_outer")
    touched = F.col("op").isNotNull()
    kept = joined.filter(
        ~touched | F.col("op").isin("insert", "update")
    )
    return kept.select(
        *keys,
        *[
            F.when(touched, F.col(f"_ch_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in cols
        ],
    )
