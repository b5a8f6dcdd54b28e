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
from pyspark.sql.window import Window

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


def scd2_intervals(
    df: DataFrame,
    keys: list[str],
    ts: str,
    attrs: list[str],
    tiebreak: str,
) -> DataFrame:
    """M3: build a slowly-changing-dimension type-2 history from an
    event log — one validity interval per (key, attribute-state) run:
    ``valid_from`` = first event of the run, ``valid_to`` = start of the
    next run (NULL while current), ``is_current`` on the last run.

    Kimball SCD2 semantics derived with the gaps-and-islands pattern:
    a change flag (lag over the NULL-safe attr comparison) → running-sum
    run id → one hash agg per run → lead() for the interval close. All
    four steps share the hash(keys) partitioning — one exchange
    end-to-end, no self-joins, no per-key iteration.
    """
    w = Window.partitionBy(*keys).orderBy(ts, tiebreak)
    same_as_prev = F.lit(True)
    for a in attrs:
        same_as_prev = same_as_prev & F.col(a).eqNullSafe(F.lag(a).over(w))
    runs = (
        df.select(*keys, ts, tiebreak, *attrs)
        .withColumn(
            "__chg",
            # boundary detected via lag(ts), not lag(attr): a NULL attr
            # on the key's first row must still open a run
            F.when(
                F.lag(ts).over(w).isNotNull() & same_as_prev, 0
            ).otherwise(1),
        )
        .withColumn(
            "__run",
            F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per_run = runs.groupBy(*keys, "__run").agg(
        *[F.first(a).alias(a) for a in attrs],
        F.min(ts).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_run = Window.partitionBy(*keys).orderBy("valid_from")
    return per_run.select(
        *keys,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w_run).alias("valid_to"),
        F.lead("valid_from").over(w_run).isNull().alias("is_current"),
        "n_events",
    )


def pit_join(
    facts: DataFrame,
    dim_intervals: DataFrame,
    key: str,
    fact_ts: str,
    how: str = "left",
) -> DataFrame:
    """M4: point-in-time join — attach to each fact row the SCD2
    interval (from :func:`scd2_intervals`) that was in effect at
    ``fact_ts``: ``valid_from <= fact_ts < valid_to`` (open interval =
    still current). The lookup that makes a type-2 dimension usable —
    joining on the key alone would fan out to every historical version.

    Plan shape: hash equi-join on ``key`` with the interval containment
    as a residual filter — correct because versions-per-key is small by
    construction (one row per CHANGE, not per event); never a range
    explosion over the fact table.

    Dimension columns (other than ``key``/``valid_from``/``valid_to``)
    that collide with a fact column name are suffixed ``_dim`` (the same
    disambiguation rule as ``asof_join``'s suffix parameter) so the
    output never carries duplicate column names.
    """
    fact_cols = set(facts.columns)
    renames = {
        c: f"{c}_dim"
        for c in dim_intervals.columns
        if c != key and c in fact_cols and c not in (fact_ts,)
    }
    d = dim_intervals.select(
        F.col(key).alias("__k"),
        *[
            F.col(c).alias(renames.get(c, c))
            for c in dim_intervals.columns
            if c != key
        ],
    )
    vf, vt = renames.get("valid_from", "valid_from"), renames.get(
        "valid_to", "valid_to"
    )
    cond = (
        (facts[key] == d["__k"])
        & (facts[fact_ts] >= d[vf])
        & (d[vt].isNull() | (facts[fact_ts] < d[vt]))
    )
    return facts.join(d, cond, how).drop("__k")


# --------------------------------------------------------------------------
# M5: incremental join maintenance (round 4)
# --------------------------------------------------------------------------
def incremental_join_delta(
    l_old: DataFrame,
    l_delta: DataFrame,
    r_old: DataFrame,
    r_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Delta rule for inner-join view maintenance (classic incremental
    view maintenance algebra; Blakeley/Larson/Tompa SIGMOD'86):

        Δ(L ⋈ R) = (ΔL ⋈ R_old) ∪ (L_old ⋈ ΔR) ∪ (ΔL ⋈ ΔR)

    so ``J_new = J_old ∪ Δ`` without re-joining the two base tables.
    At 100 TB this is the whole point of maintaining a join view: the
    three delta joins touch |Δ|-proportional state on one side each
    (ΔL / ΔR are the small batch sides — broadcast them), while the
    naive recompute re-shuffles both full tables. Bag semantics:
    duplicates union with `unionByName`, matching the inner join's
    multiset output.
    """
    d1 = l_delta.join(r_old, on)
    d2 = l_old.join(r_delta, on)
    d3 = l_delta.join(r_delta, on)
    cols = d1.columns
    return d1.unionByName(d2.select(cols)).unionByName(d3.select(cols))


def incremental_agg_merge(
    agg_old: DataFrame,
    agg_delta: DataFrame,
    keys: list[str],
    add_cols: list[str],
) -> DataFrame:
    """Delta rule for SUM/COUNT-shaped aggregate views — the aggregation
    sibling of ``incremental_join_delta`` (same IVM algebra family):

        V_new(k) = V_old(k) ⊎ Δagg(k)      (pointwise addition per key)

    ``add_cols`` are additive accumulators (counts, sums, integer-cents
    totals; also works for min/max ONLY under insert-only deltas — a
    deletion would need the full group, which is exactly why real IVM
    systems keep additive accumulators). Full outer join on the group
    keys, missing side contributes the additive identity 0.

    At 100 TB: the view is |distinct keys| sized, the delta aggregate
    touches only the new partition's rows, and the merge join moves
    view-sized — never fact-sized — data. Partition/bucket both sides
    by the view key and the merge is shuffle-free.
    """
    d = agg_delta.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in add_cols]
    )
    merged = agg_old.join(d, on=keys, how="full_outer")
    out_cols = [
        (
            F.coalesce(F.col(c), F.lit(0))
            + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
        ).alias(c)
        for c in add_cols
    ]
    return merged.select(*keys, *out_cols)
