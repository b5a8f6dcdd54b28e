"""Scale-safe exact global order statistics: rank, ntile, cumulative
sums/maxes over a TOTAL order — without a single-task window.

An unpartitioned ``Window.orderBy(...)`` is executed by Spark as ONE
task holding every row (WindowExec warns exactly this), so any query
built on it is correct at sf0.1 and dead at 100 TB. The survey's §4.3
playbook ("reduce first, window over the bounded frame") covers most
sites; the residue — exact global rank/ECDF/ntile over row-scale input
— needs the classic two-pass construction this module provides:

1. Assign each row a bucket id that is a DETERMINISTIC, monotone
   function of its sort key: quantile boundaries of the leading key
   column are computed once (``percentile_approx``, a bounded
   n_partitions-sized artifact collected to the driver — the BPE-merge-
   list precedent) and frozen as literals; ``bucket = #boundaries
   below the row's key`` via a codegen higher-order filter over the
   literal array. Buckets ascend with the global order, every bucket
   works in parallel.
2. Per-bucket window (partitionBy the bucket id): local row_number /
   cumulative aggregate — one hash shuffle, no global sort.
3. Per-bucket summaries (one row per bucket, ≤ a few thousand rows at
   any scale) prefix-combined with a window over the BOUNDED summary
   frame.
4. Broadcast the per-bucket offsets back and add: global stat =
   bucket offset ⊕ local stat.

Why value-derived buckets instead of ``repartitionByRange`` +
``spark_partition_id()``: the construction reads the bucketed frame
from TWO plan branches (local stats, offsets). Range-exchange
boundaries come from runtime reservoir sampling seeded per RDD
instantiation, so whenever the optimizer fails to reuse the exchange
between the branches the two evaluations disagree on which partition a
row belongs to — offsets for one partitioning added to local ranks of
another, silently wrong and nondeterministic (observed at sf0.1 under
AQE). A frozen-literal bucket function cannot disagree with itself:
both branches compute identical ids row-by-row, whatever the physical
plan does. Skew bound: all ties of one leading-key value share a
bucket — callers order by near-unique leading keys or accept the tie
mass as the irreducible skew a range sort would have too.

Exactness: with a total order (caller supplies a unique tiebreaker, or
pre-reduces to distinct keys) and monotone bucketing, no key ordering
crosses bucket boundaries — offset + local rank is THE global rank,
bit-identical to the single-task window it replaces, which is what
lets the rewritten queries keep their existing DuckDB oracles
unchanged.

Integer validity: rank/offset arithmetic stays in BIGINT; the floor-
division helper is exact for magnitudes < 2^53 (division of two exact
longs through a double) — i.e. up to ~9e15 rows, documented per the
BIGINT-bounds policy in queries_quant.py.

Cost model: the bucket-id expression is O(#buckets) comparisons per
row (a codegen higher-order filter over the literal boundary array).
With #buckets = spark.sql.shuffle.partitions (default here) that is
dozens-to-thousands of long-compares per row — noise next to the hash
shuffle the construction replaces a global sort with. If a deployment
pushes shuffle partitions into the tens of thousands, pass an explicit
smaller ``num_partitions`` (bucket count only bounds per-task memory,
it does not need to match the shuffle width).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__range_pid"

# (column name, ascending) — the ordering vocabulary of every helper
# below. Plain column names only (pre-select expressions first); the
# leading key must be numeric (quantile boundaries are computed on it).
Key = tuple[str, bool]


def _floor_div(a: Column, b: Column | int) -> Column:
    """Exact floor division for non-negative BIGINT columns.

    ``(a - a % b) / b`` routes through double, so exactness requires the
    DIVIDEND ``a - a % b`` < 2^53 (~9e15) — not merely the quotient: a
    larger dividend already rounds in the long→double conversion and can
    land the quotient in the wrong bucket even when the quotient itself
    is tiny. Every current caller passes ``a`` bounded by a row count or
    an ntile index (≤ n), far inside the bound; callers with larger
    operands must pre-check or use SQL's exact integer ``div``."""
    b = F.lit(b) if isinstance(b, int) else b
    return ((a - (a % b)) / b).cast("long")


def _sort_cols(keys: Sequence[Key]) -> list[Column]:
    return [F.asc(c) if asc else F.desc(c) for c, asc in keys]


def _bucketed(
    df: DataFrame,
    keys: Sequence[Key],
    num_partitions: int | None,
) -> DataFrame:
    """Attach the deterministic monotone bucket id ``_PID`` (see module
    doc). One bounded ``percentile_approx`` collect freezes the
    boundaries; the id itself is a whole-stage-codegen expression.

    The leading key may be any numeric type, or TIMESTAMP/DATE — the
    temporal types are bucketed through their order-preserving integer
    encodings (``unix_micros`` / days-since-epoch), so time-ordered
    constructions (arrival-order running max, event-time rank) need no
    surrogate numeric column."""
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    raw, asc = keys[0]
    dtype = dict(df.dtypes).get(raw, "")
    if dtype.startswith("timestamp"):
        key_expr = F.unix_micros(F.col(raw).cast("timestamp"))
    elif dtype == "date":
        key_expr = F.datediff(F.col(raw), F.lit("1970-01-01").cast("date"))
    else:
        key_expr = F.col(raw)
    col = "__bucket_key"
    df = df.withColumn(col, key_expr)
    bounds: list = []
    if n_part > 1:
        qs = [i / n_part for i in range(1, n_part)]
        row = df.agg(
            F.percentile_approx(col, qs, 10000).alias("__b")
        ).first()
        bounds = [
            b for b in ((row["__b"] if row else None) or []) if b is not None
        ]
    if not bounds:
        pid = F.lit(0)
    elif asc:
        # bucket = #boundaries strictly below the key; ties at a
        # boundary stay together in the earlier bucket. NULLS FIRST
        # (Spark's ascending default) → bucket 0.
        arr = F.lit(bounds)
        pid = F.when(F.col(col).isNull(), F.lit(0)).otherwise(
            F.size(F.filter(arr, lambda b: F.col(col) > b))
        )
    else:
        # descending: bucket = #boundaries strictly above the key
        # (boundaries reversed so bucket ids ascend with the DESC
        # order). NULLS LAST (Spark's descending default) → last bucket.
        arr = F.lit(list(reversed(bounds)))
        pid = F.when(F.col(col).isNull(), F.lit(len(bounds))).otherwise(
            F.size(F.filter(arr, lambda b: F.col(col) < b))
        )
    return df.withColumn(_PID, pid.cast("int")).drop(col)


def global_rank(
    df: DataFrame,
    order_by: Sequence[Key],
    rank_col: str = "rnk",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over ``order_by`` (which MUST be a
    total order — include a unique tiebreaker), plus optionally the
    global row count attached to every row (``total_col``), computed
    from the same per-bucket summaries (no extra single-task
    ``count() over ()`` window).

    Scale shape: one boundary collect + one hash shuffle on the bucket
    id + per-bucket row_number, offsets from a ≤#buckets-row prefix
    sum, one broadcast join. Replaces
    ``row_number().over(Window.orderBy(...))`` bit-for-bit.
    """
    parted = _bucketed(df, order_by, num_partitions)
    local = parted.withColumn(
        "__lrn",
        F.row_number().over(
            Window.partitionBy(_PID).orderBy(*_sort_cols(order_by))
        ),
    )
    counts = local.groupBy(_PID).agg(F.count(F.lit(1)).alias("__cnt"))
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _PID,
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__off"),
        F.sum("__cnt")
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__tot"),
    )
    out = local.join(F.broadcast(offsets), _PID).withColumn(
        rank_col, (F.col("__off") + F.col("__lrn")).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__tot").cast("long"))
    return out.drop(_PID, "__lrn", "__off", "__tot")


def grouped_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Key],
    rank_col: str = "rnk",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group exact 1-based row_number over ``order_by`` within each
    group, plus optionally the group's row count on every row — the
    scale-safe form of
    ``row_number().over(Window.partitionBy(*groups).orderBy(...))``
    for LOW-CARDINALITY group keys (event types, calendar halves, A/B
    arms), where the plain partitioned window still funnels a
    corpus-scale slice through ONE task per group value.

    Buckets come from the same frozen global leading-key boundaries as
    :func:`global_rank` (shared across groups — determinism is what
    matters; balance only needs the value distributions to be broadly
    similar across groups, which A/B-style splits are by design). The
    local window partitions by (groups..., bucket); the offset frame is
    bounded at |groups| x #buckets rows.
    """
    parted = _bucketed(df, order_by, num_partitions)
    gcols = list(group_cols)
    local = parted.withColumn(
        "__lrn",
        F.row_number().over(
            Window.partitionBy(*gcols, _PID).orderBy(*_sort_cols(order_by))
        ),
    )
    counts = local.groupBy(*gcols, _PID).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_prev = (
        Window.partitionBy(*gcols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_grp = Window.partitionBy(*gcols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        *gcols,
        _PID,
        F.coalesce(F.sum("__cnt").over(w_prev), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(w_grp).alias("__tot"),
    )
    out = local.join(F.broadcast(offsets), [*gcols, _PID]).withColumn(
        rank_col, (F.col("__off") + F.col("__lrn")).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__tot").cast("long"))
    return out.drop(_PID, "__lrn", "__off", "__tot")


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[Key],
    cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running sums of ``cols`` over the global
    ``order_by`` order, each replacing
    ``sum(c).over(Window.orderBy(...))``.

    For RANGE-frame semantics over tied keys (an ECDF), pre-reduce to
    one row per distinct key first — then ROWS ≡ RANGE and ties cannot
    straddle a bucket boundary. Sums are computed in each column's
    own type (longs stay exact longs).

    NULL semantics match the window exactly (sum ignores NULLs but the
    running total only becomes non-NULL once SOME prior value was
    non-NULL): a row whose in-bucket prefix is all-NULL takes the prior
    buckets' offset when any earlier bucket contributed a non-NULL
    value, and stays NULL when none did — tracked via per-bucket
    non-null counts, so the "replaces sum().over(orderBy)" contract
    holds bit-for-bit on NULL-bearing columns too.
    """
    parted = _bucketed(df, order_by, num_partitions)
    w_loc = (
        Window.partitionBy(_PID)
        .orderBy(*_sort_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted
    for c in cols:
        local = local.withColumn(f"__loc_{c}", F.sum(c).over(w_loc))
    totals = local.groupBy(_PID).agg(
        *[F.sum(c).alias(f"__sum_{c}") for c in cols],
        *[F.count(c).alias(f"__nn_{c}") for c in cols],
    )
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[
            F.coalesce(F.sum(f"__sum_{c}").over(w_prev), F.lit(0)).alias(
                f"__off_{c}"
            )
            for c in cols
        ],
        *[
            F.coalesce(F.sum(f"__nn_{c}").over(w_prev), F.lit(0)).alias(
                f"__nnp_{c}"
            )
            for c in cols
        ],
    )
    out = local.join(F.broadcast(offsets), _PID)
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(f"__loc_{c}").isNull(),
                F.when(F.col(f"__nnp_{c}") > 0, F.col(f"__off_{c}")),
            ).otherwise(F.col(f"__off_{c}") + F.col(f"__loc_{c}")),
        ).drop(f"__loc_{c}", f"__off_{c}", f"__nnp_{c}")
    return out.drop(_PID)


def grouped_cumsum(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Key],
    cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group exact inclusive running sums of ``cols`` over
    ``order_by`` within each group — the scale-safe form of
    ``sum(c).over(Window.partitionBy(*groups).orderBy(...))`` for
    low-cardinality group keys (see :func:`grouped_rank` for why the
    plain partitioned window is 2-5 corpus-scale tasks). Buckets share
    the global frozen leading-key boundaries; the offset frame is
    bounded at |groups| x #buckets rows."""
    parted = _bucketed(df, order_by, num_partitions)
    gcols = list(group_cols)
    w_loc = (
        Window.partitionBy(*gcols, _PID)
        .orderBy(*_sort_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted
    for c in cols:
        local = local.withColumn(f"__loc_{c}", F.sum(c).over(w_loc))
    totals = local.groupBy(*gcols, _PID).agg(
        *[F.sum(c).alias(f"__sum_{c}") for c in cols],
        *[F.count(c).alias(f"__nn_{c}") for c in cols],
    )
    w_prev = (
        Window.partitionBy(*gcols)
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *gcols,
        _PID,
        *[
            F.coalesce(F.sum(f"__sum_{c}").over(w_prev), F.lit(0)).alias(
                f"__off_{c}"
            )
            for c in cols
        ],
        *[
            F.coalesce(F.sum(f"__nn_{c}").over(w_prev), F.lit(0)).alias(
                f"__nnp_{c}"
            )
            for c in cols
        ],
    )
    out = local.join(F.broadcast(offsets), [*gcols, _PID])
    for c in cols:
        # same NULL contract as global_cumsum: all-NULL in-group prefix
        # → carry the prior buckets' offset only if they contributed
        out = out.withColumn(
            c,
            F.when(
                F.col(f"__loc_{c}").isNull(),
                F.when(F.col(f"__nnp_{c}") > 0, F.col(f"__off_{c}")),
            ).otherwise(F.col(f"__off_{c}") + F.col(f"__loc_{c}")),
        ).drop(f"__loc_{c}", f"__off_{c}", f"__nnp_{c}")
    return out.drop(_PID)


def global_cummax(
    df: DataFrame,
    order_by: Sequence[Key],
    cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running max of ``cols`` over the global order —
    the scale-safe form of ``max(c).over(Window.orderBy(...))`` (e.g.
    a watermark-lateness running high-water mark over arrival order)."""
    parted = _bucketed(df, order_by, num_partitions)
    w_loc = (
        Window.partitionBy(_PID)
        .orderBy(*_sort_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted
    for c in cols:
        local = local.withColumn(f"__loc_{c}", F.max(c).over(w_loc))
    totals = local.groupBy(_PID).agg(
        *[F.max(c).alias(f"__max_{c}") for c in cols]
    )
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *[F.max(f"__max_{c}").over(w_prev).alias(f"__off_{c}") for c in cols],
    )
    out = local.join(F.broadcast(offsets), _PID)
    for c in cols:
        out = out.withColumn(
            c,
            F.when(
                F.col(f"__off_{c}").isNull()
                | (F.col(f"__loc_{c}") >= F.col(f"__off_{c}")),
                F.col(f"__loc_{c}"),
            ).otherwise(F.col(f"__off_{c}")),
        ).drop(f"__loc_{c}", f"__off_{c}")
    return out.drop(_PID)


def global_lag_gaps(
    df: DataFrame,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Consecutive-pair gaps ``(prev_id, id)`` with ``id - prev_id > 1``
    over the globally sorted unique BIGINT ``id_col`` — the scale-safe
    form of ``lag(id).over(Window.orderBy(id))``.

    Within-bucket pairs come from a bucket-partitioned lag; the one
    missing pair per bucket boundary is recovered from the bounded
    per-bucket (min, max) summary frame. Returns columns
    ``(prev_id, id_col)`` for gap rows only.
    """
    parted = _bucketed(df.select(id_col), [(id_col, True)], num_partitions)
    w_loc = Window.partitionBy(_PID).orderBy(id_col)
    inner = (
        parted.withColumn("prev_id", F.lag(id_col).over(w_loc))
        .filter(
            F.col("prev_id").isNotNull()
            & (F.col(id_col) - F.col("prev_id") > 1)
        )
        .select("prev_id", id_col)
    )
    bounds = parted.groupBy(_PID).agg(
        F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx")
    )
    w_b = Window.orderBy(_PID)
    boundary = (
        bounds.withColumn("prev_id", F.lag("__mx").over(w_b))
        .filter(
            F.col("prev_id").isNotNull()
            & (F.col("__mn") - F.col("prev_id") > 1)
        )
        .select("prev_id", F.col("__mn").alias(id_col))
    )
    return inner.unionByName(boundary)


def ntile_expr(rank: Column, n: Column, k: int) -> Column:
    """Exact SQL ``ntile(k)`` from a precomputed global rank and total
    count: the first ``n % k`` buckets take ``n div k + 1`` rows, the
    rest ``n div k`` — the ANSI remainder-to-the-front rule both Spark
    and DuckDB implement, so substituting this for a single-task
    ``ntile().over(Window.orderBy(...))`` changes no result."""
    q = _floor_div(n, k)
    r = n % k
    big = q + 1
    thr = big * r
    # n < k ⇒ q = 0 and thr = n, so every rank lands in the first branch
    # and the q-divisor branch is never selected (Spark's non-ANSI x % 0
    # yields NULL, not an error, so the unselected branch is inert).
    return (
        F.when(rank <= thr, _floor_div(rank - 1, big) + 1)
        .otherwise(r + _floor_div(rank - thr - 1, q) + 1)
        .cast("int")
    )
