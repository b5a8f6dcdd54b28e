"""Scale-safe exact global order statistics: rank, ntile, cumulative
sums/maxes over a TOTAL order — without a single-task window.

An unpartitioned ``Window.orderBy(...)`` is executed by Spark as ONE
task holding every row (WindowExec warns exactly this), so any query
built on it is correct at sf0.1 and dead at 100 TB. The survey's §4.3
playbook ("reduce first, window over the bounded frame") covers most
sites; the residue — exact global rank/ECDF/ntile over row-scale input
— needs the classic two-pass range-partitioned construction this module
provides:

1. ``repartitionByRange`` on the sort key: partition i holds a
   contiguous key range, ranges ascend with ``spark_partition_id()``
   (Spark's RangePartitioner contract), all partitions work in
   parallel.
2. Per-partition window (partitionBy the pid): local row_number /
   cumulative aggregate — parallel, no global sort.
3. Per-partition summaries (one row per partition, ≤ a few thousand
   rows at any scale) prefix-combined with a window over the BOUNDED
   summary frame.
4. Broadcast the per-partition offsets back and add: global stat =
   partition offset ⊕ local stat.

Both branches read the same range exchange inside one job (Spark's
ReuseExchange), so the construction costs one wide shuffle + one
broadcast join. Exactness: with a total order (caller supplies a unique
tiebreaker, or pre-reduces to distinct keys) no key can straddle a
range boundary ambiguously — offset + local rank is THE global rank,
bit-identical to the single-task window it replaces, which is what lets
the rewritten queries keep their existing DuckDB oracles unchanged.

Integer validity: rank/offset arithmetic stays in BIGINT; the floor-
division helper is exact for magnitudes < 2^53 (division of two exact
longs through a double) — i.e. up to ~9e15 rows, documented per the
BIGINT-bounds policy in queries_quant.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__range_pid"


def _floor_div(a: Column, b: Column | int) -> Column:
    """Exact floor division for non-negative BIGINT columns.

    ``(a - a % b) / b`` is an integer-valued double — exact while the
    quotient < 2^53 (~9e15), far past any row count this engine will
    rank."""
    b = F.lit(b) if isinstance(b, int) else b
    return ((a - (a % b)) / b).cast("long")


def _range_parted(
    df: DataFrame,
    order_by: Sequence[Column | str],
    num_partitions: int | None,
) -> DataFrame:
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return df.repartitionByRange(n_part, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )


def global_rank(
    df: DataFrame,
    order_by: Sequence[Column | str],
    rank_col: str = "rnk",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over ``order_by`` (which MUST be a
    total order — include a unique tiebreaker), plus optionally the
    global row count attached to every row (``total_col``), computed
    from the same per-partition summaries (no extra single-task
    ``count() over ()`` window).

    Scale shape: one range exchange + per-partition row_number, offsets
    from a ≤#partitions-row prefix sum, one broadcast join. Replaces
    ``row_number().over(Window.orderBy(...))`` bit-for-bit.
    """
    parted = _range_parted(df, order_by, num_partitions)
    local = parted.withColumn(
        "__lrn",
        F.row_number().over(Window.partitionBy(_PID).orderBy(*order_by)),
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


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[Column | str],
    cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running sums of ``cols`` over the global
    ``order_by`` order, each replacing
    ``sum(c).over(Window.orderBy(...))``.

    For RANGE-frame semantics over tied keys (an ECDF), pre-reduce to
    one row per distinct key first — then ROWS ≡ RANGE and ties cannot
    straddle a partition boundary. Sums are computed in each column's
    own type (longs stay exact longs).
    """
    parted = _range_parted(df, order_by, num_partitions)
    w_loc = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted
    for c in cols:
        local = local.withColumn(f"__loc_{c}", F.sum(c).over(w_loc))
    totals = local.groupBy(_PID).agg(
        *[F.sum(c).alias(f"__sum_{c}") for c in cols]
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
    )
    out = local.join(F.broadcast(offsets), _PID)
    for c in cols:
        out = out.withColumn(
            c, F.col(f"__off_{c}") + F.col(f"__loc_{c}")
        ).drop(f"__loc_{c}", f"__off_{c}")
    return out.drop(_PID)


def global_cummax(
    df: DataFrame,
    order_by: Sequence[Column | str],
    cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running max of ``cols`` over the global order —
    the scale-safe form of ``max(c).over(Window.orderBy(...))`` (e.g.
    a watermark-lateness running high-water mark over arrival order)."""
    parted = _range_parted(df, order_by, num_partitions)
    w_loc = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
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

    Within-partition pairs come from a pid-partitioned lag; the one
    missing pair per partition boundary is recovered from the bounded
    per-partition (min, max) summary frame. Returns columns
    ``(prev_id, id_col)`` for gap rows only.
    """
    parted = _range_parted(df.select(id_col), [id_col], num_partitions)
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
