"""Mergeable sketch aggregates — the 100 TB pre-aggregation pattern.

SURVEY.md §2.D4 covers one approximate aggregate (`approx_count_distinct`);
this module generalizes it to the pattern that actually matters at
warehouse scale: compute a FIXED-SIZE mergeable partial per fine grain
(hour / shard / file), persist the partials, and answer any coarser ad-hoc
rollup by MERGING partials — never re-scanning raw data. A year of hourly
HLL partials for 1000 segments is ~100 MB; re-answering "distinct users
last quarter per segment" touches that, not 100 TB of raw events.

Spark 4 ships the Apache DataSketches family as JVM codegen aggregate
expressions, so everything here is built-in column algebra — no UDFs, no
Python in the hot path, map-side partial aggregation applies as usual.

Four families, chosen for complementary guarantees:

- **HLL** (`hll_sketch_agg` / `hll_union_agg` / `hll_union`): approximate
  COUNT(DISTINCT), ~1-2%% relative error at the default lgK=12 (4 KB per
  sketch). Deterministic (xxhash-based, no RNG). Merge is lossless: the
  union of hourly partials is bit-identical to sketching the day directly.
- **KLL** (`kll_sketch_agg_double` / `kll_sketch_merge_double` /
  `kll_sketch_get_quantile_double`): approximate quantiles with provable
  rank-error bounds (~1.7%% at the default k=200), mergeable pairwise.
- **Theta / HLL set algebra**: distinct-set OVERLAP between segments via
  inclusion-exclusion on merged sketches (|A∩B| = |A|+|B|-|A∪B|) — a
  G×G join of G one-row-per-group sketches, never a self-join of raw data.
- **Bitmap** (`bitmap_construct_agg` / `bitmap_or_agg` / `bitmap_count`):
  EXACT distinct counts for dense integer id domains. Spark's bitmaps
  cover 2^15 ids per bucket (4 KB); `bitmap_bucket_number` shards the id
  space, OR-merge within a bucket is exact, and the per-key total is the
  sum of per-bucket counts. This is the RoaringBitmap-style exact-rollup
  design: partials are mergeable AND the final number is not an estimate.

Reference parity note: /root/reference is empty (SURVEY.md §0); the spec
for this family is SURVEY.md §2.D4's "approximate distinct" plus the
standard published sketch literature (Flajolet et al. 2007 for HLL;
Karnin, Lang, Liberty FOCS'16 for KLL; Dasgupta et al. 2016 for Theta).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# HLL: partials + lossless merge
# --------------------------------------------------------------------------
def hll_partials(
    df: DataFrame, keys: list[str], id_col: str, lgk: int = 12
) -> DataFrame:
    """One 4 KB (at lgk=12) HLL sketch per ``keys`` group, as a ``binary``
    column ``hll``. This is the frame you would PERSIST at the finest grain
    (e.g. keys = [segment, hour]); every coarser query starts from it."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lgk)).alias("hll")
    )


def hll_rollup(
    partials: DataFrame, keys: list[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Merge fine-grain partials up to ``keys`` and estimate. The merge is
    lossless: estimates here equal sketching the raw rows at this grain
    directly (asserted in tests/test_sketches.py)."""
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias(out_col)
    )


def hll_pairwise_overlap(
    df: DataFrame, group_col: str, id_col: str, lgk: int = 14
) -> DataFrame:
    """Estimated distinct-id overlap for every unordered pair of groups.

    Scale shape: ONE pass over the raw data builds one sketch per group
    (G rows of ~16 KB at lgk=14); the pairwise grid is then a G×G join of
    that tiny frame — raw data is never self-joined. Intersection is
    inclusion-exclusion on the merged union sketch:
    ``est_overlap = est_a + est_b − est(a ∪ b)``.

    Output: (g1, g2, est_a, est_b, est_union, est_overlap), g1 < g2.
    """
    sk = df.groupBy(F.col(group_col).alias("g")).agg(
        F.hll_sketch_agg(F.col(id_col), F.lit(lgk)).alias("hll"),
    )
    a = sk.select(
        F.col("g").alias("g1"), F.col("hll").alias("hll_a")
    )
    b = sk.select(F.col("g").alias("g2"), F.col("hll").alias("hll_b"))
    pairs = a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
    est_a = F.hll_sketch_estimate("hll_a")
    est_b = F.hll_sketch_estimate("hll_b")
    est_u = F.hll_sketch_estimate(F.hll_union("hll_a", "hll_b"))
    return pairs.select(
        "g1",
        "g2",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        (est_a + est_b - est_u).alias("est_overlap"),
    )


# --------------------------------------------------------------------------
# KLL: quantile partials + pairwise merge
# --------------------------------------------------------------------------
def kll_partials(
    df: DataFrame, keys: list[str], val_col: str, k: int = 200
) -> DataFrame:
    """One KLL(k) quantile sketch per ``keys`` group (column ``kll``)."""
    return df.groupBy(*keys).agg(
        F.kll_sketch_agg_double(F.col(val_col), F.lit(k)).alias("kll")
    )


def _kll_merge_col(sketches: Column) -> Column:
    """Fold an array of KLL sketches into one with the pairwise merge
    scalar (`kll_sketch_merge_double` is binary, not an aggregate)."""
    return F.reduce(
        F.slice(sketches, 2, 1_000_000),
        F.element_at(sketches, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def kll_rollup_quantiles(
    partials: DataFrame, keys: list[str], quantiles: dict[str, float]
) -> DataFrame:
    """Merge fine-grain KLL partials up to ``keys`` and read quantiles.

    The fold runs over ``collect_list`` of the group's partials — sound
    only because the fine→coarse fan-in is bounded by construction
    (24 hours/day, ~30 days/month, ...), so each array holds a bounded
    number of ~few-KB sketches, not data rows.
    """
    merged = partials.groupBy(*keys).agg(
        _kll_merge_col(F.collect_list("kll")).alias("kll")
    )
    return merged.select(
        *keys,
        *[
            F.kll_sketch_get_quantile_double("kll", F.lit(q)).alias(name)
            for name, q in quantiles.items()
        ],
    )


# --------------------------------------------------------------------------
# Bitmap: EXACT mergeable distinct counts for dense integer ids
# --------------------------------------------------------------------------
def bitmap_partials(df: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    """Exact distinct partials: one 4 KB bitmap per (``keys``, id-bucket)
    covering 2^15 ids (``bitmap_bucket_number`` shards the id space).
    Mergeable with OR; persist at the finest grain like the HLL partials.
    Output columns: keys + (bucket, bitmap)."""
    return (
        df.select(
            *keys,
            F.bitmap_bucket_number(F.col(id_col)).alias("bucket"),
            F.bitmap_bit_position(F.col(id_col)).alias("pos"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bitmap"))
    )


def bitmap_rollup(
    partials: DataFrame, keys: list[str], out_col: str = "n_distinct"
) -> DataFrame:
    """EXACT distinct count at the ``keys`` grain from finer partials:
    OR-merge each id-bucket's bitmaps (exact dedup), count bits per
    bucket, sum buckets. Two small hash aggregates over partial rows —
    the raw table is long gone."""
    per_bucket = partials.groupBy(*keys, "bucket").agg(
        F.bitmap_count(F.bitmap_or_agg("bitmap")).alias("n")
    )
    return per_bucket.groupBy(*keys).agg(F.sum("n").alias(out_col))


def compact_partials(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Compaction for the append-only partial log (streaming J9 writes one
    partial row per micro-batch per key): OR-merge back to ONE row per
    (keys, bucket). Output is schema-identical to :func:`bitmap_partials`,
    so compaction is idempotent and composes with :func:`bitmap_rollup`
    unchanged — run it periodically to bound merge-on-read cost."""
    return partials.groupBy(*keys, "bucket").agg(
        F.bitmap_or_agg("bitmap").alias("bitmap")
    )


# --------------------------------------------------------------------------
# Misra-Gries: mergeable heavy-hitters (approximate top-k with bounds)
# --------------------------------------------------------------------------
def mg_heavy_hitters(
    items: DataFrame,
    item_col: str,
    k: int = 50,
    counters: int = 512,
) -> DataFrame:
    """Approximate top-``k`` items with deterministic error bounds via
    per-partition Misra-Gries summaries (Misra & Gries 1982; mergeability
    per Agarwal et al., PODS'12 "Mergeable Summaries").

    Each partition keeps ≤ ``counters`` counters: batch counts are added
    exactly, then if the table overflows, every counter is decremented by
    the (counters+1)-th largest value and non-positive entries drop; the
    per-partition total decrement ``D_p`` is the only extra state. The
    guarantees that survive the merge are scalar:

        lower(t) = Σ_p cnt_p(t)  ≤  true(t)  ≤  Σ_p cnt_p(t) + Σ_p D_p

    so any item with true count > Σ D_p is guaranteed present. Output:
    ``(item, cnt_lower, cnt_upper)``, top-k by upper bound.

    100 TB shape: memory is O(counters) per task regardless of partition
    size; the merge is one small hash agg over ≤ counters×partitions
    summary rows plus a broadcast of the scalar Σ D_p. Raw data is
    scanned once, never shuffled. Exact when distinct items ≤ counters
    (then every D_p = 0 and the bounds collapse).
    """
    return mg_merge_topk(mg_partials(items, item_col, counters), k)


def mg_partials(
    items: DataFrame, item_col: str, counters: int = 512
) -> DataFrame:
    """Per-partition Misra-Gries summaries as mergeable partial rows:
    ``(item, cnt)`` per surviving counter plus one ``(NULL, D_p)``
    decrement row per partition. Partials merge by item-wise count
    addition + decrement addition (Agarwal et al., PODS'12), so they can
    be unioned across partitions, micro-batches, or partial-log files
    before :func:`mg_merge_topk`."""
    from typing import Iterator

    import pandas as pd

    src = items.select(F.col(item_col).cast("string").alias("item"))

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        decr = 0
        for pdf in batches:
            for item, c in pdf["item"].value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > counters:
                vals = sorted(counts.values(), reverse=True)
                d = vals[counters]  # (counters+1)-th largest
                if d:
                    decr += d
                    counts = {t: c - d for t, c in counts.items() if c > d}
        out = pd.DataFrame(
            {"item": list(counts) + [None], "cnt": list(counts.values()) + [decr]}
        )
        yield out.astype({"cnt": "int64"})

    return src.mapInPandas(_summarize, "item string, cnt long")


def mg_merge_topk(summaries: DataFrame, k: int = 50) -> DataFrame:
    """Merge Misra-Gries partial rows (any union of :func:`mg_partials`
    outputs) into top-``k`` (item, cnt_lower, cnt_upper): one small hash
    agg over the summary rows plus a broadcast of the scalar ΣD."""
    d_total = summaries.filter(F.col("item").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("d_total")
    )
    merged = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("cnt_lower"))
    )
    return (
        merged.crossJoin(F.broadcast(d_total))
        .select(
            "item",
            "cnt_lower",
            (F.col("cnt_lower") + F.col("d_total")).alias("cnt_upper"),
        )
        .orderBy(F.desc("cnt_upper"), "item")
        .limit(k)
    )


# --------------------------------------------------------------------------
# Count-Min: mergeable frequency estimation (point queries with ε/δ bounds)
# --------------------------------------------------------------------------
def cm_partials(
    df: DataFrame,
    key: Column,
    weight: Column | None = None,
    w: int = 2048,
    d: int = 5,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over ``key`` as
    ``(row, col, cnt)`` cell partials — mergeable frequency estimation,
    the counting sibling of the Bloom membership filter above.

    Each item increments one cell per hash row: ``(i, xxhash64(i, key)
    mod w)``; the sketch is ≤ ``d·w`` rows REGARDLESS of input size and
    merges across batches/shards by plain cell addition (one hash agg
    with map-side combine — the explode never shuffles raw keys, only
    bounded cells). Estimates never undercount; overcount ≤ (e/w)·N with
    probability ≥ 1 − e^(−d) per probe.
    """
    wt = weight if weight is not None else F.lit(1).cast("long")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                F.pmod(F.xxhash64(F.lit(i), key), F.lit(w)).alias("c"),
                wt.alias("wt"),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("cell"))
        .select("cell.r", "cell.c", "cell.wt")
        .groupBy("r", "c")
        .agg(F.sum("wt").alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two CM sketches with identical (w, d): cell-wise addition.
    Associative and commutative, so shard/batch partials fold in any
    order — the mergeable-summaries contract (Agarwal PODS'12)."""
    return a.unionByName(b).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    queries: DataFrame,
    sketch: DataFrame,
    key: Column,
    out_cols: list[str],
    w: int = 2048,
    d: int = 5,
) -> DataFrame:
    """Point-estimate the frequency of each ``queries`` row's ``key``:
    min over the d probed cells. Map-only on the query side — the sketch
    collapses to ONE broadcast row holding ``map<r·w+c, cnt>`` (same
    plan shape as the Bloom probe): scan → one-row broadcast join →
    per-row ``least`` over d lookups. Missing cell ⇒ 0 (nothing hashed
    there).

    Returns ``queries[out_cols]`` + ``est_cnt`` (long, ≥ true count).
    """
    packed = sketch.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("r").cast("long") * w + F.col("c")).alias("k"),
                    F.col("cnt").alias("v"),
                )
            )
        ).alias("__cm")
    )
    probes = [
        F.coalesce(
            F.try_element_at(
                F.col("__cm"),
                (F.lit(i * w) + F.pmod(F.xxhash64(F.lit(i), key), F.lit(w))).cast(
                    "long"
                ),
            ),
            F.lit(0).cast("long"),
        )
        for i in range(d)
    ]
    return (
        queries.join(F.broadcast(packed))
        .select(*out_cols, F.least(*probes).alias("est_cnt"))
    )


# --------------------------------------------------------------------------
# Fixed-bucket histogram: exact mergeable partials + interpolated quantile
# (the Prometheus histogram / histogram_quantile rollup pattern)
# --------------------------------------------------------------------------
def hist_partials(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Equi-width histogram partials per key grain: ``(keys…, bucket,
    cnt)``. Rows are bounded by ``|keys| × n_buckets`` REGARDLESS of input
    size, counts are EXACT, and the merge to any coarser grain is plain
    addition (``hist_merge``) — the algebraic-partial property the sketch
    family is built on, here with no approximation in the partial itself
    (only the final within-bucket interpolation estimates).

    Values outside [lo, hi) clamp into the edge buckets (Prometheus's
    +Inf-bucket convention, both-sided).
    """
    width = (hi - lo) / n_buckets
    b = F.least(
        F.lit(n_buckets - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
        ).cast("int"),
    ).cast("long")
    return (
        df.withColumn("bucket", b)
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Roll partials up to a coarser grain: counts add per bucket."""
    return partials.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def hist_quantile(
    partials: DataFrame,
    keys: list[str],
    q: float,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Per-key quantile estimate from histogram partials — the
    ``histogram_quantile`` rule: walk the cumulative counts to the bucket
    holding rank ``q·total``, interpolate linearly inside it. Error is
    bounded by one bucket width (pinned in tests vs the exact percentile).

    One window over the (already bounded) partial frame + one filter —
    raw data is never touched, which is the point: any ad-hoc quantile
    re-answers from the partial log.
    """
    from pyspark.sql.window import Window

    width = (hi - lo) / n_buckets
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*keys)
    cum = (
        partials.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("total", F.sum("cnt").over(w_tot))
        .withColumn("target", F.lit(q) * F.col("total").cast("double"))
    )
    est = F.lit(lo) + F.lit(width) * (
        F.col("bucket").cast("double")
        + (F.col("target") - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double")
    )
    return (
        cum.filter(
            ((F.col("cum") - F.col("cnt")).cast("double") < F.col("target"))
            & (F.col("cum").cast("double") >= F.col("target"))
        )
        .select(*keys, F.round(est, 6).alias(f"p{int(q * 100)}_est"))
    )


# --------------------------------------------------------------------------
# D22: AMS (Alon-Matias-Szegedy) F2 / join-size sketch (round 5)
# --------------------------------------------------------------------------
def ams_partials(
    df: DataFrame, key_col: str, n_sketches: int = 64
) -> DataFrame:
    """Per-sketch signed sums Z_j = Σ_rows ξ_j(key): the AMS atomic
    sketch (Alon, Matias & Szegedy, STOC'96). ξ_j is a ±1 hash of
    (j, key) via xxhash64 — deterministic across runs and engines, and
    empirically 4-wise-enough for the estimator bounds asserted in
    tests. Output: ``n_sketches`` rows (j, z) — constant size no matter
    the input, and z's are plain sums, so partials from any partitioning
    or micro-batch merge by addition (mergeable-summary property).

    Self-join size / F2 estimate: median over groups of means of Z_j².
    Cross-join size |R ⋈ S| on the key: same over Z_j^R · Z_j^S — the
    classic cardinality estimator a cost-based planner uses to size a
    join without running it.

    Shape: Z_j = Σ_keys c_k·ξ_j(k), so the raw rows reduce to per-key
    counts FIRST (map-side-combining hash agg — the full-data pass) and
    only the bounded distinct-key frame fans out ×``n_sketches``.
    Fanning out raw rows instead was measured 4× slower at sf0.1 and
    would shuffle n_sketches× the corpus at scale.
    """
    from time_series_spark_spark.operators.packed import shuffle_parallelism

    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # Re-pin the ×n_sketches fan-out stage's parallelism: the count
    # frame is tiny by BYTES, so AQE coalesces the groupBy's output to
    # one partition and the n_keys×n_sketches xxhash stage runs on a
    # single task (measured: the whole cost of the join-size query,
    # 38M serial hashes at sf0.1). Round-robin with an explicit count —
    # a same-key repartition is optimized away as redundant and its
    # ENSURE exchange re-coalesced; a user-specified round robin is
    # kept. This moves the smallest frame in the pipeline (per-key
    # counts, post-combine; the raw pass's map-side combine is intact).
    counts = counts.repartition(shuffle_parallelism(df))
    # explode a shared int sequence, NOT array_repeat(k, n): repeating the
    # key materializes an n_sketches-wide array per key before the explode
    fan = counts.select(
        "c",
        "k",
        F.explode(F.expr(f"sequence(0, {n_sketches - 1})")).alias("j"),
    )
    # xxhash64 % 2 is in {-1, 0, 1} (Java % keeps the sign): parity → ±1
    sign = F.when(F.xxhash64(F.col("j"), F.col("k")) % 2 == 0, 1).otherwise(-1)
    return (
        fan.withColumn("s", sign * F.col("c"))
        .groupBy("j")
        .agg(F.sum("s").alias("z"))
    )


def ams_join_size(
    left_partials: DataFrame,
    right_partials: DataFrame,
    group_size: int = 8,
    n_sketches: int = 64,
) -> DataFrame:
    """Median-of-means join-size estimate from two AMS partial frames
    (each: (j, z), ``n_sketches`` rows — pass the SAME value given to
    :func:`ams_partials`; it is taken as a parameter so the median rank
    is known statically instead of via a ``count()`` action that would
    re-execute the whole upstream lineage). Products Z_j^R·Z_j^S are
    grouped into ``group_size``-wide means; the NEAREST-RANK median of
    the group means is the estimate (median-of-means: means shrink
    variance, median defeats outlier groups). All arithmetic on exact
    integer sums; one row out.
    """
    prod = (
        left_partials.withColumnRenamed("z", "zl")
        .join(right_partials.withColumnRenamed("z", "zr"), "j")
        .select("j", (F.col("zl") * F.col("zr")).alias("p"))
    )
    means = (
        prod.withColumn("g", F.expr(f"j div {group_size}"))
        .groupBy("g")
        .agg(F.avg("p").alias("m"))
    )
    w = Window.orderBy("m", "g")
    n_groups = -(-n_sketches // group_size)
    mid = (n_groups + 1) // 2
    return (
        means.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == mid)
        .select(F.round(F.col("m"), 2).alias("join_size_estimate"))
    )


# ---------------------------------------------------------------------------
# Frequent Directions (mergeable matrix / covariance sketch)
# ---------------------------------------------------------------------------

def _fd_reduce(mat, ell: int):
    """One FD shrinkage step: (m, d) → (ell, d) with the Liberty (KDD'13)
    guarantee machinery — SVD, subtract σ_ell² from every squared
    singular value, keep the top ell rows of diag(σ̃)·Vᵀ."""
    import numpy as np

    if mat.shape[0] <= ell:
        return mat
    _, s, vt = np.linalg.svd(mat, full_matrices=False)
    k = min(ell, len(s))
    delta = s[k - 1] ** 2
    s_shrunk = np.sqrt(np.maximum(s[:k] ** 2 - delta, 0.0))
    return s_shrunk[:, None] * vt[:k]


def frequent_directions(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ell: int = 16,
    n_partitions: int = 4,
    return_rows: bool = False,
) -> DataFrame:
    """Frequent Directions matrix sketch (Liberty KDD'13; Ghashami et al.
    SICOMP'16): a deterministic, MERGEABLE ℓ×d sketch B of the n×d
    embedding matrix A with ‖AᵀA − BᵀB‖₂ ≤ ‖A‖F²/ℓ — the streaming/
    distributed answer to "approximate the covariance/top singular
    directions without materializing AᵀA or shuffling A".

    Shape: per-partition FD partials via ``mapInPandas`` (each task
    touches only its rows and keeps O(ℓ·d) state), then ONE final
    single-task merge pass over the n_partitions·ℓ partial rows — the
    FD merge theorem says sketch-of-concatenated-sketches keeps the
    bound, which is what makes this a sketch and not just a local
    factorization. ``repartitionByRange`` + in-partition sort make the
    partial composition (and hence the exact sketch values)
    deterministic and layout-invariant.

    Output: ``rank, sigma`` — the sketch's singular values (row norms of
    B), the spectrum estimate used to size IVF cells / PCA dims before
    any exact pass. At 100 TB: partials are embarrassingly parallel;
    the merge input is n_partitions·ℓ rows regardless of n.
    """
    import numpy as np
    import pandas as pd

    d_dim = len(emb.select(vec_col).first()[0])

    def _partial(batches):
        buf = np.zeros((0, d_dim))
        for pdf in batches:
            rows = np.array([list(v) for v in pdf["v"]], dtype=float)
            if len(rows):
                buf = _fd_reduce(np.vstack([buf, rows]), 2 * ell)
        out = _fd_reduce(buf, ell)
        yield pd.DataFrame({"row": [list(map(float, r)) for r in out]})

    partials = (
        emb.repartitionByRange(n_partitions, id_col)
        .sortWithinPartitions(id_col)
        .select(F.col(vec_col).alias("v"))
        .mapInPandas(_partial, schema="row array<double>")
    )

    def _merge(batches):
        rows = []
        for pdf in batches:
            rows.extend(list(r) for r in pdf["row"])
        b = _fd_reduce(np.array(rows, dtype=float), ell)
        sig = np.sqrt((b**2).sum(axis=1))
        order = np.argsort(-sig)
        if return_rows:
            yield pd.DataFrame(
                {"row": [list(map(float, b[i])) for i in order]}
            )
        else:
            yield pd.DataFrame(
                {
                    "rank": range(len(order)),
                    "sigma": [float(sig[i]) for i in order],
                }
            )

    merged = partials.repartition(1)
    if return_rows:
        return merged.mapInPandas(_merge, schema="row array<double>")
    return merged.mapInPandas(
        _merge, schema="rank int, sigma double"
    ).select("rank", F.round("sigma", 4).alias("sigma"))
