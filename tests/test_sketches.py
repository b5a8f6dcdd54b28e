"""Sketch-rollup guarantees (operators/sketches.py):

- bitmap rollup is EXACT (== count(DISTINCT)) at every grain;
- HLL merge of hourly partials is LOSSLESS (== direct daily sketch) and
  the estimate lands within published error bounds vs exact;
- KLL merged quantiles respect rank-error bounds vs exact percentiles;
- HLL pairwise inclusion-exclusion overlap tracks exact intersections.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_spark_spark.operators.sketches import (
    bitmap_partials,
    bitmap_rollup,
    hll_pairwise_overlap,
    hll_partials,
    hll_rollup,
)
from time_series_spark_spark.queries_sketches import (
    events_hll_daily_users,
    events_kll_value_quantiles,
)
from time_series_spark_spark.sources.io import load

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load(spark, SF, "events").select(
        "event_type",
        "user_id",
        "value",
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
    )


def test_bitmap_rollup_exact(spark):
    """Bitmap partials at (type, day, hour) OR-merged to (type, day) give
    bit-exact distinct counts — identical to count(DISTINCT)."""
    ev = _events(spark)
    got = {
        (r.event_type, r.d): r.n_distinct
        for r in bitmap_rollup(
            bitmap_partials(ev, ["event_type", "d", "h"], "user_id"),
            ["event_type", "d"],
        ).collect()
    }
    want = {
        (r.event_type, r.d): r.n
        for r in ev.groupBy("event_type", "d")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_hll_merge_lossless_and_bounded(spark):
    """Union of hourly HLL partials == sketching the day directly (the
    merge loses nothing), and the estimate is within 5% of exact (default
    lgk=12 gives ~1.6% standard error; 5% ≈ 3σ)."""
    ev = _events(spark)
    merged = {
        r.d: r.approx_distinct
        for r in hll_rollup(
            hll_partials(ev, ["d", "h"], "user_id"), ["d"]
        ).collect()
    }
    direct = {
        r.d: r.approx_distinct
        for r in hll_rollup(
            hll_partials(ev, ["d"], "user_id"), ["d"]
        ).collect()
    }
    assert merged == direct
    exact = {
        r.d: r.n
        for r in ev.groupBy("d")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert merged.keys() == exact.keys()
    for d, n in exact.items():
        assert abs(merged[d] - n) <= max(1, 0.05 * n), (d, merged[d], n)


def test_hll_daily_query_matches_operator(spark):
    rows = events_hll_daily_users(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.approx_distinct > 0 for r in rows)


def test_kll_quantiles_within_rank_error(spark):
    """Merged-KLL p50/p90 sit within ±3% RANK of the exact distribution
    (k=200 ⇒ ~1.7% rank error bound; 3% adds slack for the merge)."""
    ev = _events(spark)
    got = {
        r.event_type: (r.p50, r.p90, r.p99)
        for r in events_kll_value_quantiles(spark, SF).collect()
    }
    for etype, (p50, p90, _) in got.items():
        vals = sorted(
            r.value
            for r in ev.filter(F.col("event_type") == etype)
            .select("value")
            .collect()
        )
        n = len(vals)
        import bisect

        for q, est in ((0.5, p50), (0.9, p90)):
            rank = bisect.bisect_left(vals, est) / n
            assert abs(rank - q) <= 0.03, (etype, q, est, rank)


def test_hll_pairwise_overlap_tracks_exact(spark):
    """Inclusion-exclusion overlap estimates vs exact pairwise
    intersections: within 5% of the LARGER set's size (the proper error
    scale for I-E: both terms carry union-magnitude noise)."""
    ev = load(spark, SF, "events")
    est = {
        (r.g1, r.g2): r.est_overlap
        for r in hll_pairwise_overlap(ev, "event_type", "user_id").collect()
    }
    sets: dict[str, set] = {}
    for r in ev.select("event_type", "user_id").distinct().collect():
        sets.setdefault(r.event_type, set()).add(r.user_id)
    types = sorted(sets)
    assert est.keys() == {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    for (a, b), e in est.items():
        exact = len(sets[a] & sets[b])
        scale = max(len(sets[a]), len(sets[b]))
        assert abs(e - exact) <= max(2, 0.05 * scale), (a, b, e, exact)


def test_compact_partials_idempotent_and_lossless(spark):
    """Compaction of a simulated multi-generation partial log (the same
    hourly partials appended twice, as a streaming restart would) is
    schema-stable, collapses to one row per (key, bucket), and rollup
    before == after compaction (and == rollup of the messy log)."""
    from time_series_spark_spark.operators.sketches import compact_partials

    ev = _events(spark)
    p = bitmap_partials(ev, ["event_type", "d"], "user_id")
    log = p.unionByName(p)  # two generations of the same partials
    compacted = compact_partials(log, ["event_type", "d"])
    assert compacted.columns == p.columns
    assert (
        compacted.groupBy("event_type", "d", "bucket").count()
        .filter(F.col("count") > 1).count() == 0
    )
    roll = lambda f: {  # noqa: E731
        (r.event_type, r.d): r.n_distinct
        for r in bitmap_rollup(f, ["event_type", "d"]).collect()
    }
    assert roll(compacted) == roll(log) == roll(p)
    # idempotent: compacting the compacted log is a no-op in content
    assert roll(compact_partials(compacted, ["event_type", "d"])) == roll(p)


def test_mg_heavy_hitters_exact_when_capacity_suffices(spark):
    """With counters >= distinct items every D_p is 0: bounds collapse and
    the result IS the exact top-k."""
    from time_series_spark_spark.operators.sketches import mg_heavy_hitters

    rows = [(f"t{i % 37}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    got = mg_heavy_hitters(df, "item", k=10, counters=100).collect()
    exact = df.groupBy("item").count().orderBy(F.desc("count"), "item").limit(10)
    want = [(r.item, r["count"]) for r in exact.collect()]
    assert [(r.item, r.cnt_lower) for r in got] == want
    assert all(r.cnt_lower == r.cnt_upper for r in got)


def test_mg_heavy_hitters_bounds_contain_truth_under_pressure(spark):
    """Zipf-ish stream with counters << distinct items: every reported
    item's true count must sit inside [cnt_lower, cnt_upper], and the
    guaranteed-capture property must hold (true > sum of decrements ⇒
    item present)."""
    import numpy as np

    from time_series_spark_spark.operators.sketches import mg_heavy_hitters

    rng = np.random.default_rng(11)
    zipf = np.clip(rng.zipf(1.5, size=20000), 1, 5000)
    rows = [(f"w{v}",) for v in zipf]
    df = spark.createDataFrame(rows, "item string").repartition(4)
    truth = {r.item: r["count"] for r in df.groupBy("item").count().collect()}
    got = mg_heavy_hitters(df, "item", k=15, counters=64).collect()
    assert len(got) == 15
    d_total = got[0].cnt_upper - got[0].cnt_lower
    assert d_total > 0  # pressure actually occurred
    for r in got:
        assert r.cnt_lower <= truth[r.item] <= r.cnt_upper
    # guaranteed capture: anything with true count > d_total is reported
    # by SOME summary row — check against the top reported upper bounds
    reported = {r.item for r in got}
    heavy = sorted(truth, key=truth.get, reverse=True)[:3]
    for t in heavy:
        if truth[t] > d_total:
            assert t in reported


def test_cm_sketch_bounds_and_merge_law(spark):
    """Count-Min guarantees: (1) estimates never undercount; (2) the
    overcount of every probe stays within the ε·N bound at 3× slack
    (ε = e/w; the probability of exceeding it even once across 60
    probes at d=5 is ~60·e⁻⁵ ≈ 0.4 — 3× slack makes the test
    deterministic in practice with the fixed seed); (3) sketching a
    union ≡ cell-wise merging the parts' sketches, exactly."""
    import math

    import numpy as np

    from time_series_spark_spark.operators.sketches import (
        cm_estimate,
        cm_merge,
        cm_partials,
    )

    w, d = 512, 5
    rng = np.random.default_rng(5)
    zipf = np.clip(rng.zipf(1.3, size=30000), 1, 10000)
    rows = [(int(v),) for v in zipf]
    df = spark.createDataFrame(rows, "item long").repartition(4)
    n = len(rows)
    truth = {r.item: r["count"] for r in df.groupBy("item").count().collect()}

    sketch = cm_partials(df, F.col("item"), w=w, d=d).cache()
    assert sketch.count() <= w * d  # bounded regardless of input size

    queries = spark.createDataFrame(
        [(k,) for k in sorted(truth)[:60]], "item long"
    )
    est = {
        r.item: r.est_cnt
        for r in cm_estimate(
            queries, sketch, F.col("item"), ["item"], w=w, d=d
        ).collect()
    }
    eps_n = math.e / w * n
    for k, e in est.items():
        assert e >= truth[k], f"undercount for {k}"
        assert e <= truth[k] + 3 * eps_n, f"overcount blowout for {k}"

    half_a = spark.createDataFrame(rows[: n // 2], "item long")
    half_b = spark.createDataFrame(rows[n // 2 :], "item long")
    merged = cm_merge(
        cm_partials(half_a, F.col("item"), w=w, d=d),
        cm_partials(half_b, F.col("item"), w=w, d=d),
    )
    direct = {(r.r, r.c): r.cnt for r in sketch.collect()}
    via_merge = {(r.r, r.c): r.cnt for r in merged.collect()}
    assert direct == via_merge


def test_hist_quantile_within_one_bucket_of_exact(spark):
    """Histogram p95 must land within one bucket width of the exact
    rank-⌈q·n⌉ order statistic (the inverted-CDF quantile — the rank the
    cumulative walk brackets; type-7 interpolated percentile can cross
    bucket edges on tiny groups, so it is not the right reference) for
    every (event_type, day), and stay inside [lo, hi]."""
    from time_series_spark_spark.operators.sketches import (
        hist_merge,
        hist_partials,
        hist_quantile,
    )

    ev = load(spark, SF, "events").select(
        "event_type",
        "value",
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
    )
    parts = hist_partials(ev, ["event_type", "d", "h"], "value", 0.0, 512.0, 64)
    est = {
        (r.event_type, r.d): r.p95_est
        for r in hist_quantile(
            hist_merge(parts, ["event_type", "d"]),
            ["event_type", "d"],
            0.95,
            0.0,
            512.0,
            64,
        ).collect()
    }
    exact = {
        (r.event_type, r.d): r.p
        for r in ev.groupBy("event_type", "d")
        .agg(
            F.expr(
                "sort_array(collect_list(value))"
                "[cast(ceil(0.95 * count(value)) AS int) - 1]"
            ).alias("p")
        )
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert 0.0 <= e <= 512.0
        assert abs(e - exact[k]) <= 8.0, (k, e, exact[k])


def test_hist_partials_merge_law(spark):
    """Merging hourly partials to daily must equal building daily
    partials directly — exact (integer addition), the property that makes
    the partial log a substitute for raw data."""
    from time_series_spark_spark.operators.sketches import (
        hist_merge,
        hist_partials,
    )

    ev = load(spark, SF, "events").select(
        "event_type",
        "value",
        F.date_trunc("day", "ts").alias("d"),
        F.date_trunc("hour", "ts").alias("h"),
    )
    merged = {
        (r.event_type, r.d, r.bucket): r.cnt
        for r in hist_merge(
            hist_partials(ev, ["event_type", "d", "h"], "value", 0.0, 512.0, 64),
            ["event_type", "d"],
        ).collect()
    }
    direct = {
        (r.event_type, r.d, r.bucket): r.cnt
        for r in hist_partials(
            ev, ["event_type", "d"], "value", 0.0, 512.0, 64
        ).collect()
    }
    assert merged == direct


def test_ams_f2_estimate_on_skewed_column(spark):
    """AMS self-join estimate for F2 = Σ c_k² on the heavily-skewed
    event_type column (5 keys): with 256 counters / 16-wide means the
    median-of-means must land within 30% of the exact second moment."""
    from time_series_spark_spark.operators.sketches import (
        ams_join_size,
        ams_partials,
    )
    from time_series_spark_spark.sources.io import load
    import pyspark.sql.functions as F

    ev = load(spark, SF, "events").select("event_type")
    p = ams_partials(ev, "event_type", n_sketches=256)
    est = ams_join_size(p, p, group_size=16, n_sketches=256).collect()[0][0]
    exact = (
        ev.groupBy("event_type")
        .count()
        .agg(F.sum(F.expr("count * count")))
        .collect()[0][0]
    )
    assert abs(est - exact) / exact < 0.3, (est, exact)


def test_ams_partials_merge_by_addition(spark):
    """Mergeable-summary law: sketching two disjoint halves and ADDING
    the z's is EXACTLY the sketch of the union (z's are plain sums)."""
    from time_series_spark_spark.operators.sketches import ams_partials
    from time_series_spark_spark.sources.io import load
    import pyspark.sql.functions as F

    ev = load(spark, SF, "events").select("event_id", "user_id")
    lo = ev.filter(F.col("event_id") % 2 == 0)
    hi = ev.filter(F.col("event_id") % 2 == 1)
    whole = {
        r["j"]: r["z"] for r in ams_partials(ev, "user_id", 32).collect()
    }
    a = {r["j"]: r["z"] for r in ams_partials(lo, "user_id", 32).collect()}
    b = {r["j"]: r["z"] for r in ams_partials(hi, "user_id", 32).collect()}
    assert whole == {j: a.get(j, 0) + b.get(j, 0) for j in whole}


def test_ams_join_size_deterministic(spark):
    """xxhash64 signs + integer sums + nearest-rank median: two runs
    produce the identical estimate (no RNG anywhere)."""
    from time_series_spark_spark.queries import REGISTRY

    fn = REGISTRY["orders_lineitem_ams_join_size"].fn
    a = fn(spark, SF).collect()[0]
    b = fn(spark, SF).collect()[0]
    assert a == b
    assert a["rel_err"] < 0.75


# ---------------------------------------------------------------------------
# Frequent Directions
# ---------------------------------------------------------------------------

def _sketch_matrix(spark, df, **kw):
    import numpy as np

    from time_series_spark_spark.operators.sketches import frequent_directions

    rows = frequent_directions(df, return_rows=True, **kw).collect()
    return np.array([list(r["row"]) for r in rows])


def test_fd_covariance_error_bound_on_real_embeddings(spark):
    import numpy as np

    from time_series_spark_spark.sources.io import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    A = np.array(
        [list(r["embedding"]) for r in emb.select("embedding").collect()],
        dtype=float,
    )
    B = _sketch_matrix(spark, emb, ell=16)
    err = np.linalg.norm(A.T @ A - B.T @ B, 2)
    fro2 = (A**2).sum()
    assert err <= fro2 / 16 + 1e-6  # the Liberty guarantee, merged partials


def test_fd_recovers_planted_low_rank_subspace(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    d, n = 16, 240
    u1, u2 = np.zeros(d), np.zeros(d)
    u1[0] = 1.0
    u2[1] = 1.0
    A = (
        np.outer(rng.randn(n) * 10, u1)
        + np.outer(rng.randn(n) * 6, u2)
        + rng.randn(n, d) * 0.01
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in A[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    B = _sketch_matrix(spark, df, ell=8)
    # top-2 right singular directions of the sketch span the planted plane
    _, _, vt = np.linalg.svd(B, full_matrices=False)
    for u in (u1, u2):
        proj = np.linalg.norm(vt[:2] @ u)
        assert proj > 0.99, proj


def test_fd_deterministic(spark):
    from time_series_spark_spark.queries import REGISTRY

    fn = REGISTRY["emb_frequent_directions"].fn
    a = [tuple(r) for r in fn(spark, "/root/testdata/sf0.001").collect()]
    b = [tuple(r) for r in fn(spark, "/root/testdata/sf0.001").collect()]
    assert a == b
    assert len(a) == 16


def test_fd_bound_holds_under_different_partitionings(spark):
    """FD merge law: the covariance error bound must hold for ANY
    partition composition (values may differ; the guarantee may not)."""
    import numpy as np

    from time_series_spark_spark.sources.io import load

    emb = load(spark, "/root/testdata/sf0.01", "embeddings")
    A = np.array(
        [list(r["embedding"]) for r in emb.select("embedding").collect()],
        dtype=float,
    )
    fro2 = (A**2).sum()
    for nparts in (1, 2, 8):
        B = _sketch_matrix(spark, emb, ell=16, n_partitions=nparts)
        err = np.linalg.norm(A.T @ A - B.T @ B, 2)
        assert err <= fro2 / 16 + 1e-6, nparts
