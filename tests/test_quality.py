"""Tests for sources/quality.py: Observation-based quality gates and
Morton (Z-order) parquet layout."""

import pytest

from pyspark.sql import functions as F

from time_series_spark_spark.sources.quality import (
    check_quality,
    morton_key,
    observe_quality,
    write_parquet_zorder,
)


def _py_morton(a: int, b: int, bits: int = 21) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 100, 2**20) for b in (0, 3, 77, 2**21 - 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", morton_key(F.col("a"), F.col("b"))).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton(a, b), (a, b)


def test_observe_quality_piggybacks_on_action(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y"), (4, None)], "id long, s string"
    )
    observed, obs = observe_quality(df, ["id", "s"])
    assert observed.count() == 4  # the action that materializes metrics
    got = check_quality(obs, max_null_frac=0.6, min_rows=2)
    assert got["n_rows"] == 4
    assert got["nulls_id"] == 0
    assert got["nulls_s"] == 2


def test_check_quality_raises_on_violation(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id long, s string")
    observed, obs = observe_quality(df, ["s"])
    observed.count()
    with pytest.raises(ValueError, match="nulls_s"):
        check_quality(obs, max_null_frac=0.25)


def test_zorder_layout_enables_two_sided_pruning(spark, tmp_path):
    import pyarrow.parquet as pq

    # A 64x64 grid: without clustering, every file spans the full range of
    # both columns and footer stats prune nothing.
    df = (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("a"),
            (F.col("id") / 64).cast("long").alias("b"),
            F.col("id").alias("payload"),
        )
    )
    path = str(tmp_path / "zorder")
    write_parquet_zorder(df, path, "a", "b", n_files=8, bits=6)

    back = spark.read.parquet(path)
    assert back.count() == 64 * 64
    assert back.agg(F.sum("payload")).first()[0] == (64 * 64) * (64 * 64 - 1) // 2

    # Footer stats: for BOTH dimensions, a narrow predicate must be able to
    # skip files. Collect per-file min/max from the parquet metadata.
    import glob

    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = {"a": None, "b": None}
        hi = {"a": None, "b": None}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in lo and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        spans.append((lo, hi))
    assert len(spans) >= 4

    for dim, probe_hi in (("a", 7), ("b", 7)):
        overlapping = sum(
            1 for lo, hi in spans if lo[dim] <= probe_hi and hi[dim] >= 0
        )
        assert overlapping < len(spans), (
            f"predicate {dim}<=7 prunes no files; spans={spans}"
        )


def test_profile_numeric_counts_nulls_and_distincts(spark):
    """A10: the one-scan profile must count rows, nulls, and exact
    distincts per column, with min/max/mean ignoring nulls (SQL agg
    semantics) — checked on a frame with planted nulls/dupes."""
    from time_series_spark_spark.sources.quality import profile_numeric

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (2, 30.0), (None, 20.0), (3, None)],
        "a long, b double",
    )
    rows = {r.column_name: r for r in profile_numeric(df, ["a", "b"]).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.n_rows, a.n_null, a.n_distinct) == (5, 1, 3)
    assert (a.vmin, a.vmax, a.vavg) == (1.0, 3.0, 2.0)
    assert (b.n_rows, b.n_null, b.n_distinct) == (5, 2, 3)
    assert (b.vmin, b.vmax, b.vavg) == (10.0, 30.0, 20.0)


def test_compaction_plan_laws():
    """FFD planner: every file assigned exactly once; no group over
    target unless it holds a single oversized file; deterministic."""
    from time_series_spark_spark.sources.quality import plan_compaction

    sizes = [(f"f{i}", s) for i, s in enumerate(
        [500, 300, 300, 200, 200, 100, 100, 100, 1200, 50]
    )]
    plan = plan_compaction(sizes, target_bytes=600)
    assert sorted(p for p, _, _ in plan) == sorted(p for p, _ in sizes)
    groups = {}
    for path, g, size in plan:
        groups.setdefault(g, []).append(size)
    for g, ss in groups.items():
        assert sum(ss) <= 600 or len(ss) == 1, (g, ss)
    # the oversized file sits alone
    big_group = [g for _, g, s in plan if s == 1200][0]
    assert groups[big_group] == [1200]
    assert plan == plan_compaction(list(reversed(sizes)), 600)


def test_compaction_query_covers_all_files(spark):
    from time_series_spark_spark.queries import REGISTRY

    pdf = REGISTRY["events_compaction_plan"].fn(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert pdf.n_files.sum() == 64
    assert len(pdf) > 1  # the adaptive cap produces real grouping
    assert (pdf.group_id == range(len(pdf))).all()


# ---------------------------------------------------------------------------
# check_constraints (Deequ-shape suite)
# ---------------------------------------------------------------------------

def test_check_constraints_single_scan_and_verdicts(spark):
    from time_series_spark_spark.sources.quality import check_constraints

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (-3, "c"), (4, "d")], "v int, s string"
    )
    rep = {
        r["check_name"]: r
        for r in check_constraints(
            df,
            [
                ("v_positive", "v > 0", 1.0),
                ("v_mostly_positive", "v > 0", 0.7),
                ("s_not_null", "s IS NOT NULL", 1.0),
            ],
        ).collect()
    }
    assert rep["v_positive"]["n_pass"] == 3
    assert not rep["v_positive"]["passed"]  # 0.75 < 1.0
    assert rep["v_mostly_positive"]["passed"]  # 0.75 >= 0.7
    assert rep["s_not_null"]["n_pass"] == 3 and not rep["s_not_null"]["passed"]
    assert all(r["n_rows"] == 4 for r in rep.values())


def test_compaction_preserves_rows_and_hits_file_budget(spark, tmp_path):
    """A17: compact_parquet never changes data (exact row multiset via
    sorted collect), plans ceil(bytes/target) files, and the rewritten
    layout matches the plan; the registered report agrees."""
    from pyspark.sql import functions as F

    from time_series_spark_spark.queries import REGISTRY
    from time_series_spark_spark.sources.io import compact_parquet, load

    orders = load(spark, "/root/testdata/sf0.001", "orders")
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    orders.repartition(16).write.parquet(src)
    stats = compact_parquet(spark, src, dst, target_file_bytes=20_000)
    assert stats["n_files_before"] == 16
    assert stats["n_files_after"] == stats["n_out_planned"] >= 2
    before = sorted(map(tuple, spark.read.parquet(src).collect()))
    after = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert before == after

    row = (
        REGISTRY["orders_compaction_report"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()[0]
    )
    assert row["rows_identical"]
    assert row["n_files_after"] < row["n_files_before"] == 64
    assert row["n_rows_before"] == row["n_rows_after"] == orders.count()


def test_schema_compat_verdict_taxonomy(spark):
    """A18: every verdict class fires on the planted evolution and the
    compatible flag matches the taxonomy; widening is direction-aware
    (int->bigint compatible, bigint->int narrowed)."""
    from pyspark.sql import types as T

    from time_series_spark_spark.queries import REGISTRY
    from time_series_spark_spark.sources.io import schema_compat_report

    rows = {
        r["column"]: (r["verdict"], r["compatible"])
        for r in REGISTRY["orders_schema_compat_report"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert rows["o_channel"] == ("added", True)
    assert rows["o_orderpriority"] == ("removed", False)
    assert rows["o_custkey"] == ("narrowed", False)  # bigint -> int
    assert rows["o_orderstatus"] == ("type_changed", False)
    assert rows["o_orderkey"] == ("unchanged", True)

    a = T.StructType([T.StructField("x", T.IntegerType())])
    b = T.StructType([T.StructField("x", T.LongType())])
    up = schema_compat_report(a, b)[0]
    down = schema_compat_report(b, a)[0]
    assert (up["verdict"], up["compatible"]) == ("widened", True)
    assert (down["verdict"], down["compatible"]) == ("narrowed", False)
