"""Round-13 stress (r12 verdict item 5): the round-12/13 table-format
mechanisms at 100x-corpus scale — MERGE with 1e4 changelog keys into a
60M-row table, the data-skipping planner at 1e4 files, and 50
micro-batches of streaming upsert — measured, not asserted.

Usage:
    python scripts/stress_cow.py [merge|skip|upsert|all]

Prints one JSON line:

  merge_build_s            build + commit the 60M-row / 64-file table
  merge_1e4_keys_s         MERGE wall, 10_000-key changelog in a narrow
                           key range (envelope pruning applies)
  merge_1e4_files_rw       files rewritten by it (O(touched) evidence)
  merge_10_keys_s          MERGE wall, 10-key changelog — the O(touched)
                           comparison: both merges rewrite few files of
                           a 60M-row table, so their walls should be
                           near each other and NOWHERE near a
                           rewrite-all (seconds, not minutes)
  skip_build_s             build + commit the ~1e4-file table
  skip_n_files             actual committed file count
  skip_plan_ms             prune_files_by_stats wall — manifest math
                           only, ZERO footer/data I/O, must stay ms at
                           1e4 files
  skip_kept / skip_skipped file counts for a 1%-of-domain range
  skip_read_pruned_s       scan+filter over kept files only
  skip_read_full_s         same filter over ALL files (the plan data
                           skipping replaces)
  upsert_total_s           50 availableNow micro-batches (1 file each)
                           of MERGE upsert into a seeded table
  upsert_batch_mean_first10_s / _last10_s
                           per-merge-commit wall from the manifests'
                           monotonic committed_at stamps — flat means
                           per-batch cost does not grow with table age
  upsert_ledger_entries    ledger entries in the final checkpoint
                           manifest (1 == the round-13 O(streams)
                           compaction holds at streaming cadence)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .appName("stress_cow")
        .getOrCreate()
    )


def _base_rows(spark, replicas: int):
    """lineitem replicated with shifted synthetic keys: k is unique and
    RANGE-CLUSTERED per replica, so repartitionByRange files get tight
    key envelopes (the layout data skipping and MERGE pruning exist
    for)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        (
            F.col("l_orderkey").cast("long") * 8
            + F.col("l_linenumber").cast("long")
        ).alias("k0"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.col("l_returnflag").alias("grp"),
    )
    return li.withColumn(
        "r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
    ).select(
        (F.col("r").cast("long") * F.lit(60_000_000) + F.col("k0")).alias(
            "k"
        ),
        "cents",
        "grp",
    )


def stress_merge(spark, out: dict) -> None:
    from pyspark.sql import functions as F

    from time_series_spark_spark.sources.io import merge_versioned, write_versioned

    path = "/tmp/stress_cow_merge"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    df = _base_rows(spark, 100).repartitionByRange(64, "k").sortWithinPartitions("k")
    write_versioned(df, path)
    out["merge_build_s"] = round(time.perf_counter() - t0, 2)
    out["merge_n_rows"] = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count() * 100

    def changelog(n):
        # narrow range: n keys from replica 3 (clustered -> few files);
        # deduped — the testdata's (orderkey, linenumber) is not unique
        return (
            _base_rows(spark, 100)
            .filter((F.col("k") >= 180_000_000) & (F.col("k") < 181_000_000))
            .dropDuplicates(["k"])
            .limit(n)
            .select(
                "k",
                F.lit("update").alias("op"),
                (F.col("cents") + 1).alias("new_cents"),
                F.lit("U").alias("new_grp"),
            )
        )

    t0 = time.perf_counter()
    rep = merge_versioned(spark, path, changelog(10_000), ["k"])
    out["merge_1e4_keys_s"] = round(time.perf_counter() - t0, 2)
    out["merge_1e4_files_rw"] = rep["n_files_rewritten"]
    out["merge_1e4_files_carried"] = rep["n_files_carried"]
    t0 = time.perf_counter()
    rep = merge_versioned(spark, path, changelog(10), ["k"])
    out["merge_10_keys_s"] = round(time.perf_counter() - t0, 2)
    out["merge_10_files_rw"] = rep["n_files_rewritten"]
    shutil.rmtree(path, ignore_errors=True)


def stress_skip(spark, out: dict) -> None:
    from pyspark.sql import functions as F

    from time_series_spark_spark.sources.fsio import as_table_fs
    from time_series_spark_spark.sources.io import (
        prune_files_by_stats,
        write_versioned,
    )

    path = "/tmp/stress_cow_skip"
    shutil.rmtree(path, ignore_errors=True)
    # ~1e4 files: exact-count repartitionByRange (AQE coalescing off for
    # this write so the file count is the stress target, not a plan
    # optimization)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        t0 = time.perf_counter()
        df = (
            _base_rows(spark, 17)  # ~10M rows -> ~1 KB-file scale is fine
            .repartitionByRange(10_000, "k")
            .sortWithinPartitions("k")
        )
        write_versioned(df, path)
        out["skip_build_s"] = round(time.perf_counter() - t0, 2)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    tfs = as_table_fs(path)
    n_files = tfs.read_json("_manifest.0.json")["n_files"]
    out["skip_n_files"] = n_files
    lo, hi = 120_000_000, 126_000_000  # ~1% of the k domain
    t0 = time.perf_counter()
    kept, skipped = prune_files_by_stats(path, 0, "k", lo, hi)
    out["skip_plan_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    out["skip_kept"], out["skip_skipped"] = len(kept), len(skipped)
    pred = (F.col("k") >= lo) & (F.col("k") <= hi)
    t0 = time.perf_counter()
    n1 = (
        spark.read.parquet(*(tfs.spark_path(f) for f in kept))
        .filter(pred)
        .count()
    )
    out["skip_read_pruned_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n2 = (
        spark.read.parquet(*(tfs.spark_path(f) for f in kept + skipped))
        .filter(pred)
        .count()
    )
    out["skip_read_full_s"] = round(time.perf_counter() - t0, 2)
    assert n1 == n2, (n1, n2)  # skipping is never a correctness filter
    shutil.rmtree(path, ignore_errors=True)


def stress_upsert(spark, out: dict) -> None:
    from pyspark.sql import functions as F

    from time_series_spark_spark.sources.fsio import as_table_fs, latest_version
    from time_series_spark_spark.sources.io import write_versioned
    from time_series_spark_spark.streaming.jobs import (
        stream_merge_to_versioned_table,
    )

    table = "/tmp/stress_cow_upsert_t"
    src = "/tmp/stress_cow_upsert_src"
    ck = "/tmp/stress_cow_upsert_ck"
    for p in (table, src, ck):
        shutil.rmtree(p, ignore_errors=True)
    os.makedirs(src)
    # seed: 1e6 keys over 16 range-clustered files
    seed = (
        spark.range(1_000_000)
        .select(
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("cents"),
            F.lit(0).cast("long").alias("seq"),
        )
        .repartitionByRange(16, "k")
        .sortWithinPartitions("k")
    )
    write_versioned(seed, table)
    # 50 source files, each updating 2_000 keys in one narrow range
    for b in range(50):
        lo = (b % 16) * 60_000
        spark.range(lo, lo + 2_000).select(
            F.col("id").alias("k"),
            F.lit(100 + b).cast("long").alias("cents"),
            F.lit(b).cast("long").alias("seq"),
        ).coalesce(1).write.mode("append").parquet(src)
    sdf = (
        spark.readStream.schema("k long, cents long, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.perf_counter()
    stream_merge_to_versioned_table(sdf, table, ["k"], ["seq"], checkpoint_dir=ck)
    out["upsert_total_s"] = round(time.perf_counter() - t0, 2)
    tfs = as_table_fs(table)
    lv = latest_version(tfs)
    out["upsert_versions"] = lv
    stamps = [
        tfs.read_json(f"_manifest.{v}.json")["committed_at"]
        for v in range(lv + 1)
    ]
    gaps = [(b - a) / 1e6 for a, b in zip(stamps[1:], stamps[2:])]
    if len(gaps) >= 20:
        out["upsert_batch_mean_first10_s"] = round(sum(gaps[:10]) / 10, 3)
        out["upsert_batch_mean_last10_s"] = round(sum(gaps[-10:]) / 10, 3)
    # the round-13 ledger compaction at streaming cadence: the last
    # snapshot manifest's ledger is O(streams) == 1 entry
    for v in range(lv, -1, -1):
        m = tfs.read_json(f"_manifest.{v}.json")
        if "ledger" in m:
            out["upsert_ledger_entries"] = len(m["ledger"])
            break
    for p in (table, src, ck):
        shutil.rmtree(p, ignore_errors=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    if which in ("merge", "all"):
        stress_merge(spark, out)
    if which in ("skip", "all"):
        stress_skip(spark, out)
    if which in ("upsert", "all"):
        stress_upsert(spark, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
