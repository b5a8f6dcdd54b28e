"""Streaming/versioned-table stress (round 11, r10 verdict item 5):
J11d (sink) / J11e (source) / J11f (pipeline) at ~100 versions and a
10x batch size, with MANIFEST-PLANNING time recorded separately from
data movement — the number that proves the round-10 checkpointed-delta
manifests made table metadata O(Δ) per operation instead of
O(total files).

Usage:
    python scripts/stress_stream.py [versions] [rows_per_batch]

Defaults: 100 versions x 100_000 rows (the "10x batch" shape; pass
10_000 for the 1x baseline). Prints one JSON line:

  append_s_first10/last10   mean wall per sink commit, first vs last 10
                            versions (flat = per-append metadata does
                            not grow with table age)
  plan_snapshot_ms          J11e partitions() for the full floor
                            snapshot -> latest (fresh-consumer plan)
  plan_increment_ms         J11e partitions() for (latest-1, latest]
                            (steady-state micro-batch plan)
  latest_offset_ms          J11e latestOffset() (once per micro-batch)
  ledger_ms                 committed_batch_ids() at full table age
                            (the sink's per-batch redelivery check)
  pipeline_full_s           J11f end-to-end: stream all versions of src
                            through a transform into dst (availableNow)
  pipeline_resume_s         J11f re-run after +3 src versions (reads
                            only the increment; exactly-once ledger)
  pipeline_noop_s           J11f re-run with nothing new (pure planning
                            + ledger overhead, zero data)

All planner probes are driver-side metadata calls on the reader object
itself, so they time exactly the manifest walks (no Spark execution).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    versions = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.showConsoleProgress", "false")
        .appName("stress_stream")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from time_series_spark_spark.sources.io import (
        committed_batch_ids,
        write_versioned,
    )
    from time_series_spark_spark.sources.pydatasource import (
        VersionedTableStreamReader,
    )
    from time_series_spark_spark.streaming.jobs import run_incremental_pipeline

    base = f"/tmp/stress_stream_{versions}x{rows}"
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/src"
    dst = f"{base}/dst"
    ck = f"{base}/ck"

    # ---- J11d append cadence: `versions` sink-style commits ------------
    append_s = []
    for v in range(versions):
        df = spark.range(v * rows, (v + 1) * rows).selectExpr(
            "id", "id % 97 AS k", "cast(id AS double) / 7 AS val"
        )
        t0 = time.perf_counter()
        write_versioned(
            df, src, batch_id=v, carry_forward=True, stream_id="stress"
        )
        append_s.append(time.perf_counter() - t0)

    def mean(xs):
        return sum(xs) / len(xs)

    # ---- J11e planner costs (pure manifest metadata) --------------------
    rd = VersionedTableStreamReader({"path": src})
    t0 = time.perf_counter()
    last = rd.latestOffset()
    latest_offset_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    snap_parts = rd.partitions(rd.initialOffset(), last)
    plan_snapshot_ms = (time.perf_counter() - t0) * 1e3

    rd2 = VersionedTableStreamReader({"path": src})  # cold memo
    t0 = time.perf_counter()
    inc_parts = rd2.partitions(
        {"version": last["version"] - 1, "snapshot": False}, last
    )
    plan_increment_ms = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    ledger = committed_batch_ids(src, "stress")
    ledger_ms = (time.perf_counter() - t0) * 1e3
    assert ledger == set(range(versions))

    # ---- J11f end-to-end pipeline ---------------------------------------
    def transform(feed):
        # stateless medallion step (filter + derive): streaming aggs need
        # a watermark and aren't the thing under test — the plumbing is
        from pyspark.sql import functions as F

        return feed.filter(F.col("k") < 50).withColumn(
            "val2", F.col("val") * 2
        )

    t0 = time.perf_counter()
    got = run_incremental_pipeline(spark, src, dst, transform, ck)
    pipeline_full_s = time.perf_counter() - t0
    assert got, "pipeline committed nothing"

    for v in range(versions, versions + 3):
        write_versioned(
            spark.range(v * rows, (v + 1) * rows).selectExpr(
                "id", "id % 97 AS k", "cast(id AS double) / 7 AS val"
            ),
            src,
            batch_id=v,
            carry_forward=True,
            stream_id="stress",
        )
    t0 = time.perf_counter()
    got2 = run_incremental_pipeline(spark, src, dst, transform, ck)
    pipeline_resume_s = time.perf_counter() - t0
    assert len(got2) >= 1

    t0 = time.perf_counter()
    got3 = run_incremental_pipeline(spark, src, dst, transform, ck)
    pipeline_noop_s = time.perf_counter() - t0
    assert got3 == []

    from time_series_spark_spark.sources.io import read_versioned

    n_dst = read_versioned(spark, dst).count()
    print(
        json.dumps(
            {
                "versions": versions,
                "rows_per_batch": rows,
                "append_s_first10": round(mean(append_s[:10]), 4),
                "append_s_last10": round(mean(append_s[-10:]), 4),
                "plan_snapshot_ms": round(plan_snapshot_ms, 2),
                "plan_increment_ms": round(plan_increment_ms, 2),
                "latest_offset_ms": round(latest_offset_ms, 2),
                "ledger_ms": round(ledger_ms, 2),
                "snapshot_input_partitions": len(snap_parts),
                "increment_input_partitions": len(inc_parts),
                "pipeline_full_s": round(pipeline_full_s, 2),
                "pipeline_resume_s": round(pipeline_resume_s, 2),
                "pipeline_noop_s": round(pipeline_noop_s, 2),
                "dst_rows": n_dst,
            }
        )
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
