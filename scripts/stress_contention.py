"""Round 14 (r13 verdict item 5): N-writer CONTENTION stress — eight
concurrent processes each MERGE a disjoint key range into ONE versioned
table (the multi-writer CDC case the A13i rebase exists for). Measured:
every commit lands (versions base+1..base+N, no conflicts, no retry
storm), how many put-if-absent losses were rebased past, per-writer and
total walls, and the final snapshot is exactly the serial result.

Usage:
    python scripts/stress_contention.py [n_writers] [cow|mor]

Prints one JSON line:
  n_writers, strategy, build_s, total_s,
  all_landed (bool), versions (sorted landed versions),
  n_rebases_total, n_conflicts, walls_s (per writer),
  rows_updated_ok (bool — every range's sentinel applied exactly)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ROWS = 1_000_000
N_FILES = 16
KEYS_PER_WRITER = 1_000
SENTINEL = 777_777

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from time_series_spark_spark.sources.io import (
    ConcurrentCommitError, merge_versioned,
)

idx, path, strategy = int(sys.argv[1]), sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[3]")
    .config("spark.sql.shuffle.partitions", "3")
    .config("spark.ui.enabled", "false")
    .appName(f"contention_{{idx}}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
lo = idx * ({n_rows} // 8)
changes = (
    spark.range(lo, lo + {keys}).selectExpr(
        "id as k",
        "'update' as op",
        "cast({sentinel} as long) as new_val",
    )
)
t0 = time.perf_counter()
try:
    rep = merge_versioned(
        spark, path, changes, ["k"], max_attempts=32, strategy=strategy
    )
    out = {{
        "idx": idx,
        "version": rep["version"],
        "n_rebases": rep["n_rebases"],
        "wall_s": round(time.perf_counter() - t0, 2),
        "conflict": False,
    }}
except ConcurrentCommitError as e:
    out = {{
        "idx": idx,
        "version": None,
        "n_rebases": None,
        "wall_s": round(time.perf_counter() - t0, 2),
        "conflict": True,
        "err": str(e)[:200],
    }}
print("WORKER " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    n_writers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    strategy = sys.argv[2] if len(sys.argv) > 2 else "cow"
    repo = str(Path(__file__).resolve().parent.parent)

    from pyspark.sql import SparkSession
    from time_series_spark_spark.sources.io import (
        read_versioned,
        write_versioned,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("contention_build")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = tempfile.mkdtemp(prefix="contention_") + "/vt"
    t0 = time.perf_counter()
    write_versioned(
        spark.range(N_ROWS)
        .selectExpr("id as k", "cast(0 as long) as val")
        .repartitionByRange(N_FILES, "k"),
        path,
    )
    build_s = round(time.perf_counter() - t0, 2)
    base = 0

    worker_src = _WORKER.format(
        repo=repo, n_rows=N_ROWS, keys=KEYS_PER_WRITER, sentinel=SENTINEL
    )
    t0 = time.perf_counter()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker_src, str(i), path, strategy],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=dict(os.environ),
        )
        for i in range(n_writers)
    ]
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        for line in out.splitlines():
            if line.startswith("WORKER "):
                results.append(json.loads(line[len("WORKER "):]))
    total_s = round(time.perf_counter() - t0, 2)

    versions = sorted(r["version"] for r in results if r["version"])
    landed = versions == list(range(base + 1, base + 1 + n_writers))
    # final-state check: every writer's sentinel applied to exactly its
    # key count, nothing else touched
    snap = read_versioned(spark, path)
    n_sentinel = snap.filter(f"val = {SENTINEL}").count()
    rows_ok = (
        n_sentinel == n_writers * KEYS_PER_WRITER
        and snap.count() == N_ROWS
    )
    print(
        json.dumps(
            {
                "n_writers": n_writers,
                "strategy": strategy,
                "build_s": build_s,
                "total_s": total_s,
                "all_landed": landed,
                "versions": versions,
                "n_rebases_total": sum(
                    r["n_rebases"] or 0 for r in results
                ),
                "n_conflicts": sum(1 for r in results if r["conflict"]),
                "walls_s": sorted(r["wall_s"] for r in results),
                "rows_updated_ok": rows_ok,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
