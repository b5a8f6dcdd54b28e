"""Round 14 measurement (r13 verdict item 4): skipping-plan time at
10⁵–10⁶ files — driver-side envelope resolution vs the distributed
sidecar fan-out (``prune_files_kept_distributed``).

Fabricates a synthetic sidecar-backed snapshot manifest (path +
col_stats per file; NO data files — this measures PLAN time only, the
thing that must stay flat) and times both paths with a selective
predicate (keeps ~0.1% of files). Run:

    python scripts/stress_prune.py [n_files ...]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq


def build_table(n_files: int) -> str:
    """A table dir with one synthetic sidecar snapshot manifest: file i
    covers k ∈ [i*100, i*100+99]."""
    root = tempfile.mkdtemp(prefix=f"prune_stress_{n_files}_")
    name = "_snapshot.0-synthetic.parquet"
    paths = [f"v=0-synthetic/part-{i:07d}.parquet" for i in range(n_files)]
    cs = [
        json.dumps({"k": [i * 100, i * 100 + 99]}) for i in range(n_files)
    ]
    tbl = pa.table(
        {
            "path": pa.array(paths, type=pa.string()),
            "rg_bytes": pa.array(
                [[1024]] * n_files, type=pa.list_(pa.int64())
            ),
            "col_stats": pa.array(cs, type=pa.string()),
        }
    )
    pq.write_table(tbl, f"{root}/{name}", row_group_size=65536)
    manifest = {
        "version": 0,
        "mode": "append",
        "adds": [],
        "add_stats": {},
        "add_col_stats": {},
        "n_rows_added": 0,
        "schema": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "k",
                        "type": "long",
                        "nullable": True,
                        "metadata": {},
                    }
                ],
            }
        ),
        "n_files": n_files,
        "batch_id": None,
        "stream_id": None,
        "ledger": [],
        "files_parquet": name,
    }
    with open(f"{root}/_manifest.0.json", "w") as fh:
        json.dump(manifest, fh)
    with open(f"{root}/_latest.json", "w") as fh:
        json.dump({"version": 0}, fh)
    return root


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from time_series_spark_spark.session import get_spark
    from time_series_spark_spark.sources.io import (
        prune_files_by_stats,
        prune_files_kept_distributed,
    )

    spark = get_spark("stress_prune")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    # predicate keeps ~0.1% of files: k in the top 1/1000 of the range
    for n in sizes:
        root = build_table(n)
        lo, hi = n * 100 - n // 10, None
        t0 = time.perf_counter()
        kept_d, _ = prune_files_by_stats(root, 0, "k", lo, hi)
        t_driver = time.perf_counter() - t0
        # warm once (session/codegen), then time
        prune_files_kept_distributed(spark, root, 0, "k", lo, hi)
        t0 = time.perf_counter()
        kept_x = prune_files_kept_distributed(spark, root, 0, "k", lo, hi)
        t_dist = time.perf_counter() - t0
        assert kept_x == sorted(kept_d), "distributed ≠ driver kept set"
        print(
            json.dumps(
                {
                    "n_files": n,
                    "n_kept": len(kept_x),
                    "driver_plan_sec": round(t_driver, 3),
                    "distributed_plan_sec": round(t_dist, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
