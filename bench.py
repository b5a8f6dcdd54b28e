"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the 10 headline queries from BASELINE.md at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, using BASELINE.md's measurement protocol
(build the DataFrame once, one warm-up ``collect()``, then best-of-3
timed ``collect()`` runs per query — plan analysis and file listing are
warmed exactly as the baseline was measured), and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

The acceptance gate (BASELINE.json:2) is ≤2× the Spark column in
BASELINE.md at the same scale factor.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "rollup_orders",
    "window_running_rev",
    "topk_parts_per_brand",
    "events_hourly",
    "events_sessionize",
    "docs_dedup",
    "docs_lang_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from time_series_spark_spark.queries import REGISTRY
    from time_series_spark_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    for name in HEADLINE:
        df = REGISTRY[name].fn(spark, sf_dir)
        df.collect()  # warm-up: plan analysis, codegen, file listing
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_best_of_3",
                "value": round(sum(results.values()), 4),
                "unit": "sec",
                "queries": results,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
