"""Registry-wide physical-plan audit: flag any registered query whose
plan funnels a row-scale (un-aggregated) source through an
``Exchange SinglePartition`` — the §4.3 scale-killer the round-7 rank
rewrite eliminated from the six queries the round-6 verdict marked weak.

Usage:
    python scripts/plan_audit.py [sf_dir]   # default /root/testdata/sf0.001

Builds every query's plan (sf0.001 so eager-construction queries — BPE,
k-means, boundary collects — stay cheap) and prints one line per flagged
plan plus a summary. Streaming queries EXECUTE on construction by design
(availableNow replay); they are audited too — their materialized result
plans are bounded aggregates, so a flag there is just as real.

Exit code 1 if anything is flagged.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from time_series_spark_spark.plans.audit import (  # noqa: E402
    rowscale_single_partition_exchanges,
)
from time_series_spark_spark.queries import REGISTRY  # noqa: E402
from time_series_spark_spark.session import get_spark  # noqa: E402

# Bounded-by-construction exceptions the textual detector cannot see —
# each one's single-partition exchange carries a frame whose size is
# bounded by something other than an aggregate node:
ALLOWLIST = {
    # the exchange carries per-partition FD sketch PARTIALS (one l x d
    # matrix per input partition, emitted by the MapInPandas _partial
    # stage) — #partitions * l rows at any data scale
    "emb_frequent_directions",
    # the exchange carries the foreachBatch micro-batch DECISION LOG
    # (one row per micro-batch) — the SPRT fold is sequential by
    # definition and its input is batch-count-bounded
    "stream_sprt_ab_decision",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    flagged, errs, n_ok = [], [], 0
    t0 = time.time()
    for name, q in REGISTRY.items():
        try:
            bad = rowscale_single_partition_exchanges(q.fn(spark, sf_dir))
            if bad and name in ALLOWLIST:
                n_ok += 1
                print(f"[ALLOW] {name} (bounded by construction)", flush=True)
            elif bad:
                flagged.append(name)
                print(f"[FLAG] {name}: {bad[0]}", flush=True)
            else:
                n_ok += 1
        except Exception as e:  # noqa: BLE001 — report and continue
            errs.append(name)
            print(f"[ERR] {name}: {type(e).__name__}: {e}", flush=True)
    print(
        f"PLAN AUDIT {sf_dir}: {n_ok}/{len(REGISTRY)} clean "
        f"in {time.time() - t0:.0f}s FLAGGED={flagged} ERR={errs}",
        flush=True,
    )
    return 1 if flagged or errs else 0


if __name__ == "__main__":
    sys.exit(main())
