"""Generate PLANS.md: the formatted physical plans of the headline bench
queries plus the round-5 scale-notable ones, each with the property that
makes it the RIGHT plan at 100 TB (these same properties are pinned as
assertions in tests/test_plans.py — this file is the human-readable
evidence, regenerated per round).

Usage: python scripts/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from time_series_spark_spark.queries import REGISTRY  # noqa: E402
from time_series_spark_spark.session import get_spark  # noqa: E402

# query -> why the plan shape is the one you'd want at scale
ANNOTATED = {
    "q1_pricing_summary": "filters reach the parquet scan (PushedFilters), "
    "unused columns pruned (ReadSchema), one partial+final hash aggregate "
    "pair — the whole query is two codegen stages around one exchange.",
    "q3_top_revenue_orders": "both dimension joins are BroadcastHashJoin "
    "(no fact shuffle for the joins); the top-k is TakeOrderedAndProject, "
    "never a global sort.",
    "q5_nation_revenue": "star joins broadcast every dimension; the fact "
    "table is scanned once and shuffles only for the final aggregate.",
    "window_running_rev": "single hash exchange on the window partition "
    "key; the running sum runs inside one Window operator on that "
    "partitioning.",
    "events_sessionize": "sessionize + session aggregate reuse ONE "
    "hash(user_id) exchange (HashPartitioning satisfies the superset "
    "clustering) — one shuffle + one sort end to end.",
    "docs_dedup": "dedup counts come from one hash aggregate over the "
    "normalized-text hash; no window, no join.",
    "events_bollinger_daily": "two-phase: high-cardinality (type, day) "
    "exchange for the raw reduce, then the window moves only the bounded "
    "daily frame.",
    "session_top_paths": "sessionize window, per-session row_number, and "
    "the (user, session) path aggregate all run on the single "
    "hash(user_id) exchange; only per-path counts shuffle again.",
    "docs_vocab_coverage": "the bounded top-512 vocab is a "
    "TakeOrderedAndProject broadcast into the probe join — the token "
    "stream never shuffles for the join.",
    "orders_lineitem_ams_join_size": "raw rows reduce to per-key counts "
    "first (map-side combine); only distinct keys fan out x256, and the "
    "256-row partials merge by addition.",
    "geo_radius_pairs": "the neighbor-cell replication is split by "
    "axis (probe fans to 3 lat-neighbor cells, build to 3 "
    "lon-neighbor cells — 3N+3N rows instead of the one-sided 3x3's "
    "9N+N) on a pruned (key, coords, cell) projection with filters "
    "already pushed to the scan; ONE equi-join on the cell id "
    "generates candidates bounded per cell (72k distance evaluations "
    "vs 4.6M naive at sf0.1); the haversine runs entirely in "
    "whole-stage codegen.",
    "events_bootstrap_ci": "the 200-replicate explode is map-side only: "
    "partial aggregation combines to (type, replicate) cells BEFORE the "
    "exchange, so the shuffle carries ~types*200 rows, never raw*200; "
    "the md5 weight ladder is pure codegen.",
    # round-6 flagships
    "part_item_item_recs": "the basket self-join is a hash EQUI-join on "
    "the order key (pair mass = sum(basket^2), linear in orders); both "
    "item-count joins broadcast; the top-3 is a per-item window over "
    "the already-reduced pair counts — no nested-loop anywhere.",
    "events_debounce_user_type": "lag window, running burst-id, and BOTH "
    "aggregates all run on ONE hash((user,type)) exchange (superset-"
    "clustering reuse); the only other exchange is the presentation "
    "sort.",
    "events_compression_report": "both lag passes and the final "
    "aggregate share ONE hash(event_type) exchange; bit arithmetic "
    "(bin/length/xor) is whole-stage codegen; the shuffle carries the "
    "pruned 4-column projection.",
    "forecast_user_events": "densified shared grid -> the packed "
    "MapInPandas fits ALL users as one multi-RHS ridge solve; exactly "
    "two exchanges (fine-grained (user,day) reduce with map-side "
    "combine, then regroup of the AGGREGATED series by user).",
    "supplier_cosupply_sssp": "four unrolled relaxation rounds, each a "
    "vertex-partitioned hash join + min reduce, in ONE declarative "
    "plan — no driver-side convergence scalar, so AQE plans the whole "
    "expansion.",
    "customers_rfm_segments": "round-7 rewrite: each quintile score is "
    "the operators/rank.py two-pass — hash exchange on the frozen "
    "value-bucket id (NO Exchange SinglePartition over raw rows), "
    "per-bucket window, broadcast of the bounded offset frame; the "
    "only single-partition exchanges left sit above aggregates.",
    "orders_price_decile_bins": "round-7 rewrite: the global decile "
    "rank is bucket-local row_number + broadcast offsets; the scan is "
    "2 columns, the wide exchange carries (cents, bucket) only, and "
    "binning is exact BIGINT div in codegen.",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("gen_plans", master="local[4]", shuffle_partitions=4)
    out = [
        "# PLANS — physical-plan evidence for the headline queries",
        "",
        f"Generated by `scripts/gen_plans.py` at `{sf_dir}` "
        "(plan SHAPES are scale-independent; sizes in the snippets are "
        "test-scale). The same properties are pinned as assertions in "
        "`tests/test_plans.py`, so a regression fails CI before it ships.",
        "",
    ]
    for name, why in ANNOTATED.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # strip volatile ids for readability, keep operator structure
        plan = re.sub(r"#\d+L?", "", plan)
        lines = plan.splitlines()
        if len(lines) > 40:
            lines = lines[:40] + [f"... ({len(lines) - 40} more lines)"]
        out += [
            f"## {name}",
            "",
            f"**Why this is the plan you want:** {why}",
            "",
            "```",
            *lines,
            "```",
            "",
        ]
    Path("PLANS.md").write_text("\n".join(out))
    print(f"PLANS.md: {len(ANNOTATED)} annotated plans")
    return 0


if __name__ == "__main__":
    sys.exit(main())
