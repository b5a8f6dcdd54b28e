"""Build an Nx stress corpus from sf0.1 and time the expensive queries.

Usage:
    python scripts/stress10x.py build [N]       # /tmp/stress{N}x/*.parquet
    python scripts/stress10x.py run [N] q21 ... # ratio vs sf0.1 at Nx

N defaults to 10 (the round-6 protocol); round 9 adds N=100 so the
"would the plan survive 100x?" grade rests on a MEASURED order of
magnitude, not extrapolation (round-7 verdict item 3). lineitem at
100x is 60M rows / ~1 GB parquet -- small enough to build in minutes,
big enough that a super-linear plan (all-pairs candidate blowup,
driver-side collect, single-task window) shows up unmistakably.

Scaling model (the round-1 protocol, now checked in): facts are
replicated Nx with consistently shifted keys, dims stay 1x --
the realistic shape where data grows but the schema doesn't.

- documents: doc_id shifted per replica; replicas r>0 get a distinct
  'r{r} ' prefix token (n_chars recomputed) so near-dup structure grows
  linearly (10x blocks of the same size) instead of degenerating into
  100-way identical clusters.
- embeddings: vec_id shifted; vectors jittered with seeded N(0, 0.02) so
  replicas are near but not identical (semantic-dedup input grows 10x
  with realistic cluster structure).
- events: user_id/event_id shifted per replica -> 10x series, same
  per-series density (stream state and packed-UDF batches scale by key
  count, the dimension that matters).
- lineitem/orders: orderkey shifted per replica; supplier/customer/part
  keys unshifted so dims stay 1x and per-dim fact fan-in grows 10x.
- region/nation/supplier/customer/part: copied 1x.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

SRC = Path("/root/testdata/sf0.1")
SHIFT = 10_000_000
REPLICAS = 10  # overridden by the optional [N] CLI arg


def out_dir() -> Path:
    return Path(f"/tmp/stress{REPLICAS}x")


def build() -> None:
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    OUT = out_dir()
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def rep(sql: str, table: str) -> None:
        parts = [
            sql.format(src=SRC / f"{table}.parquet", r=r) for r in range(REPLICAS)
        ]
        q = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({q}) TO '{OUT / (table + '.parquet')}' (FORMAT PARQUET)"
        )

    rep(
        "SELECT doc_id + CAST({r} AS BIGINT) * 10000000 AS doc_id, "
        "CASE WHEN {r} = 0 THEN text ELSE 'r{r} ' || text END AS text, "
        "lang, source, "
        "CAST(length(CASE WHEN {r} = 0 THEN text ELSE 'r{r} ' || text END) "
        "AS BIGINT) AS n_chars "
        "FROM '{src}'",
        "documents",
    )
    rep(
        "SELECT event_id + CAST({r} AS BIGINT) * 100000000 AS event_id, ts, "
        "user_id + CAST({r} AS BIGINT) * 10000000 AS user_id, event_type, value, props "
        "FROM '{src}'",
        "events",
    )
    rep(
        "SELECT * REPLACE (l_orderkey + CAST({r} AS BIGINT) * 10000000 AS l_orderkey) "
        "FROM '{src}'",
        "lineitem",
    )
    rep(
        "SELECT * REPLACE (o_orderkey + CAST({r} AS BIGINT) * 10000000 AS o_orderkey) "
        "FROM '{src}'",
        "orders",
    )

    emb = pq.read_table(SRC / "embeddings.parquet").to_pandas()
    frames = []
    for r in range(REPLICAS):
        rng = np.random.RandomState(1000 + r)
        E = np.array(emb["embedding"].tolist(), dtype=np.float32)
        if r > 0:
            E = E + rng.normal(0, 0.02, E.shape).astype(np.float32)
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": emb["vec_id"].to_numpy() + r * SHIFT,
                    "embedding": list(E),
                    "label": emb["label"].to_numpy(),
                }
            )
        )
    out = pd.concat(frames, ignore_index=True)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    # row_group_size matters: parquet splits only at row-group boundaries,
    # and pyarrow's default (1M rows) would put the whole 100x corpus in
    # ONE row group — every Spark scan of it becomes a single task (the
    # round-9 pq_topk profile measured an 80 s one-task sample read).
    # DuckDB's COPY (the fact tables) already writes ~122K-row groups.
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema),
        OUT / "embeddings.parquet",
        row_group_size=10_000,
    )

    for t in ("region", "nation", "supplier", "customer", "part"):
        shutil.copy(SRC / f"{t}.parquet", OUT / f"{t}.parquet")
    print("built", OUT)


def run(names: list[str]) -> None:
    import os

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from time_series_spark_spark.queries import REGISTRY
    from time_series_spark_spark.session import get_spark

    # STRESS_COUNT_ONLY=1: materialize via .count() instead of
    # .toPandas() — for pair-emitting queries whose OUTPUT grows
    # quadratically in the replica count (every replica of a doc is a
    # true near-dup of every other), driver-side pandas materialization
    # of tens of millions of result rows would dominate the measurement;
    # count() keeps the full distributed compute and drops only the
    # driver funnel no pipeline would do with such a result anyway.
    count_only = os.environ.get("STRESS_COUNT_ONLY") == "1"
    spark = get_spark("stress10x")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = REGISTRY[name].fn
        row = {"query": name}
        for label, d in (
            ("sf0.1", str(SRC)),
            (f"{REPLICAS}x", str(out_dir())),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, d)
                n = df.count() if count_only else len(df.toPandas())
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 3)
            row[f"n_{label}"] = n
        row["ratio"] = round(row[f"{REPLICAS}x"] / row["sf0.1"], 2)
        print(row)


if __name__ == "__main__":
    argv = sys.argv[1:]
    cmd = argv.pop(0)
    if argv and argv[0].isdigit():  # optional replica count
        REPLICAS = int(argv.pop(0))
    if cmd == "build":
        build()
    elif cmd == "run":  # usage: `run [N] q1 q2 ...`
        run(argv)
    else:
        run([cmd] + argv)
