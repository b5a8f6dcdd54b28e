"""Local replica of the driver's correctness gate (``__spark_entry__.py``):
run each registered query in Spark AND its oracle SQL in DuckDB at sf0.01,
compare row count, column names, and an order-insensitive value multiset.

Used by ``tests/test_oracle.py`` and runnable directly:
    python tests/oracle_harness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(spark, con, name, fn, sql, sf_dir=SF_DIR, verbose=True):
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    dres = con.execute(sql)
    dcols = [d[0] for d in dres.description]
    drows = dres.fetchall()

    problems = []
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
        problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
    if not problems:
        sn = _normalize(srows, [c.lower() for c in scols])
        dn = _normalize(drows, [c.lower() for c in dcols])
        if sn != dn:
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
            problems.append(
                f"values: {len(diffs)}/{len(sn)} rows differ; first: "
                f"spark={diffs[0][0]} duck={diffs[0][1]}" if diffs
                else "values: same rows, different multiset layout"
            )
    status = "OK " if not problems else "FAIL"
    if verbose:
        print(f"[{status}] {name} ({len(srows)} rows)")
        for p in problems:
            print(f"       {p}")
    return not problems


def main(argv):
    from time_series_spark_spark.queries import REGISTRY
    from time_series_spark_spark.session import get_spark

    spark = get_spark("oracle-harness")
    con = duck_connect()
    names = argv or list(REGISTRY)
    failed = []
    for name in names:
        q = REGISTRY[name]
        if q.oracle is None:
            n = q.fn(spark, SF_DIR).count()
            print(f"[ROWS] {name} ({n} rows, no oracle)")
            continue
        if not compare(spark, con, name, q.fn, q.oracle):
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
