"""Targeted driver-faithful check: run the named queries the way the
grading driver does (oracle-backed -> dtype-strict DuckDB compare;
rows-only -> execute + _canon) at one scale.

Usage:
    python scripts/check_queries.py <sf_dir> name [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from oracle_harness import _canon, compare, duck_connect  # noqa: E402

from time_series_spark_spark.queries import REGISTRY  # noqa: E402
from time_series_spark_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("check_queries", master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(sf_dir)
    bad = []
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            if q.oracle is not None:
                ok = compare(spark, con, name, q.fn, q.oracle, sf_dir=sf_dir)
            else:
                pdf = q.fn(spark, sf_dir).toPandas()
                _canon(pdf)
                ok = len(pdf) > 0
            print(
                f"[{'OK ' if ok else 'BAD'}] {name} "
                f"({'oracle' if q.oracle is not None else 'rows-only'}, "
                f"{time.time() - t0:.1f}s)",
                flush=True,
            )
            if not ok:
                bad.append(name)
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"[ERR] {name}: {type(e).__name__}: {e}", flush=True)
    print(f"CHECK {sf_dir}: {len(names) - len(bad)}/{len(names)} ok BAD={bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
