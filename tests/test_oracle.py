"""The oracle gate, in-suite: every oracle-backed registered query runs in
Spark AND DuckDB at sf0.01 and must agree on row count, column names, and
an order-insensitive value multiset — a local replica of the driver's
CORRECTNESS check, so a regression in any query is caught by ``pytest``
instead of surfacing one round later in the driver run.

Marked ``slow``-ish by nature (~2-3 min for the full registry on
``local[4]``); run a subset with ``pytest tests/test_oracle.py -k name``.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import SF_DIR, compare, duck_connect  # noqa: E402

from time_series_spark_spark.queries import REGISTRY  # noqa: E402

_ORACLE_QUERIES = [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connect()
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle(spark, duck, name):
    q = REGISTRY[name]
    assert compare(
        spark, duck, name, q.fn, q.oracle, sf_dir=SF_DIR, verbose=False
    ), f"{name} diverged from its DuckDB oracle (run tests/oracle_harness.py {name} for the first diff)"
