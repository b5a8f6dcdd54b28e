"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — one entry per implemented SURVEY.md §2 operator.
``oracle_sql()`` — matching DuckDB SQL for the sf0.01 correctness gate.

The real implementations live in the ``time_series_spark_spark`` package;
this module only adapts them to the driver's calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from time_series_spark_spark import queries as _registry
from time_series_spark_spark.session import ensure_engine_conf


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-series additive-model
    forecast (the reference's core capability). Driver checks rows>0."""
    ensure_engine_conf(spark)
    return _registry.REGISTRY["forecast_daily_revenue"].fn(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    fns = _registry.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_engine_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in fns.items()}


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
