"""Physical-plan audit helpers (SURVEY.md §4 — the scale discipline).

The engine's 100 TB posture rests on properties of the *physical plan*, not
on code style: dims must broadcast, filters must reach the parquet scan,
scans must read only the projected columns, and grouped-UDF pipelines must
shuffle exactly once on their grouping keys. These helpers extract those
properties so tests can pin them — a regression that silently flips a
broadcast join to sort-merge or widens a scan to all columns fails CI here
long before it would fail a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE-planning) physical plan as text.

    Raises ``spark.sql.maxMetadataStringLength`` while rendering so
    FileScan metadata (PushedFilters / ReadSchema) is not truncated at the
    100-char default — the audit regexes below need the full lists.
    """
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "10000")
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(key, old)


def count_op(df: DataFrame, op: str) -> int:
    """Occurrences of a physical operator name in the executed plan."""
    return executed_plan(df).count(op)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached a parquet FileScan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of every parquet FileScan (column pruning
    evidence: a pruned scan lists only the referenced columns)."""
    return re.findall(r"ReadSchema: (struct<[^>]*)", executed_plan(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column-name sets actually read by each parquet scan."""
    out = []
    for s in read_schemas(df):
        body = s.removeprefix("struct<")
        cols = {
            part.split(":", 1)[0].strip()
            for part in body.split(",")
            if ":" in part
        }
        out.append(cols)
    return out
