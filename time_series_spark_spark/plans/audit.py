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


def _tree_depth(line: str) -> int:
    """Column where a plan-tree node's name starts (tree-drawing prefix
    length). Children render strictly deeper than their parent, which is
    all the subtree extraction below relies on."""
    m = re.match(r"^[\s:+|-]*", line)
    return m.end()


def rowscale_single_partition_exchanges(df: DataFrame) -> list[str]:
    """``Exchange SinglePartition`` nodes whose subtree reads a row-scale
    source with NO aggregate in between — the §4.3 scale-killer shape (a
    global unpartitioned window/sort funneling every row through one
    task).

    A single-partition exchange is legitimate when it feeds on an already
    -reduced frame: the final stage of a global aggregate, the bounded
    per-partition summary frame of the ``operators/rank.py`` two-pass
    construction (≤ #partitions rows), a ``WindowGroupLimit`` partial
    (per-partition top-k-with-ties pre-filter — only ~k rows per input
    partition cross), or a ``LocalLimit`` (≤ limit rows per partition
    cross). Those subtrees always contain one of the reducer operators
    below; a subtree that reaches a file scan without ANY reducer is
    funneling raw rows and gets flagged. Returns the offending plan
    lines (empty list = scale-clean).
    """
    lines = executed_plan(df).splitlines()
    bad: list[str] = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        d = _tree_depth(line)
        sub: list[str] = []
        for j in range(i + 1, len(lines)):
            if _tree_depth(lines[j]) <= d:
                break
            sub.append(lines[j])
        subtxt = "\n".join(sub)
        has_scan = (
            "Scan parquet" in subtxt
            or "FileScan" in subtxt
            or "Scan ExistingRDD" in subtxt
        )
        has_reducer = (
            "HashAggregate" in subtxt
            or "SortAggregate" in subtxt
            or "ObjectHashAggregate" in subtxt
            or "WindowGroupLimit" in subtxt
            or "LocalLimit" in subtxt
        )
        if has_scan and not has_reducer:
            bad.append(line.strip())
    return bad


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
