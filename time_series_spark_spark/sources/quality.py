"""Pipeline data-quality instrumentation and data layout (round 2).

Two production patterns a 100 TB deployment needs around the engine:

- **Observed metrics** (`observe_quality` / `check_quality`): row counts,
  null rates, and bounds collected as a SIDE EFFECT of the main action
  via ``pyspark.sql.Observation`` — the metrics ride the existing scan
  inside whole-stage codegen, so a quality gate costs zero extra jobs.
  The anti-pattern this replaces (a separate ``df.count()`` /
  ``df.filter(bad).count()`` pass per check) doubles the I/O of every
  pipeline stage at scale.

- **Morton (Z-order) layout** (`write_parquet_zorder`): sort rows by the
  bit-interleaving of two integer dimensions before writing, so parquet
  row-group min/max stats are tight on BOTH columns and scans filtering
  on either dimension (or both) skip most files. This is the published
  multi-dimensional-clustering technique (Morton 1966; the layout layer
  of Delta/Iceberg OPTIMIZE ZORDER) expressed with plain codegen bit
  arithmetic + ``sortWithinPartitions`` — no table format required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    cols: list[str],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach standard quality metrics to ``df``: total rows plus a null
    count per column. Metrics materialize when the caller runs ANY action
    on the returned frame — no extra scan. Read them from
    ``observation.get`` afterwards."""
    obs = Observation(name)
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs


def check_quality(
    observation: Observation,
    max_null_frac: float = 0.0,
    min_rows: int = 1,
) -> dict:
    """Evaluate the gate AFTER the action ran. Returns the metric dict;
    raises ``ValueError`` naming every violated check (fail the pipeline
    loudly, not by silently writing bad data)."""
    got = observation.get
    problems = []
    n = got["n_rows"]
    if n < min_rows:
        problems.append(f"n_rows={n} < min_rows={min_rows}")
    for k, v in got.items():
        if k.startswith("nulls_") and n and (v / n) > max_null_frac:
            problems.append(f"{k}={v} ({v / n:.2%} > {max_null_frac:.2%})")
    if problems:
        raise ValueError("quality gate failed: " + "; ".join(problems))
    return got


def morton_key(a: Column, b: Column, bits: int = 21) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Z-order key (a₀b₀a₁b₁…, LSB first). Pure codegen
    bit arithmetic; 21+21 bits fit a long. Values are masked to the bit
    budget — callers should pre-scale dimensions into range (e.g. days
    since epoch, bucketed ids)."""
    mask = (1 << bits) - 1
    a = a.cast("long").bitwiseAND(F.lit(mask))
    b = b.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            a.bitwiseAND(F.lit(1 << i)) * F.lit(1 << i)
        ).bitwiseOR(b.bitwiseAND(F.lit(1 << i)) * F.lit(1 << (i + 1)))
    return key


def write_parquet_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 21,
) -> None:
    """Write ``df`` as parquet clustered by the Morton key of
    (``col_a``, ``col_b``): range-partition by the key (so each output
    file owns a compact Z-curve segment), sort within partitions, write.
    Row-group min/max on BOTH columns become tight, and a reader
    filtering on either column prunes most files via footer stats alone.
    """
    keyed = df.withColumn(
        "__z", morton_key(F.col(col_a), F.col(col_b), bits)
    )
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profiling report for numeric columns — the dataset-card /
    expectation-suite input: one output row per column with row count,
    null count, exact distinct count, min, max, and mean (round-6, all
    double so the frame is homogeneous).

    One wide aggregation over a single scan (Catalyst plans the multiple
    COUNT(DISTINCT)s via one expand — still one pass over the data), then
    a stack() melt of the 1-row result: the melt touches |cols| rows, so
    profiling cost is scan-bound regardless of table size.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.round(F.min(c).cast("double"), 6).alias(f"__mn_{c}"),
            F.round(F.max(c).cast("double"), 6).alias(f"__mx_{c}"),
            F.round(F.avg(F.col(c).cast("double")), 6).alias(f"__av_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}, __av_{c}"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, n_rows, n_null, n_distinct, vmin, vmax, vavg)"
        )
    )


def plan_compaction(
    file_sizes: list[tuple[str, int]], target_bytes: int
) -> list[tuple[str, int, int]]:
    """A10 (round 5): small-file compaction plan — first-fit-decreasing
    bin-pack of data files into merge groups of ≤ ``target_bytes``.

    Pure metadata planning: the input is (path, bytes) from a listing /
    parquet footers (n_files rows, no data scan), the output is
    (path, group_id, bytes) assignments. Files are considered largest
    first with a path tiebreak, so the plan is deterministic for a given
    listing; a single file larger than the target gets its own group
    (compaction never splits files). The EXECUTION of a group is one
    ``spark.read.parquet(paths).coalesce(1).write`` per group — an
    embarrassingly parallel job per group, which is why the planner only
    needs to emit assignments.
    """
    bins: list[int] = []  # remaining capacity per group
    out: list[tuple[str, int, int]] = []
    for path, size in sorted(file_sizes, key=lambda x: (-x[1], x[0])):
        placed = None
        for g, free in enumerate(bins):
            if size <= free:
                placed = g
                break
        if placed is None:
            bins.append(target_bytes)
            placed = len(bins) - 1
        bins[placed] -= size
        out.append((path, placed, size))
    return out


def check_constraints(
    df: DataFrame,
    checks: list[tuple[str, str, float]],
) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ
    ``VerificationSuite`` shape): ``checks`` is a list of
    ``(name, sql_predicate, min_pass_ratio)``; every predicate is
    evaluated as a conditional aggregate in ONE scan of ``df`` — adding a
    check adds a counter, never a pass — and the report has one row per
    check: rows, passes, pass ratio (6dp), and the verdict against its
    threshold.

    Predicates are row-level SQL boolean expressions (NULL counts as a
    failure, as Deequ does). Cross-table checks (referential integrity)
    don't fit a single-scan aggregate — run them as their own anti-join
    count and union the report rows.
    """
    aggs = []
    for name, pred, _ in checks:
        aggs.append(
            F.sum(
                F.when(F.expr(pred), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__pass_{name}")
        )
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*aggs)
    reports = []
    for name, _, min_ratio in checks:
        reports.append(
            row.select(
                F.lit(name).alias("check_name"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__pass_{name}").cast("long").alias("n_pass"),
                F.round(F.col(f"__pass_{name}") / F.col("__n"), 6).alias(
                    "pass_ratio"
                ),
                (
                    F.col(f"__pass_{name}") / F.col("__n") >= F.lit(min_ratio)
                ).alias("passed"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out
