"""Local replica of the driver's correctness gate (``__spark_entry__.py``):
run each registered query in Spark AND its oracle SQL in DuckDB at sf0.01 and
compare them the way the driver does — as **pandas frames, dtype-strictly**.

Why pandas + dtypes (round-3 postmortem): the driver canonicalizes both
results to pandas (Spark ``toPandas()``, DuckDB ``fetchdf()``), sorts columns
by name, sorts rows by all columns, then hashes the values. Equal values in
different dtypes (DuckDB ``sum(BIGINT)`` → HUGEINT → float64 vs Spark int64)
hash DIFFERENTLY, and unhashable cells (numpy arrays) crash its canonicalizer.
The previous harness rounded floats and coerced ints to float, so all three
round-3 driver failures were local-green. This version is strict:

- pandas dtype must match per column;
- integer / bool / string / timestamp values must match exactly;
- float values must match exactly (both engines are required by the dialect
  rules to round fp aggregates in-query — see queries.py module docstring);
- a cell the driver cannot hash (array/struct) is an error, not a pass.

Used by ``tests/test_oracle.py`` and runnable directly:
    python tests/oracle_harness.py [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

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


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver's canonicalizer: lowercase + name-sorted columns,
    rows sorted by every column. Raises (like the driver) on unhashable
    cells such as numpy arrays."""
    pdf = pdf.rename(columns=str.lower)
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        # Normalizations calibrated against driver-GREEN queries (the hash
        # behaves like a stringification of values):
        # - datetime64[ns] (Spark) vs [us] (DuckDB): NOT a driver mismatch
        #   (events_hourly, asof_*, time_range_frame_3d all driver-green
        #   with timestamp columns) → normalize units;
        # - int32 vs int64 width: NOT a driver mismatch (window_running_rev,
        #   corpus_stats_report, string_funcs_nation etc. driver-green with
        #   Spark int32 rank/length vs DuckDB int64) → normalize to int64;
        # - int vs float KIND: IS a driver mismatch ('5' != '5.0' — the
        #   round-3 HUGEINT→float64 failures) → kept strict, never coerced.
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pdf[c].dtype == object and len(pdf):
            # array/struct/map cells crash the driver canonicalizer
            # (unhashable numpy.ndarray — the round-3 multimodal ERR);
            # pandas' single-key sort path does NOT raise on them, so
            # detect explicitly instead of relying on sort_values.
            v = pdf[c].iloc[0]
            if isinstance(v, (list, dict, np.ndarray)):
                raise TypeError(
                    f"column {c!r} holds {type(v).__name__} cells — the "
                    "driver cannot hash these; serialize to a string"
                )
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def _col_equal(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Element-wise exact equality with NaN/None == NaN/None."""
    both_na = a.isna().to_numpy() & b.isna().to_numpy()
    with np.errstate(invalid="ignore"):
        eq = (a == b).fillna(False).to_numpy()
    return eq | both_na


def compare(spark, con, name, fn, sql, sf_dir=SF_DIR, verbose=True):
    sdf = fn(spark, sf_dir)
    spd = sdf.toPandas()
    dpd = con.execute(sql).fetchdf()

    problems = []
    try:
        spd = _canon(spd)
    except TypeError as e:
        problems.append(f"spark result not canonicalizable (driver ERR): {e}")
    try:
        dpd = _canon(dpd)
    except TypeError as e:
        problems.append(f"oracle result not canonicalizable (driver ERR): {e}")
    if problems:
        _report(name, 0, problems, verbose)
        return False

    if list(spd.columns) != list(dpd.columns):
        problems.append(
            f"schema: spark={list(spd.columns)} duck={list(dpd.columns)}"
        )
    if len(spd) != len(dpd):
        problems.append(f"rowcount: spark={len(spd)} duck={len(dpd)}")
    if not problems:
        for c in spd.columns:
            if spd[c].dtype != dpd[c].dtype:
                problems.append(
                    f"dtype[{c}]: spark={spd[c].dtype} duck={dpd[c].dtype}"
                    " (equal values would still hash-mismatch)"
                )
        for c in spd.columns:
            if spd[c].dtype != dpd[c].dtype:
                continue
            ok = _col_equal(spd[c], dpd[c])
            if not ok.all():
                i = int(np.flatnonzero(~ok)[0])
                problems.append(
                    f"values[{c}]: {int((~ok).sum())}/{len(ok)} differ; "
                    f"first at row {i}: spark={spd[c].iloc[i]!r} "
                    f"duck={dpd[c].iloc[i]!r}"
                )
    _report(name, len(spd), problems, verbose)
    return not problems


def _report(name, nrows, problems, verbose):
    if verbose:
        status = "OK " if not problems else "FAIL"
        print(f"[{status}] {name} ({nrows} rows)")
        for p in problems:
            print(f"       {p}")


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
            try:
                pdf = _canon(q.fn(spark, SF_DIR).toPandas())
                print(f"[ROWS] {name} ({len(pdf)} rows, no oracle)")
            except TypeError as e:
                print(f"[FAIL] {name} rows-only canon crash (driver ERR): {e}")
                failed.append(name)
            continue
        if not compare(spark, con, name, q.fn, q.oracle):
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
