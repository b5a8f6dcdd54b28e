"""UDF / UDAF / UDTF surface (SURVEY.md §2.L — the four kinds not already
exercised elsewhere in the engine).

Already covered elsewhere: L4 grouped-map (``operators/forecast.py``), L5
grouped-agg pandas UDAF (``queries_timeseries.geo_mean_grouped_udaf``), L6
cogrouped map (``operators/timeseries.asof_join_cogroup``), L7
``mapInPandas`` (``operators/llm.extract_multimodal_features``). This module
adds:

- **L1 row UDF** — kept as the single discouraged example: row-at-a-time
  Python, no Arrow batching, ~10-100× slower than the pandas kinds. Never
  use in a hot path; it exists so the surface is complete and so the test
  suite can demonstrate the equivalent built-in expression.
- **L2 scalar pandas UDF** — Arrow-vectorized series→series.
- **L3 iterator pandas UDF** — ``Iterator[pd.Series]→Iterator[pd.Series]``;
  amortizes per-batch setup (model/codec init happens once per partition,
  not once per batch) — the right shape for scoring with a broadcast model.
- **L8 Python UDTF** — table function usable via ``LATERAL`` in SQL.

100 TB note: every one of these runs in the Python worker behind an Arrow
(or pickle, for L1) boundary — Catalyst cannot push filters/pruning through
them (SURVEY.md §4.3), so callers must filter+project BEFORE applying them.
The query wrappers in ``queries_udfs.py`` follow that order.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType, IntegerType, StringType


# --------------------------------------------------------------------------
# L1: row-at-a-time Python UDF (the discouraged kind — one example only)
# --------------------------------------------------------------------------
def _band(value):
    # no type hints: PySpark tries to infer an Arrow eval type from row-UDF
    # annotations and emits a UserWarning it cannot
    if value is None:
        return None
    if value < 10.0:
        return "low"
    if value < 50.0:
        return "mid"
    return "high"


value_band_row_udf = F.udf(_band, StringType())

# The built-in expression every caller should use instead (identical result,
# stays inside whole-stage codegen):
def value_band_expr(col: str = "value"):
    c = F.col(col)
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c < 10.0, F.lit("low"))
        .when(c < 50.0, F.lit("mid"))
        .otherwise(F.lit("high"))
    )


# --------------------------------------------------------------------------
# L2: scalar pandas UDF (Arrow-vectorized series→series)
# --------------------------------------------------------------------------
@pandas_udf(IntegerType())
def token_count_pandas(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over an Arrow batch."""
    return text.str.split(" ").str.len().astype("int32")


# --------------------------------------------------------------------------
# L3: iterator pandas UDF (per-partition init amortization)
# --------------------------------------------------------------------------
@pandas_udf(DoubleType())
def embedding_norm_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """L2-norm of a fixed-dim embedding column.

    The iterator form exists to amortize expensive one-time setup across all
    Arrow batches of a partition; here the "setup" is trivial, but at scale
    this is where a scoring model would be deserialized exactly once per
    worker rather than once per batch.
    """
    # one-time per-partition setup would go here
    for s in batches:
        mat = np.stack(s.to_numpy()).astype(np.float64)  # (batch, dim)
        yield pd.Series(np.sqrt((mat * mat).sum(axis=1)))


# --------------------------------------------------------------------------
# L8: Python UDTF — table function, one row in → many rows out
# --------------------------------------------------------------------------
@udtf(returnType="pos int, shingle string")
class ShinglesUDTF:
    """Emit word k-gram shingles with positions for one document.

    Usable from SQL after ``spark.udtf.register("shingles", ShinglesUDTF)``:
    ``SELECT d.doc_id, s.* FROM docs d, LATERAL shingles(d.text, 3) s``.
    """

    def eval(self, text: str, k: int):  # noqa: D102
        toks = (text or "").split(" ")
        for i in range(len(toks) - k + 1):
            yield i, " ".join(toks[i : i + k])


# --------------------------------------------------------------------------
# L9: Arrow-optimized scalar UDF + mapInArrow + polymorphic UDTF (round 4)
# --------------------------------------------------------------------------
def vowel_count_arrow_udf():
    """Arrow-optimized scalar UDF (Spark 4 ``useArrow=True``): the same
    row-at-a-time Python signature as L1, but batched over Arrow instead
    of pickled row-by-row — the drop-in upgrade path for legacy row
    UDFs that cannot be rewritten as pandas UDFs. Still a pushdown
    barrier; still slower than builtins — used here only to pin the
    mechanism."""
    from pyspark.sql import functions as F

    @F.udf("int", useArrow=True)
    def vowels(s: str) -> int:
        return sum(1 for ch in (s or "") if ch in "aeiou")

    return vowels


def cents_map_in_arrow(df, value_col: str = "value"):
    """``mapInArrow``: batch-level transform on raw ``pyarrow``
    RecordBatches — no pandas conversion at all (the cheapest Python
    boundary Spark offers; right for columnar kernels that pyarrow.compute
    already implements). Adds ``cents = floor(value*100)`` (floor:
    identical semantics in pyarrow, Spark and DuckDB — round() ties
    differ across the three)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def add_cents(batches):
        for batch in batches:
            cents = pc.floor(
                pc.multiply(batch.column(batch.schema.get_field_index(value_col)), 100.0)
            ).cast(pa.int64())
            yield batch.append_column("cents", cents)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cents long"
    return df.mapInArrow(add_cents, out_schema)


def make_first_tokens_udtf():
    """Polymorphic Python UDTF (Spark 4 ``analyze()``): the OUTPUT SCHEMA
    is computed at plan time from the constant argument — ``
    first_tokens(text, 3)`` yields columns tok0..tok2. The analyze
    mechanism is what lets one UDTF serve any width without a DDL string
    per call site."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, udtf
    from pyspark.sql.types import StringType, StructType

    @udtf
    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    return FirstTokens


def user_stats_apply_in_arrow(df, key: str = "user_id", value: str = "value"):
    """L9d ``groupBy().applyInArrow``: per-group aggregation on a raw
    ``pyarrow.Table`` — the Arrow-native sibling of ``applyInPandas``
    (no pandas DataFrame construction per group). Demonstration only:
    these stats are builtins; the pattern matters for pyarrow-compute /
    numpy-on-arrow group kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(table: pa.Table) -> pa.Table:
        v = table.column(value)
        return pa.table(
            {
                key: [table.column(key)[0].as_py()],
                "n": [table.num_rows],
                "v_min": [pc.min(v).as_py()],
                "v_max": [pc.max(v).as_py()],
                "v_sum_cents": [
                    int(pc.sum(pc.floor(pc.multiply(v, 100.0))).as_py())
                ],
            }
        )

    return (
        df.select(key, value)
        .groupBy(key)
        .applyInArrow(
            stats, f"{key} long, n long, v_min double, v_max double, "
            "v_sum_cents long"
        )
    )


def jaro_winkler_pandas_udf():
    """Jaro-Winkler similarity as a vectorized pandas UDF (standard
    formulation: match window floor(max/2)-1, half-transpositions,
    Winkler prefix boost l<=4, p=0.1). Spark has no built-in JW; the
    DuckDB oracle checks this kernel against its NATIVE
    jaro_winkler_similarity — an independent reference implementation,
    not a mirrored formula."""
    import pandas as pd

    def jw(a: str, b: str) -> float:
        if a == b:
            return 1.0
        la, lb = len(a), len(b)
        if not la or not lb:
            return 0.0
        window = max(la, lb) // 2 - 1
        ma = [False] * la
        mb = [False] * lb
        m = 0
        for i in range(la):
            lo, hi = max(0, i - window), min(lb, i + window + 1)
            for j in range(lo, hi):
                if not mb[j] and a[i] == b[j]:
                    ma[i] = mb[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        j = 0
        for i in range(la):
            if ma[i]:
                while not mb[j]:
                    j += 1
                if a[i] != b[j]:
                    t += 1
                j += 1
        t //= 2
        jaro = (m / la + m / lb + (m - t) / m) / 3.0
        l = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            l += 1
        return jaro + l * 0.1 * (1.0 - jaro)

    @pandas_udf(DoubleType())
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([jw(x or "", y or "") for x, y in zip(a, b)])

    return jw_udf
