"""Vector/embedding column helpers (SURVEY.md §2.I array ops, K3/K4).

All JVM-side: higher-order array functions (``zip_with`` + ``aggregate``)
keep dot products inside whole-stage codegen — no Python worker round-trip
per row. Inputs are column *names* (the helpers build SQL expressions).
Float arrays are widened to double first so cross-engine comparisons are
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: str) -> str:
    return f"transform({col}, x -> cast(x AS double))"


def dot_expr(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v)"


def sq_norm_expr(a: str) -> str:
    return f"aggregate({a}, 0D, (s, x) -> s + x * x)"


def dot(a: str, b: str) -> Column:
    return F.expr(dot_expr(as_double(a), as_double(b)))


def norm(a: str) -> Column:
    return F.sqrt(F.expr(sq_norm_expr(as_double(a))))


def cosine(a: str, b: str) -> Column:
    """cosine(a, b) = <a,b> / (|a|·|b|) — matches
    DuckDB ``list_inner_product(a,b)/ (sqrt(..)*sqrt(..))`` to fp tolerance."""
    ad, bd = as_double(a), as_double(b)
    return F.expr(dot_expr(ad, bd)) / (
        F.sqrt(F.expr(sq_norm_expr(ad))) * F.sqrt(F.expr(sq_norm_expr(bd)))
    )


def unit_normalize(col: str) -> Column:
    """Scale to unit L2 norm (zero vectors pass through unchanged)."""
    d = as_double(col)
    n = f"sqrt({sq_norm_expr(d)})"
    return F.expr(
        f"CASE WHEN {n} = 0D THEN {d} "
        f"ELSE transform({d}, x -> x / {n}) END"
    )
