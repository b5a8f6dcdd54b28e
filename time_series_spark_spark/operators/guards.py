"""Runtime BIGINT-validity guards for the integer-exact statistics.

The cross-engine exactness discipline (queries_quant.py module doc)
holds deviations and power sums in BIGINT so Spark and DuckDB agree
bit-for-bit — but the two engines DIVERGE past 2^63: non-ANSI Spark
wraps silently while DuckDB promotes to HUGEINT, which would surface
exactly at the 100 TB scale this engine advertises. Docstrings state
each family's validity bound; this module ENFORCES them: the guard
rides inside a result expression, so when the bound is exceeded the
query raises a SparkRuntimeException naming the bound instead of
returning silently wrong integers.

Design notes:
- the guard magnitude is a DOUBLE estimate built from the same count
  aggregates the query already computes (no extra scan, no extra job);
- ``F.assert_true`` returns NULL when the condition holds, so
  ``value + coalesce(cast(assert, long), 0)`` is arithmetically the
  identity — and because the probe FEEDS the result column, Catalyst
  cannot prune it the way it would a dangling asserted column;
- the threshold sits at 9.0e18 (just under 2^63 ≈ 9.223e18) to absorb
  the double rounding of the magnitude estimate itself.

Tests plant over-bound inputs by shrinking ``_BIGINT_SAFE`` via
monkeypatch and asserting the real queries trip (tests/test_quant.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# just under 2^63, with margin for the double magnitude estimate
_BIGINT_SAFE = 9.0e18


def bigint_bound(value: Column, magnitude: Column, what: str) -> Column:
    """``value``, plus a runtime assertion that ``magnitude`` (a DOUBLE
    upper estimate of the largest BIGINT intermediate the pipeline
    produces) stays below 2^63.

    Arithmetically the identity while the bound holds (``+ 0`` of the
    value's own type family: long stays long, double stays double);
    raises at execution time with a message naming the violated bound
    otherwise. Attach to ONE output column per query — the whole result
    evaluates in the same job, so one tripped probe fails the query.
    """
    probe = F.coalesce(
        F.assert_true(
            magnitude < F.lit(_BIGINT_SAFE),
            F.lit(
                f"BIGINT validity bound exceeded: {what} >= 2^63 — "
                "Spark would wrap silently where DuckDB promotes to "
                "HUGEINT; recompute this statistic with DECIMAL(38,0)/"
                "double intermediates at this scale"
            ),
        ).cast("long"),
        F.lit(0),
    )
    return value + probe
