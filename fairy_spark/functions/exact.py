"""Cross-engine exact arithmetic helpers (FIXTURES.md conventions).

The external correctness gate HASHES result values, so a cell that
matches the DuckDB oracle only within float tolerance is a failure.
Two hazards make naive double aggregation SF-dependent:

  * accumulation order — SUM(double) over different partitionings
    differs in the low bits once row counts are large enough;
  * ROUND midpoints — Spark rounds via BigDecimal HALF_UP, DuckDB via
    libm, and they disagree on values sitting exactly on a 10^-k edge.

Money columns in the test schema are fixed-point (2 decimals; products
with discount/tax have at most 4), so summing integer units is exact
and associative, and floor(x*1e6 + 0.5) is the same IEEE op sequence
on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def money_sum(expr: Column, unit: int = 10000) -> Column:
    """SF-independent exact money sum: round each row to fixed-point
    units, accumulate as BIGINT, divide back once. Oracle-side twin:
    ``SUM(CAST(ROUND(expr * unit) AS BIGINT)) / unit.0``."""
    return F.sum(F.round(expr * unit, 0).cast("bigint")) / float(unit)


def round6(expr: Column) -> Column:
    """Engine-agnostic 6-decimal rounding for quotients of exact
    values. Oracle-side twin:
    ``CAST(FLOOR(expr * 1000000 + 0.5) AS BIGINT) / 1000000.0``."""
    return F.floor(expr * 1000000 + F.lit(0.5)).cast("bigint") / 1000000.0
