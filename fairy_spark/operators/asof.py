"""As-of join — latest right row at-or-before each left row's timestamp.

Spark has no native ASOF JOIN (SURVEY.md §2.B joins; risk register §7.1).
Two standard encodings:

1. **Union + last-non-null window** (implemented here, the scale path):
   tag both sides, union, and for each left row take the last right
   value in a (keys, time)-ordered window. ONE shuffle on (keys), no
   join explosion, no per-row range probe — at 100 TB this is a single
   sort-merge pass, which is exactly how dedicated engines execute ASOF.
2. Range join + row_number — O(candidate pairs), blows up when many
   right rows precede each left row. Not used.

Tie rule matches DuckDB ASOF (`right.ts <= left.ts`): a right row at
exactly the left timestamp wins, encoded by sorting right (side=0)
before left (side=1) at equal ts. Right rows must be unique per
(keys, ts) for determinism — pre-aggregate if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row, annotated with ``value_cols``
    from the latest right row with ``right_ts <= left_ts`` (per keys).
    Left rows keep all their columns; unmatched rows get nulls."""
    lcols = left.columns
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
    )
    for v in value_cols:
        l = l.withColumn(f"__v_{v}", F.lit(None).cast(right.schema[v].dataType))
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
    )
    for c in lcols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.select(
        *lcols, "__ts", "__side", *[f"__v_{v}" for v in value_cols]
    ).unionByName(r.select(*lcols, "__ts", "__side", *[f"__v_{v}" for v in value_cols]))

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        *[F.last(f"__v_{v}", ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
