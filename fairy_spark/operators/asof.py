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
before left (side=1) at equal ts. DUPLICATE right rows per (keys, ts)
resolve deterministically: the greatest row under the value-column
tuple (ascending nulls-first sort → last wins), a total order, so the
winner can't depend on partition/plan order. The extra sort keys ride
the window's existing (keys)-partitioned sort — no new shuffle.
Caveat: value columns must be orderable, and a duplicate-ts right row
holding NULL in some value column can mix per-column with its
neighbor (last-non-null is per column) — keep duplicate-ts rows fully
populated or pre-aggregate.
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
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            # deterministic tie-break among duplicate-(keys, ts) right
            # rows: greatest value tuple sorts last → wins last-non-null
            *[F.col(f"__v_{v}").asc_nulls_first() for v in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        *[F.last(f"__v_{v}", ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
