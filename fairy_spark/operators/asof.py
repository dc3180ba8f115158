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

The winner is ROW-ATOMIC: all value columns are packed into ONE struct
and a single last(struct, ignorenulls=True) carries it forward, so the
result always comes from one right row — a duplicate-ts row holding a
NULL value column can never mix per-column with its neighbor (that was
the pre-r5 per-column-last caveat; ADVICE r4). This also matches
DuckDB ASOF exactly for the non-duplicate case: if the latest at-or-
before right row holds NULL in a value column, the left row gets that
NULL (no silent fallback to an older row). Value columns must still be
orderable (the tie-break sorts the struct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, annotated with ``value_cols``
    from the latest right row with ``right_ts <= left_ts`` (per keys).
    Left rows keep all their columns; unmatched rows get nulls.

    ``tie_break`` (ADVICE r5): optional right-side column that decides
    the winner among duplicate-(keys, ts) right rows — the row with
    the GREATEST tie_break value wins, still row-atomically (the
    column rides as the winner struct's first field, so struct
    comparison orders on it before any value column). Default policy
    (None) is unchanged: greatest value-struct in value_cols order."""
    lcols = left.columns
    vfields = ([("__tb", right.schema[tie_break].dataType)] if tie_break else []) + [
        (v, right.schema[v].dataType) for v in value_cols
    ]
    vtype = T.StructType([T.StructField(n, t) for n, t in vfields])
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        # NULL struct, not struct-of-NULLs: last(ignorenulls) must skip
        # left rows entirely, while a right row whose fields are all
        # NULL still counts as a (non-null) candidate row.
        .withColumn("__v", F.lit(None).cast(vtype))
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            *([F.col(tie_break).alias("__tb")] if tie_break else []),
            *[F.col(v).alias(v) for v in value_cols],
        ).alias("__v"),
    )
    for c in lcols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.select(*lcols, "__ts", "__side", "__v").unionByName(
        r.select(*lcols, "__ts", "__side", "__v")
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            # deterministic tie-break among duplicate-(keys, ts) right
            # rows: greatest (tie_break?, values) struct sorts last →
            # wins the last()
            F.col("__v").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        F.last("__v", ignorenulls=True).over(w).alias("__v"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__v.{v}").alias(v) for v in value_cols]
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join, FORWARD direction: every left row, annotated
    with ``value_cols`` from the EARLIEST right row with
    ``right_ts >= left_ts`` (per keys) — the "next reading after this
    event" lookup (DuckDB `ASOF JOIN ... ON r.ts >= l.ts`). Same
    union + window encoding as backward (one shuffle, no range
    explosion), mirrored: right rows sort AFTER left at equal ts (a
    right row exactly at the left timestamp matches), and a
    first-non-null over the FOLLOWING frame replaces last-over-
    preceding. Duplicate-(keys, ts) right rows resolve to the
    greatest value struct (sorted first within the tie via descending
    struct order) — the same row-atomic greatest-row-wins rule as
    backward, so flipping direction never changes the tie policy.

    Tie-break caveat (ADVICE r5): "greatest value struct" compares
    ``value_cols`` lexicographically IN THE ORDER GIVEN, so for
    multi-column value_cols the winner among duplicate-(keys, ts)
    right rows depends on the column ordering the caller passed.
    Deterministic, but surprising — callers who care which duplicate
    wins should pre-deduplicate the right side to unique (keys, ts)
    (e.g. groupBy + max_by on an explicit tie-break column) before
    calling, as the registry queries do. Alternatively pass
    ``tie_break``: a right-side column whose GREATEST value picks the
    winner row-atomically (same mechanism as backward)."""
    lcols = left.columns
    vfields = ([("__tb", right.schema[tie_break].dataType)] if tie_break else []) + [
        (v, right.schema[v].dataType) for v in value_cols
    ]
    vtype = T.StructType([T.StructField(n, t) for n, t in vfields])
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(0))
        .withColumn("__v", F.lit(None).cast(vtype))
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(
            *([F.col(tie_break).alias("__tb")] if tie_break else []),
            *[F.col(v).alias(v) for v in value_cols],
        ).alias("__v"),
    )
    for c in lcols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.select(*lcols, "__ts", "__side", "__v").unionByName(
        r.select(*lcols, "__ts", "__side", "__v")
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__ts").asc(),
            F.col("__side").asc(),
            # greatest value struct sorts FIRST among duplicate-ts
            # right rows → wins the first()
            F.col("__v").desc_nulls_last(),
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        F.first("__v", ignorenulls=True).over(w).alias("__v"),
    )
    return filled.filter(F.col("__side") == 0).select(
        *lcols, *[F.col(f"__v.{v}").alias(v) for v in value_cols]
    )
