"""Time-series resample + gap-fill (north-star analytics surface).

Regularize an irregular event stream onto a fixed grid: per-key hourly
buckets over the key's own [min, max] span, aggregate what exists,
forward-fill what doesn't (last observation carried forward via
last(ignorenulls) over an unbounded-preceding frame).

Scale shape: the grid is generated per key with sequence()+explode —
no driver loop, no cross join against a calendar table; cardinality is
sum over keys of span/step, the same as the output. One shuffle on the
key for the window; the grid join is key+bucket equi.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Hourly (by default) per-key grid with avg-of-bucket and
    forward-filled gaps. Output: key, bucket, n (0 on gaps), avg_value
    (null until first observation), ffill_value."""
    bucket = F.date_trunc("hour", F.col(ts_col))
    # Exact-anchored mean: SUM of 1e-6-quantized units / (n·1e6) — one
    # IEEE division of exactly-represented integers, so the bucket
    # mean is bit-identical on any engine/partitioning. A float AVG
    # here is an order-dependent sum; at sf0.1 one interp anchor
    # landed on a ROUND(,6) knife edge and hash-mismatched (caught by
    # the full-registry sf0.1 audit).
    v6 = F.floor(F.col(val_col) * 1000000 + F.lit(0.5)).cast("bigint")
    agg = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Divide by the NON-NULL value count, matching F.avg's
            # null semantics: a NULL value row must be ignored, not
            # drag the mean toward 0 (ADVICE r5). All-null bucket →
            # SUM is NULL → NULL/0 is NULL on Spark and DuckDB alike.
            (F.sum(v6).cast("double") / (F.count(F.col(val_col)) * 1000000)).alias(
                "avg_value"
            ),
        )
    )
    span = agg.groupBy("key").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        "key",
        F.explode(
            F.sequence("lo", "hi", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    joined = grid.join(agg, ["key", "bucket"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(
        "ffill_value", F.last("avg_value", ignorenulls=True).over(w)
    )


def resample_interp(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Per-key grid with LINEAR interpolation across interior gaps
    (leading/trailing gaps stay null — there is no second anchor to
    interpolate toward). The interpolation fraction uses the integer
    grid index, not epoch arithmetic, so the math is timezone-free and
    the fraction is a ratio of exact integers on both engines.

    Same scale shape as resample_ffill: one shuffle on the key; the
    two anchor scans are windows over the already-key-partitioned grid
    (no extra exchange — same partitioning, Spark reuses it)."""
    base = resample_ffill(events, key_col, ts_col, val_col, step).drop("ffill_value")
    w_ord = Window.partitionBy("key").orderBy("bucket")
    idx = F.row_number().over(w_ord)
    base = base.withColumn("idx", idx)
    obs_idx = F.when(F.col("avg_value").isNotNull(), F.col("idx"))
    w_back = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    prev_v = F.last("avg_value", ignorenulls=True).over(w_back)
    prev_i = F.last(obs_idx, ignorenulls=True).over(w_back)
    next_v = F.first("avg_value", ignorenulls=True).over(w_fwd)
    next_i = F.first(obs_idx, ignorenulls=True).over(w_fwd)
    frac = (F.col("idx") - prev_i).cast("double") / (next_i - prev_i).cast("double")
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * frac,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return base.withColumn("interp_value", interp).drop("idx")
