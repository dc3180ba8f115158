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
    agg = (
        events.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(val_col).alias("avg_value"),
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
