"""Table profiling: per-column statistics in ONE pass.

The data-engineering utility every ingest pipeline runs first: for each
column — null count, exact distinct count, min/max (as strings for
uniform schema). Computed as a single aggregate over the table (one
scan, one shuffle-free partial-agg reduction), then unpivoted to the
long (column, stat) shape. At 100 TB swap countDistinct for
approx_count_distinct — the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format profile: (col_name, n_nulls, n_distinct, min_str, max_str)."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("p")).select("p.*")
