"""Distributed sequence packing — running token sums WITHOUT a global
single-partition window.

SURVEY.md §2.B "sequence packing": walk documents in id order
accumulating token counts into fixed-size context bins — the standard
pretraining context-packing op (a single-node loop in a conventional
pipeline; the reference itself has no packing stage, this is part of
the training-data surface the brief adds). The naive Spark form is
``Window.orderBy(id)`` with no partitionBy — Catalyst plans that as a
SinglePartition exchange, funnelling the WHOLE corpus through one task:
fine at sf0.1, fatal at 100 TB.

This module implements the scale shape: a two-pass parallel prefix sum.

  pass 0  shard every row deterministically by id range (floor-div on
          the id — no sampling, so both passes agree on shard bounds);
  pass 1  aggregate one subtotal row PER SHARD (tiny: #shards rows,
          cluster metadata scale, not data scale), bring those to the
          driver and prefix-sum them there — the same bounded driver
          hop Spark's own zipWithIndex performs;
  pass 2  local cumulative window PARTITIONED BY shard (parallel), plus
          the broadcast-joined shard offset.

Every data-scale stage is parallel; the only serial step touches
#shards scalars.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def packed_running_sum(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n_shards: int = 32,
) -> DataFrame:
    """Add ``cum`` = running sum of ``weight_col`` in ``id_col`` order.

    ``id_col`` must be a non-negative integral key (dense ids pack
    shards evenly; skewed id ranges degrade balance, not correctness).
    Returns the input columns plus ``cum``.

    NULL-weight policy: NULL weights contribute 0 — a NULL-weight row
    carries the running sum of the non-null weights before it (SQL SUM
    semantics in both the per-shard window and the subtotals, with
    all-NULL shards coalesced to 0 so the driver prefix sum never sees
    None).
    """
    spark = df.sparkSession

    bounds = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if bounds["lo"] is None:
        return df.withColumn("cum", F.lit(None).cast("bigint"))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    shard_size = max(1, (hi - lo + n_shards) // n_shards)

    sharded = df.withColumn(
        "_shard", ((F.col(id_col) - F.lit(lo)) / F.lit(shard_size)).cast("bigint")
    )

    # Pass 1: one subtotal per shard -> driver prefix sum (bounded by
    # #shards, not rows), shipped back as a broadcast offset table.
    subtotals = {
        r["_shard"]: r["sub"]
        for r in sharded.groupBy("_shard")
        .agg(F.coalesce(F.sum(weight_col), F.lit(0)).alias("sub"))
        .collect()
    }
    offsets, running = [], 0
    for shard in sorted(subtotals):
        offsets.append((shard, running))
        running += int(subtotals[shard])
    off_df = spark.createDataFrame(offsets, "_shard BIGINT, _offset BIGINT")

    # Pass 2: per-shard local cumsum (parallel window) + shard offset.
    w = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sharded.withColumn("_local_cum", F.sum(weight_col).over(w))
        .join(F.broadcast(off_df), "_shard")
        .withColumn("cum", (F.col("_local_cum") + F.col("_offset")).cast("bigint"))
        .drop("_shard", "_local_cum", "_offset")
    )


def pack_into_bins(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    bin_tokens: int = 512,
    n_shards: int = 32,
) -> DataFrame:
    """Assign each row (in ``id_col`` order) a ``bin_id`` so that bins
    hold ~``bin_tokens`` running tokens — greedy sequential packing, the
    standard pretraining context-packing op, distributed via
    packed_running_sum."""
    with_cum = packed_running_sum(df, id_col, tokens_col, n_shards=n_shards)
    bin_id: Column = F.floor(
        (F.col("cum") - F.col(tokens_col)) / float(bin_tokens)
    ).alias("bin_id")
    return with_cum.select(*df.columns, bin_id)
