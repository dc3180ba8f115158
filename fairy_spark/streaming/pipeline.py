"""Structured Streaming surface (SURVEY.md §2.B streaming).

The events table is replayed as a file stream (the analog of the
reference's chunked ingest path, h2_service.rs:89-109 — records arrive
in bounded chunks and the engine folds them into state). Each operator
is a standard Structured Streaming pattern:

  * tumbling / sliding / session windows over event time
  * watermark + late-data drop
  * stateful exact dedup on event_id (the streaming half of the
    LLM dedup surface)
  * stream-static broadcast join
  * foreachBatch sink

Batch equivalence is the correctness contract: the same aggregation
run as a batch query over the full table must equal the final
streaming state after the replay (tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def replay_dir_from_events(spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 5) -> str:
    """Split the events table into n_chunks parquet files ordered by ts
    so a file stream replays them roughly in event-time order (one
    chunk ≈ one micro-batch with maxFilesPerTrigger=1).

    Chunk boundaries are event-time quantiles (percentile_approx with a
    tight accuracy — a distributed sketch, driver sees n_chunks
    scalars), NOT a global ntile window: the ntile form funnels the
    whole table through one task, the exact plan shape the
    test_plans.py single-partition-window gate bans."""
    from fairy_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP'1970-01-01 00:00:00', ts)")
    fracs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = ev.select(
        F.percentile_approx(us, fracs, 100_000).alias("q")
    ).first()["q"] or []
    chunk_expr = sum(
        ((us > F.lit(int(b))).cast("int") for b in bounds), F.lit(0)
    )
    chunked = ev.withColumn("_chunk", chunk_expr)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_chunks):
        (
            chunked.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .sort("ts", "event_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"chunk_{i:03d}"))
        )
    return out_dir


def replay_dir_from_documents(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4
) -> str:
    """Documents-table twin of replay_dir_from_events: n_chunks parquet
    files split on doc_id quantiles (the ingest axis for a corpus
    append stream). Same no-global-window discipline — boundaries come
    from a distributed percentile sketch, n_chunks scalars on the
    driver."""
    from fairy_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    fracs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = docs.select(
        F.percentile_approx(F.col("doc_id"), fracs, 100_000).alias("q")
    ).first()["q"] or []
    chunk_expr = sum(
        ((F.col("doc_id") > F.lit(int(b))).cast("int") for b in bounds), F.lit(0)
    )
    chunked = docs.withColumn("_chunk", chunk_expr)
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n_chunks):
        (
            chunked.filter(F.col("_chunk") == i)
            .drop("_chunk")
            .sort("doc_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"chunk_{i:03d}"))
        )
    return out_dir


def read_event_stream(spark: SparkSession, replay_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay_dir, "chunk_*"))
    )


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_avg(stream: DataFrame, window: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    return (
        stream.withWatermark("ts", "4 hours")
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            # exact state: Σ quantized units + n; the mean is ONE IEEE
            # division at emit — partition/batch-order independent
            F.sum(
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
            ).alias("v6"),
            F.count(F.lit(1)).alias("n"),
            # non-null count for the divisor: NULL values are ignored
            # like F.avg would, not averaged in as 0 (ADVICE r5)
            F.count(F.col("value")).alias("nv"),
        )
        .withColumn("avg_value", F.col("v6").cast("double") / (F.col("nv") * 1000000))
        .select(F.col("w.start").alias("w_start"), "avg_value", "n")
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    return (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("s_start"), F.col("w.end").alias("s_end"), "user_id", "n_events")
    )


def stateful_dedup(stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Exact streaming dedup on event_id within the watermark horizon —
    state is bounded by the watermark (at 100 TB/day this is the only
    viable exact-dedup memory contract)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def stream_static_join(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: the static side is broadcast per micro-batch."""
    return stream.join(F.broadcast(dim), on, "inner")


def run_to_table(query_df: DataFrame, mode: str = "append") -> DataFrame:
    """Drive a streaming query over a finite replay dir to completion
    into a memory sink; returns the sink table as a DataFrame. This is
    the REAL streaming execution path (micro-batch engine, state store,
    watermarks) — the oracle-checked stream_exec_* queries run through
    here, so the hash gate checks the streaming plan itself, not just
    its batch twin."""
    import uuid

    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        query_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return query_df.sparkSession.table(name)


def run_to_completion(query_df: DataFrame, mode: str = "append") -> list:
    """Collected-rows variant of run_to_table (test harness helper)."""
    return run_to_table(query_df, mode).collect()


def idempotent_batch_write(df: DataFrame, root: str, batch_id: int) -> None:
    """Write a foreachBatch output into a ``batch=<id>``-keyed subdir
    with OVERWRITE (ADVICE r12): a foreachBatch retry after a partial
    failure then REPLACES its own earlier half-written output instead
    of appending a duplicate. Scope of the guarantee (ADVICE r13):
    WITHIN one uninterrupted run — in-run retries re-deliver the same
    batch_id with the same rows, but run_foreach_batch starts its
    stream without a checkpointLocation, so a restarted query resets
    batch ids to 0 and may assign files to batches differently;
    callers must use per-run (uuid-scoped) output roots, as every
    registered stream_exec_* query does. A deploy that needs
    exactly-once ACROSS restarts passes checkpoint_dir to
    run_foreach_batch. The dir name follows Hive
    partition layout, so one read of ``root`` discovers every batch
    (plus a ``batch`` partition column callers drop/project away)."""
    df.write.mode("overwrite").parquet(os.path.join(root, f"batch={int(batch_id)}"))


def run_foreach_batch(
    query_df: DataFrame, fn, mode: str = "append", checkpoint_dir: str | None = None
) -> None:
    """Drive a finite stream through a foreachBatch sink (the engine's
    programmable ingest hook — analog of the reference's put path,
    h2_service.rs:89-109: arbitrary code per arriving chunk).
    ``checkpoint_dir`` (ADVICE r13): when given, the stream commits a
    WAL/offset checkpoint there, making batch ids durable across query
    restarts — required for idempotent_batch_write's per-batch
    exactly-once to extend beyond a single uninterrupted run."""
    w = query_df.writeStream.foreachBatch(fn).outputMode(mode)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "2 hours",
    watermark: str = "4 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: rows pair when keys match and the
    right event lands within [left.ts, left.ts + within]. Both sides
    carry watermarks + the time-range condition, so Spark can bound
    the join STATE on both sides — without them stream-stream join
    state grows forever (the non-negotiable contract at stream scale).
    ``how="leftOuter"`` additionally emits null-padded rows for left
    events that found no partner, once the watermark passes their
    join-window expiry and their state is evicted."""
    l = left.select(
        F.col(key).alias("k"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("k"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event"),
    ).withWatermark("r_ts", watermark)
    return (
        l.alias("l")
        .join(
            r.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (F.col("r.r_ts") >= F.col("l.l_ts"))
            & (F.col("r.r_ts") <= F.col("l.l_ts") + F.expr(f"INTERVAL {within}")),
            how,
        )
        # coalesce: under fullOuter an unmatched RIGHT row has a null
        # left key; identical to l.k for inner/leftOuter.
        .select(
            F.coalesce(F.col("l.k"), F.col("r.k")).alias(key),
            "l_event",
            "r_event",
            "l_ts",
            "r_ts",
        )
    )
