"""REAL streaming executions, oracle-checked (SURVEY.md §2.B streaming).

The stream_*_batch queries check window SEMANTICS through batch twins;
these stream_exec_* queries drive the actual Structured Streaming
engine — chunked file-source replay, micro-batch trigger
(availableNow), state store, watermarks, memory/parquet sinks — and
hand the SINK contents to the same DuckDB oracles. A green row here
hash-checks the streaming path itself, not a batch reformulation.

Replay determinism: chunks are event-time-quantile splits of the
events table, each sorted by (ts, event_id), so every run feeds the
engine identical micro-batches and the final state is reproducible.

Aggregations run in `complete` output mode: with a finite replay,
append mode would hold back every window the final watermark hasn't
passed (the well-known tail-loss pitfall), while complete mode's final
emission IS the full converged state — exactly what the batch twin
computes. Non-aggregating streams (joins, dedup) run in append mode.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from fairy_spark.queries import ORACLE, register
from fairy_spark.sources.tables import load_table
from fairy_spark.streaming.pipeline import (
    read_event_stream,
    replay_dir_from_events,
    run_to_table,
    sliding_avg,
    stateful_dedup,
    stream_static_join,
    stream_stream_join,
    tumbling_counts,
)


def _replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per application × sf) the chunked replay directory.
    App-scoped path: concurrent sessions must not race on one replay."""
    app_id = spark.sparkContext.applicationId
    d = os.path.join(
        tempfile.gettempdir(),
        "fairy_spark_stream",
        app_id,
        os.path.basename(sf_dir.rstrip("/")),
    )
    marker = os.path.join(d, "_READY")
    if not os.path.exists(marker):
        replay_dir_from_events(spark, sf_dir, d, n_chunks=4)
        with open(marker, "w"):
            pass
    return d


def _checkpoint(spark: SparkSession, name: str) -> str:
    import uuid

    return os.path.join(
        tempfile.gettempdir(),
        "fairy_spark_stream",
        spark.sparkContext.applicationId,
        "ckpt",
        f"{name}_{uuid.uuid4().hex[:8]}",
    )


@register("stream_exec_tumbling", oracle=ORACLE["stream_tumbling_batch"])
def stream_exec_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts through the live engine; same oracle as
    the batch twin."""
    stream = read_event_stream(spark, _replay_dir(spark, sf_dir))
    sink = run_to_table(tumbling_counts(stream), mode="complete")
    return sink.orderBy("w_start", "event_type")


@register("stream_exec_sliding", oracle=ORACLE["stream_sliding_batch"])
def stream_exec_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, _replay_dir(spark, sf_dir))
    sink = run_to_table(sliding_avg(stream), mode="complete")
    return sink.select("w_start", "n", "avg_value").orderBy("w_start")


@register("stream_exec_session", oracle=ORACLE["stream_session_batch"])
def stream_exec_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(30 min) through the live engine. The sink emits
    (start, end=last_event+gap, user, n); the oracle's shape is
    (session ordinal, start, end=last event). Sessions of one user
    never overlap, so the ordinal is a rank over s_start — a batch
    window over the tiny sink table — and last event = end - gap
    exactly (session_window's end is defined as last + gap)."""
    from fairy_spark.streaming.pipeline import session_windows

    stream = read_event_stream(spark, _replay_dir(spark, sf_dir)).filter(
        F.col("user_id") <= 20
    )
    sink = run_to_table(session_windows(stream), mode="complete")
    w = Window.partitionBy("user_id").orderBy("s_start")
    return (
        sink.withColumn("session_id", F.row_number().over(w).cast("bigint"))
        .select(
            "user_id",
            "session_id",
            "s_start",
            (F.col("s_end") - F.expr("INTERVAL 30 minutes")).alias("s_end"),
            F.col("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


@register("stream_exec_dedup", oracle=ORACLE["stream_dedup_batch"])
def stream_exec_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup (dropDuplicates over the watermark
    horizon) into a parquet file sink — the durable-ingest shape — then
    the sink is aggregated min(event_id) per (user, type) for the
    oracle. Aggregating the SINK keeps the check independent of
    micro-batch arrival order."""
    stream = read_event_stream(spark, _replay_dir(spark, sf_dir))
    deduped = stateful_dedup(stream)
    out = os.path.join(
        tempfile.gettempdir(),
        "fairy_spark_stream",
        spark.sparkContext.applicationId,
        "dedup_sink",
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", _checkpoint(spark, "dedup"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event"))
        .orderBy("user_id", "event_type")
    )


@register("stream_exec_static_join", oracle=ORACLE["stream_static_join_batch"])
def stream_exec_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join through the live engine (the static
    dim re-broadcasts per micro-batch)."""
    stream = read_event_stream(spark, _replay_dir(spark, sf_dir)).filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") <= 50)
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = stream_static_join(stream, c, "user_id").select(
        "event_id", "user_id", F.col("c_mktsegment").alias("segment")
    )
    sink = run_to_table(joined, mode="append")
    return sink.orderBy("event_id")


@register("stream_exec_stream_join", oracle=ORACLE["stream_stream_join_batch"])
def stream_exec_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded inner join through the live engine:
    watermarks on both sides bound the state store; the 4h watermark
    exceeds the 2h join window so no candidate is evicted early, and
    the replay's final emission equals the batch pair set."""
    replay = _replay_dir(spark, sf_dir)
    left = read_event_stream(spark, replay).filter(
        F.col("event_type") == "purchase"
    )
    right = read_event_stream(spark, replay).filter(
        F.col("event_type") != "purchase"
    )
    joined = stream_stream_join(left, right, key="user_id", within="2 hours")
    sink = run_to_table(joined, mode="append")
    return sink.orderBy("user_id", "l_event", "r_event")


@register("stream_exec_stateful_ema", oracle=ORACLE["stream_stateful_ema_batch"])
def stream_exec_stateful_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState custom stateful operator
    (streaming/stateful.py) through the LIVE engine: per-user
    count/sum/EMA state evolved across real micro-batches, update-mode
    emissions into a memory sink. A user touched by k micro-batches
    emits k progressively-updated rows; the FINAL state is the row
    with the largest n — per-user event count is strictly monotone
    across updates, so max_by(·, n) selects the last emission without
    depending on sink insertion order. Same oracle as the batch twin:
    a green row hash-checks the Python state fold, the state store,
    and the replay ordering at once."""
    from fairy_spark.streaming.stateful import user_running_stats

    stream = read_event_stream(spark, _replay_dir(spark, sf_dir))
    sink = run_to_table(user_running_stats(stream), mode="update")
    final = sink.groupBy("user_id").agg(
        F.max_by(F.struct("n", "total", "ema"), F.col("n")).alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n").alias("n"),
        F.round(F.col("s.total"), 6).alias("total"),
        F.round(F.col("s.ema"), 6).alias("ema"),
    ).orderBy("user_id")


@register(
    "stream_exec_foreach_ingest",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_units
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_exec_foreach_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The programmable ingest path through the LIVE engine — the
    reference's put loop generalized (h2_service.rs:89-109: arbitrary
    code runs per arriving chunk): every replay micro-batch is handed
    to a foreachBatch sink that appends it to a durable parquet table,
    then the TABLE (not the stream) is aggregated and hash-checked
    against the full events oracle. Green means no batch was dropped,
    duplicated, or truncated on the way through the engine + sink —
    the multi-chunk-body truncation bug noted in SURVEY §3.1 is
    exactly what this row would catch. Value sums are fixed-point
    integer units so the check is accumulation-order-exact."""
    import uuid

    from fairy_spark.streaming.pipeline import run_foreach_batch

    stream = read_event_stream(spark, _replay_dir(spark, sf_dir))
    out = os.path.join(
        tempfile.gettempdir(),
        "fairy_spark_stream",
        spark.sparkContext.applicationId,
        f"ingest_{uuid.uuid4().hex[:8]}",
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    run_foreach_batch(stream, ingest)
    units = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(units).cast("bigint").alias("value_units"),
        )
        .orderBy("event_type")
    )


def tws_record_high_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transformWithStateInPandas (Spark 4's typed-state successor to
    applyInPandasWithState) through the LIVE engine: per-user
    record-high tracking with a schema-declared ValueState evolved
    across real micro-batches, update-mode emissions into a memory
    sink. The final state per user is the emission with the largest
    n_events (strictly monotone across updates — the
    stream_exec_stateful_ema selection trick).

    NOT a registry query: the TWS state-server protocol requires the
    protobuf Python package, absent in this sandbox (same gap that
    auto-skips the Spark Connect client round-trip,
    tests/test_streaming.py gates on the import). The batch twin
    `stream_record_high_batch` carries the oracle check; where
    protobuf exists, the gated test hash-compares THIS live fold
    against it."""
    from fairy_spark.streaming.stateful import user_record_highs

    stream = read_event_stream(spark, _replay_dir(spark, sf_dir))
    sink = run_to_table(user_record_highs(stream), mode="update")
    final = sink.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "max_units", "n_records"), F.col("n_events")).alias(
            "s"
        )
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        F.col("s.max_units").alias("max_units"),
        F.col("s.n_records").alias("n_records"),
    ).orderBy("user_id")


@register(
    "stream_exec_state_reader",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_units
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_exec_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store DATA SOURCE (Spark 4 `statestore` format): run a
    live streaming aggregation to completion, then read the
    aggregation's STATE out of the checkpoint — key struct + agg
    buffer per shuffle partition — and hash-check that
    reconstructed state against the batch oracle. This is the
    debugging/ops surface a reference operator actually needs
    (fairy's store IS inspectable state — worker/src/h2_service.rs's
    kv map; here the engine's internal state becomes a queryable
    table the same way). A green row proves the checkpoint encodes
    the agg buffer faithfully — not just that the sink saw the right
    rows. Scale: the state read is one task per state-store
    partition, no shuffle; sums are exact fixed-point units."""
    from fairy_spark.streaming.pipeline import read_event_stream

    units = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    stream = read_event_stream(spark, _replay_dir(spark, sf_dir))
    ck = _checkpoint(spark, "state_reader")
    import uuid

    name = f"mem_state_{uuid.uuid4().hex[:8]}"
    q = (
        stream.select("event_type", units.alias("v6"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v6").alias("value_units"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = spark.read.format("statestore").load(ck)
    return (
        state.select(
            F.col("key.event_type").alias("event_type"),
            # buffer fields are named by AGG FUNCTION (count/sum),
            # not by the sink projection's aliases
            F.col("value.count").alias("n"),
            F.col("value.sum").alias("value_units"),
        )
        .orderBy("event_type")
    )
