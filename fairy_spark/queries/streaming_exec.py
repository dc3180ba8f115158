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
from fairy_spark.sources.tables import load_table, sf_cache_key
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
        sf_cache_key(sf_dir),
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


@register("stream_exec_minhash_append", oracle=ORACLE["dedup_minhash_lsh"])
def stream_exec_minhash_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup dedup through the LIVE engine (VERDICT r7
    #8a): the documents table replays as 4 doc_id-quantile micro-
    batches; every foreachBatch invocation runs
    ``minhash_lsh_append(base=docs ingested so far, delta=batch)`` —
    the r7 incremental-maintenance operator — appends the NEW candidate
    pairs to a durable pairs table, then appends the batch into the
    base corpus. Each pair (x, y) materializes exactly once, in the
    batch where its LATER member arrives (same-batch pairs via the
    delta×delta leg, cross-batch via delta×base), so after the replay
    the pairs table equals the FULL-CORPUS banded candidates — the
    identity is batch-partition-invariant, which is why the oracle is
    simply `dedup_minhash_lsh`'s full banded form. Green means the
    per-batch incremental index maintenance, driven by the real
    streaming engine, loses and duplicates nothing. Per-batch cost is
    ∝ |delta| × bucket occupancy — the contract a 100 TB ingest
    pipeline needs (never a corpus rebuild per append). The
    driver-local os.path existence probe for the first batch is
    sandbox-local-FS shorthand; a cluster deployment would probe the
    table catalog instead."""
    import uuid

    from fairy_spark.operators.dedup import minhash_lsh_append
    from fairy_spark.streaming.pipeline import (
        idempotent_batch_write,
        replay_dir_from_documents,
        run_foreach_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    schema = docs.schema
    app_dir = os.path.join(
        tempfile.gettempdir(), "fairy_spark_stream", spark.sparkContext.applicationId
    )
    # Keyed on a hash of the FULL sf_dir path, not its basename: two
    # sf_dirs with the same basename (/a/sf0.1 vs /b/sf0.1) in one
    # application must not share a replay cache (ADVICE r8).
    replay = os.path.join(app_dir, "docs_replay_" + sf_cache_key(sf_dir))
    marker = os.path.join(replay, "_READY")
    if not os.path.exists(marker):
        replay_dir_from_documents(spark, sf_dir, replay, n_chunks=4)
        with open(marker, "w"):
            pass
    run_id = uuid.uuid4().hex[:8]
    acc = os.path.join(app_dir, f"mh_acc_{run_id}")
    pairs_out = os.path.join(app_dir, f"mh_pairs_{run_id}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "chunk_*"))
    )

    cols = [f.name for f in schema]

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        if os.path.isdir(acc):
            base = sess.read.parquet(acc).select(*cols)
        else:
            base = sess.createDataFrame([], schema)
        new_pairs = minhash_lsh_append(
            base, batch_df, shingle_n=3, num_hashes=8, band_rows=1, cache_key=None
        )
        # batch_id-keyed OVERWRITE subdirs (ADVICE r12): a foreachBatch
        # retry replaces its own partial output instead of appending
        # duplicate pairs / double-ingesting the batch into the base.
        idempotent_batch_write(new_pairs, pairs_out, batch_id)
        idempotent_batch_write(batch_df, acc, batch_id)

    run_foreach_batch(stream, ingest)
    return (
        spark.read.parquet(pairs_out)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


@register("stream_exec_dhash_append", oracle=ORACLE["dedup_image_dhash"])
def stream_exec_dhash_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING perceptual near-dup through the LIVE engine (r12 —
    the stream_exec_minhash_append shape for the multimodal dedup
    leg): documents replay as 4 micro-batches; every foreachBatch
    invocation fingerprints ONLY the arriving batch (image_dhash over
    the media stand-in — payloads under the 45-byte grid drop inside
    the operator, so the oracle's LENGTH filter is matched without a
    separate predicate), runs hamming_pairs_append(base=fingerprints
    ingested so far, delta=batch) and appends the new pairs, then
    appends the batch FINGERPRINTS (16-byte rows, never payloads)
    into the durable index. Each pair materializes exactly once — in
    the batch where its later-arriving member lands — so after the
    replay the pairs table equals the full banded join and the oracle
    is simply `dedup_image_dhash`'s. Per-batch cost: hash |delta| +
    band-probe vs the accumulated index; the base's payload bytes are
    never re-read — the contract a 100 TB continuous image-ingest
    dedup needs."""
    import uuid

    from fairy_spark.operators.dedup import hamming_pairs_append
    from fairy_spark.operators.multimodal import (
        image_dhash,
        media_table_from_documents,
    )
    from fairy_spark.streaming.pipeline import (
        idempotent_batch_write,
        replay_dir_from_documents,
        run_foreach_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    schema = docs.schema
    app_dir = os.path.join(
        tempfile.gettempdir(), "fairy_spark_stream", spark.sparkContext.applicationId
    )
    replay = os.path.join(app_dir, "docs_replay_" + sf_cache_key(sf_dir))
    marker = os.path.join(replay, "_READY")
    if not os.path.exists(marker):
        replay_dir_from_documents(spark, sf_dir, replay, n_chunks=4)
        with open(marker, "w"):
            pass
    run_id = uuid.uuid4().hex[:8]
    acc = os.path.join(app_dir, f"dh_sig_{run_id}")
    pairs_out = os.path.join(app_dir, f"dh_pairs_{run_id}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "chunk_*"))
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        delta_sig = image_dhash(media_table_from_documents(batch_df))
        if os.path.isdir(acc):
            base_sig = sess.read.parquet(acc).select("media_id", "dhash")
        else:
            base_sig = sess.createDataFrame([], "media_id LONG, dhash LONG")
        new_pairs = hamming_pairs_append(
            base_sig, delta_sig, bits=40, n_bands=4, max_hamming=3,
            id_col="media_id", hash_col="dhash",
        )
        # batch_id-keyed OVERWRITE subdirs (ADVICE r12): a foreachBatch
        # retry replaces its own partial output instead of appending
        # duplicate pairs / double-ingesting fingerprints.
        idempotent_batch_write(new_pairs, pairs_out, batch_id)
        idempotent_batch_write(delta_sig, acc, batch_id)

    run_foreach_batch(stream, ingest)
    return (
        spark.read.parquet(pairs_out)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


@register("stream_exec_dhash_bucketed", oracle=ORACLE["dedup_image_dhash"])
def stream_exec_dhash_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stream_exec_dhash_append with a PRE-BANDED durable index
    (VERDICT r12 #5): the fingerprint store is written as
    band_fingerprints rows — (id, h, band_val) data under
    (band_id, bv_bucket = band_val % 16) partition dirs — so an
    arriving batch probes ONLY the buckets its own band values touch:
    the batch's distinct (band_id, bv_bucket) set (bounded ≤ 4×16 =
    64 rows, one tiny collect) becomes a partition-pruning predicate
    on the index scan, and per-batch base cost drops from the full
    O(|base|) re-banding projection to the touched partitions'
    occupancy — truly ∝ |delta| × occupancy. Pruning is LOSSLESS by
    construction (a base band row outside the delta's bucket set can
    never satisfy the band equi-join — pinned in tests along with the
    PartitionFilters plan gate in tests/test_plans.py), so the oracle
    stays dedup_image_dhash's full join, and each green run proves
    bucketed-probe ≡ full-reband ≡ one-shot batch join. Writes are
    batch_id-keyed OVERWRITE subdirs (retry-idempotent, the ADVICE
    r12 discipline). 100 TB shape: the pre-banded store is the
    durable dedup index a continuous image-ingest pipeline maintains
    — 64 buckets here; production widens to O(10k) buckets so each
    probe touches a vanishing index fraction."""
    import uuid

    from fairy_spark.operators.dedup import band_fingerprints, hamming_pairs_probe
    from fairy_spark.operators.multimodal import (
        image_dhash,
        media_table_from_documents,
    )
    from fairy_spark.streaming.pipeline import (
        idempotent_batch_write,
        replay_dir_from_documents,
        run_foreach_batch,
    )

    n_buckets = 16
    docs = load_table(spark, sf_dir, "documents")
    schema = docs.schema
    app_dir = os.path.join(
        tempfile.gettempdir(), "fairy_spark_stream", spark.sparkContext.applicationId
    )
    replay = os.path.join(app_dir, "docs_replay_" + sf_cache_key(sf_dir))
    marker = os.path.join(replay, "_READY")
    if not os.path.exists(marker):
        replay_dir_from_documents(spark, sf_dir, replay, n_chunks=4)
        with open(marker, "w"):
            pass
    run_id = uuid.uuid4().hex[:8]
    idx = os.path.join(app_dir, f"dhb_idx_{run_id}")
    pairs_out = os.path.join(app_dir, f"dhb_pairs_{run_id}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "chunk_*"))
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        delta_sig = image_dhash(media_table_from_documents(batch_df))
        delta_banded = band_fingerprints(
            delta_sig, bits=40, n_bands=4, id_col="media_id", hash_col="dhash"
        ).withColumn("bv_bucket", F.pmod(F.col("band_val"), F.lit(n_buckets)))
        if os.path.isdir(idx):
            # bounded collect (≤ n_bands × n_buckets = 64 rows): the
            # batch's touched buckets become the partition-pruning
            # predicate — only those index partitions are read.
            touched = sorted(
                (r["band_id"], int(r["bv_bucket"]))
                for r in delta_banded.select("band_id", "bv_bucket").distinct().collect()
            )
            pred = F.lit(False)
            for bid, bkt in touched:
                pred = pred | (
                    (F.col("band_id") == F.lit(bid)) & (F.col("bv_bucket") == F.lit(bkt))
                )
            base = (
                sess.read.parquet(idx)
                .filter(pred)
                .select("id", "h", "band_id", "band_val")
            )
        else:
            base = sess.createDataFrame([], "id LONG, h LONG, band_id INT, band_val LONG")
        new_pairs = hamming_pairs_probe(
            base, delta_sig, bits=40, n_bands=4, max_hamming=3,
            id_col="media_id", hash_col="dhash",
        )
        idempotent_batch_write(new_pairs, pairs_out, batch_id)
        # the durable index is stored PRE-BANDED, bucket-partitioned,
        # batch_id-keyed (idempotent overwrite on retry)
        delta_banded.write.partitionBy("band_id", "bv_bucket").mode("overwrite").parquet(
            os.path.join(idx, f"batch={int(batch_id)}")
        )

    run_foreach_batch(stream, ingest)
    return (
        spark.read.parquet(pairs_out)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


@register("stream_exec_lines_append", oracle=ORACLE["dedup_lines_exact"])
def stream_exec_lines_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING line dedup through the LIVE engine (r13 — the
    stream_exec_minhash_append shape for the line stage, completing
    the exact/near × batch/incremental/streaming line-dedup grid):
    documents replay as 4 doc_id-quantile micro-batches IN ID ORDER
    (the file source delivers the quantile chunks by write order,
    which is the prefix-stability ingest contract dedup_lines_append
    documents); every foreachBatch invocation segments ONLY the
    arriving batch into the 12-token pseudo-lines, cleans it against
    the durable DIGEST INDEX via dedup_lines_append(base_digs=...) —
    the index is 16-byte digest rows, base text is NEVER re-read or
    re-exploded — then appends the batch's distinct digests to the
    index. Per-doc summaries are emitted in the batch where the doc
    arrives and are final (prefix-stable), so the union over batches
    IS dedup_lines_exact's full output — that oracle checks the
    streaming run verbatim. Writes are batch_id-keyed OVERWRITE
    subdirs (retry-idempotent). 100 TB: per-batch cost is |delta|
    explode + one digest probe of a bucketed index + one |delta| agg,
    independent of corpus size — the continuous-crawl line-dedup
    ingest contract."""
    import uuid

    from fairy_spark.operators.dedup import dedup_lines_append
    from fairy_spark.streaming.pipeline import (
        idempotent_batch_write,
        replay_dir_from_documents,
        run_foreach_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    schema = docs.schema
    app_dir = os.path.join(
        tempfile.gettempdir(), "fairy_spark_stream", spark.sparkContext.applicationId
    )
    replay = os.path.join(app_dir, "docs_replay_" + sf_cache_key(sf_dir))
    marker = os.path.join(replay, "_READY")
    if not os.path.exists(marker):
        replay_dir_from_documents(spark, sf_dir, replay, n_chunks=4)
        with open(marker, "w"):
            pass
    run_id = uuid.uuid4().hex[:8]
    acc = os.path.join(app_dir, f"ld_digs_{run_id}")
    out = os.path.join(app_dir, f"ld_summ_{run_id}")
    seg = (
        "array_join(transform(sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), "
        "g -> array_join(slice(split(text, ' '), g*12+1, 12), ' ')), chr(10))"
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "chunk_*"))
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        delta = batch_df.select("doc_id", F.expr(seg).alias("text"))
        if os.path.isdir(acc):
            digs = sess.read.parquet(acc).select("_dig")
        else:
            digs = sess.createDataFrame([], "_dig STRING")
        summary = dedup_lines_append(None, delta, base_digs=digs)
        idempotent_batch_write(summary, out, batch_id)
        delta_digs = (
            delta.select(F.explode(F.split("text", "\n")).alias("_line"))
            .filter(F.length("_line") >= 1)
            .select(F.md5("_line").alias("_dig"))
            .distinct()
            # ADVICE r13: anti-join against the accumulated index so a
            # digest repeating across batches is stored once — keeps the
            # durable index at its documented one-row-per-distinct-line
            # shape (mirrors stream_exec_lines_near_append's new_rows
            # left_anti; correctness never depended on this because
            # dedup_lines_append re-distincts on read, but at 100 TB the
            # index must not grow with ingest volume, only with novelty).
            .join(digs, "_dig", "left_anti")
        )
        idempotent_batch_write(delta_digs, acc, batch_id)

    run_foreach_batch(stream, ingest)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_lines", "n_kept", "kept_text")
        .orderBy("doc_id")
    )


@register("stream_exec_lines_near_append", oracle=ORACLE["dedup_lines_near"])
def stream_exec_lines_near_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING FUZZY line dedup through the LIVE engine (r13 — the
    last cell of the line-dedup grid: exact/near ×
    batch/incremental/streaming): documents replay as 4
    doc_id-quantile micro-batches in id order; every foreachBatch
    invocation segments ONLY the arriving batch and cleans it with
    dedup_lines_near_append(base_index=...) against the durable
    line_near_index table — per-distinct-line (digest, first, shingle
    set, 8 minhashes), read back each batch, base TEXT never re-read
    — then appends the batch's index rows for digests the index has
    never seen. Greedy fuzzy survivorship is prefix-stable, so each
    batch's per-doc summaries are final on emission and the union
    over batches IS dedup_lines_near's full output: that full fuzzy
    oracle (digest collapse, banded minhash join, exact integer
    Jaccard, greedy drops) checks the streaming run verbatim — green
    means the maintained signature index loses and duplicates
    nothing, including fuzzy drops ACROSS batch boundaries. Writes
    are batch_id-keyed OVERWRITE subdirs (retry-idempotent). 100 TB:
    the same continuous-crawl contract as stream_exec_lines_append
    with the near-dup stage riding the identical durable index."""
    import uuid

    from fairy_spark.operators.dedup import dedup_lines_near_append, line_near_index
    from fairy_spark.streaming.pipeline import (
        idempotent_batch_write,
        replay_dir_from_documents,
        run_foreach_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    schema = docs.schema
    app_dir = os.path.join(
        tempfile.gettempdir(), "fairy_spark_stream", spark.sparkContext.applicationId
    )
    replay = os.path.join(app_dir, "docs_replay_" + sf_cache_key(sf_dir))
    marker = os.path.join(replay, "_READY")
    if not os.path.exists(marker):
        replay_dir_from_documents(spark, sf_dir, replay, n_chunks=4)
        with open(marker, "w"):
            pass
    run_id = uuid.uuid4().hex[:8]
    acc = os.path.join(app_dir, f"lnn_idx_{run_id}")
    out = os.path.join(app_dir, f"lnn_summ_{run_id}")
    seg = (
        "array_join(transform(sequence(0, (size(split(text, ' ')) + 11) div 12 - 1), "
        "g -> array_join(slice(split(text, ' '), g*12+1, 12), ' ')), chr(10))"
    )
    idx_schema = (
        "_dig STRING, _first STRUCT<_id: BIGINT, _line_no: INT>, "
        "_sh ARRAY<STRING>, _nsh INT, _sig ARRAY<BIGINT>"
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "chunk_*"))
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        delta = batch_df.select("doc_id", F.expr(seg).alias("text"))
        if os.path.isdir(acc):
            base_index = sess.read.parquet(acc).select(
                "_dig", "_first", "_sh", "_nsh", "_sig"
            )
        else:
            base_index = sess.createDataFrame([], idx_schema)
        summary = dedup_lines_near_append(None, delta, base_index=base_index)
        idempotent_batch_write(summary, out, batch_id)
        new_rows = line_near_index(delta).join(
            base_index.select("_dig"), "_dig", "left_anti"
        )
        idempotent_batch_write(new_rows, acc, batch_id)

    run_foreach_batch(stream, ingest)
    return (
        spark.read.parquet(out)
        .select("doc_id", "n_lines", "n_kept", "kept_text")
        .orderBy("doc_id")
    )


@register(
    "stream_exec_cdc_counts",
    oracle="""
    WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
    f AS (
      SELECT doc_id, toks, len(toks) AS n,
             list_filter(generate_series(1, len(toks)),
                         i -> CAST(concat('0x', substr(md5(concat('cdc', ':', list_extract(toks, i))), 1, 15)) AS BIGINT) % 8 = 0) AS bpos
      FROM t
    ),
    ch AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(generate_series(1, len(bpos) + 1),
                 j -> array_to_string(
                        toks[list_extract(list_prepend(1, list_transform(bpos, p -> p + 1)), j)
                             :list_extract(list_append(bpos, n), j)], ' ')),
               c -> c <> '')) AS chunk
      FROM f
    )
    SELECT md5(chunk) AS dig, CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM ch
    GROUP BY dig
    HAVING COUNT(*) > 1
    ORDER BY dig
    """,
)
def stream_exec_cdc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING content-defined-chunk dedup state through the LIVE
    engine: the documents table replays as 4 micro-batches, each batch
    explodes its CDC chunks (the per-row HOF fold runs INSIDE the
    streaming plan — chunking needs no corpus context, which is the
    whole point of content-defined boundaries), and a stateful
    groupBy(digest).count() maintains the corpus-wide chunk-copy
    counts in the state store across batches. Complete-mode final
    emission = the converged duplicated-chunk table, hash-checked
    against the batch CTE — green means the streaming state store
    accumulated every chunk from every batch exactly once. This is
    the storage-dedup ingest shape at 100 TB: per-batch work ∝ |delta|
    chunks, state keyed on the 32-hex digest, never a corpus rescan;
    dedup_cdc_chunks is the batch twin over the same boundary rule."""
    from fairy_spark.operators.text import cdc_chunks, tokenize
    from fairy_spark.streaming.pipeline import replay_dir_from_documents

    docs = load_table(spark, sf_dir, "documents")
    schema = docs.schema
    app_dir = os.path.join(
        tempfile.gettempdir(), "fairy_spark_stream", spark.sparkContext.applicationId
    )
    replay = os.path.join(app_dir, "docs_replay_" + sf_cache_key(sf_dir))
    marker = os.path.join(replay, "_READY")
    if not os.path.exists(marker):
        replay_dir_from_documents(spark, sf_dir, replay, n_chunks=4)
        with open(marker, "w"):
            pass
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "chunk_*"))
    )
    counts = (
        stream.select(F.explode(cdc_chunks(tokenize(F.col("text")), mod=8)).alias("chunk"))
        .select(F.md5("chunk").alias("dig"))
        .groupBy("dig")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_copies"))
    )
    sink = run_to_table(counts, mode="complete")
    return sink.filter(F.col("n_copies") > 1).orderBy("dig")


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


def _late_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Replay dir with DELIBERATE late arrivals: chunk 0 = on-time
    first half, chunk 1 = second half (advancing the watermark to
    max event time), chunk 2 = a withheld slice of WEEK-1 rows that
    now arrives ~3 weeks late. Built once per application x sf, like
    _replay_dir."""
    app_id = spark.sparkContext.applicationId
    d = os.path.join(
        tempfile.gettempdir(),
        "fairy_spark_stream",
        app_id,
        "late_" + sf_cache_key(sf_dir),
    )
    marker = os.path.join(d, "_READY")
    if os.path.exists(marker):
        return d
    ev = load_table(spark, sf_dir, "events")
    t0 = ev.agg(F.min("ts").alias("t0")).first()["t0"]
    late = (F.col("event_id") % 7 == 3) & (
        F.col("ts") < F.lit(t0) + F.expr("INTERVAL 7 DAYS")
    )
    cut = F.lit(t0) + F.expr("INTERVAL 15 DAYS")
    chunks = [
        ev.filter(~late & (F.col("ts") < cut)),
        ev.filter(~late & (F.col("ts") >= cut)),
        ev.filter(late),
    ]
    os.makedirs(d, exist_ok=True)
    for i, ch in enumerate(chunks):
        (
            ch.sort("ts", "event_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"chunk_{i:03d}"))
        )
    with open(marker, "w"):
        pass
    return d


@register(
    "stream_exec_watermark_late",
    oracle="""
    WITH b AS (SELECT MIN(ts) AS t0 FROM events),
    kept AS (
      SELECT e.ts, e.event_type, e.value
      FROM events e, b
      WHERE NOT (e.event_id % 7 = 3 AND e.ts < b.t0 + INTERVAL 7 DAY)
    )
    SELECT date_trunc('day', ts)
             + (CAST(EXTRACT(hour FROM ts) AS INTEGER) // 6) * INTERVAL 6 HOUR
             AS w_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_units
    FROM kept
    GROUP BY 1, 2
    ORDER BY w_start, event_type
    """,
)
def stream_exec_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP through the live engine — the one
    streaming semantic the other stream_exec_* queries can't show,
    because their replay arrives in event-time order. Here a slice of
    week-1 events is withheld until after the replay's final chunk has
    advanced the watermark to (max event time - 1h); when the slice
    finally arrives, every row targets a 6h window whose end is weeks
    behind the watermark, so the engine MUST drop all of them (their
    state is already evicted). The oracle is the batch aggregate over
    events EXCLUDING the withheld slice — a green row proves the drop
    happened and nothing on-time was lost. Update output mode (the
    mode where eviction actually runs; complete mode never drops);
    per-key counts are monotone across update emissions, so max_by(n)
    over the sink picks each key's final state independent of
    insertion order. Windows that straddle the chunk-1 boundary are
    updated across micro-batches, exercising the state-merge path
    too."""
    stream = read_event_stream(spark, _late_replay_dir(spark, sf_dir))
    units = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(units).alias("value_units"))
        .select(
            F.col("w.start").alias("w_start"), "event_type", "n", "value_units"
        )
    )
    sink = run_to_table(agg, mode="update")
    final = sink.groupBy("w_start", "event_type").agg(
        F.max_by(F.struct("n", "value_units"), F.col("n")).alias("s")
    )
    return final.select(
        "w_start",
        "event_type",
        F.col("s.n").alias("n"),
        F.col("s.value_units").alias("value_units"),
    ).orderBy("w_start", "event_type")


def _outer_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Replay dir for the OUTER stream-stream join: 4 event-time
    quantile chunks of real data, then TWO sentinel chunks (one
    purchase + one click row each, user_id = -1, at max_ts + 10h/11h).
    The sentinels advance BOTH sides' watermarks past every real
    row's join-window expiry, and the second sentinel batch runs with
    the first's watermark already applied — so the engine provably
    evicts all real left-side state and emits the null-padded outer
    rows before the replay ends (outer emission happens a batch AFTER
    the watermark advance; one sentinel alone would strand the tail).
    Built once per application × sf, like _replay_dir."""
    import datetime

    app_id = spark.sparkContext.applicationId
    d = os.path.join(
        tempfile.gettempdir(),
        "fairy_spark_stream",
        app_id,
        "outer_" + sf_cache_key(sf_dir),
    )
    marker = os.path.join(d, "_READY")
    if os.path.exists(marker):
        return d
    from fairy_spark.streaming.pipeline import replay_dir_from_events

    replay_dir_from_events(spark, sf_dir, d, n_chunks=4)
    ev = load_table(spark, sf_dir, "events")
    t_max = ev.agg(F.max("ts").alias("t")).first()["t"]
    for i, hours in ((4, 10), (5, 11)):
        t_s = t_max + datetime.timedelta(hours=hours)
        sent = spark.createDataFrame(
            [
                (-(2 * i), t_s, -1, "purchase", 0.0, "{}"),
                (-(2 * i + 1), t_s, -1, "click", 0.0, "{}"),
            ],
            schema=ev.schema,
        )
        sent.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"chunk_{i:03d}")
        )
    with open(marker, "w"):
        pass
    return d


@register(
    "stream_exec_stream_outer",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS l_ts, event_id AS l_event
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS r_ts, event_id AS r_event
      FROM events WHERE event_type <> 'purchase'
    ), m AS (
      SELECT p.user_id, p.l_event, c.r_event
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.r_ts >= p.l_ts
       AND c.r_ts <= p.l_ts + INTERVAL 2 HOUR
    )
    SELECT user_id, l_event, r_event FROM m
    UNION ALL
    SELECT p.user_id, p.l_event, CAST(NULL AS BIGINT) AS r_event
    FROM p
    WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.l_event = p.l_event)
    ORDER BY user_id, l_event, r_event
    """,
)
def stream_exec_stream_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER time-bounded join through the live
    engine — the semantics the inner variant (stream_exec_stream_join)
    cannot show: a purchase with no click within its 2h window emits a
    null-padded row only when the watermark passes its join-window
    expiry and the state store evicts it. Outer correctness is
    therefore a statement about WATERMARK-DRIVEN EVICTION, not just
    pairing: the oracle is matched-pairs UNION unmatched-left, and the
    row counts agree only if the engine evicted (and emitted) every
    real left row — proven here by the two sentinel chunks in
    _outer_replay_dir that push both sides' watermarks past every real
    expiry before the finite replay ends (outer results surface one
    batch after the watermark moves — the documented delayed-emission
    behavior; the second sentinel batch is what flushes them). State
    stays bounded on both sides (watermark 4h > window 2h), the
    condition is an equi-key + time-range join — the only
    stream-stream join shape that scales, because state is hash-
    partitioned by key and pruned by event time."""
    replay = _outer_replay_dir(spark, sf_dir)
    from fairy_spark.streaming.pipeline import (
        read_event_stream as _res,
        run_to_table as _rtt,
        stream_stream_join as _ssj,
    )

    left = _res(spark, replay).filter(F.col("event_type") == "purchase")
    right = _res(spark, replay).filter(F.col("event_type") != "purchase")
    joined = _ssj(left, right, key="user_id", within="2 hours", how="leftOuter")
    sink = _rtt(joined, mode="append")
    return (
        sink.filter(F.col("user_id") >= 0)
        .select("user_id", "l_event", "r_event")
        .orderBy("user_id", "l_event", "r_event")
    )


@register(
    "stream_exec_python_source",
    oracle="""
    WITH feed AS (
      SELECT i AS id, (i * i) % 97 AS val
      FROM (SELECT UNNEST(generate_series(0, 999)) AS i)
    )
    SELECT val % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(id) AS BIGINT) AS sum_id
    FROM feed GROUP BY val % 10 ORDER BY bucket
    """,
)
def stream_exec_python_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PYTHON DataSource through the live engine
    (SimpleDataSourceStreamReader, Spark 4) + incremental availableNow
    RESTARTS: the synthetic feed serves 1000 deterministic rows in
    250-row offset batches, and the driver loop below starts a fresh
    availableNow run against the SAME checkpoint until the sink stops
    growing — each restart resumes from the offset the previous run
    committed to the WAL, so the final parquet sink holding exactly
    one copy of every row is a live proof of offset-checkpoint
    exactly-once across restarts (the cross-restart analog of
    kv_time_travel's durability story, on the streaming plane). The
    source's readBetweenOffsets replays any committed range
    bit-identically — the property recovery relies on. Scale shape:
    the feed is a stand-in for any external system (queue, CDC tap)
    attached via the Python source API; offsets are the contract that
    makes a 1000-executor ingest restartable. The final aggregation
    runs batch over the sink."""
    from fairy_spark.sources.pydatasource import register_pydatasource_stream

    register_pydatasource_stream(spark)
    # App-scoped deterministic path + _DONE marker (the _replay_dir
    # discipline): the restart loop is the artifact under test, but it
    # only needs to run once per application — re-plans (plan gates,
    # audits) reuse the drained sink.
    base = os.path.join(
        tempfile.gettempdir(),
        "fairy_spark_stream",
        spark.sparkContext.applicationId,
        "pysrc",
    )
    sink, ckpt = os.path.join(base, "sink"), os.path.join(base, "ckpt")
    done = os.path.join(base, "_DONE")
    n_total = 1000
    seen, rounds = -1, 0
    while not os.path.exists(done) and rounds < 12:
        q = (
            spark.readStream.format("fairy_feed")
            .option("n_total", str(n_total))
            .option("batch", "250")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rounds += 1
        now = spark.read.parquet(sink).count()
        if now == seen:
            break
        seen = now
    if not os.path.exists(done):
        with open(done, "w"):
            pass
    return (
        spark.read.parquet(sink)
        .groupBy((F.col("val") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("id").cast("bigint").alias("sum_id"),
        )
        .orderBy("bucket")
    )


@register(
    "stream_exec_stream_full",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS l_ts, event_id AS l_event
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS r_ts, event_id AS r_event
      FROM events WHERE event_type <> 'purchase'
    ), m AS (
      SELECT p.user_id, p.l_event, c.r_event
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.r_ts >= p.l_ts
       AND c.r_ts <= p.l_ts + INTERVAL 2 HOUR
    )
    SELECT user_id, l_event, r_event FROM m
    UNION ALL
    SELECT p.user_id, p.l_event, CAST(NULL AS BIGINT) AS r_event
    FROM p
    WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.l_event = p.l_event)
    UNION ALL
    SELECT c.user_id, CAST(NULL AS BIGINT) AS l_event, c.r_event
    FROM c
    WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.r_event = c.r_event)
    ORDER BY user_id, l_event, r_event
    """,
)
def stream_exec_stream_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER time-bounded join through the live
    engine — the completion of the join-mode matrix (inner:
    stream_exec_stream_join, leftOuter: stream_exec_stream_outer):
    BOTH sides' unmatched rows must surface as null-padded output when
    the watermark passes their state expiry, so a green row proves
    eviction-driven emission on the click side too (clicks before any
    purchase window — the majority class — each yield a null-l_event
    row). Same double-sentinel replay (_outer_replay_dir): the second
    sentinel batch runs with the first's watermark applied, flushing
    both sides' terminal state before the finite replay ends. The
    equi-key + time-range condition keeps state hash-partitioned and
    time-pruned on both sides — the only stream-stream shape that
    holds at 100 TB."""
    replay = _outer_replay_dir(spark, sf_dir)
    from fairy_spark.streaming.pipeline import (
        read_event_stream as _res,
        run_to_table as _rtt,
        stream_stream_join as _ssj,
    )

    left = _res(spark, replay).filter(F.col("event_type") == "purchase")
    right = _res(spark, replay).filter(F.col("event_type") != "purchase")
    joined = _ssj(left, right, key="user_id", within="2 hours", how="fullOuter")
    sink = _rtt(joined, mode="append")
    return (
        sink.filter(F.coalesce("user_id", F.lit(-1)) >= 0)
        .select("user_id", "l_event", "r_event")
        .orderBy("user_id", "l_event", "r_event")
    )
