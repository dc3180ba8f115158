"""Structured Streaming replay tests: the streaming pipeline over a
chunked replay of the events table must converge to the batch result
(SURVEY.md §5.2 batch-equivalence)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fairy_spark.sources.tables import load_table
from fairy_spark.streaming.pipeline import (
    read_event_stream,
    replay_dir_from_events,
    run_to_completion,
    session_windows,
    stateful_dedup,
    stream_static_join,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark):
    d = tempfile.mkdtemp(prefix="fairy_stream_")
    replay_dir_from_events(spark, SF, d, n_chunks=4)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_tumbling_stream_matches_batch(spark, replay_dir):
    stream = read_event_stream(spark, replay_dir)
    got = run_to_completion(tumbling_counts(stream), mode="append")
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
        .collect()
    )
    key = lambda r: (r["w_start"], r["event_type"])
    got_map = {key(r): (r["n"], r["total_value"]) for r in got}
    batch_map = {key(r): (r["n"], r["total_value"]) for r in batch}
    # append mode only emits windows the watermark has closed; every
    # emitted window must match batch exactly, and most windows close.
    assert got_map, "stream emitted nothing"
    for k, v in got_map.items():
        assert batch_map[k] == v, f"window {k}: stream={v} batch={batch_map[k]}"
    assert len(got_map) >= 0.8 * len(batch_map)


def test_stateful_dedup_stream(spark, replay_dir):
    stream = read_event_stream(spark, replay_dir)
    got = run_to_completion(stateful_dedup(stream), mode="append")
    n_batch = load_table(spark, SF, "events").select("event_id").distinct().count()
    assert len(got) == n_batch
    assert len({r["event_id"] for r in got}) == len(got)


def test_session_window_stream(spark, replay_dir):
    stream = read_event_stream(spark, replay_dir)
    got = run_to_completion(session_windows(stream, gap="30 minutes"), mode="append")
    assert got, "no sessions emitted"
    # sessions are per-user, start <= end, positive counts
    for r in got:
        assert r["s_start"] <= r["s_end"]
        assert r["n_events"] >= 1


def test_stream_static_join(spark, replay_dir):
    stream = read_event_stream(spark, replay_dir)
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    got = run_to_completion(
        stream_static_join(stream, dim, "user_id").select("event_id", "user_id", "c_mktsegment")
    )
    batch = (
        load_table(spark, SF, "events")
        .join(dim, "user_id")
        .count()
    )
    assert len(got) == batch


def test_stateful_custom_operator_matches_batch(spark, replay_dir):
    """applyInPandasWithState running stats: the final per-user state
    after replaying all chunks must equal the batch fold (count, sum,
    event-time-ordered EMA)."""
    from fairy_spark.streaming.stateful import (
        user_running_stats,
        user_running_stats_batch,
    )

    stream = read_event_stream(spark, replay_dir)
    got = run_to_completion(user_running_stats(stream), mode="update")
    # update mode re-emits per micro-batch; final state = last emit per user
    final = {}
    for r in got:
        final[r["user_id"]] = r  # memory sink preserves batch order
    batch = {r["user_id"]: r for r in user_running_stats_batch(
        load_table(spark, SF, "events")).collect()}
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s["n"] == b["n"], uid
        assert abs(s["total"] - b["total"]) < 1e-6, uid
        assert abs(s["ema"] - b["ema"]) < 1e-6, uid
