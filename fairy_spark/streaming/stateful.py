"""Custom stateful streaming operator via applyInPandasWithState.

The one streaming shape built-in operators can't express: arbitrary
per-key state evolved across micro-batches. The reference's analog is
the worker folding arriving chunks into its store keyed by id
(common/src/h2/h2_service.rs:89-109 put path); here the state is a
typed per-user accumulator instead of a blob.

Operator: per-user running statistics — event count, value sum, and
an exponentially-weighted moving average of `value` in event-time
order. EMA is order-sensitive, so each micro-batch's rows are sorted
by (ts, event_id) before folding; the replay feeds chunks in
event-time order (pipeline.replay_dir_from_events), which mirrors a
log-ordered source at scale (kafka partition, CDC stream).

Scale notes: state is O(distinct users) × a few scalars, hash-
partitioned across executors by the groupBy key — the same partition
contract as any shuffle. GroupStateTimeout would bound state for
unbounded key spaces; the replay is finite so no timeout here.

Batch equivalence (tests/test_streaming.py): the same fold over the
full table, expressed with window functions, must produce identical
final state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n BIGINT, total DOUBLE, ema DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("ema", T.DoubleType()),
    ]
)

EMA_ALPHA = 0.125


def _fold_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, ema = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            v = float(v)
            n += 1
            total += v
            ema = v if ema is None else EMA_ALPHA * v + (1 - EMA_ALPHA) * ema
    state.update((n, total, ema))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "total": [total], "ema": [ema]}
    )


def user_running_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator over a stream of events. Update output
    mode: each micro-batch emits the latest state per touched user."""
    return (
        stream.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_running_stats_batch(events: DataFrame) -> DataFrame:
    """Batch-mode ground truth for user_running_stats' FINAL state:
    fold the same EMA recurrence with aggregate() over the event-time-
    ordered value sequence — pure built-ins, no Python in the plan."""
    seq = (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("evs")
        )
    )
    ema = F.aggregate(
        F.col("evs"),
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["value"]).otherwise(
            F.lit(EMA_ALPHA) * x["value"] + F.lit(1 - EMA_ALPHA) * acc
        ),
    )
    return seq.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n"),
        F.aggregate(
            F.col("evs"), F.lit(0.0), lambda acc, x: acc + x["value"]
        ).alias("total"),
        ema.alias("ema"),
    )
