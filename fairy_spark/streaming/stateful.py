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


# --- transformWithStateInPandas (Spark 4 typed-state API) ----------------

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_units", T.LongType()),
        T.StructField("n_records", T.LongType()),
    ]
)


def make_record_high_processor():
    """StatefulProcessor for transformWithStateInPandas — Spark 4's
    typed-state successor to applyInPandasWithState (ValueState with
    a declared schema in the state store, instead of an opaque
    tuple). Operator: per-user record-high tracking — running max of
    fixed-point value units plus how many times a NEW high appeared,
    scanning in event-time order. Order-sensitivity makes it a real
    state-fold test (a set-semantics reformulation couldn't count
    record events); fixed-point units make the fold exact. State per
    user is three bigints; micro-batch rows are sorted by
    (ts, event_id) before folding, and the replay feeds chunks in
    event-time order, so the stream fold equals the batch window
    twin row-for-row."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RecordHigh(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "rh", "max_units BIGINT, n_records BIGINT, n_events BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                mx, n_rec, n = self._state.get()
            else:
                mx, n_rec, n = None, 0, 0
            pdf = pd.concat(list(rows)).sort_values(["ts", "event_id"])
            for v in pdf["v6"]:
                v = int(v)
                n += 1
                if mx is None or v > mx:
                    mx = v
                    n_rec += 1
            self._state.update((mx, n_rec, n))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "max_units": [mx],
                    "n_records": [n_rec],
                }
            )

        def close(self) -> None:
            pass

    return RecordHigh()


def user_record_highs(stream: DataFrame) -> DataFrame:
    v6 = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    return (
        stream.select("user_id", "ts", "event_id", v6.alias("v6"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_record_high_processor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
