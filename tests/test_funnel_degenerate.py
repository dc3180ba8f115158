"""Degenerate-corpus guard for events_window_funnel (ADVICE r10): with
zero step-1 ('view') events the engine must still return the full
3-row step grid with conv_ppm = 0 — matching the oracle's static-grid
shape — instead of an empty frame or a div-by-zero NULL."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_window_funnel_zero_view_corpus_keeps_grid(spark, tmp_path):
    from fairy_spark.queries.analytics import events_window_funnel

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "click", "2024-01-01 10:00:00"), (1, "purchase", "2024-01-01 11:00:00")],
        "user_id BIGINT, event_type STRING, ts STRING",
    ).select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    rows = events_window_funnel(spark, sf).collect()
    assert [(r["step"], r["n_users"], r["conv_ppm"]) for r in rows] == [
        (1, 0, 0),
        (2, 0, 0),
        (3, 0, 0),
    ]
