"""Bounded materialization pool (operators/pool.py, r14) — the
recompute-amplification fix's shared utility: persist-mode keeps
statistics (broadcast-friendly), checkpoint-mode cuts lineage to a
LogicalRDD leaf (no CacheManager entry), values are never changed, and
eviction is bounded FIFO per named pool."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_spark.operators.pool import clear_pool, park_persisted


def _vals(df):
    return sorted(map(tuple, df.collect()))


def test_persist_mode_preserves_values_and_is_cached(spark):
    try:
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        parked = park_persisted("t_persist", df)
        assert _vals(parked) == _vals(df)
        assert parked.storageLevel.useMemory  # really persisted
    finally:
        clear_pool("t_persist")


def test_checkpoint_mode_cuts_lineage_and_preserves_values(spark):
    try:
        df = spark.range(50).withColumn("v", F.col("id") + 7)
        parked = park_persisted("t_ckpt", df, checkpoint=True)
        assert _vals(parked) == _vals(df)
        # lineage is cut: the logical plan is a scan of materialized
        # partitions, not the original Range + Project chain
        assert "LogicalRDD" in parked._jdf.queryExecution().logical().toString()
    finally:
        clear_pool("t_ckpt")


def test_pool_eviction_is_bounded_and_fifo(spark):
    from fairy_spark.operators import pool as pool_mod

    try:
        frames = [
            park_persisted("t_evict", spark.range(10 + i), cap=2)
            for i in range(4)
        ]
        kept = pool_mod._POOLS["t_evict"]
        assert len(kept) == 2
        # oldest two evicted and unpersisted; newest two still cached
        assert not frames[0].storageLevel.useMemory
        assert not frames[1].storageLevel.useMemory
        assert frames[2].storageLevel.useMemory
        assert frames[3].storageLevel.useMemory
        # evicted frames still produce correct values (recompute path)
        assert _vals(frames[0]) == [(i,) for i in range(10)]
    finally:
        clear_pool("t_evict")


def test_clear_pool_all(spark):
    a = park_persisted("t_a", spark.range(5))
    park_persisted("t_b", spark.range(5), checkpoint=True)
    clear_pool()
    from fairy_spark.operators import pool as pool_mod

    assert pool_mod._POOLS == {}
    assert not a.storageLevel.useMemory
