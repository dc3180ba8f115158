"""Observability parity (SURVEY.md A28, A10-A12): metrics listener
accumulates task/job counters across queries; cluster_info reports
membership."""

from __future__ import annotations

import time

from fairy_spark.metrics import MetricsCollector, cluster_info
from fairy_spark.sources.tables import load_table


def test_metrics_collector_counts_work(spark, sf_dir):
    mc = MetricsCollector.attach(spark)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        li.groupBy("l_returnflag").count().collect()
        # listener events are async; poll briefly
        for _ in range(40):
            snap = mc.snapshot()
            if snap.n_jobs >= 1 and snap.n_tasks >= 1:
                break
            time.sleep(0.25)
        snap = mc.snapshot()
        assert snap.n_jobs >= 1
        assert snap.n_tasks >= 1
        assert snap.total_task_time_ms >= 0
    finally:
        mc.detach()


def test_cluster_info_shape(spark):
    info = cluster_info(spark)
    assert info["default_parallelism"] >= 1
    assert info["master"].startswith("local")
    assert info["app_id"]
