"""Engine façade — the public entry surface of fairy_spark.

The reference's entry points are an HTTP/2 put/get service
(common/src/h2/h2_service.rs:74-123) and a FUSE namespace
(fuse/src/uring_fuse/uring_fs/mod.rs). Ours are Python methods over a
SparkSession: ``sql`` for declarative queries, ``table`` for scans,
``kv`` for the blob store, ``catalog`` for namespace ops — the RPC /
process-boundary part of the reference is delegated to Spark's own
driver↔executor architecture (SURVEY.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fairy_spark.catalog import Catalog
from fairy_spark.config import EngineConfig
from fairy_spark.kv import KVStore
from fairy_spark.session import get_spark
from fairy_spark.sources import register_views


class Engine:
    def __init__(self, spark: SparkSession | None = None, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig.from_env()
        self.spark = spark or get_spark(self.cfg)
        self.catalog = Catalog(self.spark)
        self._kv: dict[str, KVStore] = {}

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def attach_testdata(self, sf_dir: str) -> dict[str, DataFrame]:
        return register_views(self.spark, sf_dir)

    def kv(self, name: str = "kv_default") -> KVStore:
        """Named KV store (reference: one LocalFileKVStore per worker,
        worker/src/main.rs; ours: one bucketed table per store name)."""
        if name not in self._kv:
            self._kv[name] = KVStore(self.spark, name, num_buckets=self.cfg.kv_num_buckets)
        return self._kv[name]

    def stop(self) -> None:
        self.spark.stop()
