"""Predicate pushdown through the Spark 4 Python DataSource API
(sources/pydatasource.py PushdownRowGroupReader): planning-time
row-group pruning from parquet footer stats, with Spark re-applying
every filter post-scan (semantics never depend on the pruning)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from fairy_spark.sources.pydatasource import (
    PushdownRowGroupReader,
    register_pydatasource_pushdown,
)


@pytest.fixture()
def rg_file(tmp_path):
    """One parquet file, 10 row groups of 100 rows, k sorted — tight
    disjoint min/max stats per row group."""
    path = str(tmp_path / "stats.parquet")
    t = pa.table({"k": list(range(1000)), "v": [i * 2 for i in range(1000)]})
    pq.write_table(t, path, row_group_size=100)
    assert pq.ParquetFile(path).metadata.num_row_groups == 10
    return path


def _reader(path, pushed_filters):
    from pyspark.sql.types import LongType, StructField, StructType

    # built without fromDDL: the planning-side tests below need no
    # SparkSession at all — the reader is plain Python
    schema = StructType([StructField("k", LongType()), StructField("v", LongType())])
    r = PushdownRowGroupReader(schema, {"path": path})
    leftover = list(r.pushFilters(pushed_filters))
    return r, leftover


def test_row_group_pruning_from_stats(rg_file):
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r0, _ = _reader(rg_file, [])
    assert len(r0.partitions()) == 10

    filters = [GreaterThanOrEqual(("k",), 250), LessThan(("k",), 450)]
    r, leftover = _reader(rg_file, filters)
    # every filter is handed back for Spark to re-apply
    assert leftover == filters
    parts = r.partitions()
    # rows 250..449 live in row groups 2, 3, 4 only
    assert len(parts) == 3
    assert sorted(p.row_group for p in parts) == [2, 3, 4]


def test_equal_to_prunes_to_one_group(rg_file):
    from pyspark.sql.datasource import EqualTo

    r, _ = _reader(rg_file, [EqualTo(("k",), 777)])
    parts = r.partitions()
    assert [p.row_group for p in parts] == [7]


def test_unsupported_filters_are_kept_not_pruned(rg_file):
    from pyspark.sql.datasource import EqualTo, IsNotNull

    r, leftover = _reader(rg_file, [IsNotNull(("k",)), EqualTo(("missing",), 5)])
    assert len(leftover) == 2
    # unknown column / unsupported filter never prunes
    assert len(r.partitions()) == 10


def test_end_to_end_matches_builtin_scan(spark, rg_file):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        register_pydatasource_pushdown(spark)
        got = (
            spark.read.format("fairy_pqrg_fp")
            .schema("k long, v long")
            .option("path", rg_file)
            .load()
            .filter((F.col("k") >= 123) & (F.col("k") < 457))
            .orderBy("k")
            .collect()
        )
        want = (
            spark.read.parquet(rg_file)
            .filter((F.col("k") >= 123) & (F.col("k") < 457))
            .orderBy("k")
            .collect()
        )
        assert got == want and len(got) == 457 - 123
    finally:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")
