"""Custom connector via the Spark 4 Python DataSource API.

Reference parity: fairy's pluggable UFS scan layer
(client/src/ufs/mod.rs:5-34 — open a storage path, stream chunks)
re-expressed as a first-class DSv2 source: the engine asks the source
for partitions and columns, the source plans row-group-granular
splits and streams Arrow batches. This is the integration surface a
reference user would extend to attach a NEW storage system to the
engine — demonstrated end-to-end on parquet so the result is
oracle-checkable against the built-in scan.

Design points (the ones that matter at 100 TB):
  * partition planning = one InputPartition per parquet ROW GROUP —
    the same split granularity Spark's native parquet DSv2 source
    bottoms out at, so a 100 TB directory fans out to all executors
    instead of one task per file;
  * column pruning by contract: the reader receives the requested
    schema and passes exactly those columns to pyarrow, so unread
    columns never leave the file (footer-level pruning, not a
    post-read project);
  * Arrow-batch emission: ``read`` yields pyarrow RecordBatches, the
    vectorized fast path of the Python source API (row-tuple yield
    would be ~100× slower).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class RowGroupPartition(InputPartition):
    def __init__(self, path: str, row_group: int):
        self.path = path
        self.row_group = row_group


class ParquetRowGroupReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options["path"]

    def partitions(self):
        import glob
        import os

        import pyarrow.parquet as pq

        # A real table is a DIRECTORY of part files (any Spark-written
        # table); a single .parquet file is the testdata special case.
        # Either way the split granularity is (file, row group) — the
        # r6 sf1 audit caught the single-file assumption the moment the
        # source met a directory table.
        if os.path.isdir(self.path):
            files = sorted(glob.glob(os.path.join(self.path, "*.parquet")))
            if not files:
                # Hive-partitioned / nested layouts put part files below
                # subdirectories; a flat glob finding nothing must NOT
                # silently plan zero partitions (an empty scan that
                # reads as a correct empty table — ADVICE r6).
                files = sorted(
                    glob.glob(os.path.join(self.path, "**", "*.parquet"), recursive=True)
                )
            if not files:
                raise FileNotFoundError(
                    f"fairy_pqrg: no *.parquet files under {self.path!r} "
                    "(checked top-level and recursively)"
                )
        else:
            files = [self.path]
        return [
            RowGroupPartition(f, i)
            for f in files
            for i in range(pq.ParquetFile(f).metadata.num_row_groups)
        ]

    def read(self, partition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        cols = [f.name for f in self.schema.fields]
        yield from pf.read_row_group(partition.row_group, columns=cols).to_batches()


class ParquetRowGroupDataSource(DataSource):
    """``spark.read.format("fairy_pqrg").schema(...).option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "fairy_pqrg"

    def reader(self, schema) -> DataSourceReader:
        return ParquetRowGroupReader(schema, self.options)


def register_pydatasource(spark) -> None:
    spark.dataSource.register(ParquetRowGroupDataSource)
