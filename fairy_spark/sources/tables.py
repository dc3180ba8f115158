"""Testdata table loading (TESTDATA.md star schema + events/documents/embeddings).

Scans are plain ``spark.read.parquet`` so Catalyst's parquet source
handles predicate pushdown, column pruning, and split planning
(analog of the reference's chunked file read, worker/src/h2_service.rs:93-121,
where 'chunk' ≈ parquet row-group / maxPartitionBytes split).

At 100 TB these would be partitioned/bucketed catalog tables, but the
access pattern is the same: the engine asks for columns + predicates
and the source prunes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables — always broadcast-join candidates. At 100 TB
# these stay small (region=5, nation=25 rows at every SF).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def sf_cache_key(sf_dir: str) -> str:
    """Collision-free cache-directory key for an sf_dir: a hash of the
    FULL absolute path. Keying scratch/replay dirs on basename(sf_dir)
    let two different dirs with the same basename (/a/sf0.1 vs
    /b/sf0.1) share one _READY-marked cache inside one application
    (ADVICE r8). The basename stays as a readable prefix only."""
    import hashlib

    full = os.path.abspath(sf_dir.rstrip("/"))
    h = hashlib.sha256(full.encode()).hexdigest()[:12]
    return f"{os.path.basename(full)}_{h}"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): unreadable in Spark 4
        # unless nanosAsLong is on. Set it at runtime so the engine
        # works on ANY session handed to us (the external driver's
        # vanilla session doesn't carry our builder config).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts arrives as long ns-since-epoch (nanosAsLong); convert to a
        # microsecond TimestampType with integer division — going through
        # double would lose precision at 1e18 magnitudes. DuckDB reads the
        # same column as µs-truncated TIMESTAMP, so the engines agree.
        from pyspark.sql import functions as F, types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # ns-long → TIMESTAMP_NTZ by pure epoch arithmetic:
            # timestamp_micros() would produce a tz-sensitive TIMESTAMP
            # whose collected value depends on the session timezone —
            # NTZ matches DuckDB's naive read of the same column and is
            # session-tz-independent (all other testdata timestamps are
            # already read as NTZ because isAdjustedToUTC=false).
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view so ``spark.sql``
    queries see the same names the DuckDB oracle uses."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
