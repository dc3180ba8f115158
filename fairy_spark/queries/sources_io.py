"""Source/sink round-trips: CSV + JSON scans, parquet sink (SURVEY.md §2.B scans/sinks).

Generalizes the reference's ingest/serve pair (h2 put_object/get_object,
common/src/h2/h2_service.rs:89-123) to format-typed columnar IO: each
query WRITES testdata out through a sink, READS it back through the
corresponding source with an explicit schema (never inference — at
100 TB schema inference is a full extra pass), and aggregates; the
oracle computes the same aggregate straight from parquet, so a match
proves lossless round-trip.

Sink layout is scale-minded: parquet sink is partitioned by the read
predicate's column so the read-back scan partition-prunes (the moral
analog of the reference's hash-dir placement, local_file_kv_store.rs:62-70).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from fairy_spark.functions.exact import money_sum
from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table, sf_cache_key

_IO_ROOT = os.environ.get("FAIRY_SPARK_IO_DIR", "/tmp/fairy_spark_io")


def _scratch(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Per-application scratch dir: two concurrent sessions running the
    same sink round-trip (bench + tests happen in this repo) must not
    overwrite each other's in-flight sink, so the path is scoped by
    applicationId (unique per SparkContext)."""
    app_id = spark.sparkContext.applicationId
    return os.path.join(
        _IO_ROOT, app_id, sf_cache_key(sf_dir), name
    )


@register(
    "scan_csv_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def scan_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → pipe-delimited CSV with header → explicit-schema read
    → aggregate. Proves the CSV source/sink pair preserves values.
    Totals sum exact integer cents (order-free) — a ~7e9 double sum
    diverges between engines beyond 6-decimal rounding at sf0.1."""
    path = _scratch(spark, sf_dir, "orders_csv")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    (
        load_table(spark, sf_dir, "orders")
        .select(*cols)
        .write.mode("overwrite")
        .options(header=True, sep="|")
        .csv(path)
    )
    back = spark.read.schema(
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
        " o_totalprice DOUBLE, o_orderpriority STRING"
    ).options(header=True, sep="|").csv(path)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")) / 100.0).alias(
                "total"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "scan_json_roundtrip",
    oracle="""
    SELECT lang,
           COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS text_len
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def scan_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSON-lines → explicit-schema read → aggregate.
    Unicode text survives the round-trip byte-exact."""
    path = _scratch(spark, sf_dir, "documents_json")
    (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", "n_chars", "text")
        .write.mode("overwrite")
        .json(path)
    )
    back = spark.read.schema(
        "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT, text STRING"
    ).json(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
            F.sum(F.length("text")).alias("text_len"),
        )
        .orderBy("lang")
    )


@register(
    "sink_parquet_partitioned",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 6) AS qty
    FROM lineitem
    WHERE l_returnflag = 'A' AND l_quantity > 5
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → parquet partitioned by l_returnflag → read back with
    a partition predicate. The read-back filter prunes to the one
    l_returnflag=A directory (checked in test_plans.py) — at 100 TB
    that's the difference between scanning 1/3 and 3/3 of the table."""
    path = _scratch(spark, sf_dir, "lineitem_parquet")
    (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 5)
        .select("l_orderkey", "l_quantity", "l_linestatus", "l_returnflag")
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "A")
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 6).alias("qty"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "catalog_list_columns",
    oracle="""
    SELECT column_name
    FROM information_schema.columns
    WHERE table_name = 'lineitem'
    ORDER BY column_name
    """,
)
def catalog_list_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog describe (reference A13-A19 inode/metadata namespace →
    spark.catalog): column listing for a registered table, as a
    DataFrame so the driver can name-set-compare it against DuckDB's
    information_schema."""
    from fairy_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    cols = [c.name for c in spark.catalog.listColumns("lineitem")]
    return (
        spark.createDataFrame([(c,) for c in cols], "column_name string")
        .orderBy("column_name")
    )


@register(
    "scan_orc_roundtrip",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total,
           CAST(SUM(l_quantity) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem → ORC → read back → aggregate. ORC is the third
    columnar format a reference user migrating a warehouse would
    bring; Spark's ORC source supports the same predicate pushdown
    and column pruning as parquet, so the engine surface is identical.
    Timestamps and doubles must survive the round-trip bit-exact."""
    path = _scratch(spark, sf_dir, "lineitem_orc")
    cols = ["l_orderkey", "l_returnflag", "l_extendedprice", "l_quantity", "l_shipdate"]
    load_table(spark, sf_dir, "lineitem").select(*cols).write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("l_extendedprice"), unit=100).alias("total"),
            F.sum("l_quantity").cast("double").alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "scan_binaryfile_ingest",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    WHERE doc_id <= 64
    ORDER BY doc_id
    """,
)
def scan_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-blob ingest via the binaryFile source — the multimodal
    on-ramp (SURVEY.md LLM surface): one file per object, read back as
    (path, length, content binary) rows with typed metadata. Export
    runs on the executors (foreachPartition, one blob per row — at
    cluster scale the target is shared storage, here the local scratch
    dir); the byte length and sha256 must survive the round-trip
    exactly, proving the binary column is carried opaquely."""
    import shutil

    path = _scratch(spark, sf_dir, "docs_blobs")
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 64)
        .select("doc_id", "text")
    )

    def _export(rows) -> None:
        for r in rows:
            with open(os.path.join(path, f"doc_{r['doc_id']:06d}.bin"), "wb") as f:
                f.write(r["text"].encode("utf-8"))

    docs.foreachPartition(_export)
    back = spark.read.format("binaryFile").load(path)
    return (
        back.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").alias("n_bytes"),
            F.sha2(F.col("content"), 256).alias("content_sha"),
        )
        .orderBy("doc_id")
    )


@register(
    "scan_text_parse",
    oracle="""
    SELECT l_returnflag AS flag,
           COUNT(*) AS n,
           CAST(SUM(l_orderkey + l_linenumber) AS BIGINT) AS key_sum
    FROM lineitem
    WHERE l_suppkey <= 20
    GROUP BY l_returnflag
    ORDER BY flag
    """,
)
def scan_text_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-line ingest: a lineitem slice → one delimited line per row
    through the text sink → spark.read.text → columns parsed out of
    `value` — the classic log-file ingestion path. Split + cast stay
    whole-stage-codegen; integer aggregates keep the compare exact."""
    path = _scratch(spark, sf_dir, "lineitem_text")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    (
        li.select(
            F.concat_ws("|", "l_orderkey", "l_linenumber", "l_returnflag").alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
    parts = F.split(F.col("value"), r"\|")
    return (
        spark.read.text(path)
        .select(
            parts.getItem(0).cast("bigint").alias("l_orderkey"),
            parts.getItem(1).cast("bigint").alias("l_linenumber"),
            parts.getItem(2).alias("flag"),
        )
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_orderkey") + F.col("l_linenumber")).alias("key_sum"),
        )
        .orderBy("flag")
    )


@register(
    "scan_merge_schema",
    oracle="""
    SELECT COALESCE(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
                         THEN NULL ELSE o_orderpriority END, '<absent>') AS priority,
           COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    GROUP BY priority
    ORDER BY priority
    """,
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the scan: an early ingest batch wrote
    (o_orderkey, o_totalprice); a later batch added o_orderpriority.
    `mergeSchema=true` unions the footers — old rows surface NULL for
    the added column, exactly the semantics a 100 TB append-only lake
    table needs when producers upgrade independently. The oracle
    derives the same union from the source table (pre-cutover rows →
    NULL priority). Scale note: mergeSchema is a FOOTER-ONLY
    operation (one task per file reads metadata, no data scan), so
    evolution costs nothing at read time; the expensive anti-pattern
    is rewriting old files to backfill the column."""
    path = _scratch(spark, sf_dir, "orders_evolved")
    o = load_table(spark, sf_dir, "orders")
    cutover = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    (
        o.filter(F.col("o_orderdate") < cutover)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(path + "/batch=old")
    )
    (
        o.filter(F.col("o_orderdate") >= cutover)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .parquet(path + "/batch=new")
    )
    back = spark.read.option("mergeSchema", "true").parquet(
        path + "/batch=old", path + "/batch=new"
    )
    return (
        back.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<absent>")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")) / 100.0).alias(
                "total"
            ),
        )
        .orderBy("priority")
    )


@register(
    "scan_python_datasource",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through a CUSTOM connector built on the Spark 4 Python
    DataSource API (sources/pydatasource.py) — the pluggable-storage
    surface a reference user extends to attach a new system
    (client/src/ufs/mod.rs:5-34's UFS abstraction, re-expressed as
    DSv2). The source plans one InputPartition per parquet ROW GROUP
    (native-parquet split granularity — a 100 TB directory fans out
    to every executor), receives the 2-column pruned schema by
    contract (unread columns never leave the file footers), and
    streams Arrow RecordBatches (the vectorized path; row-tuple
    yield is ~100× slower). The oracle aggregates the same file via
    the built-in scan, so a hash match proves the connector is
    byte-faithful, not just plausible."""
    from fairy_spark.sources.pydatasource import register_pydatasource
    from fairy_spark.sources.tables import table_path

    register_pydatasource(spark)
    df = (
        spark.read.format("fairy_pqrg")
        .schema("l_returnflag string, l_quantity double")
        .option("path", table_path(sf_dir, "lineitem"))
        .load()
    )
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
        .orderBy("l_returnflag")
    )


def _zvalue(x, y):
    """Morton (Z-order) interleave of two 16-bit keys — bit i of x
    lands at position 2i, bit i of y at 2i+1. Pure codegen'd shifts,
    no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(16):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


@register(
    "sink_zorder_layout",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    WHERE l_partkey BETWEEN 100 AND 300
      AND l_suppkey BETWEEN 10 AND 30
    """,
)
def sink_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered rewrite (Morton-curve data layout, public —
    the technique behind Delta/Iceberg OPTIMIZE ZORDER): lineitem is
    range-repartitioned and sorted by the bit-interleaved
    (partkey, suppkey) Morton code before the parquet write, so rows
    close in BOTH key dimensions land in the same row groups and a
    2D box predicate prunes on min/max stats for both columns — a
    single-column sort would cluster one dimension and scatter the
    other. The Morton code is 32 codegen'd shift/mask expressions
    (no UDF); repartitionByRange on z gives globally disjoint z
    ranges per file. The read-back runs the 2D box through the
    clustered copy; the oracle runs it on the ORIGINAL table, so a
    hash match proves the rewrite is content-preserving (layout
    changed, relation identical). At 100 TB this is the difference
    between scanning ~(selectivity) of the data and scanning one
    full dimension stripe."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    out = _scratch(spark, sf_dir, "zorder")
    # Normalize BOTH keys to the full 16-bit domain before
    # interleaving (1-row max frame, broadcast): raw interleave of
    # unequal-magnitude keys degenerates — the wider key's high bits
    # monopolize the top of z, and the z-ranges split on that key
    # alone (observed: suppkey span stayed 1.0 per file). Real
    # Z-order implementations range-normalize for exactly this
    # reason.
    stats = li.agg(
        F.max("l_partkey").alias("pk_max"), F.max("l_suppkey").alias("sk_max")
    )
    pk16 = (F.col("l_partkey") * 65535 / F.col("pk_max")).cast("bigint")
    sk16 = (F.col("l_suppkey") * 65535 / F.col("sk_max")).cast("bigint")
    (
        li.crossJoin(F.broadcast(stats))
        .withColumn("z", _zvalue(pk16, sk16))
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .drop("z", "pk_max", "sk_max")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(
        F.col("l_partkey").between(100, 300) & F.col("l_suppkey").between(10, 30)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
    )


def _zvalue_sql(pk: str = "pk16", sk: str = "sk16") -> str:
    """DuckDB mirror of _zvalue's 16-bit Morton interleave."""
    terms = []
    for i in range(16):
        terms.append(f"((({pk} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({sk} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "sink_zorder_skip_stats",
    oracle=f"""
    WITH s AS (
      SELECT MAX(l_partkey) AS pk_max, MAX(l_suppkey) AS sk_max FROM lineitem
    ), k AS (
      SELECT l_partkey, l_suppkey,
             CAST(FLOOR(l_partkey * 65535.0 / pk_max) AS BIGINT) AS pk16,
             CAST(FLOOR(l_suppkey * 65535.0 / sk_max) AS BIGINT) AS sk16
      FROM lineitem, s
    ), z AS (
      SELECT l_partkey, l_suppkey, CAST({_zvalue_sql()} AS BIGINT) AS z, pk16
      FROM k
    ), b AS (
      SELECT l_partkey, l_suppkey, CAST(z >> 26 AS INTEGER) AS bucket,
             'zorder' AS layout
      FROM z
      UNION ALL
      SELECT l_partkey, l_suppkey, CAST(pk16 >> 10 AS INTEGER) AS bucket,
             'single' AS layout
      FROM z
    ), st AS (
      SELECT layout, bucket,
             MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
             MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax,
             COUNT(*) AS n
      FROM b GROUP BY layout, bucket
    ), hi AS (
      SELECT layout, n,
             NOT (pmax * 100 < pk_max * 5 OR pmin * 100 > pk_max * 40
                  OR smax * 100 < sk_max * 10 OR smin * 100 > sk_max * 20)
               AS hit
      FROM st, s
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit_buckets,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN hit THEN n ELSE 0 END) AS BIGINT)
             AS rows_scanned
    FROM hi GROUP BY layout ORDER BY layout
    """,
)
def sink_zorder_skip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-COLUMN FILE-SKIPPING MEASUREMENT (VERDICT r7 #8c — the
    second Z-order proof): quantifies, as hash-checked numbers, how
    many data files a min/max-pruning reader must touch for a 2D box
    under two layouts of the SAME relation. The box is RELATIVE to the
    key domain — partkey in [5%, 40%] of pk_max (wide), suppkey in
    [10%, 20%] of sk_max (narrow) — via cross-multiplied integer
    predicates, so the measurement doesn't degenerate as the domain
    grows with SF (a fixed literal box shrank below one bucket by
    sf0.1). The wide×narrow shape is where multi-column clustering
    genuinely pays: a partkey-only layout prunes the wide partkey
    range poorly and cannot prune suppkey at all.

    * zorder — rows bucketed by the TOP 6 BITS of the Morton code of
      the range-normalized keys (a deterministic z-prefix split, so
      the oracle reproduces bucket membership exactly —
      repartitionByRange would sample), physically written as 64
      partitioned parquet directories and READ BACK so the per-bucket
      key envelopes come from the real files;
    * single — the same rows split on the leading 6 bits of partkey
      alone (the one-dimensional strawman), evaluated logically.

    A bucket is hit when its [min,max] envelope on BOTH keys
    intersects the box — exactly the decision a parquet footer-stats
    reader (or Delta/Iceberg data-skipping index) makes per file.
    rows_scanned is the I/O a pruning scan pays: the z-layout confines
    the box to buckets whose BOTH prefixes match (~pk_frac×sk_frac of
    the data, grid-rounded) while the single layout reads every
    suppkey for each matching partkey stripe (~pk_frac). At 100 TB the
    bucket count scales with file count and the same arithmetic
    applies per row group; `sink_zorder_layout` separately proves the
    clustered rewrite is content-preserving."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    stats = li.agg(
        F.max("l_partkey").alias("pk_max"), F.max("l_suppkey").alias("sk_max")
    )
    pk16 = (F.col("l_partkey") * 65535 / F.col("pk_max")).cast("bigint")
    sk16 = (F.col("l_suppkey") * 65535 / F.col("sk_max")).cast("bigint")
    keyed = (
        li.crossJoin(F.broadcast(stats))
        .withColumn("pk16", pk16)
        .withColumn("sk16", sk16)
        .withColumn("z", _zvalue(F.col("pk16"), F.col("sk16")))
    )
    out = _scratch(spark, sf_dir, "zorder_skip")
    (
        keyed.withColumn("bucket", F.shiftright("z", 26).cast("int"))
        .select("l_partkey", "l_suppkey", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    z_leg = (
        spark.read.parquet(out)
        .select("bucket", "l_partkey", "l_suppkey")
        .withColumn("layout", F.lit("zorder"))
    )
    s_leg = keyed.select(
        F.shiftright("pk16", 10).cast("int").alias("bucket"),
        "l_partkey",
        "l_suppkey",
    ).withColumn("layout", F.lit("single"))
    st = (
        z_leg.unionByName(s_leg)
        .groupBy("layout", "bucket")
        .agg(
            F.min("l_partkey").alias("pmin"),
            F.max("l_partkey").alias("pmax"),
            F.min("l_suppkey").alias("smin"),
            F.max("l_suppkey").alias("smax"),
            F.count(F.lit(1)).alias("n"),
        )
        .crossJoin(F.broadcast(stats))
    )
    hit = ~(
        (F.col("pmax") * 100 < F.col("pk_max") * 5)
        | (F.col("pmin") * 100 > F.col("pk_max") * 40)
        | (F.col("smax") * 100 < F.col("sk_max") * 10)
        | (F.col("smin") * 100 > F.col("sk_max") * 20)
    )
    return (
        st.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(hit.cast("bigint")).alias("n_hit_buckets"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum(F.when(hit, F.col("n")).otherwise(0)).cast("bigint").alias(
                "rows_scanned"
            ),
        )
        .orderBy("layout")
    )


@register(
    "scan_csv_malformed",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE doc_id % 7 != 0) AS BIGINT) AS parsed,
           CAST(COUNT(*) FILTER (WHERE doc_id % 7 = 0) AS BIGINT) AS corrupt,
           CAST(SUM(CASE WHEN doc_id % 7 != 0 THEN n_chars ELSE 0 END)
                AS BIGINT) AS parsed_chars,
           CAST(SUM(CASE WHEN doc_id % 7 != 0 THEN doc_id ELSE 0 END)
                AS BIGINT) AS parsed_id_sum
    FROM documents
    WHERE doc_id < 300
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode malformed-record handling — the ingestion
    reality check every feed pipeline needs: a CSV batch is written
    with every 7th record deliberately broken (wrong delimiter, non-
    numeric fields), read back with an explicit schema +
    columnNameOfCorruptRecord, and the engine must (a) keep every
    good row bit-intact, (b) quarantine every bad row into the
    corrupt column rather than dropping or crashing (FAILFAST), and
    (c) agree with the oracle's ground-truth corruption rule on the
    exact counts. At 100 TB this is the difference between one bad
    upstream record poisoning a load and a quarantine table you can
    triage; the corrupt column is populated per-row at parse time —
    row-local, no extra pass."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "n_chars", "lang")
    )
    line = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("bad|"), F.col("doc_id").cast("string"), F.lit("|oops")),
    ).otherwise(
        F.concat_ws(",", F.col("doc_id"), F.col("n_chars"), F.col("lang"))
    )
    out = _scratch(spark, sf_dir, "csv_malformed")
    d.select(line.alias("value")).write.mode("overwrite").text(out)
    back = (
        spark.read.schema(
            "doc_id INT, n_chars INT, lang STRING, _bad STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(out)
    )
    # Load-bearing subtlety: corrupt-record detection is evaluated
    # over the REQUIRED column set only — an aggregate that prunes
    # doc_id out of the scan never attempts the failing int parse,
    # and the malformed rows sail through as all-null "good" rows
    # (observed; the Spark docs' cache-first caveat is this same
    # behavior). Summing doc_id keeps the failing field required, so
    # quarantine works under column pruning.
    return back.agg(
        F.count_if(F.col("_bad").isNull()).alias("parsed"),
        F.count_if(F.col("_bad").isNotNull()).alias("corrupt"),
        F.sum(F.when(F.col("_bad").isNull(), F.col("n_chars")).otherwise(0)).alias(
            "parsed_chars"
        ),
        F.sum(F.when(F.col("_bad").isNull(), F.col("doc_id")).otherwise(0)).alias(
            "parsed_id_sum"
        ),
    )


@register(
    "scan_glob_filter",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY priority
    ORDER BY priority
    """,
)
def scan_glob_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-level file selection (pathGlobFilter): orders are written
    into per-priority subdirectories, then ONLY the urgent/high files
    are read back via a glob on the FILE names — selection happens at
    listing time, before any footer or row is touched (one tier
    earlier than partition pruning, which still lists everything).
    The data-lake hygiene tool for 'just the 2024-* files' reads over
    directories that aren't Hive-partitioned. The oracle filters
    relationally; a hash match proves glob selection == predicate
    selection for this layout. Each subdir write is one job here;
    production would write once partitioned — the READ side is the
    surface under test."""
    o = load_table(spark, sf_dir, "orders")
    out = _scratch(spark, sf_dir, "glob_orders")
    pri_tag = F.regexp_replace(F.col("o_orderpriority"), "[^0-9A-Za-z]", "_")
    tags = [r["t"] for r in o.select(pri_tag.alias("t")).distinct().collect()]
    for t in sorted(tags):
        (
            o.filter(pri_tag == t)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"pri={t}"))
        )
    back = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(out, "pri=1_URGENT"), os.path.join(out, "pri=2_HIGH"))
    )
    return (
        back.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "total_cents"
            ),
        )
        .orderBy("priority")
    )


@register(
    "sink_dynamic_partition_overwrite",
    oracle="""
    WITH final AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderpriority = '1-URGENT'
                  THEN o_totalprice + 1000 ELSE o_totalprice END AS price
      FROM orders
    )
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(price * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
    FROM final
    GROUP BY priority
    ORDER BY priority
    """,
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (partitionOverwriteMode=dynamic —
    INSERT OVERWRITE's surgical form): the full table is written
    partitioned by priority, then a SECOND overwrite write containing
    ONLY corrected 1-URGENT rows (+1000 price) replaces exactly that
    partition, leaving the other four untouched — STATIC mode would
    have wiped them (the classic production data-loss footgun this
    row pins). The read-back aggregate must equal the
    oracle's derived final state: urgent rows corrected once,
    everything else byte-original — proving the overwrite neither
    leaked old urgent rows nor touched sibling partitions. At 100 TB
    this is how late-arriving corrections land without rewriting the
    table."""
    o = load_table(spark, sf_dir, "orders")
    out = _scratch(spark, sf_dir, "dyn_overwrite")
    (
        o.write.mode("overwrite")
        .partitionBy("o_orderpriority")
        .parquet(out)
    )
    corrected = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            corrected.write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(out)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    back = spark.read.parquet(out)
    return (
        back.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "total_cents"
            ),
        )
        .orderBy("priority")
    )


@register(
    "scan_pydatasource_pushdown",
    oracle="""
    SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
    WHERE l_orderkey >= 1000 AND l_orderkey <= 2000
    ORDER BY l_orderkey, l_partkey, qty
    """,
)
def scan_pydatasource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushdown through the Python DataSource boundary
    (VERDICT r6 #6b): lineitem is rewritten range-partitioned on
    l_orderkey (4 disjoint files — each file one row group with tight
    footer stats), then scanned through ``fairy_pqrg_fp``
    (sources/pydatasource.py PushdownRowGroupReader): Spark pushes
    the two range filters via pushFilters, the reader evaluates them
    against row-group min/max statistics at PLANNING time and never
    plans the provably-empty row groups as partitions — the
    footer-stats skip of a native parquet scan, demonstrated through
    the user-pluggable connector. Filters are also re-applied by
    Spark post-scan (the reader returns them all), so pruning is
    strictly a planning optimization — the oracle reads the original
    table with plain SQL. tests/test_pydatasource_pushdown.py
    asserts the partition count actually shrinks."""
    from fairy_spark.sources.pydatasource import register_pydatasource_pushdown
    from fairy_spark.sources.tables import load_table as _lt

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register_pydatasource_pushdown(spark)
    target = _scratch(spark, sf_dir, "pushdown_lineitem")
    (
        _lt(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity")
        .repartitionByRange(4, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(target)
    )
    df = (
        spark.read.format("fairy_pqrg_fp")
        .schema("l_orderkey long, l_partkey long, l_quantity double")
        .option("path", target)
        .load()
    )
    return (
        df.filter((F.col("l_orderkey") >= 1000) & (F.col("l_orderkey") <= 2000))
        .select(
            "l_orderkey",
            "l_partkey",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .orderBy("l_orderkey", "l_partkey", "qty")
    )


@register(
    "sink_csv_compressed",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def sink_csv_compressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-codec sink/scan round-trip: orders → GZIP CSV →
    explicit-schema read-back → exact-cents aggregate. The codec is
    part of the checked path (Spark auto-detects .gz on read — the
    splittability trade-off every 100 TB pipeline weighs: gzip parts
    are whole-file splits, so part-file COUNT, set by the upstream
    partitioning, is the read parallelism; a production sink sizes
    parts accordingly or picks a splittable codec). A unit test pins
    the .csv.gz extension so a silently-uncompressed sink fails."""
    path = _scratch(spark, sf_dir, "orders_csv_gz")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    (
        load_table(spark, sf_dir, "orders")
        .select(*cols)
        .write.mode("overwrite")
        .options(header=True, compression="gzip")
        .csv(path)
    )
    back = spark.read.schema(
        "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    ).options(header=True).csv(path)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")) / 100.0).alias(
                "total"
            ),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "sink_compaction_plan",
    oracle="""
    WITH manifest AS (
      SELECT source, CAST(doc_id // 100 AS BIGINT) AS chunk,
             CAST(SUM(n_chars) AS BIGINT) AS file_bytes
      FROM documents GROUP BY source, doc_id // 100
    ), seq AS (
      SELECT source, chunk, file_bytes,
             SUM(file_bytes) OVER (
               PARTITION BY source ORDER BY chunk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM manifest
    )
    SELECT source, CAST((cum - file_bytes) // 65536 AS BIGINT) AS group_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(file_bytes) AS BIGINT) AS group_bytes,
           CAST(MIN(chunk) AS BIGINT) AS first_chunk,
           CAST(MAX(chunk) AS BIGINT) AS last_chunk
    FROM seq
    GROUP BY source, group_id
    ORDER BY source, group_id
    """,
)
def sink_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the maintenance op every
    100-TB table needs (Delta OPTIMIZE / Iceberg rewrite_data_files
    analog): given a per-partition file manifest (modeled here as one
    row per (source, 100-doc chunk) with its byte size), assign files
    to target-sized compaction groups (64 KiB target) by a running-sum
    bin: a file starts a new group when the bytes before it cross the
    next target boundary. The cumulative sum is windowed PER PARTITION
    DIRECTORY (partitionBy source) — exactly how table formats compact
    (within a partition, never across), and what keeps the plan free of
    a SinglePartition global window at any manifest size. Group
    boundaries are a pure function of the deterministic (source, chunk)
    order, so the plan is reproducible run-over-run — a compaction
    scheduler can diff plans across snapshots. Output: one row per
    compaction group with its file count, payload bytes, and chunk
    span (the rewrite job's input split)."""
    docs = load_table(spark, sf_dir, "documents")
    manifest = docs.groupBy(
        "source", F.expr("doc_id DIV 100").cast("bigint").alias("chunk")
    ).agg(F.sum("n_chars").cast("bigint").alias("file_bytes"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = manifest.withColumn("cum", F.sum("file_bytes").over(w))
    return (
        seq.groupBy(
            "source",
            F.expr("(cum - file_bytes) DIV 65536").cast("bigint").alias("group_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("file_bytes").cast("bigint").alias("group_bytes"),
            F.min("chunk").cast("bigint").alias("first_chunk"),
            F.max("chunk").cast("bigint").alias("last_chunk"),
        )
        .orderBy("source", "group_id")
    )


@register(
    "sink_compaction_exec",
    oracle="""
    WITH manifest AS MATERIALIZED (
      SELECT source, CAST(doc_id // 100 AS BIGINT) AS chunk,
             CAST(SUM(n_chars) AS BIGINT) AS file_bytes
      FROM documents GROUP BY source, doc_id // 100
    ), seq AS MATERIALIZED (
      SELECT source, chunk,
             CAST((SUM(file_bytes) OVER (
                     PARTITION BY source ORDER BY chunk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - file_bytes) // 65536 AS BIGINT) AS group_id
      FROM manifest
    )
    SELECT d.source, s.group_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS payload_chars,
           CAST(MIN(d.doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(d.doc_id) AS BIGINT) AS max_doc_id,
           CAST(1 AS BIGINT) AS n_files
    FROM documents d
    JOIN seq s ON d.source = s.source AND d.doc_id // 100 = s.chunk
    GROUP BY d.source, s.group_id
    ORDER BY d.source, s.group_id
    """,
)
def sink_compaction_exec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION EXECUTION (VERDICT r9 #8b — `sink_compaction_plan`
    only plans bins; this row performs the rewrite): assign every doc
    to its planner group (the identical per-source running-sum bin over
    the 100-doc-chunk manifest), REPARTITION BY THE GROUP KEY and
    rewrite as parquet partitioned by (source, group_id) — the hash
    repartition puts each group's rows in exactly one task, so each
    group directory holds exactly ONE compacted file, which is the
    whole point of OPTIMIZE. Then read the compacted table back and
    emit per-group (n_docs, payload_chars, min/max doc_id) plus
    n_files = countDistinct(input_file_name()) — the oracle pins
    n_files to literal 1, so a multi-file group (a broken rewrite: a
    group split across tasks, or a spilled second file) hash-fails the
    row rather than passing on content alone. Content preservation is
    checked by the same oracle recomputing every group's stats from
    the ORIGINAL table. Scale: the rewrite is one shuffle on the group
    key (group sizes are target-bounded by the planner, so tasks are
    balanced by construction); the verify is one scan of the
    compacted output. The broadcast of the group plan is bounded by
    FILE count, not row count — one row per manifest chunk, the same
    file list every table-format OPTIMIZE materializes on its
    coordinator (a 100 TB table at a 1 GiB file target is ~1e5 rows);
    a caller compacting a pathological million-small-file table drops
    the hint and Catalyst shuffles the (source, chunk) equi-join.
    Delta OPTIMIZE / Iceberg rewrite_data_files analog, executed."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    manifest = docs.groupBy(
        "source", F.expr("doc_id DIV 100").cast("bigint").alias("chunk")
    ).agg(F.sum("n_chars").cast("bigint").alias("file_bytes"))
    w = (
        Window.partitionBy("source")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plan = manifest.withColumn("cum", F.sum("file_bytes").over(w)).select(
        "source",
        "chunk",
        F.expr("(cum - file_bytes) DIV 65536").cast("bigint").alias("group_id"),
    )
    assigned = docs.select(
        "doc_id", "source", "n_chars", F.expr("doc_id DIV 100").cast("bigint").alias("chunk")
    ).join(F.broadcast(plan), ["source", "chunk"])

    path = _scratch(spark, sf_dir, "documents_compacted")
    (
        assigned.select("doc_id", "n_chars", "source", "group_id")
        .repartition("source", "group_id")
        .write.mode("overwrite")
        .partitionBy("source", "group_id")
        .parquet(path)
    )
    back = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    return (
        back.groupBy("source", F.col("group_id").cast("bigint").alias("group_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("payload_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
            F.countDistinct("_file").cast("bigint").alias("n_files"),
        )
        .orderBy("source", "group_id")
    )


@register(
    "sink_parquet_zstd",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           'ZSTD' AS codec
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sink_parquet_zstd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZSTD parquet sink/scan round-trip with the codec pinned from
    the FOOTER (the sink_compaction_exec structural-gate discipline):
    lineitem → zstd parquet → read-back aggregate, plus a pyarrow
    footer probe of every written part asserting each column chunk's
    compression is literally ZSTD — a sink that silently fell back to
    the snappy default hash-fails on the pinned codec column. Why a
    100 TB pipeline cares: zstd cuts cold-storage bytes 2-3× vs
    snappy at similar scan speed and parquet stays SPLITTABLE under
    it (unlike the gzip-CSV trade-off `sink_csv_compressed` pins), so
    it is the archival-tier codec choice. Bounded driver work: one
    footer read per part file, no data through the driver."""
    import glob as _glob

    import pyarrow.parquet as _pq

    path = _scratch(spark, sf_dir, "lineitem_zstd")
    cols = ["l_orderkey", "l_returnflag", "l_quantity"]
    (
        load_table(spark, sf_dir, "lineitem")
        .select(*cols)
        .write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(path)
    )
    codecs = set()
    for f in _glob.glob(os.path.join(path, "*.parquet")):
        md = _pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for c in range(md.row_group(rg).num_columns):
                codecs.add(md.row_group(rg).column(c).compression)
    codec = codecs.pop() if len(codecs) == 1 else "MIXED:" + ",".join(sorted(codecs))
    back = spark.read.parquet(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
        )
        .withColumn("codec", F.lit(codec))
        .orderBy("l_returnflag")
    )
