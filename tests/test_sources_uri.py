"""Object-store-style scan path (SURVEY.md §2.A A29, reference S3 ufs
stub client/src/ufs/mod.rs:5-34; VERDICT r3 missing-item 2).

Every oracle run reads bare local paths, which Spark resolves through
its default filesystem. These tests prove the scan/sink layer is NOT
local-path-coupled: the same tables read through an explicit
``file://`` Hadoop-filesystem URI (the same resolution machinery an
``s3a://`` path would take — scheme → Hadoop FileSystem impl → listing
→ splits) produce identical results, for reads, for a full registry
query, and for a sink round-trip. s3a itself needs cloud credentials
plus the hadoop-aws jar, so the scheme-dispatch seam is what a
single-box test can pin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_spark.queries import QUERIES
from fairy_spark.sources.tables import load_table


def test_scan_through_file_uri_equals_bare_path(spark, sf_dir):
    bare = load_table(spark, sf_dir, "lineitem")
    uri = load_table(spark, "file://" + sf_dir, "lineitem")
    a = bare.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("ks")
    ).first()
    b = uri.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("ks")
    ).first()
    assert (a["n"], a["ks"]) == (b["n"], b["ks"]) and a["n"] > 0


def test_registry_query_runs_against_file_uri(spark, sf_dir):
    """A whole registry query (scan → filter → agg → sort) over the
    URI-addressed store must equal the bare-path run row-for-row."""
    bare = QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    uri = QUERIES["q1_pricing_summary"](spark, "file://" + sf_dir).collect()
    assert uri == bare and len(uri) > 0


def test_sink_and_readback_through_file_uri(spark, tmp_path):
    """Write path through the scheme-dispatch seam too: parquet sink to
    a file:// URI, read back through the same URI."""
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    target = "file://" + str(tmp_path / "uri_sink.parquet")
    df.write.mode("overwrite").parquet(target)
    back = spark.read.parquet(target)
    got = back.agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")).first()
    assert (got["n"], got["s"]) == (100, 4950)


def test_scan_through_viewfs_uri_second_scheme(spark, sf_dir):
    """A SECOND Hadoop filesystem scheme, not just file://: viewfs://
    resolves through a client-side mount table (scheme → ViewFileSystem
    → link resolution → target FS), exactly the dispatch chain an
    s3a:// path takes minus the cloud SDK. Proves the scan layer is
    scheme-agnostic, not special-cased to the default FS — and that
    filter pushdown survives the indirection."""
    import os

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    mount_key = "fs.viewfs.mounttable.fairyprobe.link./data"
    hconf.set(mount_key, "file://" + os.path.dirname(sf_dir))
    # The mount entry lives on the SHARED JVM hadoopConfiguration —
    # unset it on exit so no global state leaks into sibling tests in
    # the same session (ADVICE r6).
    try:
        vdir = "viewfs://fairyprobe/data/" + os.path.basename(sf_dir)
        bare = load_table(spark, sf_dir, "lineitem")
        view = load_table(spark, vdir, "lineitem")
        a = bare.agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("ks")
        ).first()
        b = view.agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_orderkey").alias("ks")
        ).first()
        assert (a["n"], a["ks"]) == (b["n"], b["ks"]) and a["n"] > 0

        # registry query end-to-end through the mounted scheme
        assert (
            QUERIES["q1_pricing_summary"](spark, vdir).collect()
            == QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
        )

        # pushdown reaches the parquet scan through viewfs too
        plan = (
            view.filter(F.col("l_orderkey") == 1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)" in plan
    finally:
        hconf.unset(mount_key)
