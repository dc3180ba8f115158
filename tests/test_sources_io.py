

def test_sink_csv_compressed_writes_gzip_parts(spark, sf_dir):
    """sink_csv_compressed's codec contract: the sink must emit
    .csv.gz part files (a silently-uncompressed sink would still
    round-trip values and sneak past the oracle)."""
    import glob
    import os

    from fairy_spark.queries import QUERIES

    QUERIES["sink_csv_compressed"](spark, sf_dir).collect()
    from fairy_spark.queries.sources_io import _scratch

    path = _scratch(spark, sf_dir, "orders_csv_gz")
    parts = glob.glob(os.path.join(path, "part-*"))
    assert parts, f"no part files under {path}"
    assert all(p.endswith(".csv.gz") for p in parts), parts
