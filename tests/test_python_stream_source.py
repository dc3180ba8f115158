"""The streaming Python DataSource (SimpleDataSourceStreamReader) and
its availableNow-restart exactly-once proof (queries/streaming_exec.py
stream_exec_python_source): offsets must ADVANCE across restarts
against one checkpoint, each batch replays deterministically, and the
drained sink holds exactly one copy of every feed row."""

import glob
import os
import tempfile

from pyspark.sql import functions as F


def _drain(spark, base, n_total=600, batch=200):
    from fairy_spark.sources.pydatasource import register_pydatasource_stream

    register_pydatasource_stream(spark)
    sink, ckpt = os.path.join(base, "sink"), os.path.join(base, "ckpt")
    rounds, seen = 0, -1
    while rounds < 10:
        q = (
            spark.readStream.format("fairy_feed")
            .option("n_total", str(n_total))
            .option("batch", str(batch))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rounds += 1
        now = spark.read.parquet(sink).count()
        if now == seen:
            break
        seen = now
    return sink, ckpt, rounds


def test_offsets_advance_across_restarts_exactly_once(spark):
    base = tempfile.mkdtemp(prefix="fairy_pysrc_test_")
    sink, ckpt, rounds = _drain(spark, base)
    df = spark.read.parquet(sink)
    # exactly-once: every row exactly one copy, nothing skipped
    assert df.count() == 600
    assert df.select("id").distinct().count() == 600
    assert df.agg(F.min("id")).first()[0] == 0
    assert df.agg(F.max("id")).first()[0] == 599
    # content is the deterministic pure function of the row index
    bad = df.filter(F.col("val") != (F.col("id") * F.col("id")) % 97).count()
    assert bad == 0
    # the drain genuinely needed multiple RESTARTS (one prefetched
    # batch per availableNow run), each resuming from the committed
    # offset: >= 3 data rounds + 1 no-progress round
    assert rounds >= 4
    commits = glob.glob(os.path.join(ckpt, "commits", "*"))
    assert len([c for c in commits if not c.endswith(".tmp")]) >= 3


def test_read_between_offsets_replays_identically(spark):
    from fairy_spark.sources.pydatasource import DeterministicFeedStreamReader

    r = DeterministicFeedStreamReader({"n_total": "100", "batch": "40"})
    it1, end1 = r.read({"i": 0})
    rows1 = list(it1)
    assert end1 == {"i": 40}
    # recovery path: committed range must replay bit-identically
    rows2 = list(r.readBetweenOffsets({"i": 0}, {"i": 40}))
    assert rows1 == rows2
    # tail batch clamps to n_total
    _, end3 = r.read({"i": 80})
    assert end3 == {"i": 100}
