"""Unit tests for operators/pipeline.py stage functions on tiny
synthetic frames with known-by-construction outcomes (the composed
chain itself is oracle-proven by the registered
`pipeline_pretrain_corpus`; these pin each stage's contract for API
callers who compose their own)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_spark.operators.pipeline import (
    decontaminate,
    gopher_quality_filter,
    near_dup_removed,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs far away "
    "to find a quiet place where it can rest for a while before coming back "
    "home to the warm den with all of its family members sleeping soundly"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, n_chars INT")


def test_gopher_rules_reject_each_failure_mode(spark):
    docs = _docs(
        spark,
        [
            (1, GOOD, len(GOOD)),                                # passes all
            (2, "too short for the floor", 22),                  # n_words < 30
            (3, " ".join(["x1"] * 40), 119),                     # alpha ratio 0
            (4, " ".join(["supercalifragilistic"] * 40), 800),   # mwl > 10, no stopwords
        ],
    )
    kept = [r["doc_id"] for r in gopher_quality_filter(docs).select("doc_id").collect()]
    assert kept == [1]
    # original columns survive untouched
    assert set(gopher_quality_filter(docs).columns) == {"doc_id", "text", "n_chars"}


def test_near_dup_removed_keeps_longest_survivor(spark):
    # 1 and 2 are near-identical (one token differs); 2 is longer so it
    # survives; 3 is unrelated and untouched.
    t1 = GOOD
    t2 = GOOD + " extra"
    t3 = "completely different content about databases and query engines " * 3
    docs = _docs(spark, [(1, t1, len(t1)), (2, t2, len(t2)), (3, t3, len(t3))])
    kept = sorted(
        r["doc_id"]
        for r in near_dup_removed(docs, threshold=0.4).select("doc_id").collect()
    )
    assert kept == [2, 3]


def test_decontaminate_drops_gram_sharers_only(spark):
    # doc 1 shares an 8-gram with the probe; doc 2 does not.
    leak = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = _docs(
        spark,
        [(1, leak + " " + GOOD, 10), (2, GOOD, len(GOOD))],
    )
    probe = _docs(spark, [(99, "prefix words then " + leak, 10)])
    kept = [r["doc_id"] for r in decontaminate(docs, probe).select("doc_id").collect()]
    assert kept == [2]


def test_decontaminate_short_probe_grams_are_harmless(spark):
    # a probe doc with < 8 tokens contributes no grams — nothing drops
    docs = _docs(spark, [(1, GOOD, len(GOOD))])
    probe = _docs(spark, [(99, "only five short probe words", 5)])
    assert decontaminate(docs, probe).count() == 1
