"""Arrow-vs-HOF equality gate for the substring-dedup gram digests.

substring_dedup_pairs ships the Arrow path (C-speed tokenize + window
+ md5 inside mapInPandas batches; ~2x the HOF form at sf0.1 — BASELINE
r5 note) with the pure-JVM HOF construction kept as the reference. The
two must produce the IDENTICAL (id, digest) multiset — same tokenizer
edge cases (leading/trailing whitespace, empty strings), same join
separator, same md5 — on both the real testdata corpus and a synthetic
one, plus the full pair output of the query end to end.
"""

from __future__ import annotations

from pyspark.sql import Row

from fairy_spark.operators.dedup import (
    _gram_digests_arrow,
    _gram_digests_hof,
    substring_dedup_pairs,
)
from fairy_spark.testing.synth import synth_documents

SF_DIR = "/root/testdata/sf0.01"


def _digest_set(df):
    return {(r["id"], r["g"]) for r in df.collect()}


def test_gram_digests_equal_on_testdata(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = _digest_set(_gram_digests_arrow(docs, 15, "doc_id", "text"))
    h = _digest_set(_gram_digests_hof(docs, 15, "doc_id", "text"))
    assert a == h and len(a) > 0


def test_gram_digests_equal_on_synth_and_edge_rows(spark):
    docs = synth_documents(spark, 400).unionByName(
        spark.createDataFrame(
            [
                Row(doc_id=9001, text="  leading and trailing  ", lang="en",
                    source="s", n_chars=24),
                Row(doc_id=9002, text="short", lang="en", source="s", n_chars=5),
                Row(doc_id=9003, text="", lang="en", source="s", n_chars=0),
                Row(doc_id=9004, text="a  b   c    d", lang="en", source="s",
                    n_chars=13),
            ]
        )
    )
    a = _digest_set(_gram_digests_arrow(docs, 3, "doc_id", "text"))
    h = _digest_set(_gram_digests_hof(docs, 3, "doc_id", "text"))
    assert a == h


def test_pair_output_identical_across_engines(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pa = {
        (r["id_a"], r["id_b"], r["n_shared_grams"])
        for r in substring_dedup_pairs(docs, engine="arrow").collect()
    }
    ph = {
        (r["id_a"], r["id_b"], r["n_shared_grams"])
        for r in substring_dedup_pairs(docs, engine="hof").collect()
    }
    assert pa == ph and len(pa) > 0
