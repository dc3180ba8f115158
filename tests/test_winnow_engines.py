"""Arrow-vs-HOF equality gate for the winnow fingerprint pass (r14).

winnow_best_match ships the Arrow builder (_winnow_fps_arrow: C-speed
tokenize + k-gram + md5 top-60-bit hashing + window-minima selection
inside mapInPandas batches) with the pure-JVM HOF construction retained
as the reference (_winnow_fps_hof — the original winnow_fingerprints
expression, whose z-chain re-expands the gram-hash transform per
zip_with layer and measured ~35-45 s at sf0.1 for the fingerprint pass
alone). The two must agree exactly — same (id, n_fp, fp) exploded rows,
same first-occurrence-distinct selection, same short-doc global-min and
sub-k-token empty fallbacks — on testdata, synthetic corpora, and edge
rows, and the end-to-end dedup_winnow_pairs output is pinned by its
DuckDB oracle on top.
"""

from __future__ import annotations

from pyspark.sql import Row

from fairy_spark.operators.dedup import _winnow_fps_arrow, _winnow_fps_hof
from fairy_spark.testing.synth import synth_documents

SF_DIR = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(
        (r["id"], r["n_fp"], r["fp"])
        for r in df.select("id", "n_fp", "fp").collect()
    )


def test_winnow_builders_equal_on_testdata(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = _rows(_winnow_fps_arrow(docs, "doc_id", "text", 4, 4))
    h = _rows(_winnow_fps_hof(docs, "doc_id", "text", 4, 4))
    assert a == h and len(a) > 0


def test_winnow_builders_equal_on_edges_and_geometries(spark):
    docs = synth_documents(spark, 200).unionByName(
        spark.createDataFrame(
            [
                # < k tokens -> empty fps (no exploded row)
                Row(doc_id=9001, text="one two", lang="en", source="s", n_chars=7),
                # empty text: split('') = [''] -> 1 token < k
                Row(doc_id=9002, text="", lang="en", source="s", n_chars=0),
                # padded whitespace -> empty-string boundary tokens
                Row(doc_id=9003, text="  pad  ded  ", lang="en", source="s", n_chars=12),
                # exactly k tokens, < w windows -> single global min
                Row(doc_id=9004, text="a b c d", lang="en", source="s", n_chars=7),
                # repeated tokens: duplicate window minima must collapse
                # first-occurrence-distinct in both builders
                Row(doc_id=9005, text=" ".join(["x y"] * 16), lang="en", source="s", n_chars=63),
            ]
        )
    )
    for k, w in ((4, 4), (3, 5), (1, 1)):
        a = _rows(_winnow_fps_arrow(docs, "doc_id", "text", k, w))
        h = _rows(_winnow_fps_hof(docs, "doc_id", "text", k, w))
        assert a == h, f"winnow engines diverge at k={k} w={w}"


def test_winnow_docs_arrow_matches_hof_construction(spark):
    """_winnow_docs_arrow (the per-doc builder text_winnow_fingerprint
    ships) must reproduce the original JVM expression's per-doc rows —
    n_grams, n_fp, the sorted-fold checksum, and the fps set — on
    testdata plus the same edge rows as the exploded gate."""
    from pyspark.sql import functions as F

    from fairy_spark.operators.dedup import _winnow_docs_arrow
    from fairy_spark.operators.text import tokenize, winnow_fingerprints, word_ngrams

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").unionByName(
        spark.createDataFrame(
            [
                Row(doc_id=9001, text="one two", lang="en", source="s", n_chars=7),
                Row(doc_id=9002, text="", lang="en", source="s", n_chars=0),
                Row(doc_id=9004, text="a b c d", lang="en", source="s", n_chars=7),
                Row(doc_id=9005, text=" ".join(["x y"] * 16), lang="en", source="s", n_chars=63),
            ]
        )
    )
    hof = docs.select(
        F.col("doc_id").alias("id"),
        F.size(word_ngrams(tokenize(F.col("text")), 4)).cast("int").alias("n_grams"),
        winnow_fingerprints(tokenize(F.col("text")), k=4, w=4).alias("fps"),
    ).select(
        "id",
        "n_grams",
        F.size("fps").cast("int").alias("n_fp"),
        F.aggregate(
            F.array_sort("fps"),
            F.lit(0).cast("bigint"),
            lambda a, x: F.pmod(
                a * 131 + F.pmod(x, F.lit(1000000000)), F.lit(1000000007)
            ),
        ).alias("fp_checksum"),
        F.array_sort("fps").alias("fps_sorted"),
    )
    arrow = _winnow_docs_arrow(docs, "doc_id", "text", 4, 4).select(
        "id", "n_grams", "n_fp", "fp_checksum", F.array_sort("fps").alias("fps_sorted")
    )
    a = sorted(map(tuple, arrow.collect()))
    h = sorted(map(tuple, hof.collect()))
    assert len(a) == docs.count()  # zero-fp docs keep their row
    assert a == h


def test_winnow_best_match_engine_param_is_value_identical(spark):
    from fairy_spark.operators.dedup import winnow_best_match

    quote = " ".join(f"q{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, "intro words here " + quote + " closing remarks follow now"),
            (2, "totally different document " + quote + " with other framing"),
            (3, "unrelated content " + " ".join(f"z{i}" for i in range(20))),
        ],
        "doc_id BIGINT, text STRING",
    )
    a = sorted(map(tuple, winnow_best_match(docs, engine="arrow").collect()))
    h = sorted(map(tuple, winnow_best_match(docs, engine="hof").collect()))
    assert a == h and len(a) == 2
