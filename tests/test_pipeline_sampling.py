"""Property tests for the round-5 sampling/quality ops: the invariants
that make them safe to run incrementally at 100 TB — split stability
under ingest, exact per-source balance, and rule-pack edge rows the
sf-data never exercises (empty text, symbol soup, stopword spam)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fairy_spark.operators.text import portable_hash64
from fairy_spark.queries import QUERIES


def _write_docs(spark, tmp_path, rows):
    """Materialize a documents table dir the registry queries can read."""
    d = str(tmp_path / "minidocs")
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def test_train_split_is_stable_under_ingest(spark, tmp_path):
    """The split is a pure function of doc_id: computing it over a
    half-corpus and over the full corpus must assign the SAME split to
    the shared rows — new ingest never reshuffles old assignments
    (rand()-based splits fail exactly this)."""
    rows_half = [(i, f"doc {i}", "en", "src0", 10) for i in range(0, 50)]
    rows_full = [(i, f"doc {i}", "en", "src0", 10) for i in range(0, 100)]
    d_half = _write_docs(spark, tmp_path / "h", rows_half)
    d_full = _write_docs(spark, tmp_path / "f", rows_full)
    half = {r["doc_id"]: r["split"] for r in QUERIES["sample_train_split"](spark, d_half).collect()}
    full = {r["doc_id"]: r["split"] for r in QUERIES["sample_train_split"](spark, d_full).collect()}
    assert half == {k: v for k, v in full.items() if k in half}
    assert set(full.values()) <= {"train", "valid", "test"}


def test_train_split_proportions_at_sf(spark, sf_dir):
    """80/10/10 by hash bucket: at 500+ docs every split is populated
    and the empirical shares sit near the targets (binomial tolerance,
    deterministic for a fixed corpus)."""
    counts = dict(
        QUERIES["sample_train_split"](spark, sf_dir)
        .groupBy("split")
        .count()
        .collect()
    )
    total = sum(counts.values())
    assert set(counts) == {"train", "valid", "test"}
    assert abs(counts["train"] / total - 0.80) < 0.08
    assert abs(counts["valid"] / total - 0.10) < 0.06
    assert abs(counts["test"] / total - 0.10) < 0.06


def test_domain_balance_equalizes_sources(spark, sf_dir):
    """Post-balance, every source contributes EXACTLY the min source
    count, and every kept row exists in the input."""
    from fairy_spark.sources.tables import load_table

    docs = load_table(spark, str(sf_dir), "documents")
    per_source = {r["source"]: r["cnt"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    cap = min(per_source.values())
    out = QUERIES["sample_domain_balance"](spark, str(sf_dir))
    got = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == {s: cap for s in per_source}, (got, cap)


def test_domain_balance_survivors_deterministic(spark, sf_dir):
    """The survivor set is the hash-smallest rows per source — rerun
    yields the identical id set (no rand(), no partition-order
    dependence)."""
    a = {r["doc_id"] for r in QUERIES["sample_domain_balance"](spark, str(sf_dir)).collect()}
    b = {r["doc_id"] for r in QUERIES["sample_domain_balance"](spark, str(sf_dir)).collect()}
    assert a == b and len(a) > 0


@pytest.mark.parametrize(
    "text,expect_keep",
    [
        # 40 words, all alpha, stopwords present, mean len in band → keep
        ("the quick brown fox jumps over " * 7, True),
        # empty text: split('') -> [''] → n_words=1 < 30 → drop
        ("", False),
        # symbol soup: alpha ratio 0 → drop
        ("$$$ ### !!! %%% " * 10, False),
        # stopword-free technical soup: stop_hits=0 → drop
        ("zxqv wlrtk pmnsd fghjk " * 10, False),
        # long-word spam: mean word length > 10 → drop
        ("pneumonoultramicroscopic volcanoconiosis " * 20 + "the of", False),
    ],
)
def test_gopher_rule_pack_edges(spark, tmp_path, text, expect_keep):
    d = _write_docs(spark, tmp_path, [(0, text, "en", "src0", len(text))])
    row = QUERIES["text_gopher_filters"](spark, d).collect()[0]
    assert row["keep"] is expect_keep, dict(row.asDict())


def test_gopher_signals_match_python_model(spark, tmp_path):
    """Cross-check the JVM HOF signals against a plain-Python model on
    a mixed bag of rows (the oracle test covers sf-data; this covers
    constructed rows with punctuation and irregular whitespace)."""
    texts = [
        "The  Quick   brown FOX and the lazy dog of tomorrow",
        "alpha beta-2 gamma_3 delta, epsilon. zeta",
        "a an of to in is for on and the",
    ]
    rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    d = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in QUERIES["text_gopher_filters"](spark, d).collect()}
    import re

    stop = {"the", "a", "an", "and", "of", "to", "in", "is", "for", "on"}
    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.lower())
        n = len(toks)
        mwl = round(sum(len(x) for x in toks) / n, 6)
        ar = round(sum(bool(re.fullmatch(r"[a-z]+", x)) for x in toks) / n, 6)
        sh = sum(x in stop for x in toks)
        r = got[i]
        assert (r["n_words"], r["stop_hits"]) == (n, sh), (i, dict(r.asDict()))
        assert abs(r["mean_word_len"] - mwl) < 1e-9 and abs(r["alpha_ratio"] - ar) < 1e-9


def test_split_buckets_match_hash_expr(spark, sf_dir):
    """bucket column IS portable_hash64(doc_id, seed='split') % 100 —
    pin the hash contract so a seed or casting change can't silently
    re-split a production corpus."""
    from fairy_spark.sources.tables import load_table

    docs = load_table(spark, str(sf_dir), "documents").limit(50)
    expect = docs.select(
        "doc_id",
        (portable_hash64(F.col("doc_id").cast("string"), seed="split") % 100).alias("b"),
    )
    got = QUERIES["sample_train_split"](spark, str(sf_dir))
    joined = got.join(expect, "doc_id").filter(F.col("bucket") != F.col("b"))
    assert joined.count() == 0
