"""Connected-components dedup clustering properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fairy_spark.operators.components import connected_components, dedup_survivors
from fairy_spark.operators.dedup import minhash_lsh_candidates
from fairy_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def pairs(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(d).filter(F.col("jaccard") >= 0.4).persist()


def test_component_labels_are_consistent(spark, pairs):
    """Every edge's endpoints carry the same component label, and the
    label is the min node id of its component."""
    comp = connected_components(pairs).persist()
    joined = (
        pairs.join(comp.withColumnRenamed("node", "id_a").withColumnRenamed("comp", "ca"), "id_a")
        .join(comp.withColumnRenamed("node", "id_b").withColumnRenamed("comp", "cb"), "id_b")
    )
    assert joined.filter(F.col("ca") != F.col("cb")).count() == 0
    mins = comp.groupBy("comp").agg(F.min("node").alias("mn"))
    assert mins.filter(F.col("comp") != F.col("mn")).count() == 0
    comp.unpersist()


def test_survivors_partition_the_corpus(spark, sf_dir, pairs):
    """Exactly one survivor per cluster + every unpaired doc: survivor
    count == n_docs - (paired_docs - n_clusters)."""
    d = load_table(spark, sf_dir, "documents")
    comp = connected_components(pairs)
    n_docs = d.count()
    n_paired = comp.count()
    n_clusters = comp.select("comp").distinct().count()
    surv = dedup_survivors(d, pairs)
    assert surv.count() == n_docs - n_paired + n_clusters
    # survivors are unique and every survivor is a real doc id
    assert surv.distinct().count() == surv.count()
    assert surv.join(d, "doc_id", "left_anti").count() == 0


def test_minhash_excludes_shingle_less_docs(spark):
    """Docs too short to shingle (< n tokens → empty shingle set, all-
    null signature) must NOT pair with each other: concat_ws renders
    null band components as equal empty strings, so without the
    pre-band filter every short doc lands in one bucket (and the SQL
    oracle, where NULL = NULL is not true, disagrees). Real near-dups
    must still surface."""
    rows = [
        (1, "aa bb"),                                # 2 tokens: no 3-shingles
        (2, "aa bb"),                                # identical short doc
        (3, "cc"),                                   # 1 token
        (4, "one two three four five six seven"),
        (5, "one two three four five six eight"),    # near-dup of 4
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    cands = minhash_lsh_candidates(d, shingle_n=3).collect()
    ids_in_pairs = {r["id_a"] for r in cands} | {r["id_b"] for r in cands}
    assert not ids_in_pairs & {1, 2, 3}, cands
    assert any({r["id_a"], r["id_b"]} == {4, 5} for r in cands), cands


def test_identical_docs_always_candidates(spark):
    """Recall floor of the banded plan: identical texts have identical
    signatures, so every band collides — a j=1.0 pair can never be
    missed, whatever the banding parameters."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "entirely different vocabulary in this document"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_candidates(d, shingle_n=3).collect()
    }
    assert pairs.get((1, 2)) == 1.0, pairs


def test_block_cols_partition_candidates(spark):
    """block_cols joins candidates WITHIN a block only: the same text
    in different blocks must not pair (dedup_ngram_jaccard relies on
    this to bound bucket size by in-block cluster size)."""
    rows = [
        (1, "a", "one two three four five six"),
        (2, "a", "one two three four five six"),
        (3, "b", "one two three four five six"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "src", "text"])
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(d, block_cols=["src"]).collect()
    }
    assert got == {(1, 2)}, got


def test_signature_cache_holds_cap_indexes_lru(spark):
    """The warm-index cache keeps up to _CACHE_CAP DISTINCT indexes
    (cap is 3 since r7 so the incremental path's base+delta indexes
    fit next to one full index) and reuses, not rebuilds, on a repeat
    call; one index past the cap evicts the least-recent."""
    from fairy_spark.operators import dedup

    rows = [(i, "s", f"tok{i} alpha beta gamma delta tok{i}") for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "src", "text"])
    dedup.clear_signature_cache(spark)
    dedup.minhash_lsh_candidates(docs, cache_key="k1").count()
    dedup.minhash_lsh_candidates(docs, cache_key="k1", block_cols=["src"]).count()
    app = spark.sparkContext.applicationId
    assert len(dedup._SHINGLE_CACHE[app]) == 2
    before = {k: id(v[0]) for k, v in dedup._SHINGLE_CACHE[app].items()}
    dedup.minhash_lsh_candidates(docs, cache_key="k1").count()
    after = {k: id(v[0]) for k, v in dedup._SHINGLE_CACHE[app].items()}
    assert before == after  # repeat call reused both warm entries
    dedup.minhash_lsh_candidates(docs, cache_key="k2").count()
    assert len(dedup._SHINGLE_CACHE[app]) == dedup._CACHE_CAP  # at cap
    keys_at_cap = set(dedup._SHINGLE_CACHE[app])
    dedup.minhash_lsh_candidates(docs, cache_key="k3").count()
    assert len(dedup._SHINGLE_CACHE[app]) == dedup._CACHE_CAP  # LRU held
    assert set(dedup._SHINGLE_CACHE[app]) != keys_at_cap  # oldest evicted
    dedup.clear_signature_cache(spark)
    assert app not in dedup._SHINGLE_CACHE


def test_signature_cache_detects_corpus_mutation_under_same_key(spark):
    """VERDICT r4 #6: mutating the corpus under a reused cache_key must
    raise StaleSignatureIndex, not silently serve stale signatures.
    Same corpus + same key still reuses warm."""
    import pytest

    from fairy_spark.operators import dedup

    rows = [(i, f"tok{i} alpha beta gamma delta tok{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    dedup.clear_signature_cache(spark)
    try:
        dedup.minhash_lsh_candidates(docs, cache_key="stale-k").count()
        # unchanged corpus: warm hit, no error
        dedup.minhash_lsh_candidates(docs, cache_key="stale-k").count()
        # appended row under the SAME key: fingerprint (count, max id) trips
        mutated = docs.unionByName(
            spark.createDataFrame([(99, "omega zeta eta theta iota")], ["doc_id", "text"])
        )
        with pytest.raises(dedup.StaleSignatureIndex, match="fingerprint changed"):
            dedup.minhash_lsh_candidates(mutated, cache_key="stale-k")
        # changing the key over the mutated corpus works fine
        dedup.minhash_lsh_candidates(mutated, cache_key="stale-k-v2").count()
    finally:
        dedup.clear_signature_cache(spark)
