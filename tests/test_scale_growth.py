"""Empirical pair-count growth gates for the dedup paths (VERDICT r4 #1).

SCALE.md argues the banded candidate generation grows near-linearly for
bounded-duplication corpora. These tests MEASURE that on synthesized
corpora at 1x/4x/16x (fixed seed, constant dup rate — see
fairy_spark/testing/synth.py) instead of trusting the analysis:

  * the scale-path settings (band_rows=2, and the blocked ngram shape)
    must keep candidate pairs within a constant factor PER DOC as the
    corpus grows 16x — the near-linear claim, asserted;
  * the sf0.1 query setting (band_rows=1) is measured against its
    analytic quadratic term: random band collisions ~ 8 * E[J_rand] *
    n^2 / 2. On this deliberately tiny vocab E[J_rand] is large enough
    to see; the assert pins that doubling bands to rows=2 cuts the
    candidate set by >= 3x at the largest size — the documented
    mitigation, proven effective rather than asserted.

Sizes are small (500/2000/8000) to keep the suite fast; scale_bench.py
runs the same variants at 5k/20k/80k for the SCALE.md table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fairy_spark.operators.dedup import clear_signature_cache, minhash_lsh_candidates
from fairy_spark.testing.synth import synth_documents

SIZES = [500, 2000, 8000]


@pytest.fixture(scope="module")
def pair_counts(spark):
    """candidate-pair counts per (variant, size); one pass, shared."""
    out: dict[tuple[str, int], int] = {}
    for n in SIZES:
        docs = synth_documents(spark, n)
        blocked = docs.withColumn("len_bucket", F.expr("n_chars div 50"))
        out[("b1", n)] = minhash_lsh_candidates(docs, band_rows=1).count()
        clear_signature_cache(spark)
        out[("b2", n)] = minhash_lsh_candidates(docs, band_rows=2).count()
        clear_signature_cache(spark)
        out[("ngram", n)] = minhash_lsh_candidates(
            blocked, band_rows=1, block_cols=["source", "len_bucket"]
        ).count()
        clear_signature_cache(spark)
    return out


def test_scale_path_pair_growth_is_near_linear(pair_counts):
    """band_rows=2: pairs/doc at 16x within a small constant of 1x."""
    r1 = pair_counts[("b2", SIZES[0])] / SIZES[0]
    r16 = pair_counts[("b2", SIZES[2])] / SIZES[2]
    assert r1 > 0, "no candidates at 1x — generator/dedup wiring broken"
    assert r16 <= 3.0 * r1, (
        f"band_rows=2 pairs/doc grew {r16 / r1:.1f}x over a 16x corpus — "
        "superlinear; the scale-path banding claim fails"
    )


def test_blocked_ngram_pair_growth_is_near_linear(pair_counts):
    """dedup_ngram_jaccard's (block, band)-keyed join: same bound."""
    r1 = pair_counts[("ngram", SIZES[0])] / SIZES[0]
    r16 = pair_counts[("ngram", SIZES[2])] / SIZES[2]
    assert r1 > 0
    assert r16 <= 3.0 * r1, (
        f"blocked-ngram pairs/doc grew {r16 / r1:.1f}x over a 16x corpus"
    )


def test_band_rows_2_suppresses_random_collisions(pair_counts):
    """At the largest size, rows=2 banding must cut candidates >= 3x
    vs rows=1 — the documented mitigation for the quadratic random-
    collision term, demonstrated on a vocab where that term is large."""
    n = SIZES[2]
    b1, b2 = pair_counts[("b1", n)], pair_counts[("b2", n)]
    assert b2 * 3 <= b1, f"rows=2 kept {b2} of {b1} pairs — banding ineffective"


def test_synth_corpus_is_deterministic(spark):
    """Same (n, seed, params) → identical corpus, any partitioning."""
    a = synth_documents(spark, 300).orderBy("doc_id").collect()
    b = synth_documents(spark, 300).orderBy("doc_id").collect()
    assert a == b
    assert len(a) == 300 and all(r["n_chars"] == len(r["text"]) for r in a[:20])


def test_substring_pair_growth_is_near_linear(spark):
    """The boilerplate cap (grams shared by > max_share docs dropped)
    is dedup_substring_exact's quadratic bound: on the same 1x/4x/16x
    corpora, capped gram pairs per doc must stay within a constant
    factor as the corpus grows 16x (SCALE.md's corpus-linear claim for
    the gram self-join, measured)."""
    from fairy_spark.operators.dedup import substring_dedup_pairs

    counts = {}
    for n in SIZES:
        docs = synth_documents(spark, n)
        counts[n] = substring_dedup_pairs(docs).count()
    per_doc = {n: counts[n] / n for n in SIZES}
    assert per_doc[SIZES[-1]] <= 4 * max(per_doc[SIZES[0]], 0.05), (counts, per_doc)


def test_basket_pair_growth_is_linear_across_sf(spark):
    """ml_assoc_rules' cost model measured across a 100x real-data
    span: basket pair fan-out is Σ C(|basket|, 2), linear in order
    count while basket size stays bounded (TPC-H-like baskets are
    SF-invariant). Pairs-per-order at sf0.1 must sit within a small
    constant of sf0.001 — if a schema change ever fattened baskets
    with corpus size, the self-join would quietly go quadratic and
    this gate is where it surfaces."""
    from fairy_spark.sources.tables import load_table

    ratio = {}
    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        li = load_table(spark, sf_dir, "lineitem")
        baskets = li.select("l_orderkey", "l_partkey").distinct()
        n_orders = baskets.select("l_orderkey").distinct().count()
        a, b = baskets.alias("a"), baskets.alias("b")
        pairs = a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        ).count()
        ratio[sf_dir] = pairs / n_orders
    r_small = ratio["/root/testdata/sf0.001"]
    r_big = ratio["/root/testdata/sf0.1"]
    assert r_small > 0
    assert r_big <= 2.0 * r_small, ratio


def test_simhash_wider_fingerprint_suppresses_pairs(spark):
    """SCALE.md r6 geometry measurement, gated: widening the simhash
    fingerprint 16 → 32 bits must suppress hamming≤3 pair volume by
    ≥ 20× on the synth corpus (measured 186× at 5k docs) — the knob
    that keeps the banded join's output non-degenerate at scale."""
    from pyspark.sql import functions as F

    from fairy_spark.operators.dedup import simhash
    from fairy_spark.testing.synth import synth_documents

    docs = synth_documents(spark, 2000)

    def pairs_within(bits, bands=4, maxham=3):
        band_bits = bits // bands
        sig = simhash(docs, bits=bits)
        b = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.shiftright("simhash", i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .alias("band_val"),
                )
                for i in range(bands)
            ]
        )
        banded = sig.select("id", "simhash", F.explode(b).alias("b")).select(
            "id", "simhash", "b.band_id", "b.band_val"
        )
        a_, b_ = banded.alias("a"), banded.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        return (
            a_.join(
                b_,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .filter(ham <= maxham)
            .select("a.id", "b.id")
            .distinct()
            .count()
        )

    p16, p32 = pairs_within(16), pairs_within(32)
    assert p32 > 0, "wider fingerprint should still find the planted near-dups"
    assert p16 >= 20 * p32, f"suppression collapsed: 16-bit {p16} vs 32-bit {p32}"


def test_containment_behind_minhash_prefilter_scale_path(spark):
    """The containment docstring's scale claim, executed: at corpus
    scale the shingle equi-join runs behind a minhash band-bucket
    prefilter — containment computed ONLY for banded candidate pairs.
    Gate: the prefiltered path must (a) cut the scored pair volume vs
    the unfiltered equi-join, and (b) recall ≥ 80% of the true
    containment-≥0.5 pairs on the bounded-dup synth corpus (banding at
    8×1-row bands recalls J≈0.8 planted dups essentially surely)."""
    from pyspark.sql import functions as F

    from fairy_spark.operators.dedup import minhash_lsh_candidates
    from fairy_spark.operators.text import shingle_set
    from fairy_spark.testing.synth import synth_documents

    docs = synth_documents(spark, 2000)
    sh = docs.select("doc_id", F.explode(shingle_set(F.col("text"))).alias("sh"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    def score(pairs_or_none):
        inter = (
            sh.alias("a")
            .join(sh.alias("b"), "sh")
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        if pairs_or_none is not None:
            # prefilter: only banded candidates reach the scorer —
            # candidates are (id_a < id_b); containment is asymmetric,
            # so admit both orientations of each candidate
            both = pairs_or_none.select("id_a", "id_b").unionByName(
                pairs_or_none.select(
                    F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
                )
            )
            inter = inter.join(both, ["id_a", "id_b"])
        out = inter.join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "n_a")
            ),
            "id_a",
        )
        c = F.col("n_inter").cast("double") / F.col("n_a")
        scored = out.select("id_a", "id_b", c.alias("containment"))
        return (
            scored.count(),
            {(r["id_a"], r["id_b"]) for r in scored.filter(c >= 0.5).collect()},
        )

    full_volume, full_hits = score(None)
    cand = minhash_lsh_candidates(docs, id_col="doc_id", text_col="text")
    pre_volume, pre_hits = score(cand)

    assert full_hits, "synth corpus must plant containment pairs"
    assert pre_volume < full_volume, "prefilter must shrink scored volume"
    recall = len(pre_hits & full_hits) / len(full_hits)
    assert recall >= 0.8, f"prefilter recall {recall:.2f} < 0.8"


def test_minhash_append_matches_full_rebuild(spark):
    """The maintenance identity minhash_lsh_append is built on: banding
    is per-doc independent, so (base + delta appended incrementally)
    must produce EXACTLY the full rebuild's candidate pairs restricted
    to delta-involving pairs — same pairs, same jaccard values."""
    from fairy_spark.operators.dedup import (
        clear_signature_cache,
        minhash_lsh_append,
        minhash_lsh_candidates,
    )

    docs = synth_documents(spark, 1000)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)

    full = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_candidates(docs).collect()
    }
    clear_signature_cache(spark)
    expected = {
        p: j for p, j in full.items() if p[0] % 5 == 0 or p[1] % 5 == 0
    }
    inc = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_append(base, delta, cache_key="synth_append").collect()
    }
    assert inc == expected
    # second append over the warm base index: same result, and the
    # staleness contract still holds for the cached entries
    inc2 = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in minhash_lsh_append(base, delta, cache_key="synth_append").collect()
    }
    assert inc2 == expected
    clear_signature_cache(spark)
