"""End-to-end pretraining-corpus pipeline over ARBITRARY document
DataFrames.

Extracted from the registered query `pipeline_pretrain_corpus`
(fairy_spark/queries/llm.py) the same way operators/wedges.py was
extracted from the triangle queries: the registered row hardwires the
testdata `documents` table and the doc_id%97 benchmark stand-in; this
operator takes any (id, text) DataFrame and an optional caller probe
set, so a user runs the proven chain on their own corpus —
Engine.pretrain_corpus is the API handle.

Stages (each individually registered + oracle-proven; the registered
composed query proves the composition):

  1. Gopher quality rules (Rae et al. 2021 §A1.1)
  2. exact dedup — lowest id per distinct text
  3. minhash-LSH near-dup clustering + longest-survivor selection
  4. 8-gram decontamination against the probe set (broadcast semi-join)
  5. greedy token packing into ~bin_tokens bins (sharded prefix sum —
     no SinglePartition window)
  6. deterministic hash train/valid/test split (pure function of id)

Scale shape: stages 1-2 are one codegen scan + one hash agg; stage 3
is the banded equi-join + bounded-round label propagation; stage 4 is
a broadcast semi-join (probe sets are benchmark-sized); stage 5 shards
the prefix sum; stage 6 is a narrow map. No cartesian products, no
single-partition windows (asserted registry-wide in tests/test_plans.py
through the registered query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fairy_spark.operators.text import (
    EN_STOPWORDS,
    mean_token_len,
    portable_hash64,
    tokenize,
    word_ngrams,
)


def gopher_quality_filter(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rows of ``docs`` passing the Gopher rule pack (word-count band,
    mean-word-length band, alphabetic-ratio floor, stopword floor).
    Pure JVM higher-order functions — one codegen scan, no shuffle."""
    toks = tokenize(F.col(text_col))
    scored = docs.withColumns(
        {
            "_n_words": F.size(toks),
            "_mwl": mean_token_len(toks),
            "_ar": (
                F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))).cast("double")
                / F.size(toks)
            ),
            "_stop_hits": F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))),
        }
    )
    keep = (
        F.col("_n_words").between(30, 10000)
        & F.col("_mwl").between(3, 10)
        & (F.col("_ar") >= 0.8)
        & (F.col("_stop_hits") >= 2)
    )
    return scored.filter(keep).drop("_n_words", "_mwl", "_ar", "_stop_hits")


def near_dup_removed(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    threshold: float = 0.4,
) -> DataFrame:
    """Docs minus every near-dup cluster member except the survivor
    (longest ``length_col``, ties to smallest id) — dedup_components +
    dedup_survivors composed into the drop it exists for."""
    from fairy_spark.operators.components import connected_components
    from fairy_spark.operators.dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(
        docs, id_col=id_col, text_col=text_col, shingle_n=3, num_hashes=8, band_rows=1
    ).filter(F.col("jaccard") >= threshold)
    cc = connected_components(pairs)
    members = cc.join(
        docs.select(F.col(id_col).alias("node"), F.col(length_col).alias("_len")),
        "node",
    )
    order_key = F.struct((-F.col("_len")).alias("a"), F.col("node").alias("b"))
    survivors = members.groupBy("comp").agg(
        F.min_by("node", order_key).alias("survivor_id")
    )
    removed = (
        members.join(survivors, "comp")
        .filter(F.col("node") != F.col("survivor_id"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(removed, id_col, "left_anti")


def decontaminate(
    docs: DataFrame,
    probe_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 8,
) -> DataFrame:
    """Drop every doc sharing any word ``gram_n``-gram with the probe
    set. Probe grams broadcast (benchmarks are kilo-docs); with a giant
    probe set drop the broadcast hint and Catalyst shuffles the
    gram-key equi-join."""
    probe_grams = probe_docs.select(
        F.explode(word_ngrams(tokenize(F.col(text_col)), gram_n)).alias("gram")
    ).distinct()
    grams = docs.select(
        id_col, F.explode(word_ngrams(tokenize(F.col(text_col)), gram_n)).alias("gram")
    )
    contaminated = (
        grams.join(F.broadcast(probe_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(contaminated, id_col, "left_anti")


def pretrain_corpus(
    docs: DataFrame,
    probe_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    length_col: str = "n_chars",
    bin_tokens: int = 512,
    near_dup_threshold: float = 0.4,
) -> DataFrame:
    """The full chain: quality -> exact dedup -> near-dup survivors ->
    decontaminate (skipped when ``probe_docs`` is None) -> pack ->
    split. Returns (id, n_tokens, bin_id, bucket, split)."""
    from fairy_spark.operators.packing import pack_into_bins

    q1 = gopher_quality_filter(docs, id_col, text_col)
    canonical = (
        q1.withColumn("_h", F.sha2(F.col(text_col), 256))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    q2 = q1.join(canonical, id_col, "left_semi")
    q3 = near_dup_removed(q2, id_col, text_col, length_col, near_dup_threshold)
    q4 = q3 if probe_docs is None else decontaminate(q3, probe_docs, id_col, text_col)
    t = q4.select(id_col, F.size(tokenize(F.col(text_col))).alias("n_tokens"))
    packed = pack_into_bins(t, id_col, "n_tokens", bin_tokens=bin_tokens)
    bucket = (
        portable_hash64(F.col(id_col).cast("string"), seed="split") % 100
    ).alias("bucket")
    out = packed.select(id_col, "n_tokens", "bin_id", bucket)
    split = (
        F.when(F.col("bucket") < 80, F.lit("train"))
        .when(F.col("bucket") < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return out.select(id_col, "n_tokens", "bin_id", "bucket", split.alias("split"))
