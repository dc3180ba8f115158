"""Deterministic synthetic document corpora for scale-growth measurement
(VERDICT r4 #1).

Generates a documents table of any size with the SAME schema and
statistical shape as /root/testdata/sf*/documents.parquet (token-soup
text, ~20 sources, 30-69 tokens per doc) plus a CONTROLLED, bounded
duplication structure: a fixed fraction of docs are near-duplicates of
an earlier doc (within a bounded back-window, ~10% of token positions
mutated), so near-dup cluster sizes stay O(1) as the corpus grows.
That bounded-duplication premise is exactly the condition under which
SCALE.md argues the banded dedup paths grow near-linearly — this
generator exists to measure that claim instead of asserting it.

Everything is a Spark expression over spark.range(n): no Python RNG, no
driver-side loop, no collected data. Content derives from md5-based
portable_hash64 of (seed, doc id, position), so the same (n, seed,
params) always produces the identical corpus, distributed across
however many partitions the session has — the generator itself is
100 TB-shaped by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from fairy_spark.operators.text import portable_hash64

# Same flavor as the driver-generated testdata corpus.
_BASE_TOKENS = [
    "spark", "column", "line", "part", "scan", "fast", "query", "agg",
    "table", "hash", "value", "key", "group", "sort", "order", "batch",
    "small", "stream", "filter", "customer", "vector", "slow", "join",
    "shuffle", "plan", "merge", "window", "broadcast", "bucket", "row",
    "cache", "disk", "node", "task", "stage", "codegen", "arrow",
    "pandas", "schema", "string", "double", "bigint", "array", "map",
    "struct", "null", "index", "range",
]


def vocab(size: int) -> list[str]:
    """First `size` tokens of the infinite family tok, toka, tokb, ...
    Suffixes are ALPHABETIC (not digits) so the whole vocabulary
    matches ^[a-z]+$ — the driver testdata corpus is all-alpha
    (alphabetic ratio 1.0), and the Gopher alphabetic-ratio floor
    must see the same shape here (VERDICT r10 #1)."""

    def suffix(rep: int) -> str:
        s = ""
        while rep > 0:
            rep, r = divmod(rep - 1, 26)
            s = chr(ord("a") + r) + s
        return s

    out: list[str] = []
    rep = 0
    while len(out) < size:
        for t in _BASE_TOKENS:
            out.append(t if rep == 0 else f"{t}{suffix(rep)}")
            if len(out) == size:
                return out
        rep += 1
    return out


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 64,
    dup_rate_pct: int = 10,
    back_window: int = 50,
    mutate_one_in: int = 10,
    n_sources: int = 20,
    seed: str = "scale",
    stop_one_in: int = 16,
) -> DataFrame:
    """Deterministic corpus of `n_docs` rows with schema
    (doc_id, text, lang, source, n_chars).

    ``dup_rate_pct`` percent of docs copy the token stream of a doc at
    most ``back_window`` ids earlier, mutating ~1/``mutate_one_in`` of
    positions — near-dups with Jaccard well above random. source/lang
    follow the BASE doc, so blocked dedup variants can find the pair.

    ``stop_one_in``: ~1/stop_one_in of token positions emit an English
    stopword (hash-picked from operators.text.EN_STOPWORDS, keyed on
    the BASE doc's content id so dup pairs share their stopword
    positions). The default 16 reproduces the driver testdata's
    measured ~6.3% stopword density, so the Gopher stopword floor —
    and with it the whole composed pretraining pipeline — has a
    non-degenerate survivor population on synthetic replicas
    (VERDICT r10 #1: the old stopword-free vocabulary made the sf1
    replica reject EVERY document). 0 disables the stratum.
    """
    from fairy_spark.operators.text import EN_STOPWORDS

    varr = F.array(*[F.lit(t) for t in vocab(vocab_size)])
    sarr = F.array(*[F.lit(t) for t in EN_STOPWORDS])
    langs = F.array(F.lit("en"), F.lit("zh"), F.lit("de"), F.lit("fr"))
    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, n_docs, 1, par)

    def h(col: Column, salt: str) -> Column:
        return portable_hash64(col, f"{seed}:{salt}")

    sid = F.col("id").cast("string")
    is_dup = (F.col("id") > 0) & (
        F.pmod(h(sid, "dup"), F.lit(100)) < F.lit(dup_rate_pct)
    )
    back = F.lit(1) + F.pmod(h(sid, "back"), F.lit(back_window))
    content = F.when(is_dup, F.greatest(F.col("id") - back, F.lit(0))).otherwise(
        F.col("id")
    )
    df = df.withColumn("_dup", is_dup).withColumn("_content", content)
    cid = F.col("_content").cast("string")

    n_toks = (F.lit(30) + F.pmod(h(cid, "len"), F.lit(40))).cast("int")

    def pos_key(base: Column, i: Column) -> Column:
        return F.concat(base, F.lit("_"), i.cast("string"))

    def token_at(i: Column) -> Column:
        base_idx = F.pmod(h(pos_key(cid, i), "tok"), F.lit(vocab_size))
        mut_idx = F.pmod(h(pos_key(sid, i), "mutv"), F.lit(vocab_size))
        mutate = F.col("_dup") & (
            F.pmod(h(pos_key(sid, i), "mut"), F.lit(mutate_one_in)) == 0
        )
        idx = F.when(mutate, mut_idx).otherwise(base_idx)
        tok = F.element_at(varr, (idx + 1).cast("int"))
        if stop_one_in <= 0:
            return tok
        # stopword positions + picks follow the BASE content id (cid),
        # so a dup doc shares them with its base; a mutated position
        # stays a vocab perturbation even if it lands on one
        is_stop = F.pmod(h(pos_key(cid, i), "stop"), F.lit(stop_one_in)) == 0
        stop_tok = F.element_at(
            sarr,
            (F.pmod(h(pos_key(cid, i), "stopv"), F.lit(len(EN_STOPWORDS))) + 1).cast(
                "int"
            ),
        )
        return F.when(is_stop & ~mutate, stop_tok).otherwise(tok)

    text = F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_toks), token_at))
    return df.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.element_at(langs, (F.pmod(h(cid, "lang"), F.lit(4)) + 1).cast("int")).alias(
            "lang"
        ),
        F.concat(F.lit("src"), F.pmod(h(cid, "src"), F.lit(n_sources))).alias("source"),
    ).withColumn("n_chars", F.length("text"))
