"""Property fuzzers for the r10 per-row text operators: cdc_chunks and
winnow_fingerprints vs independent pure-Python reference models on
hypothesis-generated token streams (SURVEY §5.7 discipline — drive the
algebra's edges: repeated tokens, boundary tokens everywhere/nowhere,
single-token docs)."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


def _ph64(s: str, seed: str) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)


def _model_cdc(tokens: list[str], mod: int = 8) -> list[str]:
    # Positional fold: an '' token still contributes its ' ' separator
    # (chunk of ['', 'a'] is ' a', like the oracle's array_to_string
    # slice), and chunks that join to '' are dropped (`c <> ''`).
    chunks, cur = [], None
    for t in tokens:
        cur = t if cur is None else f"{cur} {t}"
        if _ph64(t, "cdc") % mod == 0:
            if cur != "":
                chunks.append(cur)
            cur = None
    if cur is not None and cur != "":
        chunks.append(cur)
    return chunks


def _model_winnow(tokens: list[str], k: int = 4, w: int = 4) -> set[int]:
    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hs = [_ph64(g, "win") for g in grams]
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


# lowercase tokens from a tiny alphabet => heavy repetition, plus both
# boundary-dense and boundary-free streams arise naturally; min_size=0
# admits '' tokens (a leading-whitespace tokenize artifact) so the
# positional-separator / empty-chunk-drop semantics are exercised
_tok = st.text(alphabet="abc", min_size=0, max_size=3)
_doc = st.lists(_tok, min_size=1, max_size=40)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=4))
def test_cdc_chunks_match_python_model(spark, docs):
    from fairy_spark.operators.text import cdc_chunks

    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "id BIGINT, toks ARRAY<STRING>"
    )
    got = {
        r["id"]: list(r["ch"])
        for r in df.select("id", cdc_chunks(F.col("toks")).alias("ch")).collect()
    }
    for i, toks in enumerate(docs):
        assert got[i] == _model_cdc(toks), (toks, got[i])


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=4))
def test_winnow_fingerprints_match_python_model(spark, docs):
    from fairy_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(docs)], "id BIGINT, toks ARRAY<STRING>"
    )
    got = {
        r["id"]: set(r["fp"])
        for r in df.select("id", winnow_fingerprints(F.col("toks")).alias("fp")).collect()
    }
    for i, toks in enumerate(docs):
        assert got[i] == _model_winnow(toks), (toks, got[i])
