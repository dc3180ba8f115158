"""Cross-engine determinism property test: the portable md5-derived
hash family (operators/text.py) must produce identical values in Spark
and DuckDB for ARBITRARY strings — the whole dedup/minhash surface
rests on it (SURVEY.md §7.5: no builtin hash()).

Hypothesis generates adversarial inputs (unicode, quotes, whitespace,
empty); values cross through parameter binding, never SQL literals, so
escaping is not part of the contract under test."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fairy_spark.operators.text import portable_hash64

TEXT = st.text(min_size=0, max_size=50).filter(lambda s: "\x00" not in s)


@settings(max_examples=20, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20, unique=True))
def test_portable_hash_matches_duckdb(spark, strings):
    sdf = spark.createDataFrame(pd.DataFrame({"s": strings}))
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", portable_hash64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": strings}))
    want = {
        s: h
        for s, h in con.execute(
            "SELECT s, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) FROM t"
        ).fetchall()
    }
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXT.filter(bool), min_size=1, max_size=10, unique=True))
def test_seeded_hash_matches_duckdb(spark, strings):
    from fairy_spark.operators.text import portable_hash_sql

    sdf = spark.createDataFrame(pd.DataFrame({"s": strings}))
    got = {
        r["s"]: r["h"]
        for r in sdf.select("s", portable_hash64(F.col("s"), "seedx").alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"s": strings}))
    want = {
        s: h
        for s, h in con.execute(
            f"SELECT s, {portable_hash_sql('s', 'seedx')} FROM t"
        ).fetchall()
    }
    assert got == want
