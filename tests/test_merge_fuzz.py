"""merge_upsert model-based fuzz (VERDICT r4 #8).

Hypothesis generates small random target/source frames over a tiny key
domain — so duplicate source keys, NULL source keys, and NULL non-key
values are all common — and checks merge_upsert against:

  * a serial Python fold of the documented contract: drop NULL source
    keys, collapse duplicate source keys to the GREATEST row under the
    name-sorted non-key tuple (NULL field = smallest, matching the
    asc_nulls_first struct order Catalyst uses), then matched keys take
    the source row wholesale / unmatched source rows insert / remaining
    target rows pass through; and
  * DuckDB's real upsert (INSERT ... ON CONFLICT DO UPDATE) fed the
    model-deduped source — the engine-level cross-check that the
    full-outer-join encoding equals genuine MERGE semantics row-for-row.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from fairy_spark.operators.merge import merge_upsert

# tiny domains → frequent key collisions and duplicate source keys
key = st.one_of(st.none(), st.integers(min_value=0, max_value=5))
aval = st.one_of(st.none(), st.integers(min_value=-9, max_value=9))
bval = st.one_of(st.none(), st.sampled_from(["p", "q", "r"]))
src_rows = st.lists(st.tuples(key, aval, bval), min_size=0, max_size=10)
# target keys are unique + non-null (it's the maintained table)
tgt_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), aval, bval),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)


def _ordkey(row: tuple) -> tuple:
    """Total order over the name-sorted non-key tuple (a, b) with NULL
    smallest — the documented greatest-row-wins key."""
    a, b = row[1], row[2]
    return ((a is not None, a if a is not None else 0),
            (b is not None, b if b is not None else ""))


def _model(target, source):
    """Serial fold of the documented merge contract."""
    best: dict[int, tuple] = {}
    for r in source:
        if r[0] is None:
            continue
        if r[0] not in best or _ordkey(r) > _ordkey(best[r[0]]):
            best[r[0]] = r
    out = {r[0]: (r[1], r[2]) for r in target}
    for k, r in best.items():
        out[k] = (r[1], r[2])  # source wins wholesale, NULLs included
    return out


@settings(max_examples=15, deadline=None)
@given(target=tgt_rows, source=src_rows)
def test_merge_matches_serial_model(spark, target, source):
    t = spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in target], "k INT, a INT, b STRING"
    )
    s = spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in source], "k INT, a INT, b STRING"
    )
    got = {r["k"]: (r["a"], r["b"]) for r in merge_upsert(t, s, "k").collect()}
    assert got == _model(target, source)


@settings(max_examples=10, deadline=None)
@given(target=tgt_rows, source=src_rows)
def test_merge_matches_duckdb_on_conflict_upsert(spark, target, source):
    """With the source pre-collapsed to the deterministic winner, the
    full-outer-join encoding must equal DuckDB's native
    INSERT ... ON CONFLICT DO UPDATE row-for-row."""
    best: dict[int, tuple] = {}
    for r in source:
        if r[0] is None:
            continue
        if r[0] not in best or _ordkey(r) > _ordkey(best[r[0]]):
            best[r[0]] = r

    t = spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in target], "k INT, a INT, b STRING"
    )
    s = spark.createDataFrame(
        [Row(k=k, a=a, b=b) for k, a, b in source], "k INT, a INT, b STRING"
    )
    got = {r["k"]: (r["a"], r["b"]) for r in merge_upsert(t, s, "k").collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INT PRIMARY KEY, a INT, b VARCHAR)")
    if target:
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", [list(r) for r in target])
    if best:
        con.executemany(
            "INSERT INTO t VALUES (?, ?, ?)"
            " ON CONFLICT (k) DO UPDATE SET a = excluded.a, b = excluded.b",
            [list(r) for r in best.values()],
        )
    want = {k: (a, b) for k, a, b in con.execute("SELECT k, a, b FROM t").fetchall()}
    con.close()
    assert got == want
