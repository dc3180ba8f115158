"""Set-op multiplicity + null-join-key fuzzers (predicate-fuzz style).

INTERSECT ALL / EXCEPT ALL carry bag semantics — min(m, n) and
max(m - n, 0) copies per distinct row — and null join keys never
equi-match but DO survive outer joins; both are places engines
historically diverge. Hypothesis sweeps small random multisets with
nulls through Spark and DuckDB and demands identical multisets back.
"""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

val = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
bag = st.lists(st.tuples(val, val), min_size=0, max_size=10)


def _duck_pairs(sql, a, b):
    con = duckdb.connect()
    con.execute("CREATE TABLE a (x INT, y INT)")
    con.execute("CREATE TABLE b (x INT, y INT)")
    if a:
        con.executemany("INSERT INTO a VALUES (?, ?)", [list(t) for t in a])
    if b:
        con.executemany("INSERT INTO b VALUES (?, ?)", [list(t) for t in b])
    out = Counter(tuple(r) for r in con.execute(sql).fetchall())
    con.close()
    return out


def _spark_df(spark, rows):
    return spark.createDataFrame(
        [Row(x=x, y=y) for x, y in rows] if rows else [], "x INT, y INT"
    )


@settings(max_examples=12, deadline=None)
@given(a=bag, b=bag)
def test_intersect_except_all_multiplicities(spark, a, b):
    da, db = _spark_df(spark, a), _spark_df(spark, b)
    # NB: EXCEPT (distinct) is NOT dedup(EXCEPT ALL) — with m>n≥1
    # copies, EXCEPT drops the row entirely while EXCEPT ALL leaves
    # m-n copies (this fuzzer caught that construction error at
    # a=2×(NULL,NULL), b=1×). Spark's distinct EXCEPT is `subtract`.
    for op, sql in [
        ("intersectAll", "SELECT * FROM a INTERSECT ALL SELECT * FROM b"),
        ("exceptAll", "SELECT * FROM a EXCEPT ALL SELECT * FROM b"),
        ("intersect", "SELECT * FROM a INTERSECT SELECT * FROM b"),
        ("subtract", "SELECT * FROM a EXCEPT SELECT * FROM b"),
    ]:
        got = Counter((r["x"], r["y"]) for r in getattr(da, op)(db).collect())
        want = _duck_pairs(sql, a, b)
        assert got == want, (op, a, b, got, want)


@settings(max_examples=12, deadline=None)
@given(a=bag, b=bag)
def test_null_join_keys_never_equimatch_but_survive_outer(spark, a, b):
    """NULL x never matches NULL x in an equi-join, yet null-keyed rows
    must appear (null-padded) in the outer results — on both engines,
    with identical multiplicities."""
    da, db = _spark_df(spark, a), _spark_df(spark, b)
    joined = da.join(db.withColumnRenamed("y", "y2"), on="x", how="full_outer")
    got = Counter((r["x"], r["y"], r["y2"]) for r in joined.collect())
    want = _duck_pairs(
        "SELECT COALESCE(a.x, b.x), a.y, b.y FROM a FULL OUTER JOIN b ON a.x = b.x",
        a,
        b,
    )
    assert got == want, (a, b, got, want)
