"""Rollup/cube fuzzer: random rows WITH NULL group keys — the case
where subtotal rows and null-valued data rows collide. GROUPING()
markers are the only thing separating them, so Spark and DuckDB must
agree on (key values, grouping ids, aggregates) for every generated
multiset, under both ROLLUP and CUBE.
"""

from __future__ import annotations

from collections import Counter

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

key = st.one_of(st.none(), st.sampled_from(["a", "b"]))
row = st.tuples(key, key, st.integers(min_value=-9, max_value=9))
rows_strategy = st.lists(row, min_size=1, max_size=10)


def _duck(rows, op):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g1 VARCHAR, g2 VARCHAR, v INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", [list(r) for r in rows])
    out = Counter(
        tuple(r)
        for r in con.execute(
            f"SELECT g1, g2, GROUPING(g1), GROUPING(g2), COUNT(*), SUM(v)"
            f" FROM t GROUP BY {op} (g1, g2)"
        ).fetchall()
    )
    con.close()
    return out


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy, op=st.sampled_from(["ROLLUP", "CUBE"]))
def test_rollup_cube_grouping_markers_agree(spark, rows, op):
    df = spark.createDataFrame(
        [Row(g1=a, g2=b, v=v) for a, b, v in rows], "g1 STRING, g2 STRING, v INT"
    )
    grouped = df.rollup("g1", "g2") if op == "ROLLUP" else df.cube("g1", "g2")
    got = Counter(
        (r["g1"], r["g2"], r["m1"], r["m2"], r["n"], r["s"])
        for r in grouped.agg(
            F.grouping("g1").cast("long").alias("m1"),
            F.grouping("g2").cast("long").alias("m2"),
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
        ).collect()
    )
    assert got == _duck(rows, op), (rows, op)
