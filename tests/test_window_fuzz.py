"""Window-frame fuzzer (tests/test_predicate_fuzz.py style): hypothesis
draws random (group, order, value) rows and random frame bounds; the
same windowed aggregate in Spark and DuckDB must agree row-for-row.
Pins the frame-boundary semantics the example-based window oracle
queries can't sweep — ROWS offsets (preceding/following/unbounded) and
RANGE frames over duplicate order keys (peer rows are IN the frame on
both engines).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, Window, functions as F

row = st.tuples(
    st.integers(min_value=0, max_value=2),    # group: collisions guaranteed
    st.integers(min_value=0, max_value=9),    # order key: duplicates common
    st.integers(min_value=-50, max_value=50),
)
rows_strategy = st.lists(row, min_size=1, max_size=14)
offset = st.one_of(st.none(), st.integers(min_value=0, max_value=3))  # None = unbounded


def _duck(rows, frame_sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INT, o INT, id INT, v INT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?)",
        [[g, o, i, v] for i, (g, o, v) in enumerate(rows)],
    )
    got = dict(
        con.execute(
            f"SELECT id, SUM(v) OVER (PARTITION BY g ORDER BY {frame_sql}) FROM t"
        ).fetchall()
    )
    con.close()
    return got


@settings(max_examples=15, deadline=None)
@given(rows=rows_strategy, lo=offset, hi=offset)
def test_rows_frame_sum_agrees(spark, rows, lo, hi):
    df = spark.createDataFrame(
        [Row(g=g, o=o, id=i, v=v) for i, (g, o, v) in enumerate(rows)],
        "g INT, o INT, id INT, v INT",
    )
    start = Window.unboundedPreceding if lo is None else -lo
    end = Window.unboundedFollowing if hi is None else hi
    w = Window.partitionBy("g").orderBy("o", "id").rowsBetween(start, end)
    got = {r["id"]: r["s"] for r in df.select("id", F.sum("v").over(w).alias("s")).collect()}
    lo_sql = "UNBOUNDED PRECEDING" if lo is None else f"{lo} PRECEDING"
    hi_sql = "UNBOUNDED FOLLOWING" if hi is None else f"{hi} FOLLOWING"
    want = _duck(rows, f"o, id ROWS BETWEEN {lo_sql} AND {hi_sql}")
    assert got == want


@settings(max_examples=15, deadline=None)
@given(rows=rows_strategy, lo=offset, hi=offset)
def test_range_frame_sum_agrees_on_duplicate_keys(spark, rows, lo, hi):
    """RANGE frames order by the (duplicate-laden) key alone: peer rows
    at equal o must all be in the frame on both engines — the classic
    divergence between ROWS and RANGE that partition-order
    nondeterminism would expose if either engine got peers wrong."""
    df = spark.createDataFrame(
        [Row(g=g, o=o, id=i, v=v) for i, (g, o, v) in enumerate(rows)],
        "g INT, o INT, id INT, v INT",
    )
    start = Window.unboundedPreceding if lo is None else -lo
    end = Window.unboundedFollowing if hi is None else hi
    w = Window.partitionBy("g").orderBy("o").rangeBetween(start, end)
    got = {r["id"]: r["s"] for r in df.select("id", F.sum("v").over(w).alias("s")).collect()}
    lo_sql = "UNBOUNDED PRECEDING" if lo is None else f"{lo} PRECEDING"
    hi_sql = "UNBOUNDED FOLLOWING" if hi is None else f"{hi} FOLLOWING"
    want = _duck(rows, f"o RANGE BETWEEN {lo_sql} AND {hi_sql}")
    assert got == want
