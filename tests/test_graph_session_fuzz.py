"""Model-based property tests for the round-5 additions that have
nontrivial algorithmic structure: degree-ordered triangle counting
(vs a naive all-triple scan) and gap sessionization (vs a serial
fold of the documented 30-min rule). Both follow the repo's fuzz
convention: tiny random inputs from hypothesis, an obviously-correct
Python model, exact equality."""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, Window, functions as F


# ---------- triangle counting ----------

edge = st.tuples(
    st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
)
edge_list = st.lists(edge, min_size=0, max_size=25)


def _oriented_triangles(edges: set[frozenset]) -> int:
    nodes = {n for e in edges for n in e}
    return sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if frozenset((a, b)) in edges
        and frozenset((b, c)) in edges
        and frozenset((a, c)) in edges
    )


def _spark_triangles(spark, undirected: set[frozenset]) -> int:
    """The graph_triangles plan shape (degree-ordered orientation +
    3-way equi-join) applied to an explicit edge list."""
    rows = [Row(u=min(e), v=max(e)) for e in undirected]
    pairs = spark.createDataFrame(rows, "u INT, v INT")
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).count()


@settings(max_examples=10, deadline=None)
@given(edges=edge_list)
def test_degree_ordered_triangle_count_matches_naive(spark, edges):
    undirected = {frozenset(e) for e in edges if e[0] != e[1]}
    assert _spark_triangles(spark, undirected) == _oriented_triangles(undirected)


# ---------- sessionization ----------

event = st.tuples(
    st.integers(min_value=0, max_value=2),      # user
    st.integers(min_value=0, max_value=200),    # minute offset
)
event_list = st.lists(event, min_size=1, max_size=20)

GAP_MIN = 30


def _model_sessions(events):
    """Serial fold of the documented rule: per user, ordered by
    (ts, event_id); a gap STRICTLY greater than 30 min opens a new
    session. Returns {(user, session_no): (start, end, n)}."""
    out = {}
    per_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, m) in enumerate(events):
        per_user.setdefault(u, []).append((m, i))
    for u, evs in per_user.items():
        evs.sort()
        sess = 0
        prev = None
        for m, _i in evs:
            if prev is None or m - prev > GAP_MIN:
                sess += 1
            key = (u, sess)
            if key not in out:
                out[key] = [m, m, 0]
            out[key][1] = m
            out[key][2] += 1
            prev = m
    return {k: tuple(v) for k, v in out.items()}


@settings(max_examples=10, deadline=None)
@given(events=event_list)
def test_sessionize_matches_serial_fold(spark, events):
    rows = [
        Row(user_id=u, ts_min=m, event_id=i) for i, (u, m) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "user_id INT, ts_min INT, event_id INT")
    w = Window.partitionBy("user_id").orderBy("ts_min", "event_id")
    flagged = df.select(
        "user_id",
        "ts_min",
        "event_id",
        F.when(
            F.lag("ts_min").over(w).isNull()
            | (F.col("ts_min") - F.lag("ts_min").over(w) > GAP_MIN),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    got = {
        (r["user_id"], r["session_no"]): (r["start"], r["end"], r["n"])
        for r in flagged.select(
            "user_id",
            "ts_min",
            F.sum("new_sess")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("session_no"),
        )
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts_min").alias("start"),
            F.max("ts_min").alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == _model_sessions(events)
