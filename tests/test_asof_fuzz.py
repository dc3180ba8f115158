"""As-of join property tests (SURVEY.md §7 risk 1; VERDICT r3 item 6).

asof_join_backward documents: latest right row with ts <= left ts per
key, DuckDB-ASOF boundary semantics (equal ts matches), and — for
DUPLICATE right rows at one (key, ts) — a deterministic winner: the
greatest row under the value-column tuple. Hypothesis generates small
random streams over a deliberately tiny (key, ts) domain so duplicate
timestamps are common, then checks:

  * against a serial Python fold implementing the documented rule
    (duplicates included), and
  * against DuckDB's real ASOF JOIN on a per-(key, ts) pre-aggregated
    right side (the unique case both engines define identically —
    pre-aggregation uses MAX(val), matching our greatest-row rule).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from fairy_spark.operators.asof import asof_join_backward

row = st.tuples(
    st.sampled_from(["a", "b", "c"]),       # key: 3 values → collisions
    st.integers(min_value=0, max_value=9),  # ts: 10 values → duplicates
    st.integers(min_value=-50, max_value=50),
)
stream = st.lists(row, min_size=1, max_size=12)


def _expected(left_rows, right_rows):
    """Serial fold of the documented rule: per left row, among right
    rows with same key and ts <= left ts, the max (ts, val) tuple wins
    (greatest-value tie-break at equal ts)."""
    out = {}
    for i, (k, lts, _) in enumerate(left_rows):
        cands = [(rts, v) for (rk, rts, v) in right_rows if rk == k and rts <= lts]
        out[i] = max(cands)[1] if cands else None
    return out


@settings(max_examples=15, deadline=None)
@given(left=stream, right=stream)
def test_asof_duplicate_right_ts_deterministic_winner(spark, left, right):
    ldf = spark.createDataFrame(
        [Row(k=k, lts=t, lid=i) for i, (k, t, _) in enumerate(left)],
        "k STRING, lts INT, lid INT",
    )
    rdf = spark.createDataFrame(
        [Row(k=k, rts=t, val=v) for (k, t, v) in right],
        "k STRING, rts INT, val INT",
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join_backward(
            ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        ).collect()
    }
    assert got == _expected(left, right)


@settings(max_examples=10, deadline=None)
@given(left=stream, right=stream)
def test_asof_matches_duckdb_asof_on_unique_right(spark, left, right):
    """With the right side pre-aggregated to MAX(val) per (key, ts) —
    the same winner our tie-break picks — our union+window encoding
    must equal DuckDB's native ASOF JOIN row-for-row, including the
    equal-timestamp boundary."""
    uniq = {}
    for k, t, v in right:
        uniq[(k, t)] = max(v, uniq.get((k, t), v))
    right_u = [(k, t, v) for (k, t), v in uniq.items()]

    ldf = spark.createDataFrame(
        [Row(k=k, lts=t, lid=i) for i, (k, t, _) in enumerate(left)],
        "k STRING, lts INT, lid INT",
    )
    rdf = spark.createDataFrame(
        [Row(k=k, rts=t, val=v) for (k, t, v) in right_u],
        "k STRING, rts INT, val INT",
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join_backward(
            ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k VARCHAR, lts INT, lid INT)")
    con.execute("CREATE TABLE r (k VARCHAR, rts INT, val INT)")
    con.executemany(
        "INSERT INTO l VALUES (?, ?, ?)",
        [[k, t, i] for i, (k, t, _) in enumerate(left)],
    )
    if right_u:
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", [list(x) for x in right_u])
    want = dict(
        con.execute(
            "SELECT l.lid, r.val FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND l.lts >= r.rts"
        ).fetchall()
    )
    con.close()
    assert got == want


def test_asof_duplicate_ts_null_value_winner_is_row_atomic(spark):
    """ADVICE r4: the duplicate-(key, ts) winner must be ROW-atomic.
    Two right rows at ts=5 — (a=2, b=NULL) and (a=1, b=7) — the
    greatest struct is (2, NULL); per-column last-non-null would emit
    the mixed row (2, 7), which exists in neither input row."""
    ldf = spark.createDataFrame([Row(k="x", lts=9)], "k STRING, lts INT")
    rdf = spark.createDataFrame(
        [Row(k="x", rts=5, a=2, b=None), Row(k="x", rts=5, a=1, b=7)],
        "k STRING, rts INT, a INT, b INT",
    )
    out = asof_join_backward(
        ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts", value_cols=["a", "b"]
    ).collect()
    assert [(r["a"], r["b"]) for r in out] == [(2, None)]


def test_asof_latest_row_null_value_not_backfilled(spark):
    """DuckDB-ASOF row semantics: if the latest at-or-before right row
    holds NULL in a value column, the left row gets that NULL — no
    silent per-column fallback to an older row."""
    ldf = spark.createDataFrame([Row(k="x", lts=9)], "k STRING, lts INT")
    rdf = spark.createDataFrame(
        [Row(k="x", rts=1, a=10, b=20), Row(k="x", rts=5, a=2, b=None)],
        "k STRING, rts INT, a INT, b INT",
    )
    out = asof_join_backward(
        ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts", value_cols=["a", "b"]
    ).collect()
    assert [(r["a"], r["b"]) for r in out] == [(2, None)]


def _expected_forward(left_rows, right_rows):
    """Serial fold of asof_join_forward's rule: per left row, among
    right rows with same key and ts >= left ts, the MIN ts wins;
    among duplicates at that ts, the greatest value."""
    out = {}
    for i, (k, lts, _) in enumerate(left_rows):
        cands = [(rts, v) for (rk, rts, v) in right_rows if rk == k and rts >= lts]
        if not cands:
            out[i] = None
        else:
            best_ts = min(rts for rts, _ in cands)
            out[i] = max(v for rts, v in cands if rts == best_ts)
    return out


@settings(max_examples=15, deadline=None)
@given(left=stream, right=stream)
def test_asof_forward_duplicate_right_ts_deterministic_winner(spark, left, right):
    from fairy_spark.operators.asof import asof_join_forward

    ldf = spark.createDataFrame(
        [Row(k=k, lts=t, lid=i) for i, (k, t, _) in enumerate(left)],
        "k STRING, lts INT, lid INT",
    )
    rdf = spark.createDataFrame(
        [Row(k=k, rts=t, val=v) for (k, t, v) in right],
        "k STRING, rts INT, val INT",
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join_forward(
            ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts", value_cols=["val"]
        ).collect()
    }
    assert got == _expected_forward(left, right)


def test_asof_explicit_tie_break_column_picks_winner(spark):
    """ADVICE r5: callers can name the tie-break column explicitly —
    the duplicate-(keys, ts) right row with the GREATEST tie_break
    value wins row-atomically, in BOTH directions, even when the
    default greatest-value-struct policy would pick a different row."""
    from fairy_spark.operators.asof import asof_join_backward, asof_join_forward

    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    # two right rows at the same (k, ts): higher seq carries the LOWER
    # value, so the two policies disagree on purpose
    right = spark.createDataFrame(
        [(1, 10, 1, 99.0), (1, 10, 2, 5.0)], "k int, ts int, seq int, v double"
    )

    for fn in (asof_join_backward, asof_join_forward):
        default = fn(left, right, ["k"], "ts", "ts", ["v"]).collect()[0]
        assert default["v"] == 99.0, f"{fn.__name__}: default policy changed"
        by_seq = fn(left, right, ["k"], "ts", "ts", ["v"], tie_break="seq").collect()[0]
        assert by_seq["v"] == 5.0, f"{fn.__name__}: tie_break=seq not honored"
        # output schema must not leak the tie-break carrier
        cols = fn(left, right, ["k"], "ts", "ts", ["v"], tie_break="seq").columns
        assert cols == ["k", "ts", "v"]
