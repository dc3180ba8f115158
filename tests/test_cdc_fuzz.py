"""apply_cdc model-based fuzz (companion to test_merge_fuzz.py).

Hypothesis generates a small random snapshot plus a random CDC log over
a tiny key domain — so multi-entry per-key logs, delete-then-reinsert
chains, ops on absent keys, and NULL keys are all common — and checks
operators/merge.apply_cdc against a serial Python replay of the
documented contract: drop NULL-key log rows, keep only the highest-seq
entry per key (seq is unique per key by construction, mirroring the
operator's stated monotonicity precondition), then final 'D' removes,
final 'I'/'U' replaces-or-creates, untouched snapshot rows pass
through."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from fairy_spark.operators.merge import apply_cdc

aval = st.one_of(st.none(), st.integers(min_value=-9, max_value=9))
sval = st.one_of(st.none(), st.sampled_from(["p", "q", "r"]))

snap_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), sval, aval),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)


@st.composite
def cdc_logs(draw):
    """Log rows (k, seq, op, s, v) with per-key unique seq (the
    operator's documented precondition) and NULL keys mixed in."""
    n = draw(st.integers(min_value=0, max_value=12))
    used: dict[int, int] = {}
    rows = []
    for _ in range(n):
        k = draw(st.one_of(st.none(), st.integers(min_value=0, max_value=7)))
        if k is None:
            seq = 1
        else:
            used[k] = used.get(k, 0) + 1
            seq = used[k]
        op = draw(st.sampled_from(["I", "U", "D"]))
        rows.append((k, seq, op, draw(sval), draw(aval)))
    return rows


def _model(snapshot, log):
    latest: dict[int, tuple] = {}
    for r in log:
        if r[0] is None:
            continue
        if r[0] not in latest or r[1] > latest[r[0]][1]:
            latest[r[0]] = r
    out = {r[0]: (r[1], r[2]) for r in snapshot}
    for k, r in latest.items():
        if r[2] == "D":
            out.pop(k, None)
        else:
            out[k] = (r[3], r[4])
    return out


@settings(max_examples=15, deadline=None)
@given(snapshot=snap_rows, log=cdc_logs())
def test_apply_cdc_matches_serial_replay(spark, snapshot, log):
    snap_df = spark.createDataFrame(snapshot, "k long, s string, v long")
    log_df = spark.createDataFrame(
        log, "k long, seq long, op string, s string, v long"
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in apply_cdc(snap_df, log_df, key="k").collect()
    }
    assert got == _model(snapshot, log)
