"""scd2_apply model-based fuzz (the test_merge_fuzz pattern).

Hypothesis generates small random dimension/batch frames over a tiny
key domain — duplicate batch keys, NULL batch keys, NULL attributes,
and no-op updates are all common — and checks scd2_apply against a
serial Python fold of the documented contract: drop NULL-key update
rows, collapse duplicate keys to the greatest (eff, attr) tuple
(NULL attr = smallest, Catalyst's asc_nulls_first struct order),
null-safe change detection, close-and-reopen on change, passthrough
otherwise, first-version insert for new keys.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from fairy_spark.operators.merge import scd2_apply

T0 = dt.datetime(2024, 1, 1)
EFFS = [dt.datetime(2024, 6, 1), dt.datetime(2024, 9, 1)]

key = st.one_of(st.none(), st.integers(min_value=0, max_value=4))
seg = st.one_of(st.none(), st.sampled_from(["x", "y"]))
upd_rows = st.lists(st.tuples(key, seg, st.sampled_from(EFFS)), max_size=8)
dim_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=4), seg),
    max_size=5,
    unique_by=lambda r: r[0],
)


def _model(dim, batch):
    # collapse: greatest (eff, seg) per non-null key; None sorts smallest
    win: dict[int, tuple] = {}
    for k, s, eff in batch:
        if k is None:
            continue
        cand = (eff, (s is not None, s))
        if k not in win or cand > (win[k][2], (win[k][1] is not None, win[k][1])):
            win[k] = (k, s, eff)
    out = []
    dim_keys = set()
    for k, s in dim:
        dim_keys.add(k)
        if k in win and win[k][1] != s:
            _, ns, eff = win[k]
            out.append((k, s, T0, eff, False))
            out.append((k, ns, eff, None, True))
        else:
            out.append((k, s, T0, None, True))
    for k, (kk, s, eff) in win.items():
        if k not in dim_keys:
            out.append((k, s, eff, None, True))
    return sorted(out, key=lambda r: (r[0], r[2], str(r[1])))


@settings(max_examples=25, deadline=None)
@given(dim=dim_rows, batch=upd_rows)
def test_scd2_matches_serial_model(spark, dim, batch):
    cur = spark.createDataFrame(
        [(k, s, T0) for k, s in dim], "k bigint, seg string, valid_from timestamp"
    )
    upd = spark.createDataFrame(batch, "k bigint, seg string, eff timestamp")
    got = sorted(
        (
            (r["k"], r["seg"], r["valid_from"], r["valid_to"], r["is_current"])
            for r in scd2_apply(cur, upd, "k", "eff", ["seg"]).collect()
        ),
        key=lambda r: (r[0], r[2], str(r[1])),
    )
    assert got == _model(dim, batch), (dim, batch)
