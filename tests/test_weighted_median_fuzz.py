"""agg_weighted_median's histogram reduction, fuzzed engine-free.

The registry query computes the weighted median as the smallest cell
value whose cumulative weight reaches half the group total, over
per-(group, value) weight cells. This test replays that reduction in
pure Python on random weighted multisets — zero weights, single-row
groups, all-ties — against the definition: the smallest v such that
the total weight of items <= v is at least half the group's weight."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings, strategies as st

item = st.tuples(
    st.sampled_from(["a", "b"]),
    st.integers(min_value=0, max_value=6),    # value (small → ties)
    st.integers(min_value=0, max_value=100),  # weight (0 allowed)
)
items = st.lists(item, min_size=1, max_size=25)


def _reduction(rows):
    cells: dict[tuple[str, int], int] = defaultdict(int)
    for g, v, w in rows:
        cells[(g, v)] += w
    tot: dict[str, int] = defaultdict(int)
    for (g, v), w in cells.items():
        tot[g] += w
    out = {}
    for g in tot:
        cw = 0
        for v in sorted(v for (gg, v) in cells if gg == g):
            cw += cells[(g, v)]
            if 2 * cw >= tot[g]:
                out[g] = v
                break
    return out


def _brute(rows):
    tot: dict[str, int] = defaultdict(int)
    for g, v, w in rows:
        tot[g] += w
    out = {}
    for g in tot:
        vals = sorted({v for gg, v, w in rows if gg == g})
        for v in vals:
            below = sum(w for gg, vv, w in rows if gg == g and vv <= v)
            if 2 * below >= tot[g]:
                out[g] = v
                break
    return out


@settings(max_examples=300, deadline=None)
@given(rows=items)
def test_histogram_reduction_equals_definition(rows):
    assert _reduction(rows) == _brute(rows), rows
