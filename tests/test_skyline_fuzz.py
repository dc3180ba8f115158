"""win_pareto_frontier's sort+running-min reduction, fuzzed against
brute-force dominance.

The registry query claims the 2D skyline (maximize revenue, minimize
price, per group) reduces to ordering by (revenue desc, id) and
keeping rows whose price strictly undercuts every predecessor's
minimum (ties on revenue order cheapest-first so equal-revenue
dominated rows are eliminated — the ordering bug this fuzz caught). This hypothesis test replays that reduction in pure Python
on random point sets — heavy ties included — and checks it against
the definition-level answer: a point survives iff no other point in
its group is >= on revenue and <= on price with at least one strict,
EXCEPT that among fully-tied duplicates only the lowest id survives
(the reduction's deterministic representative, which the registry
query's unique (revenue, suppkey) ordering pins)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

pt = st.tuples(
    st.sampled_from(["g1", "g2"]),          # group
    st.integers(min_value=0, max_value=9),  # id (unique-ified below)
    st.integers(min_value=0, max_value=5),  # revenue (small → many ties)
    st.integers(min_value=0, max_value=5),  # price
)
points = st.lists(pt, min_size=0, max_size=12)


def _reduction(rows):
    out = []
    for grp in {r[0] for r in rows}:
        best = None
        for _, i, rev, price in sorted(
            ((r[0], r[1], -r[2], r[3]) for r in rows if r[0] == grp),
            key=lambda t: (t[2], t[3], t[1]),
        ):
            if best is None or price < best:
                out.append((grp, i))
                best = price if best is None else min(best, price)
    return set(out)


def _brute(rows):
    out = set()
    for grp, i, rev, price in rows:
        dominated = False
        for g2, j, rev2, price2 in rows:
            if g2 != grp or (i == j):
                continue
            if rev2 >= rev and price2 <= price and (rev2 > rev or price2 < price):
                dominated = True
                break
            if rev2 == rev and price2 == price and j < i:
                dominated = True  # duplicate point: lowest id represents
                break
        if not dominated:
            out.add((grp, i))
    return out


@settings(max_examples=300, deadline=None)
@given(rows=points)
def test_running_min_reduction_equals_brute_force_dominance(rows):
    # unique ids per group (the registry query's suppkey is unique)
    seen = set()
    uniq = []
    for g, i, rev, price in rows:
        if (g, i) not in seen:
            seen.add((g, i))
            uniq.append((g, i, rev, price))
    assert _reduction(uniq) == _brute(uniq), uniq
