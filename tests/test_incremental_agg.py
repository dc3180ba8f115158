"""agg_incremental_merge's merge law, fuzzed over arbitrary splits.

The registry query proves merge(partial(base), partial(delta)) ==
full(base ∪ delta) for ONE fixed date cut (the oracle computes the
direct aggregate). This fuzz generalizes the law: hypothesis picks
random row sets and a random per-row split assignment — including
empty base, empty delta, and groups present on only one side — and
checks that summing partial states (count, Σ integer units) over ANY
2-way split reproduces the direct aggregate exactly, cross-checked
against a serial Python fold. This is the commutative-monoid contract
partial aggregation (map-side combine) relies on; integer units make
it exact, where merging divided doubles would reintroduce float
association error.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

grp = st.sampled_from(["A", "B", "C"])
units = st.integers(min_value=-(10**12), max_value=10**12)
rows = st.lists(st.tuples(grp, units), min_size=1, max_size=30)
splits = st.lists(st.booleans(), min_size=30, max_size=30)


@settings(max_examples=20, deadline=None)
@given(rows=rows, split=splits)
def test_partial_state_merge_equals_direct_agg(spark, rows, split):
    # Deterministic split: row i goes to base iff split[i] (explicit
    # index column — monotonically_increasing_id would be plan-
    # dependent and unfuzzable).
    df = spark.createDataFrame(
        [Row(i=i, g=g, u=u) for i, (g, u) in enumerate(rows)],
        schema="i int, g string, u long",
    )
    in_base = [i for i in range(len(rows)) if split[i]]

    def partial(frame):
        return frame.groupBy("g").agg(
            F.count(F.lit(1)).alias("n"), F.sum("u").alias("s")
        )

    base = df.filter(F.col("i").isin(in_base) if in_base else F.lit(False))
    delta = df.filter(~F.col("i").isin(in_base) if in_base else F.lit(True))
    merged = (
        partial(base)
        .unionAll(partial(delta))
        .groupBy("g")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    got = {r["g"]: (r["n"], r["s"]) for r in merged.collect()}
    want = {r["g"]: (r["n"], r["s"]) for r in partial(df).collect()}
    assert got == want
    # engine-independent model
    model: dict[str, list] = defaultdict(lambda: [0, 0])
    for g, u in rows:
        model[g][0] += 1
        model[g][1] += u
    assert want == {g: (n, s) for g, (n, s) in model.items()}
