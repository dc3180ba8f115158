"""Bounded-error contracts for the approximate aggregates (SURVEY.md
§2.B 'bounded-error check'): the sketches are engine-specific, so the
oracle carries the EXACT value and these tests pin the approximation
error instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from fairy_spark.sources.tables import load_table


def test_hll_within_5pct_of_exact(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact"),
        # rsd is a STANDARD DEVIATION, not a bound (default 0.05 drew a
        # 6.7% error on this data) — ask for 1% and assert 3 sigma
        F.approx_count_distinct("o_custkey", 0.01).alias("hll"),
    ).first()
    assert abs(row["hll"] - row["exact"]) <= 0.03 * row["exact"], row


def test_approx_percentile_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).first()
    # accuracy=10000 → rank error <= n/10000; values are spread over
    # ~[900, 105k], allow 1% relative on the value
    assert abs(row["approx"] - row["exact"]) <= 0.01 * row["exact"], row


def test_hll_and_sketch_are_plannable_as_partial_aggs(spark, sf_dir):
    """Sketches must keep map-side partial aggregation — that's their
    whole point at 100 TB (mergeable state, no exact-distinct shuffle
    of raw keys)."""
    import io as _io
    from contextlib import redirect_stdout

    df = load_table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("nd")
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_approx_count_distinct" in plan, plan
