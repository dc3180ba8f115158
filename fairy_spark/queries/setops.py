"""Set operations + global sort (SURVEY.md §2.B sort/limit/set ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


def _buyers(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(F.col("o_custkey").alias("custkey"))


def _high_balance(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))


@register(
    "set_union_distinct",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) ORDER BY custkey
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _buyers(spark, sf_dir)
        .unionByName(_high_balance(spark, sf_dir))
        .dropDuplicates()
        .orderBy("custkey")
    )


@register(
    "set_union_all_counts",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) GROUP BY custkey ORDER BY custkey
    """,
)
def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _buyers(spark, sf_dir)
        .unionByName(_high_balance(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("custkey")
    )


@register(
    "set_intersect",
    oracle="""
    SELECT custkey FROM (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) ORDER BY custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _buyers(spark, sf_dir).intersect(_high_balance(spark, sf_dir)).orderBy("custkey")
    )


@register(
    "set_except",
    oracle="""
    SELECT custkey FROM (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT o_custkey AS custkey FROM orders
    ) ORDER BY custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _high_balance(spark, sf_dir).exceptAll(_buyers(spark, sf_dir)).dropDuplicates().orderBy("custkey")
    )


def _urgent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )


def _big_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    ) ORDER BY custkey
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection: each custkey kept min(count_left, count_right)
    times. Both sides carry genuine duplicates (customers place several
    orders), so this is distinguishable from distinct INTERSECT."""
    return (
        _urgent(spark, sf_dir)
        .intersectAll(_big_orders(spark, sf_dir))
        .orderBy("custkey")
    )


@register(
    "set_except_all",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    ) ORDER BY custkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: occurrences on the right subtract from the
    left count instead of deleting the key outright."""
    return (
        _urgent(spark, sf_dir)
        .exceptAll(_big_orders(spark, sf_dir))
        .orderBy("custkey")
    )


@register(
    "sort_multikey_nulls",
    oracle="""
    SELECT event_id, user_id, event_type,
           CASE WHEN event_type = 'error' THEN NULL ELSE ROUND(value, 6) END AS v
    FROM events
    WHERE user_id <= 5
    ORDER BY v DESC NULLS LAST, event_id
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 5)
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.round("value", 6))
    return (
        ev.select("event_id", "user_id", "event_type", v.alias("v"))
        .orderBy(F.desc_nulls_last("v"), F.asc("event_id"))
    )


@register(
    "sort_global_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Global top-k: Spark's TakeOrderedAndProject — per-partition heaps,
    # no full global sort materialization. The right plan at 100 TB.
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )
