"""Subquery surface: scalar, IN, EXISTS/NOT EXISTS, lateral.

The reference has no query language at all (SURVEY.md §3 — request
structs only), so this whole family is north-star relational surface.
It is also where Catalyst earns its keep at 100 TB: correlated
subqueries are decorrelated into joins (RewriteCorrelatedScalarSubquery
/ RewritePredicateSubquery), so none of these plans execute a
per-row inner query — the oracle checks semantics, test_plans.py
checks the rewrite produced a join, not a nested loop.

Expressed via ``spark.sql`` over temp views deliberately: the SQL
subquery planner IS the feature under test; the DataFrame API has no
subquery syntax (semi/anti joins cover that side in queries/joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fairy_spark.queries import register
from fairy_spark.sources.tables import register_views


@register(
    "sub_scalar_agg",
    oracle="""
    SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 6) AS price
    FROM lineitem
    WHERE l_extendedprice > 1.8 * (SELECT AVG(l_extendedprice) FROM lineitem)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def sub_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery → broadcast of a 1-row relation;
    the fact scan stays a single pass."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, ROUND(l_extendedprice, 6) AS price
        FROM lineitem
        WHERE l_extendedprice > 1.8 * (SELECT AVG(l_extendedprice) FROM lineitem)
        ORDER BY l_orderkey, l_linenumber
        """
    )


@register(
    "sub_in_segment",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      AND o_totalprice > 150000
    ORDER BY o_orderkey
    """,
)
def sub_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join after RewritePredicateSubquery."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
          AND o_totalprice > 150000
        ORDER BY o_orderkey
        """
    )


@register(
    "sub_exists_bigspender",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    ORDER BY c_custkey
    """,
)
def sub_exists_bigspender(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated to a semi join on o_custkey."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        ORDER BY c_custkey
        """
    )


@register(
    "sub_not_exists_no_urgent",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
    """,
)
def sub_not_exists_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (customers with no urgent order) → anti join."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey
        """
    )


@register(
    "sub_correlated_scalar",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 6) AS total,
           ROUND((SELECT COALESCE(SUM(l.l_extendedprice * (1 - l.l_discount)), 0)
                  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey), 6) AS net
    FROM orders o
    WHERE o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
)
def sub_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar agg subquery in the SELECT list — rewritten
    to a left outer join against a pre-aggregated lineitem."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               ROUND(o_totalprice, 6) AS total,
               ROUND((SELECT COALESCE(SUM(l.l_extendedprice * (1 - l.l_discount)), 0)
                      FROM lineitem l WHERE l.l_orderkey = o.o_orderkey), 6) AS net
        FROM orders o
        WHERE o_orderkey <= 2000
        ORDER BY o_orderkey
        """
    )


@register(
    "sub_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
         LATERAL (
           SELECT o_orderkey, o_totalprice
           FROM orders o
           WHERE o.o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey
           LIMIT 2
         ) t
    WHERE c.c_custkey <= 50
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
)
def sub_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table: top-2 orders per customer.
    Planner turns this into a ranked window over a join — no per-row
    re-execution."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
             LATERAL (
               SELECT o_orderkey, o_totalprice
               FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               LIMIT 2
             ) t
        WHERE c.c_custkey <= 50
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


@register(
    "sub_gt_all",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 6) AS total
    FROM orders
    WHERE o_totalprice > ALL (
      SELECT o_totalprice FROM orders WHERE o_custkey <= 100
    )
    ORDER BY o_orderkey
    """,
)
def sub_gt_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison (> ALL): orders larger than EVERY order
    of the first hundred customers. Catalyst rewrites the quantifier
    to a 1-row MAX aggregate broadcast against the outer scan — the
    textbook decorrelation that keeps `ALL` from being a per-row
    probe. (NULL subtlety: > ALL over an empty set is TRUE, over a
    set containing NULL is never TRUE for non-greater rows — both
    engines implement the standard's three-valued rule, and the
    subquery side here is non-null by schema.)"""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 6) AS total
        FROM orders
        WHERE o_totalprice > (
          SELECT MAX(o_totalprice) FROM orders WHERE o_custkey <= 100
        )
        ORDER BY o_orderkey
        """
    )


@register(
    "sub_not_in_nullaware",
    oracle="""
    SELECT 'null_poisoned' AS variant, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_orderpriority NOT IN (
      SELECT CASE WHEN event_type = 'error' THEN NULL ELSE 'P' || CAST(value % 3 AS INTEGER) END
      FROM events WHERE user_id = 1
    )
    UNION ALL
    SELECT 'null_free' AS variant, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE o_orderpriority NOT IN (
      SELECT 'P' || CAST(value % 3 AS INTEGER)
      FROM events WHERE user_id = 1 AND event_type != 'error'
    )
    ORDER BY variant
    """,
)
def sub_not_in_nullaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-aware NOT IN — the classic three-valued-logic trap: if the
    subquery result contains a single NULL, NOT IN returns UNKNOWN for
    every row and the query yields nothing; SQL demands exactly that,
    and Spark plans it as a NULL-AWARE anti join (single-column
    BroadcastNestedLoopJoin), distinct from NOT EXISTS's plain
    LeftAnti. Both behaviors are pinned side-by-side: the
    null_poisoned branch must count 0, the null_free branch the real
    complement — a 0-row result alone would be weak evidence. The subquery here (one user's event stream, mapped so
    'error' events inject NULL) is driver-bounded; at 100 TB a NOT IN
    over a corpus-sized nullable column is the anti-pattern — rewrite
    to NOT EXISTS, which this registry covers separately
    (sub_not_exists_no_urgent)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT 'null_poisoned' AS variant, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_orderpriority NOT IN (
          SELECT CASE WHEN event_type = 'error' THEN NULL
                      ELSE 'P' || CAST(CAST(value AS INT) % 3 AS STRING) END
          FROM events WHERE user_id = 1
        )
        UNION ALL
        SELECT 'null_free' AS variant, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE o_orderpriority NOT IN (
          SELECT 'P' || CAST(CAST(value AS INT) % 3 AS STRING)
          FROM events WHERE user_id = 1 AND event_type != 'error'
        )
        ORDER BY variant
        """
    )


_RECURSIVE_WALKS_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
           event_type AS dst
    FROM events
  ) t
  WHERE src IS NOT NULL AND src != dst
), walks AS (
  SELECT 'signup' AS node, 0 AS hop
  UNION ALL
  SELECT e.dst, w.hop + 1
  FROM walks w JOIN edges e ON e.src = w.node
  WHERE w.hop < 3
)
SELECT node, hop, CAST(COUNT(*) AS BIGINT) AS walks
FROM walks
GROUP BY node, hop
ORDER BY node, hop
"""


@register("sub_recursive_walks", oracle=_RECURSIVE_WALKS_SQL)
def sub_recursive_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4): counts length-k
    walks (k ≤ 3) from 'signup' through the distinct event-type
    transition graph — the same SQL text runs on BOTH engines, so
    this pins dialect-level recursion parity, not just result parity.
    Spark executes the recursion as an iterative UNION ALL loop
    (UnionLoop): each step is one frontier-sized equi join on the
    node key against the node-bounded edge list, with the engine's
    recursion-level limit (100) as the runaway guard on top of the
    explicit hop bound. Scale: frontier rows multiply by out-degree
    per hop — the hop bound IS the cost model, exactly as in the
    driver-loop twins (graph_pagerank's fixed _ITERS); edge
    extraction is the usual one-exchange user-timeline window. Walk
    counts are exact integers; no floats anywhere."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_WALKS_SQL)


@register(
    "sub_multi_col_in",
    oracle="""
    WITH active AS (
      SELECT l_returnflag, l_linestatus
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      HAVING COUNT(*) > 100
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l
    SEMI JOIN active a
      ON l.l_returnflag = a.l_returnflag AND l.l_linestatus = a.l_linestatus
    """,
)
def sub_multi_col_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column (row-value) IN subquery — (a, b) IN (SELECT x, y)
    — the tuple-membership SQL surface: rows whose (flag, status)
    pair belongs to the set of pairs still active late in the data's
    time range. Catalyst rewrites the row-value IN to a LeftSemi join
    on the COMPOSITE key — one hash semi join, exactly like the
    single-column case (sub_in_segment) — rather than the
    conjunction-of-INs a naive rewrite would produce (which is WRONG:
    (a,b) pairs, not independent membership per column). The inner
    set is group-bounded (≤ flag×status pairs); the HAVING threshold
    makes the subquery a real aggregate, not a distinct scan. The
    oracle spells the SAME semantics as an explicit SEMI JOIN on the
    composite key (DuckDB lacks row-value IN subqueries), which is
    precisely the plan Catalyst produces — the rewrite is the
    equivalence under test."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE (l_returnflag, l_linestatus) IN (
          SELECT l_returnflag, l_linestatus
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '2000-06-01 00:00:00'
          GROUP BY l_returnflag, l_linestatus
          HAVING COUNT(*) > 100
        )
        """
    )
