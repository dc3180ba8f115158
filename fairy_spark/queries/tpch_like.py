"""TPC-H-shaped analytic queries over the star schema (SURVEY.md §2.B joins/aggs
composed end-to-end).

These are the queries a reference user actually runs against a cached
analytics store — multi-way joins, selective predicates, grouped
revenue rollups. They're also where plan quality shows: join order,
broadcast vs shuffle choice, and pushdown decide whether the plan
scans 100 TB once or four times. The star topology here (lineitem fact
⋈ orders ⋈ customer ⋈ nation/region dims) is the canonical case for
broadcast-dim joins: only fact⋈orders shuffles; everything under ~10 MB
broadcasts (tables.py BROADCAST_TABLES).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fairy_spark.functions.exact import money_sum as _money_sum, round6 as _round6
from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 20
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: two selective fact predicates push to the scans,
    customer filter shrinks the build side before the join."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(20)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; supplier/nation/region broadcast, so
    the only shuffles are the two fact-fact exchanges."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-agg; every predicate reaches
    the parquet reader, zero shuffles besides the final 1-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer; the LIMIT
    plans as TakeOrderedAndProject (per-partition heaps), not a global
    sort of the grouped output."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_volume_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, ROUND(o.o_totalprice, 6) AS total, t.sum_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 200
    ) t ON o.o_orderkey = t.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: pre-aggregate the fact to a small keyset, then
    join — aggregation BEFORE the join is the scale-critical rewrite
    (the filtered keyset is tiny; joining raw lineitem first would
    shuffle the whole fact)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 200)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 6).alias("total"),
            "sum_qty",
        )
        .orderBy(F.col("total").desc(), "o_orderkey")
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(
             100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: month-selective fact predicate pushes to the
    scan; part is a broadcast dim; promo share computed as one
    conditional aggregation — a single fact pass, no second join or
    subquery for the numerator."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_revenue_pct")
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: testdata lacks commit/receipt dates, so
    "late" = shipped after the order date): EXISTS becomes a left-semi
    join with the date comparison in the join condition, then a tiny
    grouped count. The semi-join never widens orders with lineitem
    columns — at scale that's the difference between shuffling a keyset
    and shuffling the fact."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (nation-pair trade volume by year). Both sides are
    pre-restricted to the two nations via broadcast nation joins BEFORE
    the fact joins — the pair predicate then only drops the two
    same-nation combinations, so the big shuffles carry ~2/25 of
    supplier-side and customer-side rows."""
    pair = ("NATION_1", "NATION_2")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT) AS volume_u,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE p.p_type = 'ECONOMY'
        AND r.r_name = 'ASIA'
        AND o.o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
    )
    SELECT o_year,
           CAST(FLOOR(
             CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_u ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume_u) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) / 1000000.0
             AS mkt_share
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): numerator and denominator
    in ONE pass via conditional aggregation — never two scans. part,
    supplier, nation, region broadcast; only the fact-fact joins
    shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31 00:00:00")
    )
    c = load_table(spark, sf_dir, "customer")
    vol = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0)
            .cast("bigint")
            .alias("volume_u"),
            "supp_nation",
        )
    )
    # Integer-unit numerator/denominator are exact on both engines, so
    # the quotient and its floor-rounding are the same IEEE ops.
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume_u")).otherwise(F.lit(0))
    ).cast("double") / F.sum("volume_u").cast("double")
    return (
        vol.groupBy("o_year")
        .agg(_round6(share).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (order-count distribution): LEFT join with the
    filter INSIDE the join condition (a WHERE would drop the zero-order
    customers the query exists to count), then two hash aggregations.
    The second agg's keyspace is tiny (distinct counts), so the heavy
    shuffle is only the first, on c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(FLOOR(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#5'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity orders). The correlated scalar
    subquery is decorrelated by hand into a per-part average computed
    ONCE over the brand-restricted lineitems (the brand filter commutes
    with the per-part aggregate because correlation is on p_partkey),
    broadcast back — the fact table is scanned twice but shuffled only
    on the small brand-filtered slice."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li = load_table(spark, sf_dir, "lineitem")
    brand_li = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    lim = (
        brand_li.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim"))
        .withColumnRenamed("l_partkey", "lim_pk")
    )
    return brand_li.join(
        F.broadcast(lim), F.col("l_partkey") == F.col("lim_pk")
    ).filter(F.col("l_quantity") < F.col("qty_lim")).agg(
        _round6(_money_sum(F.col("l_extendedprice"), unit=100) / 7.0).alias(
            "avg_yearly"
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive brand/size/quantity predicates over
    an equi-join). The OR tree stays a post-join filter on the
    broadcast hash join; Catalyst still derives the implied single-side
    prefilters (brand IN (..), quantity ranges) and pushes them to the
    scans."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n.n_name = 'NATION_4'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-blame supplier; returnflag stands in for
    the receipt-delay columns the test schema omits). The EXISTS /
    NOT-EXISTS pair is decorrelated into ONE per-order aggregate —
    n_suppliers and the distinct set of 'R' suppliers — joined back on
    l_orderkey: sole-blame ⇔ order has ≥2 suppliers and exactly one
    distinct R-supplier (which is l1's, since l1 itself has flag R).
    One extra shuffle on the join key replaces two correlated probes
    of the fact table."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_ok")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            F.broadcast(
                s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
                .select("s_suppkey", "s_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_orderkey", "s_name")
    )
    return (
        l1.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(per_order, F.col("l_orderkey") == F.col("po_ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q22_idle_customers",
    oracle="""
    SELECT CAST(c_custkey % 7 AS INTEGER) AS cntrycode,
           COUNT(*) AS numcust,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (well-funded customers gone idle; custkey mod 7
    stands in for the phone country code the test schema omits). The
    scalar average broadcasts as a 1-row frame; the NOT EXISTS is a
    LEFT ANTI join against date-filtered orders — both the canonical
    decorrelations."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich.groupBy((F.col("c_custkey") % 7).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money_sum(F.col("c_acctbal"), unit=100).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS o_year,
           SUM(CAST(ROUND((l.l_extendedprice * (1 - l.l_discount)
                           - p.p_retailprice * l.l_quantity * 0.1) * 10000) AS BIGINT))
             / 10000.0 AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year),
    adapted: the test schema has no partsupp, so unit cost is proxied
    as 10% of p_retailprice (profit = revenue − cost·qty; the join
    topology — fact ⋈ SF-proportional part ⋈ dim supplier ⋈ dim
    nation with a LIKE filter on part — is the point, not the cost
    constant). Scale shape: the p_name filter shrinks part BEFORE the
    partkey join (pushed to its scan); supplier/nation broadcast; the
    only big exchange is lineitem⋈part on partkey, and AQE may demote
    even that to broadcast when the filtered part side is small.
    Reference parity: the multi-way cached-table join surface
    (worker/src/h2_service.rs scan path) composed end-to-end."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(_money_sum(profit).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
               / 10000.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier over a quarter): aggregate-then-argmax
    over a derived revenue view, keeping ALL ties (the spec's
    view + scalar-MAX-subquery semantics — distinct from
    win_topk_per_group's k-bounded rank). Scale shape: one shuffle
    builds the supplier-sized revenue view; the MAX is a 1-row
    broadcast frame joined back to the VIEW (never to lineitem); the
    supplier dim broadcasts. The exact fixed-point revenue makes the
    equality predicate safe — with float sums, revenue = MAX(revenue)
    is partition-order roulette, which is why the money convention
    matters beyond hash-compare cosmetics."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offer AS (
      SELECT l.l_partkey, l.l_suppkey,
             MIN(CAST(FLOOR(l.l_extendedprice / l.l_quantity * 10000 + 0.5) AS BIGINT)) / 10000.0
               AS unit_price
      FROM lineitem l
      GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name AS nation, o.unit_price
    FROM offer o
    JOIN part p     ON o.l_partkey = p.p_partkey
    JOIN supplier s ON o.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
      AND p.p_size = 15
      AND o.unit_price = (
        SELECT MIN(o2.unit_price)
        FROM offer o2
        JOIN supplier s2 ON o2.l_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE o2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_name, p.p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier), adapted: observed unit
    price MIN(extendedprice/quantity) per (part, supplier) from
    lineitem stands in for the missing partsupp.ps_supplycost; the
    SHAPE under test — a correlated MIN subquery on the part key over
    a region-constrained join, answered by every supplier achieving
    the minimum — is Q2's. Decorrelation: the correlated subquery
    becomes a per-part min-agg joined back on (partkey, unit_price)
    equality, safe because unit_price is fixed-point. Scale: the
    offer agg shuffles once on (partkey, suppkey); dims broadcast;
    the min-frame join reuses the partkey keyset."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    # floor(x*1e4 + 0.5), not ROUND: the quotient is NOT fixed-point,
    # and Spark (BigDecimal HALF_UP) vs DuckDB (libm) disagree on exact
    # midpoints — the same IEEE floor sequence can't (functions/exact.py).
    unit = F.min(
        F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 10000 + F.lit(0.5)).cast(
            "bigint"
        )
    ) / 10000.0
    offer = li.groupBy("l_partkey", "l_suppkey").agg(unit.alias("unit_price"))
    euro_offer = (
        offer.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    min_frame = euro_offer.groupBy(F.col("l_partkey").alias("mf_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        euro_offer.join(
            min_frame,
            (F.col("l_partkey") == F.col("mf_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "s_name", F.col("n_name").alias("nation"), "unit_price")
        .orderBy("s_name", "p_partkey")
    )


@register(
    "q11_important_share",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS v
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(v AS BIGINT) / 10000.0 AS part_value
    FROM val
    WHERE v > (SELECT SUM(v) * 0.0005 FROM val)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important inventory): groups whose aggregate
    exceeds a FRACTION of the global total — the HAVING-vs-scalar-
    subquery pattern (adapted to lineitem value per part; no
    partsupp). The global total derives from the SAME per-part agg
    (not a second corpus scan) and broadcasts as a 1-row frame;
    comparisons happen on exact integer units so the threshold cut
    is partition-order-safe. At 100 TB: one corpus shuffle on
    partkey, part-sized everything after."""
    li = load_table(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 10000, 0).cast("bigint")).alias("v")
    )
    total = val.agg((F.sum("v") * 0.0005).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("threshold"))
        .select("l_partkey", (F.col("v") / 10000.0).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (late shipments by mode × priority class):
    l_linestatus stands in for the absent l_shipmode, ship ≥ 90 days
    after order for the absent commit/receipt lateness rule; the
    SHAPE — one fact-fact join with a non-equi date predicate riding
    inside it, finished by dual conditional counts in ONE pass — is
    Q12's. The date-window predicates push to the lineitem scan; the
    lateness predicate evaluates inside the join (never a second
    scan); the CASE counts need no pivot or self-join."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q16_supplier_part_types",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (how many suppliers can serve each part
    profile), adapted: the observed DISTINCT (l_partkey, l_suppkey)
    pairs from lineitem stand in for the missing partsupp relation,
    and the complaint-comment supplier exclusion (no s_comment column)
    becomes s_acctbal < 0 — the SHAPE (derived relation ⋈ multi-
    predicate dim filter, NOT-IN supplier blacklist, COUNT DISTINCT
    per 3-column profile) is Q16's. Scale: the pair-distinct is one
    shuffle on (partkey, suppkey); the blacklist is a dim-bounded
    broadcast ANTI join (null-free key, so NOT IN ≡ anti); the
    count-distinct agg shuffles pair-count rows, never lineitem.
    Reference parity: cached-scan + membership-exclusion composition
    (worker/src/h2_service.rs scan path)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MAX(CAST(l_quantity AS BIGINT)) AS avail_qty
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ), win AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS BIGINT)) AS win_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (
        SELECT ps.l_suppkey
        FROM ps
        JOIN win w ON ps.l_partkey = w.l_partkey
                  AND ps.l_suppkey = w.l_suppkey
        WHERE ps.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
          AND 2 * ps.avail_qty > w.win_qty
      )
    ORDER BY s.s_suppkey
    """,
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess stock of promotable
    parts), adapted: the missing partsupp.ps_availqty is proxied as
    the largest single shipment MAX(l_quantity) per (part, supplier),
    compared against half that pair's 1996 shipped volume — the SHAPE
    (nested IN: part-name prefilter → correlated per-pair quantity
    threshold → supplier membership → nation-filtered dim) is Q20's.
    Determinism: quantities are integral, so both sides of the
    2·avail > win cut are exact bigint arithmetic — no float-sum
    partition roulette at the threshold. Scale: the oracle's ps/win
    CTE pair would scan+shuffle lineitem twice; here both per-pair
    stats (all-time MAX, windowed conditional SUM) ride ONE agg on
    one (partkey, suppkey) exchange, with the part-name semi join
    pruning BEFORE the agg (partkey-only prune keeps whole pairs, so
    per-pair stats are unchanged). The surviving supplier keyset is
    supplier-bounded, so the final membership is a broadcast SEMI
    join against the dim — the corpus is never rescanned for the
    outer query."""
    li = load_table(spark, sf_dir, "lineitem")
    qint = F.col("l_quantity").cast("bigint")
    in_window = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    promo_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    supp_keys = (
        li.join(promo_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.max(qint).alias("avail_qty"),
            F.sum(F.when(in_window, qint)).alias("win_qty"),
        )
        .filter(
            F.col("win_qty").isNotNull() & (2 * F.col("avail_qty") > F.col("win_qty"))
        )
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(supp_keys),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )
