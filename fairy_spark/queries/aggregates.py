"""Aggregation surface (SURVEY.md §2.B aggregation): hash agg, distinct
agg, approx-distinct, rollup/cube/grouping sets, ordered collect,
first/last, statistical moments.

All are single-shuffle hash aggregates with map-side partials — the
shape that scales. collect_list is always sort_array-wrapped
(determinism rule, FIXTURES.md) and only ever over bounded groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from fairy_spark.functions.exact import money_sum
from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT 'orders' AS tbl,
           COUNT(DISTINCT o_custkey) AS exact_nd
    FROM orders
    ORDER BY tbl
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct is inherently engine-specific; the oracle
    contract is exactness-bounded: we emit the EXACT distinct count but
    assert in tests/test_approx.py that the HLL estimate is within 5%
    of it (SURVEY.md §2.B 'bounded-error check')."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.lit("orders").alias("tbl"),
        F.countDistinct("o_custkey").alias("exact_nd"),
    ).orderBy("tbl")


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY rf, ls
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n",
        )
        .orderBy("rf", "ls")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("o_totalprice"), unit=100).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
        .orderBy("status", "priority")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
           COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
           COUNT(*) AS n_cust,
           SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY segment, nation
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
               COALESCE(CAST(c_nationkey AS STRING), 'ALL') AS nation,
               COUNT(*) AS n_cust,
               -- CAST: Spark SQL parses the bare 100.0 literal as
               -- DECIMAL and bigint/decimal stays DECIMAL — the driver
               -- hashes Decimal cells differently from the oracle's
               -- double (DuckDB / is always float division).
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / CAST(100.0 AS DOUBLE)
                 AS total_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY segment, nation
        """
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey AS regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list-aggregate, emitted as a joined string: the driver's
    pandas canonicalizer cannot sort/hash array cells, so both sides
    flatten the sorted list to a comma-joined string (same semantics)."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
        .orderBy("regionkey")
    )


@register(
    "agg_first_last_ordered",
    oracle="""
    SELECT o_custkey,
           MIN_BY(o_orderkey, CAST(o_orderdate AS VARCHAR) || '#' || LPAD(CAST(o_orderkey AS VARCHAR), 20, '0')) AS first_order,
           MAX_BY(o_orderkey, CAST(o_orderdate AS VARCHAR) || '#' || LPAD(CAST(o_orderkey AS VARCHAR), 20, '0')) AS last_order,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    ORDER BY o_custkey
    """,
)
def agg_first_last_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic first/last per group: ties on o_orderdate broken by
    o_orderkey (encoded in both engines as min_by/max_by on a composite
    sort key, since Spark's first()/last() are order-dependent)."""
    o = load_table(spark, sf_dir, "orders")
    sort_key = F.concat_ws(
        "#",
        F.col("o_orderdate").cast("string"),
        F.lpad(F.col("o_orderkey").cast("string"), 20, "0"),
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.min_by("o_orderkey", sort_key).alias("first_order"),
            F.max_by("o_orderkey", sort_key).alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 5)
        .orderBy("o_custkey")
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 6)    AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_having_sum",
    oracle="""
    SELECT l_suppkey, SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 100
    ORDER BY l_suppkey
    """,
)
def agg_having_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            money_sum(F.col("l_extendedprice"), unit=100).alias("total_price"),
            F.sum("l_quantity").alias("_qty"),
        )
        .filter(F.col("_qty") > 100)
        .drop("_qty")
        .orderBy("l_suppkey")
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(MEDIAN(l_extendedprice), 6)                 AS med_price,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 6)    AS p25,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.75), 6)    AS p75,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 6)    AS p95
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    QUANTILE_CONT linear interpolation). At 100 TB the approximate
    sketch (`percentile_approx`, checked in agg_approx_distinct's
    style) is the scale path; this is the exact reference."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("med_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(l_extendedprice, 0.75)"), 6).alias("p75"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT l_linestatus, l_returnflag, COUNT(*) AS n
      FROM lineitem GROUP BY l_linestatus, l_returnflag
    ), ranked AS (
      SELECT l_linestatus, l_returnflag, n,
             ROW_NUMBER() OVER (PARTITION BY l_linestatus
                                ORDER BY n DESC, l_returnflag) AS rn
      FROM counts
    )
    SELECT l_linestatus, l_returnflag AS mode_flag, n AS mode_count
    FROM ranked WHERE rn = 1
    ORDER BY l_linestatus
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with an explicit tie-break (count desc, then value) —
    built-in `mode()` is tie-nondeterministic, which is exactly the
    kind of thing that diverges between engines; encode the tie-break
    in the plan instead."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_linestatus", "l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_linestatus").orderBy(F.col("n").desc(), "l_returnflag")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_linestatus",
            F.col("l_returnflag").alias("mode_flag"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_linestatus,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), 6) AS qty_A,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0), 6) AS qty_N,
           ROUND(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), 6) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with EXPLICIT value list — without it Spark runs an extra
    distinct-collect job over the full table to discover values, which
    at 100 TB is a whole wasted scan."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity"))
    )
    return p.select(
        "l_linestatus",
        F.round(F.coalesce(F.col("A"), F.lit(0.0)), 6).alias("qty_A"),
        F.round(F.coalesce(F.col("N"), F.lit(0.0)), 6).alias("qty_N"),
        F.round(F.coalesce(F.col("R"), F.lit(0.0)), 6).alias("qty_R"),
    ).orderBy("l_linestatus")


@register(
    "agg_boolean_countif",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 200000)     AS n_big,
           CAST(BOOL_AND(o_totalprice > 1000) AS BOOLEAN)    AS all_over_1k,
           CAST(BOOL_OR(o_orderstatus = 'F') AS BOOLEAN)     AS any_finished
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_boolean_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.some(F.col("o_orderstatus") == "F").alias("any_finished"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_profile_table",
    oracle="""
    SELECT 'o_custkey' AS col_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           MIN(CAST(o_custkey AS VARCHAR)) AS min_str,
           MAX(CAST(o_custkey AS VARCHAR)) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_totalprice),
           MIN(CAST(o_totalprice AS VARCHAR)), MAX(CAST(o_totalprice AS VARCHAR))
    FROM orders
    ORDER BY col_name
    """,
)
def agg_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile (operators/profiling.py) — the
    ingest-time data-quality sweep. The oracle re-scans per column
    (UNION ALL); the engine does it in a single aggregate."""
    from fairy_spark.operators.profiling import profile_table

    o = load_table(spark, sf_dir, "orders")
    return profile_table(
        o, ["o_custkey", "o_orderpriority", "o_totalprice"]
    ).orderBy("col_name")


@register(
    "agg_histogram_bins",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
                     WHEN o_totalprice >= 500000 THEN 21
                     ELSE FLOOR(o_totalprice / 25000) + 1 END AS INT) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 6) AS lo,
           ROUND(MAX(o_totalprice), 6) AS hi
    FROM orders
    GROUP BY bin
    ORDER BY bin
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — single-pass binned
    profile (the numeric-distribution half of agg_profile_table)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(500000), F.lit(20))
            .cast("int")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
        .orderBy("bin")
    )


@register(
    "agg_argminmax",
    oracle="""
    SELECT c_nationkey,
           ARG_MAX(c_custkey, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) * 1000000 + c_custkey)
             AS richest_cust,
           ARG_MIN(c_custkey, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) * 1000000 + c_custkey)
             AS poorest_cust,
           CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arg-extremum aggregates (max_by/min_by — DuckDB arg_max/arg_min):
    per nation, the customer holding the highest / lowest balance. The
    ordering value is a tie-free fixed-point composite
    (cents·1e6 + custkey): doubles as ordering keys invite cross-engine
    tie ambiguity, integers don't. max_by is a hash aggregate with
    mergeable (value, key) partial state — one shuffle of one pair per
    group per partition, the shape that replaces the rank-window-
    then-filter idiom wherever only the extremum row is wanted."""
    c = load_table(spark, sf_dir, "customer")
    ordv = (
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint") * 1000000
        + F.col("c_custkey")
    )
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.max_by("c_custkey", ordv).alias("richest_cust"),
            F.min_by("c_custkey", ordv).alias("poorest_cust"),
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "agg_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT user_id, MEDIAN(value) AS med FROM events GROUP BY user_id
    ), dev AS (
      SELECT e.event_id, e.user_id, e.value, ABS(e.value - m.med) AS dev
      FROM events e JOIN med m USING (user_id)
    ), mad AS (
      SELECT user_id, MEDIAN(dev) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id,
           ROUND(d.value, 6) AS value,
           d.dev > 3 * m.mad AS is_outlier
    FROM dev d JOIN mad m USING (user_id)
    ORDER BY d.event_id
    """,
)
def agg_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-key outlier flag via median absolute deviation:
    |value − median| > 3·MAD — the standard quality pass that survives
    the outliers it is hunting (mean/stddev do not). Two grouped
    percentile aggs + two key joins, all hash-partitioned on user_id;
    the per-key stats tables are |keys|-sized, so the plan scales like
    any two-pass grouped aggregate. Cross-engine exactness rides on the
    bit-identical linear-interpolation percentile both engines
    implement (the agg_percentiles precedent)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("user_id").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("med")
    )
    dev = ev.join(med, "user_id").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            (F.col("dev") > 3 * F.col("mad")).alias("is_outlier"),
        )
        .orderBy("event_id")
    )


@register(
    "sketch_quantile_hist",
    oracle="""
    WITH stats AS (
      SELECT COUNT(*) AS n, MIN(value) AS vmin, MAX(value) AS vmax FROM events
    ), b AS (
      SELECT CASE WHEN s.vmax > s.vmin
                  THEN LEAST(255, CAST(floor((e.value - s.vmin) / (s.vmax - s.vmin) * 256) AS BIGINT))
                  ELSE 0 END AS bin
      FROM events e CROSS JOIN stats s
    ), hist AS (
      SELECT bin, COUNT(*) AS cnt FROM b GROUP BY bin
    ), cum AS (
      SELECT bin, SUM(cnt) OVER (ORDER BY bin
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM hist
    ), qs AS (
      SELECT unnest([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS q
    ), tgt AS (
      SELECT qs.q, CAST(ceil(qs.q * s.n) AS BIGINT) AS target FROM qs CROSS JOIN stats s
    ), pick AS (
      SELECT t.q, MIN(c.bin) AS b FROM tgt t JOIN cum c ON c.cum >= t.target GROUP BY t.q
    ), ex AS (
      SELECT 0.5::DOUBLE AS q, QUANTILE_CONT(value, 0.5) AS exact FROM events
      UNION ALL
      SELECT 0.9::DOUBLE, QUANTILE_CONT(value, 0.9) FROM events
      UNION ALL
      SELECT 0.99::DOUBLE, QUANTILE_CONT(value, 0.99) FROM events
    )
    SELECT p.q,
           ROUND(s.vmin + p.b * (s.vmax - s.vmin) / 256, 6) AS est_value,
           ROUND(ex.exact, 6) AS exact_value,
           ROUND(ABS((s.vmin + p.b * (s.vmax - s.vmin) / 256) - ex.exact), 6) AS abs_err,
           (ABS((s.vmin + p.b * (s.vmax - s.vmin) / 256) - ex.exact)
              <= 2 * (s.vmax - s.vmin) / 256) AS within_two_bins
    FROM pick p JOIN ex ON p.q = ex.q CROSS JOIN stats s
    ORDER BY p.q
    """,
)
def sketch_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram quantile sketch: the fixed-memory quantile structure
    (256 equi-width bins) next to the exact answer. At 100 TB exact
    percentiles need a full sort or a per-group memory blowup; the
    histogram is 256 counter cells that merge by addition across
    partitions, estimate error bounded by the bin width — both the
    estimate and its error-vs-exact are materialized and
    oracle-checked. The cumulative bin count uses the sharded two-pass
    prefix sum (operators/packing.py), never a SinglePartition window
    (registry gate)."""
    from fairy_spark.operators.packing import packed_running_sum

    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.when(
            F.col("vmax") > F.col("vmin"),
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    / (F.col("vmax") - F.col("vmin"))
                    * 256
                ).cast("bigint"),
            ),
        )
        .otherwise(0)
        .alias("bin")
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    cum = packed_running_sum(hist, "bin", "cnt", n_shards=8)
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    tgt = qs.crossJoin(F.broadcast(stats)).select(
        "q", F.ceil(F.col("q") * F.col("n")).cast("bigint").alias("target")
    )
    pick = (
        cum.join(F.broadcast(tgt), F.col("cum") >= F.col("target"))
        .groupBy("q")
        .agg(F.min("bin").alias("b"))
    )
    ex = ev.agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("value"), F.lit(0.9)).alias("p90"),
        F.percentile(F.col("value"), F.lit(0.99)).alias("p99"),
    ).select(
        F.explode(
            F.array(
                F.struct(F.lit(0.5).alias("q"), F.col("p50").alias("exact")),
                F.struct(F.lit(0.9).alias("q"), F.col("p90").alias("exact")),
                F.struct(F.lit(0.99).alias("q"), F.col("p99").alias("exact")),
            )
        ).alias("s")
    ).select(F.col("s.q").alias("q"), F.col("s.exact").alias("exact"))
    est = F.col("vmin") + F.col("b") * (F.col("vmax") - F.col("vmin")) / 256
    return (
        pick.join(F.broadcast(ex), "q")
        .crossJoin(F.broadcast(stats))
        .select(
            "q",
            F.round(est, 6).alias("est_value"),
            F.round("exact", 6).alias("exact_value"),
            F.round(F.abs(est - F.col("exact")), 6).alias("abs_err"),
            (
                F.abs(est - F.col("exact"))
                <= 2 * (F.col("vmax") - F.col("vmin")) / 256
            ).alias("within_two_bins"),
        )
        .orderBy("q")
    )


@register(
    "sketch_hll",
    oracle="""
    WITH h AS (
      SELECT CAST(concat('0x', substr(md5(concat('hll', ':', CAST(o_custkey AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
      FROM orders
    ), rb AS (
      SELECT hv % 64 AS bucket,
             CASE WHEN hv // 64 > 0 THEN 55 - LENGTH(bin(hv // 64)) ELSE 55 END AS rho
      FROM h
    ), reg AS (
      SELECT bucket, MAX(rho) AS m FROM rb GROUP BY bucket
    ), s AS (
      SELECT CAST(SUM(CAST(2 AS BIGINT) ** (55 - m)) AS BIGINT) AS s_present,
             COUNT(*) AS n_buckets
      FROM reg
    ), est0 AS (
      SELECT (64 - n_buckets) AS v,
             s_present + (64 - n_buckets) * (CAST(2 AS BIGINT) ** 55) AS s_all
      FROM s
    ), est AS (
      SELECT v,
             0.709 * 64 * 64 * (CAST(2 AS BIGINT) ** 55) / CAST(s_all AS DOUBLE) AS e_raw
      FROM est0
    ), fin AS (
      SELECT CASE WHEN e_raw <= 160.0 AND v > 0
                  THEN 64.0 * ln(64.0 / v) ELSE e_raw END AS e
      FROM est
    ), ex AS (
      SELECT COUNT(DISTINCT o_custkey) AS exact_nd FROM orders
    )
    SELECT 64 AS m,
           CAST(ex.exact_nd AS BIGINT) AS exact_nd,
           ROUND(fin.e, 6) AS est_nd,
           ROUND(ABS(fin.e - ex.exact_nd) / ex.exact_nd, 6) AS rel_err,
           (ABS(fin.e - ex.exact_nd) / ex.exact_nd <= 0.26) AS within_2sigma
    FROM fin CROSS JOIN ex
    """,
)
def sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from first principles (Flajolet et al. 2007,
    public) so the estimate is ENGINE-EXACT and hash-checkable, unlike
    approx_count_distinct's opaque implementation: m=64 registers,
    register = max leading-zero rank of the portable hash within its
    bucket. The registers are the scale structure — max-mergeable
    (groupBy MAX is the distributed merge), 64 rows total regardless
    of input size. The harmonic sum is fixed-pointed as exact powers
    of two scaled by 2^55 (bigint, order-independent); the only float
    ops are one division and the documented small-range ln branch.
    Exact distinct count, relative error, and the 2-sigma bound
    (1.04/sqrt(64) ~ 13%) ride along, oracle-verified."""
    o = load_table(spark, sf_dir, "orders")
    from fairy_spark.operators.text import portable_hash64

    hv = portable_hash64(F.col("o_custkey").cast("string"), seed="hll")
    h2 = F.expr("hv DIV 64")
    rb = o.select(hv.alias("hv")).select(
        (F.col("hv") % 64).alias("bucket"),
        F.when(h2 > 0, F.lit(55) - F.length(F.bin(h2))).otherwise(55).alias("rho"),
    )
    reg = rb.groupBy("bucket").agg(F.max("rho").alias("m"))
    s = reg.agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 55 - m)")).alias("s_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    est0 = s.select(
        (F.lit(64) - F.col("n_buckets")).alias("v"),
        (
            F.col("s_present")
            + (F.lit(64) - F.col("n_buckets")) * F.shiftleft(F.lit(1).cast("bigint"), 55)
        ).alias("s_all"),
    )
    e_raw = (
        F.lit(0.709)
        * 64
        * 64
        * F.shiftleft(F.lit(1).cast("bigint"), 55).cast("double")
        / F.col("s_all").cast("double")
    )
    fin = est0.select(
        F.when(
            (e_raw <= 160.0) & (F.col("v") > 0),
            F.lit(64.0) * F.log(F.lit(64.0) / F.col("v")),
        )
        .otherwise(e_raw)
        .alias("e")
    )
    ex = o.agg(F.countDistinct("o_custkey").alias("exact_nd"))
    return fin.crossJoin(F.broadcast(ex)).select(
        F.lit(64).alias("m"),
        F.col("exact_nd").cast("bigint").alias("exact_nd"),
        F.round("e", 6).alias("est_nd"),
        F.round(F.abs(F.col("e") - F.col("exact_nd")) / F.col("exact_nd"), 6).alias(
            "rel_err"
        ),
        (
            F.abs(F.col("e") - F.col("exact_nd")) / F.col("exact_nd") <= 0.26
        ).alias("within_2sigma"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS flag,
           COALESCE(l_linestatus, '(all)') AS status,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER)
             AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, flag, status
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping_id markers on grouping sets — the piece
    that makes rollup output MACHINE-readable: a NULL in a rollup row
    is ambiguous (real NULL group vs subtotal placeholder) until the
    grouping bitmask disambiguates, which is why every BI tool emits
    it. The composite id is built from the per-column GROUPING() bits
    (grouping(flag)·2 + grouping(status)) — identical arithmetic on
    both engines, where the engines' native grouping_id()/
    GROUPING_ID() bit orders could differ. Same partial-agg shape as
    agg_rollup; the marker costs nothing (it's metadata of the
    grouping-set expansion, not an extra pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            (
                F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")
            ).cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("flag"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("status"),
            "gid",
            "n",
        )
        .orderBy("gid", "flag", "status")
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY flag
    ORDER BY flag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three DIFFERENT-column COUNT(DISTINCT)s plus a plain sum in ONE
    aggregation — the planner capability under test: Spark rewrites
    multi-distinct via Expand (each row replicated once per distinct
    group with a gid), so all four aggregates resolve in a single
    shuffled pass instead of three self-joined single-distinct
    queries. At 100 TB the Expand trades 3× map-side rows for one
    exchange — almost always the right trade, and the alternative
    (N separate jobs + join) is the anti-pattern this row exists to
    obviate. Counts are exact; at extreme cardinalities the sketched
    path (agg_approx_distinct) is the documented degrade."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count_distinct("l_orderkey").alias("n_orders"),
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
        .orderBy("flag")
    )


@register(
    "agg_higher_moments",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS flag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS m1,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS m2,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS m3,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS m4
      FROM lineitem
      GROUP BY flag
    ), d AS (
      SELECT flag, n,
             CAST(m1 AS DOUBLE) / n AS mu,
             CAST(m2 AS DOUBLE) / n AS r2,
             CAST(m3 AS DOUBLE) / n AS r3,
             CAST(m4 AS DOUBLE) / n AS r4
      FROM s
    ), c AS (
      SELECT flag, n, mu,
             r2 - mu * mu AS c2,
             r3 - 3 * mu * r2 + 2 * mu * mu * mu AS c3,
             r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu AS c4
      FROM d
    )
    SELECT flag, n,
           CAST(FLOOR(c3 / (c2 * sqrt(c2)) * 1000000 + 0.5) AS BIGINT)
             / 1000000.0 AS skewness,
           CAST(FLOOR((c4 / (c2 * c2) - 3) * 1000000 + 0.5) AS BIGINT)
             / 1000000.0 AS excess_kurtosis
    FROM c
    ORDER BY flag
    """,
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per group — the 3rd/4th
    standardized moments, rebuilt from EXACT integer power sums
    (Σx..Σx⁴ as bigints; x ≤ 50 keeps Σx⁴ ≤ ~4e12 at sf0.1, ~9
    digits of headroom) so every double enters through the SAME raw→
    central-moment IEEE sequence on both engines. The built-in
    skewness()/kurtosis() aggregates accumulate doubles in partition
    order — fine for analytics, unusable under a hash gate (the
    agg_stats_moments row survives on rounding luck; this row does
    not gamble). One map-side-combined hash agg over one scan; the
    moment algebra is 3 rows of arithmetic after it."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("m1"),
        F.sum(q * q).alias("m2"),
        F.sum(q * q * q).alias("m3"),
        F.sum(q * q * q * q).alias("m4"),
    )
    mu = F.col("m1").cast("double") / F.col("n")
    r2 = F.col("m2").cast("double") / F.col("n")
    r3 = F.col("m3").cast("double") / F.col("n")
    r4 = F.col("m4").cast("double") / F.col("n")
    d = s.select("flag", "n", mu.alias("mu"), r2.alias("r2"), r3.alias("r3"), r4.alias("r4"))
    c2 = F.col("r2") - F.col("mu") * F.col("mu")
    c3 = (
        F.col("r3")
        - 3 * F.col("mu") * F.col("r2")
        + 2 * F.col("mu") * F.col("mu") * F.col("mu")
    )
    c4 = (
        F.col("r4")
        - 4 * F.col("mu") * F.col("r3")
        + 6 * F.col("mu") * F.col("mu") * F.col("r2")
        - 3 * F.col("mu") * F.col("mu") * F.col("mu") * F.col("mu")
    )
    c = d.select("flag", "n", c2.alias("c2"), c3.alias("c3"), c4.alias("c4"))
    skew = F.floor(
        F.col("c3") / (F.col("c2") * F.sqrt(F.col("c2"))) * 1000000 + F.lit(0.5)
    ).cast("bigint") / 1000000.0
    kurt = F.floor(
        (F.col("c4") / (F.col("c2") * F.col("c2")) - 3) * 1000000 + F.lit(0.5)
    ).cast("bigint") / 1000000.0
    return c.select(
        "flag", "n", skew.alias("skewness"), kurt.alias("excess_kurtosis")
    ).orderBy("flag")


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem
    GROUP BY flag
    ORDER BY flag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps (Spark 4's
    bitmap_* aggregate family — the roaring-bitmap warehouse pattern):
    keys bucket into fixed-width bitmap segments
    (bitmap_bucket_number), each (group, bucket) builds a bitmap
    (bitmap_construct_agg of bit positions — partial states OR-merge
    across partitions inside the agg), and per-bucket popcounts sum
    to the group total (buckets partition the key space, so no
    cross-bucket merge is needed). Same
    mergeable-state shape as the sketch suite, but EXACT — the
    middle ground between COUNT(DISTINCT)'s full shuffle of raw keys
    and HLL's approximation: the shuffle carries fixed-size bitmap
    segments instead of every key occurrence, a massive win when
    duplication is high. Keys shift by +1: bit positions are 1-based
    (value 0 vanishes — measured, the classic off-by-one of this
    API). The oracle is plain COUNT(DISTINCT), so the hash gate
    proves the whole bucket/position/merge pipeline loses nothing."""
    li = load_table(spark, sf_dir, "lineitem")
    k = F.col("l_partkey") + 1
    partials = (
        li.select(F.col("l_returnflag").alias("flag"), k.alias("k"))
        .groupBy("flag", F.expr("bitmap_bucket_number(k)").alias("bucket"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(k))").alias("bm"))
    )
    return (
        partials.groupBy("flag")
        .agg(F.expr("sum(bitmap_count(bm))").cast("bigint").alias("n_parts"))
        .orderBy("flag")
    )


@register(
    "sketch_hll_native",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
           TRUE AS within_3pct
    FROM lineitem
    """,
)
def sketch_hll_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE Apache DataSketches HLL (Spark 4 hll_sketch_agg /
    hll_sketch_estimate) next to the from-first-principles build
    (sketch_hll): the binary sketch column is mergeable state the
    same way, but here the engine owns the registers. The estimate
    itself is deterministic yet engine-private (DuckDB can't rebuild
    DataSketches bit-for-bit), so the ORACLE-checkable claims are the
    exact count and the accuracy contract — lgK=14 gives ~0.8%
    relative standard error, asserted at a lenient 3% so the row
    fails only on a real estimator break, not noise. The estimate is
    still computed through the real sketch path; a wrong merge or
    register encoding blows the bound."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").alias("est"),
        F.count_distinct("l_partkey").alias("exact_distinct"),
    )
    return s.select(
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.03 * F.col("exact_distinct")
        ).alias("within_3pct"),
    )


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag AS flag,
           ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 6) AS exact_p50,
           TRUE AS approx_within_1pct
    FROM lineitem
    GROUP BY flag
    ORDER BY flag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile under an oracle-checked accuracy CONTRACT
    (the sketch_hll_native pattern): the KLL/GK-style sketch behind
    approx_percentile(col, 0.5, 10000) is engine-private, so the
    checkable claims are the exact interpolated median and the bound
    |approx − exact| ≤ 1% of exact. accuracy=10000 guarantees rank
    error ≤ 1/10000 of rows — value error at the median is far
    inside 1% for any non-degenerate distribution, so the row fails
    only on a real estimator break. At 100 TB the approx path is THE
    percentile (mergeable fixed-size state vs exact percentile's
    per-group sort); this row keeps it honest against the exact
    reference (agg_percentiles)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("ap"),
    )
    return s.select(
        "flag",
        F.round("exact_p50", 6).alias("exact_p50"),
        (
            F.abs(F.col("ap") - F.col("exact_p50")) <= 0.01 * F.abs(F.col("exact_p50"))
        ).alias("approx_within_1pct"),
    ).orderBy("flag")


@register(
    "agg_corr_matrix",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS flag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(l_quantity AS BIGINT)) AS sq,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sp,
             SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sd,
             SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sqq,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS spp,
             SUM(CAST(ROUND(l_discount * 100, 0) AS BIGINT)
                 * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sdd,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sqp,
             SUM(CAST(l_quantity AS BIGINT)
                 * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS sqd,
             SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                 * CAST(ROUND(l_discount * 100, 0) AS BIGINT)) AS spd
      FROM lineitem
      GROUP BY flag
    )
    SELECT flag,
           CAST(FLOOR(CAST(n * sqp - sq * sp AS DOUBLE)
                      / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
                         * sqrt(CAST(n * spp - sp * sp AS DOUBLE)))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS corr_qty_price,
           CAST(FLOOR(CAST(n * sqd - sq * sd AS DOUBLE)
                      / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
                         * sqrt(CAST(n * sdd - sd * sd AS DOUBLE)))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS corr_qty_disc,
           CAST(FLOOR(CAST(n * spd - sp * sd AS DOUBLE)
                      / (sqrt(CAST(n * spp - sp * sp AS DOUBLE))
                         * sqrt(CAST(n * sdd - sd * sd AS DOUBLE)))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS corr_price_disc
    FROM s
    ORDER BY flag
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix of three measures per group from
    ONE pass of exact integer co-sums (the ts_rolling_corr technique
    generalized to the full upper triangle): quantity, cents-price,
    and cents-discount accumulate {Σx, Σx², Σxy} for every pair as
    decimal(38,0) — n·Σpp reaches ~1e24 at sf0.1, far past long —
    then each r is one closed-form IEEE sequence. Built-in CORR per
    pair would scan once per pair AND float-sum in partition order;
    this is one scan, one hash agg, three exact formulas. The co-sum
    set is the sufficient statistic a feature-correlation pruner
    ships between workers at 100 TB — 10 numbers per (group ×
    partition), never rows."""
    li = load_table(spark, sf_dir, "lineitem")
    D = "decimal(38,0)"
    q = F.col("l_quantity").cast("bigint").cast(D)
    p = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").cast(D)
    dsc = F.round(F.col("l_discount") * 100, 0).cast("bigint").cast(D)
    s = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).cast(D).alias("n"),
        F.sum(q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum(dsc).alias("sd"),
        F.sum(q * q).alias("sqq"),
        F.sum(p * p).alias("spp"),
        F.sum(dsc * dsc).alias("sdd"),
        F.sum(q * p).alias("sqp"),
        F.sum(q * dsc).alias("sqd"),
        F.sum(p * dsc).alias("spd"),
    )

    def corr(sxy, sx, sy, sxx, syy):
        num = (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        vx = (F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        vy = (F.col("n") * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        r = num / (F.sqrt(vx) * F.sqrt(vy))
        return (F.floor(r * 1000000 + F.lit(0.5)).cast("bigint") / 1000000.0)

    return s.select(
        "flag",
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    ).orderBy("flag")


_GINI_ORACLE = """
    WITH u AS (
      SELECT c_mktsegment AS segment, c_custkey,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 100000 AS units
      FROM customer
    ), ranked AS (
      SELECT segment, units,
             ROW_NUMBER() OVER (PARTITION BY segment
                                ORDER BY units, c_custkey) AS i,
             COUNT(*) OVER (PARTITION BY segment) AS n
      FROM u
    ), agg AS (
      SELECT segment, MAX(n) AS n, SUM(units) AS sx,
             SUM(i * units) AS s1,
             SUM(CASE WHEN i <= n // 2 THEN units ELSE 0 END) AS bh
      FROM ranked GROUP BY segment
    )
    SELECT segment, CAST(n AS BIGINT) AS n_cust,
           CAST(sx AS BIGINT) AS sum_units,
           CAST(FLOOR(CAST(2 * s1 - (n + 1) * sx AS DOUBLE)
                      / CAST(n * sx AS DOUBLE) * 1048576) AS BIGINT)
             AS gini_q20,
           CAST(bh * 1000000 // sx AS BIGINT) AS bottom_half_ppm
    FROM agg ORDER BY segment
    """


@register("agg_gini_lorenz", oracle=_GINI_ORACLE)
def agg_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient + Lorenz bottom-half share per market segment
    — the inequality/concentration statistic a corpus-curation
    pipeline runs on per-source token counts to spot domination (here
    over shifted-positive account-balance units). Uses the exact
    rank identity G = (2*SUM(i*x_i) - (n+1)*SUM(x)) / (n*SUM(x)) on
    the ascending sort; equal values make the sum invariant to tie
    order so the (units, key) ordering is purely for determinism.
    All accumulation is BIGINT; the single final division runs in
    IEEE doubles on bit-identical operands in both engines and is
    floor-quantized at 2^-20. Plan: one rank window per segment
    partition + one map-side-combinable groupBy — no global sort,
    no per-pair work (the O(n^2) mean-absolute-difference definition
    would never survive scale)."""
    u = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("segment"),
        "c_custkey",
        (F.round(F.col("c_acctbal") * 100, 0).cast("bigint") + F.lit(100000)).alias(
            "units"
        ),
    )
    wi = Window.partitionBy("segment").orderBy("units", "c_custkey")
    wn = Window.partitionBy("segment")
    ranked = u.select(
        "segment",
        "units",
        F.row_number().over(wi).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    agg = ranked.groupBy("segment").agg(
        F.max("n").alias("n"),
        F.sum("units").alias("sx"),
        F.sum(F.col("i") * F.col("units")).alias("s1"),
        F.sum(
            F.when(F.col("i") <= F.expr("n DIV 2"), F.col("units")).otherwise(F.lit(0))
        ).alias("bh"),
    )
    return agg.select(
        "segment",
        F.col("n").alias("n_cust"),
        F.col("sx").alias("sum_units"),
        F.floor(
            (2 * F.col("s1") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sx")).cast("double")
            * F.lit(1048576)
        )
        .cast("bigint")
        .alias("gini_q20"),
        F.expr("bh * 1000000 DIV sx").alias("bottom_half_ppm"),
    ).orderBy("segment")


_KMV_K = 128
_KMV_M = 1152921504606846976  # 2^60 — the portable-hash value space


_KMV_ORACLE = f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IN ('click', 'purchase')
    ), h AS (
      SELECT event_type,
             CAST(concat('0x', substr(md5(concat('kmv', ':',
               CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
      FROM du
    ), c AS (SELECT hv FROM h WHERE event_type = 'click'),
    p AS (SELECT hv FROM h WHERE event_type = 'purchase'),
    u AS (SELECT DISTINCT hv FROM h),
    skc AS (SELECT hv FROM c ORDER BY hv LIMIT {_KMV_K}),
    skp AS (SELECT hv FROM p ORDER BY hv LIMIT {_KMV_K}),
    sku AS (SELECT hv FROM u ORDER BY hv LIMIT {_KMV_K}),
    kc AS (SELECT MAX(hv) AS kth FROM skc),
    kp AS (SELECT MAX(hv) AS kth FROM skp),
    ku AS (SELECT MAX(hv) AS kth FROM sku),
    m AS (
      SELECT COUNT(*) AS m FROM sku
      WHERE hv IN (SELECT hv FROM c) AND hv IN (SELECT hv FROM p)
    ), ex AS (
      SELECT (SELECT COUNT(*) FROM c) AS exact_click,
             (SELECT COUNT(*) FROM p) AS exact_purchase,
             (SELECT COUNT(*) FROM u) AS exact_union,
             (SELECT COUNT(*) FROM c WHERE hv IN (SELECT hv FROM p))
               AS exact_inter
    ), est AS (
      SELECT
        CAST(({_KMV_K} - 1) * CAST({_KMV_M} AS HUGEINT) // kc.kth AS BIGINT)
          AS est_click,
        CAST(({_KMV_K} - 1) * CAST({_KMV_M} AS HUGEINT) // kp.kth AS BIGINT)
          AS est_purchase,
        CAST(({_KMV_K} - 1) * CAST({_KMV_M} AS HUGEINT) // ku.kth AS BIGINT)
          AS est_union
      FROM kc, kp, ku
    ), inter AS (
      SELECT CAST(m.m * CAST(est.est_union AS HUGEINT) // {_KMV_K} AS BIGINT)
               AS est_inter
      FROM m, est
    )
    SELECT * FROM (
      SELECT 'click' AS set_name, est.est_click AS est_nd,
             CAST(ex.exact_click AS BIGINT) AS exact_nd FROM est, ex
      UNION ALL
      SELECT 'purchase', est.est_purchase, CAST(ex.exact_purchase AS BIGINT)
      FROM est, ex
      UNION ALL
      SELECT 'union', est.est_union, CAST(ex.exact_union AS BIGINT)
      FROM est, ex
      UNION ALL
      SELECT 'intersection', inter.est_inter, CAST(ex.exact_inter AS BIGINT)
      FROM inter, ex
    ) ORDER BY set_name
    """


@register("sketch_kmv_setops", oracle=_KMV_ORACLE)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k) distinct sketch with SET
    ALGEBRA — the capability HLL lacks: because a KMV sketch is just
    the k smallest hash values of a set, the union sketch is the
    bottom-k of the merged sketches, and intersections follow from the
    Jaccard ratio inside the union sketch (Beyer et al., SIGMOD'07 —
    the same estimator family as Theta sketches). Distinct-user sets
    for two event types are sketched (k=128 over the portable 60-bit
    hash), then |A|, |B|, |A∪B| are estimated as (k-1)*2^60/h_(k) and
    |A∩B| as (matches-in-union-sketch/k)*|A∪B| — every estimate an
    exact integer (decimal(38,0) intermediate: 127*2^60 overflows
    BIGINT), reported beside the exact cardinality. Scale shape: each
    bottom-k is a TakeOrderedAndProject (per-partition heaps, no
    global sort); the union/intersection arithmetic touches ≤3k
    sketch rows broadcast-side — at 100 TB the full-table work is two
    distinct-aggregates, and sketch merge replaces any re-scan."""
    from fairy_spark.operators.text import portable_hash64

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    du = ev.select("event_type", "user_id").distinct()
    h = du.select(
        "event_type",
        portable_hash64(F.col("user_id").cast("string"), seed="kmv").alias("hv"),
    )
    c = h.filter(F.col("event_type") == "click").select("hv")
    p = h.filter(F.col("event_type") == "purchase").select("hv")
    u = h.select("hv").distinct()
    skc = c.orderBy("hv").limit(_KMV_K)
    skp = p.orderBy("hv").limit(_KMV_K)
    sku = u.orderBy("hv").limit(_KMV_K)

    kc = skc.agg(F.max("hv").alias("kth_c"))
    kp = skp.agg(F.max("hv").alias("kth_p"))
    ku = sku.agg(F.max("hv").alias("kth_u"))
    # Membership test orientation matters at scale: the BROADCAST side
    # must be the k-row union sketch, never the corpus-sized hash sets
    # (c/p are distinct users — O(corpus)). Stream each set once,
    # keep its ≤k rows that land in the sketch, then DEDUPE the
    # survivors on hv before counting: m must count distinct
    # union-sketch HASH VALUES present in both sides (the oracle's
    # definition) — counting surviving c-rows would double-count a
    # 60-bit hash collision between two user_ids. The distinct() only
    # shuffles the ≤k survivors, and the final intersection is a
    # k-row × k-row semi-join.
    in_c = c.join(F.broadcast(sku), "hv", "left_semi").distinct()
    in_p = p.join(F.broadcast(sku), "hv", "left_semi").distinct()
    m = in_c.join(F.broadcast(in_p), "hv", "left_semi").agg(
        F.count(F.lit(1)).alias("m")
    )
    ex = (
        c.agg(F.count(F.lit(1)).alias("exact_click"))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("exact_purchase"))))
        .crossJoin(F.broadcast(u.agg(F.count(F.lit(1)).alias("exact_union"))))
        .crossJoin(
            F.broadcast(
                c.join(p, "hv", "left_semi").agg(
                    F.count(F.lit(1)).alias("exact_inter")
                )
            )
        )
    )
    big = f"CAST({_KMV_K - 1} AS DECIMAL(38,0)) * {_KMV_M}"
    wide = (
        kc.crossJoin(F.broadcast(kp))
        .crossJoin(F.broadcast(ku))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(ex))
        .selectExpr(
            f"CAST(({big}) DIV kth_c AS BIGINT) AS est_click",
            f"CAST(({big}) DIV kth_p AS BIGINT) AS est_purchase",
            f"CAST(({big}) DIV kth_u AS BIGINT) AS est_union",
            "m",
            "exact_click",
            "exact_purchase",
            "exact_union",
            "exact_inter",
        )
        .withColumn(
            "est_inter",
            F.expr(
                "CAST((CAST(m AS DECIMAL(38,0)) * est_union)"
                f" DIV {_KMV_K} AS BIGINT)"
            ),
        )
    )
    return wide.selectExpr(
        """stack(4,
             'click',        est_click,    CAST(exact_click AS BIGINT),
             'purchase',     est_purchase, CAST(exact_purchase AS BIGINT),
             'union',        est_union,    CAST(exact_union AS BIGINT),
             'intersection', est_inter,    CAST(exact_inter AS BIGINT)
           ) AS (set_name, est_nd, exact_nd)"""
    ).orderBy("set_name")


@register(
    "sketch_hll_union_rollup",
    oracle="""
    WITH d AS (
      SELECT date_trunc('week', CAST(ts AS DATE)) AS week, user_id FROM events
    )
    SELECT CAST(week AS TIMESTAMP) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           TRUE AS within_3pct
    FROM d GROUP BY week ORDER BY week
    """,
)
def sketch_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch RE-AGGREGATION (the algebra that makes sketches
    worth storing): per-DAY DataSketches HLL states are built once,
    then weekly distinct-user counts come from hll_union_agg over the
    day sketches — never re-touching the event rows. This is the
    pattern a 100-TB metrics store lives on: materialize tiny
    mergeable states at ingest granularity, answer every coarser
    rollup (week/month/arbitrary range) by UNIONING states, turning a
    corpus re-scan into a ~KB-per-cell merge. Estimates are
    engine-private bits (DuckDB can't rebuild DataSketches), so the
    oracle checks the sketch_hll_native accuracy contract per week:
    the union-of-days estimate must sit within 3% of the exact
    distinct — a broken merge or register encoding blows the bound
    immediately (union error is NOT additive; it stays at the lgK=14
    ~0.8% RSE)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("week", F.col("ts").cast("date")).alias("week"),
        F.col("ts").cast("date").alias("day"),
    ).agg(F.expr("hll_sketch_agg(user_id, 14)").alias("sk"))
    weekly = daily.groupBy("week").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = ev.groupBy(
        F.date_trunc("week", F.col("ts").cast("date")).alias("week")
    ).agg(F.count_distinct("user_id").cast("bigint").alias("exact_distinct"))
    return (
        weekly.join(exact, "week")
        .select(
            "week",
            "exact_distinct",
            (
                F.abs(F.col("est") - F.col("exact_distinct"))
                <= 0.03 * F.col("exact_distinct")
            ).alias("within_3pct"),
        )
        .orderBy("week")
    )
