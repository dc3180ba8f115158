"""Window functions (SURVEY.md §2.B windows): ranking, lag/lead,
running frames, top-k per group.

Each window is one shuffle on its partition key. Top-k per group is
the A17 pagination pattern generalized (row_number <= k), which at
scale beats a global sort because each group ranks independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


@register(
    "win_rank_dense_ntile",
    oracle="""
    SELECT p_brand,
           p_partkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ORDER BY p_brand, rn
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("p_brand", "rn")
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           ROUND(value - LAG(value) OVER w, 6) AS value_delta
    FROM events
    WHERE user_id <= 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
            ).alias("running_total"),
            F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (
             PARTITION BY l_suppkey ORDER BY CAST(l_quantity AS BIGINT)
             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS qty_within5
    FROM lineitem
    WHERE l_suppkey <= 5
    ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.col("l_quantity").cast("bigint"))
        .rangeBetween(-5, 0)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(F.col("l_quantity").cast("bigint")).over(w).alias("qty_within5"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment AS segment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 3
    ORDER BY segment, rn
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            F.col("c_mktsegment").alias("segment"),
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("segment", "rn")
    )


@register(
    "win_cume_pct",
    oracle="""
    SELECT s_suppkey,
           ROUND(PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY s_acctbal, s_suppkey), 6) AS cume,
           CAST(SUM(1) OVER (ORDER BY s_acctbal, s_suppkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos
    FROM supplier
    ORDER BY s_suppkey
    """,
)
def win_cume_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global percent_rank/cume_dist via the two-pass sharded rank
    (operators/ranking.py) — NOT ``Window.orderBy`` with no
    partitionBy, which plans an Exchange SinglePartition (the round-2
    scale defect). (s_acctbal, s_suppkey) is a strict total order
    (s_suppkey unique), so rank == row_number and
    percent_rank = (pos-1)/(N-1), cume_dist = pos/N with N a driver
    scalar from the same pass-1 shard counts."""
    s = load_table(spark, sf_dir, "supplier")
    from fairy_spark.operators.ranking import sharded_global_row_number

    ranked, n = sharded_global_row_number(
        s, ["s_acctbal", "s_suppkey"], n_shards=32
    )
    denom = float(max(n - 1, 1))
    return (
        ranked.select(
            "s_suppkey",
            F.round((F.col("pos") - F.lit(1)) / F.lit(denom), 6).alias("pct_rank"),
            F.round(F.col("pos") / F.lit(float(max(n, 1))), 6).alias("cume"),
            F.col("pos"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "win_value_fns_ignore_nulls",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS px
      FROM orders WHERE o_orderkey <= 4000
    )
    SELECT o_orderkey, o_orderpriority,
           ROUND(FIRST_VALUE(px IGNORE NULLS) OVER w, 6)  AS first_px,
           ROUND(LAST_VALUE(px IGNORE NULLS) OVER w, 6)   AS last_px,
           ROUND(NTH_VALUE(px, 2 IGNORE NULLS) OVER w, 6) AS second_px
    FROM base
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_orderpriority, o_orderkey
    """,
)
def win_value_fns_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with IGNORE NULLS over a running frame —
    the gap-fill primitive (carry last observation forward)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 4000)
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(F.col("o_totalprice")).alias("px"),
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.first("px", ignorenulls=True).over(w), 6).alias("first_px"),
            F.round(F.last("px", ignorenulls=True).over(w), 6).alias("last_px"),
            F.round(F.nth_value("px", 2, ignoreNulls=True).over(w), 6).alias("second_px"),
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


@register(
    "events_error_bursts",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             (event_type = 'error') AS is_err,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, (event_type = 'error')
                                ORDER BY ts, event_id) AS rn_f
      FROM events
    ), runs AS (
      SELECT user_id, MIN(ts) AS burst_start, MAX(ts) AS burst_end,
             CAST(COUNT(*) AS BIGINT) AS burst_len
      FROM o WHERE is_err
      GROUP BY user_id, rn - rn_f
    )
    SELECT user_id, burst_start, burst_end, burst_len
    FROM runs WHERE burst_len >= 3
    ORDER BY user_id, burst_start
    """,
)
def events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (MATCH_RECOGNIZE territory) as
    gaps-and-islands: runs of >= 3 CONSECUTIVE 'error' events per
    user, found by the rn - rn_within_flag island key — two ranking
    windows over the SAME (user_id) partitioning (one exchange, Spark
    plans both in one Window node chain) plus one hash agg. The
    alerting primitive for 'N failures in a row'; per-user windows
    keep state bounded so the same shape runs under
    applyInPandasWithState on the live stream."""
    ev = load_table(spark, sf_dir, "events")
    is_err = (F.col("event_type") == "error").alias("is_err")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_flag = Window.partitionBy("user_id", "is_err").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", "ts", "event_id", is_err
    ).select(
        "*",
        F.row_number().over(w_all).alias("rn"),
        F.row_number().over(w_flag).alias("rn_f"),
    )
    runs = (
        o.filter("is_err")
        .groupBy("user_id", (F.col("rn") - F.col("rn_f")).alias("island"))
        .agg(
            F.min("ts").alias("burst_start"),
            F.max("ts").alias("burst_end"),
            F.count(F.lit(1)).alias("burst_len"),
        )
    )
    return (
        runs.filter(F.col("burst_len") >= 3)
        .select("user_id", "burst_start", "burst_end", "burst_len")
        .orderBy("user_id", "burst_start")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM o
    ), numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (the 30-min-inactivity-gap kind every
    clickstream pipeline runs): lag + running-sum-of-boundaries
    assigns session numbers, then one hash agg per session. Both
    windows and the agg share the user_id partitioning, so the whole
    query is ONE exchange — per-user state, never a global window.
    This is the batch twin of Structured Streaming's session_window
    (stream_exec_session); identical gap rule, so a backfill and the
    live stream agree. At 100 TB user_id partitioning holds: sessions
    never span users, and skewed bot users are bounded by the
    inactivity rule splitting their history into many groups."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.expr(
                    "timestampdiff(MICROSECOND, lag(ts) over "
                    "(partition by user_id order by ts, event_id), ts)"
                )
                > 1800 * 1000000
            ),
            1,
        ).otherwise(0).alias("new_sess"),
    )
    numbered = flagged.select(
        "user_id", "ts", "event_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "session_no"
        ),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts)) div 1000000")
            .cast("bigint")
            .alias("duration_s"),
        )
        .orderBy("user_id", "session_no")
    )


@register(
    "ts_zscore_anomaly",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS x6
      FROM events
    ), stats AS (
      SELECT user_id, ts, event_id, x6,
             SUM(x6) OVER w AS s1,
             SUM(x6 * x6) OVER w AS s2,
             COUNT(*) OVER w AS n
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, CAST(x6 AS DOUBLE) / 1000000 AS value,
           CAST(FLOOR((CAST(x6 * n - s1 AS DOUBLE)
                       / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) * n / (n - 1)))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS z
    FROM stats
    WHERE n >= 10 AND n * s2 - s1 * s1 > 0
      AND ABS(CAST(x6 * n - s1 AS DOUBLE)
              / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) * n / (n - 1))) > 2.5
    ORDER BY user_id, event_id
    """,
)
def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: flag events whose value sits
    >2.5 sample standard deviations from the trailing-20 mean, per
    user. The monitoring-pipeline staple — and a determinism case
    study: mean/std come from EXACT integer fixed-point window sums
    (Σx, Σx², n as bigints; z = (x·n − Σx)/√((n·Σx² − (Σx)²)·n/(n−1))
    is then a fixed short IEEE sequence), so two engines — or two
    partitionings of one engine — can never disagree on which events
    are anomalies. A float Welford stddev here would make the >2.5
    cut partition-order-dependent right at the threshold. Plan: one
    user_id-partitioned window, same single-exchange shape as
    sessionize; trailing state is 20 rows per user."""
    ev = load_table(spark, sf_dir, "events")
    x6 = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    # Exactness vs overflow: x6 ≤ ~5.6e8 at sf0.1, so s1 ≤ 1.1e10 and
    # s1² ≈ 1.25e20 — past the 9.2e18 long max (ANSI mode faults).
    # DuckDB survives because SUM(BIGINT) silently widens to HUGEINT
    # (int128); the Spark twin widens the SAME math to decimal(38,0),
    # which stays exact to 1e38 — headroom for another ~1e9× in Σx².
    x6d = x6.cast("decimal(38,0)")
    stats = ev.select(
        "user_id",
        "ts",
        "event_id",
        x6.alias("x6"),
        x6d.alias("x6d"),
    ).select(
        "user_id",
        "event_id",
        "x6",
        F.col("x6d"),
        F.sum("x6d").over(w).alias("s1"),
        F.sum(F.col("x6d") * F.col("x6d")).over(w).alias("s2"),
        F.count(F.lit(1)).over(w).cast("decimal(38,0)").alias("n"),
    )
    num = (F.col("x6d") * F.col("n") - F.col("s1")).cast("double")
    var_int = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    z = num / F.sqrt(var_int.cast("double") * F.col("n") / (F.col("n") - 1))
    return (
        stats.filter((F.col("n") >= 10) & (var_int > 0) & (F.abs(z) > 2.5))
        .select(
            "user_id",
            "event_id",
            (F.col("x6").cast("double") / 1000000).alias("value"),
            (F.floor(z * 1000000 + F.lit(0.5)).cast("bigint") / 1000000.0).alias("z"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "events_path_analysis",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq
    WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step user journeys (path / clickstream-sequence mining):
    sliding event-type trigrams per user via two LEADs on ONE
    user_id-ordered window (no self-joins — the naive 3-way join on
    consecutive ranks shuffles the corpus three times), then a hash
    agg over a path-string key whose cardinality is |event_types|³,
    finished by TakeOrdered. Same single-exchange discipline as
    sessionize; trigram fan-out is row-linear."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path"),
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


_TIME_RANGE_SQL = """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) OVER w
            AS BIGINT) AS units_last_hour
FROM events
WHERE user_id <= 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""


@register(
    "win_time_range_frame",
    oracle=_TIME_RANGE_SQL,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING): each event sees the count and exact unit-sum of the
    SAME USER's events in the trailing wall-clock hour — the
    interval-over-timestamp sibling of win_range_frame's numeric
    range, the shape monitoring windows actually use. The SAME SQL
    text runs on both engines (the sub_recursive_walks pattern):
    interval frames over TIMESTAMP ordering are SQL-only surface —
    the DataFrame API's rangeBetween takes numeric offsets, and an
    epoch cast would smuggle in session-timezone dependence. Frame
    membership is a timestamp comparison, so equal-ts rows are PEERS
    (all included — RANGE semantics, which is why no unique tiebreak
    is needed for determinism). One user_id exchange; trailing state
    is time-bounded rather than row-bounded. Sums are fixed-point
    units, so frame totals are exact."""
    from fairy_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TIME_RANGE_SQL)


@register(
    "win_percent_rank_cume",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    )
    SELECT c_custkey, c_nationkey, bal_cents,
           CAST(FLOOR(PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY bal_cents)
                      * 1048576) AS BIGINT) AS pct_rank_q20,
           CAST(FLOOR(CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY bal_cents)
                      * 1048576) AS BIGINT) AS cume_q20,
           NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY bal_cents, c_custkey)
             AS quartile
    FROM c
    ORDER BY c_nationkey, bal_cents, c_custkey
    """,
)
def win_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions — PERCENT_RANK ((rank−1)/
    (n−1)), CUME_DIST (#≤/n), NTILE(4) — per nation over exact
    balance cents. Tie semantics are part of the contract: equal
    balances share pct_rank/cume (so those order only on the value),
    while NTILE needs a total order for determinism — c_custkey
    breaks ties. The ratios are quantized by FLOOR(x·2^20), not
    ROUND(x, 6): both engines IEEE-divide the same integers to the
    SAME double, the power-of-two multiply is exact, and a rational
    k/m (m < 2^32) sits ≥ 1/(m·2^20) ≫ 1 ulp from any non-coincident
    2^-20 boundary — whereas decimal rounding hit a genuine half-way
    knife-edge at sf0.1 (k/6400 ending in …62.5 millionths; caught by
    the r7 sf0.1 audit, 3 cells). Windows are PARTITIONED by nation
    (parallel); for a global version the sharded two-pass helpers
    (operators/ranking.py) replace the SinglePartition plan."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal_cents"),
    )
    w_val = Window.partitionBy("c_nationkey").orderBy("bal_cents")
    w_tot = Window.partitionBy("c_nationkey").orderBy("bal_cents", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "bal_cents",
        F.floor(F.percent_rank().over(w_val) * 1048576)
        .cast("bigint")
        .alias("pct_rank_q20"),
        F.floor(F.cume_dist().over(w_val) * 1048576)
        .cast("bigint")
        .alias("cume_q20"),
        F.ntile(4).over(w_tot).alias("quartile"),
    ).orderBy("c_nationkey", "bal_cents", "c_custkey")


@register(
    "events_sequence_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list_transform(
               list_sort(list({'ts': ts, 'event_id': event_id, 'et': event_type})),
               x -> x.et) AS types
      FROM events GROUP BY user_id
    ), pos AS (
      SELECT user_id, types,
             COALESCE(list_position(types, 'signup'), 0) AS s
      FROM seq
    ), rel AS (
      SELECT user_id, s,
             CASE WHEN s > 0 THEN types[s+1:] ELSE [] END AS rest
      FROM pos
    ), flags AS (
      SELECT user_id, s,
             COALESCE(list_position(rest, 'purchase'), 0) AS p,
             COALESCE(list_position(rest, 'error'), 0) AS e
      FROM rel
    )
    SELECT user_id % 4 AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN s > 0 AND p > 0 AND (e = 0 OR e > p)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
    FROM flags
    GROUP BY cohort
    ORDER BY cohort
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching over per-user event streams — the
    MATCH_RECOGNIZE shape (signup, then purchase, with NO error in
    between) expressed in portable relational algebra: one ordered
    collect per user (sort_array over (ts, event_id, type) structs —
    the deterministic-collect discipline), then pure ARRAY-position
    logic for the pattern (array_position + slice), no regex — regex
    lookahead is engine-specific, array positions are not. One
    user-keyed exchange total; pattern evaluation is per-row codegen
    over bounded per-user arrays. The funnel/abandonment counterpart
    to events_funnel's time-window join."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ).alias("types")
    )
    s = F.array_position(F.col("types"), "signup")
    rel = seq.select(
        "user_id",
        s.alias("s"),
        F.when(
            s > 0, F.slice(F.col("types"), (s + 1).cast("int"), F.size("types"))
        ).otherwise(F.array().cast("array<string>")).alias("rest"),
    )
    flags = rel.select(
        "user_id",
        "s",
        F.array_position(F.col("rest"), "purchase").alias("p"),
        F.array_position(F.col("rest"), "error").alias("e"),
    )
    matched = (
        (F.col("s") > 0)
        & (F.col("p") > 0)
        & ((F.col("e") == 0) | (F.col("e") > F.col("p")))
    )
    return (
        flags.groupBy((F.col("user_id") % 4).alias("cohort"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.when(matched, 1).otherwise(0)).cast("bigint").alias("n_matched"),
        )
        .orderBy("cohort")
    )
