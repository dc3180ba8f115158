"""Join operators (SURVEY.md §2.B joins): equi inner/outer, broadcast,
semi/anti, cross/theta, range, as-of.

Scale notes: fact⋈fact joins shuffle on the join key (sort-merge, AQE
skew-split enabled); every dim join broadcasts explicitly — nation/
region/supplier stay tiny at any SF, so those joins must never
shuffle the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fairy_spark.functions.exact import money_sum
from fairy_spark.operators.asof import asof_join_backward, asof_join_forward
from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


@register(
    "join_3way_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) / 10000.0 AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def join_3way_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)          # fact⋈fact: shuffle on orderkey
        .join(c, o.o_custkey == c.c_custkey)               # orders side is much smaller post-filter
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)  # 25-row dim: broadcast
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation")
    )


@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_suppliers, SUM(CAST(ROUND(s.s_acctbal * 100) AS BIGINT)) / 100.0 AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            money_sum(F.col("s_acctbal"), unit=100).alias("total_bal"),
        )
        .orderBy("region", "nation")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
      FROM customer GROUP BY c_nationkey
    ),
    supp AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_theta_cross",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region
    FROM nation n CROSS JOIN region r
    WHERE n.n_regionkey < r.r_regionkey
    ORDER BY nation, region
    """,
)
def join_theta_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Pure theta (non-equi) join: Spark plans broadcast nested loop —
    # fine here and only ever used dim×dim; never fact×fact.
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.crossJoin(F.broadcast(r))
        .filter(F.col("n_regionkey") < F.col("r_regionkey"))
        .select(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .orderBy("nation", "region")
    )


@register(
    "join_range",
    oracle="""
    SELECT o.o_orderkey,
           COUNT(l.l_linenumber) AS n_shipped_30d
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 30 DAY
    WHERE o.o_totalprice > 350000
    GROUP BY o.o_orderkey
    ORDER BY o_orderkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range predicate: planned as a sort-merge/shuffle-hash
    join on the equi key with the range as a post-filter — the range
    never degenerates into a nested-loop because the equi key anchors
    the join."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderkey")
        .agg(F.count("l_linenumber").alias("n_shipped_30d"))
        .orderBy("o_orderkey")
    )


@register(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           ROUND(p.purchase_value, 6) AS last_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    ORDER BY c.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the value of that user's latest purchase at or
    before the click. Executed as union + last-non-null window (one
    shuffle, no range explosion) — see operators/asof.py."""
    ev = load_table(spark, sf_dir, "events")
    # No pre-aggregation: the operator's duplicate-(keys, ts) rule
    # (greatest value struct wins, operators/asof.py) already resolves
    # same-timestamp purchases to MAX(value) — identical result
    # (verified by collect-equality at sf0.1) with one less shuffle.
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    joined = asof_join_backward(
        clicks,
        purchases,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("purchase_value", 6).alias("last_purchase_value"),
    ).orderBy("event_id")


@register(
    "join_salted_skew",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
           ROUND(e.value, 6) AS value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.value > 50
    ORDER BY e.event_id
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): result is IDENTICAL to the
    plain join — the salt only widens the hot keys' shuffle space. The
    oracle is therefore the unsalted join."""
    from fairy_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 50)
    c = load_table(spark, sf_dir, "customer")
    return (
        salted_join(ev, c.select(F.col("c_custkey").alias("user_id"), "c_mktsegment"),
                    on="user_id", n_salt=8)
        .select("event_id", "user_id", F.col("c_mktsegment").alias("segment"),
                F.round("value", 6).alias("value"))
        .orderBy("event_id")
    )


@register(
    "join_shuffle_hash",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled-hash-join strategy pin (the third join strategy next to
    broadcast and sort-merge): for a build side too big to broadcast
    but whose per-partition slice fits in memory, SHJ hashes the build
    side per partition and skips the sort BOTH sides pay under SMJ —
    the right call for fact⋈mid-table joins where sort time dominates.
    The hint pins the strategy so the plan gate can assert it; without
    the hint Catalyst may broadcast at test SF, which proves nothing
    about the hash path."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").hint("shuffle_hash")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "join_range_binned",
    oracle="""
    SELECT p.event_id, CAST(COUNT(*) AS BIGINT) AS n_nearby
    FROM events p JOIN events e
      ON e.ts >= p.ts - INTERVAL 30 MINUTE
     AND e.ts <  p.ts + INTERVAL 30 MINUTE
    WHERE p.event_type = 'purchase' AND p.value > 90
    GROUP BY p.event_id
    ORDER BY p.event_id
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (no equi key): site-wide event count within
    ±30 min of each high-value purchase. With no equi anchor Spark
    plans a raw time-range join as BroadcastNestedLoop — O(|facts|·
    |anchors|) comparisons, dead at 100 TB. Scale path: bin both sides
    to the hour (a bin fully covers any ±30 min window's overlap with
    it), explode each anchor onto the 1-2 bins its window touches, and
    equi-join on the bin before the exact range filter. Each event
    lives in exactly one bin, so a (purchase, event) pair matches at
    most once — no post-join dedup. Comparisons drop from |e|·|p| to
    sum-per-bin products; bin width tunes that trade like any
    range-partitioned interval index."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("ts").alias("e_ts"),
        F.date_trunc("hour", F.col("ts")).alias("hbin"),
    )
    p = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 90))
        .select(F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withColumn(
            "hbin",
            F.explode(
                F.expr(
                    "sequence(date_trunc('hour', p_ts - interval 30 minutes),"
                    " date_trunc('hour', p_ts + interval 30 minutes),"
                    " interval 1 hour)"
                )
            ),
        )
    )
    return (
        p.join(e, "hbin")
        .filter(
            (F.col("e_ts") >= F.col("p_ts") - F.expr("interval 30 minutes"))
            & (F.col("e_ts") < F.col("p_ts") + F.expr("interval 30 minutes"))
        )
        .groupBy("p_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nearby"))
        .select(F.col("p_id").alias("event_id"), "n_nearby")
        .orderBy("event_id")
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           CASE WHEN p.ts >= c.ts - INTERVAL 1 HOUR
                THEN ROUND(p.purchase_value, 6) END AS purchase_value_1h
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    ORDER BY c.event_id
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness tolerance: each click gets the
    user's latest purchase value only if that purchase happened within
    the preceding hour — the standard guard against joining against
    arbitrarily stale state (market data, feature stores). Same
    union+last-non-null single-shuffle encoding as join_asof; the
    matched timestamp rides along as a second carried column and the
    tolerance is a post-filter, so the scale shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    # Un-pre-aggregated (see join_asof): duplicates share ts hence
    # p_ts, so the greatest-(purchase_value, p_ts)-struct rule equals
    # MAX(value) per (user_id, ts) — one less shuffle.
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_backward(
        clicks,
        purchases,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value", "p_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.when(
            F.col("p_ts") >= F.col("ts") - F.expr("interval 1 hour"),
            F.round("purchase_value", 6),
        ).alias("purchase_value_1h"),
    ).orderBy("event_id")


@register(
    "join_asof_forward",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id,
           ROUND(p.purchase_value, 6) AS next_purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    ORDER BY c.event_id
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for each click, the value of that user's
    EARLIEST purchase at or after the click — the "what happened
    next" direction (attribution, next-reading lookups). Same
    single-shuffle union+window encoding as join_asof, frame
    mirrored to first-non-null-over-FOLLOWING
    (operators/asof.py asof_join_forward)."""
    ev = load_table(spark, sf_dir, "events")
    # No pre-aggregation: the operator's duplicate-(keys, ts) rule
    # (greatest value struct wins, operators/asof.py) already resolves
    # same-timestamp purchases to MAX(value) — identical result
    # (verified by collect-equality at sf0.1) with one less shuffle.
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    joined = asof_join_forward(
        clicks,
        purchases,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("purchase_value", 6).alias("next_purchase_value"),
    ).orderBy("event_id")


@register(
    "join_asof_nearest",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, MAX(value) AS purchase_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    bwd AS (
      SELECT c.event_id, c.user_id, c.ts,
             p.ts AS b_ts, p.purchase_value AS b_val
      FROM clicks c
      ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts <= c.ts
    ),
    fwd AS (
      SELECT c.event_id, p.ts AS f_ts, p.purchase_value AS f_val
      FROM clicks c
      ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND p.ts >= c.ts
    )
    SELECT b.event_id, b.user_id,
           CASE
             WHEN b.b_ts IS NULL AND f.f_ts IS NULL THEN NULL
             WHEN f.f_ts IS NULL THEN 'backward'
             WHEN b.b_ts IS NULL THEN 'forward'
             WHEN date_diff('microseconds', b.b_ts, b.ts)
                  <= date_diff('microseconds', b.ts, f.f_ts) THEN 'backward'
             ELSE 'forward'
           END AS direction,
           ROUND(CASE
             WHEN b.b_ts IS NULL AND f.f_ts IS NULL THEN NULL
             WHEN f.f_ts IS NULL THEN b.b_val
             WHEN b.b_ts IS NULL THEN f.f_val
             WHEN date_diff('microseconds', b.b_ts, b.ts)
                  <= date_diff('microseconds', b.ts, f.f_ts) THEN b.b_val
             ELSE f.f_val
           END, 6) AS nearest_value
    FROM bwd b JOIN fwd f ON b.event_id = f.event_id
    ORDER BY b.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join (either direction): each click gets
    the temporally closest purchase, completing the as-of family
    (backward, forward, tolerance, nearest — pandas merge_asof's
    direction='nearest'). Composition, not a new operator: one
    backward + one forward pass (operators/asof.py, each a single
    user_id exchange carrying the matched timestamp as a value
    column), then a row-local tie rule — distance compared in exact
    microseconds, equidistant resolves BACKWARD (merge_asof's
    documented rule). The same two-pass shape at 100 TB costs
    exactly two window shuffles regardless of right-side density —
    no interval explosion."""
    ev = load_table(spark, sf_dir, "events")
    # Un-pre-aggregated (see join_asof): both directions resolve
    # duplicate-(user_id, ts) purchases to MAX(value) via the
    # greatest-struct rule — one less shuffle before the two window
    # passes.
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    bwd = asof_join_backward(
        clicks, purchases, keys=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["purchase_value", "p_ts"],
    ).select(
        "event_id", "user_id", "ts",
        F.col("purchase_value").alias("b_val"), F.col("p_ts").alias("b_ts"),
    )
    fwd = asof_join_forward(
        clicks, purchases, keys=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["purchase_value", "p_ts"],
    ).select(
        F.col("event_id").alias("f_eid"),
        F.col("purchase_value").alias("f_val"), F.col("p_ts").alias("f_ts"),
    )
    j = bwd.join(fwd, F.col("event_id") == F.col("f_eid"))
    # timestamp_ntz subtraction yields an exact day-time INTERVAL —
    # directly comparable, no epoch cast needed (ntz cannot cast to
    # double anyway)
    db = F.col("ts") - F.col("b_ts")
    df_ = F.col("f_ts") - F.col("ts")
    use_b = (
        F.col("f_ts").isNull()
        | (F.col("b_ts").isNotNull() & (db <= df_))
    )
    direction = (
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(), F.lit(None).cast("string"))
        .when(use_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    nearest = (
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(), F.lit(None).cast("double"))
        .when(use_b, F.col("b_val"))
        .otherwise(F.col("f_val"))
    )
    return j.select(
        "event_id",
        "user_id",
        direction.alias("direction"),
        F.round(nearest, 6).alias("nearest_value"),
    ).orderBy("event_id")


@register(
    "join_null_safe_eq",
    oracle="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 11 = 0 THEN NULL
                  ELSE o_orderpriority END AS pri
      FROM orders WHERE o_orderkey % 3 = 0
    ), r AS (
      SELECT CASE WHEN n % 2 = 0 THEN NULL
                  ELSE '1-URGENT' END AS pri,
             n AS tag
      FROM (SELECT unnest(generate_series(0, 3)) AS n)
    )
    SELECT l.pri IS NULL AS null_key,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(SUM(r.tag) AS BIGINT) AS tag_sum
    FROM l JOIN r ON l.pri IS NOT DISTINCT FROM r.pri
    GROUP BY null_key
    ORDER BY null_key
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantics SCD
    pipelines need when NULL is a legitimate dimension value (the
    merge/scd2 operators' null-safe change detection, surfaced as a
    join predicate). The build side carries two NULL-keyed rows, so
    the null partition matches are observable, not vacuous. Plan:
    Spark plans <=> as a HASH join key (null-safe equality is still
    an equi-join — keys hash with NULL as a value), NOT the
    nested-loop a general null-tolerant predicate would force; at
    100 TB that distinction is the whole game. One caveat pinned by
    the shape: null-safe join keys concentrate every NULL row in ONE
    hash partition — a high-NULL column needs the salted-skew
    treatment (join_salted_skew)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    left = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ).alias("pri"),
    )
    right = spark.range(4).select(
        F.when(F.col("id") % 2 == 0, F.lit(None)).otherwise(F.lit("1-URGENT")).alias(
            "r_pri"
        ),
        F.col("id").alias("tag"),
    )
    return (
        left.join(right, F.col("pri").eqNullSafe(F.col("r_pri")))
        .groupBy(F.col("pri").isNull().alias("null_key"))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("tag").alias("tag_sum"),
        )
        .orderBy("null_key")
    )
