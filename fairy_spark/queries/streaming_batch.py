"""Batch-equivalent formulations of the streaming window operators
(SURVEY.md §2.B streaming; §5.2 batch-equivalence strategy).

These run the SAME window semantics the streaming pipeline uses
(fairy_spark/streaming/pipeline.py), in batch mode, so the DuckDB
oracle can check them; tests/test_streaming.py then asserts the
streaming replay converges to these exact results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from fairy_spark.functions.exact import round6 as _round6
from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


@register(
    "stream_tumbling_batch",
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY w_start, event_type
    """,
)
def stream_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "total_value")
        .orderBy("w_start", "event_type")
    )


@register(
    "stream_sliding_batch",
    oracle="""
    WITH expanded AS (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS w_start,
             value
      FROM events
    )
    SELECT w_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / (COUNT(value) * 1000000) AS avg_value
    FROM expanded
    GROUP BY w_start
    ORDER BY w_start
    """,
)
def stream_sliding_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 2-hour window sliding 1 hour: every event lands in exactly two
    # windows; Spark's F.window handles the expansion natively.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # exact-anchored mean (see operators/timeseries.py): the
            # float AVG here was order-dependent in its low bits
            (
                F.sum(
                    F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
                ).cast("double")
                # non-null count: NULL values are ignored like F.avg
                # would, not averaged in as 0 (ADVICE r5)
                / (F.count(F.col("value")) * 1000000)
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n", "avg_value")
        .orderBy("w_start")
    )


@register(
    "stream_session_batch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000 THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WHERE user_id <= 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM seq
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def stream_session_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min gap) in batch via lag + cumulative flag —
    semantically session_window(ts, '30 minutes') restricted to
    (start, end=last event, count)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ (tables.py loader); timestampdiff is the
    # NTZ-safe epoch arithmetic (unix_micros rejects NTZ input).
    gap_us = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) over"
        " (partition by user_id order by ts, event_id), ts)"
    )
    seq = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1).otherwise(0),
    )
    sess = seq.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id"))
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "stream_dedup_batch",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
)
def stream_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of streaming dropDuplicates: first event per
    (user_id, event_type) key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event"))
        .orderBy("user_id", "event_type")
    )


@register(
    "stream_static_join_batch",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase' AND e.user_id <= 50
    ORDER BY e.event_id
    """,
)
def stream_static_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") <= 50)
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .select("event_id", "user_id", F.col("c_mktsegment").alias("segment"))
        .orderBy("event_id")
    )


@register(
    "stream_stateful_ema_batch",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n,
           ROUND(SUM(value), 6) AS total,
           ROUND(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> 0.125 * x + 0.875 * acc), 6) AS ema
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_stateful_ema_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the applyInPandasWithState running-stats operator
    (streaming/stateful.py): per-user count/sum/EMA folded in event-time
    order. Both engines run the identical fold recurrence (seed = first
    value), so doubles agree to rounding."""
    from fairy_spark.streaming.stateful import user_running_stats_batch

    ev = load_table(spark, sf_dir, "events")
    out = user_running_stats_batch(ev)
    return out.select(
        "user_id",
        "n",
        F.round("total", 6).alias("total"),
        F.round("ema", 6).alias("ema"),
    ).orderBy("user_id")


@register(
    "ts_resample_ffill",
    oracle="""
    WITH agg AS (
      SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
               / (COUNT(value) * 1000000) AS avg_value
      FROM events WHERE user_id <= 10
      GROUP BY 1, 2
    ), span AS (
      SELECT key, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY key
    ), grid AS (
      SELECT s.key, unnest(generate_series(s.lo, s.hi, INTERVAL 1 HOUR)) AS bucket
      FROM span s
    ), j AS (
      SELECT g.key, g.bucket,
             COALESCE(a.n, 0) AS n,
             a.avg_value
      FROM grid g LEFT JOIN agg a ON g.key = a.key AND g.bucket = a.bucket
    )
    SELECT key, bucket, CAST(n AS BIGINT) AS n,
           CAST(FLOOR(avg_value * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS avg_value,
           CAST(FLOOR(LAST_VALUE(avg_value IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS ffill_value
    FROM j
    ORDER BY key, bucket
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with forward-fill
    (operators/timeseries.py) — gap-fill for irregular event streams."""
    from fairy_spark.operators.timeseries import resample_ffill

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    out = resample_ffill(ev)
    return out.select(
        "key",
        "bucket",
        F.col("n").cast("bigint").alias("n"),
        _round6(F.col("avg_value")).alias("avg_value"),
        _round6(F.col("ffill_value")).alias("ffill_value"),
    ).orderBy("key", "bucket")


@register(
    "stream_stream_join_batch",
    oracle="""
    SELECT l.user_id,
           l.event_id AS l_event,
           r.event_id AS r_event,
           l.ts AS l_ts,
           r.ts AS r_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    JOIN (SELECT * FROM events WHERE event_type <> 'purchase') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts
     AND r.ts <= l.ts + INTERVAL 2 HOUR
    ORDER BY l.user_id, l_event, r_event
    """,
)
def stream_stream_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch formulation of streaming/pipeline.py::stream_stream_join
    (purchases ⋈ later same-user events within 2h). The streaming
    variant adds watermarks on both sides so join state stays bounded;
    tests/test_streaming.py asserts the replay converges to exactly
    these pairs. The time-range condition rides inside the equi-join,
    so the shuffle keys stay user_id on both sides."""
    ev = load_table(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("l_event"), F.col("ts").alias("l_ts")
    )
    r = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event"),
        F.col("ts").alias("r_ts"),
    )
    return (
        l.join(
            r,
            (F.col("user_id") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 2 hours")),
        )
        .select("user_id", "l_event", "r_event", "l_ts", "r_ts")
        .orderBy("user_id", "l_event", "r_event")
    )


@register(
    "ts_resample_interp",
    oracle="""
    WITH agg AS (
      SELECT user_id AS key, date_trunc('hour', ts) AS bucket,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
               / (COUNT(value) * 1000000) AS avg_value
      FROM events WHERE user_id <= 10
      GROUP BY 1, 2
    ), span AS (
      SELECT key, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY key
    ), grid AS (
      SELECT s.key, unnest(generate_series(s.lo, s.hi, INTERVAL 1 HOUR)) AS bucket
      FROM span s
    ), j AS (
      SELECT g.key, g.bucket, COALESCE(a.n, 0) AS n, a.avg_value
      FROM grid g LEFT JOIN agg a ON g.key = a.key AND g.bucket = a.bucket
    ), g2 AS (
      SELECT key, bucket, n, avg_value,
             ROW_NUMBER() OVER (PARTITION BY key ORDER BY bucket) AS idx
      FROM j
    ), g3 AS (
      SELECT key, bucket, n, avg_value, idx,
        LAST_VALUE(avg_value IGNORE NULLS) OVER (
          PARTITION BY key ORDER BY idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        LAST_VALUE(CASE WHEN avg_value IS NOT NULL THEN idx END IGNORE NULLS) OVER (
          PARTITION BY key ORDER BY idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
        FIRST_VALUE(avg_value IGNORE NULLS) OVER (
          PARTITION BY key ORDER BY idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        FIRST_VALUE(CASE WHEN avg_value IS NOT NULL THEN idx END IGNORE NULLS) OVER (
          PARTITION BY key ORDER BY idx
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
      FROM g2
    )
    SELECT key, bucket, CAST(n AS BIGINT) AS n,
           CAST(FLOOR(avg_value * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS avg_value,
           CAST(FLOOR((CASE WHEN avg_value IS NOT NULL THEN avg_value
                 WHEN pv IS NOT NULL AND nv IS NOT NULL
                   THEN pv + (nv - pv) * (CAST(idx - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE))
                 ELSE NULL END) * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS interp_value
    FROM g3
    ORDER BY key, bucket
    """,
)
def ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with LINEAR interpolation across
    interior gaps (operators/timeseries.py::resample_interp) — the
    gap-fill variant metrics pipelines want for continuous signals,
    next to ffill's step semantics. The interpolation fraction is a
    ratio of integer grid indexes (timezone-free, engine-exact); only
    the anchors are floats, and both engines evaluate the identical
    IEEE expression."""
    from fairy_spark.operators.timeseries import resample_interp

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    out = resample_interp(ev)
    return out.select(
        "key",
        "bucket",
        F.col("n").cast("bigint").alias("n"),
        _round6(F.col("avg_value")).alias("avg_value"),
        _round6(F.col("interp_value")).alias("interp_value"),
    ).orderBy("key", "bucket")


@register(
    "events_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT s.user_id, MIN(e.ts) AS purchase_ts
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= s.signup_ts
       AND e.ts <= s.signup_ts + INTERVAL 24 HOUR
      GROUP BY s.user_id
    )
    SELECT s.user_id, s.signup_ts, p.purchase_ts,
           (p.purchase_ts IS NOT NULL) AS converted
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    ORDER BY s.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: first signup per user, then the first
    purchase within 24h of it. The classic product-analytics sequence
    query. Plan: tiny per-user min-agg (signups) joins the purchase
    stream as an EQUI join on user_id with the time range riding
    inside the join condition — shuffle keys stay user_id, state is
    per-user scalars, the same shape the streaming stream-stream join
    uses so it scales to unbounded event history."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        s.join(
            ev.filter(F.col("event_type") == "purchase").select(
                F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
            ),
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 24 HOURS")),
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("purchase_ts"))
    )
    return (
        s.join(p, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "purchase_ts",
            F.col("purchase_ts").isNotNull().alias("converted"),
        )
        .orderBy("user_id")
    )


@register(
    "events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INTEGER) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day,
    counted distinct on each later day offset — the growth-analytics
    staple next to the funnel. Plan: the cohort frame is a user-sized
    min-agg; joining it back to events is an equi join on user_id
    (same shuffle key as the agg that built it, so the exchange is
    reusable), then one distinct-agg on (cohort_day, day_offset).
    DATE arithmetic here is calendar-day truncation on both engines —
    no boundary ambiguity like the second-granularity session gap.
    At 100 TB the user dim is large, so the cohort side is a shuffle
    join (NOT broadcast); distinct-count state is bounded per
    (cohort, offset) cell, ~days² cells total."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    return (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .join(firsts, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "stream_record_high_batch",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v6,
             MAX(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(v6) AS BIGINT) AS max_units,
           CAST(COUNT(*) FILTER (WHERE prev_max IS NULL OR v6 > prev_max)
                AS BIGINT) AS n_records
    FROM x
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_record_high_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the transformWithStateInPandas record-high
    operator (streaming/stateful.py::user_record_highs): per-user
    running max of fixed-point value units plus the count of times a
    NEW high appeared in event-time order — the order-sensitive fold
    expressed as one user-partitioned window (prev-max frame) + one
    hash agg. Exact integers end to end, so the stream fold and this
    batch shape must agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    v6 = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    x = ev.select(
        "user_id", v6.alias("v6"), F.max(v6).over(w).alias("prev_max")
    )
    return (
        x.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("v6").alias("max_units"),
            F.count_if(
                F.col("prev_max").isNull() | (F.col("v6") > F.col("prev_max"))
            ).alias("n_records"),
        )
        .orderBy("user_id")
    )
