"""Statistical-testing & data-science queries (r7 new surface): the
hypothesis-test / distribution-analysis layer a training-data pipeline
runs over its corpora and event streams — chi-square independence,
Welch's t, two-sample Kolmogorov-Smirnov, Benford first-digit audit,
Mann-Kendall trend, CUSUM changepoint, Kaplan-Meier survival, and a
closed-form 2-D PCA.

Float discipline (FIXTURES.md): every accumulation that crosses a
shuffle is EXACT — counts, power-of-two-quantized value sums
(bigint/decimal), products in decimal(38,0) — and doubles appear only
in final scalar formulas computed from those exact aggregates, rounded
in-query on both engines. The ECDF statistics use the sharded two-pass
prefix sum (operators/ranking.py sharded_prefix_sums) — no
SinglePartition window at any data-scale stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table

# value → exact integer milli-ish units: ×1024 is a power of two, so
# float→double widening, the multiply, and the floor are all exact —
# the same bigint in any engine (the ml_ann_ivf_exact trick).
_VQ = "CAST(FLOOR(CAST(value AS DOUBLE) * 1024) AS BIGINT)"


def _vq(col):
    return F.floor(col.cast("double") * 1024).cast("bigint")


@register(
    "stats_chi_square",
    oracle="""
    WITH obs AS (
      SELECT event_type, user_id % 4 AS cohort, CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ), rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
    ct AS (SELECT cohort, SUM(o) AS c FROM obs GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
      SELECT obs.event_type, obs.cohort, obs.o, rt.r, ct.c, tot.n,
             CAST(obs.o AS DECIMAL(38,0)) * tot.n - CAST(rt.r AS DECIMAL(38,0)) * ct.c AS dev
      FROM obs JOIN rt USING (event_type) JOIN ct USING (cohort) CROSS JOIN tot
    )
    SELECT CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT cohort) - 1)
                AS BIGINT) AS dof,
           CAST(MAX(n) AS BIGINT) AS n,
           ROUND(SUM(CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE)
                     / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))), 6)
             AS chi2
    FROM cells
    """,
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event_type and a user
    cohort (user_id % 4): χ² = Σ (o·N − r·c)² / (N·r·c) — the cell
    deviations are EXACT decimal products of counts (o·N and r·c reach
    ~10²⁴ at 100 TB row counts, far past bigint — hence decimal(38,0)),
    and doubles appear only in the final per-cell division, summed over
    the #cells (bounded: |types|×|cohorts|) — order variance bounded by
    cell count, not corpus. Plan: one corpus hash-agg to the
    contingency table, then broadcast-sized marginal joins. dof =
    (R−1)(C−1) = cells − 1 − (R−1) − (C−1) for the full grid (every
    type × cohort occupied here)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("cohort").agg(F.sum("o").alias("c"))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "cohort")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "dev",
            F.col("o").cast("decimal(38,0)") * F.col("n")
            - F.col("r").cast("decimal(38,0)") * F.col("c"),
        )
    )
    contrib = (
        F.col("dev").cast("double")
        * F.col("dev").cast("double")
        / (F.col("n").cast("double") * F.col("r").cast("double") * F.col("c").cast("double"))
    )
    return cells.agg(
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("cohort") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        F.max("n").cast("bigint").alias("n"),
        F.round(F.sum(contrib), 6).alias("chi2"),
    )


@register(
    "stats_welch_ttest",
    oracle=f"""
    WITH q AS (
      SELECT event_type, {_VQ} AS vq FROM events
      WHERE event_type IN ('purchase', 'click')
    ), g AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(vq) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(vq AS DECIMAL(38,0)) * vq) AS DECIMAL(38,0)) AS ss
      FROM q GROUP BY 1
    ), w AS (
      SELECT
        MAX(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
        MAX(CASE WHEN event_type = 'purchase' THEN s END) AS s1,
        MAX(CASE WHEN event_type = 'purchase' THEN ss END) AS ss1,
        MAX(CASE WHEN event_type = 'click' THEN n END) AS n2,
        MAX(CASE WHEN event_type = 'click' THEN s END) AS s2,
        MAX(CASE WHEN event_type = 'click' THEN ss END) AS ss2
      FROM g
    ), d AS (
      SELECT n1, n2,
             CAST(s1 AS DOUBLE) / n1 / 1024 AS m1,
             CAST(s2 AS DOUBLE) / n2 / 1024 AS m2,
             (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) / 1048576 AS v1,
             (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) / 1048576 AS v2
      FROM w
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND(m1, 6) AS mean1, ROUND(m2, 6) AS mean2,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(POWER(v1 / n1 + v2 / n2, 2)
                 / (POWER(v1 / n1, 2) / (n1 - 1) + POWER(v2 / n2, 2) / (n2 - 1)), 6)
             AS welch_df
    FROM d
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event populations
    (purchase vs click values): the sufficient statistics (n, Σv, Σv²)
    accumulate as EXACT quantized integers in decimal — shuffle-order-
    proof — and the t statistic and Welch-Satterthwaite df are closed-
    form doubles over those six scalars, identical on both engines.
    This is the map-side-combinable shape: at 100 TB the whole test is
    one scan + one 2-row agg; no row ever crosses the network."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    q = ev.select("event_type", _vq(F.col("value")).alias("vq"))
    g = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vq").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("vq").cast("decimal(38,0)") * F.col("vq")).cast("decimal(38,0)").alias("ss"),
    )
    w = g.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias("n1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("s"))).alias("s1"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ss"))).alias("ss1"),
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias("n2"),
        F.max(F.when(F.col("event_type") == "click", F.col("s"))).alias("s2"),
        F.max(F.when(F.col("event_type") == "click", F.col("ss"))).alias("ss2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1") / 1024
    m2 = F.col("s2").cast("double") / F.col("n2") / 1024
    v1 = (
        (F.col("ss1").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1) / 1048576
    )
    v2 = (
        (F.col("ss2").cast("double") - F.col("s2").cast("double") * F.col("s2") / F.col("n2"))
        / (F.col("n2") - 1) / 1048576
    )
    se2 = v1 / F.col("n1") + v2 / F.col("n2")
    return w.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round(m1, 6).alias("mean1"),
        F.round(m2, 6).alias("mean2"),
        F.round((m1 - m2) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(v1 / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(v2 / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


@register(
    "stats_ks_two_sample",
    oracle="""
    WITH counts AS (
      SELECT n_chars AS v,
             CAST(COUNT(*) FILTER (doc_id % 2 = 0) AS DECIMAL(38,0)) AS c1,
             CAST(COUNT(*) FILTER (doc_id % 2 = 1) AS DECIMAL(38,0)) AS c2
      FROM documents GROUP BY 1
    ), cum AS (
      SELECT v,
             SUM(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c1,
             SUM(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c2
      FROM counts
    ), tot AS (
      SELECT MAX(cum_c1) AS n1, MAX(cum_c2) AS n2 FROM cum
    ), dev AS (
      SELECT v, ABS(cum_c1 * n2 - cum_c2 * n1) AS d_scaled, n1, n2
      FROM cum CROSS JOIN tot
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
           ROUND(CAST(MAX(d_scaled) AS DOUBLE)
                 / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)), 6) AS ks_d,
           CAST(MIN(CASE WHEN d_scaled = md THEN v END) AS BIGINT) AS ks_at
    FROM (SELECT dev.*, MAX(d_scaled) OVER () AS md FROM dev)
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov over document lengths (even vs
    odd doc_id): D = max_v |F1(v) − F2(v)|, computed as the EXACT
    integer max of |cum1·n2 − cum2·n1| — no float compare anywhere in
    the argmax, so the statistic and its location are deterministic.
    The ECDFs come from the sharded two-pass prefix sum
    (sharded_prefix_sums): per-shard subtotals → driver prefix →
    parallel per-shard cumulative windows; the oracle runs the
    transparent single-window form, the engine the distributed one —
    same semantics, different physical strategy. Scale: the cumulative
    stage runs over DISTINCT values (bounded domain), reached by one
    corpus hash-agg."""
    from fairy_spark.operators.ranking import sharded_prefix_sums

    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("c1"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
        .cast("decimal(38,0)")
        .alias("c2"),
    )
    cum = sharded_prefix_sums(counts, ["v"], ["c1", "c2"])
    tot = cum.agg(
        F.max("cum_c1").alias("n1"), F.max("cum_c2").alias("n2")
    )
    dev = cum.crossJoin(F.broadcast(tot)).withColumn(
        "d_scaled",
        F.abs(F.col("cum_c1") * F.col("n2") - F.col("cum_c2") * F.col("n1")),
    )
    md = dev.agg(F.max("d_scaled").alias("md"))
    return (
        dev.crossJoin(F.broadcast(md))
        .agg(
            F.max("n1").cast("bigint").alias("n1"),
            F.max("n2").cast("bigint").alias("n2"),
            F.round(
                F.max("d_scaled").cast("double")
                / (F.max("n1").cast("double") * F.max("n2").cast("double")),
                6,
            ).alias("ks_d"),
            F.min(F.when(F.col("d_scaled") == F.col("md"), F.col("v")))
            .cast("bigint")
            .alias("ks_at"),
        )
    )


# log10(1 + 1/d) for d = 1..9, embedded as IDENTICAL literals in both
# engines (the plane_weights trick) — no cross-engine log evaluation.
_BENFORD_P = {
    d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)
}


@register(
    "stats_benford_digits",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS o FROM digits GROUP BY 1
    ), tot AS (SELECT SUM(o) AS n FROM obs),
    expect AS (
      SELECT * FROM (VALUES
        {", ".join(f"({d}, {_BENFORD_P[d]!r})" for d in range(1, 10))}
      ) AS t(digit, p)
    )
    SELECT e.digit, COALESCE(o.o, 0) AS observed,
           ROUND(tot.n * e.p, 6) AS expected,
           ROUND(POWER(COALESCE(o.o, 0) - tot.n * e.p, 2) / (tot.n * e.p), 6)
             AS chi2_term
    FROM expect e LEFT JOIN obs o USING (digit) CROSS JOIN tot
    ORDER BY e.digit
    """,
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the standard
    fraud/synthetic-data screen. The first significant digit comes
    from the INTEGER cents value rendered as a string (identical
    integer-to-string in any engine — no float log10 at decade
    boundaries); expected frequencies are log10(1+1/d) literals
    embedded identically in both plans. One corpus hash-agg to 9
    digit counts; the chi-square terms are per-digit doubles over
    exact counts."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = o.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("o"))
    tot = obs.agg(F.sum("o").alias("n"))
    expect = spark.createDataFrame(
        [(d, _BENFORD_P[d]) for d in range(1, 10)], "digit BIGINT, p DOUBLE"
    )
    e = F.col("n") * F.col("p")
    return (
        F.broadcast(expect)
        .join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("o"), F.lit(0)).alias("observed"),
            F.round(e, 6).alias("expected"),
            F.round(F.pow(F.coalesce(F.col("o"), F.lit(0)) - e, 2) / e, 6).alias(
                "chi2_term"
            ),
        )
        .orderBy("digit")
    )


@register(
    "stats_mann_kendall",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM({_VQ}) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
    ), s AS (
      SELECT event_type, CAST(SUM(sgn) AS BIGINT) AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1
    ), n AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
    )
    SELECT s.event_type, n.n_days, s.s_stat,
           ROUND(CAST(s.s_stat AS DOUBLE) / s.n_pairs, 6) AS tau
    FROM s JOIN n USING (event_type)
    ORDER BY event_type
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event-type daily series: S =
    Σ_{i<j} sign(x_j − x_i) over quantized-exact daily totals —
    all-integer, so S and Kendall's tau are deterministic. The pair
    join is keyed by event_type and bounded by the CALENDAR (n_days²/2
    pairs per series — 30 days here, ~365 in production), not the
    corpus: the corpus-sized stage is the one daily hash-agg in front.
    This is the right decomposition at 100 TB — reduce to the series
    domain first, test second."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_vq(F.col("value"))).cast("bigint").alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
    )
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(F.col("a.event_type").alias("event_type"), sgn.alias("sgn"))
    s = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("bigint").alias("s_stat"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        s.join(n, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            F.round(F.col("s_stat").cast("double") / F.col("n_pairs"), 6).alias("tau"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM({_VQ}) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, CAST(SUM(x) AS DECIMAL(38,0)) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY 1
    ), cum AS (
      SELECT d.event_type, d.day, tot.n, tot.t,
             SUM(CAST(d.x AS DECIMAL(38,0)))
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cx,
             CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day)
                  AS DECIMAL(38,0)) AS k
      FROM daily d JOIN tot ON d.event_type = tot.event_type
    ), dev AS (
      SELECT event_type, day, n, t, ABS(cx * n - k * t) AS d_scaled
      FROM cum
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_days,
           ROUND(CAST(MAX(d_scaled) AS DOUBLE)
                 / (CAST(MAX(n) AS DOUBLE) * 1024), 6) AS max_cusum,
           CAST(MIN(CASE WHEN d_scaled = md THEN day END) AS VARCHAR) AS change_day
    FROM (SELECT dev.*, MAX(d_scaled) OVER (PARTITION BY event_type) AS md FROM dev)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint score per event-type series: the day k
    maximizing |Σ_{i≤k} x_i − k·mean| — computed scale-free as the
    exact integer |cx·n − k·T| (multiply through by n, no division
    before the argmax), so the changepoint location is chosen by
    integer compare with a deterministic min-day tiebreak. Windows are
    PARTITIONED by event_type (parallel across series); the final
    max_cusum is the one double, un-quantized back to value units.
    This is the streaming-monitoring primitive behind drift alerts —
    at 100 TB the daily reduction in front is the corpus-sized stage."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(_vq(F.col("value"))).cast("bigint").alias("x"))
    tot = daily.groupBy("event_type").agg(
        F.sum("x").cast("decimal(38,0)").alias("t"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wk = Window.partitionBy("event_type").orderBy("day")
    cum = (
        daily.join(F.broadcast(tot), "event_type")
        .withColumn("cx", F.sum(F.col("x").cast("decimal(38,0)")).over(w))
        .withColumn("k", F.row_number().over(wk).cast("decimal(38,0)"))
    )
    dev = cum.withColumn(
        "d_scaled", F.abs(F.col("cx") * F.col("n") - F.col("k") * F.col("t"))
    )
    wm = Window.partitionBy("event_type")
    return (
        dev.withColumn("md", F.max("d_scaled").over(wm))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            F.round(
                F.max("d_scaled").cast("double") / (F.max("n").cast("double") * 1024),
                6,
            ).alias("max_cusum"),
            F.min(F.when(F.col("d_scaled") == F.col("md"), F.col("day")))
            .cast("string")
            .alias("change_day"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_survival_km",
    oracle="""
    WITH ft AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
      FROM events GROUP BY user_id
    ), subj AS (
      SELECT user_id,
             CASE WHEN p_ts IS NOT NULL AND p_ts >= s_ts
                   AND date_diff('hour', s_ts, p_ts) < 168
                  THEN date_diff('hour', s_ts, p_ts) ELSE 168 END AS t,
             CASE WHEN p_ts IS NOT NULL AND p_ts >= s_ts
                   AND date_diff('hour', s_ts, p_ts) < 168
                  THEN 1 ELSE 0 END AS ev
      FROM ft WHERE s_ts IS NOT NULL
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM subj),
    steps AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leave
      FROM subj GROUP BY t HAVING SUM(ev) > 0
    ), risk AS (
      SELECT s.t, s.d,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM subj WHERE subj.t >= s.t) AS n_risk
      FROM steps s
    ), lnq AS (
      SELECT t, d, n_risk,
             CAST(FLOOR(LN(CAST(n_risk - d AS DOUBLE) / n_risk) * 1000000000) AS BIGINT)
               AS lq
      FROM risk
    )
    SELECT t AS hours, n_risk, d AS n_events,
           ROUND(EXP(CAST(SUM(lq) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / 1000000000), 6) AS survival
    FROM lnq
    ORDER BY hours
    """,
)
def stats_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup→purchase conversion,
    right-censored at a 168-hour horizon: S(t) = Π_{t_i ≤ t}
    (1 − d_i/n_i) over event times. The product is carried as a
    CUMULATIVE SUM of per-step fixed-point-quantized logs (the
    text_quality_logprob discipline: ln is evaluated once per step on
    the identical rational, quantized to integer nano-units, and the
    cumulative sum of integers is order-exact), exponentiated and
    rounded only at the end. Risk sets n_i = |{T ≥ t_i}| come from a
    subject-level frame (one conditional-min agg per user — the funnel
    extraction shape), so the KM stage is bounded by distinct event
    TIMES, not subjects; the ordered window runs over that bounded
    step table. Censoring is explicit: no-purchase users contribute
    risk through the horizon and never an event."""
    ev = load_table(spark, sf_dir, "events")
    ft = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("s_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p_ts"),
    )
    hours = (
        F.datediff(F.col("p_ts").cast("date"), F.col("s_ts").cast("date")) * 24
        + (F.hour("p_ts") - F.hour("s_ts"))
    ).cast("bigint")
    converted = (
        F.col("p_ts").isNotNull() & (F.col("p_ts") >= F.col("s_ts")) & (hours < 168)
    )
    subj = ft.filter(F.col("s_ts").isNotNull()).select(
        F.when(converted, hours).otherwise(F.lit(168)).alias("t"),
        F.when(converted, 1).otherwise(0).alias("ev"),
    )
    steps = (
        subj.groupBy("t")
        .agg(F.sum("ev").cast("bigint").alias("d"), F.count(F.lit(1)).alias("leave"))
        .filter(F.col("d") > 0)
    )
    # n_risk via suffix counts: total minus exclusive prefix of leavers
    from fairy_spark.operators.ranking import sharded_prefix_sums

    all_leave = (
        subj.groupBy("t").agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("lv"))
    )
    cum = sharded_prefix_sums(all_leave, ["t"], ["lv"])
    n0 = subj.count()
    risk = (
        steps.join(
            cum.select("t", (F.lit(n0) - F.col("cum_lv") + F.col("lv")).alias("n_risk")),
            "t",
        )
    )
    lq = F.floor(
        F.log(
            (F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk").cast("double")
        )
        * 1000000000
    ).cast("bigint")
    lnq = risk.withColumn("lq", lq)
    # the step table is bounded (distinct event hours ≤ horizon), so a
    # single ordered cumulative window over it is NOT a data-scale
    # SinglePartition — but keep the discipline anyway: shard it.
    cum_lq = sharded_prefix_sums(
        lnq.withColumn("lqd", F.col("lq").cast("decimal(38,0)")), ["t"], ["lqd"]
    )
    return (
        cum_lq.select(
            F.col("t").alias("hours"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").alias("n_events"),
            F.round(
                F.exp(F.col("cum_lqd").cast("double") / 1000000000), 6
            ).alias("survival"),
        )
        .orderBy("hours")
    )


@register(
    "stats_pca_2d",
    oracle="""
    WITH q AS (
      SELECT CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1024) AS BIGINT) AS x,
             CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * 1024) AS BIGINT) AS y
      FROM embeddings
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx, CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
      FROM q
    ), cov AS (
      SELECT n,
             (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / (n - 1) / 1048576 AS a,
             (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / (n - 1) / 1048576 AS c,
             (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / (n - 1) / 1048576 AS b
      FROM s
    )
    SELECT n,
           ROUND((a + c + SQRT(POWER(a - c, 2) + 4 * b * b)) / 2, 6) AS lambda1,
           ROUND((a + c - SQRT(POWER(a - c, 2) + 4 * b * b)) / 2, 6) AS lambda2,
           ROUND(ATAN2(2 * b, a - c) / 2, 6) AS principal_angle,
           ROUND((a + c + SQRT(POWER(a - c, 2) + 4 * b * b))
                 / (2 * (a + c)), 6) AS explained_ratio
    FROM cov
    """,
)
def stats_pca_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form 2-D PCA over the first two embedding dimensions:
    the covariance matrix accumulates as exact quantized-integer
    co-sums (one map-side-combinable agg — the ts_rolling_corr co-sum
    discipline), and the eigendecomposition of the symmetric 2×2 is
    the closed form λ± = ((a+c) ± √((a−c)² + 4b²))/2 with principal
    angle atan2(2b, a−c)/2 — six doubles computed from five exact
    scalars, no iteration, no per-partition float order anywhere.
    The production path for d×d PCA at 100 TB is the same shape:
    one pass for d(d+1)/2 exact co-sums, eigen-solve on the driver."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        F.floor(F.col("embedding").getItem(0).cast("double") * 1024)
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("embedding").getItem(1).cast("double") * 1024)
        .cast("bigint")
        .alias("y"),
    )
    s = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).cast("decimal(38,0)").alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    a = (
        (F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n"))
        / (F.col("n") - 1) / 1048576
    )
    c = (
        (F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n"))
        / (F.col("n") - 1) / 1048576
    )
    b = (
        (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n"))
        / (F.col("n") - 1) / 1048576
    )
    disc = F.sqrt(F.pow(a - c, 2) + 4 * b * b)
    return s.select(
        F.col("n").alias("n"),
        F.round((a + c + disc) / 2, 6).alias("lambda1"),
        F.round((a + c - disc) / 2, 6).alias("lambda2"),
        F.round(F.atan2(2 * b, a - c) / 2, 6).alias("principal_angle"),
        F.round((a + c + disc) / (2 * (a + c)), 6).alias("explained_ratio"),
    )


@register(
    "stats_spearman",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS sp
      FROM orders GROUP BY o_custkey
    ), j AS (
      SELECT c_nationkey AS nk, c_acctbal AS x, COALESCE(sp, 0) AS y
      FROM customer LEFT JOIN spend ON c_custkey = o_custkey
    ), r AS (
      SELECT nk,
             2 * RANK() OVER (PARTITION BY nk ORDER BY x)
               + COUNT(*) OVER (PARTITION BY nk, x) - 1 AS rx,
             2 * RANK() OVER (PARTITION BY nk ORDER BY y)
               + COUNT(*) OVER (PARTITION BY nk, y) - 1 AS ry
      FROM j
    ), s AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
             SUM(rx * ry) AS sxy
      FROM r GROUP BY nk
    )
    SELECT CAST(nk AS BIGINT) AS nationkey, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(FLOOR(CAST(n * sxy - sx * sy AS DOUBLE)
                        / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                           * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                        * 1000000 + 0.5) AS BIGINT) / 1000000.0
           ELSE 0.0 END AS spearman_rs
    FROM s
    ORDER BY nationkey
    """,
)
def stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per nation between customer account
    balance and realized spend — the tie-correct form: average ranks
    (encoded as the INTEGER 2·RANK + tiecount − 1, exact in any
    engine) fed through Pearson-on-ranks with the agg_corr_matrix
    co-sum discipline (decimal(38,0) sums, one closed-form IEEE
    sequence, half-up 6-decimal round). The 6Σd² shortcut would be
    biased here — the zero-spend customers tie heavily. Plan: one
    spend hash agg + one key join, then BOTH rank windows and both
    peer-count frames ride ONE nation exchange (two sorts, no second
    shuffle — the peer count is a rangeBetween(0,0) frame over the
    same sort, not a (nation,value) repartition); co-sums are one
    hash agg. 100 TB: rank windows partition by nation (bounded
    fan-in per key is the usual caveat; per-group cardinality here is
    corpus/25), everything shipped between workers is 6 numbers per
    nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("sp")
    )
    j = (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_acctbal").alias("x"),
            F.coalesce("sp", F.lit(0)).alias("y"),
        )
    )
    wx = Window.partitionBy("nk").orderBy("x")
    wy = Window.partitionBy("nk").orderBy("y")
    r = j.select(
        "nk",
        (2 * F.rank().over(wx)
         + F.count(F.lit(1)).over(wx.rangeBetween(0, 0)) - 1).alias("rx"),
        (2 * F.rank().over(wy)
         + F.count(F.lit(1)).over(wy.rangeBetween(0, 0)) - 1).alias("ry"),
    )
    D = "decimal(38,0)"
    rx, ry = F.col("rx").cast(D), F.col("ry").cast(D)
    s = r.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(rx).alias("sx"),
        F.sum(ry).alias("sy"),
        F.sum(rx * rx).alias("sxx"),
        F.sum(ry * ry).alias("syy"),
        F.sum(rx * ry).alias("sxy"),
    )
    n = F.col("n").cast(D)
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    rs = F.floor(
        cov.cast("double")
        / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double")))
        * 1000000
        + F.lit(0.5)
    ).cast("bigint") / 1000000.0
    return s.select(
        F.col("nk").cast("bigint").alias("nationkey"),
        "n",
        F.when((varx > 0) & (vary > 0), rs).otherwise(F.lit(0.0)).alias("spearman_rs"),
    ).orderBy("nationkey")


@register(
    "stats_anova_oneway",
    oracle="""
    WITH q AS (
      SELECT c_nationkey AS nk,
             CAST(FLOOR(CAST(c_acctbal AS DOUBLE) * 1024) AS BIGINT) AS v
      FROM customer
    ), g AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS qq
      FROM q GROUP BY nk
    ), packed AS (
      SELECT list_sort(list({'nk': nk, 'n': n, 's': s, 'qq': qq})) AS gs,
             CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(s) AS BIGINT) AS ss,
             CAST(SUM(qq) AS BIGINT) AS qt,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g
    ), t AS (
      SELECT k, nn,
             list_reduce(list_prepend(0.0,
               list_transform(gs, x -> CAST(x.s AS DOUBLE) * CAST(x.s AS DOUBLE)
                                        / CAST(x.n AS DOUBLE))),
               (a, b) -> a + b) AS t1,
             CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) AS t0,
             CAST(qt AS DOUBLE) AS qtd
      FROM packed
    )
    SELECT k, nn AS n_total,
           CAST(FLOOR((t1 - t0) / 1048576 * 1000 + 0.5) AS BIGINT) / 1000.0 AS ssb,
           CAST(FLOOR((qtd - t1) / 1048576 * 1000 + 0.5) AS BIGINT) / 1000.0 AS ssw,
           CAST(FLOOR(((t1 - t0) / (k - 1)) / ((qtd - t1) / (nn - k))
                      * 1000000 + 0.5) AS BIGINT) / 1000000.0 AS f_stat
    FROM t
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F over account balance by nation — the k-group
    generalization of stats_welch_ttest: per-group sufficient stats
    (n, Σv, Σv²) accumulate as EXACT integers (values quantized once
    by the power-of-two 1024), and the only float work is the final
    closed form. The between-group term Σ S_i²/n_i is a float fold
    over k groups, so it runs in PINNED KEY ORDER: the 25 bounded
    group rows collect into one sorted array and fold via a
    higher-order reduce — the identical IEEE sequence on both engines
    (the bounded-group-fold discipline). SS values are reported in
    original units (÷1024², half-up 3dp) and F at 6dp. Plan: one hash
    agg (map-side combined sufficient stats), one 25-row collect into
    a single-row frame — nothing corpus-sized crosses the driver."""
    cust = load_table(spark, sf_dir, "customer")
    q = cust.select(
        F.col("c_nationkey").alias("nk"),
        F.floor(F.col("c_acctbal").cast("double") * 1024).cast("bigint").alias("v"),
    )
    g = q.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("qq"),
    )
    packed = g.agg(
        F.sort_array(F.collect_list(F.struct("nk", "n", "s", "qq"))).alias("gs"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
        F.sum("qq").cast("bigint").alias("qt"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    t1 = F.aggregate(
        F.col("gs"),
        F.lit(0.0),
        lambda a, x: a + x["s"].cast("double") * x["s"].cast("double") / x["n"].cast("double"),
    )
    t = packed.select(
        "k",
        F.col("nn").alias("n_total"),
        t1.alias("t1"),
        (F.col("ss").cast("double") * F.col("ss").cast("double") / F.col("nn").cast("double")).alias("t0"),
        F.col("qt").cast("double").alias("qtd"),
    )
    scale = 1024.0 * 1024.0
    return t.select(
        "k",
        "n_total",
        (F.floor((F.col("t1") - F.col("t0")) / scale * 1000 + F.lit(0.5)).cast("bigint") / 1000.0).alias("ssb"),
        (F.floor((F.col("qtd") - F.col("t1")) / scale * 1000 + F.lit(0.5)).cast("bigint") / 1000.0).alias("ssw"),
        (
            F.floor(
                ((F.col("t1") - F.col("t0")) / (F.col("k") - 1))
                / ((F.col("qtd") - F.col("t1")) / (F.col("n_total") - F.col("k")))
                * 1000000
                + F.lit(0.5)
            ).cast("bigint")
            / 1000000.0
        ).alias("f_stat"),
    )
