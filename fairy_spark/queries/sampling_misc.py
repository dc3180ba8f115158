"""Deterministic sampling, string aggregation, unpivot (SURVEY.md §2.B misc surface).

Sampling note: ``df.sample`` draws from a per-partition RNG — not
reproducible across engines or even across partition layouts, so it
can never be oracle-checked. The engine's reproducible sample is
HASH-MOD sampling (filter on a stable content hash), the same
technique used to carve deterministic held-out splits in training-data
pipelines; at 100 TB it's a pushable filter — no extra pass, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fairy_spark.queries import register
from fairy_spark.sources.tables import load_table


@register(
    "sample_hash_mod",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE SUBSTR(MD5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 1)
          IN ('0', '1')
    ORDER BY l_orderkey, l_linenumber
    """,
)
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~1/8 deterministic sample keyed on row identity via md5 — both
    engines compute identical lowercase-hex md5, so the sampled SET
    (not just its size) is oracle-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.filter(F.substring(F.md5(key), 1, 1).isin("0", "1"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect → sort_array → join. The
    sort_array wrap is the determinism discipline — collect_list order
    is partition-arrival order, never rely on it."""
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


@register(
    "fn_unpivot",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS measure, ROUND(p_retailprice, 6) AS val
    FROM part WHERE p_size > 40
    UNION ALL
    SELECT p_partkey, 'p_size' AS measure, ROUND(CAST(p_size AS DOUBLE), 6) AS val
    FROM part WHERE p_size > 40
    ORDER BY p_partkey, measure
    """,
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long via the native unpivot (Expand node: one pass, no
    self-union re-scan of the source)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return (
        p.select(
            "p_partkey",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
            F.col("p_size").cast("double").alias("p_size"),
        )
        .unpivot("p_partkey", ["p_retailprice", "p_size"], "measure", "raw")
        .select("p_partkey", "measure", F.round("raw", 6).alias("val"))
        .orderBy("p_partkey", "measure")
    )


@register(
    "fn_id_provenance",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           TRUE AS ids_unique,
           TRUE AS files_tagged
    FROM orders
    """,
)
def fn_id_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """monotonically_increasing_id + input_file_name invariants (the
    last lightly-exercised SURVEY §2.B scalar pair). The ids are
    nondeterministic VALUES (partition-indexed), so the oracle checks
    the INVARIANTS instead: ids are globally unique across partitions
    and every row carries a non-empty source-file tag."""
    o = load_table(spark, sf_dir, "orders").select(
        F.monotonically_increasing_id().alias("mid"),
        F.input_file_name().alias("fname"),
    )
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count_distinct("mid") == F.count(F.lit(1))).alias("ids_unique"),
        F.min(F.length("fname") > 0).alias("files_tagged"),
    )


@register(
    "sample_hash_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             MD5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS h
      FROM lineitem
      ORDER BY h
      LIMIT 200
    )
    ORDER BY l_orderkey, l_linenumber
    """,
)
def sample_hash_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT-size uniform sample without replacement:
    the k rows with the smallest content hash. Complements
    sample_hash_mod (whose size is only proportional): hash-order
    top-k gives precisely k rows, reproducibly, engine-independently —
    the standard trick for fixed-size eval/holdout draws. Plans as
    TakeOrderedAndProject (per-partition heaps of k, no global sort),
    so the cost at 100 TB is one scan + k-row merges. The md5 key is
    unique per row identity, so the selected SET has no tie
    ambiguity."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.select(
            "l_orderkey", "l_linenumber", "l_quantity", F.md5(key).alias("h")
        )
        .orderBy("h")
        .limit(200)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "sample_weighted_topk",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             CAST(concat('0x', substr(md5(concat('wsample', ':', CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) AS hv
      FROM documents
    ), k AS (
      SELECT doc_id, n_chars,
             CAST(floor(ln((CAST(hv AS DOUBLE) + 1.0) / 1152921504606846977.0)
                        / n_chars * 1000000000) AS BIGINT) AS kf
      FROM h
    )
    SELECT doc_id, n_chars, kf
    FROM k
    ORDER BY kf DESC, doc_id
    LIMIT 20
    """,
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, A-Res style (Efraimidis &
    Spirakis 2006, public): each row draws u = hash-uniform in (0,1]
    and competes on key u^(1/weight); the top-k keys are the sample —
    heavier rows (weight = n_chars) win proportionally more often, and
    the draw is a pure function of the stable id (reproducible across
    engines, re-runs, and partitionings, unlike rand()). The sort key
    is fixed-pointed as floor(ln(u)/w · 1e9) — monotone in u^(1/w), so
    ranking by it is ranking by the real key, but it is an exact
    bigint on both engines. Top-k plans as TakeOrderedAndProject
    (per-partition heaps, no global sort) — the 100 TB shape."""
    from fairy_spark.operators.text import portable_hash64

    d = load_table(spark, sf_dir, "documents")
    u = (
        portable_hash64(F.col("doc_id").cast("string"), seed="wsample").cast("double")
        + 1.0
    ) / 1152921504606846977.0  # 2^60 + 1: open-zero uniform from the 60-bit hash
    kf = F.floor(F.log(u) / F.col("n_chars") * 1000000000).cast("bigint")
    return (
        d.select("doc_id", "n_chars", kf.alias("kf"))
        .orderBy(F.col("kf").desc(), "doc_id")
        .limit(20)
    )


# Poisson(1) CDF breakpoints scaled to 2^60 (floor(P(X<=k) * 2^60) for
# k = 0..5), precomputed once and embedded as identical literals in
# both engines — the stats_benford_digits shared-literal precedent.
# P(X>5) mass (~0.06%) is clamped to weight 6.
_POIS1_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
)
_POIS_B = 16


def _poisson_bootstrap_oracle() -> str:
    from fairy_spark.operators.text import portable_hash_sql

    u = portable_hash_sql("concat(CAST(o_orderkey AS VARCHAR), '#', CAST(b AS VARCHAR))", seed="boot")
    w = " + ".join(f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in _POIS1_T)
    return f"""
    WITH r AS (
      SELECT o_orderkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             UNNEST(generate_series(0, {_POIS_B - 1})) AS b
      FROM orders
    ), h AS (
      SELECT b, cents, {u} AS u FROM r
    ), wtd AS (
      SELECT b, cents, CAST({w} AS BIGINT) AS w FROM h
    )
    SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
           CAST(SUM(w * cents) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS mean_cents
    FROM wtd GROUP BY b
    HAVING SUM(w) > 0
    ORDER BY b
    """


@register("sample_poisson_bootstrap", oracle=_poisson_bootstrap_oracle())
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (Chamandy et al., Google 2012 — 'Estimating
    uncertainty for massive data streams'): the resampling scheme that
    actually works distributed, because each of the B=16 replicas
    draws an INDEPENDENT Poisson(1) weight per row from a pure hash of
    (row id, replica) — no global n needed, no coordination, one
    corpus scan fanned out ×B by an explode, then a map-side-combined
    weighted mean per replica. The spread of the 16 replica means IS
    the sampling distribution of the mean order value (CI half-width ≈
    2σ of these); weights come from inverse-CDF lookup against
    Poisson(1) breakpoints precomputed to 2^60 fixed-point and
    embedded as identical literals in both engines, so every replica
    mean is an exact integer (truncating DIV). rand() is never used —
    determinism across engines, retries, and partitionings is the
    whole point (the sample_hash_mod discipline at replica scale)."""
    from fairy_spark.operators.text import portable_hash64

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    r = o.select(
        "o_orderkey",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(_POIS_B - 1))).alias("b"),
    )
    u = portable_hash64(
        F.concat(
            F.col("o_orderkey").cast("string"), F.lit("#"), F.col("b").cast("string")
        ),
        seed="boot",
    )
    w = sum(
        (F.when(u >= F.lit(t), 1).otherwise(0) for t in _POIS1_T),
        F.lit(0),
    )
    wtd = r.select("b", "cents", w.cast("bigint").alias("w"))
    return (
        wtd.groupBy("b")
        .agg(
            F.sum("w").cast("bigint").alias("n_eff"),
            F.expr("CAST(SUM(w * cents) AS BIGINT) DIV CAST(SUM(w) AS BIGINT)").alias(
                "mean_cents"
            ),
        )
        # Guard the all-zero-weight replica (P ≈ e^-N — unreachable at
        # any real SF, but on a pathological fixture Spark DIV returns
        # NULL while DuckDB // raises; HAVING SUM(w) > 0 on both sides
        # makes the engines fail identically by dropping the replica).
        .filter(F.col("n_eff") > 0)
        .orderBy("b")
    )


@register(
    "scan_file_metadata",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           TRUE AS positions_unique,
           TRUE AS row_index_dense,
           TRUE AS file_sizes_positive
    FROM lineitem
    """,
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `_metadata` hidden column on file sources (Spark 3.5+):
    file_path / file_size / row_index — the provenance surface that
    gives every row a STABLE physical identity (file, index-in-file),
    unlike monotonically_increasing_id whose values depend on task
    scheduling. At 100 TB this is how reproducible per-file sampling,
    incremental re-reads, and corrupt-row triage address rows. The
    values are physical-layout-dependent, so the oracle checks the
    INVARIANTS (the fn_id_provenance discipline): (file, row_index)
    is a unique address for every row, row_index is DENSE 0..n_f-1
    within each file (no gaps — max == count-1 and min == 0), and
    every file reports a positive size."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.file_size").alias("fs"),
        F.col("_metadata.row_index").alias("ri"),
    )
    per_file = li.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("ri").alias("nd"),
        F.min("ri").alias("mn"),
        F.max("ri").alias("mx"),
        F.min("fs").alias("fs"),
    )
    return per_file.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.min((F.col("nd") == F.col("n"))).alias("positions_unique"),
        F.min((F.col("mn") == 0) & (F.col("mx") == F.col("n") - 1)).alias(
            "row_index_dense"
        ),
        F.min(F.col("fs") > 0).alias("file_sizes_positive"),
    )
