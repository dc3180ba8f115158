"""Vector similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k for a bounded query set — broadcast
the queries, scan the corpus once, per-group top-k. That plan is
already the right one at 100 TB when |queries| is small: no crossJoin
of the corpus with itself, one scan, one shuffle for the per-query
top-k window.

Scale path: LSH-bucketed ANN (random-hyperplane signatures derived
from seeded portable hashes, so signatures are deterministic) —
candidates only within matching signature buckets.

Cosine is computed with an explicit left-fold in DOUBLE so DuckDB can
reproduce the exact same floating-point operation order (bit-identical
results → stable oracle hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from fairy_spark.operators.text import portable_hash64


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    da, db = _dvec(a), _dvec(b)
    return dot(da, db) / (norm(da) * norm(db))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (self-matches
    excluded). queries must be small — it is broadcast."""
    # Norms are precomputed per ROW, not per pair: each corpus vector
    # meets |queries| pairs (and vice versa), and norm() is an O(dims)
    # fold — hoisting it out of the join divides the HOF work per pair
    # by 3 (dot only). Numerically identical to computing inside the
    # pair: same fold over the same values, same division operands, so
    # the DuckDB oracle still matches bit-for-bit.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _dvec(F.col(vec_col)).alias("qvec"),
        norm(_dvec(F.col(vec_col))).alias("qnorm"),
    )
    # Repartition the corpus scan: the parquet input is few/small files
    # (1 partition) but the scoring work is |corpus|×|queries| folds —
    # spread it across the cluster before the broadcast join.
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _dvec(F.col(vec_col)).alias("nvec"),
        norm(_dvec(F.col(vec_col))).alias("nnorm"),
    ).repartition(par)
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.round(
                dot(F.col("qvec"), F.col("nvec"))
                / (F.col("qnorm") * F.col("nnorm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )


def hyperplane_signature(vec: Column, planes: int = 8, dims: int = 64) -> Column:
    """Deterministic random-hyperplane LSH signature (one bit per plane).
    Plane p's weight for dim d = portable_hash('p:d') scaled to [-1, 1] —
    reproducible everywhere, no RNG state (SURVEY.md §7.5)."""
    dv = _dvec(vec)
    bits = []
    for p in range(planes):
        # weight_d in [-1,1): (h % 2001 - 1000)/1000
        proj = F.aggregate(
            F.zip_with(
                dv,
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda x, d: x
                * (
                    (
                        F.pmod(
                            portable_hash64(F.concat(F.lit(f"hp{p}:"), d.cast("string"))),
                            F.lit(2001),
                        )
                        - 1000
                    ).cast("double")
                    / 1000.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket.
    Recall < 1 by design; tests assert recall vs brute force. The
    bucket join replaces the full scan with |bucket| work per query —
    the 100 TB path, where buckets are also the partitioning key."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        hyperplane_signature(F.col(vec_col), planes, dims).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        hyperplane_signature(F.col(vec_col), planes, dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("nvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos", "rn")
    )
