"""Connected components over a pair graph — dedup clustering.

MinHash-LSH emits near-dup PAIRS; deduplication needs CLUSTERS (keep
one survivor per group of transitively-similar docs). This is the
min-label-propagation algorithm as iterative DataFrame steps:

  label(v) ← min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each iteration is one shuffle (join on edge
endpoint + groupBy min); iteration count is bounded by the cluster
diameter, which for near-dup graphs is tiny (dup clusters are dense —
most converge in 2-3 rounds). Deterministic: labels are doc ids, min
is order-free.

Scale notes: this is the Pregel pattern expressed in DataFrames — the
same shape GraphX/GraphFrames use. Each round materializes its label
table via localCheckpoint (flat LogicalRDD plans — r14: the persist
form nested every prior round's plan and left the final frame in the
CacheManager, taxing every later action; see operators/pool.py); the
edge table is materialized once and re-used across rounds. The
driver-side loop only reads ONE scalar per round (the converged?
count) — no row data leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id reachable. Isolated nodes don't appear (callers union
    non-paired ids back if needed)."""
    # r14: per-round materialization via localCheckpoint instead of
    # persist. Each persisted round's logical plan nested every prior
    # round (O(rounds²) plan nodes) and the FINAL labels frame stayed
    # registered in the session CacheManager forever — every later
    # action in the session paid plan comparison against it
    # (operators/pool.py has the measured cost). localCheckpoint cuts
    # each round to a LogicalRDD leaf: same one-shuffle rounds, flat
    # plans, no CacheManager entry. Iteration count and values are
    # unchanged — the checkpoint is a boundary, not a semantic.
    # r14 (guide §1.2 step 1): symmetrize with ONE evaluation of
    # `pairs` — the union's two selects each re-ran the whole pair
    # build (for the dedup queries that is the LSH band join + exact
    # Jaccard verify, the query's dominant cost). explode over the
    # two orientations emits the identical row multiset from a single
    # pass; distinct and everything downstream are unchanged.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate labels: own, plus each neighbor's current label
        neighbor = (
            edges.join(labels, edges.v == labels.node)
            .select(F.col("u").alias("node"), F.col("comp"))
        )
        new_labels = (
            labels.select("node", "comp")
            .unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """One surviving id per near-dup cluster (the min id), plus all
    never-paired docs — the final output of the LSH dedup pipeline."""
    comp = connected_components(pairs)
    survivors_in_clusters = comp.groupBy("comp").agg(F.min("node").alias(id_col)).select(id_col)
    paired = comp.select(F.col("node").alias(id_col))
    unpaired = docs.select(id_col).join(paired, id_col, "left_anti")
    return survivors_in_clusters.unionByName(unpaired).distinct()
