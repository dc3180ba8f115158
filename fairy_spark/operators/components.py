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
same shape GraphX/GraphFrames use. Each round persists its label table
and unpersists the previous one (bounded memory); the edge table is
re-used across rounds (persist once). The driver-side loop only reads
ONE scalar per round (the converged? count) — no row data leaves the
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    min node id reachable. Isolated nodes don't appear (callers union
    non-paired ids back if needed)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels.count()
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
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist(blocking=False)
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist(blocking=False)
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
