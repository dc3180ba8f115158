"""Triangle / wedge counting over ARBITRARY edge lists.

Extracted from the registered queries (fairy_spark/queries/graph.py
`graph_triangles` / `graph_triangles_capped`) so the same algorithms
run on any caller-supplied undirected pair set — the registered rows
hardwire the TPC-H co-purchase extraction, but a user's graph (or the
hub-cap benchmark's power-law fixture, SCALE.md r9) is just a
DataFrame of (u, v) pairs.

Algorithm: Schank & Wagner 2005 degree-ordered orientation — each
undirected edge points from its (degree, id)-smaller endpoint, so the
graph becomes a DAG where every triangle appears exactly once as
e1(a,b), e2(b,c), e3(a,c), and out-degree is capped at O(sqrt(m)).
The capped variant splits wedge enumeration by the middle node's
wedge product indeg*outdeg (see triangle_summary_capped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# One shared pool: a new graph computation evicts the previous one's
# persisted edge frame (same leak discipline as operators/dedup.py's
# signature index).
_PERSISTED: list = []

DEFAULT_HUB_CAP = 4096


def persist_edges(df: DataFrame) -> DataFrame:
    """Persist an edge frame that feeds several join inputs, evicting
    the previously persisted one."""
    from pyspark import StorageLevel

    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking=False)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    _PERSISTED.append(df)
    return df


def orient_edges(pairs: DataFrame) -> DataFrame:
    """(u, v) undirected distinct pairs -> (src, dst) degree-oriented
    DAG edges (src is the (degree, id)-smaller endpoint)."""
    deg = node_degrees(pairs)
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )


def node_degrees(pairs: DataFrame) -> DataFrame:
    """(node, d) undirected degree per node of the pair set."""
    return (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def triangle_summary(pairs: DataFrame) -> DataFrame:
    """(n_nodes, n_edges, n_triangles) — the plain oriented path join;
    wedge cost Sum over middles of indeg*outdeg <= O(m^1.5)."""
    deg = node_degrees(pairs)
    oriented = persist_edges(orient_edges(pairs))
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    summary = (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(F.broadcast(oriented.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(tri))
    )
    return summary.select("n_nodes", "n_edges", "n_triangles")


def triangle_summary_capped(pairs: DataFrame, cap: int = DEFAULT_HUB_CAP) -> DataFrame:
    """(n_nodes, n_edges, n_hubs, n_tri_low, n_tri_hub, n_triangles) —
    EXACT hub-capped triangle count. Wedge middles with
    indeg*outdeg > cap are routed to a residual pass that pivots the
    enumeration to fan out from the SOURCE's orientation-capped
    out-degree (hub-in edges x source out-edges, closing edge verified
    by a hash join); per hub the enumerated rows drop from
    indeg(b)*outdeg(b) to Sum over a in N_in(b) of outdeg(a). Every
    triangle has exactly one middle, routed to exactly one pass, so
    the two counts sum to the exact total (role-swapped candidates
    fail the closing-edge check because the orientation is a DAG)."""
    deg = node_degrees(pairs)
    oriented = persist_edges(orient_edges(pairs))
    outd = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ind = oriented.groupBy("dst").agg(F.count(F.lit(1)).alias("id_"))
    hubs = (
        deg.join(outd.withColumnRenamed("src", "node"), "node", "left")
        .join(ind.withColumnRenamed("dst", "node"), "node", "left")
        .filter(
            F.coalesce(F.col("od"), F.lit(0)) * F.coalesce(F.col("id_"), F.lit(0))
            > cap
        )
        .select("node")
    )
    # low pass: path join keyed on non-hub middles
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e1_low = e1.join(hubs.withColumnRenamed("node", "b"), "b", "left_anti")
    e1_hub = e1.join(hubs.withColumnRenamed("node", "b"), "b", "left_semi")
    e2 = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri_low = e1_low.join(e2, "b").join(e3, ["a", "c"]).agg(
        F.count(F.lit(1)).alias("n_tri_low")
    )
    # hub residual: fan out from the source's orientation-capped
    # out-degree, then verify the hub->c closing edge
    cand = e1_hub.join(e3, "a")  # (a, b hub, c) from a's out-wedge
    tri_hub = cand.join(e2, ["b", "c"]).agg(F.count(F.lit(1)).alias("n_tri_hub"))
    summary = (
        deg.agg(F.count(F.lit(1)).alias("n_nodes"))
        .crossJoin(F.broadcast(oriented.agg(F.count(F.lit(1)).alias("n_edges"))))
        .crossJoin(F.broadcast(hubs.agg(F.count(F.lit(1)).alias("n_hubs"))))
        .crossJoin(F.broadcast(tri_low))
        .crossJoin(F.broadcast(tri_hub))
    )
    return summary.select(
        "n_nodes",
        "n_edges",
        "n_hubs",
        "n_tri_low",
        "n_tri_hub",
        (F.col("n_tri_low") + F.col("n_tri_hub")).alias("n_triangles"),
    )
