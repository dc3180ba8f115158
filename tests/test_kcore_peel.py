"""Gate for the r14 graph_kcore early-exit: the bounded peel loop with
the fixpoint check must match the full R-round unroll bit-for-bit on
graphs that GENUINELY peel for several rounds (the testdata co-purchase
graph converges at round 0, so the registry parity gate alone never
exercises the keep-peeling branch)."""

from __future__ import annotations

from pyspark.sql import Row

from fairy_spark.queries.graph import _kcore_peel


def _run(spark, edge_list, k, rounds, early_exit):
    rows = [Row(u=u, v=v) for u, v in edge_list]
    edges = spark.createDataFrame(rows, "u INT, v INT").localCheckpoint(
        eager=True
    )
    keep, cur = _kcore_peel(edges, k, rounds, early_exit=early_exit)
    keep_set = {r["node"] for r in keep.collect()}
    edge_set = {(r["u"], r["v"]) for r in cur.collect()}
    return keep_set, edge_set


def _model_peel(edge_list, k, rounds):
    """Obviously-correct Python replay of the full R-round peel."""
    cur = set(edge_list)
    keep = None
    for _ in range(rounds):
        deg: dict[int, int] = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        cur = {(u, v) for u, v in cur if u in keep and v in keep}
    return keep, cur


# a tail that peels one edge per round into a 4-cycle core: round r
# removes exactly one tail edge, so every round changes the edge set
# until the cycle remains — the geometry the early-exit must survive
TAIL_INTO_CYCLE = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 3)]
# a pure path: peels from both ends and goes EMPTY before R runs out
PATH = [(i, i + 1) for i in range(8)]
# two triangles sharing a node: already a 2-core everywhere (fixpoint
# at round 0 — the branch the testdata graph exercises)
TRIANGLES = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]


def test_early_exit_matches_full_unroll(spark):
    for edges, k, rounds in [
        (TAIL_INTO_CYCLE, 2, 6),
        (PATH, 2, 6),
        (TRIANGLES, 2, 6),
        (TAIL_INTO_CYCLE, 3, 4),
    ]:
        fast = _run(spark, edges, k, rounds, early_exit=True)
        full = _run(spark, edges, k, rounds, early_exit=False)
        assert fast == full, (edges, k, rounds)
        # and both match the Python model
        mk, mc = _model_peel(edges, k, rounds)
        assert fast[0] == mk and fast[1] == mc, (edges, k, rounds)


def test_early_exit_keeps_peeling_while_edges_drop(spark):
    # the tail-into-cycle graph loses exactly one edge per round for 3
    # rounds; the early exit must NOT stop before the cycle is clean
    keep, edge_set = _run(spark, TAIL_INTO_CYCLE, 2, 6, early_exit=True)
    assert keep == {3, 4, 5, 6}
    assert edge_set == {(3, 4), (4, 5), (5, 6), (6, 3)}
