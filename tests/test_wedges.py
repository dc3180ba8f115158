"""Unit tests for operators/wedges.py on graphs with known triangle
counts — the operator API extracted in r9 so triangle counting runs on
arbitrary edge lists (the registered queries pin the TPC-H co-purchase
extraction; these pin the algorithm itself)."""

from __future__ import annotations

import itertools

import pytest

from fairy_spark.operators.wedges import triangle_summary, triangle_summary_capped


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edges], "u BIGINT, v BIGINT"
    ).distinct()


def test_k5_clique_has_ten_triangles(spark):
    # K5: C(5,3) = 10 triangles, C(5,2) = 10 edges
    edges = list(itertools.combinations(range(5), 2))
    row = triangle_summary(_pairs_df(spark, edges)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 10, 10)


def test_capped_equals_uncapped_on_wheel(spark):
    # wheel W8: hub 0 + 8-cycle rim -> 8 triangles, every one through
    # the hub or a rim corner; cap=1 forces EVERY middle with any
    # wedge through the hub residual pass — counts must still agree
    rim = [(i, i % 8 + 1) for i in range(1, 9)]
    spokes = [(0, i) for i in range(1, 9)]
    pairs = _pairs_df(spark, rim + spokes)
    plain = triangle_summary(pairs).collect()[0]
    capped = triangle_summary_capped(pairs, cap=1).collect()[0]
    assert plain.n_triangles == 8
    assert capped.n_triangles == 8
    assert capped.n_tri_low + capped.n_tri_hub == capped.n_triangles
    assert capped.n_hubs > 0  # cap=1 must actually route middles


@pytest.mark.parametrize("cap", [0, 4096])
def test_triangle_free_bipartite(spark, cap):
    # K3,3 is triangle-free at any cap
    edges = [(a, b + 10) for a in range(3) for b in range(3)]
    row = triangle_summary_capped(_pairs_df(spark, edges), cap=cap).collect()[0]
    assert row.n_triangles == 0
    assert row.n_edges == 9
