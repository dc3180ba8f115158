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


def test_auto_selector_picks_by_wedge_count(spark):
    # K5: 5 middles with wedge product, total wedge rows = Σ indeg·outdeg;
    # with the default 1e8 threshold auto must pick 'plain', and with a
    # forced threshold of 0 it must pick 'capped' — same count both ways
    from fairy_spark.operators.wedges import (
        triangle_summary_auto,
        wedge_row_count,
    )

    edges = list(itertools.combinations(range(5), 2))
    pairs = _pairs_df(spark, edges)
    plain_row = triangle_summary_auto(pairs).collect()[0]
    assert plain_row.plan == "plain" and plain_row.n_triangles == 10
    capped_row = triangle_summary_auto(pairs, wedge_threshold=0).collect()[0]
    assert capped_row.plan == "capped" and capped_row.n_triangles == 10
    # the reported wedge count equals the independent O(m) agg
    from fairy_spark.operators.wedges import orient_edges

    n_wedges = wedge_row_count(orient_edges(pairs)).collect()[0]["n_wedges"]
    assert plain_row.n_wedges == n_wedges == capped_row.n_wedges
    # K5 oriented: out-degrees (4,3,2,1,0) by orientation, wedges = sum
    # over middles of indeg*outdeg = 1*3 + 2*2 + 3*1 = 10
    assert n_wedges == 10


def test_wedge_row_count_empty_graph(spark):
    from fairy_spark.operators.wedges import orient_edges, wedge_row_count

    pairs = _pairs_df(spark, [(1, 2)])  # single edge: no middle
    assert wedge_row_count(orient_edges(pairs)).collect()[0]["n_wedges"] == 0
