"""k_core: hand graph + networkx parity + peel-cascade behavior."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_spark.graph.centrality import k_core


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_triangle_with_tail(spark):
    # triangle a-b-c plus tail c-d-e: 2-core is exactly the triangle, and
    # the tail must peel CASCADING (e first, then d) — two rounds
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    out = {r["entity"]: r["core_degree"] for r in k_core(_edges_df(spark, edges), k=2).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}


def test_networkx_parity(spark):
    nx = pytest.importorskip("networkx")
    # deterministic pseudo-random graph: 40 nodes, hash-derived edges
    edges = sorted(
        {
            (f"n{(i * 7) % 40}", f"n{(i * i * 3 + i) % 40}")
            for i in range(160)
            if (i * 7) % 40 != (i * i * 3 + i) % 40
        }
    )
    g = nx.Graph()
    g.add_edges_from(edges)
    for k in (2, 3, 4):
        ours = {r["entity"]: r["core_degree"] for r in k_core(_edges_df(spark, edges), k=k).collect()}
        theirs = nx.k_core(g, k=k)
        assert set(ours) == set(theirs.nodes), k
        assert ours == {v: d for v, d in theirs.degree()}


def test_no_core_and_parallel_edges(spark):
    # a path has no 2-core; parallel/self edges must not inflate degrees
    edges = [("a", "b"), ("a", "b"), ("b", "a"), ("b", "c"), ("c", "c")]
    assert k_core(_edges_df(spark, edges), k=2).count() == 0
