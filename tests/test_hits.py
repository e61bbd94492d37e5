"""hits(): exact replay vs a pure-Python reference, nx ordering sanity."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_spark.graph.centrality import hits

EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
    ("d", "c"), ("e", "c"), ("e", "b"), ("a", "c"),  # parallel edge
]


def _py_hits(edges, iterations):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {v: 1.0 / len(nodes) for v in nodes}
    auth = dict(hub)
    for _ in range(iterations):
        auth = {v: 0.0 for v in nodes}
        for u, v in edges:
            auth[v] += hub[u]
        s = sum(auth.values()) or 1.0
        auth = {v: x / s for v, x in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for u, v in edges:
            hub[u] += auth[v]
        s = sum(hub.values()) or 1.0
        hub = {v: x / s for v, x in hub.items()}
    return hub, auth


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_matches_pure_python_replay(spark):
    out = {r["entity"]: r for r in hits(_edges_df(spark, EDGES), iterations=5).collect()}
    hub, auth = _py_hits(EDGES, 5)
    assert set(out) == set(hub)
    for v in hub:
        assert out[v]["hub"] == pytest.approx(hub[v], abs=1e-9)
        assert out[v]["authority"] == pytest.approx(auth[v], abs=1e-9)


def test_converges_to_fixed_point_ordering(spark):
    # 40 synchronous sweeps must reach the same hub/authority ordering as
    # the fully-converged power iteration (nx.hits needs scipy, absent
    # here; 200 pure-Python sweeps converge far below 1e-12 on 5 nodes)
    out = {
        r["entity"]: r
        for r in hits(_edges_df(spark, EDGES), iterations=40).collect()
    }
    hub, auth = _py_hits(EDGES, 200)
    assert sorted(out, key=lambda v: (-out[v]["authority"], v)) == sorted(
        auth, key=lambda v: (-auth[v], v)
    )
    assert sorted(out, key=lambda v: (-out[v]["hub"], v)) == sorted(
        hub, key=lambda v: (-hub[v], v)
    )
    # c is pointed at by everything -> top authority; a points at b and c
    # (twice) -> top hub
    assert max(out, key=lambda v: out[v]["authority"]) == "c"
    assert max(out, key=lambda v: out[v]["hub"]) == "a"


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert hits(df).count() == 0
