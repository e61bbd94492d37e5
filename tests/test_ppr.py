"""personalized_pagerank: pure-Python replay, trust semantics, seed guard."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_spark.graph.centrality import personalized_pagerank

# trusted cluster a->b->c->a, plus a "spam farm" x<->y pointing at itself
# and at z; only d (linked FROM the trusted cluster) bridges out
EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("x", "y"), ("y", "x"), ("x", "z"), ("y", "z"),
]
SEEDS = ["a"]


def _py_ppr(edges, seeds, d, iters):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    t = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    pr = dict(t)
    for _ in range(iters):
        mass = {v: 0.0 for v in nodes}
        for u, v in edges:
            mass[v] += pr[u] / out[u]
        dang = sum(pr[v] for v in nodes if v not in out)
        pr = {
            v: (1.0 - d) * t[v] + d * (mass[v] + dang * t[v]) for v in nodes
        }
    return pr


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_matches_pure_python_replay(spark):
    seeds = spark.createDataFrame([(s,) for s in SEEDS], "node string")
    out = {
        r["entity"]: r["pagerank"]
        for r in personalized_pagerank(
            _edges_df(spark, EDGES), seeds, iterations=5
        ).collect()
    }
    exp = _py_ppr(EDGES, set(SEEDS), 0.85, 5)
    assert set(out) == set(exp)
    for v in exp:
        assert out[v] == pytest.approx(exp[v], abs=1e-12), v


def test_trust_does_not_reach_spam_farm(spark):
    seeds = spark.createDataFrame([(s,) for s in SEEDS], "node string")
    out = {
        r["entity"]: r["pagerank"]
        for r in personalized_pagerank(
            _edges_df(spark, EDGES), seeds, iterations=8
        ).collect()
    }
    # x/y/z are unreachable from the seed: zero trust mass
    assert out["x"] == out["y"] == out["z"] == 0.0
    # trust-reachable nodes all positive; mass sums to 1
    assert all(out[v] > 0 for v in "abcd")
    assert sum(out.values()) == pytest.approx(1.0, abs=1e-9)


def test_no_seed_in_graph_raises(spark):
    seeds = spark.createDataFrame([("nope",)], "node string")
    with pytest.raises(ValueError, match="no seed"):
        personalized_pagerank(_edges_df(spark, EDGES), seeds)
