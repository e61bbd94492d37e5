"""Tests for node2vec_walks, ktruss, url_templates."""

from __future__ import annotations

import hashlib

import pytest

from ai_knowledge_graph_spark.graph.walks import ktruss, node2vec_walks
from ai_knowledge_graph_spark.operators.webcrawl import url_templates


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- node2vec_walks ---------------------------------------------------------


def _py_n2v(edges, steps):
    adj: dict[str, list] = {}
    for s, d in set(edges):
        adj.setdefault(s, []).append(d)
    rows = []
    for start in sorted(adj):
        prev, node = "", start
        rows.append((start, 0, node))
        for t in range(1, steps + 1):
            nbrs = adj.get(node)
            if not nbrs:
                break
            nxt = min(
                nbrs,
                key=lambda v: ("1" if v == prev else "0")
                + _md5(f"{node}\x1f{t}\x1f{v}"),
            )
            prev, node = node, nxt
            rows.append((start, t, node))
    return sorted(rows)


N2V_EDGES = [
    ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "d"), ("d", "a"),
    ("p", "q"), ("q", "p"),  # 2-cycle: must backtrack (sole option)
]


def test_node2vec_matches_python_replay(spark):
    edges = spark.createDataFrame(N2V_EDGES, ["src", "dst"])
    got = sorted(tuple(r) for r in node2vec_walks(edges, steps=4).collect())
    assert got == _py_n2v(N2V_EDGES, 4)


def test_node2vec_never_backtracks_with_alternative(spark):
    # from a: a->b; at b neighbors {a, c}; must pick c (non-backtracking)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c")], ["src", "dst"]
    )
    rows = {
        (r["start"], r["step"]): r["node"]
        for r in node2vec_walks(edges, steps=2).collect()
    }
    assert rows[("a", 1)] == "b"
    assert rows[("a", 2)] == "c"


def test_node2vec_backtracks_when_sole_option(spark):
    edges = spark.createDataFrame([("p", "q"), ("q", "p")], ["src", "dst"])
    rows = {
        (r["start"], r["step"]): r["node"]
        for r in node2vec_walks(edges, steps=3).collect()
    }
    assert rows[("p", 1)] == "q"
    assert rows[("p", 2)] == "p"
    assert rows[("p", 3)] == "q"


# --- ktruss -----------------------------------------------------------------


def test_ktruss_peels_tail(spark):
    # triangle a-b-c plus a path edge c-d: the path edge has support 0
    # and is peeled; the triangle survives k=3 with support 1 each
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {
        (r["node_a"], r["node_b"]): r["support"]
        for r in ktruss(edges, k=3, rounds=3).collect()
    }
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


def test_ktruss_cascading_peel(spark):
    # two triangles sharing edge b-c, plus pendant triangle support:
    # k=4 requires support >= 2: only b-c has 2 initially; after peeling
    # the others, b-c loses its triangles too -> empty at fixpoint
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        ["src", "dst"],
    )
    assert ktruss(edges, k=4, rounds=4).count() == 0
    # k=3 keeps everything (each edge in >= 1 triangle)
    assert ktruss(edges, k=3, rounds=4).count() == 5


def test_ktruss_k4_clique_survives(spark):
    # K4: every edge sits in 2 triangles -> survives k=4
    nodes = ["w", "x", "y", "z"]
    edges = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b], ["src", "dst"]
    )
    got = ktruss(edges, k=4, rounds=4).collect()
    assert len(got) == 6
    assert all(r["support"] == 2 for r in got)


def test_ktruss_rejects_k2(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        ktruss(edges, k=2)


# --- url_templates ------------------------------------------------------------


def test_url_templates(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/p/1.html",),
            ("https://a.com/p/2.html",),
            ("https://a.com/p/30.html",),
            ("https://a.com/about.html",),
            ("https://b.com/p/1.html",),
        ],
        ["url"],
    )
    got = {
        (r["host"], r["template"]): (r["n_urls"], r["example_url"])
        for r in url_templates(pages).collect()
    }
    assert got[("a.com", "https://a.com/p/{n}.html")] == (
        3, "https://a.com/p/1.html",
    )
    assert got[("a.com", "https://a.com/about.html")] == (
        1, "https://a.com/about.html",
    )
    assert got[("b.com", "https://b.com/p/{n}.html")] == (
        1, "https://b.com/p/1.html",
    )
    assert len(got) == 3
