"""Tests for knn_classify, taxonomy_closure, maximal_independent_set."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ai_knowledge_graph_spark.graph.walks import maximal_independent_set
from ai_knowledge_graph_spark.operators.hearst import taxonomy_closure
from ai_knowledge_graph_spark.operators.similarity import knn_classify


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- knn_classify ---------------------------------------------------------


def test_knn_majority_vote(spark):
    # two tight clusters on orthogonal axes; queries sit inside each
    cands = [
        (10, [1.0, 0.05], 1), (11, [1.0, -0.05], 1), (12, [1.0, 0.02], 1),
        (20, [0.05, 1.0], 2), (21, [-0.05, 1.0], 2), (22, [0.02, 1.0], 2),
    ]
    queries = [(0, [1.0, 0.0], -1), (1, [0.0, 1.0], -1)]
    cdf = spark.createDataFrame(cands, ["vec_id", "embedding", "label"])
    qdf = spark.createDataFrame(queries, ["vec_id", "embedding", "label"])
    got = {
        r["query_id"]: (r["predicted_label"], r["votes"])
        for r in knn_classify(cdf, qdf, k=3).collect()
    }
    assert got == {0: (1, 3), 1: (2, 3)}


def test_knn_tie_breaks_to_smaller_label(spark):
    # query equidistant from two label-5 and two label-3 neighbors at k=4
    cands = [
        (1, [1.0, 0.1], 5), (2, [1.0, -0.1], 5),
        (3, [0.1, 1.0], 3), (4, [-0.1, 1.0], 3),
    ]
    qdf = spark.createDataFrame([(0, [1.0, 1.0], -1)], ["vec_id", "embedding", "label"])
    cdf = spark.createDataFrame(cands, ["vec_id", "embedding", "label"])
    got = knn_classify(cdf, qdf, k=4).collect()
    assert len(got) == 1
    assert got[0]["predicted_label"] == 3
    assert got[0]["votes"] == 2


# --- taxonomy_closure -----------------------------------------------------


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        [(a, b, "such_as", s, 1) for a, b, s in rows],
        ["hyponym", "hypernym", "pattern", "support", "n_docs"],
    )


def test_taxonomy_closure_chains(spark):
    pairs = _pairs_df(spark, [("dog", "canine", 3), ("canine", "animal", 2),
                              ("cat", "feline", 5), ("feline", "animal", 4)])
    got = {
        (r["hyponym"], r["hypernym"]): (r["depth"], r["support"])
        for r in taxonomy_closure(pairs, depth=2).collect()
    }
    assert got[("dog", "animal")] == (2, 2)   # min(3,2)
    assert got[("cat", "animal")] == (2, 4)   # min(5,4)
    assert got[("dog", "canine")] == (1, 3)
    assert len(got) == 6


def test_taxonomy_closure_direct_edge_keeps_depth_1(spark):
    pairs = _pairs_df(spark, [("a", "b", 1), ("b", "c", 1), ("a", "c", 7)])
    got = {
        (r["hyponym"], r["hypernym"]): (r["depth"], r["support"])
        for r in taxonomy_closure(pairs, depth=2).collect()
    }
    assert got[("a", "c")] == (1, 7)  # not re-derived at depth 2
    assert len(got) == 3


def test_taxonomy_closure_cycle_drops_self_pair(spark):
    pairs = _pairs_df(spark, [("x", "y", 2), ("y", "x", 2)])
    got = taxonomy_closure(pairs, depth=2).collect()
    assert {(r["hyponym"], r["hypernym"]) for r in got} == {("x", "y"), ("y", "x")}


def test_taxonomy_closure_max_support_across_derivations(spark):
    # a->c via b1 (min 1) and via b2 (min 4): keep 4
    pairs = _pairs_df(spark, [("a", "b1", 1), ("b1", "c", 9),
                              ("a", "b2", 4), ("b2", "c", 6)])
    got = {
        (r["hyponym"], r["hypernym"]): (r["depth"], r["support"])
        for r in taxonomy_closure(pairs, depth=2).collect()
    }
    assert got[("a", "c")] == (2, 4)


def test_taxonomy_closure_sums_pattern_support(spark):
    df = spark.createDataFrame(
        [("d", "e", "such_as", 2, 1), ("d", "e", "other", 3, 1)],
        ["hyponym", "hypernym", "pattern", "support", "n_docs"],
    )
    got = taxonomy_closure(df, depth=2).collect()
    assert len(got) == 1 and got[0]["support"] == 5


# --- maximal_independent_set ----------------------------------------------


def _py_mis(edges, rounds):
    und: dict[str, set] = {}
    for a, b in set(edges):
        if a == b:
            continue
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    active = set(und)
    states = {}
    for r in range(rounds):
        pri = {n: (_md5(f"{n}\x1f{r}"), n) for n in active}
        selected = {
            n for n in active
            if all(pri[n] < pri[v] for v in und[n] if v in active)
        }
        dominated = {
            v for n in selected for v in und[n] if v in active
        } - selected
        for n in selected:
            states[n] = "in"
        for n in dominated:
            states[n] = "out"
        active -= selected | dominated
    for n in active:
        states[n] = "undecided"
    return sorted(states.items())


MIS_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a"),  # 5-cycle
    ("f", "g"),
    ("h", "a"), ("h", "c"),
]


def test_mis_matches_python_replay(spark):
    edges = spark.createDataFrame(MIS_EDGES, ["src", "dst"])
    got = sorted(
        (r["node"], r["state"])
        for r in maximal_independent_set(edges, rounds=4).collect()
    )
    assert got == _py_mis(MIS_EDGES, 4)


def test_mis_is_independent_and_dominating(spark):
    edges = spark.createDataFrame(MIS_EDGES, ["src", "dst"])
    rows = maximal_independent_set(edges, rounds=6).collect()
    state = {r["node"]: r["state"] for r in rows}
    und = {}
    for a, b in MIS_EDGES:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    ins = {n for n, s in state.items() if s == "in"}
    # independence: no two elected nodes adjacent
    for n in ins:
        assert not (und[n] & ins)
    # every decided-out node has an elected neighbor
    for n, s in state.items():
        if s == "out":
            assert und[n] & ins
    # each node appears exactly once
    assert len(rows) == len(state)
