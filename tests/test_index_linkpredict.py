"""Tests for inverted_index and link_predict."""

from __future__ import annotations

import math

from ai_knowledge_graph_spark.graph.kgops import link_predict
from ai_knowledge_graph_spark.operators.ranking import inverted_index


def test_inverted_index_postings(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog")],
        ["doc_id", "text"],
    )
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["positions"], r["df"], r["cf"])
        for r in inverted_index(docs).collect()
    }
    assert got[("the", 1)] == (2, "0,4", 2, 3)
    assert got[("the", 2)] == (1, "0", 2, 3)
    assert got[("cat", 1)] == (1, "1", 1, 1)
    assert got[("mat", 1)] == (1, "5", 1, 1)
    assert got[("dog", 2)] == (1, "1", 1, 1)
    assert len(got) == 7  # the(x2) cat sat on mat dog


def test_inverted_index_positions_sorted(spark):
    docs = spark.createDataFrame([(1, "b a b a b")], ["doc_id", "text"])
    got = {r["term"]: r["positions"] for r in inverted_index(docs).collect()}
    assert got == {"b": "0,2,4", "a": "1,3"}


def _spo(spark, pairs):
    return spark.createDataFrame(
        [(a, "rel", b) for a, b in pairs], ["subject", "predicate", "object"]
    )


def test_link_predict_wedge(spark):
    # star: hub z connects a,b,c; a-b also direct. Predicted: (a,c),(b,c).
    t = _spo(spark, [("z", "a"), ("z", "b"), ("z", "c"), ("a", "b")])
    got = {
        (r["node_a"], r["node_b"]): (r["common"], r["aa_micro"])
        for r in link_predict(t).collect()
    }
    w_z = round(1_000_000.0 / math.log(3))  # deg(z)=3
    assert got[("a", "c")] == (1, w_z)
    assert got[("b", "c")] == (1, w_z)
    assert ("a", "b") not in got  # already adjacent
    assert len(got) == 2


def test_link_predict_multiple_common_neighbors(spark):
    # a and b share z1 (deg 2) and z2 (deg 3: also connects c)
    t = _spo(spark, [("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2"), ("c", "z2")])
    got = {
        (r["node_a"], r["node_b"]): (r["common"], r["aa_micro"])
        for r in link_predict(t).collect()
    }
    w1 = round(1_000_000.0 / math.log(2))
    w2 = round(1_000_000.0 / math.log(3))
    assert got[("a", "b")] == (2, w1 + w2)
    # a-c and b-c share only z2
    assert got[("a", "c")] == (1, w2)
    assert got[("b", "c")] == (1, w2)


def test_link_predict_hub_cap(spark):
    # hub z (deg 3) dropped at max_hub_degree=2: no predictions remain
    t = _spo(spark, [("z", "a"), ("z", "b"), ("z", "c")])
    assert link_predict(t, max_hub_degree=2).count() == 0
    assert link_predict(t).count() == 3
