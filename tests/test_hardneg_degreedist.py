"""Tests for hard_negatives, degree_distribution."""

from __future__ import annotations

from ai_knowledge_graph_spark.graph.kgops import degree_distribution
from ai_knowledge_graph_spark.operators.ranking import hard_negatives


# --- hard_negatives ----------------------------------------------------------


def test_hard_negatives_anti_join(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id LONG, rank INT"
    )
    gold = spark.createDataFrame([(2,), (9,)], "doc_id LONG")
    got = {r["doc_id"]: r["lex_rank"] for r in hard_negatives(lex, gold).collect()}
    assert got == {1: 1, 3: 3}  # gold doc 2 removed, ranks preserved


def test_hard_negatives_empty_gold_keeps_all(spark):
    lex = spark.createDataFrame([(1, 1)], "doc_id LONG, rank INT")
    gold = spark.createDataFrame([], "doc_id LONG")
    assert hard_negatives(lex, gold).count() == 1


# --- degree_distribution -----------------------------------------------------


def _spo(spark, rows):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in rows],
        "subject STRING, predicate STRING, object STRING",
    )


def test_degree_dist_buckets(spark):
    # star: hub h with 5 leaves -> h deg 5 (bucket 2), leaves deg 1 (bucket 0)
    t = _spo(spark, [("h", f"l{i}") for i in range(5)])
    got = {r["bucket"]: r for r in degree_distribution(t).collect()}
    assert got[0]["n_nodes"] == 5 and got[0]["lo_degree"] == 1
    assert got[2]["n_nodes"] == 1 and got[2]["lo_degree"] == 4


def test_degree_dist_undirected_distinct(spark):
    # reciprocal + parallel edges count each neighbor once
    t = _spo(spark, [("a", "b"), ("b", "a"), ("a", "b")])
    got = {r["bucket"]: r["n_nodes"] for r in degree_distribution(t).collect()}
    assert got == {0: 2}  # both nodes degree 1


def test_degree_dist_total_matches_node_count(spark):
    t = _spo(spark, [(f"n{i}", f"n{(i * 3) % 11}") for i in range(11)])
    rows = degree_distribution(t).collect()
    n_nodes = sum(r["n_nodes"] for r in rows)
    from ai_knowledge_graph_spark.graph.kgops import topological_layers  # noqa: F401

    # node universe: every endpoint of a non-self-loop edge
    edges = [(f"n{i}", f"n{(i * 3) % 11}") for i in range(11)]
    uni = {x for a, b in edges if a != b for x in (a, b)}
    assert n_nodes == len(uni)
