"""Tests for seed_pagerank, cocitation, paragraph_dedup."""

from __future__ import annotations

from ai_knowledge_graph_spark.graph.centrality import (
    pagerank,
    seed_pagerank,
)
from ai_knowledge_graph_spark.graph.kgops import cocitation
from ai_knowledge_graph_spark.operators.curation import paragraph_dedup


# --- seed_pagerank ----------------------------------------------------------


def test_ppr_mass_conserved_and_seed_biased(spark):
    # star out of s: s -> a, s -> b, plus a -> s back edge
    edges = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "s")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("s",)], ["node"])
    got = {
        r["entity"]: r["ppr"]
        for r in seed_pagerank(edges, seeds, iterations=5).collect()
    }
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got["s"] > got["a"] > 0.0
    # b is a sink reachable only from s; it gets mass but less than s
    assert 0.0 < got["b"] < got["s"]


def test_ppr_unreachable_nodes_stay_zero(spark):
    edges = spark.createDataFrame(
        [("s", "a"), ("x", "y")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("s",)], ["node"])
    got = {
        r["entity"]: r["ppr"]
        for r in seed_pagerank(edges, seeds, iterations=4).collect()
    }
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["s"] > 0.0 and got["a"] > 0.0


def test_ppr_all_nodes_seeded_equals_pagerank(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], ["src", "dst"]
    )
    nodes = (
        edges.selectExpr("src AS node")
        .union(edges.selectExpr("dst AS node"))
        .distinct()
    )
    ppr = {
        r["entity"]: round(r["ppr"], 9)
        for r in seed_pagerank(edges, nodes, iterations=5).collect()
    }
    pr = {
        r["entity"]: round(r["pagerank"], 9)
        for r in pagerank(edges, iterations=5).collect()
    }
    assert ppr == pr


def test_ppr_seeds_outside_graph_ignored(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("a",), ("zz",)], ["node"])
    got = {
        r["entity"]: r["ppr"]
        for r in seed_pagerank(edges, seeds, iterations=3).collect()
    }
    assert set(got) == {"a", "b"}
    assert abs(sum(got.values()) - 1.0) < 1e-9


# --- cocitation --------------------------------------------------------------


def test_cocitation_counts_common_sources(spark):
    edges = spark.createDataFrame(
        [
            ("s1", "x"), ("s1", "y"),
            ("s2", "x"), ("s2", "y"),
            ("s3", "x"), ("s3", "z"),
        ],
        ["src", "dst"],
    )
    got = {
        (r["a"], r["b"]): r["n_common"]
        for r in cocitation(edges, min_count=1).collect()
    }
    assert got == {("x", "y"): 2, ("x", "z"): 1}
    # threshold filters the weak pair
    got2 = {
        (r["a"], r["b"]): r["n_common"]
        for r in cocitation(edges, min_count=2).collect()
    }
    assert got2 == {("x", "y"): 2}


def test_cocitation_hub_guard(spark):
    # hub source citing 5 targets is dropped at max_fanout=4
    rows = [("hub", f"t{i}") for i in range(5)] + [("s", "t0"), ("s", "t1")]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = {
        (r["a"], r["b"]): r["n_common"]
        for r in cocitation(edges, min_count=1, max_fanout=4).collect()
    }
    assert got == {("t0", "t1"): 1}


def test_cocitation_dedups_parallel_edges(spark):
    edges = spark.createDataFrame(
        [("s", "x"), ("s", "x"), ("s", "y")], ["src", "dst"]
    )
    got = cocitation(edges, min_count=1).collect()
    assert [(r["a"], r["b"], r["n_common"]) for r in got] == [("x", "y", 1)]


# --- paragraph_dedup ---------------------------------------------------------


def test_paragraph_dedup_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (0, "shared header\nbody zero"),
            (1, "shared header\nbody one"),
            (2, "body zero\nunique two"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[0]["text"] == "shared header\nbody zero"
    assert got[0]["n_paras"] == 2 and got[0]["n_kept"] == 2
    # doc 1 loses the shared header (doc 0 owns it)
    assert got[1]["text"] == "body one"
    assert got[1]["n_kept"] == 1
    # doc 2 loses "body zero" (doc 0 position 1 owns it)
    assert got[2]["text"] == "unique two"


def test_paragraph_dedup_all_dupes_yields_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, "only para"), (1, "only para")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[0]["text"] == "only para" and got[0]["n_kept"] == 1
    assert got[1]["text"] == "" and got[1]["n_kept"] == 0
    assert got[1]["n_paras"] == 1


def test_paragraph_dedup_within_doc_repeat(spark):
    docs = spark.createDataFrame(
        [(5, "a\nb\na\nc")], ["doc_id", "text"]
    )
    [r] = paragraph_dedup(docs).collect()
    assert r["text"] == "a\nb\nc"
    assert r["n_paras"] == 4 and r["n_kept"] == 3
