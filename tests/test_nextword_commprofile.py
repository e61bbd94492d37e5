"""Tests for next_word_table, community_profiles."""

from __future__ import annotations

from ai_knowledge_graph_spark.graph.walks import community_profiles
from ai_knowledge_graph_spark.operators.textstats import next_word_table


# --- next_word_table ---------------------------------------------------------


def test_next_word_conditional_probability(spark):
    # after 'the': cat x4, dog x3, rat x3 (10 'the' bigram slots total)
    text = " ".join(
        ["the cat"] * 4 + ["the dog"] * 3 + ["the rat"] * 3
    )
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = [r for r in next_word_table(docs, top_k=3, min_count=3).collect()
            if r["w1"] == "the"]
    got = {r["w2"]: r for r in rows}
    # note: 'the' is followed by cat/dog/rat AND each pair's second word
    # is followed by 'the' again; count w1='the' slots = 10
    assert got["cat"]["n12"] == 4
    assert got["cat"]["cond_ppm"] == (4 * 1_000_000) // 10
    assert got["cat"]["rank"] == 1
    # tie between dog and rat (3 each): alphabetical
    assert got["dog"]["rank"] == 2 and got["rat"]["rank"] == 3


def test_next_word_min_count_and_top_k(spark):
    text = "a b " * 5 + "a c " * 5 + "a d " * 5 + "a e"
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = [r for r in next_word_table(docs, top_k=2, min_count=3).collect()
            if r["w1"] == "a"]
    assert len(rows) == 2  # top_k caps; 'e' (count 1) below min_count anyway


# --- community_profiles ------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src STRING, dst STRING")


def test_community_profile_triangle_and_oscillating_pair(spark):
    # triangle {a,b,c} merges to one community; the isolated PAIR {x,y}
    # oscillates under synchronous LPA (bipartite swap: after an even
    # round count each keeps its own label) -> two singleton communities.
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")])
    got = {r["label"]: r for r in community_profiles(e, rounds=4).collect()}
    sizes = sorted(r["n_nodes"] for r in got.values())
    assert sizes == [1, 1, 3]
    tri = got["a"]
    # all triangle members have degree 2; hub = lexicographic min
    assert tri["top_entity"] == "a" and tri["top_degree"] == 2
    assert got["x"]["top_degree"] == got["y"]["top_degree"] == 1


def test_community_profile_hub_is_max_degree(spark):
    # star: hub z connects to 3 leaves -> top_entity must be z (degree 3)
    e = _edges(spark, [("z", "l1"), ("z", "l2"), ("z", "l3")])
    rows = community_profiles(e, rounds=4).collect()
    hubs = {r["top_entity"] for r in rows}
    assert "z" in hubs
    [zr] = [r for r in rows if r["top_entity"] == "z"]
    assert zr["top_degree"] == 3
