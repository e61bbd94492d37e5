"""Tests for readability, rake_keywords, recrawl_priority."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.textstats import (
    rake_keywords,
    readability,
)
from ai_knowledge_graph_spark.operators.webcrawl import recrawl_priority


# --- readability -------------------------------------------------------------


def test_readability_counts(spark):
    # "the cat sat." -> 3 words, 1 sentence, 3 syllables (1 each)
    docs = spark.createDataFrame([(0, "the cat sat.")], ["doc_id", "text"])
    [r] = readability(docs).collect()
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    # fk = 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert abs(r["fk_grade"] - (0.39 * 3 + 11.8 * 1 - 15.59)) < 1e-6


def test_readability_syllable_heuristic(spark):
    # "beautiful" -> vowel groups eau, i, u = 3; "dry" -> y = 1;
    # "bcdfg" (no vowels) floors at 1
    docs = spark.createDataFrame(
        [(0, "beautiful dry bcdfg.")], ["doc_id", "text"]
    )
    [r] = readability(docs).collect()
    assert r["n_syllables"] == 3 + 1 + 1


def test_readability_multi_sentence_and_degenerate(spark):
    docs = spark.createDataFrame(
        [(0, "one two. three four! five?"), (1, "...")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in readability(docs).collect()}
    assert got[0]["n_sentences"] == 3 and got[0]["n_words"] == 5
    assert got[1]["n_words"] == 0
    assert got[1]["fk_grade"] is None and got[1]["reading_ease"] is None


# --- rake_keywords -----------------------------------------------------------


def test_rake_phrases_split_on_stopwords(spark):
    # stopwords include 'the', 'of', 'and' (NORMALIZE_STOPWORDS)
    docs = spark.createDataFrame(
        [(0, "deep learning of graph systems and deep learning")],
        ["doc_id", "text"],
    )
    rows = rake_keywords(docs, top_k=10).collect()
    phrases = {r["phrase"] for r in rows}
    assert phrases == {"deep learning", "graph systems"}
    by_phrase = {}
    for r in rows:
        by_phrase.setdefault(r["phrase"], []).append(r)
    # "deep learning" occurs twice -> two rows, identical scores
    assert len(by_phrase["deep learning"]) == 2
    # deep: freq 2, degree 4 -> 2e6; learning same; phrase = 4e6
    assert all(r["score_micro"] == 4_000_000 for r in by_phrase["deep learning"])
    # graph/systems: freq 1, degree 2 -> 2e6 each, phrase 4e6 too
    assert by_phrase["graph systems"][0]["score_micro"] == 4_000_000


def test_rake_degree_rewards_long_phrases(spark):
    # "alpha beta gamma" (one 3-phrase) vs "delta" (singleton):
    # alpha score = 3e6; delta = 1e6
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta")], ["doc_id", "text"]
    )
    got = {r["phrase"]: r["score_micro"] for r in rake_keywords(docs).collect()}
    assert got["alpha beta gamma"] == 9_000_000
    assert got["delta"] == 1_000_000


def test_rake_top_k_and_rank(spark):
    docs = spark.createDataFrame(
        [(0, "solo and strong pair and strong pair and tiny")],
        ["doc_id", "text"],
    )
    rows = rake_keywords(docs, top_k=2).collect()
    assert len(rows) == 2
    assert all(r["rank"] in (1, 2) for r in rows)
    # both kept rows are the doubled "strong pair" (score 8e6 beats solo 1e6)
    assert {r["phrase"] for r in rows} == {"strong pair"}


# --- recrawl_priority --------------------------------------------------------


def _snap(spark, rows):
    return spark.createDataFrame(rows, ["url", "content_sha"])


def test_recrawl_buckets(spark):
    snaps = [
        _snap(spark, [("u_fast", "a"), ("u_slow", "x"), ("u_mid", "p")]),
        _snap(spark, [("u_fast", "b"), ("u_slow", "x"), ("u_mid", "p")]),
        _snap(spark, [("u_fast", "c"), ("u_slow", "x"), ("u_mid", "p")]),
        _snap(spark, [("u_fast", "d"), ("u_slow", "x"), ("u_mid", "q")]),
    ]
    got = {r["url"]: r for r in recrawl_priority(snaps).collect()}
    assert got["u_fast"]["priority"] == "fast"
    assert got["u_fast"]["change_ppm"] == 1_000_000
    assert got["u_slow"]["priority"] == "slow"
    assert got["u_slow"]["change_ppm"] == 0
    assert got["u_mid"]["priority"] == "medium"
    assert got["u_mid"]["change_ppm"] == 333_333  # 1 of 3 pairs


def test_recrawl_gap_breaks_pairs(spark):
    # present at snaps 0 and 2 only: no consecutive pair -> unknown
    snaps = [
        _snap(spark, [("u", "a")]),
        _snap(spark, [("other", "z")]),
        _snap(spark, [("u", "b")]),
    ]
    got = {r["url"]: r for r in recrawl_priority(snaps).collect()}
    assert got["u"]["n_snaps"] == 2
    assert got["u"]["n_obs_pairs"] == 0
    assert got["u"]["priority"] == "unknown"
    assert got["u"]["change_ppm"] is None


def test_recrawl_half_rate_is_fast_boundary(spark):
    # >= 500000 ppm is 'fast' (inclusive boundary)
    snaps = [
        _snap(spark, [("u", "a")]),
        _snap(spark, [("u", "b")]),
        _snap(spark, [("u", "b")]),
    ]
    [r] = recrawl_priority(snaps).collect()
    assert r["n_obs_pairs"] == 2 and r["n_changes"] == 1
    assert r["change_ppm"] == 500_000 and r["priority"] == "fast"
