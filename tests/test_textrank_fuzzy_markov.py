"""Tests for textrank_keywords, fuzzy_entity_pairs, markov_transitions."""

from __future__ import annotations

import datetime

from ai_knowledge_graph_spark.operators.events import markov_transitions
from ai_knowledge_graph_spark.operators.standardize import fuzzy_entity_pairs
from ai_knowledge_graph_spark.operators.textstats import textrank_keywords


# --- textrank_keywords -------------------------------------------------------


def test_textrank_hand_replay_path_graph(spark):
    # tokens: alpha beta gamma (stopwords 'the'/'and' removed) ->
    # path graph alpha-beta-gamma; degrees 1,2,1
    docs = spark.createDataFrame(
        [(0, "alpha the beta and gamma")], ["doc_id", "text"]
    )
    got = {r["word"]: r["tr_micro"] for r in textrank_keywords(docs).collect()}
    # replay the integer recursion
    tot, n = 1_000_000_000_000, 3
    tele = (15 * tot // 100) // n
    pr = {"alpha": tot // n, "beta": tot // n, "gamma": tot // n}
    deg = {"alpha": 1, "beta": 2, "gamma": 1}
    adj = {"alpha": ["beta"], "beta": ["alpha", "gamma"], "gamma": ["beta"]}
    for _ in range(5):
        mass = {w: 0 for w in pr}
        for src, dsts in adj.items():
            for d in dsts:
                mass[d] += pr[src] // deg[src]
        pr = {w: tele + (85 * mass[w]) // 100 for w in pr}
    assert got == pr
    # middle node of a path accumulates the most rank
    assert got["beta"] > got["alpha"] == got["gamma"]


def test_textrank_filters_short_and_stopwords(spark):
    docs = spark.createDataFrame(
        [(0, "of to in aa bb alpha beta")], ["doc_id", "text"]
    )
    words = {r["word"] for r in textrank_keywords(docs).collect()}
    assert words == {"alpha", "beta"}


def test_textrank_rank_ties_alphabetical(spark):
    # symmetric pair: identical scores, rank must break on word asc
    docs = spark.createDataFrame([(0, "zeta alpha")], ["doc_id", "text"])
    rows = sorted(textrank_keywords(docs).collect(), key=lambda r: r["rank"])
    assert [r["word"] for r in rows] == ["alpha", "zeta"]
    assert rows[0]["tr_micro"] == rows[1]["tr_micro"]


def test_textrank_top_k_limits(spark):
    docs = spark.createDataFrame(
        [(0, "one1x two2x three3x four4x five5x")], ["doc_id", "text"]
    )
    # tokens are alpha-only, so digits split words; just check the limit
    assert textrank_keywords(docs, top_k=2).count() <= 2


# --- fuzzy_entity_pairs ------------------------------------------------------


def test_fuzzy_finds_typo_within_block(spark):
    ents = spark.createDataFrame(
        [("receive",), ("recieve",), ("totally different",)], ["entity"]
    )
    rows = fuzzy_entity_pairs(ents).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r["entity_a"], r["entity_b"], r["edit_dist"]) == (
        "receive", "recieve", 2,
    )


def test_fuzzy_prefix_block_misses_first_char_edit(spark):
    # documented recall limit: edit inside the 2-char prefix -> no pair
    ents = spark.createDataFrame([("xeceive",), ("receive",)], ["entity"])
    assert fuzzy_entity_pairs(ents).count() == 0


def test_fuzzy_length_band_and_max_dist(spark):
    ents = spark.createDataFrame(
        [("abcdef",), ("abcdefghi",)], ["entity"]  # len diff 3 > max_dist
    )
    assert fuzzy_entity_pairs(ents, max_dist=2).count() == 0
    assert fuzzy_entity_pairs(ents, max_dist=3).count() == 1


def test_fuzzy_hot_block_guard_drops_oversized_block(spark):
    ents = spark.createDataFrame(
        [(f"aa{i:03d}",) for i in range(10)] + [("receive",), ("recieve",)],
        ["entity"],
    )
    out = fuzzy_entity_pairs(ents, max_block_size=5).collect()
    # the 10-entity 'aa' block is dropped whole; 're' block survives
    assert {(r["entity_a"], r["entity_b"]) for r in out} == {
        ("receive", "recieve")
    }


def test_fuzzy_non_ascii_gated_out(spark):
    ents = spark.createDataFrame([("café",), ("cafe",)], ["entity"])
    # 'café' is gated (non-ASCII); no surviving pair
    assert fuzzy_entity_pairs(ents).count() == 0


# --- markov_transitions ------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 0, m), u, t)
            for i, (m, u, t) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_markov_counts_and_ppm(spark):
    # user 1: view -> click -> view ; user 2: view -> click
    ev = _ev(
        spark,
        [(0, 1, "view"), (1, 1, "click"), (2, 1, "view"),
         (0, 2, "view"), (1, 2, "click")],
    )
    got = {
        (r["src_event"], r["dst_event"]): (r["n_transitions"], r["prob_ppm"])
        for r in markov_transitions(ev).collect()
    }
    assert got[("view", "click")] == (2, 1_000_000)
    assert got[("click", "view")] == (1, 1_000_000)
    assert ("view", "view") not in got  # no cross-user bigram


def test_markov_ppm_truncates(spark):
    # source 'a' fans out 1/3 vs 2/3 -> 333333 and 666666 (DIV truncation)
    ev = _ev(
        spark,
        [(0, 1, "a"), (1, 1, "b"), (2, 1, "a"), (3, 1, "c"),
         (4, 1, "a"), (5, 1, "c")],
    )
    got = {
        (r["src_event"], r["dst_event"]): r["prob_ppm"]
        for r in markov_transitions(ev).collect()
    }
    assert got[("a", "b")] == 333_333
    assert got[("a", "c")] == 666_666


def test_markov_tiebreak_on_event_id(spark):
    # two events at the SAME ts: order falls back to event_id
    ev = _ev(spark, [(0, 1, "first"), (0, 1, "second")])
    [r] = markov_transitions(ev).collect()
    assert (r["src_event"], r["dst_event"]) == ("first", "second")
