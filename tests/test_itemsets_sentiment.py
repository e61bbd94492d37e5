"""Tests for session_itemsets, sentiment_scores."""

from __future__ import annotations

import datetime

from ai_knowledge_graph_spark.operators.events import session_itemsets
from ai_knowledge_graph_spark.operators.textstats import (
    SENTIMENT_LEXICON,
    sentiment_scores,
)


# --- session_itemsets --------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), u, t)
            for i, (s, u, t) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_itemsets_counts_sessions_not_events(spark):
    # session 1 (user 1): view x3 + click -> ONE (click, view) session
    # count; session 2 (user 2): view+click; session 3 (user 3): view only
    ev = _ev(
        spark,
        [(0, 1, "view"), (10, 1, "view"), (20, 1, "view"), (30, 1, "click"),
         (0, 2, "view"), (5, 2, "click"),
         (0, 3, "view")],
    )
    rows = session_itemsets(ev, min_support=1).collect()
    [r] = rows
    assert (r["item_a"], r["item_b"]) == ("click", "view")  # sorted pair
    assert r["n_sessions"] == 2
    assert r["support_ppm"] == (2 * 1_000_000) // 3  # 3 sessions total


def test_itemsets_gap_splits_sessions(spark):
    # same user, 31-minute gap: two sessions, the pair occurs in neither
    ev = _ev(spark, [(0, 1, "view"), (1861, 1, "click")])
    assert session_itemsets(ev, min_support=1).count() == 0


def test_itemsets_min_support(spark):
    ev = _ev(spark, [(0, 1, "view"), (1, 1, "click")])
    assert session_itemsets(ev, min_support=2).count() == 0


def test_itemsets_triple_session_emits_three_pairs(spark):
    ev = _ev(spark, [(0, 1, "a"), (1, 1, "b"), (2, 1, "c")])
    got = {(r["item_a"], r["item_b"])
           for r in session_itemsets(ev, min_support=1).collect()}
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


# --- sentiment_scores --------------------------------------------------------


def test_sentiment_milli_average(spark):
    docs = spark.createDataFrame(
        [(0, "great fast ship"), (1, "terrible slow mess"), (2, "neutral words")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in sentiment_scores(docs).collect()}
    assert got[0]["n_matched"] == 2
    assert got[0]["sent_milli"] == (4000 + 2000) // 2
    assert got[1]["sent_milli"] == (-4000 + -2000) // 2
    assert got[2]["n_matched"] == 0 and got[2]["sent_milli"] is None


def test_sentiment_repeated_words_weight(spark):
    docs = spark.createDataFrame([(0, "good good bad")], ["doc_id", "text"])
    [r] = sentiment_scores(docs).collect()
    assert r["n_matched"] == 3
    assert r["sent_milli"] == (3000 + 3000 - 3000) // 3


def test_sentiment_lexicon_is_integer_milli(spark):
    assert all(isinstance(v, int) for v in SENTIMENT_LEXICON.values())
