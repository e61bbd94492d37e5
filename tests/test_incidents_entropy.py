"""Tests for session_incidents, char_entropy."""

from __future__ import annotations

import datetime
import math

from ai_knowledge_graph_spark.operators.events import session_incidents
from ai_knowledge_graph_spark.operators.textstats import char_entropy


# --- session_incidents -------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), u, t)
            for i, (s, u, t) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_incident_overlap_and_miss(spark):
    # user 1's session spans hour 0 only (0..600); user 2's spans hours
    # 1-2 (3700..7400, within the 1800 gap). errors in hours 0 (x2) and 2.
    ev = _ev(
        spark,
        [(0, 1, "view"), (600, 1, "click"),
         (3700, 2, "view"), (5200, 2, "view"), (6600, 2, "view"), (7400, 2, "click"),
         (100, 9, "error"), (200, 9, "error"), (7300, 9, "error")],
    )
    got = {(r["user_id"], r["hour_sec"] // 3600 % 24): r["n_incidents"]
           for r in session_incidents(ev).collect() if r["user_id"] != 9}
    assert got[(1, 0)] == 2       # session 1 overlaps hour 0 (2 errors)
    assert got[(2, 2)] == 1       # session 2 overlaps hour 2's error
    assert (2, 0) not in got      # but not hour 0


def test_incident_session_covering_multiple_hours(spark):
    # one long session (events every 20 min) spanning hours 0..3; one
    # error in hour 2 -> exactly one overlap row for that session
    rows = [(i * 1200, 1, "view") for i in range(12)] + [(7500, 9, "error")]
    out = [r for r in session_incidents(_ev(spark, rows)).collect()
           if r["user_id"] == 1]
    assert len(out) == 1
    assert out[0]["hour_sec"] % 86400 == 2 * 3600


# --- char_entropy ------------------------------------------------------------


def _h_milli(text):
    from collections import Counter

    t = text.lower()
    c = Counter(t[i:i + 2] for i in range(len(t) - 1))
    n = sum(c.values())

    def xlx(x):
        return int(round(x * math.log(x) * 1000))

    return n, (xlx(n) - sum(xlx(v) for v in c.values())) // n


def test_entropy_hand_replay(spark):
    docs = spark.createDataFrame(
        [(0, "abcabcabc"), (1, "aaaaaaaaa")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["entropy_milli"])
           for r in char_entropy(docs).collect()}
    assert got[0] == _h_milli("abcabcabc")
    assert got[1] == _h_milli("aaaaaaaaa")
    # degenerate repetition floors at 0; varied text is higher
    assert got[1][1] == 0 and got[0][1] > 0


def test_entropy_tracks_bigram_diversity(spark):
    # diverse pangram > small repeated token set > one repeated word
    varied = "the quick brown fox jumps over the lazy dog " * 4
    five_tokens = "qzxv jwkp mfyg bdhn crtl " * 7
    spam = "buy buy buy " * 15
    docs = spark.createDataFrame(
        [(0, varied), (1, spam), (2, five_tokens)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["entropy_milli"] for r in char_entropy(docs).collect()}
    assert got[0] > got[2] > got[1]


def test_entropy_short_docs_drop(spark):
    docs = spark.createDataFrame([(0, "x"), (1, "xy")], ["doc_id", "text"])
    rows = char_entropy(docs).collect()
    assert {r["doc_id"] for r in rows} == {1}
