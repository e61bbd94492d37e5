"""Tests for topic_shifts, ab_lift (lang_mismatch is a 3-line composition
of the already-tested language_id; its oracle row is the certification)."""

from __future__ import annotations

import hashlib
import math

from ai_knowledge_graph_spark.operators.events import ab_lift
from ai_knowledge_graph_spark.operators.textstats import topic_shifts


# --- topic_shifts ------------------------------------------------------------


def _sim_micro(dot, na, nb):
    return int(round(dot / math.sqrt(na * nb) * 1e6))


def test_topic_shift_finds_vocabulary_break(spark):
    # 20 words of topic A, 20 of topic B, 20 of topic A again (window=10):
    # gaps: 1 (A|A, identical), 2 (A|B, disjoint), 3 (B|B), 4 (B|A) ->
    # sharpest shift = gap 2 (sim 0), tie with gap 4 broken to 2
    text = " ".join(["cat"] * 20 + ["dog"] * 20 + ["cat"] * 20)
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    [r] = topic_shifts(docs, window_words=10).collect()
    assert r["gap_idx"] == 2 and r["sim_micro"] == 0


def test_topic_shift_hand_cosine(spark):
    # window 1: cat x5 dog x5; window 2: cat x10
    # dot = 5*10 = 50; na = 25+25 = 50; nb = 100
    text = " ".join(["cat"] * 5 + ["dog"] * 5 + ["cat"] * 10)
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    [r] = topic_shifts(docs, window_words=10).collect()
    assert r["gap_idx"] == 1
    assert r["sim_micro"] == _sim_micro(50, 50, 100)


def test_topic_shift_short_docs_drop(spark):
    docs = spark.createDataFrame(
        [(0, "too short for two windows"), (1, " ".join(["w"] * 20))],
        ["doc_id", "text"],
    )
    rows = topic_shifts(docs, window_words=10).collect()
    assert {r["doc_id"] for r in rows} == {1}
    [r] = rows
    assert r["sim_micro"] == 1_000_000  # identical windows


def test_topic_shift_disjoint_windows_zero(spark):
    text = " ".join(f"a{i}" for i in range(10)) + " " + " ".join(
        f"b{i}" for i in range(10)
    )
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    [r] = topic_shifts(docs, window_words=10).collect()
    assert r["sim_micro"] == 0


# --- ab_lift -----------------------------------------------------------------


def _cohort(u):
    return "A" if int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16) % 2 == 0 else "B"


def _ev(spark, rows):
    import datetime

    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1), u, t) for i, (u, t) in enumerate(rows)],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_ab_lift_replays_python_assignment(spark):
    rows = []
    converted = set()
    for u in range(40):
        rows.append((u, "view"))
        if u % 3 == 0:
            rows.append((u, "purchase"))
            converted.add(u)
    got = {r["cohort"]: r for r in ab_lift(_ev(spark, rows)).collect()}
    want = {"A": [0, 0], "B": [0, 0]}
    for u in range(40):
        c = _cohort(u)
        want[c][0] += 1
        want[c][1] += int(u in converted)
    for c in ("A", "B"):
        assert got[c]["n_users"] == want[c][0]
        assert got[c]["n_converted"] == want[c][1]
        assert got[c]["conv_ppm"] == (want[c][1] * 1_000_000) // want[c][0]


def test_ab_lift_user_counted_once(spark):
    # a user with 5 purchases converts once
    rows = [(7, "purchase")] * 5 + [(7, "view")]
    got = ab_lift(_ev(spark, rows)).collect()
    assert len(got) == 1
    assert got[0]["n_users"] == 1 and got[0]["n_converted"] == 1
