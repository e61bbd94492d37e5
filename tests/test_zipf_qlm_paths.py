"""Tests for zipf_fit, dirichlet_lm_rank, session_paths."""

from __future__ import annotations

import datetime
import math

from ai_knowledge_graph_spark.operators.events import session_paths
from ai_knowledge_graph_spark.operators.ranking import dirichlet_lm_rank
from ai_knowledge_graph_spark.operators.textstats import zipf_fit


# --- zipf_fit ----------------------------------------------------------------


def _slope(points):
    xs = [int(round(math.log(r) * 1e6)) for r, _ in points]
    ys = [int(round(math.log(c) * 1e6)) for _, c in points]
    n = len(points)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)


def test_zipf_hand_replay(spark):
    # freqs: aaa x8, bbb x4, ccc x2, ddd x1 -> ranks 1..4
    text = " ".join(["aaa"] * 8 + ["bbb"] * 4 + ["ccc"] * 2 + ["ddd"])
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    [r] = zipf_fit(docs).collect()
    assert r["n_ranks"] == 4
    assert abs(r["slope"] - _slope([(1, 8), (2, 4), (3, 2), (4, 1)])) < 1e-9


def test_zipf_perfect_power_law_slope_minus_one(spark):
    # freq(rank) = 60 / rank exactly for ranks 1..5 -> slope ~ -1
    words = []
    for rank, freq in enumerate([60, 30, 20, 15, 12], start=1):
        words += [f"w{rank}"] * freq
    docs = spark.createDataFrame([(0, " ".join(words))], ["doc_id", "text"])
    [r] = zipf_fit(docs).collect()
    assert abs(r["slope"] + 1.0) < 1e-3


def test_zipf_single_rank_null_slope(spark):
    docs = spark.createDataFrame([(0, "solo solo solo")], ["doc_id", "text"])
    [r] = zipf_fit(docs).collect()
    assert r["n_ranks"] == 1 and r["slope"] is None


def test_zipf_top_ranks_cap(spark):
    text = " ".join(f"w{i:03d}" for i in range(50))
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    [r] = zipf_fit(docs, top_ranks=10).collect()
    assert r["n_ranks"] == 10


# --- dirichlet_lm_rank -------------------------------------------------------


def _dirichlet_micro(tf, cf, length, C, mu=2000):
    return int(round(math.log((tf + mu * cf / C) / (length + mu)) * 1e6))


def test_qlm_hand_replay(spark):
    docs = spark.createDataFrame(
        [(0, "spark spark merge"), (1, "other words only here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           dirichlet_lm_rank(docs, ["spark", "merge"], top_n=10).collect()}
    C = 7  # all corpus tokens
    want0 = _dirichlet_micro(2, 2, 3, C) + _dirichlet_micro(1, 1, 3, C)
    want1 = _dirichlet_micro(0, 2, 4, C) + _dirichlet_micro(0, 1, 4, C)
    assert out[0]["qlm_micro"] == want0
    assert out[1]["qlm_micro"] == want1
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2


def test_qlm_smoothing_ranks_zero_overlap_docs(spark):
    # both docs lack 'spark'; the shorter doc scores higher (denominator)
    docs = spark.createDataFrame(
        [(0, "aa bb"), (1, "aa bb cc dd ee ff"), (2, "spark aa")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["rank"] for r in
           dirichlet_lm_rank(docs, ["spark"], top_n=10).collect()}
    assert out[2] == 1  # the only doc containing the term
    assert out[0] == 2 and out[1] == 3  # smoothed, shorter first
    assert len(out) == 3  # zero-overlap docs still ranked


def test_qlm_top_n_bound(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} filler") for i in range(30)], ["doc_id", "text"]
    )
    assert dirichlet_lm_rank(docs, ["filler"], top_n=5).count() == 5


# --- session_paths -----------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), u, t)
            for i, (s, u, t) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_paths_trigrams_within_session(spark):
    ev = _ev(
        spark,
        [(0, 1, "view"), (60, 1, "click"), (120, 1, "purchase"),
         (180, 1, "view")],
    )
    got = {(r["e1"], r["e2"], r["e3"]): r["n_paths"]
           for r in session_paths(ev).collect()}
    assert got[("view", "click", "purchase")] == 1
    assert got[("click", "purchase", "view")] == 1
    assert len(got) == 2


def test_paths_session_gap_breaks_trigram(spark):
    # 31-minute gap between click and purchase -> no trigram spans it
    ev = _ev(
        spark,
        [(0, 1, "view"), (60, 1, "click"), (60 + 1861, 1, "purchase"),
         (60 + 1921, 1, "x"), (60 + 1981, 1, "y")],
    )
    got = {(r["e1"], r["e2"], r["e3"]) for r in session_paths(ev).collect()}
    assert ("view", "click", "purchase") not in got
    assert ("purchase", "x", "y") in got


def test_paths_rank_and_ties(spark):
    # 'a b c' twice (two users), 'x y z' once -> abc rank 1
    ev = _ev(
        spark,
        [(0, 1, "a"), (1, 1, "b"), (2, 1, "c"),
         (0, 2, "a"), (1, 2, "b"), (2, 2, "c"),
         (0, 3, "x"), (1, 3, "y"), (2, 3, "z")],
    )
    rows = sorted(session_paths(ev).collect(), key=lambda r: r["rank"])
    assert (rows[0]["e1"], rows[0]["e2"], rows[0]["e3"]) == ("a", "b", "c")
    assert rows[0]["n_paths"] == 2 and rows[0]["rank"] == 1
