"""Tests for range_join, predicate_symmetry, predicate_inverses."""

from __future__ import annotations

import datetime

from ai_knowledge_graph_spark.graph.kgops import (
    predicate_inverses,
    predicate_symmetry,
)
from ai_knowledge_graph_spark.operators.events import range_join


# --- range_join --------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), u)
            for eid, s, u in rows
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG",
    )


def test_range_join_window_semantics(spark):
    left = _ev(spark, [(1, 0, 7)])
    # rights at -1 (before: out), 0 (same instant: in), 3600 (boundary: in),
    # 3601 (out), and same gap for another user (out)
    right = _ev(spark, [(10, -1, 7), (11, 0, 7), (12, 3600, 7),
                        (13, 3601, 7), (14, 100, 8)])
    got = {(r["left_id"], r["right_id"]): r["gap_sec"]
           for r in range_join(left, right, 3600).collect()}
    assert got == {(1, 11): 0, (1, 12): 3600}


def test_range_join_crosses_bucket_boundary(spark):
    # left at t=3599 (bucket 0), right at t=3600 (bucket 1): the pair
    # spans the bucket edge and must still be found (the 2-slot explode)
    left = _ev(spark, [(1, 3599, 5)])
    right = _ev(spark, [(2, 3600, 5), (3, 3599 + 3600, 5)])
    got = {(r["left_id"], r["right_id"]): r["gap_sec"]
           for r in range_join(left, right, 3600).collect()}
    assert got == {(1, 2): 1, (1, 3): 3600}


def test_range_join_no_duplicate_pairs(spark):
    # many rights inside one window: each pair exactly once
    left = _ev(spark, [(1, 0, 5)])
    right = _ev(spark, [(i, i * 10, 5) for i in range(2, 12)])
    rows = range_join(left, right, 3600).collect()
    pairs = [(r["left_id"], r["right_id"]) for r in rows]
    assert len(pairs) == len(set(pairs)) == 10


# --- predicate_symmetry ------------------------------------------------------


def _spo(spark, rows):
    return spark.createDataFrame(rows, "subject STRING, predicate STRING, object STRING")


def test_symmetry_shares(spark):
    t = _spo(spark, [
        ("a", "rel", "b"), ("b", "rel", "a"),        # symmetric pair
        ("a", "rel", "c"),                            # one-way
        ("x", "part", "y"), ("y", "part", "z"),      # directed chain
    ])
    got = {r["predicate"]: r for r in predicate_symmetry(t, min_edges=2).collect()}
    assert got["rel"]["n_edges"] == 3 and got["rel"]["n_sym"] == 2
    assert got["rel"]["sym_ppm"] == (2 * 1_000_000) // 3
    assert got["part"]["n_sym"] == 0


def test_symmetry_self_loop_counts(spark):
    t = _spo(spark, [("a", "is", "a"), ("b", "is", "c")])
    [r] = predicate_symmetry(t, min_edges=2).collect()
    assert r["n_edges"] == 2 and r["n_sym"] == 1


def test_symmetry_min_edges_gate(spark):
    t = _spo(spark, [("a", "lonely", "b")])
    assert predicate_symmetry(t, min_edges=2).count() == 0


# --- predicate_inverses ------------------------------------------------------


def test_inverse_rule_confidence(spark):
    t = _spo(spark, [
        ("a", "parent of", "b"), ("b", "child of", "a"),
        ("c", "parent of", "d"), ("d", "child of", "c"),
        ("e", "parent of", "f"),                       # no inverse edge
    ])
    got = {(r["predicate"], r["inverse"]): r
           for r in predicate_inverses(t, min_support=1).collect()}
    r = got[("parent of", "child of")]
    assert r["n_support"] == 2 and r["n_p"] == 3
    assert r["conf_ppm"] == (2 * 1_000_000) // 3
    # the rule runs BOTH directions with their own denominators
    r2 = got[("child of", "parent of")]
    assert r2["n_support"] == 2 and r2["n_p"] == 2
    assert r2["conf_ppm"] == 1_000_000


def test_inverse_excludes_same_predicate(spark):
    # symmetric same-predicate edges are predicate_symmetry's job
    t = _spo(spark, [("a", "rel", "b"), ("b", "rel", "a")])
    assert predicate_inverses(t, min_support=1).count() == 0


def test_inverse_min_support_gate(spark):
    t = _spo(spark, [("a", "p", "b"), ("b", "q", "a")])
    assert predicate_inverses(t, min_support=2).count() == 0
    assert predicate_inverses(t, min_support=1).count() == 2
