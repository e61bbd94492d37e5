"""Tests for host_dup_rate, convert_latency, topological_layers."""

from __future__ import annotations

import datetime

from ai_knowledge_graph_spark.graph.kgops import topological_layers
from ai_knowledge_graph_spark.operators.dedup import host_dup_rate
from ai_knowledge_graph_spark.operators.events import convert_latency


# --- host_dup_rate -----------------------------------------------------------


def test_host_dup_rate_counts(spark):
    docs = spark.createDataFrame(
        [("A", "same text"), ("A", "same   text "), ("A", "other"),
         ("B", "unique one"), ("B", "unique two")],
        ["source", "text"],
    )
    got = {r["source"]: r for r in host_dup_rate(docs).collect()}
    # whitespace-normalized: the two A "same text" docs collide
    assert got["A"]["n_docs"] == 3 and got["A"]["n_unique"] == 2
    assert got["A"]["dup_ppm"] == 1_000_000 // 3
    assert got["B"]["dup_ppm"] == 0


# --- convert_latency ---------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s), u, t)
            for i, (s, u, t) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_latency_buckets(spark):
    # user 1: first click t=0, purchases at 100 and 50 -> min gap 50 ->
    # bucket len(bin(51))-1 = 5; user 2: gap 0 -> bucket 0;
    # user 3: purchase BEFORE click only -> excluded
    ev = _ev(
        spark,
        [(0, 1, "click"), (100, 1, "purchase"), (50, 1, "purchase"),
         (10, 2, "click"), (10, 2, "purchase"),
         (5, 3, "purchase"), (9, 3, "click")],
    )
    got = {r["bucket"]: r["n"] for r in convert_latency(ev).collect()}
    assert got == {5: 1, 0: 1}


def test_latency_window_excludes_late_conversion(spark):
    ev = _ev(spark, [(0, 1, "click"), (7 * 86400 + 1, 1, "purchase")])
    assert convert_latency(ev).count() == 0


def test_latency_first_click_anchors(spark):
    # clicks at 0 and 90; purchase at 100: gap measured from FIRST click
    ev = _ev(spark, [(0, 1, "click"), (90, 1, "click"), (100, 1, "purchase")])
    [r] = convert_latency(ev).collect()
    assert r["bucket"] == 6  # gap 100 -> bin(101) has 7 digits


# --- topological_layers ------------------------------------------------------


def _spo(spark, rows):
    return spark.createDataFrame(
        [(a, "p", b) for a, b in rows],
        "subject STRING, predicate STRING, object STRING",
    )


def test_topo_layers_chain(spark):
    t = _spo(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r["entity"]: r["layer"] for r in topological_layers(t).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_topo_layers_cycle_residue(spark):
    t = _spo(spark, [("a", "b"), ("x", "y"), ("y", "z"), ("z", "x")])
    got = {r["entity"]: r["layer"] for r in topological_layers(t).collect()}
    assert got["a"] == 0 and got["b"] == 1
    assert got["x"] == got["y"] == got["z"] == -1


def test_topo_layers_depth_bound(spark):
    # a 6-chain with rounds=4: nodes past depth 3 fall into the residue
    t = _spo(spark, [(f"n{i}", f"n{i+1}") for i in range(6)])
    got = {r["entity"]: r["layer"] for r in topological_layers(t, rounds=4).collect()}
    assert got["n3"] == 3 and got["n4"] == -1 and got["n6"] == -1


def test_topo_layers_diamond_longest_path(spark):
    # a->b, a->c, b->d, c->d: d peels at layer 2 (longest incoming path)
    t = _spo(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
    got = {r["entity"]: r["layer"] for r in topological_layers(t).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
