"""Tests for modularity, scc, funnel, retention_cohorts,
functional_violations, harmonic_centrality."""

from __future__ import annotations

from datetime import datetime

from ai_knowledge_graph_spark.graph.kgops import functional_violations
from ai_knowledge_graph_spark.graph.walks import (
    harmonic_centrality,
    modularity,
    scc,
)
from ai_knowledge_graph_spark.operators.events import funnel, retention_cohorts


# --- modularity --------------------------------------------------------------


def test_modularity_two_triangles(spark):
    # two disjoint triangles, perfect 2-community assignment:
    # per community m_c=3, d_c=6, m=6 -> 3/6 - (6/12)^2 = 0.25 each, Q=0.5
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("d", "e"), ("e", "f"), ("d", "f")],
        ["src", "dst"],
    )
    labels = spark.createDataFrame(
        [(n, "c1") for n in "abc"] + [(n, "c2") for n in "def"],
        ["node", "label"],
    )
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    for lbl in ("c1", "c2"):
        assert rows[lbl]["n_nodes"] == 3
        assert rows[lbl]["intra_edges"] == 3
        assert rows[lbl]["degree_sum"] == 6
        assert rows[lbl]["contribution"] == 0.25


def test_modularity_single_community_is_zero(spark):
    # everything in one community: Q = m/m - (2m/2m)^2 = 0
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    labels = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x")], ["node", "label"]
    )
    [row] = modularity(edges, labels).collect()
    assert row["contribution"] == 0.0
    assert row["intra_edges"] == 2 and row["degree_sum"] == 4


def test_modularity_counts_inter_community_degree(spark):
    # a-b intra c1, b-c crosses: c1 has intra 1, degree_sum 3 (b's cross
    # edge counts toward its degree); c2 has intra 0
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    labels = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2")], ["node", "label"]
    )
    rows = {r["label"]: r for r in modularity(edges, labels).collect()}
    assert rows["c1"]["intra_edges"] == 1 and rows["c1"]["degree_sum"] == 3
    assert rows["c2"]["intra_edges"] == 0 and rows["c2"]["degree_sum"] == 1
    # Q = 1/2 - (3/4)^2 + 0 - (1/4)^2 = -0.125
    q = sum(r["contribution"] for r in rows.values())
    assert abs(q - (-0.125)) < 1e-9


# --- scc ---------------------------------------------------------------------


def test_scc_cycle_plus_tail(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")], ["src", "dst"]
    )
    got = {r["node"]: (r["scc_id"], r["scc_size"]) for r in scc(edges).collect()}
    assert got == {
        "a": ("a", 3), "b": ("a", 3), "c": ("a", 3), "d": ("d", 1),
    }


def test_scc_two_components(spark):
    edges = spark.createDataFrame(
        [("1", "2"), ("2", "1"), ("2", "3"), ("3", "4"), ("4", "3")],
        ["src", "dst"],
    )
    got = {r["node"]: r["scc_id"] for r in scc(edges).collect()}
    assert got == {"1": "1", "2": "1", "3": "3", "4": "3"}


def test_scc_eight_cycle_within_doubling_bound(spark):
    # 8-cycle: every mutual path fits in the 2^3 = 8 hop closure
    nodes = [f"n{i}" for i in range(8)]
    edges = spark.createDataFrame(
        [(nodes[i], nodes[(i + 1) % 8]) for i in range(8)], ["src", "dst"]
    )
    rows = scc(edges).collect()
    assert len(rows) == 8
    assert all(r["scc_id"] == "n0" and r["scc_size"] == 8 for r in rows)


def test_scc_dag_is_all_singletons(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], ["src", "dst"]
    )
    rows = scc(edges).collect()
    assert all(r["scc_id"] == r["node"] and r["scc_size"] == 1 for r in rows)


# --- funnel / retention ------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [(datetime.fromtimestamp(sec), uid, t) for sec, uid, t in rows],
        "ts timestamp, user_id bigint, event_type string",
    )


def test_funnel_ordered_completion(spark):
    t0 = 1_700_000_000
    ev = _ev(spark, [
        (t0, 1, "view"), (t0 + 10, 1, "click"), (t0 + 20, 1, "purchase"),
        # user 2: click BEFORE view -> click never counts, purchase gated off
        (t0 + 5, 2, "click"), (t0 + 50, 2, "view"), (t0 + 60, 2, "purchase"),
        # user 3: purchase outside the 7-day entry window
        (t0, 3, "view"), (t0 + 100, 3, "click"),
        (t0 + 8 * 86400, 3, "purchase"),
        # user 4: never viewed -> absent
        (t0, 4, "purchase"),
    ])
    got = {r["user_id"]: r for r in funnel(ev).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["steps_completed"] == 3
    assert (got[1]["view_sec"], got[1]["click_sec"], got[1]["purchase_sec"]) == (
        t0, t0 + 10, t0 + 20,
    )
    assert got[2]["steps_completed"] == 1 and got[2]["click_sec"] is None
    assert got[3]["steps_completed"] == 2 and got[3]["purchase_sec"] is None


def test_funnel_picks_earliest_qualifying_step(spark):
    t0 = 1_700_000_000
    ev = _ev(spark, [
        (t0 + 30, 1, "view"), (t0, 1, "view"),        # first view wins
        (t0 + 15, 1, "click"), (t0 + 40, 1, "click"),  # earliest after view
    ])
    [r] = funnel(ev).collect()
    assert r["view_sec"] == t0 and r["click_sec"] == t0 + 15


def test_retention_cohorts(spark):
    wk = 7 * 86400
    t0 = 1_700_000_000
    ev = _ev(spark, [
        (t0, 1, "signup"), (t0 + 86400, 1, "click"),      # offset 0
        (t0 + wk + 5, 1, "view"),                          # offset 1
        (t0 - 100, 1, "view"),                             # pre-signup: dropped
        (t0, 2, "signup"), (t0 + 2 * wk, 2, "purchase"),   # offset 2
        (t0 + 50, 3, "click"),                             # never signed up
    ])
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    cw = t0 // wk
    assert got == {(cw, 0): 2, (cw, 1): 1, (cw, 2): 1}


# --- functional_violations ---------------------------------------------------


def test_functional_violations(spark):
    triples = spark.createDataFrame(
        [
            ("s1", "born_in", "o1"), ("s1", "born_in", "o2"),  # func violation
            ("s2", "born_in", "o3"),
            ("s1", "cites", "o9"), ("s2", "cites", "o9"),      # inv violation
        ],
        ["subject", "predicate", "object"],
    )
    got = {r["predicate"]: r for r in functional_violations(triples).collect()}
    b = got["born_in"]
    assert (b["n_subjects"], b["func_violations"], b["func_ppm"]) == (2, 1, 500000)
    assert (b["n_objects"], b["inv_violations"], b["inv_ppm"]) == (3, 0, 0)
    c = got["cites"]
    assert (c["n_subjects"], c["func_violations"]) == (2, 0)
    assert (c["n_objects"], c["inv_violations"], c["inv_ppm"]) == (1, 1, 1000000)


# --- harmonic_centrality -----------------------------------------------------


def test_harmonic_path_graph(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    got = {
        r["entity"]: (r["n_reached"], r["harmonic_micro"])
        for r in harmonic_centrality(edges, radius=3).collect()
    }
    assert got["a"] == (3, 1000000 + 500000 + 333333)
    assert got["b"] == (3, 2 * 1000000 + 500000)
    assert got["d"] == got["a"]


def test_harmonic_radius_bound(spark):
    # 5-node path, radius 2: endpoints see only 2 nodes
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(4)], ["src", "dst"]
    )
    got = {
        r["entity"]: r["n_reached"]
        for r in harmonic_centrality(edges, radius=2).collect()
    }
    assert got["n0"] == 2 and got["n2"] == 4
