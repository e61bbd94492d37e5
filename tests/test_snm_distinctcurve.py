"""Tests for snm_pairs, distinct_curve."""

from __future__ import annotations

import datetime

from ai_knowledge_graph_spark.operators.events import distinct_curve
from ai_knowledge_graph_spark.operators.standardize import snm_pairs


# --- snm_pairs ---------------------------------------------------------------


def _ents(spark, names):
    return spark.createDataFrame([(n,) for n in names], ["entity"])


def test_snm_finds_sorted_neighbors(spark):
    ents = _ents(spark, ["receive", "receivx", "totally different thing"])
    rows = snm_pairs(ents, window=3, max_dist=2).collect()
    assert {(r["entity_a"], r["entity_b"]) for r in rows} == {
        ("receive", "receivx")
    }
    assert rows[0]["edit_dist"] == 1


def test_snm_window_limits_candidates(spark):
    # 'aaaa' and 'aaab' are adjacent; with 4 fillers between them in sort
    # order and window=3, the pair is out of reach
    ents = _ents(spark, ["aaaa", "aaaab1", "aaaab2", "aaaab3", "aaaab4", "aaab"])
    got = {(r["entity_a"], r["entity_b"])
           for r in snm_pairs(ents, window=3, max_dist=2).collect()}
    assert ("aaaa", "aaab") not in got
    got5 = {(r["entity_a"], r["entity_b"])
            for r in snm_pairs(ents, window=5, max_dist=2).collect()}
    assert ("aaaa", "aaab") in got5


def test_snm_catches_midstring_deletion_prefix_blocking_misses(spark):
    # 'receive' -> 'recive' (delete at pos 4): same 2-char prefix region
    # in sort order, adjacent lexicographically -> SNM finds it
    ents = _ents(spark, ["receive", "recive"])
    assert snm_pairs(ents).count() == 1


def test_snm_orientation_canonical(spark):
    ents = _ents(spark, ["zeta1", "zeta2"])
    [r] = snm_pairs(ents).collect()
    assert r["entity_a"] < r["entity_b"]


# --- distinct_curve ----------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d, hours=1), u, "view")
            for i, (d, u) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_distinct_curve_counts_first_appearance_only(spark):
    # day 0: users 1,2; day 1: users 2,3 (2 is returning); day 3: user 1
    ev = _ev(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (3, 1)])
    rows = sorted(distinct_curve(ev).collect(), key=lambda r: r["day"])
    assert [r["n_new_users"] for r in rows] == [2, 1]
    assert [r["cum_users"] for r in rows] == [2, 3]
    # day 3 has no NEW users -> no row (first-seen formulation)
    assert len(rows) == 2


def test_distinct_curve_monotone(spark):
    ev = _ev(spark, [(d, 100 + d * 7 + k) for d in range(5) for k in range(d + 1)])
    rows = sorted(distinct_curve(ev).collect(), key=lambda r: r["day"])
    cums = [r["cum_users"] for r in rows]
    assert cums == sorted(cums) and cums[-1] == sum(r["n_new_users"] for r in rows)
