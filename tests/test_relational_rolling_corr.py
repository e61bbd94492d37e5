"""Tests for revenue_by_nation, rolling_counts, event_correlation."""

from __future__ import annotations

import datetime
import math

from ai_knowledge_graph_spark.operators.events import (
    event_correlation,
    rolling_counts,
)
from ai_knowledge_graph_spark.operators.relational import revenue_by_nation


# --- revenue_by_nation -------------------------------------------------------


def test_revenue_star_join_hand_replay(spark):
    nation = spark.createDataFrame(
        [(1, "FRANCE", 0), (2, "KENYA", 1)],
        "n_nationkey INT, n_name STRING, n_regionkey INT",
    )
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0, "s"), (11, "b", 2, 0.0, "s")],
        "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    orders = spark.createDataFrame(
        [(100, 10), (101, 11), (102, 10)], "o_orderkey LONG, o_custkey LONG"
    )
    lineitem = spark.createDataFrame(
        [(100, 10.0, 0.1), (100, 20.0, 0.0), (101, 5.0, 0.5), (102, 7.0, 0.0)],
        "l_orderkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE",
    )
    got = {r["n_name"]: r for r in
           revenue_by_nation(customer, orders, lineitem, nation).collect()}
    # FRANCE: orders 100 (9.0 + 20.0) and 102 (7.0) -> 3600 cents, 2 orders
    assert got["FRANCE"]["n_orders"] == 2
    assert got["FRANCE"]["revenue_cents"] == 900 + 2000 + 700
    assert got["KENYA"]["revenue_cents"] == 250


def test_revenue_cents_freeze_is_per_row(spark):
    # two rows that would each round to .005 boundaries: frozen per row,
    # not summed in float first
    nation = spark.createDataFrame([(1, "X", 0)], "n_nationkey INT, n_name STRING, n_regionkey INT")
    customer = spark.createDataFrame([(10, "a", 1, 0.0, "s")],
        "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING")
    orders = spark.createDataFrame([(100, 10)], "o_orderkey LONG, o_custkey LONG")
    lineitem = spark.createDataFrame(
        [(100, 0.015, 0.0), (100, 0.015, 0.0)],
        "l_orderkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE",
    )
    [r] = revenue_by_nation(customer, orders, lineitem, nation).collect()
    want = 2 * int(round(0.015 * 100))  # per-row freeze
    assert r["revenue_cents"] == want


# --- rolling_counts ----------------------------------------------------------


def _ev_days(spark, rows):
    # rows: (day_offset, type) -> one event at noon of that day
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1, 12) + datetime.timedelta(days=d), 1, t)
            for i, (d, t) in enumerate(rows)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_rolling_range_frame_skips_missing_days(spark):
    # clicks on days 0 (x2), 1, and 9: day 9's 7-day window must NOT see
    # day 1 (a row-frame would)
    ev = _ev_days(spark, [(0, "click"), (0, "click"), (1, "click"), (9, "click")])
    got = {r["day"]: (r["n"], r["rolling_n"])
           for r in rolling_counts(ev, window_days=7).collect()}
    days = sorted(got)
    assert got[days[0]] == (2, 2)
    assert got[days[1]] == (1, 3)
    assert got[days[2]] == (1, 1)  # day 9: alone in its window


def test_rolling_partitioned_by_type(spark):
    ev = _ev_days(spark, [(0, "click"), (0, "view"), (1, "view")])
    got = {(r["event_type"], r["day"] - 19723): r["rolling_n"]
           for r in rolling_counts(ev).collect()}
    assert got[("view", 1)] == 2 and got[("click", 0)] == 1


# --- event_correlation -------------------------------------------------------


def test_corr_perfect_positive(spark):
    rows = []
    for d in range(5):
        rows += [(d, "click")] * (d + 1) + [(d, "purchase")] * (d + 1)
    [r] = event_correlation(_ev_days(spark, rows), "click", "purchase").collect()
    assert r["n_days"] == 5 and r["corr_micro"] == 1_000_000


def test_corr_hand_replay_with_zero_fill(spark):
    # day 0: 2 clicks 1 purchase; day 1: 1 click 0 purchases
    rows = [(0, "click"), (0, "click"), (0, "purchase"), (1, "click")]
    [r] = event_correlation(_ev_days(spark, rows), "click", "purchase").collect()
    xs, ys = [2, 1], [1, 0]
    n = 2
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    want = int(round((n * sxy - sx * sy)
                     / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
                     * 1e6))
    assert r["corr_micro"] == want == 1_000_000


def test_corr_zero_variance_null(spark):
    rows = [(0, "click"), (1, "click")]  # purchases always 0 -> no variance
    [r] = event_correlation(_ev_days(spark, rows), "click", "purchase").collect()
    assert r["corr_micro"] is None
