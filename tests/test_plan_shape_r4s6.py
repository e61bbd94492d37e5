"""Physical-plan pins for the round-4 session-6 operator families.

Same contract as test_plan_shape.py: lock the properties that make these
operators viable at 100 TB — the range join must be a hash equi-join (the
naive range predicate compiles to BroadcastNestedLoopJoin, quadratic per
key), dimension-sized sides must broadcast, and nothing degenerates into a
cartesian product.
"""

from __future__ import annotations

import datetime
import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _ev(spark, n=40):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=i * 700),
             i % 7, "click" if i % 3 else "purchase")
            for i in range(n)
        ],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING",
    )


def test_range_join_is_hash_join_not_nested_loop(spark):
    # THE point of the bucket trick: a plain shuffled/broadcast hash
    # equi-join on (key, bucket), never BroadcastNestedLoopJoin
    from ai_knowledge_graph_spark.operators.events import range_join

    ev = _ev(spark)
    plan = _plan(range_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        3600,
    ))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # an EQUI join on (key, bucket) — hash or sort-merge, never nested-loop
    assert ("HashJoin" in plan) or ("SortMergeJoin" in plan)
    # the exact window predicate rides the equi-join as an extra condition
    assert "_rt" in plan


def test_revenue_nation_broadcasts_dimension(spark):
    from ai_knowledge_graph_spark.operators.relational import revenue_by_nation

    nation = spark.createDataFrame(
        [(1, "A", 0)], "n_nationkey INT, n_name STRING, n_regionkey INT"
    )
    customer = spark.createDataFrame(
        [(1, "c", 1, 0.0, "s")],
        "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING",
    )
    orders = spark.createDataFrame([(1, 1)], "o_orderkey LONG, o_custkey LONG")
    li = spark.createDataFrame(
        [(1, 1.0, 0.0)], "l_orderkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE"
    )
    plan = _plan(revenue_by_nation(customer, orders, li, nation))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_markov_and_session_paths_no_cartesian(spark):
    from ai_knowledge_graph_spark.operators.events import (
        markov_transitions,
        session_paths,
    )

    ev = _ev(spark)
    for df in (markov_transitions(ev), session_paths(ev)):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_textrank_plan_has_no_cartesian_or_python(spark):
    from ai_knowledge_graph_spark.operators.textstats import textrank_keywords

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta")], ["doc_id", "text"]
    )
    plan = _plan(textrank_keywords(docs, iterations=2, top_k=5))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python is banned
    # top-k is a TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_snm_probe_join_is_equi_join(spark):
    from ai_knowledge_graph_spark.operators.standardize import snm_pairs

    ents = spark.createDataFrame(
        [(f"entity {i:03d}",) for i in range(30)], ["entity"]
    )
    plan = _plan(snm_pairs(ents))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
