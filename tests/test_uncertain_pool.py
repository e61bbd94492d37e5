"""Tests for uncertainty_sample, pool_embeddings."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.sampling import uncertainty_sample
from ai_knowledge_graph_spark.operators.similarity import pool_embeddings


# --- uncertainty_sample ------------------------------------------------------


def test_uncertainty_orders_by_margin(spark):
    scored = spark.createDataFrame(
        [(0, 500), (1, -3), (2, 90), (3, 0), (4, -2000)],
        "doc_id LONG, raw_score LONG",
    )
    rows = sorted(uncertainty_sample(scored, k=3).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [3, 1, 2]
    assert [r["uncertainty"] for r in rows] == [0, 3, 90]


def test_uncertainty_tie_breaks_on_id(spark):
    scored = spark.createDataFrame(
        [(9, 5), (2, -5), (7, 5)], "doc_id LONG, raw_score LONG"
    )
    rows = sorted(uncertainty_sample(scored, k=3).collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in rows] == [2, 7, 9]


# --- pool_embeddings ---------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id LONG, embedding array<float>")


def test_pool_mean_hand_replay(spark):
    # group 0: vecs 0 and 1 -> component means
    rows = [(0, [1.0, -2.0]), (1, [2.0, 3.0]), (10, [4.0, 4.0])]
    got = {r["group_id"]: r for r in pool_embeddings(_emb(spark, rows), 10).collect()}
    assert got[0]["n_vecs"] == 2
    assert got[0]["pooled_micro"] == [
        (1_000_000 + 2_000_000) // 2,
        (-2_000_000 + 3_000_000) // 2,
    ]
    assert got[1]["pooled_micro"] == [4_000_000, 4_000_000]


def test_pool_negative_mean_truncates_toward_zero(spark):
    rows = [(0, [-1.0]), (1, [0.0])]
    [r] = pool_embeddings(_emb(spark, rows), 10).collect()
    # (-1e6 + 0) DIV 2 truncates toward zero: -500000 exactly divisible,
    # so force a remainder case too
    assert r["pooled_micro"] == [-500_000]
    rows2 = [(0, [-1.0]), (1, [0.0]), (2, [0.0])]
    [r2] = pool_embeddings(_emb(spark, rows2), 10).collect()
    assert r2["pooled_micro"] == [-333_333]  # toward zero, not floor


def test_pool_component_order_preserved(spark):
    rows = [(0, [float(i) for i in range(8)])]
    [r] = pool_embeddings(_emb(spark, rows), 10).collect()
    assert r["pooled_micro"] == [i * 1_000_000 for i in range(8)]
