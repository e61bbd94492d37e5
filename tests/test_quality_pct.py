"""Tests for quality_percentiles."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.textstats import (
    classifier_score,
    quality_percentiles,
)


def test_percentiles_rank_normalize(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} some shared text here") for i in range(10)],
        ["doc_id", "text"],
    )
    rows = quality_percentiles(docs).collect()
    assert len(rows) == 10
    by_pct = sorted(rows, key=lambda r: r["pct_ppm"])
    # percentiles are the 10 evenly spaced ranks: k*1e6//10
    assert [r["pct_ppm"] for r in by_pct] == [
        (k * 1_000_000) // 10 for k in range(1, 11)
    ]
    # pct order follows raw_score desc (best doc gets the smallest pct)
    scores = [r["raw_score"] for r in by_pct]
    assert scores == sorted(scores, reverse=True)


def test_percentiles_match_classifier_margins(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta epsilon")], ["doc_id", "text"]
    )
    margins = {r["doc_id"]: r["raw_score"]
               for r in classifier_score(docs).collect()}
    got = {r["doc_id"]: r["raw_score"]
           for r in quality_percentiles(docs).collect()}
    assert got == margins
