"""bm25_rank: hand-computed scoring, idf ordering, top-n semantics."""

from __future__ import annotations

import math

from ai_knowledge_graph_spark.operators.ranking import B, K1, bm25_rank


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf, df, n_docs, dl, avgdl):
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl)))


def test_hand_computed_score(spark):
    rows = [
        (1, "spark spark join"),
        (2, "spark merge"),
        (3, "join filter scan"),
    ]
    out = {r["doc_id"]: r.asDict() for r in bm25_rank(_docs(spark, rows), ["spark", "merge"]).collect()}
    assert set(out) == {1, 2}  # doc 3 matches no query term
    avgdl = (3 + 2 + 3) / 3
    exp1 = _bm25(2, 2, 3, 3, avgdl)
    exp2 = _bm25(1, 2, 3, 2, avgdl) + _bm25(1, 1, 3, 2, avgdl)
    assert abs(out[1]["bm25"] - exp1) < 1e-6
    assert abs(out[2]["bm25"] - exp2) < 1e-6
    assert out[1]["matched"] == 1 and out[2]["matched"] == 2
    # "merge" is rarer than "spark" -> doc 2's unique rare term + shorter
    # doc beats doc 1's repeated common term
    assert out[2]["bm25"] > out[1]["bm25"]


def test_top_n_cut_and_determinism(spark):
    # 20 identical docs -> identical scores; top_n=5 must pick the 5
    # smallest doc_ids (deterministic tiebreak), on any partitioning
    rows = [(i, "spark x y") for i in range(20)]
    for parts in (1, 8):
        got = bm25_rank(
            _docs(spark, rows).repartition(parts), ["spark"], top_n=5
        ).collect()
        assert sorted(r["doc_id"] for r in got) == [0, 1, 2, 3, 4]


def test_tf_saturation(spark):
    # BM25 saturates in tf: 10x the term occurrences in an equal-length doc
    # must score higher but far less than 10x
    rows = [
        (1, "spark " + "pad " * 9),
        (2, "spark " * 10),
    ]
    out = {r["doc_id"]: r["bm25"] for r in bm25_rank(_docs(spark, rows), ["spark"]).collect()}
    assert out[2] > out[1]
    assert out[2] < 3 * out[1]
