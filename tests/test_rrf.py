"""rrf_fuse: published-formula replay, membership fusion, single-list."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_spark.operators.ranking import rrf_fuse


def _rank_df(spark, ids):
    return spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids)], "doc_id long, rank int"
    )


def test_formula_and_ordering(spark):
    a = _rank_df(spark, [1, 2, 3])  # lexical list
    b = _rank_df(spark, [3, 4, 1])  # vector list
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"])
        for r in rrf_fuse([a, b], k=60).collect()
    }
    exp = {
        1: 1 / 61 + 1 / 63,
        2: 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 62,
    }
    assert set(out) == set(exp)
    for d, s in exp.items():
        assert out[d][0] == pytest.approx(round(s, 6), abs=1e-9), d
    assert out[1][1] == out[3][1] == 2 and out[2][1] == out[4][1] == 1
    # both-list docs outrank single-list docs here
    order = [
        r["doc_id"] for r in rrf_fuse([a, b], k=60).collect()
    ]
    assert set(order[:2]) == {1, 3}
    # deterministic tie-break by id among equal scores
    assert order[:2] == [1, 3] and order[2:] == [2, 4]


def test_single_list_is_monotone(spark):
    a = _rank_df(spark, [7, 5, 9])
    out = [r["doc_id"] for r in rrf_fuse([a]).collect()]
    assert out == [7, 5, 9]


def test_empty_rankings_raise(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
