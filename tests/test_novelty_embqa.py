"""Tests for novelty_curve, embedding_qa."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.curation import novelty_curve
from ai_knowledge_graph_spark.operators.similarity import embedding_qa


# --- novelty_curve -----------------------------------------------------------


def test_novelty_decays_for_repeated_content(spark):
    # batch 0: doc with unique text; batch 1: an exact copy -> novelty 0
    text = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, text), (100, text)], ["doc_id", "text"]
    )
    got = {r["batch"]: r for r in
           novelty_curve(docs, gram_n=8, batch_size=100).collect()}
    assert got[0]["novelty_ppm"] == 1_000_000
    assert got[1]["novelty_ppm"] == 0
    assert got[0]["n_grams"] == got[1]["n_grams"] == 13  # 20 - 8 + 1


def test_novelty_partial_overlap(spark):
    # batch 1 doc shares its first 8-gram universe with batch 0 but adds
    # new tail grams
    a = " ".join(f"w{i}" for i in range(8))           # 1 gram
    b = " ".join(f"w{i}" for i in range(8)) + " zz"   # grams: old + 1 new
    docs = spark.createDataFrame([(0, a), (100, b)], ["doc_id", "text"])
    got = {r["batch"]: r for r in novelty_curve(docs, batch_size=100).collect()}
    assert got[1]["n_grams"] == 2 and got[1]["n_new"] == 1
    assert got[1]["novelty_ppm"] == 500_000


def test_novelty_within_batch_repeat_counts_as_new(spark):
    # both copies land in batch 0: every occurrence of a batch's own
    # first-seen gram counts toward n_new (occurrence-weighted share)
    text = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame([(0, text), (1, text)], ["doc_id", "text"])
    [r] = novelty_curve(docs, batch_size=100).collect()
    assert r["n_grams"] == 2 and r["n_new"] == 2


def test_novelty_short_docs_drop(spark):
    docs = spark.createDataFrame(
        [(0, "only three words"), (100, " ".join(f"w{i}" for i in range(9)))],
        ["doc_id", "text"],
    )
    got = {r["batch"] for r in novelty_curve(docs, batch_size=100).collect()}
    assert got == {1}


# --- embedding_qa ------------------------------------------------------------


def _emb(spark, rows, dim_col="array<float>"):
    return spark.createDataFrame(rows, f"vec_id LONG, embedding {dim_col}")


def test_embedding_qa_counts(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),          # unit
        (1, [0.0, 0.0, 0.0]),          # zero norm
        (2, [3.0, 4.0]),               # bad dim
        (3, [0.6, 0.8, 0.0]),          # unit (0.36+0.64)
        (4, [2.0, 0.0, 0.0]),          # not unit
    ]
    [r] = embedding_qa(_emb(spark, rows), expected_dim=3).collect()
    assert r["n_vecs"] == 5
    assert r["n_bad_dim"] == 1
    assert r["n_zero_norm"] == 1
    assert r["n_unit_ppm"] == (2 * 1_000_000) // 5


def test_embedding_qa_null_component(spark):
    rows = [(0, [1.0, None, 0.0]), (1, [1.0, 0.0, 0.0])]
    [r] = embedding_qa(_emb(spark, rows), expected_dim=3).collect()
    assert r["n_null_component"] == 1
    assert r["n_zero_norm"] == 0  # the NULL row is excluded from norm tests
