"""Batched LLM-assisted sub-stages (config-gated; deterministic fakes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators import llm_stages as L


@pytest.fixture(scope="module")
def std_triples(spark):
    rows = [
        # community 1: apple-cluster; community 2: tree-cluster (disconnected)
        ("apple pie", "contains", "apple", "u1", 1, 0),
        ("apple tart", "contains", "apple", "u1", 1, 1),
        ("apple", "is", "fruit", "u1", 2, 0),
        ("oak tree", "is", "tree", "u2", 1, 0),
        ("pine tree", "is", "tree", "u2", 1, 1),
        ("tree", "grows in", "forest", "u2", 2, 0),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string, url string, chunk int, t_idx int"
    ).localCheckpoint(eager=True)


def test_llm_entity_resolution_mapping_and_apply(spark, std_triples):
    mapping = L.llm_entity_resolution(std_triples, L.fake_resolution_llm, cap=100)
    m = {r["variant"]: r["standard"] for r in mapping.collect()}
    # fake groups by first word: apple-family standard = shortest = "apple"
    assert m.get("apple pie") == "apple"
    assert m.get("apple") == "apple"  # standard maps to itself
    applied = L.apply_llm_resolution(std_triples, mapping)
    subs = {r["subject"] for r in applied.collect()}
    assert "apple pie" not in subs and "apple" in subs


def test_llm_between_community_triples(spark, std_triples):
    out = L.llm_between_community_triples(std_triples, L.fake_inference_llm, top_k=2)
    rows = out.collect()
    assert rows, "expected inferred triples across the two communities"
    for r in rows:
        assert r["inferred"] is True
        assert r["predicate"] == "related to"
        assert r["subject"] != r["object"]
        assert r["stage"] == "llm_inference"


def test_llm_within_community_triples(spark, std_triples):
    out = L.llm_within_community_triples(std_triples, L.fake_inference_llm, top_k=2)
    # candidate pairs need unconnected-but-similar entities within a
    # community: apple pie / apple tart share "apple" and are unconnected
    rows = {(r["subject"], r["object"]) for r in out.collect()}
    assert ("apple pie", "apple tart") in rows or ("apple tart", "apple pie") in rows


def test_pipeline_with_llm_stages_on(spark, std_triples):
    from ai_knowledge_graph_spark.config import load_config
    from ai_knowledge_graph_spark.pipeline import run_pipeline

    docs = [
        ("u%d" % i, None, b"", "the apple pie contains sweet apple . the oak tree is tall tree .", "en")
        for i in range(4)
    ]
    pages = spark.createDataFrame(
        docs, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    cfg = load_config()
    cfg["chunking"] = {"chunk_size": 20, "overlap": 5}
    cfg["standardization"]["use_llm_for_entities"] = True
    cfg["standardization"]["entity_llm_fn"] = L.fake_resolution_llm
    cfg["inference"]["use_llm_for_inference"] = True
    cfg["inference"]["inference_llm_fn"] = L.fake_inference_llm
    out = run_pipeline(spark, pages, cfg)
    assert out.count() > 0
    assert out.filter(F.col("stage") == "llm_inference").count() >= 0  # path runs
    # invariants hold with the LLM stages on
    assert out.filter(F.col("subject") == F.col("object")).count() == 0


def test_llm_flag_without_fn_raises(spark):
    from ai_knowledge_graph_spark.config import load_config
    from ai_knowledge_graph_spark.pipeline import run_pipeline

    pages = spark.createDataFrame(
        [("u1", None, b"", "the apple pie contains sweet apple .", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    cfg = load_config()
    cfg["standardization"]["use_llm_for_entities"] = True
    with pytest.raises(ValueError, match="entity_llm_fn"):
        run_pipeline(spark, pages, cfg)
