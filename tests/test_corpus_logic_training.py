"""S5 corpus prep, J11 logic-engine scoring, K5 training export."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.sources import corpus
from ai_knowledge_graph_spark.graph import logic
from ai_knowledge_graph_spark.operators import training


# ── S5 corpus ──────────────────────────────────────────────────────────────


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "keep").mkdir()
    (d / "keep" / "a.txt").write_text("alpha " * 20)
    (d / "keep" / "b.txt").write_text("  alpha   " * 20 + "\n")  # dup of a after ws-normalize
    (d / "keep" / "c.txt").write_text("short")  # < 50 chars
    (d / "keep" / "changelog.txt").write_text("unique changelog body " * 5)
    (d / "keep" / "data.schema.txt").write_text("schema-ish body " * 10)
    (d / "node_modules").mkdir()
    (d / "node_modules" / "d.txt").write_text("dependency noise " * 10)
    (d / "keep" / "e.txt").write_text("distinct body " * 10)
    return d


def test_collect_corpus_path_filters(spark, corpus_dir):
    df = corpus.collect_corpus(spark, str(corpus_dir))
    paths = sorted(r["path"].rsplit("/", 1)[-1] for r in df.collect())
    # node_modules dir and *schema* basename dropped; changelog.txt is NOT in
    # SKIP_FILENAMES (only changelog.md is, prepare_data.py:33-35).
    assert paths == ["a.txt", "b.txt", "c.txt", "changelog.txt", "e.txt"]


def test_dedup_corpus(spark, corpus_dir):
    df = corpus.collect_corpus(spark, str(corpus_dir))
    kept = corpus.dedup_corpus(df)
    names = sorted(r["path"].rsplit("/", 1)[-1] for r in kept.collect())
    # c.txt dropped (<50 chars); b.txt dropped (same normalized content as
    # a.txt, smaller path wins).
    assert names == ["a.txt", "changelog.txt", "e.txt"]
    # content hash matches hashlib on normalized text (prepare_data.py:124-128)
    import hashlib

    row = kept.filter(F.col("path").endswith("a.txt")).collect()[0]
    expected = hashlib.sha256(" ".join(("alpha " * 20).split()).encode()).hexdigest()
    assert row["content_sha"] == expected


def test_content_hash_unicode_whitespace_parity(spark):
    """Unicode whitespace (\\u00a0, \\u2028, ...) must hash exactly like
    Python's " ".join(text.split()) in the reference (prepare_data.py:124-128)
    — Java's \\s does not match these, hence the explicit PY_WS_RUN class."""
    import hashlib

    texts = [
        "alpha\u00a0beta\u2028gamma " * 5,
        "x\u2003y\u3000z\u200aw\u0085v " * 10,
        "\u00a0\u2029leading and trailing\u205f\u000b" + " body " * 10,
        "plain ascii words " * 5,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string").select(
        "text", corpus.content_hash_col("text").alias("sha")
    )
    got = {r["text"]: r["sha"] for r in df.collect()}
    for t in texts:
        expected = hashlib.sha256(" ".join(t.split()).encode()).hexdigest()
        assert got[t] == expected, f"hash mismatch for {t!r}"


# ── J11 logic engine ───────────────────────────────────────────────────────


def test_score_models_matches_reference_formula(spark):
    requirements = spark.createDataFrame(
        [
            ("silver_bullet", "Displacement through liquidity"),
            ("silver_bullet", "A clean FVG after the sweep"),
            ("unicorn", "A clean FVG after the sweep"),
            ("unicorn", "Breaker block backing the gap"),
        ],
        "model string, requirement string",
    )
    detected = spark.createDataFrame(
        [("displacement",), ("fvg",)], "concept string"
    )
    scored = {r["model"]: r for r in logic.score_models(requirements, detected).collect()}

    # silver_bullet: both reqs met; specificity: displacement-req unique (1.0),
    # fvg-req shared by 2 models (0.5). base=7, spec=3, bonus=1.5.
    sb = scored["silver_bullet"]
    assert sb["satisfied"] == 2 and sb["total_reqs"] == 2
    assert sb["score"] == pytest.approx(7.0 + 3.0 + 1.5)

    # unicorn: 1/2 met; weighted=0.5, max_spec=1.5 → 3.5 + 1.0
    un = scored["unicorn"]
    assert un["satisfied"] == 1 and un["total_reqs"] == 2
    assert un["score"] == pytest.approx(0.5 * 7.0 + (0.5 / 1.5) * 3.0)

    top = logic.recommend(logic.score_models(requirements, detected)).collect()[0]
    assert top["model"] == "silver_bullet" and bool(top["go_no_go"])


def test_expand_detected_one_hop(spark):
    edges = spark.createDataFrame(
        [("a", "b", "requires"), ("c", "a", "enhances"), ("x", "y", "requires")],
        "src string, dst string, relation string",
    )
    detected = spark.createDataFrame([("a",)], "concept string")
    got = sorted(r["concept"] for r in logic.expand_detected(detected, edges).collect())
    assert got == ["a", "b", "c"]


# ── K5 training export ─────────────────────────────────────────────────────


@pytest.fixture(scope="module")
def qa_edges(spark):
    return spark.createDataFrame(
        [
            ("silver_bullet", "displacement", "requires"),
            ("htf_bias", "silver_bullet", "enhances"),
            ("fvg", "pd_array", "is_type_of"),
            ("ob", "fvg", "mitigates"),  # not in template map → generic
        ],
        "src string, dst string, relation string",
    )


def test_relationship_qa(spark, qa_edges):
    qa = training.relationship_qa(qa_edges)
    rows = {r["instruction"]: r for r in qa.collect()}
    assert len(rows) == 4  # exactly one example per edge
    # label rendering: underscores → spaces
    assert any("silver bullet" in i for i in rows)
    generic = [r for r in rows.values() if r["category"] == "relationship_qa_generic"]
    assert len(generic) == 1 and "mitigates" in generic[0]["output"]


def test_export_formats_roundtrip(spark, qa_edges, tmp_path):
    qa = training.relationship_qa(qa_edges)
    for fmt, key in (("chatml", "messages"), ("sharegpt", "conversations"), ("alpaca", "instruction")):
        out = tmp_path / fmt
        training.export_jsonl(qa, str(out), fmt=fmt)
        lines = [
            json.loads(line)
            for p in out.glob("part-*.json")
            for line in p.read_text().splitlines()
        ]
        assert len(lines) == 4
        assert all(key in rec for rec in lines)
    recs = [
        json.loads(line)
        for p in (tmp_path / "chatml").glob("part-*.json")
        for line in p.read_text().splitlines()
    ]
    roles = [m["role"] for m in recs[0]["messages"]]
    assert roles == ["system", "user", "assistant"]


def test_train_test_split_disjoint_and_seeded(spark, qa_edges):
    qa = training.relationship_qa(qa_edges)
    t1, s1 = training.train_test_split(qa, test_ratio=0.5, seed=7)
    t2, s2 = training.train_test_split(qa, test_ratio=0.5, seed=7)
    assert t1.count() + s1.count() == qa.count()
    assert sorted(map(tuple, t1.collect())) == sorted(map(tuple, t2.collect()))


def test_training_stats(spark, qa_edges):
    qa = training.relationship_qa(qa_edges)
    stats = {r["category"]: r for r in training.training_stats(qa).collect()}
    assert stats["relationship_qa"]["n_examples"] == 3
    assert stats["relationship_qa_generic"]["n_examples"] == 1
    for r in stats.values():
        assert r["avg_answer_words"] > 0
        assert r["median_answer_words"] <= r["max_answer_words"]


# ── K4 HTML viz sink ───────────────────────────────────────────────────────


def test_render_html(spark, tmp_path):
    from ai_knowledge_graph_spark.graph.viz import render_html

    nodes = spark.createDataFrame(
        [("a", 5, 0), ("b", 3, 0), ("c", 1, 1), ("d", 1, 1)],
        "entity string, degree long, component_id long",
    )
    edges = spark.createDataFrame(
        [("a", "b", "requires"), ("a", "c", "uses"), ("c", "d", "uses")],
        "src string, dst string, relation string",
    )
    out = tmp_path / "graph.html"
    stats = render_html(nodes, edges, str(out), max_nodes=3)
    assert stats["nodes_rendered"] == 3
    assert stats["edges_rendered"] == 2  # c->d dropped: d not in top-3
    html = out.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert '"id": "a"' in html and "requestAnimationFrame" in html


# ── streaming dedup ────────────────────────────────────────────────────────


def test_stream_dedup_documents(spark, tmp_path):
    from ai_knowledge_graph_spark.streaming.ingest import stream_dedup_documents

    src = tmp_path / "docs"
    spark.createDataFrame(
        [(1, "alpha beta " * 10), (2, "alpha  beta " * 10), (3, "gamma delta " * 10)],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src))
    out = stream_dedup_documents(spark, str(src))
    # docs 1 and 2 share a normalized content hash -> one survivor
    assert out.count() == 2
    assert out.select("content_sha").distinct().count() == 2


def test_stream_dedup_documents_with_ts(spark, tmp_path):
    """With ts_col set, identical content at DIFFERENT timestamps is still one
    duplicate group — the dedup key must stay content-only inside the
    watermark (dropDuplicatesWithinWatermark, not dropDuplicates on
    (sha, ts))."""
    import datetime as dt

    from ai_knowledge_graph_spark.streaming.ingest import stream_dedup_documents

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    src = tmp_path / "docs_ts"
    spark.createDataFrame(
        [
            (1, "alpha beta " * 10, t0),
            (2, "alpha beta " * 10, t0 + dt.timedelta(minutes=5)),  # same content, later ts
            (3, "gamma delta " * 10, t0 + dt.timedelta(minutes=1)),
        ],
        "doc_id long, text string, ts timestamp",
    ).coalesce(1).write.parquet(str(src))
    out = stream_dedup_documents(spark, str(src), ts_col="ts", watermark="1 hour")
    assert out.count() == 2
    assert out.select("content_sha").distinct().count() == 2


# ── v3 QA families (training_generator_v3.py) ──────────────────────────────


def test_definition_qa(spark):
    nodes = spark.createDataFrame(
        [("fair_value_gap", "a price imbalance"), ("order_block", None), ("x", "")],
        "entity string, definition string",
    )
    rows = training.definition_qa(nodes).collect()
    assert len(rows) == 1  # null/empty definitions rejected
    assert rows[0]["instruction"] == "What is fair value gap?"
    assert "a price imbalance" in rows[0]["output"]
    assert rows[0]["category"] == "definition_qa"


def test_multi_hop_qa_paths_and_caps(spark, qa_edges):
    out = training.multi_hop_qa(qa_edges)
    rows = out.collect()
    cats = {r["category"] for r in rows}
    assert cats == {"multi_hop_walkthrough", "multi_hop_next_step"}
    # path htf_bias -> silver_bullet -> displacement exists
    walk = [r for r in rows if r["category"] == "multi_hop_walkthrough"]
    assert any(
        "htf bias" in r["instruction"] and "displacement" in r["instruction"]
        for r in walk
    )
    # a->b->a loops excluded
    assert not any(
        r["instruction"].startswith("Walk me through the chain from X to X")
        for r in walk
    )
    # fanout cap bounds the path set
    hub = spark.createDataFrame(
        [("hub", f"n{i}", "requires") for i in range(20)]
        + [(f"n{i}", "leaf", "requires") for i in range(20)],
        "src string, dst string, relation string",
    )
    capped = training.multi_hop_qa(hub, max_fanout=3)
    # only 3 of hub's 20 out-edges survive -> ≤ 3 paths hub->n_i->leaf, 2 QA each
    assert capped.filter(F.col("instruction").contains("hub")).count() <= 6


def test_cross_ref_qa(spark, qa_edges):
    out = training.cross_ref_qa(qa_edges).collect()
    # ob and silver_bullet do NOT share a neighbor; fvg<-ob and pd_array<-fvg
    # give no shared dst either... htf_bias->silver_bullet & nothing else ->
    # with this fixture the only shared-dst pair would need two srcs on one dst
    pairs = {(r["instruction"]) for r in out}
    assert all("both relate to" in i for i in pairs)


def test_balance_and_min_length(spark, qa_edges):
    qa = training.relationship_qa(qa_edges)
    balanced = training.balance_categories(qa, cap=1, seed=42)
    per_cat = {
        r["category"]: r["count"]
        for r in balanced.groupBy("category").count().collect()
    }
    assert all(v == 1 for v in per_cat.values())
    # deterministic across invocations
    b2 = training.balance_categories(qa, cap=1, seed=42)
    assert sorted(map(tuple, balanced.collect())) == sorted(map(tuple, b2.collect()))
    # different seed may pick different survivors but same counts
    b3 = training.balance_categories(qa, cap=1, seed=7)
    assert b3.count() == balanced.count()
    long_only = training.min_length_filter(qa, min_chars=30)
    assert long_only.count() <= qa.count()
    assert long_only.filter(F.length("output") < 30).count() == 0
