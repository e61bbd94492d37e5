"""The P/R gate: engine output vs the ACTUAL reference pipeline.

Phase-1 parity is exact on any corpus (same deterministic extractor runs on
both sides, through the reference's own JSON path). Full-pipeline parity is
exact on the reference's own sample document (data/industrial-revolution.txt)
— the gate BASELINE.json defines. On the synthetic tie-dense corpus the
second-pass scan-order divergence (SURVEY.md §7 D2) is also *measured* and
asserted above a floor, documenting how much the tie totalization costs.
"""

from __future__ import annotations

import contextlib
import io

import pandas as pd
import pytest

from ai_knowledge_graph_spark.config import load_config
from ai_knowledge_graph_spark.functions.text import wrap_text_as_html
from ai_knowledge_graph_spark.oracle.reference_runner import (
    DEFAULT_CONFIG,
    precision_recall,
    reference_modules,
    run_reference_phase1,
    run_reference_pipeline,
    run_reference_seed0,
    spo_set,
)
from ai_knowledge_graph_spark.pipeline import run_pipeline


def _quiet(fn, *args, **kwargs):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        return fn(*args, **kwargs)


@pytest.fixture(scope="module")
def sample_text():
    with open("/root/reference/data/industrial-revolution.txt", encoding="utf-8") as f:
        return f.read()


def _single_doc_pages(spark, text):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["doc://sample"],
                "warc_ts": [None],
                "html": [wrap_text_as_html(text)],
                "text": [text],
                "lang": ["en"],
            }
        )
    )


def _cfg():
    cfg = load_config()
    cfg["chunking"] = {"chunk_size": 100, "overlap": 20}
    return cfg


def test_full_pipeline_pr_on_reference_sample_doc(spark, sample_text):
    pages = _single_doc_pages(spark, sample_text)
    engine = spo_set(r.asDict() for r in run_pipeline(spark, pages, _cfg()).collect())
    # Pinned PYTHONHASHSEED=0 subprocess oracle: stable regardless of the
    # pytest interpreter's hash seed (the reference leaks set order).
    oracle = spo_set(run_reference_seed0([sample_text], 100, 20, phase="full"))
    p, r = precision_recall(engine, oracle)
    assert p >= 0.95 and r >= 0.95, (p, r, sorted(oracle - engine)[:10], sorted(engine - oracle)[:10])


def test_phase1_exact_on_fixture_corpus(spark, pages_pdf, raw_triples):
    texts = [t for t, l in zip(pages_pdf["text"], pages_pdf["lang"]) if l == "en"]
    oracle = {
        (t["subject"], t["predicate"], t["object"], t["chunk"])
        for t in _quiet(run_reference_phase1, texts, 100, 20)
    }
    engine = {
        (r["subject"], r["predicate"], r["object"], r["chunk"])
        for r in raw_triples.collect()
    }
    assert engine == oracle


def test_phase2_pr_floor_on_tie_dense_corpus(spark, pages_pdf, raw_triples):
    """Documented divergence measurement: the synthetic corpus is built to be
    pathologically tie-dense (equal-char-length stem/subset families), where
    the reference's set-iteration scan order is unobservable. Assert a floor
    so regressions in the *rule* logic (not tie order) still get caught."""
    from ai_knowledge_graph_spark.operators.standardize import standardize_triples

    _, ent_std, _ = reference_modules()
    texts = [t for t, l in zip(pages_pdf["text"], pages_pdf["lang"]) if l == "en"]
    phase1 = _quiet(run_reference_phase1, texts, 100, 20)
    oracle = spo_set(_quiet(ent_std.standardize_entities, phase1, DEFAULT_CONFIG))
    engine = spo_set(r.asDict() for r in standardize_triples(raw_triples).collect())
    p, r = precision_recall(engine, oracle)
    assert p >= 0.5 and r >= 0.5, (p, r)
