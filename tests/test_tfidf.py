"""tfidf_keywords: pure-Python replay + ranking sanity."""

from __future__ import annotations

import math
import re
from collections import Counter

from ai_knowledge_graph_spark.operators.textstats import tfidf_keywords

DOCS = [
    (0, "spark spark spark shuffle join"),
    (1, "spark join join catalyst"),
    (2, "catalyst optimizer optimizer rules rules rules"),
    (3, "the the the the common common word"),
]


def _py_tfidf(top_k=3):
    toks = {d: re.findall(r"\w+", t.lower()) for d, t in DOCS}
    n = len(DOCS)
    df = Counter(w for ws in toks.values() for w in set(ws))
    out = {}
    for d, ws in toks.items():
        tf = Counter(ws)
        scored = []
        for w, c in tf.items():
            idf_micro = round((math.log((n + 1) / (df[w] + 1)) + 1.0) * 1e6)
            scored.append((-c * idf_micro, w, c, df[w], c * idf_micro))
        scored.sort()
        out[d] = [
            (w, c, dfx, sm, i + 1)
            for i, (_, w, c, dfx, sm) in enumerate(scored[:top_k])
        ]
    return out


def test_tfidf_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {}
    for r in tfidf_keywords(df, top_k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["word"], r["tf"], r["df"], r["score_micro"], r["rank"])
        )
    for d in got:
        got[d].sort(key=lambda t: t[4])
    assert got == _py_tfidf()


def test_tfidf_prefers_distinctive_words(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top1 = {
        r["doc_id"]: r["word"]
        for r in tfidf_keywords(df, top_k=1).collect()
    }
    assert top1[0] == "spark"
    assert top1[2] == "rules"
    # "the" is frequent in doc 3 but appears nowhere else, so it still
    # wins there — tf dominates within one doc; df only discounts shared words
    assert top1[3] == "the"
