"""dsir_weights / dsir_resample: pure-Python replay + behavioral checks
(target-like docs outrank off-target ones; deterministic resample)."""

from __future__ import annotations

import hashlib
import math

import pytest

from ai_knowledge_graph_spark.operators.dsir import dsir_resample, dsir_weights

B = 64  # tiny bucket table keeps collisions exercised
ALPHA = 1.0

RAW = {
    1: "the cat sat on the mat",
    2: "quantum flux capacitor overload primary core",
    3: "the dog sat on the rug",
    4: "",
    5: "cat cat cat",
}
TARGET = {
    100: "the cat sat quietly",
    101: "a cat and a dog sat",
}


def _h48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _grams(text: str):
    ws = [w for w in text.split() if w]
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _py_weights(raw: dict, target: dict):
    tb, rb = {}, {}
    tt = rt = 0
    for t in target.values():
        for g in _grams(t):
            tb[_h48(g) % B] = tb.get(_h48(g) % B, 0) + 1
            tt += 1
    for t in raw.values():
        for g in _grams(t):
            rb[_h48(g) % B] = rb.get(_h48(g) % B, 0) + 1
            rt += 1
    lr = {}
    for b in range(B):
        x = math.log((tb.get(b, 0) + ALPHA) / (tt + ALPHA * B)) - math.log(
            (rb.get(b, 0) + ALPHA) / (rt + ALPHA * B)
        )
        lr[b] = int(round(x * 1e6))
    out = {}
    for d, t in raw.items():
        gs = _grams(t)
        out[d] = (len(gs), sum(lr[_h48(g) % B] for g in gs) / 1e6)
    return out


def _dfs(spark):
    raw = spark.createDataFrame(
        [(d, t) for d, t in RAW.items()], "doc_id long, text string"
    )
    tgt = spark.createDataFrame(
        [(d, t) for d, t in TARGET.items()], "doc_id long, text string"
    )
    return raw, tgt


def test_weights_match_pure_python_replay(spark):
    raw, tgt = _dfs(spark)
    out = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_weights(raw, tgt, n_buckets=B).collect()
    }
    exp = _py_weights(RAW, TARGET)
    assert set(out) == set(exp)
    for d in exp:
        assert out[d][0] == exp[d][0], d
        assert out[d][1] == pytest.approx(exp[d][1], abs=1e-9), d


def test_target_like_doc_outranks_off_target(spark):
    raw, tgt = _dfs(spark)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw, tgt, n_buckets=B).collect()
    }
    # doc 1/3 share the target's vocabulary; doc 2 shares nothing
    assert w[1] > w[2] and w[3] > w[2]
    assert w[4] == 0.0  # empty doc keeps a zero-weight row


def test_resample_is_deterministic_topk(spark):
    raw, tgt = _dfs(spark)
    a = dsir_resample(raw, tgt, k=2, n_buckets=B).collect()
    b = dsir_resample(raw, tgt, k=2, n_buckets=B).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 2
    # keys replay: gumbel_key = log_weight - ln(-ln(u))
    for r in a:
        u = (_h48("dsir" + str(r["doc_id"])) + 1) / (2.0**48 + 1.0)
        assert r["gumbel_key"] == pytest.approx(
            r["log_weight"] - math.log(-math.log(u)), abs=1e-9
        )
    # a different salt reshuffles the noise, not the weights
    c = dsir_resample(raw, tgt, k=5, n_buckets=B, salt="other").collect()
    assert {r["doc_id"]: r["log_weight"] for r in c} == {
        r["doc_id"]: r["log_weight"]
        for r in dsir_resample(raw, tgt, k=5, n_buckets=B).collect()
    }
