"""winnow_fingerprints: pure-Python replay + the MOSS matching guarantee."""

from __future__ import annotations

import hashlib

from ai_knowledge_graph_spark.operators.textstats import winnow_fingerprints

K, W = 3, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16)


def _py_winnow(text: str, k: int, w: int):
    ws = [x for x in text.lower().split() if x]
    hs = [_h(" ".join(ws[i : i + k])) for i in range(len(ws) - k + 1)]
    out = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        m = min(win)
        pos = j + max(i for i, v in enumerate(win) if v == m)
        out.add((pos, m))
    return out


def _run(spark, texts):
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    res = {}
    for r in winnow_fingerprints(df, k=K, window=W).collect():
        res.setdefault(r["doc_id"], set()).add((r["pos"], r["fp_hash"]))
    return res


def test_matches_pure_python_replay(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "pack my box with five dozen liquor jugs",
        3: "a a a a a a a a",  # degenerate: all grams identical
        4: "too few words",  # grams (1) < window -> no fingerprints
        5: "",
    }
    out = _run(spark, texts)
    for d, t in texts.items():
        assert out.get(d, set()) == _py_winnow(t, K, W), d


def test_moss_guarantee_shared_run_shares_fingerprint(spark):
    # two docs share a (W + K - 1)-token run -> they MUST share >= 1
    # fingerprint hash (the paper's matching guarantee)
    shared = "omega psi chi phi upsilon tau"  # 6 tokens = W+K-1
    texts = {
        1: f"intro words here {shared} closing remarks",
        2: f"completely different head {shared} other tail tokens",
        3: "no overlap with anything else at all whatsoever",
    }
    out = _run(spark, texts)
    h1 = {h for _, h in out[1]}
    h2 = {h for _, h in out[2]}
    h3 = {h for _, h in out[3]}
    assert h1 & h2
    assert not (h1 & h3) and not (h2 & h3)


def test_density_is_sparse(spark):
    # winnowing keeps ~2/(W+1) of gram positions, far fewer than all grams
    text = " ".join(f"tok{(i * 17) % 101}" for i in range(300))
    out = _run(spark, {1: text})
    n_grams = 300 - K + 1
    assert 0 < len(out[1]) < 0.6 * n_grams
