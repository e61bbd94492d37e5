"""exact_substring_dedup: pure-Python replay + hand cases (span merge,
within-doc repeats, short docs, full removal)."""

from __future__ import annotations

import re

from ai_knowledge_graph_spark.operators.curation import exact_substring_dedup


def _py_replay(texts: dict, k: int, min_count: int):
    toks = {d: [w for w in re.split(r"\s+", t) if w] for d, t in texts.items()}
    counts: dict = {}
    for ws in toks.values():
        for i in range(len(ws) - k + 1):
            g = " ".join(ws[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for d, ws in toks.items():
        covered = set()
        starts = []
        for i in range(len(ws) - k + 1):
            if counts[" ".join(ws[i : i + k])] >= min_count:
                covered.update(range(i, i + k))
                starts.append(i)
        spans = 0
        end = None
        for s in starts:
            if end is None or s > end:
                spans += 1
            end = max(end or 0, s + k)
        kept = [w for i, w in enumerate(ws) if i not in covered]
        out[d] = (" ".join(kept), len(ws), len(ws) - len(kept), spans)
    return out


def _run(spark, texts, k, min_count=2):
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    rows = exact_substring_dedup(
        df, k=k, min_count=min_count
    ).collect()
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"], r["n_spans"])
        for r in rows
    }


def test_cross_doc_span_removed_from_both(spark):
    texts = {
        1: "alpha beta gamma delta epsilon zeta unique1 tail1 here",
        2: "head2 alpha beta gamma delta epsilon zeta other2 words2",
        3: "completely different text with no shared windows at all",
    }
    out = _run(spark, texts, k=4)
    assert out == _py_replay(texts, 4, 2)
    # the shared 6-token run is gone from BOTH docs (remove-all semantics)
    assert "alpha" not in out[1][0] and "alpha" not in out[2][0]
    assert out[1][3] == out[2][3] == 1
    assert out[3] == (texts[3], 9, 0, 0)


def test_within_doc_repeat_counts(spark):
    # the 4-gram repeats inside ONE doc -> total count 2 -> removed
    texts = {1: "x1 a b c d mid1 mid2 a b c d x2", 2: "nothing shared here"}
    out = _run(spark, texts, k=4)
    assert out == _py_replay(texts, 4, 2)
    assert out[1][2] == 8 and out[1][3] == 2


def test_short_docs_and_full_removal(spark):
    texts = {
        1: "a b c d e",
        2: "a b c d e",
        3: "tiny",
        4: "",
    }
    out = _run(spark, texts, k=5)
    assert out == _py_replay(texts, 5, 2)
    # identical docs of exactly k tokens vanish entirely
    assert out[1] == ("", 5, 5, 1) and out[2] == ("", 5, 5, 1)
    assert out[3] == ("tiny", 1, 0, 0)
    assert out[4] == ("", 0, 0, 0)


def test_overlapping_windows_merge_into_one_span(spark):
    # a 7-token shared run with k=4 -> 4 duplicated windows, 1 merged span
    texts = {
        1: "p q r s t u v end1a end1b",
        2: "start2 p q r s t u v end2",
    }
    out = _run(spark, texts, k=4)
    assert out == _py_replay(texts, 4, 2)
    assert out[1][2] == 7 and out[1][3] == 1


def test_min_count_three(spark):
    texts = {
        1: "a b c d tail1",
        2: "a b c d tail2",
        3: "a b c d tail3",
        4: "e f g h tail4",
        5: "e f g h tail5",
    }
    out = _run(spark, texts, k=4, min_count=3)
    assert out == _py_replay(texts, 4, 3)
    assert out[1][2] == out[2][2] == out[3][2] == 4
    assert out[4][2] == out[5][2] == 0
