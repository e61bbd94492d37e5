"""gopher_rules: pure-Python replay + per-rule trigger fixtures."""

from __future__ import annotations

import re

import pytest

from ai_knowledge_graph_spark.operators.textstats import (
    GOPHER_STOPWORDS,
    gopher_rules,
)

GOOD = (
    "the quick brown fox jumps over that lazy dog and runs with great "
    "speed to have fun in the sunny park where children play games all "
    "day long with their friends and family members who love to watch "
    "them enjoy the warm weather of summer afternoons together happily "
    "every year"
)  # 50 words, all rules pass


def _py_rules(text: str):
    words = [w for w in re.split(r"\s+", text) if w]
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    nw, nl = len(words), len(lines)
    chars = sum(len(w) for w in words)
    symbols = len(re.findall(r"#|\.\.\.", text))
    bullets = sum(1 for l in lines if re.match(r"^[-*•]", l))
    ellipses = sum(1 for l in lines if re.search(r"(\.\.\.|…)$", l))
    alpha = sum(1 for w in words if re.search("[A-Za-z]", w))
    low = {w.lower() for w in words}
    stop_hits = sum(1 for s in GOPHER_STOPWORDS if s in low)
    ok = dict(
        ok_word_count=50 <= nw <= 100_000,
        ok_mean_len=nw > 0 and 3 * nw <= chars <= 10 * nw,
        ok_symbol=10 * symbols <= nw,
        ok_bullet=10 * bullets <= 9 * nl,
        ok_ellipsis=10 * ellipses <= 3 * nl,
        ok_alpha=5 * alpha >= 4 * nw,
        ok_stop=stop_hits >= 2,
    )
    return {**ok, "gopher_pass": all(ok.values()), "n_words": nw,
            "n_stop_hits": stop_hits}


def _run(spark, texts):
    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}


FLAGS = (
    "ok_word_count ok_mean_len ok_symbol ok_bullet ok_ellipsis ok_alpha "
    "ok_stop gopher_pass n_words n_stop_hits"
).split()


def test_matches_pure_python_replay(spark):
    texts = {
        1: GOOD,
        2: "short doc",  # word count fails
        3: "the of " + "### # ## #... " * 20,  # symbol ratio fails
        4: "- " + GOOD + "\n- bullet\n- bullet\n- bullet",  # bullet lines
        5: GOOD.replace("the", "123 456"),  # stopword/alpha interplay
        6: ("trail off... \n" * 5) + GOOD,  # ellipsis lines
        7: "",
    }
    out = _run(spark, texts)
    for d, t in texts.items():
        exp = _py_rules(t)
        got = {k: out[d][k] for k in FLAGS}
        assert got == {k: exp[k] for k in FLAGS}, d


def test_good_doc_passes_and_ratios_reported(spark):
    out = _run(spark, {1: GOOD})[1]
    assert out["gopher_pass"] is True
    assert out["n_words"] == 50
    assert out["mean_word_len"] == pytest.approx(
        sum(len(w) for w in GOOD.split()) / 50, abs=1e-6
    )
    assert out["alpha_frac"] == 1.0 and out["symbol_ratio"] == 0.0


def test_each_rule_fails_independently(spark):
    texts = {
        1: GOOD,
        2: " ".join(["word"] * 49) + " the",  # 50 words but 1 stop word
        3: " ".join(["ab"] * 60),  # mean word len < 3
    }
    out = _run(spark, texts)
    assert out[1]["gopher_pass"]
    assert not out[2]["ok_stop"] and out[2]["ok_word_count"]
    assert not out[3]["ok_mean_len"] and not out[3]["gopher_pass"]
