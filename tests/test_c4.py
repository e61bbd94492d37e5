"""c4_rules: pure-Python replay + per-rule trigger fixtures.

C4 rule set per Raffel et al. 2020 §2.2 (reference repo has no cleaning
rules of its own; this is the beyond-reference training-data family).
"""

from __future__ import annotations

import re

import pytest

from ai_knowledge_graph_spark.operators.textstats import C4_BAD_WORDS, c4_rules

GOOD = (
    "The quick brown fox jumps over the lazy dog today.\n"
    "A second sentence with plenty of words in it too!\n"
    "And a third sentence closes out the document nicely?"
)


def _py_rules(text, bad_words=C4_BAD_WORDS, min_sentences=3, min_line_words=5):
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    kept = [
        l
        for l in lines
        if re.search(r'[.!?"]$', l)
        and len([w for w in re.split(r"\s+", l) if w]) >= min_line_words
        and "javascript" not in l.lower()
    ]
    clean = "\n".join(kept)
    n_sent = len(re.findall(r"[.!?]", clean))
    low = text.lower()
    has_lorem = "lorem ipsum" in low
    has_brace = "{" in text
    stripped = [
        re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", w)
        for w in re.split(r"\s+", low)
        if w
    ]
    has_bad = any(w in bad_words for w in stripped)
    return {
        "n_lines": len(lines),
        "n_kept_lines": len(kept),
        "n_sentences": n_sent,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "has_bad_word": has_bad,
        "c4_pass": n_sent >= min_sentences
        and not (has_lorem or has_brace or has_bad),
        "clean_text": clean,
    }


CASES = [
    ("pass", GOOD),
    ("no_terminal", "just some words with no punctuation at the end\n" + GOOD),
    ("short_line", "tiny line.\n" + GOOD),
    ("javascript", "please enable javascript to continue browsing here.\n" + GOOD),
    ("lorem", GOOD + "\nLorem ipsum dolor sit amet consectetur adipiscing."),
    ("brace", GOOD + "\nvar config = { a: 1 };"),
    ("badword", GOOD + '\nGet your spamword, discounted and shipped today."'),
    ("badword_punct", GOOD + '\nTotally "SPAMWORD!" in shouting case today yes.'),
    ("few_sentences", 'One line that ends with a quotation mark here"'),
    ("empty", ""),
    ("blank_lines", "\n\n" + GOOD + "\n\n"),
]


@pytest.fixture(scope="module")
def c4_out(spark):
    df = spark.createDataFrame(
        [(name, text) for name, text in CASES], "name string, text string"
    )
    return {r["name"]: r.asDict() for r in c4_rules(df).collect()}


@pytest.mark.parametrize("name,text", CASES)
def test_c4_matches_python_replay(c4_out, name, text):
    exp = _py_rules(text)
    got = c4_out[name]
    for k, v in exp.items():
        assert got[k] == v, f"{name}.{k}: {got[k]!r} != {v!r}"


def test_c4_rule_triggers(c4_out):
    assert c4_out["pass"]["c4_pass"]
    # line-level drops reduce kept count but GOOD keeps the page passing
    assert c4_out["no_terminal"]["n_kept_lines"] == 3
    assert c4_out["short_line"]["n_kept_lines"] == 3
    assert c4_out["javascript"]["n_kept_lines"] == 3
    # page-level gates each flip the pass bit
    assert not c4_out["lorem"]["c4_pass"] and c4_out["lorem"]["has_lorem"]
    assert not c4_out["brace"]["c4_pass"] and c4_out["brace"]["has_brace"]
    assert not c4_out["badword"]["c4_pass"] and c4_out["badword"]["has_bad_word"]
    # blocklist matching strips surrounding punctuation + lowercases
    assert c4_out["badword_punct"]["has_bad_word"]
    # a kept line ending in a quote contributes no sentence marks
    few = c4_out["few_sentences"]
    assert few["n_kept_lines"] == 1 and few["n_sentences"] == 0
    assert not few["c4_pass"]
    assert c4_out["empty"]["n_lines"] == 0 and not c4_out["empty"]["c4_pass"]
    assert c4_out["blank_lines"]["n_lines"] == 3


def test_c4_clean_text_preserves_line_order(c4_out):
    assert c4_out["no_terminal"]["clean_text"] == GOOD
    assert c4_out["pass"]["clean_text"] == GOOD
