"""Byte-parity of the pure text functions against the actual reference code."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_knowledge_graph_spark.functions.extract import (
    chunk_from_user_prompt,
    extract_triples,
    fake_llm_response,
)
from ai_knowledge_graph_spark.functions.jsonrepair import extract_json_from_text
from ai_knowledge_graph_spark.functions.text import (
    chunk_text,
    html_to_text,
    limit_predicate_length,
    normalize_entity,
    wrap_text_as_html,
)
from ai_knowledge_graph_spark.oracle.reference_runner import reference_modules

ref_text_utils, ref_ent_std, ref_llm = reference_modules()

words_st = st.lists(
    st.text(alphabet="abcdefghij \t\né", min_size=0, max_size=8), min_size=0, max_size=400
)


@settings(max_examples=25, deadline=None)
@given(words_st, st.integers(5, 120), st.integers(0, 30))
def test_chunk_text_matches_reference(tokens, chunk_size, overlap):
    # Restrict to the reference's TERMINATING domain: for
    # chunk_size < 2*overlap its loop appends the same tail chunk forever
    # (text_utils.py:36-43), so execution parity is undefined there.
    if 2 * overlap > chunk_size:  # chunk_size == 2*overlap still terminates
        overlap = chunk_size // 2
    text = " ".join(tokens)
    assert chunk_text(text, chunk_size, overlap) == ref_text_utils.chunk_text(
        text, chunk_size, overlap
    )


def test_chunk_text_terminates_on_reference_hang_domain():
    # chunk_size=5, overlap=4: the reference loops forever on any doc with
    # more than chunk_size words (start resets to n-4 every iteration); the
    # engine must terminate and still cover every word.
    text = " ".join(f"w{i}" for i in range(9))
    chunks = chunk_text(text, 5, 4)
    assert chunks[0] == "w0 w1 w2 w3 w4"
    covered = set(" ".join(chunks).split())
    assert covered == set(text.split())
    assert len(chunks) < 30  # finite


def test_chunk_text_readme_example():
    # README.md:115-128 — 966-word doc at 100/20 yields 13 chunks, 20-word tail.
    text = " ".join(f"w{i}" for i in range(966))
    chunks = chunk_text(text, 100, 20)
    assert len(chunks) == 13
    assert len(chunks[-1].split()) == 20


def test_chunk_text_passthrough_preserves_whitespace():
    text = "a  b\tc\nd"  # <= chunk_size words: original string returned
    assert chunk_text(text, 100, 20) == [text]


@settings(max_examples=30, deadline=None)
@given(st.text(alphabet="abc THEoffrom\t ", max_size=60))
def test_limit_predicate_matches_reference(pred):
    assert limit_predicate_length(pred) == ref_ent_std.limit_predicate_length(pred)


def test_limit_predicate_known_cases():
    assert limit_predicate_length("led to the creation of") == "led to"
    assert limit_predicate_length("was") == "was"
    assert limit_predicate_length("one two three four") == "one two three"
    assert limit_predicate_length("one two OF four") == "one two"


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="abc the of ANDé中 -_1", max_size=60))
def test_normalize_entity_matches_reference_helper(entity):
    # The reference's normalize_text is a closure (entity_standardization.py:77-83);
    # replicate its exact steps inline as the oracle.
    import re

    stop = {"the", "a", "an", "of", "and", "or", "in", "on", "at", "to", "for", "with", "by", "as"}
    expect = " ".join(
        w for w in re.findall(r"\b\w+\b", entity.lower()) if w not in stop
    )
    assert normalize_entity(entity) == expect


@settings(max_examples=25, deadline=None)
@given(st.text(max_size=400))
def test_html_round_trip(text):
    assert html_to_text(wrap_text_as_html(text)) == text


def test_html_to_text_strips_script_and_tags():
    html = b"<html><head><script>var x=1;</script></head><body><p>hello &amp; bye</p></body></html>"
    assert html_to_text(html) == "hello & bye"


def test_extractor_basic_svo():
    out = extract_triples("The steam engine powers the cotton mill.")
    assert out == [
        {
            "subject": "the steam engine",
            "predicate": "powers the",
            "object": "cotton mill",
        }
    ]


def test_extractor_multiword_verb_and_entity_cap():
    out = extract_triples("one two three four five six led to the seven eight nine ten eleven")
    assert out == [
        {
            "subject": "three four five six",  # last 4 tokens before the verb
            "predicate": "led to the",
            "object": "seven eight nine ten",  # first 4 tokens after
        }
    ]


def test_extractor_skips_verbless_and_subjectless():
    assert extract_triples("no relation words here at all") == []
    assert extract_triples("is something") == []  # verb first -> no subject
    assert extract_triples("something is") == []  # nothing after verb


def test_fake_llm_response_round_trips_through_reference_parser():
    chunk = "capitalism led to the industrial revolution. engines are machines."
    parsed = ref_llm.extract_json_from_text(fake_llm_response(chunk))
    assert parsed == extract_triples(chunk)


def test_chunk_recovery_from_reference_prompt_wrapper():
    chunk = "some chunk\nwith lines"
    prompt = f"analyze this text:```\n{chunk}```\n"
    assert chunk_from_user_prompt(prompt) == chunk


TRICKY_JSON = [
    '[{"subject": "a", "predicate": "b", "object": "c"}]',
    'prose before ```json\n[{"subject":"a","predicate":"b","object":"c"}]\n``` after',
    'noise [ {"subject": "a", "predicate": "b", "object": "c"} ] trailing',
    '[{subject: "a", predicate: "b", object: "c"},]',  # bare keys + trailing comma
    '[{"subject":"a","predicate":"b","object":"c"}, {"subject":"d","pred',  # truncated
    "no json here",
    "[1, 2, 3]",
]


@pytest.mark.parametrize("text", TRICKY_JSON)
def test_json_repair_matches_reference(text):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        expected = ref_llm.extract_json_from_text(text)
    assert extract_json_from_text(text) == expected


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet='[]{}",: aboc123\n', max_size=120))
def test_json_repair_fuzz_matches_reference(text):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        expected = ref_llm.extract_json_from_text(text)
    assert extract_json_from_text(text) == expected


def test_json_repair_flattens_nothing_but_parses_lists():
    # list-valued objects survive parsing; flattening happens in the operator
    parsed = extract_json_from_text(json.dumps([{"subject": "s", "predicate": "p", "object": ["a", "b"]}]))
    assert parsed[0]["object"] == ["a", "b"]
