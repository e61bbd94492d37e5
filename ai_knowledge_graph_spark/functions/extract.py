"""Deterministic rule-based triple extraction (the pinned stand-in for the LLM).

The reference's Phase 1 sends each chunk to an LLM and parses SPO triples out
of the response (main.py:19-88, llm.py:6-61). That is inherently
non-reproducible, so — per the build plan (SURVEY.md §7 D1) — the engine ships
a deterministic candidate-span extractor honoring the same output contract as
the reference prompt (prompts/main_prompts.py: lowercase everything, concise
entities, short predicates): per sentence, the first token found in a fixed
relation-verb lexicon splits the sentence into subject / predicate / object
spans.

The SAME pure function drives:
  * the Spark engine (mapInPandas over chunk batches),
  * the single-node oracle (monkeypatched into the reference pipeline as a
    fake ``call_llm`` returning the triples as a JSON array), and
  * a DuckDB SQL mirror (__spark_entry__.oracle_sql) for the driver gate —
so Phase-1 parity is exact and all downstream-phase semantics are testable.
"""

from __future__ import annotations

import json
import re

# Verb lexicon. Includes generic KG relation verbs for the synthetic `pages`
# fixture AND a handful of tokens present in the driver-provided `documents`
# vocabulary (join/merge/group/filter/sort/scan) so extraction over
# /root/testdata documents yields non-empty graphs.
RELATION_VERBS = frozenset(
    (
        "is", "are", "was", "were", "has", "have", "uses", "includes",
        "produces", "requires", "enables", "causes", "supports", "contains",
        "employs", "drives", "powers", "influences", "precedes", "created",
        "led", "became", "improved", "replaced",
        # tokens that double as verbs in the driver-provided documents vocab
        "join", "merge", "group", "filter", "sort", "scan",
    )
)

# Function words that may extend a predicate after the verb ("led to the ...").
PREDICATE_FUNCTION_WORDS = frozenset(("a", "an", "the", "to", "of", "with"))

MAX_PREDICATE_EXTRA = 3   # verb + up to 3 function words (so F3 truncation fires)
MAX_ENTITY_WORDS = 4      # entity span cap on each side of the predicate

_SENTENCE_SPLIT_RE = re.compile(r"[.!?]+")


def extract_triples(chunk: str) -> list[dict]:
    """Extract SPO triples from one chunk of text. Pure and deterministic.

    Rule: per sentence, locate the first token in RELATION_VERBS; the
    predicate is that verb plus up to MAX_PREDICATE_EXTRA consecutive
    following function words; subject = last MAX_ENTITY_WORDS tokens before
    the verb; object = first MAX_ENTITY_WORDS tokens after the predicate.
    Everything lowercased (the reference prompt mandates lowercase output,
    prompts/main_prompts.py). Sentences without a verb, subject or object
    emit nothing.
    """
    triples: list[dict] = []
    for sentence in _SENTENCE_SPLIT_RE.split(chunk):
        toks = sentence.split()
        verb_idx = -1
        for i, tok in enumerate(toks):
            if tok.lower() in RELATION_VERBS:
                verb_idx = i
                break
        if verb_idx <= 0:  # no verb, or no subject tokens before it
            continue
        pred_end = verb_idx + 1
        while (
            pred_end < len(toks)
            and pred_end - verb_idx - 1 < MAX_PREDICATE_EXTRA
            and toks[pred_end].lower() in PREDICATE_FUNCTION_WORDS
        ):
            pred_end += 1
        obj_toks = toks[pred_end : pred_end + MAX_ENTITY_WORDS]
        if not obj_toks:
            continue
        subj_toks = toks[max(0, verb_idx - MAX_ENTITY_WORDS) : verb_idx]
        triples.append(
            {
                "subject": " ".join(t.lower() for t in subj_toks),
                "predicate": " ".join(t.lower() for t in toks[verb_idx:pred_end]),
                "object": " ".join(t.lower() for t in obj_toks),
            }
        )
    return triples


def fake_llm_response(chunk: str) -> str:
    """Render the extractor output as an LLM-shaped JSON response string.

    Used to monkeypatch the reference's ``call_llm`` so its *unmodified*
    Phase-1 code path (extract_json_from_text -> validation -> predicate
    truncation -> chunk tagging, main.py:19-88,142-160) runs over the same
    deterministic extraction — that pinned run is the P/R oracle.
    """
    return "```json\n" + json.dumps(extract_triples(chunk)) + "\n```"


_PROMPT_CHUNK_RE = re.compile(r"```\n([\s\S]*?)```\n$")


def chunk_from_user_prompt(user_prompt: str) -> str:
    """Recover the chunk text from the reference's user prompt wrapper.

    The reference appends the chunk as a fenced block to the user prompt
    (main.py:34: ``user_prompt += f"```\\n{input_text}```\\n"``).
    """
    m = _PROMPT_CHUNK_RE.search(user_prompt)
    return m.group(1) if m else user_prompt
