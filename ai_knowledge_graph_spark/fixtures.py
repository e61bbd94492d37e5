"""Deterministic synthetic ``pages`` fixture (FIXTURES.md §1 shape).

One row per Common-Crawl-style page: (url, warc_ts, html, text, lang).
Text is built from a fixed vocabulary of entity names + relation verbs as
S-V-O sentences so the rule-based extractor has known-true triples; entity
variant families (stopword-padded, word-subset, shared-stem) exercise the
standardization merge rules (reference entity_standardization.py:77-155).

Generation is deterministic per doc_id (numpy RandomState(42 + doc_id)), so
any requested row count yields a stable prefix — no wall-clock, no global
RNG state. No external data.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from .functions.text import wrap_text_as_html

# Entity vocabulary with deliberate variant families:
#  - "steam engine" / "the steam engine"        -> same normalized form
#  - "factory" / "factory system"               -> word-subset merge
#  - "capitalism" / "capitalist economy"        -> shared 4-char stem ("capi")
#  - "industrial revolution" / "industrialization" -> shared stem ("indu")
ENTITIES = (
    "steam engine",
    "the steam engine",
    "industrial revolution",
    "industrialization",
    "capitalism",
    "capitalist economy",
    "factory",
    "factory system",
    "textile industry",
    "railway network",
    "coal mining",
    "steel production",
    "labor union",
    "urban population",
    "cotton mill",
    "telegraph system",
    "water power",
    "market economy",
    "working class",
    "mass production",
    "printing press",
    "scientific method",
    "trade route",
    "merchant guild",
)

# Verb phrases; single-token heads are in extract.RELATION_VERBS, and the
# multi-word ones exercise predicate function-word absorption.
VERB_PHRASES = (
    "powers",
    "requires",
    "includes",
    "produces",
    "enables",
    "causes",
    "supports",
    "drives",
    "influences",
    "led to",
    "is",
    "has",
    "uses",
)

BASE_TS = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)


def _doc_text(doc_id: int) -> str:
    rng = np.random.RandomState(42 + doc_id)
    # Word budget 20..1200 (FIXTURES.md); sentences average ~7 words.
    target_words = int(rng.randint(20, 1201))
    sentences: list[str] = []
    words = 0
    while words < target_words:
        subj = ENTITIES[rng.randint(len(ENTITIES))]
        verb = VERB_PHRASES[rng.randint(len(VERB_PHRASES))]
        # ~2% deliberate self-loops (exercise F2 after standardization).
        obj = subj if rng.rand() < 0.02 else ENTITIES[rng.randint(len(ENTITIES))]
        sep = "  " if rng.rand() < 0.05 else " "  # whitespace-run trap (str.split parity)
        sentences.append(f"{subj}{sep}{verb} {obj}.")
        words += len(sentences[-1].split())
    joiner = "\n" if rng.rand() < 0.05 else " "
    return joiner.join(sentences)


def generate_pages(n_docs: int) -> pd.DataFrame:
    """Build the pages table as a pandas DataFrame (write with to_parquet)."""
    rows = []
    for doc_id in range(n_docs):
        rng = np.random.RandomState(10_000 + doc_id)
        if doc_id % 97 == 0:
            text = ""  # empty-text edge case
        elif doc_id % 31 == 0 and doc_id > 0:
            text = _doc_text(doc_id - 1)  # exact-duplicate content (dedup row)
        else:
            text = _doc_text(doc_id)
        lang = "en" if rng.rand() < 0.95 else ("de" if rng.rand() < 0.5 else "fr")
        rows.append(
            {
                "url": f"https://example.org/{doc_id % 100:04d}/doc{doc_id:06d}",
                "warc_ts": BASE_TS + _dt.timedelta(minutes=doc_id),
                "html": wrap_text_as_html(text),
                "text": text,
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def write_pages_parquet(path: str, n_docs: int) -> str:
    generate_pages(n_docs).to_parquet(path, index=False)
    return path


# --- bench corpus: realistic entity-vocabulary scaling ----------------------

_ADJECTIVES = (
    "industrial", "mechanical", "electric", "urban", "rural", "colonial",
    "maritime", "agrarian", "scientific", "commercial", "imperial", "modern",
    "ancient", "medieval", "global", "regional", "national", "provincial",
    "coastal", "northern", "southern", "eastern", "western", "central",
    "revolutionary", "traditional", "emerging", "declining", "dominant",
    "marginal", "skilled", "unskilled", "organized", "independent",
    "municipal", "federal", "private", "public", "chartered", "royal",
)

_NOUNS = (
    "railway", "factory", "mill", "foundry", "shipyard", "canal", "turnpike",
    "telegraph", "press", "guild", "union", "market", "exchange", "bank",
    "colony", "port", "mine", "furnace", "loom", "spindle", "engine",
    "workshop", "warehouse", "dockyard", "academy", "society", "institute",
    "council", "assembly", "parliament", "navy", "fleet", "regiment",
    "economy", "industry", "trade", "commerce", "empire", "republic",
    "province",
)


def bench_vocabulary() -> list[str]:
    """~1,600 two-word entities ("industrial railway", ...) — realistic
    entity *reuse* (the property the driver-provided word-soup documents
    lack: there nearly every 4-token span is a unique entity, which makes
    the reference's inherently O(n^2) second pass degenerate)."""
    return [f"{a} {n}" for a in _ADJECTIVES for n in _NOUNS]


def _bench_doc_text(doc_id: int, vocab: list[str]) -> str:
    rng = np.random.RandomState(77_000 + doc_id)
    target_words = int(rng.randint(200, 1000))
    # Zipf-ish entity popularity so counts/canonical selection are non-trivial.
    ranks = rng.zipf(1.3, size=target_words // 3) % len(vocab)
    sentences, words, k = [], 0, 0
    while words < target_words and k + 1 < len(ranks):
        subj = vocab[int(ranks[k])]
        obj = vocab[int(ranks[k + 1])]
        verb = VERB_PHRASES[int(rng.randint(len(VERB_PHRASES)))]
        sentences.append(f"{subj} {verb} {obj}.")
        words += len(sentences[-1].split())
        k += 2
    return " ".join(sentences)


def generate_bench_pages(n_docs: int) -> pd.DataFrame:
    """Deterministic bench corpus; ~600 words/doc over the bench vocabulary."""
    vocab = bench_vocabulary()
    rows = []
    for doc_id in range(n_docs):
        text = _bench_doc_text(doc_id, vocab)
        rows.append(
            {
                "url": f"https://bench.example.org/doc{doc_id:09d}",
                "warc_ts": BASE_TS + _dt.timedelta(minutes=doc_id),
                "html": wrap_text_as_html(text),
                "text": text,
                "lang": "en",
            }
        )
    return pd.DataFrame(rows)
