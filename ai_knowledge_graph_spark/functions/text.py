"""Pure text functions — the deterministic core shared by Spark UDFs and oracles.

Each function reproduces the observable semantics of a reference function
(cited per-function) but is written for vectorized batch execution: the Spark
side calls these from Arrow-batched pandas UDFs, the test oracle calls them
single-node, so both sides share bytes exactly.
"""

from __future__ import annotations

import html as _html
import re

# Stopword set used when normalizing entity names for grouping.
# Semantics source: reference entity_standardization.py:81.
NORMALIZE_STOPWORDS = frozenset(
    ("the", "a", "an", "of", "and", "or", "in", "on", "at", "to", "for", "with", "by", "as")
)

# Trailing words stripped from a truncated predicate.
# Semantics source: reference entity_standardization.py:26.
PREDICATE_TRAILING_STOPWORDS = frozenset(
    ("a", "an", "the", "of", "with", "by", "to", "from", "in", "on", "for")
)

# Python \w / \b are unicode-aware; the oracle (reference
# entity_standardization.py:82) relies on that, so we share the same regex.
_WORD_RE = re.compile(r"\b\w+\b")


def chunk_text(text: str, chunk_size: int = 500, overlap: int = 50) -> list[str]:
    """Split ``text`` into overlapping word windows.

    Semantics source: reference text_utils.py:5-46. Two byte-parity traps
    reproduced here:

    * a document of <= chunk_size words is returned as ONE chunk containing
      the *original* string (whitespace runs preserved), not re-joined words
      (text_utils.py:21-22);
    * after the last full window, if the residual start position still lies
      before the end, the remaining words are emitted as an extra, fully
      overlapping tail chunk (text_utils.py:40-44) — e.g. a 966-word doc at
      size=100/overlap=20 yields 13 chunks, the last being 20 words that were
      all already covered.

    Divergence (deliberate): for chunk_size < 2*overlap the reference's loop
    never terminates once the window hits the end of the document
    (text_utils.py:36-43: start resets to n-overlap every iteration and the
    tail condition start+chunk_size-overlap >= n is never met), appending the
    same tail chunk forever. The reference produces NO output on that domain,
    so there is nothing to be parity with; this version stops at the first
    non-advancing iteration instead of hanging the executor.
    """
    words = text.split()
    n = len(words)
    if n <= chunk_size:
        return [text]

    chunks: list[str] = []
    start = 0
    while start < n:
        end = min(start + chunk_size, n)
        chunks.append(" ".join(words[start:end]))
        prev = start
        start = end - overlap
        if start < n and start + chunk_size - overlap >= n:
            chunks.append(" ".join(words[start:]))
            break
        if start <= prev:  # non-terminating reference domain — stop cleanly
            break
    return chunks


def limit_predicate_length(predicate: str, max_words: int = 3) -> str:
    """Cap a predicate at ``max_words`` words, then drop a trailing stopword.

    Semantics source: reference entity_standardization.py:7-31. The stopword
    strip only applies when truncation happened, and only to the (lowercased)
    final kept word.
    """
    words = predicate.split()
    if len(words) <= max_words:
        return predicate
    kept = words[:max_words]
    if kept and kept[-1].lower() in PREDICATE_TRAILING_STOPWORDS:
        kept = kept[:-1]
    return " ".join(kept)


def normalize_entity(text: str) -> str:
    """Lowercase, tokenize on ``\\b\\w+\\b`` and drop grouping stopwords.

    Semantics source: reference entity_standardization.py:77-83 (the
    ``normalize_text`` helper used to group entity variants). Returns ""
    for entities made only of stopwords/punctuation — callers must treat
    an empty result as "ungroupable" (the reference skips those, :91).
    """
    toks = _WORD_RE.findall(text.lower())
    return " ".join(t for t in toks if t not in NORMALIZE_STOPWORDS)


# --- HTML <-> text (input_hint invariant: byte-identical extract per url) ---

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>[\s\S]*?</\1\s*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<[^>]*>")


def wrap_text_as_html(text: str) -> bytes:
    """Deterministically wrap plain text into a minimal HTML page (fixture side)."""
    return (
        "<html><body><p>" + _html.escape(text) + "</p></body></html>"
    ).encode("utf-8")


def html_to_text(payload: bytes | str) -> str:
    """Extract text from HTML: drop script/style, strip tags, unescape entities.

    Pure and deterministic; ``html_to_text(wrap_text_as_html(t)) == t``
    byte-for-byte, which is the per-row invariant the pipeline is gated on
    (the reference itself reads .txt files whole — main.py:283-284 — so this
    extractor is pinned by its own round-trip property, not by reference code).
    """
    s = payload.decode("utf-8") if isinstance(payload, (bytes, bytearray)) else payload
    s = _SCRIPT_STYLE_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _html.unescape(s)


def word_count(text: str) -> int:
    """Whitespace word count with python str.split() semantics (main.py:147)."""
    return len(text.split())
