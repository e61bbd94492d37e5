"""JSON extraction/repair for LLM-shaped responses (pure, UDF-friendly).

Semantics source: reference llm.py:63-163 (``extract_json_from_text``). The
engine runs this inside an Arrow-batched pandas UDF when ingesting raw
LLM-response strings (operator P3 in SURVEY.md §2.11); byte-parity with the
reference matters because malformed-response recovery changes which triples
exist downstream.

Recovery ladder (same order as the reference):
  1. prefer the first ``` / ```json fenced block, if any;
  2. parse the whole text directly;
  3. bracket-match the first complete top-level ``[...]`` array and parse it,
     with a fix-up pass (quote bare keys, drop trailing commas) on failure;
  4. if the array never closes, harvest every complete ``{...}`` object after
     the ``[`` and rebuild an array from them, same fix-up pass on failure;
  5. give up -> None.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"```(?:json)?\s*([\s\S]*?)```")
_BARE_KEY_RE = re.compile(r"(\s*)(\w+)(\s*):(\s*)")
_TRAILING_COMMA_RE = re.compile(r",(\s*[\]}])")


def _fixup(candidate: str):
    repaired = _BARE_KEY_RE.sub(r'\1"\2"\3:\4', candidate)
    repaired = _TRAILING_COMMA_RE.sub(r"\1", repaired)
    try:
        return json.loads(repaired)
    except Exception:
        return None


def extract_json_from_text(text: str):
    """Best-effort extraction of a JSON value from free-form model output."""
    m = _FENCE_RE.search(text)
    if m:
        text = m.group(1).strip()

    try:
        return json.loads(text)
    except json.JSONDecodeError:
        pass

    start = text.find("[")
    if start == -1:
        return None

    depth = 0
    end = -1
    for i in range(start, len(text)):
        ch = text[i]
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                end = i
                break

    if end != -1:
        candidate = text[start : end + 1]
        try:
            return json.loads(candidate)
        except json.JSONDecodeError:
            return _fixup(candidate)

    # Unterminated array: rebuild from the complete objects inside it.
    objects: list[str] = []
    brace_depth = 0
    obj_start = -1
    for i in range(start + 1, len(text)):
        ch = text[i]
        if ch == "{":
            if brace_depth == 0:
                obj_start = i
            brace_depth += 1
        elif ch == "}":
            brace_depth -= 1
            if brace_depth == 0:
                objects.append(text[obj_start : i + 1])
    if not objects:
        return None
    rebuilt = "[\n" + ",\n".join(objects) + "\n]"
    try:
        return json.loads(rebuilt)
    except json.JSONDecodeError:
        return _fixup(rebuilt)
