"""Run the ACTUAL reference pipeline (read-only import) as the parity oracle.

Imports sixscripts-ai/ai-knowledge-graph from /root/reference (never copied,
never modified), stubs its optional heavy deps (pyvis/networkx/tomli), and
monkeypatches ``call_llm`` to return the deterministic extractor's output as
an LLM-shaped JSON response — so the reference's own Phase-1 code path
(extract_json_from_text -> validation -> truncation -> chunk tagging,
main.py:19-88) and its unmodified Phase 2/3 run end-to-end without a model.

The emitted (subject, predicate, object) set is the ground truth for the
P/R >= 0.95 gate. Run under PYTHONHASHSEED=0 for a stable oracle (the
reference leaks set-iteration order; see SURVEY.md §7 D2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import types

REFERENCE_PATH = "/root/reference"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_importable() -> None:
    import importlib

    for name in ("pyvis", "pyvis.network", "networkx", "community"):
        if name not in sys.modules:
            # Prefer the real package (networkx IS installed here — the
            # graph_store parity tests need the genuine one); stub only
            # what's genuinely absent (pyvis, community).
            try:
                importlib.import_module(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    if not hasattr(sys.modules["pyvis.network"], "Network"):
        sys.modules["pyvis.network"].Network = object
    if "tomli" not in sys.modules:
        import tomllib

        tomli = types.ModuleType("tomli")
        tomli.load = tomllib.load
        tomli.loads = tomllib.loads
        sys.modules["tomli"] = tomli
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def reference_modules():
    """(text_utils, entity_standardization, llm) reference modules."""
    _ensure_importable()
    from src.knowledge_graph import entity_standardization, llm, text_utils  # noqa: PLC0415

    return text_utils, entity_standardization, llm


DEFAULT_CONFIG = {
    "standardization": {"enabled": True, "use_llm_for_entities": False},
    "inference": {"enabled": True, "use_llm_for_inference": False},
}


def run_reference_phase1(
    texts: list[str], chunk_size: int = 100, overlap: int = 20
) -> list[dict]:
    """Reference Phase 1 over documents: chunk + extract + validate + tag.

    Replicates main.process_text_in_chunks' phase-1 loop (main.py:142-160)
    using the reference's own chunker and JSON-extraction path with the fake
    deterministic LLM. (main.py itself is not imported: its module pulls in
    the visualization stack; the loop is 15 lines of driver logic.)
    """
    from ..functions.extract import chunk_from_user_prompt, fake_llm_response

    text_utils, ent_std, llm = reference_modules()

    all_results: list[dict] = []
    for text in texts:
        chunks = text_utils.chunk_text(text, chunk_size, overlap)
        for i, chunk in enumerate(chunks):
            response = fake_llm_response(chunk)
            parsed = llm.extract_json_from_text(response)
            if not parsed:
                continue
            valid = [
                item
                for item in parsed
                if isinstance(item, dict)
                and all(k in item for k in ("subject", "predicate", "object"))
            ]
            for item in valid:
                item["predicate"] = ent_std.limit_predicate_length(item["predicate"])
                item["chunk"] = i + 1
            all_results.extend(valid)
    return all_results


def run_reference_pipeline(
    texts: list[str],
    chunk_size: int = 100,
    overlap: int = 20,
    config: dict | None = None,
) -> list[dict]:
    """Full reference pipeline (phases 1-3, LLM stages off) over documents."""
    _, ent_std, _ = reference_modules()
    cfg = config or DEFAULT_CONFIG
    triples = run_reference_phase1(texts, chunk_size, overlap)
    if cfg.get("standardization", {}).get("enabled", True):
        triples = ent_std.standardize_entities(triples, cfg)
    if cfg.get("inference", {}).get("enabled", True):
        triples = ent_std.infer_relationships(triples, cfg)
    return triples


def run_reference_seed0(
    texts: list[str],
    chunk_size: int = 100,
    overlap: int = 20,
    phase: str = "full",
    triples: list[dict] | None = None,
) -> list[dict]:
    """The *pinned* parity oracle: reference pipeline in a PYTHONHASHSEED=0
    subprocess (see subprocess_oracle.py). Stable across host interpreters —
    the in-process variants above drift with the pytest process's hash seed
    wherever the reference iterates a set.
    """
    env = dict(os.environ, PYTHONHASHSEED="0")
    env["PYTHONPATH"] = REPO_ROOT + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    spec = {
        "texts": texts,
        "chunk_size": chunk_size,
        "overlap": overlap,
        "phase": phase,
    }
    if triples is not None:
        spec["triples"] = triples
    proc = subprocess.run(
        [sys.executable, "-m", "ai_knowledge_graph_spark.oracle.subprocess_oracle"],
        input=json.dumps(spec),
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    return json.loads(proc.stdout)


def spo_set(triples) -> set[tuple]:
    """Order-insensitive (s, p, o) content set for P/R scoring."""
    return {(t["subject"], t["predicate"], t["object"]) for t in triples}


def precision_recall(
    engine: set[tuple], oracle: set[tuple]
) -> tuple[float, float]:
    if not engine or not oracle:
        return (float(not oracle), float(not engine))
    inter = len(engine & oracle)
    return inter / len(engine), inter / len(oracle)
