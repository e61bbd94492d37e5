"""Entry point for the pinned parity oracle: run the reference pipeline in a
PYTHONHASHSEED=0 subprocess.

The reference leaks Python set-iteration order into its output (direction of
symmetric lexical-inference pairs, second-pass tie scans; SURVEY.md §7 D2), so
an in-process oracle drifts with the host interpreter's hash seed. Spawning
this module with PYTHONHASHSEED=0 pins the oracle to one reproducible output —
the same seed PySpark hands its python workers (pyspark/core/context.py:298),
which is what lets the engine match the oracle's tie order exactly.

Protocol: JSON spec on stdin ``{"texts": [...], "chunk_size": N, "overlap": N,
"phase": "phase1"|"standardize"|"full"}``; JSON triples on stdout. The
reference prints progress to stdout, so the real stdout is detached while it
runs and only the result JSON is written to it.
"""

from __future__ import annotations

import io
import json
import sys


def main() -> None:
    spec = json.load(sys.stdin)
    real_stdout = sys.stdout
    sys.stdout = io.StringIO()  # swallow the reference's print chatter
    try:
        from ai_knowledge_graph_spark.oracle.reference_runner import (
            DEFAULT_CONFIG,
            reference_modules,
            run_reference_phase1,
            run_reference_pipeline,
        )

        texts = spec.get("texts", [])
        chunk_size = int(spec.get("chunk_size", 100))
        overlap = int(spec.get("overlap", 20))
        phase = spec.get("phase", "full")
        if phase == "std_infer":
            # phases 2-3 over caller-provided triples (e.g. the reference's
            # shipped ict_graph_final.json artifact)
            _, ent_std, _ = reference_modules()
            out = ent_std.standardize_entities(
                [dict(t) for t in spec["triples"]], DEFAULT_CONFIG
            )
            out = ent_std.infer_relationships(out, DEFAULT_CONFIG)
        elif phase == "phase1":
            out = run_reference_phase1(texts, chunk_size, overlap)
        elif phase == "standardize":
            _, ent_std, _ = reference_modules()
            out = ent_std.standardize_entities(
                run_reference_phase1(texts, chunk_size, overlap), DEFAULT_CONFIG
            )
        elif phase == "full":
            out = run_reference_pipeline(texts, chunk_size, overlap)
        else:
            raise ValueError(f"unknown phase {phase!r}")
    finally:
        sys.stdout = real_stdout
    json.dump(out, real_stdout)


if __name__ == "__main__":
    main()
