"""Engine configuration: TOML -> nested dict, driver-side, values broadcast.

Mirrors the reference's config surface (config.py:5-20, config.toml) with the
same keys so a reference config file loads unchanged; adds engine-only knobs
under ``[engine]`` (partitioning, checkpointing, blocking caps).
"""

from __future__ import annotations

import copy
import tomllib
from typing import Any

DEFAULTS: dict[str, Any] = {
    "chunking": {"chunk_size": 500, "overlap": 50},  # reference config.toml:20-22
    # tie_order / pair_order: "auto" (default) switches between the exact
    # reference-replay order ("reference", single-task set-order replay —
    # cheap below engine.auto_order_threshold entities) and the fully
    # distributed "lexicographic" order above it.
    "standardization": {
        "enabled": True,
        "use_llm_for_entities": False,
        "tie_order": "auto",
    },
    "inference": {
        "enabled": True,
        "use_llm_for_inference": False,
        "apply_transitive": True,
        "pair_order": "auto",
    },
    "llm": {},  # model/base_url/api_key when an actual endpoint is wired in
    "engine": {
        # Shuffle/partition knobs; sized per input at submit time for a real
        # cluster, defaulted for local[32] tests.
        "shuffle_partitions": 32,
        # Explicit stage-boundary repartition width (north_rule: explicit
        # repartitioning between extract / canonicalize / materialize).
        "stage_partitions": 32,
        # Cap on pair-generation block size for the lexical-similarity join;
        # 0 = exact/unbounded (parity mode). At web scale a hot token would
        # otherwise emit O(n^2) pairs within its block.
        "max_block_size": 0,
        # Connected-components iteration cap (safety, converges way earlier).
        "cc_max_iterations": 50,
        # Vocabulary size at which tie_order/pair_order "auto" switches from
        # exact reference-replay to the distributed lexicographic order.
        "auto_order_threshold": 200_000,
        "checkpoint_dir": None,  # parquet stage-checkpoint root (None = off)
    },
}


def _merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(path: str | None = None) -> dict[str, Any]:
    """Load TOML config merged over DEFAULTS; ``None`` -> pure defaults."""
    if path is None:
        return copy.deepcopy(DEFAULTS)
    with open(path, "rb") as f:
        return _merge(DEFAULTS, tomllib.load(f))
