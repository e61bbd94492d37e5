#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (north_rule): the same e2e pipeline job
at local[8] and local[32] on identical input, interleaved A/B/A/B to control
for the sandbox's time-varying throughput; reports best-of-N per size and
efficiency = (T_8 / T_32) / 4.

Writes results JSON to stdout; BENCH/BASELINE.md summarizes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("BENCH_DOCS", "16000"))
ROUNDS = int(os.environ.get("SCALING_ROUNDS", "2"))


def one_run(cores: int) -> dict:
    os.environ["SPARK_GRAFT_CODEGEN"] = "on"
    from pyspark.sql import SparkSession

    from ai_knowledge_graph_spark.fixtures import generate_bench_pages
    from ai_knowledge_graph_spark.operators.extraction import pages_to_raw_triples
    from ai_knowledge_graph_spark.operators.inference import infer_relationships
    from ai_knowledge_graph_spark.operators.standardize import standardize_triples
    from ai_knowledge_graph_spark.session import get_spark

    # IDENTICAL physical plan at both sizes: fixed partition count (the
    # cluster-size analogy is executors changing, not the partitioning).
    parts = int(os.environ.get("SCALING_PARTITIONS", "64"))
    spark = get_spark(f"scaling{cores}", master=f"local[{cores}]", shuffle_partitions=parts)
    pages = spark.createDataFrame(generate_bench_pages(N_DOCS)).localCheckpoint(eager=True)

    # untimed warm-up: JIT + python workers
    wraw = pages_to_raw_triples(pages.limit(64), 100, 20, stage_partitions=parts).localCheckpoint(eager=True)
    infer_relationships(standardize_triples(wraw).localCheckpoint(eager=True)).count()

    t0 = time.time()
    raw = pages_to_raw_triples(pages, 100, 20, stage_partitions=parts).localCheckpoint(eager=True)
    std = standardize_triples(raw).localCheckpoint(eager=True)
    fin = infer_relationships(std).localCheckpoint(eager=True)
    n = fin.count()
    sec = time.time() - t0
    spark.stop()
    return {"cores": cores, "sec": round(sec, 2), "triples": n,
            "triples_per_sec": round(n / sec, 1)}


def main() -> None:
    runs = []
    for _ in range(ROUNDS):
        for cores in (8, 32):
            r = one_run(cores)
            runs.append(r)
            print(json.dumps(r), flush=True)
    best = {c: min(r["sec"] for r in runs if r["cores"] == c) for c in (8, 32)}
    eff = (best[8] / best[32]) / 4.0
    print(json.dumps({
        "best_sec_8": best[8], "best_sec_32": best[32],
        "speedup_8_to_32": round(best[8] / best[32], 3),
        "scaling_efficiency": round(eff, 3),
        "n_docs": N_DOCS,
    }), flush=True)


if __name__ == "__main__":
    main()
