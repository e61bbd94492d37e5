#!/usr/bin/env python3
"""Per-pipeline-stage shuffle/CPU instrumentation for the scaling argument.

Runs the same e2e job as BENCH/scaling_run.py at one core count with the
Spark UI's REST API enabled, snapshotting cumulative stage metrics after
each pipeline stage. The scaling question it answers: when wall-clock does
not scale with cores, is the software shuffling MORE data per stage at the
larger size (a plan problem), or the SAME data with inflated per-task run
time (a memory-bus/steal ceiling)?

Usage: python3 BENCH/shuffle_probe.py <cores> [n_docs]
Prints one JSON line: per-stage {wall_s, shuffle_write_mb, shuffle_read_mb,
executor_run_s, executor_cpu_s}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics(spark) -> dict:
    url = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    out = {"shuffle_write": 0, "shuffle_read": 0, "run_ms": 0, "cpu_ns": 0}
    for status in ("complete", "active"):
        data = json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{appid}/stages?status={status}"
            )
        )
        for s in data:
            out["shuffle_write"] += s["shuffleWriteBytes"]
            out["shuffle_read"] += s["shuffleReadBytes"]
            out["run_ms"] += s["executorRunTime"]
            out["cpu_ns"] += s["executorCpuTime"]
    return out


def main(cores: int, n_docs: int) -> None:
    os.environ["SPARK_GRAFT_CODEGEN"] = "on"
    os.environ["SPARK_GRAFT_UI"] = "on"
    from pyspark.sql import SparkSession

    from ai_knowledge_graph_spark.fixtures import generate_bench_pages
    from ai_knowledge_graph_spark.operators.extraction import pages_to_raw_triples
    from ai_knowledge_graph_spark.operators.inference import infer_relationships
    from ai_knowledge_graph_spark.operators.standardize import standardize_triples
    from ai_knowledge_graph_spark.session import get_spark

    parts = int(os.environ.get("SCALING_PARTITIONS", "64"))
    spark = get_spark(
        f"probe{cores}", master=f"local[{cores}]", shuffle_partitions=parts
    )
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit("UI disabled; set SPARK_GRAFT_UI=on (session.py)")
    pages = spark.createDataFrame(generate_bench_pages(n_docs)).localCheckpoint(
        eager=True
    )
    # untimed warm-up
    wraw = pages_to_raw_triples(
        pages.limit(64), 100, 20, stage_partitions=parts
    ).localCheckpoint(eager=True)
    infer_relationships(
        standardize_triples(wraw, tie_order="lexicographic").localCheckpoint(
            eager=True
        ),
        pair_order="lexicographic",
    ).count()

    stages = {}
    base = _metrics(spark)

    def snap(name, t0):
        nonlocal base
        cur = _metrics(spark)
        stages[name] = {
            "wall_s": round(time.time() - t0, 2),
            "shuffle_write_mb": round((cur["shuffle_write"] - base["shuffle_write"]) / 1e6, 1),
            "shuffle_read_mb": round((cur["shuffle_read"] - base["shuffle_read"]) / 1e6, 1),
            "executor_run_s": round((cur["run_ms"] - base["run_ms"]) / 1e3, 1),
            "executor_cpu_s": round((cur["cpu_ns"] - base["cpu_ns"]) / 1e9, 1),
        }
        base = cur

    t = time.time()
    raw = pages_to_raw_triples(pages, 100, 20, stage_partitions=parts).localCheckpoint(
        eager=True
    )
    snap("extract", t)
    t = time.time()
    std = standardize_triples(raw, tie_order="lexicographic").localCheckpoint(
        eager=True
    )
    snap("standardize", t)
    t = time.time()
    fin = infer_relationships(std, pair_order="lexicographic").localCheckpoint(
        eager=True
    )
    n = fin.count()
    snap("infer", t)
    print(json.dumps({"cores": cores, "n_docs": n_docs, "triples": n, "stages": stages}))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 16000)
