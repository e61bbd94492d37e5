#!/usr/bin/env python3
"""Noop-sink isolation bench (guide §1.4) — NOT the driver bench.

Times each named bench query by fully materializing every column through
the built-in noop data source (``df.write.format("noop")``), so the
measurement is the computation, not the sink and not count()-pruned
columns. Each query runs once untimed (workers + codegen) then
``repeats`` timed passes; prints one JSON line
``{"queries": {name: [sec, ...]}, "cores": N}``.

Usage: python3 bench_extra.py [q1 q2 ...]   (default: the heavy set)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_CODEGEN", "on")

HEAVY = [
    "e2e_crawl_kg",
    "minhash_dedup_docs",
    "minhash_lsh_pairs",
    "pq_topk",
    "bpe_merges",
    "bpe_encode",
    "textrank",
    "qlm",
    "summarize",
    "cdc_chunks",
    "hearst",
    "semdedup",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from ai_knowledge_graph_spark.session import get_spark

    names = sys.argv[1:] or HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))
    spark = get_spark("bench_extra", master=f"local[{cores}]", shuffle_partitions=cores)

    out: dict[str, list[float]] = {}
    for name in names:
        qfn = getattr(entry_mod, f"q_{name}")
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}: noop {i}")
            t0 = time.time()
            qfn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        print(json.dumps({name: runs}), flush=True)
    print(json.dumps({"queries": out, "cores": cores, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
