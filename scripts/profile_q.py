#!/usr/bin/env python3
"""Per-query profiler (guide §1): runs selected bench queries with the Spark
UI REST API enabled, times each with a noop sink AND the bench's .count()
action, and attributes wall time to executor run/cpu vs scheduling/driver
overhead from cumulative stage metrics. Optionally dumps explain("formatted")
to plans/r06/<name>_<tag>.txt.

Usage: python3 scripts/profile_q.py [--plans TAG] q1 q2 ...
Special names: extract/standardize/infer/components/kg_pagerank/... run the
bench's e2e stages over the synthetic corpus.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CODEGEN", "on")
os.environ["SPARK_GRAFT_UI"] = "on"

from pyspark.sql import functions as F  # noqa: E402


def _metrics(spark) -> dict:
    url = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    out = {"shuffle_write": 0, "shuffle_read": 0, "run_ms": 0, "cpu_ns": 0,
           "stages": 0, "tasks": 0, "py_ms": 0}
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
            out["stages"] += 1
            out["tasks"] += s["numCompleteTasks"]
    return out


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    if args and args[0] == "--plans":
        plans_tag = args[1]
        args = args[2:]

    from ai_knowledge_graph_spark.fixtures import generate_bench_pages
    from ai_knowledge_graph_spark.session import get_spark
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile", master=f"local[{cores}]", shuffle_partitions=cores)

    # e2e-stage pseudo-queries over the synthetic bench corpus
    sf = 0.1
    n_docs = int(os.environ.get("BENCH_DOCS", max(200, int(20000 * sf))))
    _state: dict = {}

    def _pages():
        if "pages" not in _state:
            _state["pages"] = spark.createDataFrame(
                generate_bench_pages(n_docs)
            ).localCheckpoint(eager=True)
        return _state["pages"]

    def _raw():
        if "raw" not in _state:
            from ai_knowledge_graph_spark.operators.extraction import (
                pages_to_raw_triples,
            )

            _state["raw"] = pages_to_raw_triples(
                _pages(), 100, 20, stage_partitions=32
            ).localCheckpoint(eager=True)
        return _state["raw"]

    def _std():
        if "std" not in _state:
            from ai_knowledge_graph_spark.operators.standardize import (
                standardize_triples,
            )

            _state["std"] = standardize_triples(
                _raw(), tie_order="lexicographic"
            ).localCheckpoint(eager=True)
        return _state["std"]

    def stage_query(name):
        from ai_knowledge_graph_spark.operators.components import (
            components_for_triples,
        )
        from ai_knowledge_graph_spark.operators.extraction import (
            pages_to_raw_triples,
        )
        from ai_knowledge_graph_spark.operators.inference import (
            infer_relationships,
        )
        from ai_knowledge_graph_spark.operators.standardize import (
            standardize_triples,
        )
        from ai_knowledge_graph_spark.graph.centrality import pagerank
        from ai_knowledge_graph_spark.graph.walks import lpa_communities, random_walks

        edges = lambda: _std().select(  # noqa: E731
            F.col("subject").alias("src"), F.col("object").alias("dst")
        )
        return {
            "extract": lambda: pages_to_raw_triples(
                _pages(), 100, 20, stage_partitions=32
            ),
            "standardize": lambda: standardize_triples(
                _raw(), tie_order="lexicographic"
            ),
            "infer": lambda: infer_relationships(
                _std(), pair_order="lexicographic"
            ),
            "infer_reference": lambda: infer_relationships(_std()),
            "components": lambda: components_for_triples(_std()),
            "kg_pagerank": lambda: pagerank(edges(), iterations=5),
            "kg_random_walks": lambda: random_walks(edges(), steps=4),
            "kg_lpa": lambda: lpa_communities(edges(), rounds=4),
        }[name]

    results = {}
    for name in args:
        try:
            fn = stage_query(name)
        except KeyError:
            qfn = getattr(entry_mod, f"q_{name}")
            fn = lambda qfn=qfn: qfn(spark, sf_dir)

        # warm-up run (workers + codegen), untimed
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        fn().count()

        if plans_tag:
            os.makedirs("plans/r06", exist_ok=True)
            with open(f"plans/r06/{name}_{plans_tag}.txt", "w") as f:
                f.write(fn()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))

        rec = {}
        for action in ("count", "count2"):
            spark.sparkContext.setJobDescription(f"{name}: {action}")
            base = _metrics(spark)
            t0 = time.time()
            fn().count()
            wall = time.time() - t0
            cur = _metrics(spark)
            rec[action] = {
                "wall_s": round(wall, 3),
                "executor_run_s": round((cur["run_ms"] - base["run_ms"]) / 1e3, 2),
                "executor_cpu_s": round((cur["cpu_ns"] - base["cpu_ns"]) / 1e9, 2),
                "shuffle_mb": round((cur["shuffle_write"] - base["shuffle_write"]) / 1e6, 1),
                "stages": cur["stages"] - base["stages"],
                "tasks": cur["tasks"] - base["tasks"],
            }
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    print("=== SUMMARY ===")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
