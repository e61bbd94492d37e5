#!/usr/bin/env python3
"""Local CLI mirroring the reference's `generate-graph` entry point
(main.py:240-317): text file in -> triples JSON + interactive HTML out.

    python scripts/generate_graph.py --input doc.txt \
        [--config config.toml] [--output knowledge_graph.html] \
        [--json-output triples.json] [--no-standardize] [--no-inference] \
        [--test]

Same flags as the reference (minus --debug's raw-LLM dump; the deterministic
extractor has no opaque responses). Runs the full Spark pipeline on
local[*]; a cluster run uses scripts/submit_pipeline.py instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)
# python workers (pandas UDFs) must import the package too, from any cwd
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)

# 21 sample triples in the spirit of the reference's --test visualization
# (main.py:261-267 / visualization.py:353-415), domain-neutralized.
SAMPLE_TRIPLES = [
    ("spark", "executes", "queries"), ("spark", "uses", "catalyst"),
    ("catalyst", "optimizes", "plans"), ("plans", "become", "stages"),
    ("stages", "contain", "tasks"), ("tasks", "run on", "executors"),
    ("executors", "read", "parquet"), ("parquet", "stores", "columns"),
    ("columns", "enable", "pruning"), ("pruning", "reduces", "io"),
    ("spark", "shuffles", "data"), ("data", "partitioned by", "keys"),
    ("keys", "hashed into", "buckets"), ("buckets", "colocate", "joins"),
    ("joins", "build", "graphs"), ("graphs", "contain", "entities"),
    ("entities", "form", "communities"), ("communities", "reveal", "topics"),
    ("topics", "summarize", "corpus"), ("corpus", "feeds", "spark"),
    ("io", "limits", "throughput"),
]


def main() -> None:
    ap = argparse.ArgumentParser(description="Knowledge Graph Generator and Visualizer")
    ap.add_argument("--test", action="store_true", help="render sample data only")
    ap.add_argument("--config", type=str, default=None, help="TOML config path")
    ap.add_argument("--output", type=str, default="knowledge_graph.html")
    ap.add_argument("--json-output", type=str, default="knowledge_graph.json")
    ap.add_argument("--input", type=str, required=False, help="input text file")
    ap.add_argument("--no-standardize", action="store_true")
    ap.add_argument("--no-inference", action="store_true")
    args = ap.parse_args()

    from ai_knowledge_graph_spark.config import load_config
    from ai_knowledge_graph_spark.graph.materialize import materialize_graph
    from ai_knowledge_graph_spark.graph.viz import render_html
    from ai_knowledge_graph_spark.session import get_spark

    spark = get_spark("generate-graph")

    if args.test:
        triples = spark.createDataFrame(
            [(s, p, o, None, 1, False) for s, p, o in SAMPLE_TRIPLES],
            "subject string, predicate string, object string, url string, chunk int, inferred boolean",
        )
    else:
        if not args.input:
            ap.error("--input is required unless --test is used")
        from ai_knowledge_graph_spark.pipeline import run_pipeline

        cfg = load_config(args.config)
        if args.no_standardize:
            cfg.setdefault("standardization", {})["enabled"] = False
        if args.no_inference:
            cfg.setdefault("inference", {})["enabled"] = False
        with open(args.input, "r", encoding="utf-8") as f:
            text = f.read()
        pages = spark.createDataFrame(
            [(os.path.abspath(args.input), None, text.encode(), text, "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        triples = run_pipeline(spark, pages, cfg)

    rows = triples.select("subject", "predicate", "object", "chunk", "inferred").collect()
    with open(args.json_output, "w", encoding="utf-8") as f:
        json.dump([r.asDict() for r in rows], f, indent=2, ensure_ascii=False)

    nodes, edges = materialize_graph(triples)
    stats = render_html(
        nodes,
        edges.select("src", "dst", "relation"),
        args.output,
        max_nodes=150,
    )
    n_inferred = sum(1 for r in rows if r["inferred"])
    print(f"Extracted {len(rows)} triples ({n_inferred} inferred)")
    print(f"Triples JSON: {os.path.abspath(args.json_output)}")
    print(f"Visualization: file://{os.path.abspath(args.output)} "
          f"({stats['nodes_rendered']} nodes, {stats['edges_rendered']} edges rendered)")


if __name__ == "__main__":
    main()
