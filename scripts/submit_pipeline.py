#!/usr/bin/env python3
"""spark-submit entry point for the KG-construction pipeline.

Cluster usage (north_rule execution shape):

    scripts/package.sh   # builds dist/ai_knowledge_graph_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/ai_knowledge_graph_spark.zip \
        scripts/submit_pipeline.py \
        --input  s3://bucket/pages/      \
        --output s3://bucket/kg/         \
        --checkpoint-dir s3://bucket/ckpt/run1

The session comes from ``SparkSession.getOrCreate`` with no master override,
so spark-submit's ``--master`` / executor conf govern placement; the engine
only adds its semantic settings (Arrow, AQE, UTC). Any stage already
committed under --checkpoint-dir is read back, not recomputed (idempotent
resume with per-partition lineage; see ai_knowledge_graph_spark/lineage.py).

Input: parquet/Iceberg directory of pages
(url string, warc_ts timestamp, html binary, text string, lang string).
Output: <output>/triples (parquet) + <output>/nodes + <output>/edges
(entity-hash bucketed) + one metrics JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet/Iceberg path")
    ap.add_argument("--output", required=True, help="output root for triples/nodes/edges")
    ap.add_argument("--checkpoint-dir", default=None, help="stage checkpoint root (resume)")
    ap.add_argument("--chunk-size", type=int, default=100)
    ap.add_argument("--overlap", type=int, default=20)
    ap.add_argument("--stage-partitions", type=int, default=None,
                    help="explicit repartition width between stages (default: 2x default parallelism)")
    ap.add_argument("--pair-order", default="lexicographic",
                    choices=["lexicographic", "reference"],
                    help="symmetric lexical-pair direction: 'reference' replays the "
                         "reference's set order (parity runs); 'lexicographic' is the "
                         "web-scale default")
    ap.add_argument("--tie-order", default="lexicographic",
                    choices=["lexicographic", "reference"],
                    help="standardization second-pass tie order (same modes)")
    ap.add_argument("--max-block-size", type=int, default=0,
                    help=">0 drops lexical blocking tokens hotter than this (skew guard)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.config import load_config
    from ai_knowledge_graph_spark.graph.materialize import materialize_graph
    from ai_knowledge_graph_spark.pipeline import run_pipeline
    from ai_knowledge_graph_spark.session import get_spark

    spark = get_spark("kg-construct")  # master/conf come from spark-submit

    cfg = load_config()
    cfg["chunking"] = {"chunk_size": args.chunk_size, "overlap": args.overlap}
    cfg.setdefault("engine", {})
    cfg.setdefault("inference", {})
    cfg["inference"]["pair_order"] = args.pair_order
    cfg.setdefault("standardization", {})
    cfg["standardization"]["tie_order"] = args.tie_order
    cfg["engine"]["max_block_size"] = args.max_block_size
    parts = args.stage_partitions or spark.sparkContext.defaultParallelism * 2
    cfg["engine"]["stage_partitions"] = parts
    if args.checkpoint_dir:
        cfg["engine"]["checkpoint_dir"] = args.checkpoint_dir

    t0 = time.time()
    pages = spark.read.parquet(args.input)
    triples = run_pipeline(spark, pages, cfg)
    triples.write.mode("overwrite").parquet(f"{args.output}/triples")
    n_triples = spark.read.parquet(f"{args.output}/triples").count()

    # Path-based parquet output, repartitioned on the entity-hash keys so each
    # file holds one hash range (a catalog deployment uses
    # graph.materialize.write_graph_tables / Iceberg writeTo instead, which
    # adds the bucket spec the planner can exploit).
    nodes, edges = materialize_graph(spark.read.parquet(f"{args.output}/triples"))
    nodes.repartition(parts, F.col("canonical_id")).write.mode("overwrite").parquet(
        f"{args.output}/nodes"
    )
    edges.repartition(parts, F.col("src_id")).write.mode("overwrite").parquet(
        f"{args.output}/edges"
    )
    sec = time.time() - t0

    print(json.dumps({
        "triples": n_triples,
        "nodes": spark.read.parquet(f"{args.output}/nodes").count(),
        "edges": spark.read.parquet(f"{args.output}/edges").count(),
        "sec": round(sec, 2),
        "triples_per_sec": round(n_triples / sec, 1),
        "stage_partitions": parts,
    }))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
