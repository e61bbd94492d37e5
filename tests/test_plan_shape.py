"""Physical-plan shape assertions — the scale contract, not just results.

Locks in the properties that make the pipeline viable at 100 TB: the
vocabulary-sized mapping join is a broadcast hash join (never a shuffle of
the triple fact table), parquet scans prune columns and push filters, and no
stage degenerates into a cartesian product.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_mapping_apply_is_broadcast(spark, raw_triples):
    # J1: variant->canonical mapping ≪ triples — must broadcast, not shuffle
    from ai_knowledge_graph_spark.operators.standardize import (
        apply_standardization,
        build_entity_mapping,
    )

    mapping = build_entity_mapping(raw_triples, tie_order="lexicographic")
    plan = _plan(apply_standardization(raw_triples, mapping))
    assert plan.count("BroadcastHashJoin") >= 2  # subject + object side
    assert "CartesianProduct" not in plan


def test_clean_triples_merge_map_is_broadcast(spark, raw_triples):
    # F9: 18-rule predicate merge map is a literal dim table — broadcast
    from ai_knowledge_graph_spark.operators.cleaning import clean_triples

    plan = _plan(clean_triples(raw_triples))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_parquet_scan_prunes_columns(spark):
    # Chunker consumes (url, text) only; scan must not read lang/source/n_chars
    from ai_knowledge_graph_spark.operators.chunking import chunk_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.format_string("doc%012d", F.col("doc_id")).alias("url"), "text"
    )
    plan = _plan(chunk_pages(pages, 20, 5))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, plan
    line = scan[0]
    assert "text" in line and "doc_id" in line
    for dropped in ("lang", "source", "n_chars"):
        assert dropped not in line, line


def test_parquet_filter_pushdown(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(docs.filter(F.col("doc_id") < 50).select("doc_id", "text"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "LessThan(doc_id,50)" in pushed[0], plan


def test_inference_has_no_cartesian(spark, raw_triples):
    # Transitive + lexical inference: blocked equi-joins only. The one
    # intentional nested-loop is the broadcast containment pass over the
    # <4-char entity slice (bounded by the broadcast side); a plain
    # CartesianProduct would be quadratic in the entity vocabulary.
    from ai_knowledge_graph_spark.operators.inference import infer_relationships
    from ai_knowledge_graph_spark.operators.standardize import standardize_triples

    std = standardize_triples(raw_triples, tie_order="lexicographic")
    plan = _plan(infer_relationships(std, pair_order="lexicographic"))
    assert "CartesianProduct" not in plan


def test_score_models_broadcasts_detected(spark):
    from ai_knowledge_graph_spark.graph.logic import score_models

    requirements = spark.createDataFrame(
        [("m1", "needs alpha"), ("m2", "needs beta")], "model string, requirement string"
    )
    detected = spark.createDataFrame([("alpha",)], "concept string")
    plan = _plan(score_models(requirements, detected))
    # detected side is broadcast: nested-loop join bounded by the signal set
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_embedding_near_dup_is_bucket_equijoin(spark):
    # candidates come from SRP-bucket equi-joins; never a cross product
    from ai_knowledge_graph_spark.operators.similarity import embedding_near_dup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(embedding_near_dup(emb, threshold=0.3, dim=64, tables=2))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_incremental_near_dup_probe_is_equijoin(spark):
    # the new-batch probe into stored corpus buckets must be a (band, bucket)
    # equi-join — O(batch) probe, never an O(corpus) cross product
    from ai_knowledge_graph_spark.operators.dedup import (
        band_buckets,
        incremental_near_dup,
        minhash_signatures,
        shingles,
    )

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(shingles(corpus))
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta doc 0")], "doc_id long, text string"
    )
    plan = _plan(incremental_near_dup(new, sigs, band_buckets(sigs)))
    assert "CartesianProduct" not in plan


def test_vector_search_broadcasts_query(spark):
    # the one-row query side must broadcast; the chunk corpus streams
    from ai_knowledge_graph_spark.graph.retrieve import vector_search_chunks

    chunks = spark.createDataFrame(
        [(i, f"s{i}", f"text {i}", [float(i), 1.0]) for i in range(50)],
        "chunk_id long, source string, text string, embedding array<double>",
    )
    plan = _plan(vector_search_chunks(chunks, [1.0, 0.0], k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_multi_hop_qa_no_cartesian(spark):
    from ai_knowledge_graph_spark.operators.training import multi_hop_qa

    edges = spark.createDataFrame(
        [("a", "r", "b"), ("b", "r", "c")], "src string, relation string, dst string"
    )
    plan = _plan(multi_hop_qa(edges))
    assert "CartesianProduct" not in plan


def test_latest_snapshot_is_one_agg_no_window(spark):
    # as-of dedup must be a single map-side-combinable aggregation: one
    # shuffle, no window sort (a window over url would buffer per-key row
    # groups — the shape that dies at 10^12 rows)
    from ai_knowledge_graph_spark.operators.webcrawl import latest_snapshot

    df = spark.range(100).select(
        (F.col("id") % 10).cast("string").alias("url"),
        F.timestamp_seconds(F.col("id")).alias("warc_ts"),
        F.col("id").alias("doc_id"),
    )
    plan = _plan(latest_snapshot(df, tie_cols=("doc_id",)))
    assert "Window" not in plan
    # formatted mode lists each node twice (tree + detail): one Exchange node
    assert plan.count("+- Exchange") == 1, plan
    # map-side combine must be present: the Exchange carries one candidate
    # row per (partition, url), not the full table (the SortAggregate pair
    # with a LOCAL pre-agg sort is expected — struct buffers aren't
    # hash-aggregable; see latest_snapshot docstring)
    assert "partial_max_by" in plan


def test_repetition_stats_no_window_no_cartesian(spark):
    from ai_knowledge_graph_spark.operators.webcrawl import repetition_stats

    df = spark.createDataFrame(
        [(0, "a b c a b")], "doc_id long, text string"
    )
    plan = _plan(repetition_stats(df))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_html_extract_is_arrow_batched(spark):
    # the extractor must run as an Arrow-batched pandas UDF (ArrowEvalPython),
    # never a row-at-a-time BatchEvalPython
    from ai_knowledge_graph_spark.operators.webcrawl import (
        extract_html_text,
        wrap_html_expr,
    )

    df = spark.createDataFrame([("hello world",)], "text string")
    pages = df.select(wrap_html_expr("text").alias("html"))
    plan = _plan(extract_html_text(pages))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_exact_substring_no_cartesian_and_linear_joins(spark):
    # The removal path must be equi-joins (hash h / (doc,pos)) — never a
    # cartesian — and the window-hash projection must stay JVM-side (no
    # Python UDF in the plan)
    from ai_knowledge_graph_spark.operators.curation import (
        exact_substring_dedup,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} a b c d e f") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(exact_substring_dedup(docs, k=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dsir_ratio_join_is_broadcast(spark):
    # The n_buckets-row log-ratio table is a broadcast dim at ANY corpus
    # size; the per-doc score must be one hash agg over the gram explode
    from ai_knowledge_graph_spark.operators.dsir import dsir_weights

    raw = spark.createDataFrame(
        [(i, f"tok{i} alpha beta") for i in range(30)],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )
    plan = _plan(dsir_weights(raw, tgt, n_buckets=64))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semdedup_pairwise_is_cluster_equijoin(spark):
    # The quadratic stage must be a self-equi-join ON centroid_id; the only
    # nested-loop allowed is the broadcast of the nlist-row centroid dim
    from ai_knowledge_graph_spark.operators.similarity import semdedup

    emb = spark.createDataFrame(
        [(i, [float((i * 3 + d) % 7) for d in range(4)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(semdedup(emb, threshold=0.99, nlist=4))
    assert "CartesianProduct" not in plan
    # centroid assignment: broadcast nested loop over the tiny dim is fine,
    # but the pair join itself must hash on centroid_id
    assert "centroid_id" in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 1


def test_frontier_budget_rank_is_two_phase_bucketed(spark):
    # round 4: with a crawl budget, the first window partitions by
    # (host, bucket) — per-reducer input |host|/n_buckets — and only the
    # <= n_buckets*cap survivors reach the per-host exact window; no
    # unbudgeted full-host sort appears
    from ai_knowledge_graph_spark.operators.webcrawl import frontier_schedule

    urls = spark.createDataFrame(
        [(f"https://h{i % 3}.example.com/p{i}", i) for i in range(50)],
        "url string, priority long",
    )
    plan = _plan(
        frontier_schedule(urls, k_per_host=4, max_per_host=5, priority_col="priority")
    )
    assert plan.count("Window") >= 2  # bucket-rank phase + exact phase
    assert "pmod" in plan  # the salt bucket is part of the first partition key
    assert "CartesianProduct" not in plan

    # unbudgeted: exactly one window, documented skew exposure
    plan1 = _plan(frontier_schedule(urls, k_per_host=4))
    assert "pmod" not in plan1


def test_ivfpq_scan_is_list_equijoin_with_broadcast_queries(spark):
    # round 4: the code scan joins queries on centroid_id (never a code x
    # query cartesian), the query side is broadcast, and the corpus float
    # vectors do not appear in the scan-side join input (codes only)
    from ai_knowledge_graph_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    plan = _plan(ivfpq_topk(emb, q, k=3, nlist=4, n_probe=2, m=4, ksub=8))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_e2e_crawl_kg_latest_is_agg_not_window(spark):
    # round 4: the as-of dedup inside the e2e composition stays the
    # map-side-combinable max_by aggregation (SortAggregate with partial),
    # not a full-table window
    import __spark_entry__ as entry_mod

    df = entry_mod.q_e2e_crawl_kg(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "max_by" in plan
    assert "CartesianProduct" not in plan


def test_rule_mining_no_cartesian_and_partial_aggs(spark):
    # kgops.mine_rules: body join + head join must be hash equijoins; the
    # support/body counts must map-side combine (partial_count present).
    from pyspark.sql import Row

    from ai_knowledge_graph_spark.graph.kgops import mine_rules

    spo = spark.createDataFrame(
        [Row(subject=f"e{i}", predicate=f"p{i % 3}", object=f"e{i + 1}")
         for i in range(50)]
    )
    plan = _plan(mine_rules(spo, min_support=1))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side combine on both aggregations


def test_entity_roles_is_struct_agg_not_window(spark):
    # kgops.entity_roles: dominant predicate via min(struct) aggregation —
    # no Window over entity groups (a window would sort every entity's
    # predicate list; the struct-min stays a hash/sort agg with a partial).
    from pyspark.sql import Row

    from ai_knowledge_graph_spark.graph.kgops import entity_roles

    spo = spark.createDataFrame(
        [Row(subject=f"e{i % 7}", predicate=f"p{i % 3}", object=f"e{i % 5}")
         for i in range(40)]
    )
    plan = _plan(entity_roles(spo))
    assert "Window" not in plan
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_distmult_joins_are_broadcast(spark):
    # round 5: DistMult vector attachment = three vocab-sized broadcast
    # hash joins on the spo spine (same contract as transe_score)
    from ai_knowledge_graph_spark.graph.kgops import distmult_score

    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("a", "q", "c")],
        ["subject", "predicate", "object"],
    )
    plan = _plan(distmult_score(triples, dim=4))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_link_prediction_candidate_grid_is_broadcast_nested_loop(spark):
    # round 5: the eval protocol's test x |E| candidate grid must be a
    # BROADCAST nested loop (vocab-sized vector table shipped to the
    # hash-sampled test side) — never a shuffled cartesian
    from ai_knowledge_graph_spark.graph.kgops import link_prediction_eval

    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("a", "q", "c"), ("c", "p", "a")],
        ["subject", "predicate", "object"],
    )
    plan = _plan(link_prediction_eval(triples, dim=4, test_mod=1))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_complex_score_joins_are_broadcast(spark):
    # round 5: ComplEx vector attachment = three vocab-sized broadcast
    # hash joins, same contract as transe_score/distmult_score
    from ai_knowledge_graph_spark.graph.kgops import complex_score

    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("a", "q", "c")],
        ["subject", "predicate", "object"],
    )
    plan = _plan(complex_score(triples, dim=4))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
