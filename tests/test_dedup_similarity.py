"""Dedup family (exact / MinHash-LSH / SimHash / Jaccard) + ANN similarity."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_near_dup,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_dup,
)
from ai_knowledge_graph_spark.operators.similarity import cosine_topk, srp_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the river bank today "
        "while morning mist rises slowly above quiet fields where farmers walk "
        "between long rows of ripening corn under a pale autumn sky before noon"
    )
    rows = [
        (0, base),
        (1, base),  # exact duplicate of 0
        (2, base.replace("lazy", "sleepy")),  # near-duplicate of 0
        (3, "completely different text about spark dataframes and shuffles here"),
        (4, f"  {base}  "),  # whitespace-normalized duplicate of 0
        (5, "short text"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).localCheckpoint(
        eager=True
    )


def test_exact_dedup_keeps_min_id(spark, docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert kept == [0, 2, 3, 5]  # 1 and 4 are content-dups of 0


def test_jaccard_finds_near_dup(spark, docs):
    sh = shingles(docs)
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in jaccard_pairs(sh, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh_candidates_cover_true_pairs(spark, docs):
    sh = shingles(docs).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh)
    cands = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (0, 1) in cands  # identical docs always collide
    assert (0, 2) in cands  # high-jaccard pair lands in same band w.h.p.


def test_minhash_slots_are_independent(spark, docs):
    """Regression for the round-2 advisory: with the old tiny-multiplier
    family the affine step never wrapped mod M61, so every signature slot was
    achieved by the doc's single minimum base hash (argmin identical across
    all slots — banding collapsed). A real universal family spreads the
    argmins; with 39 shingles and 32 slots, P(all same argmin) ≈ 39^-31.
    Also pins the Spark signatures to a pure-Python mirror of the same math
    (the portability contract the DuckDB oracle relies on)."""
    import hashlib as _h

    from ai_knowledge_graph_spark.operators.dedup import _M31, minhash_coeffs

    sh_rows = shingles(docs).filter(F.col("doc_id") == 0).collect()
    shs = sorted({r["shingle"] for r in sh_rows})
    assert len(shs) >= 30
    coeffs = minhash_coeffs(32, 7)

    def h0(s):
        return int(_h.md5(s.encode()).hexdigest()[:12], 16) % _M31

    argmins = set()
    py_sig = []
    for a, b in coeffs:
        vals = [(a * h0(s) + b) % _M31 for s in shs]
        py_sig.append(min(vals))
        argmins.add(vals.index(min(vals)))
    assert len(argmins) > 1, "all slots determined by one shingle (degenerate)"

    spark_sig = (
        minhash_signatures(shingles(docs), num_hashes=32, seed=7)
        .filter(F.col("doc_id") == 0)
        .collect()[0]["sig"]
    )
    assert list(spark_sig) == py_sig


def test_minhash_near_dup_end_to_end(spark, docs):
    out = {(r["a"], r["b"]) for r in minhash_near_dup(docs).collect()}
    assert (0, 1) in out and (0, 2) in out
    assert all(3 not in pair for pair in out)


def test_near_dup_application_minhash_and_jaccard(spark, docs):
    """Pairs -> components -> min-id survivor -> drop (the round-2 verdict's
    missing application operator), composed with the minhash and exact-
    jaccard pair generators."""
    from ai_knowledge_graph_spark.operators.dedup import (
        near_dup_dedup,
        near_dup_groups,
    )

    pairs = minhash_near_dup(docs)
    groups = {r["doc_id"]: r["group_id"] for r in near_dup_groups(docs, pairs).collect()}
    assert groups[0] == groups[1] == groups[2] == groups[4] == 0
    assert groups[3] == 3 and groups[5] == 5
    kept = sorted(r["doc_id"] for r in near_dup_dedup(docs, pairs).collect())
    assert kept == [0, 3, 5]

    jp = jaccard_pairs(shingles(docs), threshold=0.5)
    kept_j = sorted(r["doc_id"] for r in near_dup_dedup(docs, jp).collect())
    assert kept_j == [0, 3, 5]


def test_near_dup_application_simhash(spark, docs):
    from ai_knowledge_graph_spark.operators.dedup import near_dup_dedup

    kept = sorted(
        r["doc_id"] for r in near_dup_dedup(docs, simhash_near_dup(docs)).collect()
    )
    # 1 and 4 are content-identical to 0 (hamming 0) and must be dropped;
    # 3 and 5 share nothing and must survive.
    assert 1 not in kept and 4 not in kept
    assert {0, 3, 5} <= set(kept)


def test_near_dup_application_embedding_pairs(spark):
    from ai_knowledge_graph_spark.operators.dedup import near_dup_dedup
    from ai_knowledge_graph_spark.operators.similarity import embedding_near_dup

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.99, 0.01, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    pairs = embedding_near_dup(emb, threshold=0.95, n_planes=4, tables=4)
    docs = emb.select(F.col("vec_id").alias("doc_id"))
    kept = sorted(r["doc_id"] for r in near_dup_dedup(docs, pairs).collect())
    assert kept == [0, 2, 3]


def test_ivf_seeding_modes(spark):
    """'kpp' (farthest-first, documented dead end) still runs and returns a
    valid top-k; unknown seeding raises."""
    from ai_knowledge_graph_spark.operators.similarity import ivf_topk

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float((3 * i) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") < 2)
    out = ivf_topk(emb, q, k=3, nlist=4, n_probe=4, seeding="kpp").collect()
    assert {r["query_id"] for r in out} == {0, 1}
    assert all(1 <= r["rk"] <= 3 for r in out)
    with pytest.raises(ValueError, match="seeding"):
        ivf_topk(emb, q, k=3, nlist=4, n_probe=2, seeding="nope").collect()


def test_incremental_near_dup_against_stored_corpus(spark, docs):
    """Daily-ingest shape: new batch deduped against stored corpus
    signatures/buckets only — corpus text never re-read. Doc 10 duplicates
    corpus doc 0 (dropped vs corpus); 11/12 are mutual near-dups (one
    within-batch survivor); 13 is fresh (kept)."""
    from ai_knowledge_graph_spark.operators.dedup import (
        band_buckets,
        incremental_near_dup,
        minhash_signatures,
    )

    corpus_sigs = minhash_signatures(shingles(docs)).localCheckpoint(eager=True)
    stored_buckets = band_buckets(corpus_sigs).localCheckpoint(eager=True)

    base0 = docs.filter(F.col("doc_id") == 0).collect()[0]["text"]
    other = (
        "entirely novel sentences describing glacier formation over many "
        "thousand years of compacted snowfall and slow downhill movement "
        "carving deep valleys into ancient mountain ranges everywhere"
    )
    new = spark.createDataFrame(
        [
            (10, base0),  # exact dup of corpus doc 0
            (11, other),
            (12, other.replace("slow", "gradual")),  # near-dup of 11
            (13, "wholly unrelated short appendix about parquet file footers"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in incremental_near_dup(new, corpus_sigs, stored_buckets).collect()
    )
    assert kept == [11, 13]


def test_near_dup_groups_transitive_closure(spark):
    """Near-dup similarity is not transitive; clusters must be. A chain
    a-b, b-c with no (a,c) pair still collapses to one survivor."""
    from ai_knowledge_graph_spark.operators.components import components_from_pairs
    from ai_knowledge_graph_spark.operators.dedup import near_dup_groups

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (30, 31)], "a long, b long"
    )
    comp = {r["node"]: r["group_id"] for r in components_from_pairs(pairs).collect()}
    assert comp == {10: 10, 11: 10, 12: 10, 30: 30, 31: 30}

    docs = spark.createDataFrame([(i,) for i in (10, 11, 12, 20, 30, 31)], "doc_id long")
    groups = {r["doc_id"]: r["group_id"] for r in near_dup_groups(docs, pairs).collect()}
    assert groups == {10: 10, 11: 10, 12: 10, 20: 20, 30: 30, 31: 30}


def test_simhash_identical_docs_equal_and_near_dup_close(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[1] == sh[4]
    # one-word change barely moves the sketch; unrelated text moves it a lot
    ham = lambda a, b: bin(sh[a] ^ sh[b]).count("1")  # noqa: E731
    assert ham(0, 2) < ham(0, 3)
    # banding guarantees recall for hamming <= 3 (pigeonhole over 4 bands):
    # every such pair must be reported, with the exact hamming distance.
    near = {(r["a"], r["b"]): r["hamming"] for r in simhash_near_dup(docs, max_hamming=3).collect()}
    expected = {
        (a, b): ham(a, b)
        for a in sh
        for b in sh
        if a < b and ham(a, b) <= 3
    }
    assert near == expected
    assert (0, 1) in near and near[(0, 1)] == 0


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=2).collect()
    got = [(r["neighbor_id"], r["rk"]) for r in sorted(out, key=lambda r: r["rk"])]
    assert got == [(1, 1), (2, 2)]


def test_srp_topk_finds_planted_neighbors(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((200, 16)).round(4)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    # plant 3 high-cosine neighbors per query vector (ids 500+)
    planted = []
    for q in range(3):
        for j in range(3):
            noisy = vecs[q] + 0.15 * rng.standard_normal(16)
            planted.append((500 + q * 10 + j, [float(x) for x in noisy]))
    emb = spark.createDataFrame(rows + planted, "vec_id long, embedding array<double>").localCheckpoint(
        eager=True
    )
    queries = emb.filter(F.col("vec_id") < 3)
    exact = cosine_topk(emb, queries, k=3)
    approx = srp_topk(emb, queries, k=3, n_planes=4, tables=4, dim=16)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_rows = approx.collect()
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    # top-3 per query are the planted near-duplicates; multi-table LSH must
    # recover the large majority of them
    assert len(approx_pairs & exact_pairs) >= 7, (approx_pairs, exact_pairs)
    # cosine values agree exactly with the brute-force computation
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    for r in approx_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-6


def test_ivf_topk_recall_vs_bruteforce(spark):
    from ai_knowledge_graph_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 5")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, nlist=16, n_probe=4).collect()
    }
    assert len(approx) > 0
    # every approx hit is a real vector pair with rank <= 5 within its lists;
    # recall against exact top-5 should be substantial with 4/16 lists probed
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall
    # probing ALL lists must reproduce brute-force exactly
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, q, k=5, nlist=16, n_probe=16).collect()
    }
    assert full == exact


def test_embedding_near_dup(spark):
    """Embedding-cosine near-dup: exact near-identical vectors always
    collide in every SRP table (same signs), orthogonal ones score below
    threshold even if bucketed together."""
    from ai_knowledge_graph_spark.operators.similarity import embedding_near_dup

    dim = 8
    base = [1.0, -0.5, 0.25, -1.0, 0.75, -0.25, 0.5, -0.75]
    near = [x * 1.01 + (0.001 if i % 2 else -0.001) for i, x in enumerate(base)]
    ortho = [(-1.0) ** i * abs(base[dim - 1 - i]) for i in range(dim)]
    emb = spark.createDataFrame(
        [(0, base), (1, near), (2, ortho)],
        "vec_id long, embedding array<double>",
    )
    out = {(r["a"], r["b"]): r["cosine"] for r in
           embedding_near_dup(emb, threshold=0.9, dim=dim, tables=2).collect()}
    assert (0, 1) in out and out[(0, 1)] > 0.99
    assert (0, 2) not in out and (1, 2) not in out
    # ordered pairs only (a < b), no self-pairs
    assert all(a < b for a, b in out)


def test_ivf_kmeans_refinement(spark):
    """kmeans_iters>0 runs distributed Lloyd refinement; results keep the
    top-k contract and stay near the exact answer (measured on testdata:
    recall@5 0.672 -> 0.700 at nlist=16/n_probe=4, see COVERAGE.md)."""
    from ai_knowledge_graph_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    truth = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=5).collect()}
    refined = ivf_topk(emb, q, k=5, nlist=8, n_probe=3, kmeans_iters=2)
    got = {(r["query_id"], r["neighbor_id"]) for r in refined.collect()}
    assert len(got & truth) / len(truth) >= 0.5
    # contract: <= k rows per query, rk dense from 1
    per_q = refined.groupBy("query_id").count().collect()
    assert all(r["count"] <= 5 for r in per_q)
    assert refined.filter(F.col("rk") < 1).count() == 0
