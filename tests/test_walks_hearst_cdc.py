"""Tests for random walks, LPA communities, Hearst mining, CDC chunking."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from ai_knowledge_graph_spark.graph.walks import lpa_communities, random_walks
from ai_knowledge_graph_spark.operators.dedup import cdc_chunks
from ai_knowledge_graph_spark.operators.hearst import hearst_hypernyms


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- random walks -------------------------------------------------------------


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
    ("d", "e"),  # e is a sink: walks entering e stop early
    ("b", "d"),
]


def _py_walks(edges, steps):
    out_adj: dict[str, list[str]] = {}
    for s, d in set(edges):
        out_adj.setdefault(s, []).append(d)
    rows = []
    for start in sorted(out_adj):
        node = start
        rows.append((start, 0, node))
        for t in range(1, steps + 1):
            nbrs = out_adj.get(node)
            if not nbrs:
                break
            node = min(nbrs, key=lambda v: _md5(f"{node}\x1f{t}\x1f{v}"))
            rows.append((start, t, node))
    return sorted(rows)


def test_random_walks_match_python_replay(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = sorted(tuple(r) for r in random_walks(edges, steps=4).collect())
    assert got == _py_walks(EDGES, 4)


def test_random_walks_sink_stops_early(spark):
    edges = spark.createDataFrame([("x", "y")], ["src", "dst"])
    got = sorted(tuple(r) for r in random_walks(edges, steps=3).collect())
    # y has no out-edges: the walk from x is exactly [x, y]
    assert got == [("x", 0, "x"), ("x", 1, "y")]


def test_random_walks_deterministic(spark):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    a = sorted(tuple(r) for r in random_walks(edges, steps=3).collect())
    b = sorted(tuple(r) for r in random_walks(edges, steps=3).collect())
    assert a == b


# --- LPA communities ----------------------------------------------------------


def _py_lpa(edges, rounds):
    und: dict[str, list[str]] = {}
    for a, b in set(edges):
        if a == b:
            continue
        und.setdefault(a, []).append(b)
        und.setdefault(b, []).append(a)
    # de-dup neighbor lists (distinct undirected edges)
    und = {k: sorted(set(v)) for k, v in und.items()}
    labels = {n: n for n in und}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in und.items():
            counts: dict[str, int] = {}
            for v in nbrs:
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            nxt[n] = min(counts, key=lambda L: (-counts[L], L))
        labels = nxt
    return sorted(labels.items())


TWO_CLIQUES = (
    [(a, b) for a in "pqr" for b in "pqr" if a < b]
    + [(a, b) for a in "xyz" for b in "xyz" if a < b]
    + [("r", "x")]  # weak bridge
)


def test_lpa_matches_python_replay(spark):
    edges = spark.createDataFrame(TWO_CLIQUES, ["src", "dst"])
    got = sorted((r["node"], r["label"]) for r in lpa_communities(edges, rounds=4).collect())
    assert got == _py_lpa(TWO_CLIQUES, 4)


def test_lpa_two_cliques_separate(spark):
    edges = spark.createDataFrame(TWO_CLIQUES, ["src", "dst"])
    labels = dict(
        (r["node"], r["label"]) for r in lpa_communities(edges, rounds=4).collect()
    )
    assert len({labels["p"], labels["q"]}) == 1
    assert len({labels["y"], labels["z"]}) == 1
    assert labels["p"] != labels["y"]


def test_lpa_self_loops_ignored(spark):
    edges = spark.createDataFrame([("a", "a"), ("a", "b")], ["src", "dst"])
    got = dict(
        (r["node"], r["label"]) for r in lpa_communities(edges, rounds=2).collect()
    )
    assert got == {"a": "a", "b": "b"}  # 2 rounds of mutual swap ends at start


# --- Hearst hypernyms ---------------------------------------------------------


HEARST_DOCS = [
    (0, "animal such as dog, cat and wolf. metal including iron and zinc."),
    (1, "dog and cat and other animal. fruit especially mango."),
    (2, "animal such as dog. dog such as dog."),  # self-pair dropped
    (3, "no pattern here at all"),
]


def test_hearst_patterns(spark):
    docs = spark.createDataFrame(HEARST_DOCS, ["doc_id", "text"])
    got = {
        (r["hyponym"], r["hypernym"], r["pattern"]): (r["support"], r["n_docs"])
        for r in hearst_hypernyms(docs).collect()
    }
    assert got == {
        ("dog", "animal", "such_as"): (2, 2),
        ("cat", "animal", "such_as"): (1, 1),
        ("wolf", "animal", "such_as"): (1, 1),
        ("iron", "metal", "including"): (1, 1),
        ("zinc", "metal", "including"): (1, 1),
        ("dog", "animal", "other"): (1, 1),
        ("cat", "animal", "other"): (1, 1),
        ("mango", "fruit", "especially"): (1, 1),
    }


# --- CDC chunking -------------------------------------------------------------


def _py_cdc(docs, gram=3, modulus=8):
    rows = []
    for doc_id, text in docs:
        words = [w for w in text.split() if w]
        bd = []
        for i, _ in enumerate(words):
            if i >= gram - 1:
                g = " ".join(words[i - gram + 1 : i + 1])
                h = int(_md5(g)[:12], 16)
                bd.append(1 if h % modulus == 0 else 0)
            else:
                bd.append(0)
        chunk_no, start = 0, 0
        chunks = []
        for i in range(len(words)):
            if i > 0 and bd[i - 1]:
                chunks.append((doc_id, chunk_no, start, i - start,
                               _md5(" ".join(words[start:i]))))
                chunk_no += 1
                start = i
        if words:
            chunks.append((doc_id, chunk_no, start, len(words) - start,
                           _md5(" ".join(words[start:]))))
        rows.extend(chunks)
    from collections import Counter

    ndocs = Counter()
    for r in rows:
        ndocs[r[4]] = ndocs.get(r[4], 0)
    by_hash: dict[str, set] = {}
    for r in rows:
        by_hash.setdefault(r[4], set()).add(r[0])
    return sorted((d, c, s, n, h, len(by_hash[h])) for d, c, s, n, h in rows)


CDC_DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4),
    (2, "prefix " + "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4),
    (3, "one two"),  # shorter than a gram: single chunk, no boundaries
]


def test_cdc_matches_python_replay(spark):
    docs = spark.createDataFrame(CDC_DOCS, ["doc_id", "text"])
    got = sorted(tuple(r) for r in cdc_chunks(docs).collect())
    assert got == _py_cdc(CDC_DOCS)


def test_cdc_partitions_words(spark):
    docs = spark.createDataFrame(CDC_DOCS, ["doc_id", "text"])
    out = cdc_chunks(docs)
    per_doc = {
        r["doc_id"]: r["total"]
        for r in out.groupBy("doc_id").agg(F.sum("n_words").alias("total")).collect()
    }
    for doc_id, text in CDC_DOCS:
        assert per_doc[doc_id] == len(text.split())


def test_cdc_identical_docs_share_all_chunks(spark):
    docs = spark.createDataFrame(CDC_DOCS, ["doc_id", "text"])
    out = cdc_chunks(docs).filter(F.col("doc_id").isin(0, 1))
    assert out.filter(F.col("n_docs") < 2).count() == 0


def test_cdc_shift_tolerance(spark):
    # doc 2 = doc 0 with one word prepended: after the first boundary the
    # chunking realigns, so most of doc 0's chunk hashes reappear in doc 2.
    docs = spark.createDataFrame(CDC_DOCS, ["doc_id", "text"])
    out = cdc_chunks(docs)
    h0 = {r["chunk_hash"] for r in out.filter("doc_id = 0").collect()}
    h2 = {r["chunk_hash"] for r in out.filter("doc_id = 2").collect()}
    assert len(h0) > 2  # the fixture genuinely chunks
    shared = h0 & h2
    assert len(shared) >= len(h0) - 2  # only the leading frame differs
