"""Tests for katz_centrality, rendezvous_shards, word_collocations,
blocklist_hits."""

from __future__ import annotations

import hashlib
import math

from ai_knowledge_graph_spark.graph.centrality import katz_centrality
from ai_knowledge_graph_spark.operators.curation import blocklist_hits
from ai_knowledge_graph_spark.operators.sampling import rendezvous_shards
from ai_knowledge_graph_spark.operators.textstats import word_collocations


# --- katz_centrality ---------------------------------------------------------


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src STRING, dst STRING")


def test_katz_hand_replay_chain(spark):
    # a -> b -> c: replay x' = 1e6 + sum(in) // 10 from x0 = 0
    e = _edges(spark, [("a", "b"), ("b", "c")])
    got = {r["entity"]: r["katz_micro"] for r in katz_centrality(e).collect()}
    x = {"a": 0, "b": 0, "c": 0}
    for _ in range(5):
        x = {
            "a": 1_000_000,
            "b": 1_000_000 + x["a"] // 10,
            "c": 1_000_000 + x["b"] // 10,
        }
    assert got == x
    assert got["c"] > got["b"] > got["a"]


def test_katz_counts_parallel_edges(spark):
    # two parallel edges double the transferred mass
    single = {r["entity"]: r["katz_micro"]
              for r in katz_centrality(_edges(spark, [("a", "b")])).collect()}
    double = {r["entity"]: r["katz_micro"]
              for r in katz_centrality(
                  _edges(spark, [("a", "b"), ("a", "b")])).collect()}
    assert double["b"] - 1_000_000 == 2 * (single["b"] - 1_000_000)


def test_katz_no_outdegree_normalization(spark):
    # unlike pagerank, a hub linking 100 pages gives each FULL mass
    e = _edges(spark, [("hub", f"p{i}") for i in range(3)])
    got = {r["entity"]: r["katz_micro"] for r in katz_centrality(e).collect()}
    assert got["p0"] == got["p1"] == got["p2"] == 1_000_000 + 1_000_000 // 10


# --- rendezvous_shards -------------------------------------------------------


def _expected_shard(key, n=8):
    best = None
    for s in range(n):
        h = int(hashlib.md5(f"{key}\x1f{s}".encode()).hexdigest()[:12], 16)
        if best is None or (h, s) > best:
            best = (h, s)
    return best[1]


def test_shards_match_python_replay_and_total(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    got = {r["shard"]: r["n_rows"] for r in rendezvous_shards(df).collect()}
    want = {}
    for i in range(200):
        s = _expected_shard(i)
        want[s] = want.get(s, 0) + 1
    assert got == want
    assert sum(got.values()) == 200


def test_shards_stable_under_shard_growth(spark):
    # rendezvous property: growing 8 -> 9 shards only MOVES keys into the
    # new shard; no key moves between surviving shards
    df = spark.createDataFrame([(i,) for i in range(300)], ["doc_id"])
    a8 = {i: _expected_shard(i, 8) for i in range(300)}
    a9 = {i: _expected_shard(i, 9) for i in range(300)}
    moved = {i for i in a8 if a8[i] != a9[i]}
    assert all(a9[i] == 8 for i in moved)
    # and the Spark histogram at 9 matches the replay
    got = {r["shard"]: r["n_rows"]
           for r in rendezvous_shards(df, n_shards=9).collect()}
    want = {}
    for i in range(300):
        want[a9[i]] = want.get(a9[i], 0) + 1
    assert got == want


# --- word_collocations -------------------------------------------------------


def test_collocations_hand_pmi(spark):
    # 'strong coffee' x6 plus 6 fillers; check PMI integer freeze
    text = " ".join(["strong coffee"] * 6) + " " + " ".join(
        f"f{i} g{i}" for i in range(3)
    )
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = word_collocations(docs, min_count=5, top_k=5).collect()
    [r] = [x for x in rows if x["w1"] == "strong"]
    # bigram slots: n12=6 (strong,coffee); marginals over ALL adjacent pairs
    n_pairs = 17  # 18 words -> 17 adjacent pairs
    nl = 6  # 'strong' as left word
    nr = 6  # 'coffee' as right word
    want = int(round(math.log(r["n12"] * n_pairs / (nl * nr)) * 1e6))
    assert r["n12"] == 6 and r["pmi_micro"] == want


def test_collocations_min_count_gate(spark):
    docs = spark.createDataFrame(
        [(0, "rare pair " + "hot dog " * 6)], ["doc_id", "text"]
    )
    rows = word_collocations(docs, min_count=5, top_k=10).collect()
    assert all((r["w1"], r["w2"]) != ("rare", "pair") for r in rows)
    assert any((r["w1"], r["w2"]) == ("hot", "dog") for r in rows)


# --- blocklist_hits ----------------------------------------------------------


def test_blocklist_leet_normalization(spark):
    docs = spark.createDataFrame(
        [(0, "SP4RK and sp4rk and spark"), (1, "clean doc")],
        ["doc_id", "text"],
    )
    rows = blocklist_hits(docs, ["spark"]).collect()
    [r] = rows
    assert (r["doc_id"], r["term"], r["n_hits"]) == (0, "spark", 3)


def test_blocklist_multiple_terms_per_doc(spark):
    docs = spark.createDataFrame([(0, "b4tch merge b4tch")], ["doc_id", "text"])
    got = {r["term"]: r["n_hits"]
           for r in blocklist_hits(docs, ["batch", "merge"]).collect()}
    assert got == {"batch": 2, "merge": 1}


def test_blocklist_no_substring_matches(spark):
    # token-level matching: 'sparkle' must NOT hit 'spark'
    docs = spark.createDataFrame([(0, "sparkle remarks")], ["doc_id", "text"])
    assert blocklist_hits(docs, ["spark", "mark"]).count() == 0
