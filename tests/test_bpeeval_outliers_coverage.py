"""Tests for bpe_compression_stats, length_outliers, vocab_coverage."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.stats import length_outliers
from ai_knowledge_graph_spark.operators.textstats import vocab_coverage
from ai_knowledge_graph_spark.operators.tokenizer import (
    bpe_compression_stats,
)


# --- bpe_compression_stats ---------------------------------------------------


def test_bpe_eval_zero_merges_tokens_are_chars(spark):
    # with no merges every word encodes to its chars + '</w>':
    # n_tokens = n_chars + n_words
    docs = spark.createDataFrame([(0, "ab cde"), (1, "f")], ["doc_id", "text"])
    [r] = bpe_compression_stats(docs, []).collect()
    assert (r["n_docs"], r["n_words"], r["n_chars"]) == (2, 3, 6)
    assert r["n_tokens"] == 6 + 3
    assert r["tokens_per_word_ppm"] == (9 * 1_000_000) // 3
    assert r["chars_per_token_ppm"] == (6 * 1_000_000) // 9


def test_bpe_eval_merges_reduce_tokens(spark):
    docs = spark.createDataFrame([(0, "aaaa aaaa aaaa")], ["doc_id", "text"])
    [none] = bpe_compression_stats(docs, []).collect()
    # one merge (a,a) -> 'aa': each word a,a,a,a,</w> becomes aa,aa,</w>
    [one] = bpe_compression_stats(docs, [(0, "a", "a")]).collect()
    assert one["n_tokens"] < none["n_tokens"]
    assert one["n_tokens"] == 3 * 3  # aa, aa, </w> per word
    assert one["n_chars"] == none["n_chars"] == 12


# --- length_outliers ---------------------------------------------------------


def test_outliers_flags_far_point_only(spark):
    # group A: nine 100s and one 1000 -> mean 190, sigma = 270
    # 1000 is 3.0 sigma away: strict > means NOT flagged at exactly 3,
    # flagged at k=2
    rows = [("A", i, 100) for i in range(9)] + [("A", 99, 1000)]
    df = spark.createDataFrame(rows, "source STRING, doc_id LONG, n_chars LONG")
    got2 = length_outliers(df, k_sigma=2).collect()
    assert [(r["doc_id"], r["n_chars"]) for r in got2] == [(99, 1000)]
    got3 = length_outliers(df, k_sigma=3).collect()
    assert got3 == []  # exactly 3 sigma, strict inequality


def test_outliers_grouped_independently(spark):
    # the same value is an outlier in a tight group, normal in a wide one
    rows = (
        [("tight", i, 100) for i in range(20)] + [("tight", 98, 200)]
        + [("wide", 100 + i, v) for i, v in enumerate([100, 200] * 10)]
        + [("wide", 198, 200)]
    )
    df = spark.createDataFrame(rows, "source STRING, doc_id LONG, n_chars LONG")
    got = {(r["source"], r["doc_id"]) for r in length_outliers(df, k_sigma=2).collect()}
    assert ("tight", 98) in got
    assert all(s != "wide" for s, _ in got)


def test_outliers_zero_variance_flags_nothing(spark):
    df = spark.createDataFrame(
        [("A", i, 50) for i in range(5)], "source STRING, doc_id LONG, n_chars LONG"
    )
    assert length_outliers(df).count() == 0


# --- vocab_coverage ----------------------------------------------------------


def test_coverage_hand_replay(spark):
    # counts: a x6, b x3, c x1 -> total 10
    docs = spark.createDataFrame(
        [(0, " ".join(["a"] * 6 + ["b"] * 3 + ["c"]))], ["doc_id", "text"]
    )
    got = {r["k"]: r for r in vocab_coverage(docs, ks=(1, 2, 3)).collect()}
    assert got[1]["top_tokens"] == 6 and got[1]["cover_ppm"] == 600_000
    assert got[2]["top_tokens"] == 9 and got[2]["cover_ppm"] == 900_000
    assert got[3]["top_tokens"] == 10 and got[3]["cover_ppm"] == 1_000_000


def test_coverage_k_beyond_vocab_drops(spark):
    docs = spark.createDataFrame([(0, "only two words two")], ["doc_id", "text"])
    ks = {r["k"] for r in vocab_coverage(docs, ks=(2, 10)).collect()}
    assert ks == {2}  # vocab of 3 < 10: the k=10 row doesn't exist


def test_coverage_monotone_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common common") for i in range(20)], ["doc_id", "text"]
    )
    rows = sorted(vocab_coverage(docs, ks=(1, 3, 5)).collect(), key=lambda r: r["k"])
    covers = [r["cover_ppm"] for r in rows]
    assert covers == sorted(covers) and covers[-1] <= 1_000_000
