"""lm_perplexity: hand-computed bigram math, bucketing, and stability."""

from __future__ import annotations

import math

from ai_knowledge_graph_spark.operators.lm import lm_perplexity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_bigram_nll(spark):
    # corpus: "a b" and "a b a b" -> tokens per doc, BOS-prefixed bigrams:
    #   d1: (<s>,a) (a,b)
    #   d2: (<s>,a) (a,b) (b,a) (a,b)
    # counts: c(<s>,a)=2 c(a,b)=3 c(b,a)=1; cp(<s>)=2 cp(a)=3 cp(b)=1; V=2
    out = {
        r["doc_id"]: r.asDict()
        for r in lm_perplexity(
            _docs(spark, [(1, "a b"), (2, "a b a b")])
        ).collect()
    }
    V = 2

    def p(c, cp):
        return (c + 1) / (cp + V)

    d1 = -(math.log(p(2, 2)) + math.log(p(3, 3))) / 2
    d2 = -(
        math.log(p(2, 2)) + 2 * math.log(p(3, 3)) + math.log(p(1, 1))
    ) / 4
    assert out[1]["n_bigrams"] == 2
    assert out[2]["n_bigrams"] == 4
    assert abs(out[1]["nll_per_token"] - d1) < 1e-6
    assert abs(out[2]["nll_per_token"] - d2) < 1e-6
    # d2 contains the corpus-rare (b,a) bigram -> less typical -> higher NLL
    assert out[1]["nll_per_token"] < out[2]["nll_per_token"]
    # 2 docs, 3 buckets: rank1 -> (3*0)//2 = 0, rank2 -> (3*1)//2 = 1
    assert out[1]["ppl_bucket"] == 0 and out[2]["ppl_bucket"] == 1


def test_empty_docs_dropped_and_buckets_cover_range(spark):
    rows = [(i, " ".join(f"w{j % (i + 1)}" for j in range(10))) for i in range(9)]
    rows += [(100, ""), (101, "   ")]
    out = lm_perplexity(_docs(spark, rows)).collect()
    ids = {r["doc_id"] for r in out}
    assert 100 not in ids and 101 not in ids and len(out) == 9
    buckets = sorted(r["ppl_bucket"] for r in out)
    # 9 docs -> exact tertiles of 3
    assert buckets == [0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_partitioning_invariance(spark):
    rows = [
        (i, " ".join(f"t{(i * 7 + j * 3) % 13}" for j in range(5 + i % 11)))
        for i in range(60)
    ]
    a = lm_perplexity(_docs(spark, rows).repartition(1)).collect()
    b = lm_perplexity(_docs(spark, rows).repartition(16)).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted([r.asDict() for r in a], key=lambda d: d["doc_id"]) == sorted(
        [r.asDict() for r in b], key=lambda d: d["doc_id"]
    )
