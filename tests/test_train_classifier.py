"""train_quality_classifier: MLlib-trained weights drop into the pure-JVM
classifier_score scorer and separate the held-out classes."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.textstats import (
    classifier_score,
    train_quality_classifier,
)

GOOD_WORDS = "the of and report analysis data method result study".split()
SPAM_WORDS = "buy now cheap click winner free casino pills offer".split()


def _doc(words, i, n=12):
    return " ".join(words[(i + j) % len(words)] for j in range(n))


def _corpus(spark, n_each=40, offset=0):
    rows = []
    for i in range(n_each):
        rows.append((offset + i, _doc(GOOD_WORDS, i), 1))
        rows.append((offset + 1000 + i, _doc(SPAM_WORDS, i), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_trained_weights_separate_holdout(spark):
    train = _corpus(spark, n_each=40)
    holdout = _corpus(spark, n_each=10, offset=500)
    weights, bias = train_quality_classifier(
        train.select("text", "label"), dim=512, max_iter=25
    )
    scored = classifier_score(
        holdout, weights=weights, dim=512, bias=bias
    ).join(holdout.select("doc_id", "label"), "doc_id")
    rows = scored.collect()
    good = [r["score"] for r in rows if r["label"] == 1]
    spam = [r["score"] for r in rows if r["label"] == 0]
    assert len(good) == len(spam) == 10
    # full separation on this trivially separable vocabulary
    assert min(good) > max(spam)
    acc = (
        sum(1 for s in good if s > 0.5) + sum(1 for s in spam if s <= 0.5)
    ) / 20
    assert acc >= 0.95


def test_weight_table_is_scorer_compatible(spark):
    train = _corpus(spark, n_each=15)
    weights, bias = train_quality_classifier(
        train.select("text", "label"), dim=256, max_iter=10
    )
    assert set(weights.columns) == {"bucket", "weight"}
    assert weights.filter("bucket < 0 OR bucket >= 256").count() == 0
    # integer milli-units — exact, order-independent scoring downstream
    assert dict(weights.dtypes)["weight"] == "bigint"
    assert isinstance(bias, int)
