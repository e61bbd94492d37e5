"""exact_substring_dedup_incremental == full run over corpus ∪ batch,
restricted to the batch (plus the never-O(corpus) contract)."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.curation import (
    exact_substring_dedup,
    exact_substring_dedup_incremental,
    exact_substring_hash_counts,
)

K = 4

CORPUS = {
    1: "alpha beta gamma delta epsilon zeta eta theta",
    2: "one two three four five six seven",
    3: "internal repeat p q r s mid p q r s end",
}
BATCH = {
    10: "new doc with alpha beta gamma delta inside it",  # dup vs corpus
    11: "one two three four copied prefix here",  # dup vs corpus
    12: "entirely novel sentence nothing shared anywhere",
    13: "one two three four five six seven",  # full-doc corpus dup
    14: "batch only aa bb cc dd batch only aa bb cc dd",  # within-batch
}


def _df(spark, d):
    return spark.createDataFrame(
        [(i, t) for i, t in d.items()], "doc_id long, text string"
    )


def test_incremental_equals_full_run_on_batch(spark):
    corpus, batch = _df(spark, CORPUS), _df(spark, BATCH)
    counts = exact_substring_hash_counts(corpus, k=K).localCheckpoint(
        eager=True
    )
    inc = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"], r["n_spans"])
        for r in exact_substring_dedup_incremental(
            batch, counts, k=K
        ).collect()
    }
    full = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"], r["n_spans"])
        for r in exact_substring_dedup(corpus.unionByName(batch), k=K).collect()
        if r["doc_id"] >= 10
    }
    assert inc == full
    # spot semantics: cross-corpus spans removed, novel doc untouched,
    # within-batch repeat removed without any corpus hit
    assert inc[12][2] == 0
    assert inc[10][2] > 0 and inc[13][2] == 7
    assert inc[14][2] > 0


def test_index_is_counts_not_text(spark):
    # the persisted index carries (hash, count) only — no doc ids, no text
    counts = exact_substring_hash_counts(_df(spark, CORPUS), k=K)
    assert set(counts.columns) == {"_h", "cnt"}
    # corpus doc 3 repeats its own 4-gram twice -> count 2 in the index
    assert counts.filter("cnt >= 2").count() >= 1
