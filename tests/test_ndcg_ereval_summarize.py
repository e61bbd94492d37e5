"""Tests for ndcg_at_k, dedup_eval, centroid_summaries."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.dedup import dedup_eval
from ai_knowledge_graph_spark.operators.ranking import ndcg_at_k
from ai_knowledge_graph_spark.operators.textstats import centroid_summaries


# --- ndcg_at_k ---------------------------------------------------------------

W = {1: 1_000_000, 2: 630_930, 3: 500_000, 4: 430_677, 5: 386_853}
IDCG5 = sum((6 - r) * W[r] for r in range(1, 6))


def _rank_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id LONG, neighbor_id LONG, rk INT"
    )


def test_ndcg_perfect_run_is_one(spark):
    gold = _rank_df(spark, [(0, i, i) for i in range(1, 6)])
    out = ndcg_at_k(gold, gold, k=5).collect()
    [r] = out
    assert r["dcg_micro"] == IDCG5
    assert r["ndcg_ppm"] == 1_000_000


def test_ndcg_hand_replay_partial_overlap(spark):
    # run finds gold items 1 and 3 at ranks 1 and 2; misses the rest
    run = _rank_df(spark, [(0, 10, 1), (0, 30, 2), (0, 99, 3)])
    gold = _rank_df(spark, [(0, 10, 1), (0, 20, 2), (0, 30, 3)])
    [r] = ndcg_at_k(run, gold, k=5).collect()
    want_dcg = (6 - 1) * W[1] + (6 - 3) * W[2]
    assert r["dcg_micro"] == want_dcg
    assert r["ndcg_ppm"] == (want_dcg * 1_000_000) // IDCG5


def test_ndcg_zero_overlap(spark):
    run = _rank_df(spark, [(0, 99, 1)])
    gold = _rank_df(spark, [(0, 1, 1)])
    [r] = ndcg_at_k(run, gold, k=5).collect()
    assert (r["dcg_micro"], r["ndcg_ppm"]) == (0, 0)


def test_ndcg_per_query_rows(spark):
    run = _rank_df(spark, [(0, 1, 1), (7, 2, 1)])
    gold = _rank_df(spark, [(0, 1, 1), (7, 9, 1)])
    got = {r["query_id"]: r["ndcg_ppm"] for r in ndcg_at_k(run, gold).collect()}
    assert got[0] > 0 and got[7] == 0


# --- dedup_eval --------------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "entity_a STRING, entity_b STRING")


def test_dedup_eval_confusion_counts(spark):
    pred = _pairs(spark, [("a", "b"), ("c", "d"), ("e", "f")])
    gold = _pairs(spark, [("a", "b"), ("x", "y")])
    [r] = dedup_eval(pred, gold).collect()
    assert (r["tp"], r["fp"], r["fn"]) == (1, 2, 1)
    assert r["precision_ppm"] == 1_000_000 // 3
    assert r["recall_ppm"] == 500_000


def test_dedup_eval_orientation_canonicalized(spark):
    pred = _pairs(spark, [("b", "a")])
    gold = _pairs(spark, [("a", "b")])
    [r] = dedup_eval(pred, gold).collect()
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
    assert r["precision_ppm"] == r["recall_ppm"] == 1_000_000


def test_dedup_eval_empty_pred_null_precision(spark):
    pred = _pairs(spark, []).limit(0)
    gold = _pairs(spark, [("a", "b")])
    [r] = dedup_eval(pred, gold).collect()
    assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 1)
    assert r["precision_ppm"] is None
    assert r["recall_ppm"] == 0


def test_dedup_eval_duplicate_rows_counted_once(spark):
    pred = _pairs(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    gold = _pairs(spark, [("a", "b")])
    [r] = dedup_eval(pred, gold).collect()
    assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)


# --- centroid_summaries ------------------------------------------------------


def test_summary_picks_corpus_dense_window(spark):
    # corpus: 'alpha' appears 16x, 'rare*' once each -> window 1 of doc 0
    # (all alpha) outranks window 2 (all distinct rares)
    text0 = " ".join(["alpha"] * 15) + " " + " ".join(f"rare{i}" for i in range(15))
    docs = spark.createDataFrame([(0, text0), (1, "alpha " * 20)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in centroid_summaries(docs, seg_len=15).collect()}
    assert got[0]["seg_idx"] == 1
    assert got[0]["summary"] == " ".join(["alpha"] * 15)
    # hand-check score: p(alpha) = 31 occurrences... compute exactly
    total = 15 + 15 + 20  # all non-stop tokens
    p_alpha = (35 * 1_000_000_000) // total
    assert got[0]["score_nano"] == (15 * p_alpha) // 15


def test_summary_drops_short_docs_and_ragged_tail(spark):
    docs = spark.createDataFrame(
        [(0, "short doc only five words here"),  # < 15 words: no row
         (1, " ".join(f"w{i}" for i in range(20)))],  # 1 window, tail dropped
        ["doc_id", "text"],
    )
    rows = centroid_summaries(docs, seg_len=15).collect()
    assert {r["doc_id"] for r in rows} == {1}
    [r] = rows
    assert r["seg_idx"] == 1 and len(r["summary"].split()) == 15


def test_summary_all_stopword_window_scores_zero(spark):
    # doc of 15 stopwords then 15 content words: window 1 scores 0,
    # window 2 wins
    stops = " ".join(["the"] * 15)
    content = " ".join(["zebra"] * 15)
    docs = spark.createDataFrame([(0, stops + " " + content)], ["doc_id", "text"])
    [r] = centroid_summaries(docs, seg_len=15).collect()
    assert r["seg_idx"] == 2


def test_summary_tie_breaks_first_window(spark):
    docs = spark.createDataFrame(
        [(0, " ".join(["same"] * 30))], ["doc_id", "text"]
    )
    [r] = centroid_summaries(docs, seg_len=15).collect()
    assert r["seg_idx"] == 1
