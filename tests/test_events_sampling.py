"""Event analytics (asof/sessionize) + deterministic sampling operators.

Oracle parity runs in test_entry.py; here: brute-force cross-checks,
hand-computed sessions, determinism/monotonicity of hash sampling, and the
plan shapes (the as-of join must be the single-shuffle union-window shape,
never a range theta-join).
"""

from __future__ import annotations

import datetime as dt
import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.events import (
    asof_join,
    session_stats,
    sessionize,
)
from ai_knowledge_graph_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)

T0 = dt.datetime(2026, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_matches_bruteforce(spark):
    left = [(i, _ts(m), 1 + (i % 2)) for i, m in enumerate([5, 17, 29, 43, 61])]
    right = [(100 + i, _ts(m), 1 + (i % 2)) for i, m in enumerate([1, 12, 30, 55])]
    ldf = spark.createDataFrame(left, "event_id long, ts timestamp, user_id long")
    rdf = spark.createDataFrame(right, "event_id long, ts timestamp, user_id long")
    out = {
        r["event_id"]: r["asof_event_id"]
        for r in asof_join(ldf, rdf, payload_cols=("event_id",), tiebreak_col="event_id").collect()
    }
    for eid, lts, uid in left:
        cands = [(rts, rid) for rid, rts, ruid in right if ruid == uid and rts <= lts]
        want = max(cands)[1] if cands else None
        assert out[eid] == want, (eid, out[eid], want)


def test_asof_join_inclusive_and_tiebreak(spark):
    # equal timestamps match (inclusive), and among right rows sharing
    # (key, ts) the max tiebreak_col wins
    ldf = spark.createDataFrame([(1, _ts(10), 7)], "event_id long, ts timestamp, user_id long")
    rdf = spark.createDataFrame(
        [(50, _ts(10), 7), (51, _ts(10), 7), (49, _ts(9), 7)],
        "event_id long, ts timestamp, user_id long",
    )
    row = asof_join(ldf, rdf, payload_cols=("event_id",), tiebreak_col="event_id").collect()[0]
    assert row["asof_event_id"] == 51


def test_asof_join_no_match_keeps_nulls(spark):
    ldf = spark.createDataFrame([(1, _ts(0), 7)], "event_id long, ts timestamp, user_id long")
    rdf = spark.createDataFrame([(9, _ts(5), 7)], "event_id long, ts timestamp, user_id long")
    rows = asof_join(ldf, rdf, payload_cols=("event_id",)).collect()
    assert len(rows) == 1 and rows[0]["asof_event_id"] is None


def test_asof_join_is_single_shuffle_no_theta_join(spark):
    ldf = spark.createDataFrame([(1, _ts(0), 7)], "event_id long, ts timestamp, user_id long")
    rdf = spark.createDataFrame([(9, _ts(5), 7)], "event_id long, ts timestamp, user_id long")
    buf = io.StringIO()
    with redirect_stdout(buf):
        asof_join(ldf, rdf, payload_cols=("event_id",)).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("+- Exchange") == 1, plan


def test_sessionize_hand_case(spark):
    # user 1: events at 0, 10, 50, 62 min with 30-min gap -> sessions
    # {0,10}, {50,62}; user 2: single event -> its own session
    rows = [
        (0, _ts(0), 1, 1.0),
        (1, _ts(10), 1, 2.0),
        (2, _ts(50), 1, 4.0),
        (3, _ts(62), 1, 8.0),
        (4, _ts(3), 2, 16.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    sess = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert sess[0] == sess[1] == "1-1"
    assert sess[2] == sess[3] == "1-2"
    assert sess[4] == "2-1"

    stats = {r["session_id"]: r for r in session_stats(sessionize(df)).collect()}
    assert stats["1-1"]["n_events"] == 2
    assert stats["1-1"]["duration_sec"] == 600
    assert stats["1-2"]["total_value"] == 12.0
    assert stats["2-1"]["duration_sec"] == 0


def test_sessionize_exact_gap_boundary(spark):
    # gap == gap_seconds does NOT split (strict >)
    df = spark.createDataFrame(
        [(0, _ts(0), 1, 0.0), (1, _ts(30), 1, 0.0), (2, _ts(60) + dt.timedelta(seconds=1), 1, 0.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    sess = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert sess[0] == sess[1]
    assert sess[2] != sess[1]


def test_stratified_sample_deterministic_and_monotone(spark):
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(300)], "doc_id long, lang string"
    )
    a = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.5}, "doc_id").collect()}
    b = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.5}, "doc_id").collect()}
    assert a == b  # rerun-stable
    # raising a rate only ADDS rows (hash thresholds are nested)
    c = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.8}, "doc_id").collect()}
    assert a <= c
    # default_rate=0 drops unlisted strata entirely
    assert all(i % 3 == 0 for i in a)


def test_hash_split_partition_and_proportions(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    rows = hash_split(df, "doc_id").collect()
    by_split: dict[str, set] = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    # a partition: disjoint + exhaustive
    assert sum(len(v) for v in by_split.values()) == 2000
    assert set(by_split) == {"train", "val", "test"}
    # rough proportions (hash uniformity at n=2000)
    assert 0.85 < len(by_split["train"]) / 2000 < 0.95
    # growing the corpus never moves an existing key's split
    rows2 = hash_split(spark.createDataFrame([(i,) for i in range(4000)], "doc_id long"), "doc_id")
    assign2 = {r["doc_id"]: r["split"] for r in rows2.collect()}
    for split, ids in by_split.items():
        for i in ids:
            assert assign2[i] == split


def test_sampling_is_shuffle_free(spark):
    df = spark.createDataFrame([(i, "en") for i in range(10)], "doc_id long, lang string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        stratified_sample(df, "lang", {"en": 0.5}, "doc_id").explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan


def test_mix_corpus_exact_quotas_and_epochs(spark):
    from ai_knowledge_graph_spark.operators.sampling import mix_corpus

    docs = spark.createDataFrame(
        [(s, i) for s in ("a", "b", "c", "d") for i in range(10)],
        "source string, doc_id long",
    ).withColumn("doc_id", F.col("doc_id") + F.when(F.col("source") == "b", 100).when(F.col("source") == "c", 200).when(F.col("source") == "d", 300).otherwise(0))
    quotas = {"a": 24, "b": 10, "c": 4}  # upsample 2.4x / exact / downsample
    out = mix_corpus(docs, quotas).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r["source"], []).append((r["doc_id"], r["epoch"]))
    # exact quota per source; unlisted source dropped entirely
    assert {s: len(v) for s, v in per_src.items()} == {"a": 24, "b": 10, "c": 4}
    # a: every doc has epochs 1,2; 4 hash-chosen docs get epoch 3
    a_epochs = {}
    for d, e in per_src["a"]:
        a_epochs.setdefault(d, set()).add(e)
    assert all({1, 2} <= es for es in a_epochs.values())
    assert sum(1 for es in a_epochs.values() if es == {1, 2, 3}) == 4
    # b: exactly one epoch per doc, all docs
    assert sorted(per_src["b"]) == [(100 + i, 1) for i in range(10)]
    # deterministic: rerun gives the identical multiset
    again = mix_corpus(docs, quotas).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_mix_corpus_no_upsample_clamps(spark):
    from ai_knowledge_graph_spark.operators.sampling import mix_corpus

    docs = spark.createDataFrame(
        [("a", i) for i in range(5)], "source string, doc_id long"
    )
    out = mix_corpus(docs, {"a": 99}, allow_upsample=False).collect()
    assert len(out) == 5 and all(r["epoch"] == 1 for r in out)


def test_mix_corpus_selection_is_hash_rank_prefix(spark):
    # the k selected docs must be the top-k by (bucket, hash, key) — i.e.
    # raising the quota only ADDS docs (monotone), never swaps them
    from ai_knowledge_graph_spark.operators.sampling import mix_corpus

    docs = spark.createDataFrame(
        [("a", i) for i in range(50)], "source string, doc_id long"
    )
    sel = {}
    for k in (10, 20, 30):
        sel[k] = {r["doc_id"] for r in mix_corpus(docs, {"a": k}).collect()}
        assert len(sel[k]) == k
    assert sel[10] < sel[20] < sel[30]


# --- sequence packing --------------------------------------------------------


def _pack_docs(spark, n=80, seed=3):
    import random

    rng = random.Random(seed)
    return spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(rng.randint(0, 40)))) for i in range(n)],
        "doc_id long, text string",
    )


def test_pack_sequences_invariants(spark):
    from collections import defaultdict

    from ai_knowledge_graph_spark.operators.sampling import pack_sequences

    docs = _pack_docs(spark)
    out = pack_sequences(docs, ctx_len=64).collect()

    per_pack = defaultdict(int)
    per_doc = defaultdict(list)
    for r in out:
        assert r["seg_len"] >= 1
        assert 0 <= r["pack_offset"] < 64
        per_pack[r["pack_id"]] += r["seg_len"]
        per_doc[r["doc_id"]].append(r)

    # every pack is exactly ctx_len tokens except the final partial one
    last = max(per_pack)
    assert set(per_pack) == set(range(last + 1)), "pack ids are contiguous"
    assert all(v == 64 for p, v in per_pack.items() if p != last)
    assert per_pack[last] <= 64

    # total tokens conserved; per-doc segments tile the doc in order
    exp_total = sum(
        len(t.split()) for _, t in docs.collect() if t.strip()
    )
    assert sum(per_pack.values()) == exp_total
    for _, segs in per_doc.items():
        segs.sort(key=lambda r: r["pack_id"])
        off = 0
        for s in segs:
            assert s["doc_offset"] == off
            off += s["seg_len"]


def test_pack_sequences_partitioning_invariant(spark):
    # the layout is a pure function of keys: any input partitioning and any
    # shuffle-partition setting yields the identical packing
    from ai_knowledge_graph_spark.operators.sampling import pack_sequences

    docs = _pack_docs(spark)
    a = sorted(map(tuple, pack_sequences(docs, ctx_len=64).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(13), ctx_len=64).collect()))
    assert a == b


def test_pack_sequences_long_doc_spans_packs(spark):
    from ai_knowledge_graph_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{j}" for j in range(300)))], "doc_id long, text string"
    )
    segs = sorted(
        pack_sequences(docs, ctx_len=64).collect(), key=lambda r: r["pack_id"]
    )
    assert [s["seg_len"] for s in segs] == [64, 64, 64, 64, 44]
    assert [s["doc_offset"] for s in segs] == [0, 64, 128, 192, 256]
    assert all(s["pack_offset"] == 0 for s in segs)


def test_pack_sequences_tokens_col(spark):
    from ai_knowledge_graph_spark.operators.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 7)], "doc_id long, bpe long"
    )
    out = pack_sequences(docs, ctx_len=8, tokens_col="bpe").collect()
    assert {r["doc_id"] for r in out} == {1, 3}  # zero-token doc dropped
    assert sum(r["seg_len"] for r in out) == 17
