"""Tests for quantile_sketch, split_leakage."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.curation import split_leakage
from ai_knowledge_graph_spark.operators.sketches import quantile_sketch


# --- quantile_sketch ---------------------------------------------------------


def test_qsketch_hand_replay(spark):
    # values: 1 x50 (bucket 0), 1000 x40 (bucket 9), 100000 x10 (bucket 16)
    rows = [(1,)] * 50 + [(1000,)] * 40 + [(100000,)] * 10
    df = spark.createDataFrame(rows, "v LONG")
    got = {r["p"]: r for r in quantile_sketch(df, "v").collect()}
    # n=100: p50 target 50 -> bucket 0 (cum 50); p90 target 90 -> bucket 9
    # (cum 90); p99 target 99 -> bucket 16 (cum 100)
    assert got[50]["bucket"] == 0 and got[50]["upper_bound"] == 1
    assert got[90]["bucket"] == 9 and got[90]["upper_bound"] == 1023
    assert got[99]["bucket"] == 16
    assert all(r["n"] == 100 for r in got.values())


def test_qsketch_ceil_target(spark):
    # n=3, p50 -> target ceil(1.5)=2: second value's bucket wins
    df = spark.createDataFrame([(1,), (1,), (8,)], "v LONG")
    got = {r["p"]: r for r in quantile_sketch(df, "v", ps=(50,)).collect()}
    assert got[50]["bucket"] == 0  # cum(bucket 0) = 2 >= 2


def test_qsketch_merge_property(spark):
    # sketch(A ∪ B) == merge of shard sketches: the histogram is a monoid,
    # so quantiles over the union must match quantiles over summed counts
    a = spark.createDataFrame([(2,)] * 10, "v LONG")
    b = spark.createDataFrame([(64,)] * 30, "v LONG")
    union = {r["p"]: r["bucket"]
             for r in quantile_sketch(a.unionByName(b), "v").collect()}
    assert union[50] == 6 and union[99] == 6
    # p-anything below 25% would be bucket 1
    low = {r["p"]: r["bucket"]
           for r in quantile_sketch(a.unionByName(b), "v", ps=(25,)).collect()}
    assert low[25] == 1


def test_qsketch_bound_contains_true_quantile(spark):
    import random

    vals = [(i * 37 % 5000 + 1,) for i in range(500)]
    df = spark.createDataFrame(vals, "v LONG")
    svals = sorted(v for (v,) in vals)
    for r in quantile_sketch(df, "v").collect():
        true_q = svals[min(len(svals) - 1, (len(svals) * r["p"] + 99) // 100 - 1)]
        assert true_q <= r["upper_bound"]
        assert true_q >= 2 ** r["bucket"] // 2  # within the 2x band's reach


# --- split_leakage -----------------------------------------------------------


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a LONG, b LONG")


def _splits(spark, m):
    return spark.createDataFrame(list(m.items()), "doc_id LONG, split STRING")


def test_leakage_matrix(spark):
    pairs = _pairs(spark, [(1, 2), (3, 4), (5, 6)])
    splits = _splits(spark, {1: "train", 2: "test", 3: "train", 4: "train",
                             5: "val", 6: "train"})
    got = {(r["split_a"], r["split_b"]): r["n_pairs"]
           for r in split_leakage(pairs, splits).collect()}
    assert got == {("test", "train"): 1, ("train", "train"): 1,
                   ("train", "val"): 1}


def test_leakage_orientation_canonical(spark):
    # (train,test) and (test,train) pairs land in ONE cell
    pairs = _pairs(spark, [(1, 2), (3, 4)])
    splits = _splits(spark, {1: "train", 2: "test", 3: "test", 4: "train"})
    got = split_leakage(pairs, splits).collect()
    assert len(got) == 1 and got[0]["n_pairs"] == 2


def test_leakage_safe_split_is_diagonal(spark):
    # group-aware split: both members of each pair share a split
    pairs = _pairs(spark, [(1, 2), (3, 4)])
    splits = _splits(spark, {1: "train", 2: "train", 3: "test", 4: "test"})
    got = {(r["split_a"], r["split_b"]) for r in split_leakage(pairs, splits).collect()}
    assert all(a == b for a, b in got)
