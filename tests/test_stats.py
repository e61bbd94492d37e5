"""Exact order statistics (operators/stats.py): inverse-CDF semantics
checked against direct sorted-list indexing."""

import math
import random

from pyspark.sql import Row

from ai_knowledge_graph_spark.operators.stats import (
    exact_quantiles,
    exact_quantiles_by,
)


def _vals(spark, xs, col="v"):
    return spark.createDataFrame([Row(**{col: x}) for x in xs])


def test_exact_quantiles_hand_computed(spark):
    # 10 values with duplicates: sorted = [1,1,2,2,2,3,5,5,8,9]
    xs = [2, 1, 5, 2, 9, 1, 3, 8, 5, 2]
    out = {r.p: (r.value, r.rank) for r in exact_quantiles(_vals(spark, xs), "v", [0.1, 0.5, 0.75, 1.0]).collect()}
    assert out[0.1] == (1, 1)     # ceil(0.1*10)=1 -> smallest
    assert out[0.5] == (2, 5)     # rank 5 -> value 2
    assert out[0.75] == (5, 8)    # rank 8 -> value 5
    assert out[1.0] == (9, 10)    # rank 10 -> max


def test_exact_quantiles_matches_sorted_indexing(spark):
    rng = random.Random(7)
    xs = [rng.randrange(0, 50) for _ in range(501)]
    probs = [0.01, 0.25, 0.5, 0.9, 0.99]
    out = {r.p: r.value for r in exact_quantiles(_vals(spark, xs), "v", probs).collect()}
    s = sorted(xs)
    for p in probs:
        r = max(1, math.ceil(p * len(xs)))
        assert out[p] == s[r - 1], p


def test_exact_quantiles_ignores_nulls(spark):
    df = spark.createDataFrame([Row(v=1), Row(v=None), Row(v=3), Row(v=None)])
    out = {r.p: r.value for r in exact_quantiles(df, "v", [0.5, 1.0]).collect()}
    assert out == {0.5: 1, 1.0: 3}  # n=2 after null drop


def test_exact_quantiles_by_group(spark):
    rows = [Row(g="a", v=x) for x in [1, 2, 3, 4]] + [Row(g="b", v=x) for x in [10, 20]]
    out = exact_quantiles_by(
        spark.createDataFrame(rows), ["g"], "v", [0.5, 1.0]
    ).collect()
    got = {(r.g, r.p): (r.value, r.rank) for r in out}
    assert got[("a", 0.5)] == (2, 2)
    assert got[("a", 1.0)] == (4, 4)
    assert got[("b", 0.5)] == (10, 1)
    assert got[("b", 1.0)] == (20, 2)
