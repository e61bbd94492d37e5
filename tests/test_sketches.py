"""Bloom / Count-Min / HLL sketch tables: pure-Python replay + the
defining guarantees (no Bloom false negatives, CMS never undercounts,
HLL within the published error envelope)."""

from __future__ import annotations

import hashlib
import math

import pytest

from ai_knowledge_graph_spark.operators.sketches import (
    bloom_build,
    bloom_contains,
    cms_build,
    cms_lookup,
    hll_build,
    hll_estimate,
)

W = 63


def _h48(v, salt):
    return int(
        hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:12], 16
    )


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "key string")


def test_bloom_replay_and_no_false_negatives(spark):
    present = [f"url{i}" for i in range(200)]
    absent = [f"miss{i}" for i in range(200)]
    bloom = bloom_build(_df(spark, present), "key", n_bits=2048, k=4)
    # exact word-table replay
    words = {}
    for v in present:
        for i in range(4):
            p = _h48(v, f"bloom{i}") % 2048
            words[p // W] = words.get(p // W, 0) | (1 << (p % W))
    got = {r["word"]: r["bits"] for r in bloom.collect()}
    assert got == words
    out = {
        r["key"]: r["maybe_present"]
        for r in bloom_contains(
            _df(spark, present + absent), bloom, "key", n_bits=2048, k=4
        ).collect()
    }
    assert all(out[v] for v in present)  # NEVER a false negative
    fp = sum(1 for v in absent if out[v])
    assert fp < len(absent)  # some true negatives at this sizing


def test_cms_replay_and_never_undercounts(spark):
    vals = ["a"] * 50 + ["b"] * 7 + ["c"] * 1
    cms = cms_build(_df(spark, vals), "key", depth=4, width=64)
    got = {
        r["key"]: r["cms_count"]
        for r in cms_lookup(
            _df(spark, ["a", "b", "c", "zzz"]), cms, "key", depth=4, width=64
        ).collect()
    }
    assert got["a"] >= 50 and got["b"] >= 7 and got["c"] >= 1
    # replay the min-over-rows estimate exactly
    counters = {}
    for v in vals:
        for d in range(4):
            key = (d, _h48(v, f"cms{d}") % 64)
            counters[key] = counters.get(key, 0) + 1
    for v in ("a", "b", "c", "zzz"):
        exp = min(
            counters.get((d, _h48(v, f"cms{d}") % 64), 0) for d in range(4)
        )
        assert got[v] == exp, v


def test_hll_replay_and_error_envelope(spark):
    n, p = 5000, 10
    vals = [f"item{i}" for i in range(n)]
    regs = hll_build(_df(spark, vals), "key", p=p)
    # register replay
    exp_regs = {}
    for v in vals:
        h = _h48(v, "hll")
        b, rest = h >> (48 - p), h % (1 << (48 - p))
        rho = (48 - p) + 1 if rest == 0 else (48 - p) - rest.bit_length() + 1
        exp_regs[b] = max(exp_regs.get(b, 0), rho)
    assert {r["bucket"]: r["register"] for r in regs.collect()} == exp_regs
    est = hll_estimate(regs, p=p).collect()[0]
    # published envelope: sigma = 1.04/sqrt(m) ~ 3.25%; allow 4 sigma
    assert est["estimate"] == pytest.approx(n, rel=4 * 1.04 / math.sqrt(1 << p))


def test_hll_small_range_correction(spark):
    regs = hll_build(_df(spark, [f"x{i}" for i in range(10)]), "key", p=10)
    est = hll_estimate(regs, p=10).collect()[0]
    # linear counting regime: near-exact at tiny cardinalities
    assert est["n_zero_registers"] >= 1014
    assert est["estimate"] == pytest.approx(10, abs=1.0)


def test_merge_by_monoid_ops(spark):
    from pyspark.sql import functions as F

    a, b = [f"a{i}" for i in range(100)], [f"b{i}" for i in range(100)]
    whole = hll_build(_df(spark, a + b), "key", p=8)
    parts = (
        hll_build(_df(spark, a), "key", p=8)
        .unionByName(hll_build(_df(spark, b), "key", p=8))
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    assert (
        hll_estimate(whole, p=8).collect()
        == hll_estimate(parts, p=8).collect()
    )
