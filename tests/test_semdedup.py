"""semdedup: pure-Python replay on deterministic vectors + planted-dup
behavior (keep-first in ascending-centroid-sim order)."""

from __future__ import annotations

import hashlib
import math

import pytest

from ai_knowledge_graph_spark.operators.similarity import semdedup

NLIST = 4


def _vec(i: int, dim: int = 6):
    # deterministic pseudo-random unit-free vectors
    return [((i * 7 + d * 13) % 17) - 8.0 for d in range(dim)]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(d / (na * nb), 6)


def _bucket(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % NLIST


def _py_semdedup(vecs: dict, threshold: float):
    reps = {}
    for i in sorted(vecs):
        b = _bucket(i)
        reps.setdefault(b, i)
    assign = {}
    for i, v in vecs.items():
        best = max(
            sorted(reps),
            key=lambda b: (_cos(v, vecs[reps[b]]), -b),
        )
        assign[i] = (best, _cos(v, vecs[reps[best]]))
    out = {}
    for b in set(x[0] for x in assign.values()):
        members = sorted(
            (i for i in vecs if assign[i][0] == b),
            key=lambda i: (assign[i][1], i),
        )
        for pos, i in enumerate(members):
            dup = any(
                _cos(vecs[i], vecs[j]) >= threshold for j in members[:pos]
            )
            out[i] = (b, assign[i][1], not dup)
    return out


def _run(spark, vecs, threshold):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    return {
        r["vec_id"]: (r["centroid_id"], r["centroid_sim"], r["kept"])
        for r in semdedup(df, threshold=threshold, nlist=NLIST).collect()
    }


def test_matches_pure_python_replay(spark):
    vecs = {i: _vec(i) for i in range(24)}
    out = _run(spark, vecs, threshold=0.95)
    exp = _py_semdedup(vecs, 0.95)
    assert set(out) == set(exp)
    for i in exp:
        assert out[i][0] == exp[i][0], i
        assert out[i][1] == pytest.approx(exp[i][1], abs=2e-6), i
        assert out[i][2] == exp[i][2], i


def test_planted_duplicates_keep_exactly_one(spark):
    # ids 50/51/52: same direction (scaled copies -> cosine 1.0); they land
    # in the same cluster only if assigned together — force that by making
    # them parallel (identical assignment sims) plus distinct fillers
    base = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    vecs = {i: _vec(i) for i in range(10)}
    vecs[50] = base
    vecs[51] = [2 * x for x in base]
    vecs[52] = [3 * x for x in base]
    out = _run(spark, vecs, threshold=0.999999)
    exp = _py_semdedup(vecs, 0.999999)
    assert out == {
        i: (e[0], pytest.approx(e[1], abs=2e-6), e[2]) for i, e in exp.items()
    }
    trio = [out[i] for i in (50, 51, 52)]
    if len({t[0] for t in trio}) == 1:  # same cluster -> exactly one kept
        assert sum(t[2] for t in trio) == 1
    # everything else is far from parallel -> kept
    assert all(out[i][2] for i in range(10))


def test_threshold_one_keeps_all_nonidentical(spark):
    vecs = {i: _vec(i) for i in range(12)}
    out = _run(spark, vecs, threshold=1.000001)
    assert all(v[2] for v in out.values())


def test_auto_nlist_growth_is_linear(spark):
    """nlist='auto' pins the Σ|c|² pairwise-cost law to ~linear growth.

    SemDeDup's in-cluster self-join costs Σ_c C(|c|,2) ≈ N²/(2·nlist);
    at FIXED nlist that is quadratic in N (the measured 17.4×-at-10×
    round-4 footgun). nlist='auto' holds expected cluster size at
    target_cluster_size, so cost must grow ~linearly. Pin it by
    measuring the cost proxy from the output's own cluster sizes at two
    corpus sizes 4× apart: linear → ratio ≈ 4, fixed-nlist quadratic
    → ratio ≈ 16. Bound at 7 (generous md5-bucket variance headroom,
    still far below quadratic).
    """

    def pair_cost(n: int) -> int:
        df = spark.createDataFrame(
            [(i, _vec(i)) for i in range(n)], ["vec_id", "embedding"]
        )
        out = semdedup(df, threshold=0.9999, nlist="auto",
                       target_cluster_size=64)
        sizes = [
            r["cnt"]
            for r in out.groupBy("centroid_id").count()
            .withColumnRenamed("count", "cnt").collect()
        ]
        assert sum(sizes) == n
        return sum(s * (s - 1) // 2 for s in sizes)

    small, big = pair_cost(500), pair_cost(2000)
    assert big < 7 * small, (small, big)
    # and the expected cluster size actually held (auto sized nlist up)
    assert big * 4 < 2000 * 2000 // 2, big  # nowhere near one-cluster N²
