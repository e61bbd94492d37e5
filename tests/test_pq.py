"""pq_topk / pq_encode / pq_codebooks: pure-Python replay + recall floor.

Product quantization (Jégou et al. 2011) is the compressed-domain ANN path:
codes are m small ints per vector, queries never touch corpus floats.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from ai_knowledge_graph_spark.operators.similarity import (
    pq_codebooks,
    pq_encode,
    pq_topk,
)

N, DIM, M, KSUB, K = 120, 16, 4, 8, 5


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _vecs():
    rng = np.random.RandomState(7)
    # clustered data so quantization has structure to capture
    centers = rng.standard_normal((6, DIM)) * 3
    v = centers[rng.randint(0, 6, N)] + rng.standard_normal((N, DIM))
    return np.round(v, 3).astype(np.float64)


def _py_pq(vecs):
    """Replay: hash-seeded codebooks, micro-int argmin codes, ADC top-k."""
    dsub = DIM // M
    by_bucket = {}
    for i in range(N):
        b = _md5_long(str(i)) % KSUB
        if b not in by_bucket or i < by_bucket[b]:
            by_bucket[b] = i
    fallback = by_bucket[min(by_bucket)]
    reps = [vecs[by_bucket.get(b, fallback)] for b in range(KSUB)]
    cbs = [[r[j * dsub : (j + 1) * dsub] for r in reps] for j in range(M)]

    def dmicro(a, c):
        d = float(np.dot(a, a)) - 2 * float(np.dot(a, c)) + float(np.dot(c, c))
        return round(d * 1e6)

    codes = {
        i: [
            min(
                (dmicro(vecs[i][j * dsub : (j + 1) * dsub], cbs[j][b]), b)
                for b in range(KSUB)
            )[1]
            for j in range(M)
        ]
        for i in range(N)
    }
    out = {}
    for q in range(3):
        scored = []
        for n in range(N):
            if n == q:
                continue
            adc = sum(
                dmicro(vecs[q][j * dsub : (j + 1) * dsub], cbs[j][codes[n][j]])
                for j in range(M)
            )
            scored.append((adc, n))
        scored.sort()
        out[q] = scored[:K]
    return cbs, codes, out


@pytest.fixture(scope="module")
def emb_df(spark):
    vecs = _vecs()
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)


def test_pq_matches_python_replay(spark, emb_df):
    vecs = _vecs()
    cbs_py, codes_py, topk_py = _py_pq(vecs)
    cbs = pq_codebooks(emb_df, m=M, ksub=KSUB)
    assert np.allclose(np.array(cbs), np.array(cbs_py))
    codes = {
        r["neighbor_id"]: list(r["codes"]) for r in pq_encode(emb_df, cbs).collect()
    }
    assert codes == codes_py
    got = pq_topk(emb_df, emb_df.filter("vec_id < 3"), k=K, m=M, ksub=KSUB)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rk"], r["adc_micro"], r["neighbor_id"])
        )
    for q, exp in topk_py.items():
        rows = sorted(by_q[q])
        assert [(d, n) for _, d, n in rows] == exp


def test_pq_recall_floor(spark, emb_df):
    vecs = _vecs()
    got = pq_topk(emb_df, emb_df.filter("vec_id < 10"), k=K, m=M, ksub=KSUB)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q in range(10):
        d = ((vecs - vecs[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        exact = set(np.argsort(d, kind="stable")[:K])
        hits += len(exact & by_q[q])
        total += K
    recall = hits / total
    # hash-seeded codebooks, compressed-domain only: measured 0.40 —
    # the floor guards regressions, the rerank test below is the recipe
    assert recall >= 0.3, recall


def test_pq_rerank_recovers_recall(spark, emb_df):
    vecs = _vecs()
    got = pq_topk(
        emb_df, emb_df.filter("vec_id < 10"), k=K, m=M, ksub=KSUB, rerank=4 * K
    )
    by_q = {}
    for r in got.collect():
        assert r["l2_micro"] >= 0
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for q in range(10):
        d = ((vecs - vecs[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        exact = set(np.argsort(d, kind="stable")[:K])
        hits += len(exact & by_q[q])
        total += K
    recall = hits / total
    # exact re-rank of the 4k ADC shortlist: measured 1.00
    assert recall >= 0.8, recall


def test_pq_codes_are_compact(emb_df):
    cbs = pq_codebooks(emb_df, m=M, ksub=KSUB)
    rows = pq_encode(emb_df, cbs).collect()
    assert all(len(r["codes"]) == M for r in rows)
    assert all(0 <= c < KSUB for r in rows for c in r["codes"])


def test_ivfpq_structure_and_recall(spark):
    """IVF-PQ composed index: output shape (k per query, ranked by exact
    int64 ADC), neighbors come only from probed lists, and recall@k
    against the exact cosine top-k clears a floor on clustered data with
    full probing (n_probe=nlist isolates PQ loss from probe loss)."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.operators.similarity import (
        cosine_topk,
        ivfpq_topk,
    )

    vecs = _vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 8)

    out = ivfpq_topk(df, q, k=K, nlist=4, n_probe=4, m=M, ksub=KSUB)
    rows = out.collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, K + 1))
        adcs = [r["adc_micro"] for r in rs]
        assert adcs == sorted(adcs)
        assert all(r["neighbor_id"] != qid for r in rs)

    exact = cosine_topk(df, q, k=K)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        len(exact_sets[qid] & {r["neighbor_id"] for r in rs})
        for qid, rs in by_q.items()
    )
    recall = hits / (8 * K)
    # hash-seeded residual codebooks on 6-cluster data: same regime as the
    # pq recall floor test; full probing removes the IVF loss term
    assert recall >= 0.3, recall


def test_ivfpq_partial_probe_subset_of_full(spark):
    """n_probe < nlist returns neighbors only from the query's nearest
    lists — every returned neighbor must also appear in the full-probe
    candidate scan of those same lists (no leakage across lists)."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.operators.similarity import ivfpq_topk

    vecs = _vecs()
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(N)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 4)
    part = ivfpq_topk(df, q, k=K, nlist=4, n_probe=1, m=M, ksub=KSUB)
    full = ivfpq_topk(df, q, k=N, nlist=4, n_probe=4, m=M, ksub=KSUB)
    part_pairs = {(r["query_id"], r["neighbor_id"], r["adc_micro"]) for r in part.collect()}
    full_pairs = {(r["query_id"], r["neighbor_id"], r["adc_micro"]) for r in full.collect()}
    assert part_pairs <= full_pairs  # same ADC values, fewer lists


def test_pq_encode_arrow_matches_expression_path(spark, emb_df):
    """The vectorized numpy encoder (default) is bit-identical to the JVM
    expression path — sequential-fold dots, HALF_UP micro rounding, and
    first-minimum tie rule all reproduced (see _pq_encode_arrow docstring)."""
    cbs = pq_codebooks(emb_df, m=M, ksub=KSUB)
    arrow = {
        r["neighbor_id"]: list(r["codes"])
        for r in pq_encode(emb_df, cbs, use_arrow=True).collect()
    }
    jvm = {
        r["neighbor_id"]: list(r["codes"])
        for r in pq_encode(emb_df, cbs, use_arrow=False).collect()
    }
    assert arrow == jvm and len(arrow) > 0
