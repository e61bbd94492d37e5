"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH-bucketed
(random hyperplane / SRP) variant as the scale path: at 100 TB the candidate
set per query is one bucket chain instead of the full corpus.

JVM-side throughout: dot products via zip_with + aggregate (no Python in the
hot path); the hyperplanes are a tiny deterministic literal array compiled
into the plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import spread


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _infer_dim(embeddings: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the first row — costs one Spark job; pass
    ``dim`` explicitly to skip it (required when the input may be empty)."""
    row = embeddings.select(vec_col).first()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot infer embedding dim: no non-null rows in {vec_col!r}; "
            "pass dim= explicitly"
        )
    return len(row[0])


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k neighbors per query row: (query_id, neighbor_id, cosine, rk).

    Queries are broadcast (the common shape: few queries x huge corpus);
    partial top-k folds map-side through the window's rank pruning.
    """
    cand = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = (
        cand.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def srp_signature(vec_col, planes: list[list[float]]):
    """Signed-random-projection bucket id for a vector column: bit i set iff
    dot(vec, plane_i) > 0. Planes ride as a literal nested array."""
    plane_lits = F.array(
        *[F.array(*[F.lit(float(x)) for x in p]) for p in planes]
    )
    bits = F.transform(
        plane_lits,
        lambda p: F.when(_dot(_as_double(vec_col), p) > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    # fold bits big-endian: acc = acc*2 + bit
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b.cast("long")
    )


def make_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def srp_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's SRP bucket in at least
    one of ``tables`` independent hash tables, then exact cosine on the
    candidate union. Standard multi-table LSH recall math: a neighbor at
    angle θ collides per table with (1 - θ/π)^n_planes; miss probability
    decays exponentially in ``tables``. n_planes trades bucket size (row
    reduction) against per-table recall."""
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    cand_base = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    pairs = None
    for t in range(tables):
        planes = make_planes(dim, n_planes, seed + 1000 * t)
        sig = srp_signature(F.col("cv"), planes)
        qsig = srp_signature(F.col("qv"), planes)
        cand = cand_base.withColumn("bucket", sig).select("neighbor_id", "bucket")
        q = F.broadcast(q_base.withColumn("bucket", qsig).select("query_id", "bucket"))
        hits = (
            cand.join(q, "bucket")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        pairs = hits if pairs is None else pairs.unionByName(hits)
    pairs = pairs.distinct()
    scored = (
        pairs.join(cand_base, "neighbor_id")
        .join(F.broadcast(q_base), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def _farthest_first_centroids(base: DataFrame, nlist: int) -> DataFrame:
    """Deterministic farthest-first traversal over (neighbor_id, cv): seed =
    min-md5(id) vector; each step adds the point whose best (max) cosine to
    the chosen set is lowest (ties -> min id). nlist driver-collected
    vectors; each step is one broadcast compare + top-1 over the corpus."""
    from .dedup import _md5_long as _h

    spark = base.sparkSession
    first = (
        base.withColumn("_h", _h(F.col("neighbor_id").cast("string")))
        .orderBy("_h", "neighbor_id")
        .limit(1)
        .collect()[0]
    )
    chosen = [list(first["cv"])]
    for _ in range(1, nlist):
        lits = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in chosen])
        best_cos = F.array_max(
            F.transform(
                lits,
                lambda c: F.round(
                    _dot(F.col("cv"), c) / (_norm(F.col("cv")) * _norm(c)), 6
                ),
            )
        )
        nxt = (
            base.withColumn("_bc", best_cos)
            .orderBy(F.asc("_bc"), F.asc("neighbor_id"))
            .limit(1)
            .collect()
        )
        if not nxt:
            break
        chosen.append(list(nxt[0]["cv"]))
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(chosen)],
        "centroid_id int, centroid array<double>",
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    seeding: str = "hash",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into ``nlist``
    inverted lists (nearest centroid), probe the query's ``n_probe`` nearest
    lists, exact cosine within probed lists only.

    ``seeding='hash'`` (default, the oracle path): ids hash into ``nlist``
    buckets (md5-derived — portable to the DuckDB oracle) and each bucket's
    min-id vector is its centroid; deterministic with no global sort.
    ``seeding='kpp'``: deterministic farthest-first traversal (the k-means++
    shape with the argmax instead of a random draw): start from the min-
    hash-id vector, then repeatedly add the point with the LOWEST max-cosine
    to any chosen centroid. Costs ``nlist`` corpus passes at index-build
    time; not mirrored in SQL. MEASURED WORSE than 'hash' on the sf0.01
    embeddings (recall@5 0.46 vs 0.73 at nlist=16/n_probe=4; full grid in
    COVERAGE.md): the argmax picks outliers as centroids — the exact
    failure k-means++ randomizes away with D²-sampling — leaving most mass
    near few centroids. Kept as a documented dead end; use 'hash' (+
    ``kmeans_iters`` for recall). Determinism keeps the oracle exact at the
    default ``kmeans_iters=0`` + ``seeding='hash'``.
    ``kmeans_iters>0`` runs that many distributed Lloyd iterations
    (assign to nearest centroid, recompute element-wise means via
    posexplode + groupBy — every step an agg with map-side combine) to
    tighten the lists; float-sum ordering makes refined centroids
    bit-nondeterministic, so the refined mode is for recall, not for the
    exact-oracle path. At 100 TB the corpus scan is the only big side: centroid
    selection is one groupBy over ids, assignment is a broadcast nested
    loop over nlist rows, the probe join is an equi-join on centroid_id,
    and per-list fan-out is corpus/nlist on average — tune nlist so each
    list fits one task. Like :func:`semdedup`, nlist must SCALE WITH N
    (nlist ≈ N / target_list_size, FAISS's own guidance is ~sqrt(N)..N/256):
    a fixed nlist makes probed-list scan cost N·n_probe/nlist grow
    superlinearly in corpus size. The contract queries pin nlist=16 only
    because the oracle replays the exact index shape.
    """
    from .dedup import _md5_long

    base = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    if seeding == "kpp":
        centroids = _farthest_first_centroids(base, nlist)
    elif seeding == "hash":
        bucket = (_md5_long(F.col("neighbor_id").cast("string")) % nlist).cast("int")
        reps = (
            base.select(bucket.alias("centroid_id"), "neighbor_id")
            .groupBy("centroid_id")
            .agg(F.min("neighbor_id").alias("rep_id"))
        )
        centroids = reps.join(
            base.select(F.col("neighbor_id").alias("rep_id"), F.col("cv").alias("centroid")),
            "rep_id",
        ).select("centroid_id", "centroid")
    else:
        raise ValueError(f"seeding must be 'hash' or 'kpp', got {seeding!r}")
    for _ in range(kmeans_iters):
        cb = F.broadcast(centroids)
        assigned = (
            base.crossJoin(cb)
            .withColumn(
                "c_cos",
                _dot(F.col("cv"), F.col("centroid"))
                / (_norm(F.col("cv")) * _norm(F.col("centroid"))),
            )
            .withColumn(
                "pr",
                F.row_number().over(
                    Window.partitionBy("neighbor_id").orderBy(
                        F.desc("c_cos"), F.asc("centroid_id")
                    )
                ),
            )
            .filter(F.col("pr") == 1)
            .select("centroid_id", "cv")
        )
        dims = assigned.select(
            "centroid_id", F.posexplode("cv").alias("pos", "val")
        )
        means = dims.groupBy("centroid_id", "pos").agg(F.avg("val").alias("m"))
        centroids = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id", F.transform("pm", lambda s: s["m"]).alias("centroid")
            )
            .localCheckpoint(eager=True)
        )
    c = F.broadcast(centroids)

    def nearest(df, in_id, out_cols, probes):
        # rounded before ranking: keeps probe assignment bit-identical to
        # the SQL oracle across float summation orders
        scored = df.crossJoin(c).withColumn(
            "c_cos",
            F.round(
                _dot(F.col("v"), F.col("centroid"))
                / (_norm(F.col("v")) * _norm(F.col("centroid"))),
                6,
            ),
        )
        w = Window.partitionBy(in_id).orderBy(F.desc("c_cos"), F.asc("centroid_id"))
        return (
            scored.withColumn("pr", F.row_number().over(w))
            .filter(F.col("pr") <= probes)
            .select(*out_cols)
        )

    corpus_lists = nearest(
        base.select(F.col("neighbor_id"), F.col("cv").alias("v")),
        "neighbor_id",
        [F.col("neighbor_id"), F.col("v").alias("cv"), "centroid_id"],
        1,
    )
    q_base = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q_lists = nearest(
        q_base, "query_id", [F.col("query_id"), F.col("v").alias("qv"), "centroid_id"], n_probe
    )
    scored = (
        corpus_lists.join(F.broadcast(q_lists), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) with a < b and
    exact cosine ≥ ``threshold``, candidates restricted to pairs sharing an
    SRP bucket in at least one of ``tables`` hash tables.

    The all-pairs version is quadratic in the corpus; here the pair set is
    Σ_buckets |bucket|² per table — at 100 TB tune n_planes up so buckets
    stay task-sized (each extra plane halves the expected bucket). Recall
    follows the standard multi-table SRP math: a pair at angle θ collides
    per table with (1 - θ/π)^n_planes; for near-dups (θ small) the per-table
    collision probability is high and the miss rate decays exponentially in
    ``tables``. Same-bucket self-join, exact rescoring — no Python in the
    plan.
    """
    if dim is None:
        dim = _infer_dim(embeddings, vec_col)
    base = spread(embeddings).select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    pairs = None
    for t in range(tables):
        planes = make_planes(dim, n_planes, seed + 1000 * t)
        bucketed = base.withColumn("bucket", srp_signature(F.col("v"), planes)).select(
            "id", "bucket"
        )
        lhs = bucketed.select(F.col("id").alias("a"), "bucket")
        rhs = bucketed.select(F.col("id").alias("b"), "bucket")
        hits = lhs.join(rhs, "bucket").filter(F.col("a") < F.col("b")).select("a", "b")
        pairs = hits if pairs is None else pairs.unionByName(hits)
    pairs = pairs.distinct()
    va = base.select(F.col("id").alias("a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        pairs.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    nlist: int | str = "auto",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_size: int = 256,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-scoped
    semantic deduplication. Returns one row per input vector —
    (id_col, centroid_id, centroid_sim, kept) — where ``kept=false`` marks
    a semantic duplicate to drop.

    The published recipe, re-expressed relationally: coarse-cluster the
    corpus (here the engine's deterministic hash-seeded centroids, the
    same index shape as :func:`ivf_topk`), order each cluster's members by
    similarity TO the centroid ascending (the paper's best-performing
    "keep low centroid-similarity" variant — the kept survivor of a dup
    group is its least-prototypical member), and drop any item whose
    cosine to an EARLIER member of its own cluster reaches ``threshold``.
    Keep-first over a fixed order makes the survivor set well-defined and
    rerun-stable with no iterative union-find: a dup group keeps exactly
    its first element.

    Scale shape — the entire point of SemDeDup is bounding the quadratic:
    the pairwise stage is a self-equi-join ON centroid_id, so cost is
    Σ_c |c|² not N²; nlist MUST grow with the corpus (the paper uses 50k
    clusters for LAION) to keep each cluster task-sized. A FIXED nlist is
    the measured 100-TB footgun: at nlist=16 the 200k-vector stage grew
    17.4× when vectors grew 10× (BENCH/BASELINE.md round 4) — exactly the
    Σ|c|² = N²/nlist law. ``nlist="auto"`` (the default) sizes
    nlist = max(1, N // target_cluster_size), holding the expected
    cluster size — and therefore per-task pairwise work — constant as the
    corpus grows, which makes total cost ~linear in N (one extra count()
    job, amortized). Pass an int to pin the index shape instead (e.g. to
    mirror a pre-built IVF index). The centroid table stays a broadcast
    dim; assignment is a broadcast nested loop; the in-cluster window
    ranks cluster-sized partitions. Rounded (6dp) cosines everywhere keep
    ranking + threshold decisions bit-identical to the DuckDB oracle
    across float summation orders.
    """
    from .dedup import _md5_long

    if nlist == "auto":
        nlist = max(1, embeddings.count() // target_cluster_size)

    base = spread(embeddings).select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    bucket = (_md5_long(F.col("_id").cast("string")) % nlist).cast("int")
    reps = (
        base.select(bucket.alias("centroid_id"), "_id")
        .groupBy("centroid_id")
        .agg(F.min("_id").alias("_rep"))
    )
    cents = F.broadcast(
        reps.join(
            base.select(F.col("_id").alias("_rep"), F.col("_v").alias("_c")),
            "_rep",
        ).select("centroid_id", "_c")
    )
    assigned = (
        base.crossJoin(cents)
        .withColumn(
            "centroid_sim",
            F.round(
                _dot(F.col("_v"), F.col("_c"))
                / (_norm(F.col("_v")) * _norm(F.col("_c"))),
                6,
            ),
        )
        .withColumn(
            "_pr",
            F.row_number().over(
                Window.partitionBy("_id").orderBy(
                    F.desc("centroid_sim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("_pr") == 1)
        .select("_id", "_v", "centroid_id", "centroid_sim")
    )
    ranked = assigned.withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("centroid_id").orderBy(
                F.asc("centroid_sim"), F.asc("_id")
            )
        ),
    ).localCheckpoint(eager=True)
    earlier = ranked.select(
        "centroid_id",
        F.col("_id").alias("_eid"),
        F.col("_v").alias("_ev"),
        F.col("_rn").alias("_ern"),
    )
    dup_ids = (
        ranked.join(earlier, "centroid_id")
        .filter(F.col("_ern") < F.col("_rn"))
        .withColumn(
            "_cos",
            F.round(
                _dot(F.col("_v"), F.col("_ev"))
                / (_norm(F.col("_v")) * _norm(F.col("_ev"))),
                6,
            ),
        )
        .filter(F.col("_cos") >= F.lit(threshold))
        .select("_id")
        .distinct()
    )
    return ranked.join(
        dup_ids.withColumn("_dup", F.lit(True)), "_id", "left"
    ).select(
        F.col("_id").alias(id_col),
        "centroid_id",
        "centroid_sim",
        F.col("_dup").isNull().alias("kept"),
    )


def _sqdist_micro(a, b):
    """||a-b||^2 as exact int64 micro-units: round((aa - 2ab + bb) * 1e6).

    The three dots are separate left-to-right folds (DuckDB's
    list_dot_product on DOUBLE[] is bit-identical to this, the _sql_cos
    precedent), and freezing to integer micro-units BEFORE any further
    arithmetic makes every downstream compare/sum order-independent — the
    DSIR parity trick, reused here for the PQ assignment argmin and the
    ADC sum."""
    d = _dot(a, a) - 2 * _dot(a, b) + _dot(b, b)
    return F.round(d * 1e6, 0).cast("long")


def pq_codebooks(
    embeddings: DataFrame,
    m: int,
    ksub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic hash-seeded PQ codebooks: ``cb[j][b]`` is subvector j
    of the min-id representative of md5-hash bucket b (the ivf_topk seeding,
    sliced per subspace). One vocabulary-sized aggregation + a ksub-row
    collect — the codebook is the MODEL, driver-sized at any corpus scale.
    Buckets that get no representative fall back to the LOWEST OCCUPIED
    bucket's rep (deterministic, mirrored by the oracle only when every
    bucket is occupied — true for the fixture sizes; pass a larger corpus
    or smaller ksub otherwise)."""
    from .dedup import _md5_long

    base = spread(embeddings).select(
        F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
    )
    bucket = (_md5_long(F.col("_id").cast("string")) % ksub).cast("int")
    reps = (
        base.select(bucket.alias("_b"), "_id")
        .groupBy("_b")
        .agg(F.min("_id").alias("_rid"))
        .join(base.select(F.col("_id").alias("_rid"), "_v"), "_rid")
        .select("_b", "_v")
        .collect()
    )
    by_bucket = {r["_b"]: list(r["_v"]) for r in reps}
    dim = len(next(iter(by_bucket.values())))
    dsub = dim // m
    vecs = [by_bucket.get(b, by_bucket[min(by_bucket)]) for b in range(ksub)]
    return [
        [v[j * dsub : (j + 1) * dsub] for v in vecs] for j in range(m)
    ]


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow: bool = True,
) -> DataFrame:
    """(id, codes): product-quantization codes — m small ints per vector.

    One linear JVM pass: per subspace, argmin of the exact micro-unit
    squared distance to each of the ksub codebook entries (ties -> lowest
    code), picked with array_min over (dist, code) structs. The codes table
    is the 100 TB artifact: m bytes/vector instead of 4*dim — the corpus
    side of every later query touches ONLY this table.

    Cost shape: the codebook rides into the plan as ONE nested array
    literal per subspace and the per-centroid distances come from a
    ``transform`` lambda over it — constant-size Python expression tree
    (the naive version built 64 hand-rolled sqdist expressions and
    spent ~9 s of DRIVER py4j time per call before a single row moved),
    all-JVM execution, same (aa - 2ab + bb) fold order as the oracle."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    if use_arrow:
        return _pq_encode_arrow(embeddings, codebooks, id_col, vec_col)
    v = _as_double(F.col(vec_col))
    codes = []
    for j, cb in enumerate(codebooks):
        s = F.slice(v, j * dsub + 1, dsub)
        dists = F.transform(F.lit(cb), lambda c: _sqdist_micro(s, c))
        best = F.array_min(
            F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                lambda d, b: F.struct(d.alias("d"), b.alias("b")),
            )
        )
        codes.append(best["b"])
    return spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), F.array(*codes).alias("codes")
    )


def _pq_encode_arrow(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """pq_encode's guide-§4.2 twin: the per-row m×ksub exact-micro distance
    argmin runs as vectorized numpy over Arrow batches instead of
    interpreted higher-order JVM expressions — BIT-IDENTICAL codes,
    pytest-pinned against the expression path (test_pq.py):

    * every elementwise op (cast to double, product, ×2, the
      aa − 2ab + bb combination) is one IEEE double op in both engines;
    * the three dot products are SEQUENTIAL left folds in the expression
      path, reproduced with ``np.add.accumulate`` (defined sequentially —
      unlike np.sum/np.dot, whose pairwise order would drift a ulp);
    * ``F.round(v, 0)`` (BigDecimal HALF_UP) on v ≥ 0 equals
      ``floor(v) + (v − floor(v) >= 0.5)``: v − floor(v) is exact by
      Sterbenz, and HALF_UP consults the exact decimal fraction, which is
      that remainder;
    * np.argmin takes the FIRST minimum — the expression path's
      (distance, code) struct-min tie rule.
    """
    import numpy as np
    import pandas as pd

    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    id_type = dict(embeddings.dtypes)[id_col]

    def _seq_last(prods):
        # sequential-fold sum over the last axis (exact JVM aggregate order)
        return np.add.accumulate(prods, axis=-1)[..., -1]

    def gen(batches):
        bb = np.empty((m, ksub))
        for j in range(m):
            bb[j] = _seq_last(cb[j] * cb[j])
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"neighbor_id": [], "codes": []})
                continue
            V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                S = V[:, j * dsub : (j + 1) * dsub]
                aa = _seq_last(S * S)  # (n,)
                ab = _seq_last(S[:, None, :] * cb[j][None, :, :])  # (n, ksub)
                d = (aa[:, None] - 2.0 * ab) + bb[j][None, :]
                v = d * 1e6
                f = np.floor(v)
                micro = (f + (v - f >= 0.5)).astype(np.int64)
                codes[:, j] = np.argmin(micro, axis=1)
            yield pd.DataFrame(
                {"neighbor_id": pdf[id_col], "codes": list(codes)}
            )

    return (
        spread(embeddings)
        .select(id_col, vec_col)
        .mapInPandas(gen, f"neighbor_id {id_type}, codes array<int>")
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): asymmetric distance
    computation over hash-seeded codebooks.

    Train: :func:`pq_codebooks` (driver-sized model). Index:
    :func:`pq_encode` (linear scan -> m-int codes). Query: each query row
    precomputes its m×ksub distance table ONCE as a literal-codebook JVM
    expression; the scan side then does m integer array lookups per
    (query, candidate) pair — the corpus' float vectors are never read at
    query time, which is the entire point at 100 TB (codes are ~32x smaller
    than float32 vectors; the scan is memory-bound on codes, not vectors).
    All distances are exact int64 micro-units end to end (argmin, table,
    ADC sum), so ranking is order-independent and the DuckDB oracle is
    hash-exact. Top-k via per-query window on (adc_micro asc, id asc).

    ``rerank=R`` (R > k) adds the standard exact re-ranking stage: shortlist
    the top R by ADC, fetch floats for ONLY those R rows per query (an
    equi-join back into the vector table), exact micro-unit L2, final top-k
    on (l2_micro, id). Measured on the clustered test fixture: recall@5
    0.40 compressed-only -> 1.00 with rerank=4k — the usual PQ recipe when
    codebooks are hash-seeded rather than k-means-trained. rerank=0 is the
    oracle path."""
    cbs = pq_codebooks(embeddings, m, ksub, id_col, vec_col)
    dsub = len(cbs[0][0])
    # the codes INDEX is materialized before scoring (m ints per row —
    # tiny); without the cut the encode projection sits under the join and
    # re-evaluates per (query, candidate) pair
    codes = pq_encode(embeddings, cbs, id_col, vec_col).localCheckpoint(
        eager=True
    )
    qv = _as_double(F.col(vec_col))

    def _qdists(j: int, cb):
        # NB: a 2-arg lambda (even via a default) makes transform pass the
        # array INDEX as the second arg — close over j with a def instead
        return F.transform(
            F.lit(cb), lambda c: _sqdist_micro(F.slice(qv, j * dsub + 1, dsub), c)
        )

    qtab = F.array(*[_qdists(j, cb) for j, cb in enumerate(cbs)])
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), qtab.alias("_qtab"))
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("_qtab"),
            F.col("codes"),
            lambda tab, c: F.element_at(tab, c + 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    scored = (
        codes.crossJoin(q)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_micro"), F.asc("neighbor_id")
    )
    ranked = scored.withColumn("rk", F.row_number().over(w))
    if not rerank:
        return ranked.filter(F.col("rk") <= k)
    shortlist = ranked.filter(F.col("rk") <= rerank).drop("rk")
    nvec = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_nv")
    )
    qvec = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
        )
    )
    exact = (
        shortlist.join(nvec, "neighbor_id")
        .join(qvec, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "adc_micro",
            _sqdist_micro(F.col("_qv"), F.col("_nv")).alias("l2_micro"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.asc("l2_micro"), F.asc("neighbor_id")
    )
    return exact.withColumn("rk", F.row_number().over(w2)).filter(
        F.col("rk") <= k
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 8,
    n_probe: int = 2,
    m: int = 4,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (Jégou et al. 2011, the FAISS-standard composed index): coarse
    quantizer partitions the corpus into ``nlist`` inverted lists; each
    vector stores its list id + PQ codes of its RESIDUAL (v - centroid);
    a query probes its ``n_probe`` nearest lists and scans ONLY their codes
    with a per-(query, list) ADC table built on the query's residual.

    This is the 100 TB ANN shape: the corpus scan per query touches
    n_probe/nlist of the code table (m small ints per vector), never the
    float vectors; both models (centroids: nlist x dim; residual codebooks:
    m x ksub x dsub) are driver-sized and ride into the plan as nested
    literals (the pq_encode expression-cost lesson).

    Everything is exact int64 micro-units (coarse assignment argmin, probe
    ranking, distance tables, ADC sum — the DSIR freeze-before-arithmetic
    trick), so ranking is order-independent and the DuckDB oracle is
    hash-exact. Hash-seeded coarse centroids and residual codebooks (the
    ivf_topk/pq_codebooks seeding; same all-buckets-occupied caveat).
    Residual doubles are the same IEEE subtractions on both engines.

    Scale note (same Σ-law as semdedup/ivf_topk): nlist must grow with the
    corpus — per-query scanned codes are N·n_probe/nlist, so a fixed nlist
    degrades to a near-full scan as N grows. Size nlist ≈ N / target list
    size (FAISS guidance ~sqrt(N) .. N/256); the contract query pins
    nlist=8 only so the oracle replays the exact index shape.
    """
    from .dedup import _md5_long

    base = spread(embeddings).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )

    # --- coarse centroids: md5 bucket -> min-id rep (model-sized) --------
    cbucket = (_md5_long(F.col("neighbor_id").cast("string")) % nlist).cast("int")
    crows = (
        base.select(cbucket.alias("_b"), "neighbor_id")
        .groupBy("_b")
        .agg(F.min("neighbor_id").alias("_rid"))
        .join(
            base.select(F.col("neighbor_id").alias("_rid"), "cv"), "_rid"
        )
        .select("_b", "cv")
        .collect()
    )
    by_b = {r["_b"]: list(r["cv"]) for r in crows}
    cents = [by_b.get(b, by_b[min(by_b)]) for b in range(nlist)]
    dim = len(cents[0])
    dsub = dim // m
    centlit = F.lit(cents)

    def _assign(vec):
        dists = F.transform(centlit, lambda c: _sqdist_micro(vec, c))
        best = F.array_min(
            F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(nlist - 1)),
                lambda d, b: F.struct(d.alias("d"), b.alias("b")),
            )
        )
        return best["b"]

    assigned = base.withColumn("centroid_id", _assign(F.col("cv")))
    resid = F.zip_with(
        F.col("cv"),
        F.element_at(centlit, F.col("centroid_id") + 1),
        lambda x, y: x - y,
    )
    assigned = assigned.withColumn("rv", resid).localCheckpoint(eager=True)

    # --- residual PQ codebooks (reuse pq_codebooks over the residuals) ---
    cbs = pq_codebooks(
        assigned.select("neighbor_id", "rv"), m, ksub, "neighbor_id", "rv"
    )
    codes = pq_encode(assigned.select("neighbor_id", "rv"), cbs, "neighbor_id", "rv")
    codes = (
        codes.join(assigned.select("neighbor_id", "centroid_id"), "neighbor_id")
        .localCheckpoint(eager=True)
    )

    # --- query side: probe n_probe lists, per-(query, list) ADC table ----
    qv = _as_double(F.col(vec_col))
    qd = F.zip_with(
        F.transform(centlit, lambda c: _sqdist_micro(qv, c)),
        F.sequence(F.lit(0), F.lit(nlist - 1)),
        lambda d, b: F.struct(d.alias("d"), b.alias("b")),
    )
    probes = F.slice(F.array_sort(qd), 1, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"), qv.alias("qv"), probes.alias("_p")
    ).select(
        "query_id", "qv", F.explode("_p").alias("_probe")
    ).select(
        "query_id", "qv", F.col("_probe.b").alias("centroid_id")
    )
    qrv = F.zip_with(
        F.col("qv"),
        F.element_at(centlit, F.col("centroid_id") + 1),
        lambda x, y: x - y,
    )
    q = q.withColumn("qrv", qrv)

    def _qtab(j: int, cb):
        # close over j with a def — 2-arg lambdas receive the array INDEX
        def one(c):
            return _sqdist_micro(F.slice(F.col("qrv"), j * dsub + 1, dsub), c)

        return F.transform(F.lit(cb), one)

    q = F.broadcast(
        q.select(
            "query_id",
            "centroid_id",
            F.array(*[_qtab(j, cb) for j, cb in enumerate(cbs)]).alias("_qtab"),
        )
    )

    adc = F.aggregate(
        F.zip_with(
            F.col("_qtab"), F.col("codes"), lambda tab, c: F.element_at(tab, c + 1)
        ),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    scored = (
        codes.join(q, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_micro"), F.asc("neighbor_id")
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def knn_classify(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(query_id, predicted_label, votes): k-NN majority-vote labeling.

    The standard application layer on top of the ANN stack (cosine_topk /
    ivf_topk / pq_topk are interchangeable retrieval backends; this uses
    the exact one so the result is oracle-replayable): each query takes the
    majority label among its k nearest labeled candidates, ties broken to
    the smaller label. A web-pipeline uses this shape for weak labeling —
    propagating a small seed of human labels (quality tiers, topics,
    licenses) across a huge embedded corpus.

    Plan shape: cosine_topk's broadcast-queries scan (corpus is never
    collected or broadcast), one hash join to attach candidate labels (on
    neighbor_id), then two map-side-combinable aggregations — (query,
    label) vote counts and a min_by over struct(-votes, label). No windows
    beyond the top-k rank pruning inside cosine_topk (bounded at k per
    query).
    """
    top = cosine_topk(
        candidates.select(id_col, vec_col),
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )
    lab = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nlabel")
    )
    votes = top.join(lab, "neighbor_id").groupBy("query_id", "nlabel").agg(
        F.count(F.lit(1)).alias("votes")
    )
    return (
        votes.groupBy("query_id")
        .agg(
            F.min_by(
                F.struct(F.col("nlabel").alias("predicted_label"), "votes"),
                F.struct((-F.col("votes")).alias("nv"), F.col("nlabel")),
            ).alias("w")
        )
        .select("query_id", "w.predicted_label", "w.votes")
    )


def embedding_qa(
    embeddings: DataFrame,
    expected_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(n_vecs, n_bad_dim, n_null_component, n_zero_norm, n_unit_ppm):
    one-row vector-table QA gate — the checks an embedding ingest runs
    before ANN indexes are built over it: wrong-dimension rows (a
    schema drift), NULL components (a serialization bug), zero-norm
    vectors (cosine is undefined — these silently poison top-k), and
    how many are already unit-normalized (norm² within 0.1% of 1).

    norm² freezes per-COMPONENT to micro ints (round(x²·1e6) summed in
    int64), so the zero/unit tests are exact and order-free. One pass,
    one global agg.
    """
    v = F.col(vec_col)
    norm2_micro = F.aggregate(
        F.transform(
            v,
            lambda x: F.round(
                x.cast("double") * x.cast("double") * F.lit(1000000.0)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    has_null = F.exists(v, lambda x: x.isNull())
    rows = embeddings.select(
        (F.size(v) != expected_dim).cast("long").alias("bad_dim"),
        has_null.cast("long").alias("has_null"),
        F.when(has_null, F.lit(None)).otherwise(norm2_micro).alias("n2"),
    )
    return rows.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("bad_dim").cast("long").alias("n_bad_dim"),
        F.sum("has_null").cast("long").alias("n_null_component"),
        F.sum((F.col("n2") == 0).cast("long")).cast("long").alias("n_zero_norm"),
        F.expr(
            "(sum(CASE WHEN n2 BETWEEN 999000 AND 1001000 THEN 1 ELSE 0 END)"
            " * 1000000) DIV count(*)"
        ).cast("long").alias("n_unit_ppm"),
    )


def pool_embeddings_long(
    embeddings: DataFrame,
    group_size: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
) -> DataFrame:
    """(group_id, n_vecs, pos, m): mean-pool chunk vectors into one
    vector per group, returned in LONG (row-per-component) form — the
    chunk->document pooling step of every long-document embedding
    pipeline. The group key is ``group_col`` when the chunk table
    carries a real document id; otherwise ``id_col DIV group_size``
    (the synthetic-fixture default).

    Exact arithmetic: each component freezes to round(x*1e6) int64
    BEFORE the sum and the mean is integer (sum DIV n), so outputs are
    hash-identical on replay regardless of aggregation order. Shape:
    one explode to (group, pos, val), one (group, pos) sum, one
    broadcast join to the group sizes — all atomic columns, so any
    row-hash harness (the driver's pandas canonicalizer included) can
    certify it directly.
    """
    if group_col is not None:
        g = F.col(group_col)
    else:
        g = F.expr(f"{id_col} DIV {group_size}").cast("long")
    comp = embeddings.select(
        g.alias("group_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast(
                    "long"
                ),
            )
        ).alias("pos", "v"),
    )
    nv = embeddings.select(g.alias("group_id")).groupBy("group_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    summed = comp.groupBy("group_id", "pos").agg(F.sum("v").alias("s"))
    return summed.join(F.broadcast(nv), "group_id").select(
        "group_id",
        "n_vecs",
        F.col("pos").cast("long").alias("pos"),
        F.expr("s DIV n_vecs").alias("m"),
    )


def pool_embeddings(
    embeddings: DataFrame,
    group_size: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
) -> DataFrame:
    """(group_id, n_vecs, pooled_micro): array-valued mean pooling — the
    library API over :func:`pool_embeddings_long`, re-assembling each
    group's components into an int64 vector (array_sort over (pos, m)
    structs — per-group cardinality = dim, bounded).
    """
    return (
        pool_embeddings_long(
            embeddings,
            group_size=group_size,
            id_col=id_col,
            vec_col=vec_col,
            group_col=group_col,
        )
        .groupBy("group_id", "n_vecs")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("pooled_micro")
        )
    )
