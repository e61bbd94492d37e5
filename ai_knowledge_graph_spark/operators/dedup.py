"""Document deduplication operators for training-data pipelines.

Exact dedup mirrors the reference's corpus preparation (sha256 of
whitespace-normalized text, prepare_data.py:124-128, S5/X9). The near-dup
family (MinHash-LSH, SimHash, n-gram Jaccard) extends it to the scale path a
100 TB corpus needs (first-class per the build brief).

Everything is hash-portable: token hashes derive from md5 hex prefixes so the
DuckDB oracle can reproduce signatures bit-for-bit (no JVM/Python-specific
hashing in results).

Scale notes:
  * shingling + banding is linear; the only shuffle joins are on band-hash
    (LSH) / simhash-band keys, whose block sizes are capped by construction;
  * exact Jaccard verification runs only on LSH candidate pairs — never
    all-pairs;
  * map-side combine applies to every groupBy (band buckets, signatures).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import spread

# md5-hex-prefix -> bigint: stable across Spark and DuckDB.
def _md5_long(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


# Mersenne prime 2^31 - 1: the minhash universal-hash modulus. Small enough
# that a*h < 2^62 stays in int64 (no decimal/ANSI overflow), large enough for
# per-doc shingle ordering (32-bit minhash is the literature default).
_M31 = (1 << 31) - 1


def minhash_coeffs(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) universal-hash coefficients mod 2^31-1.

    md5-derived so Spark and the DuckDB oracle embed the SAME literals;
    a_i ∈ [1, p-1], b_i ∈ [0, p-1] — the full Carter-Wegman family, so each
    h_i(x) = (a_i·x + b_i) mod p genuinely wraps and reorders the shingle
    space independently per i. (The earlier tiny-multiplier scheme kept
    a·h < p, so the mod never wrapped and every slot was monotone in the
    single min base hash — LSH banding collapsed to plain Jaccard; flagged
    by the round-2 advisor.)
    """
    out = []
    for i in range(num_hashes):
        da = hashlib.md5(f"mh:{seed}:{i}:a".encode()).hexdigest()
        db = hashlib.md5(f"mh:{seed}:{i}:b".encode()).hexdigest()
        out.append((int(da[:12], 16) % (_M31 - 1) + 1, int(db[:12], 16) % _M31))
    return out


def normalized_text(col):
    """Whitespace-normalized text (prepare_data.py:124-128)."""
    return F.regexp_replace(F.trim(col), r"\s+", " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one row per distinct normalized content (min id wins)."""
    hashed = docs.withColumn("content_hash", F.sha2(normalized_text(F.col(text_col)), 256))
    from pyspark.sql import Window

    w = Window.partitionBy("content_hash").orderBy(F.col(id_col).asc())
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "content_hash")
    )


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle) word k-grams of lowercased text, distinct per doc."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    worded = spread(docs).select(
        F.col(id_col).alias("doc_id"), words.alias("words")
    ).filter(F.size("words") >= k)
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, size(words) - {k - 1}),"
            f" i -> concat_ws(' ', slice(words, i, {k})))"
        )
    )
    return worded.select("doc_id", F.explode(grams).alias("shingle"))


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 32, seed: int = 7
) -> DataFrame:
    """(doc_id, sig array<bigint>) — min over h_i(shingle) per doc.

    h_i(x) = (a_i · (md5long48(x) mod p) + b_i) mod p with p = 2^31-1 and
    (a_i, b_i) from :func:`minhash_coeffs` — a genuine universal family
    (each slot an independent permutation-approximation), all int64, and
    portable to SQL. The mod-p reduction of the 48-bit base hash can merge
    two shingles with probability ~|shingles|²/2^32 per doc — the standard
    32-bit-minhash regime, negligible Jaccard distortion.
    """
    base = sh.withColumn(
        "h0",
        F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("bigint")
        % F.lit(_M31),
    )
    coeffs = minhash_coeffs(num_hashes, seed)
    mins = [
        F.min((F.lit(a) * F.col("h0") + F.lit(b)) % F.lit(_M31)).alias(f"m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agged = base.groupBy("doc_id").agg(*mins)
    return agged.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def band_buckets(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, band, bucket): one row per signature band. The materialized
    form a corpus stores so future batches can be deduped against it
    incrementally (see incremental_near_dup) — band-partitioned storage
    makes the new-batch probe an equi-join into the right buckets only."""
    # Bucket key = the band slice itself, rendered as a string: equality of
    # keys <=> equality of slices, so candidate generation is exact AND the
    # DuckDB oracle reproduces it verbatim (xxhash64 would be JVM-only; at
    # petabyte scale swap in a hash of this string to shrink shuffle keys).
    return signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(a, b) candidate pairs: docs sharing at least one LSH band bucket.

    Banding: split the signature into ``bands`` groups of ``rows_per_band``
    values; bucket key = the band slice; join within buckets only.
    """
    banded = band_buckets(signatures, bands, rows_per_band)
    lhs = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    rhs = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    return (
        lhs.join(rhs, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame, candidates: DataFrame | None = None, threshold: float = 0.5
) -> DataFrame:
    """(a, b, jaccard) exact word-shingle Jaccard >= threshold.

    With ``candidates`` (e.g. from LSH) the exact computation is verified
    only on those pairs (the 100 TB path); without, all co-shingled pairs
    are scored (small-corpus / oracle mode).
    """
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        # Candidate-bounded intersection: join each pair's shingle sets
        # directly. Work is O(Σ_pairs |shingles|), never the co-shingle
        # cross product — a hot shingle shared by 10k docs costs nothing
        # unless LSH actually banded those docs together. (A post-hoc
        # semi-join on the all-pairs join would still *compute* the
        # explosion before discarding it.)
        sa = sh.select(F.col("doc_id").alias("a"), "shingle")
        sb = sh.select(F.col("doc_id").alias("b"), "shingle")
        inter = (
            candidates.join(sa, "a")
            .join(sb, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("shared"))
            .join(counts.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na")), "a")
            .join(counts.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb")), "b")
        )
    else:
        ex = sh.join(counts, "doc_id")
        a = ex.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"), "shingle")
        b = ex.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b", "na", "nb")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_near_dup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: shingle -> minhash -> LSH bucket-join ->
    exact-Jaccard verification of candidates."""
    sh = shingles(docs, id_col, text_col, k).localCheckpoint(eager=True)
    sigs = minhash_signatures(sh, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, num_hashes // bands)
    return jaccard_pairs(sh, candidates=cands, threshold=threshold)


# --- Incremental near-dup: new batch vs stored corpus signatures -------------


def sig_est_jaccard_pairs(
    cands: DataFrame,
    sigs_a: DataFrame,
    sigs_b: DataFrame | None = None,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """(a, b, est_jaccard): Jaccard estimated as the fraction of agreeing
    signature slots — the standard MinHash estimator (unbiased, variance
    J(1-J)/num_hashes). Needs only stored signatures, never the text, which
    is what makes the incremental path cheap: candidate count × one array
    compare, all JVM-side."""
    sigs_b = sigs_a if sigs_b is None else sigs_b
    sa = sigs_a.select(F.col("doc_id").alias(a_col), F.col("sig").alias("_sa"))
    sb = sigs_b.select(F.col("doc_id").alias(b_col), F.col("sig").alias("_sb"))
    agree = F.aggregate(
        F.zip_with("_sa", "_sb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cands.join(sa, a_col)
        .join(sb, b_col)
        .select(
            a_col,
            b_col,
            F.round(agree / F.size("_sa"), 6).alias("est_jaccard"),
        )
    )


def incremental_near_dup(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    corpus_buckets: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Daily-ingest dedup: the NEW batch against an existing corpus, without
    recomputing anything over the old corpus. Returns the new docs that
    survive (not near-dup of a corpus doc, and one survivor per within-batch
    cluster).

    Only the new batch is shingled and signed; its band buckets equi-join
    against the corpus's stored ``band_buckets`` (pass them precomputed —
    e.g. read from a bands-partitioned table — or they derive from
    ``corpus_sigs`` here). Matches against the corpus use the signature-
    agreement Jaccard estimator (sig_est_jaccard_pairs) since old text is
    not re-read; within-batch duplicates use the exact verified pipeline +
    cluster application (minhash_near_dup -> near_dup_dedup). At 100 TB the
    per-day cost is O(batch) + one bucket probe into the stored index —
    never O(corpus).
    """
    rows_per_band = num_hashes // bands
    sh_new = shingles(new_docs, id_col, text_col, k).localCheckpoint(eager=True)
    sigs_new = minhash_signatures(sh_new, num_hashes).localCheckpoint(eager=True)
    if corpus_buckets is None:
        corpus_buckets = band_buckets(corpus_sigs, bands, rows_per_band)

    nb = band_buckets(sigs_new, bands, rows_per_band)
    vs_old = (
        nb.select(F.col("doc_id").alias("a"), "band", "bucket")
        .join(
            corpus_buckets.select(F.col("doc_id").alias("b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .select("a", "b")
        .distinct()
    )
    dup_vs_old = (
        sig_est_jaccard_pairs(vs_old, sigs_new, corpus_sigs)
        .filter(F.col("est_jaccard") >= threshold)
        .select("a")
        .distinct()
    )

    batch_pairs = jaccard_pairs(
        sh_new,
        candidates=lsh_candidate_pairs(sigs_new, bands, rows_per_band),
        threshold=threshold,
    )
    survivors = near_dup_dedup(new_docs, batch_pairs, id_col)
    return survivors.join(
        dup_vs_old, survivors[id_col] == dup_vs_old["a"], "left_anti"
    )


# --- Near-dup APPLICATION: pairs -> clusters -> survivors --------------------


def near_dup_groups(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    num_salts: int = 32,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """(doc_id, group_id): every doc mapped to its near-dup cluster id.

    ``pairs`` is any verified pair table from the generators in this family
    (minhash_near_dup / simhash_near_dup / jaccard_pairs /
    similarity.embedding_near_dup — or a union of several). Clusters are the
    connected components of the pair graph (salted star contraction,
    ops/components.py); ``group_id`` is the cluster's minimum doc id — the
    deterministic survivor. Docs in no pair map to themselves.

    Reference anchor for the exact case: scripts/prepare_data.py:124-177
    (sha-groupBy keep-first); this operator is its near-dup generalization —
    transitive closure is required because near-dup similarity is not
    transitive but duplicate *clusters* are (A≈B≈C must collapse to one
    survivor even when A,C never pair).
    """
    from .components import components_from_pairs

    comp = components_from_pairs(
        pairs, a_col, b_col, num_salts=num_salts, hot_threshold=hot_threshold
    ).localCheckpoint(eager=True)
    # comp is node-sized (only ids that appear in a pair); when it fits an
    # executor, broadcast it so the full corpus is never shuffled for the
    # label lookup. Above the threshold the shuffled left join stands.
    if comp.count() <= 2_000_000:
        comp = F.broadcast(comp)
    return (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce("group_id", F.col(id_col)).alias("group_id"),
        )
    )


def near_dup_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    num_salts: int = 32,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """The corpus AFTER near-dup removal: one survivor (min id) per cluster,
    all other cluster members anti-joined out; full doc rows pass through
    untouched. The loser set is |duplicates| rows (≪ corpus when dup rate is
    sane), so the anti-join's build side stays small; the corpus side
    streams — no full-corpus shuffle beyond the id-hash anti-join."""
    from .components import components_from_pairs

    comp = components_from_pairs(
        pairs, a_col, b_col, num_salts=num_salts, hot_threshold=hot_threshold
    )
    losers = comp.filter(F.col("node") != F.col("group_id")).select(
        "node"
    ).localCheckpoint(eager=True)
    # The loser set is |duplicates| rows; when it fits an executor,
    # broadcast the anti-join so the surviving corpus streams through with
    # NO shuffle at all (above the threshold the id-hash anti-join stands).
    if losers.count() <= 2_000_000:
        losers = F.broadcast(losers)
    return docs.join(losers, docs[id_col] == losers["node"], "left_anti")


# --- SimHash -----------------------------------------------------------------


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64) -> DataFrame:
    """(doc_id, simhash bigint): sign-aggregated word hashes.

    For each bit position: sum(+1 / -1 over words by that bit of
    md5long(word)); bit set if the sum is positive. Distinct words weighted
    once (deterministic; frequency weighting is a config away).
    """
    words = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit(""))
            )
        ).alias("word"),
    ).withColumn("h", _md5_long(F.col("word")))
    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits - 4)  # top bits of a 60-bit hash are empty
        ]
    )
    acc = F.lit(0).cast("bigint")
    for i in range(bits - 4):
        acc = acc + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint") * (1 << i)).otherwise(0)
    return sums.select("doc_id", acc.alias("simhash"))


def simhash_near_dup(
    docs: DataFrame, max_hamming: int = 3, band_bits: int = 15,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a, b, hamming): pairs within ``max_hamming`` bits.

    Blocking: split the simhash into 4 bands of ``band_bits``; by pigeonhole
    any pair within max_hamming <= 3 agrees exactly on >= 1 band -> join on
    (band_index, band_value), verify hamming on candidates.
    """
    sh = simhash(docs, id_col, text_col).localCheckpoint(eager=True)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.val")
    lhs = banded.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "band", "val")
    rhs = banded.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "band", "val")
    cands = (
        lhs.join(rhs, ["band", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


# --- Content-defined chunking (rolling-hash boundaries) -----------------------


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = 3,
    modulus: int = 8,
) -> DataFrame:
    """(doc_id, chunk_no, start_pos, n_words, chunk_hash, n_docs):
    content-defined chunking at word granularity for shift-tolerant
    shared-content detection (the FastCDC/LBFS boundary idea — Muthitacharoen
    et al., SOSP 2001 — applied to token streams; ExactSubstr's fixed-k
    sibling for storage-style dedup).

    A chunk boundary falls AFTER word ``i`` (0-based) iff ``i >= gram-1``
    and ``md5int(w[i-gram+1] .. w[i]) % modulus == 0`` — the boundary
    depends only on the local ``gram``-word window, so an insertion early
    in a document shifts chunk FRAMES only until the next boundary
    (contrast with fixed-width chunking, where everything downstream
    re-frames). ``chunk_hash`` is md5 of the space-joined chunk words;
    ``n_docs`` counts distinct documents sharing that exact chunk content
    (>1 = shared content worth deduplicating at the storage layer).

    Plan shape: posexplode words → per-document window (lag×2 + running
    sum — partitions are single documents, bounded by doc length) → one
    hash aggregation per (doc, chunk) → one aggregation keyed on
    chunk_hash joined back (both map-side combine). At 100 TB the windows
    never cross documents, so the only global shuffles are the two
    chunk-keyed aggregations. The md5int uses the 12-hex-digit prefix
    (48 bits) — the established oracle-portable int64 conversion.
    """
    from pyspark.sql import Window

    words = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
        ).alias("pos", "word"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram_txt = F.concat_ws(
        " ", *[F.lag("word", gram - 1 - j).over(w) for j in range(gram)]
    )
    gram_int = F.conv(F.substring(F.md5(gram_txt), 1, 12), 16, 10).cast("bigint")
    boundary = F.when(
        (F.col("pos") >= gram - 1) & (gram_int % modulus == 0), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = words.withColumn("bd", boundary)
    chunk_no = F.coalesce(
        F.sum("bd").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("bigint")
    chunked = flagged.withColumn("chunk_no", chunk_no)
    chunks = chunked.groupBy("doc_id", "chunk_no").agg(
        F.min("pos").alias("start_pos"),
        F.count(F.lit(1)).alias("n_words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda x: x["word"],
                ),
                " ",
            )
        ).alias("chunk_hash"),
    )
    shared = chunks.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return chunks.join(shared, "chunk_hash").select(
        "doc_id", "chunk_no", "start_pos", "n_words", "chunk_hash", "n_docs"
    )


# --- Containment (asymmetric near-dup / quote detection) ----------------------


def containment_pairs(
    docs: DataFrame,
    k: int = 3,
    min_containment: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, shared, size_a, containment_ppm): shingle containment
    ``|S(A) ∩ S(B)| / |S(A)|`` for ordered pairs — the ASYMMETRIC near-dup
    signal (Broder 1997's containment, the quote/excerpt detector): a short
    document quoted inside a long one scores near 1.0 here while its
    Jaccard stays near zero, so jaccard_pairs cannot see it.

    ``containment_ppm`` is exact integer floor division
    ``shared * 1_000_000 div size_a`` — no float ratio to diverge on.
    Ordered pairs below ``min_containment`` are dropped.

    Plan shape: distinct-shingle explode → one self-join on the shingle
    (the blocking key) → one map-side-combinable count per ordered pair →
    one join onto per-doc shingle counts. 100 TB guard: a shingle shared
    by df documents emits df^2 ordered candidates; ``max_shingle_df=K``
    drops shingles above K from the join (stop-shingle removal — the
    standard containment-sketch mitigation), bounding per-key fanout.
    """
    sh = shingles(docs, k=k).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    joinable = sh
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(hot, "shingle", "left_anti")
    share_micro = int(round(min_containment * 1_000_000))
    pairs = (
        joinable.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(
            joinable.select(F.col("doc_id").alias("doc_b"), "shingle"),
            "shingle",
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a")),
            "doc_a",
        )
        .withColumn(
            "containment_ppm",
            F.expr("CAST((shared * 1000000) DIV size_a AS BIGINT)"),
        )
        .filter(F.col("containment_ppm") >= share_micro)
        .select("doc_a", "doc_b", "shared", "size_a", "containment_ppm")
    )


def dedup_eval(
    pred: DataFrame,
    gold: DataFrame,
    a_col: str = "entity_a",
    b_col: str = "entity_b",
) -> DataFrame:
    """(tp, fp, fn, precision_ppm, recall_ppm): pair-level confusion
    counts of a predicted duplicate/match pair set against a gold pair
    set — the QA gate every dedup/ER stage needs before its output is
    trusted to DELETE data. Pairs are canonicalized (least, greatest) on
    both inputs so orientation never miscounts.

    One full-outer equi-join on the pair key, then a single global agg
    (one row out); ratios are frozen to ppm ints ((tp * 1e6) DIV total),
    NULL when the denominator is empty. Linear in |pred| + |gold|.
    """
    def canon(df, tag):
        return df.select(
            F.least(a_col, b_col).alias("_a"),
            F.greatest(a_col, b_col).alias("_b"),
        ).distinct().withColumn(tag, F.lit(1))

    p = canon(pred, "_p")
    g = canon(gold, "_g")
    return (
        p.join(g, ["_a", "_b"], "full_outer")
        .agg(
            F.sum(((F.col("_p") == 1) & (F.col("_g") == 1)).cast("long")).alias("tp"),
            F.sum((F.col("_g").isNull()).cast("long")).alias("fp"),
            F.sum((F.col("_p").isNull()).cast("long")).alias("fn"),
        )
        .select(
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("fp", F.lit(0)).cast("long").alias("fp"),
            F.coalesce("fn", F.lit(0)).cast("long").alias("fn"),
        )
        .select(
            "tp", "fp", "fn",
            F.expr(
                "CASE WHEN tp + fp > 0 THEN (tp * 1000000) DIV (tp + fp) END"
            ).alias("precision_ppm"),
            F.expr(
                "CASE WHEN tp + fn > 0 THEN (tp * 1000000) DIV (tp + fn) END"
            ).alias("recall_ppm"),
        )
    )


def host_dup_rate(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, n_docs, n_unique, dup_ppm): per-source exact-duplicate
    rate — the first triage readout when a crawl looks bloated: which
    SOURCE is feeding copies (a mirror, a session-id URL space, a
    republisher), scoped before any expensive near-dup pass runs.

    Same normalized-content sha256 as exact_dedup (whitespace-collapsed
    trim), one (source, hash) distinct + one source agg; dup_ppm =
    ((n_docs - n_unique) * 1e6) DIV n_docs.
    """
    h = F.sha2(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), 256
    )
    per = (
        docs.select(F.col(group_col).alias("source"), h.alias("_h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("_h").cast("long").alias("n_unique"),
        )
    )
    return per.select(
        "source", "n_docs", "n_unique",
        F.expr("((n_docs - n_unique) * 1000000) DIV n_docs").alias("dup_ppm"),
    )
