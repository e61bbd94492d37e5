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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import spread

# md5-hex-prefix -> bigint: stable across Spark and DuckDB.
def _md5_long(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


_MERSENNE = (1 << 61) - 1


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

    h_i(x) = (a_i * md5long48(x) + b_i) mod M61 with (a_i, b_i) derived
    deterministically from ``seed`` — portable to SQL.
    """
    # 48-bit base hash so the affine step stays in int64: a ≤ ~2·num_hashes
    # (< 2^7), a·x < 2^55, no overflow — the earlier decimal(38,0) version
    # spent the stage in BigDecimal multiplies (measured ~30% of the LSH
    # pipeline); 48 bits is far beyond what minhash collision resistance
    # needs (it only has to order shingles distinctly within a doc).
    base = sh.withColumn(
        "h0", F.conv(F.substring(F.md5("shingle"), 1, 12), 16, 10).cast("bigint")
    )
    mins = [
        F.min(
            (
                F.lit(2 * (seed + i) + 1) * F.col("h0") + F.lit(seed * 31 + i)
            )
            % F.lit(_MERSENNE)
        ).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    agged = base.groupBy("doc_id").agg(*mins)
    return agged.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(a, b) candidate pairs: docs sharing at least one LSH band bucket.

    Banding: split the signature into ``bands`` groups of ``rows_per_band``
    values; bucket key = hash of the band slice; join within buckets only.
    """
    # Bucket key = the band slice itself, rendered as a string: equality of
    # keys <=> equality of slices, so candidate generation is exact AND the
    # DuckDB oracle reproduces it verbatim (xxhash64 would be JVM-only; at
    # petabyte scale swap in a hash of this string to shrink shuffle keys).
    banded = signatures.select(
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
