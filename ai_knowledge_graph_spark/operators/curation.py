"""End-to-end corpus curation: the composed training-data filter pipeline.

This is the operator a pretraining-data user actually runs — the
composition of the engine's hygiene primitives into one declarative plan:

  1. language gate        (metadata lang column)
  2. quality gate         (textstats.quality_scores)
  3. repetition gate      (webcrawl.repetition_stats, Gopher-style)
  4. exact dedup          (normalized-sha survivor = min doc_id)
  5. near-dup dedup       (MinHash-LSH pairs -> salted components ->
                           min-id survivor, dedup.near_dup_dedup)
  6. split assignment     (sampling.hash_split, leakage-safe)

Everything stays one lazy DataFrame composition — Catalyst pushes the
cheap row-local gates (1-3) into the scan side so the expensive pairwise
stage (5) only sees the surviving subset, exactly the funnel a 100 TB
curation run needs (each stage's input is the previous stage's survivors,
never the raw corpus). No stage collects; stage 4/5 are the only shuffles
(hash aggs + the LSH band join).

The reference's corpus layer stops at whole-file reads + exact dedup
(scripts/prepare_data.py:124-177); this composes the engine's superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_near_dup, near_dup_dedup
from .sampling import hash_split
from .textstats import quality_scores
from .webcrawl import repetition_stats


def curate_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    max_dup_gram_frac: float = 0.06,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """The curated corpus: (doc_id, lang, quality, dup_gram_frac, split).

    Gate order is cheapest-first so each stage's candidate set shrinks
    before the next pays for it; the near-dup stage (the only super-linear
    one) runs last, over survivors only.
    """
    kept = docs.filter(F.col("lang").isin(*langs))

    q = quality_scores(kept).filter(F.col("quality") >= min_quality)

    rep = repetition_stats(q.select("doc_id", "text"))
    q = q.join(
        rep.filter(F.col("dup_gram_frac") <= max_dup_gram_frac).select(
            "doc_id", "dup_gram_frac"
        ),
        "doc_id",
    )

    # exact dedup: min doc_id survives per normalized content hash
    sha = F.sha2(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), 256)
    hashed = q.withColumn("_sha", sha)
    keepers = hashed.groupBy("_sha").agg(F.min("doc_id").alias("doc_id"))
    exact = hashed.join(keepers, ["_sha", "doc_id"], "left_semi").drop("_sha")
    exact = exact.localCheckpoint(eager=True)  # feeds two branches below

    # near-dup dedup among exact-dedup survivors only
    pairs = minhash_near_dup(
        exact.select("doc_id", "text"),
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=jaccard_threshold,
    )
    survivors = near_dup_dedup(exact, pairs)

    return hash_split(survivors, "doc_id", weights=split_weights).select(
        "doc_id", "lang", "quality", "dup_gram_frac", "split"
    )
