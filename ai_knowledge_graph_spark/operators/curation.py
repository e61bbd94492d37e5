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


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 1,
) -> DataFrame:
    """Corpus-level duplicated-line removal (CCNet / RefinedWeb boilerplate
    pass): any line whose total occurrence count across the corpus exceeds
    ``max_occurrences`` is dropped from EVERY document; surviving lines are
    rejoined in original order.

    Returns (id_col, text [cleaned], n_lines, n_dropped) — one row per input
    document, including documents whose every line was dropped (text "").

    The navigation headers, cookie banners and copyright footers of a web
    corpus repeat across millions of pages; in-document signals
    (repetition_stats) cannot see them. This is the cross-document
    complement, and at 100 TB it is three linear passes:

      1. posexplode the line arrays (JVM split, no Python)
      2. hash-agg line -> total count; the over-threshold "hot" set IS the
         boilerplate, which is tiny relative to the corpus but too big to
         assume broadcastable at 10^12 docs — so survivors come from a
         left_anti shuffle join on the line key (AQE turns it into a
         broadcast join automatically when the hot side measures small)
      3. re-group by document, array_sort by position, concat_ws —
         per-document state is bounded by document length, so the
         collect_list carries no skew beyond the longest page

    The reference has no corpus layer at all (main.py:283-284 reads whole
    local files); this operator exists for the Common-Crawl shape the north
    rule targets.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_ln"),
    )
    hot = (
        lines.groupBy("_ln")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > max_occurrences)
        .select("_ln")
    )
    kept = lines.join(hot, "_ln", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_ln"))),
                lambda s: s["_ln"],
            ),
        ).alias("_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("_text", F.lit("")).alias(text_col),
            "n_lines",
            (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_dropped"
            ),
        )
    )
