"""Corpus n-gram language-model scoring — the CCNet-style perplexity gate.

CCNet (and the GPT-3 / LLaMA data pipelines that follow it) scores every
web document with a small language model trained on a trusted corpus and
keeps/flags documents by perplexity tertile (head / middle / tail).  The
reference repo has no LM gate (its quality pass is the rule filters in
audit_quality.py:7-46); this operator supplies the canonical web-curation
shape as a first-class training-data-pipeline op per the brief.

This implementation trains the LM on the corpus itself (self-perplexity —
the standard "how typical is this document of the collection" signal used
for boilerplate/outlier detection) with an add-one-smoothed bigram model:

    P(w | v) = (c(v,w) + 1) / (c(v) + V)

where c(v,w)/c(v) are corpus bigram/context counts over whitespace tokens
with a BOS marker, and V is the corpus vocabulary size.  Every count is an
exact int64; the only floating-point steps are the final ln() / divide, so
the DuckDB oracle reproduces the score bit-comparably after round(.,6).

Plan shape at 100 TB:

  * one linear bigram explode (JVM ``arrays_zip``/``slice``, no Python)
  * two map-side-combined count aggregations (bigram table is bounded by
    the corpus bigram vocabulary, not the token stream)
  * per-doc bigram multiset (``groupBy doc,prev,nxt``) so the re-score
    join carries distinct bigrams per doc, not every token instance
  * shuffle equi-joins against the count tables (vocabulary-sized — often
    broadcastable, but kept as hash joins so the plan survives a web-scale
    vocabulary), then one map-side-combined per-doc sum
  * tertile bucketing via ``distributed_rank`` (range partition + local
    row_number + broadcast offsets) — no single-task window at any size
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .standardize import distributed_rank
from .textstats import _words

BOS = "<s>"


def lm_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """Per-document add-one bigram negative log-likelihood + CCNet-style
    perplexity bucket.

    Returns (id_col, n_bigrams, nll_per_token, ppl_bucket) where
    ``nll_per_token`` is round(-sum ln P(w|v) / n_bigrams, 6) and
    ``ppl_bucket`` in [0, n_buckets) is the exact rank tertile over
    (nll_per_token, id_col) — 0 = head (most typical), n-1 = tail.
    Zero-token documents are dropped (they have no bigrams to score).
    """
    toks = docs.select(
        F.col(id_col), _words(F.col(text_col)).alias("_a")
    ).where(F.size("_a") > 0)

    # bigrams with BOS: prev_i = (<s>, w1 .. w_{n-1}), nxt_i = (w1 .. w_n)
    bg = toks.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.concat(
                    F.array(F.lit(BOS)),
                    F.slice("_a", 1, F.size("_a") - 1),
                ).alias("prev"),
                F.col("_a").alias("nxt"),
            )
        ).alias("_b"),
    ).select(id_col, F.col("_b.prev").alias("prev"), F.col("_b.nxt").alias("nxt"))

    # corpus LM counts (exact int64, map-side combined)
    c2 = bg.groupBy("prev", "nxt").agg(F.count(F.lit(1)).alias("c"))
    c1 = bg.groupBy("prev").agg(F.count(F.lit(1)).alias("cp"))
    vdf = toks.select(F.explode("_a").alias("_t")).agg(
        F.countDistinct("_t").alias("_V")
    )

    # per-doc bigram multiset: the re-score join carries one row per
    # distinct (doc, v, w), weighted by multiplicity m
    dbg = bg.groupBy(id_col, "prev", "nxt").agg(F.count(F.lit(1)).alias("m"))

    scored = (
        dbg.join(c2, ["prev", "nxt"])
        .join(c1, "prev")
        .crossJoin(F.broadcast(vdf))
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.sum(
                F.col("m")
                * F.log(
                    (F.col("c") + F.lit(1)).cast("double")
                    / (F.col("cp") + F.col("_V"))
                )
            ).alias("_ll"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(-F.col("_ll") / F.col("n_bigrams"), 6).alias(
                "nll_per_token"
            ),
        )
    )

    # exact rank tertiles; ranked on the ROUNDED score so the bucket can
    # only move when the (hash-compared) score column itself moves
    ranked = distributed_rank(scored, ["nll_per_token", id_col], out="_rk")
    ncnt = scored.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(ncnt))
        .withColumn(
            "ppl_bucket",
            F.expr(f"CAST(({n_buckets} * (_rk - 1)) DIV _n AS BIGINT)"),
        )
        .select(id_col, "n_bigrams", "nll_per_token", "ppl_bucket")
    )
