"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The standard recipe for steering a raw web corpus toward a trusted target
distribution (Wikipedia/books in the paper): model both corpora as bags of
HASHED n-grams (unigrams + bigrams hashed into ``n_buckets``), score every
raw document with the log importance ratio

    log w(doc) = sum_g  [ ln p_target(bucket(g)) - ln p_raw(bucket(g)) ]

(sum over the document's gram INSTANCES, add-``alpha`` smoothed bucket
multinomials), then sample-without-replacement by Gumbel top-k on
``log w + Gumbel noise``.

The reference repo has no data-selection layer at all; this supplies the
published importance-resampling shape as a first-class operator per the
brief's training-data-pipeline mandate.

Scale shape (the whole point — DSIR exists to run on Common Crawl):

  * the bucket log-ratio table has exactly ``n_buckets`` rows — a
    broadcast dimension no matter how big either corpus is
  * both count passes and the per-doc score are map-side-combined hash
    aggregations over one linear gram explode; nothing quadratic, no
    windows, no driver collects
  * the ratio is frozen in integer MICRO-UNITS (round(lr*1e6) as int64)
    before the per-doc sum, so the sum is exact int64 arithmetic —
    order-independent across partitionings AND bit-identical to the
    DuckDB oracle (double-sum ordering can never flip a rounded output)
  * Gumbel keys are hash-derived (md5 48-bit -> uniform -> Gumbel), so
    resampling is deterministic, rerun-stable, and oracle-replayable —
    swap in ``rand()`` only if true randomness is required

Reference counterpart: none (nearest is scripts/prepare_data.py's exact
dedup); DSIR per arXiv:2302.03169.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import _word_array

_MICRO = 1_000_000


def _hash48(col):
    """The repo's DuckDB-portable 48-bit int64 hash (md5 hex prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _doc_grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id_col, _g): one row per gram INSTANCE — unigrams + space-joined
    bigrams of the whitespace token stream. Linear explode, JVM-side."""
    a = _word_array(F.col(text_col))
    toks = docs.select(F.col(id_col), a.alias("_a"))
    bigrams = F.when(
        F.size("_a") >= 2,
        F.zip_with(
            F.slice("_a", 1, F.size("_a") - 1),
            F.slice("_a", 2, F.size("_a") - 1),
            lambda x, y: F.concat_ws(" ", x, y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(
        id_col, F.explode(F.concat("_a", bigrams)).alias("_g")
    )


def _bucket_log_ratio(
    spark,
    target_grams: DataFrame,
    raw_grams: DataFrame,
    n_buckets: int,
    alpha: float,
) -> DataFrame:
    """(_b, _lr_micro): per-bucket add-alpha log importance ratio, frozen
    to integer micro-units. Exactly ``n_buckets`` rows (absent buckets get
    the pure-smoothing ratio) — broadcastable at any corpus size."""
    tb = target_grams.select(
        F.pmod(_hash48(F.col("_g")), F.lit(n_buckets)).alias("_b")
    )
    rb = raw_grams.select(
        F.pmod(_hash48(F.col("_g")), F.lit(n_buckets)).alias("_b")
    )
    tc = tb.groupBy("_b").agg(F.count(F.lit(1)).alias("_tc"))
    rc = rb.groupBy("_b").agg(F.count(F.lit(1)).alias("_rc"))
    tt = tb.agg(F.count(F.lit(1)).alias("_T"))
    rt = rb.agg(F.count(F.lit(1)).alias("_R"))
    all_b = spark.range(n_buckets).select(F.col("id").alias("_b"))
    lr = (
        F.log(
            (F.coalesce("_tc", F.lit(0)) + F.lit(alpha))
            / (F.col("_T") + F.lit(alpha * n_buckets))
        )
        - F.log(
            (F.coalesce("_rc", F.lit(0)) + F.lit(alpha))
            / (F.col("_R") + F.lit(alpha * n_buckets))
        )
    )
    return (
        all_b.join(tc, "_b", "left")
        .join(rc, "_b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "_b",
            F.round(lr * F.lit(_MICRO), 0).cast("long").alias("_lr_micro"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """(id_col, n_grams, log_weight): DSIR log importance weight of every
    ``docs`` row against the ``target`` corpus distribution.

    ``log_weight`` = (int64 sum of per-gram micro-ratios) / 1e6 — exact
    and partitioning-independent by construction; empty documents keep a
    row with n_grams = 0 and log_weight = 0.
    """
    raw_grams = _doc_grams(docs, id_col, text_col)
    target_grams = _doc_grams(target, id_col, text_col)
    ratio = _bucket_log_ratio(
        docs.sparkSession, target_grams, raw_grams, n_buckets, alpha
    )
    scored = (
        raw_grams.select(
            id_col, F.pmod(_hash48(F.col("_g")), F.lit(n_buckets)).alias("_b")
        )
        .join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("_lr_micro").alias("_w_micro"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            (
                F.coalesce("_w_micro", F.lit(0)).cast("double")
                / F.lit(float(_MICRO))
            ).alias("log_weight"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "dsir",
) -> DataFrame:
    """(id_col, n_grams, log_weight, gumbel_key): the ``k`` documents
    selected by deterministic Gumbel top-k over ``log_weight`` — i.e. a
    without-replacement sample from the softmax of the importance weights
    (Gumbel-max trick), rerun-stable because the noise is hash-derived:

        u = (hash48(salt || id) + 1) / (2^48 + 1)   in (0, 1)
        gumbel_key = log_weight - ln(-ln(u))

    Ties (impossible in practice, doubles) break by id. The sort is a
    global top-k (TakeOrderedAndProject), not a full sort.
    """
    w = dsir_weights(docs, target, id_col, text_col, n_buckets, alpha)
    u = (_hash48(F.concat(F.lit(salt), F.col(id_col).cast("string"))) + 1) / F.lit(
        float(2**48) + 1.0
    )
    return (
        w.withColumn(
            "gumbel_key", F.col("log_weight") - F.log(-F.log(u))
        )
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )
