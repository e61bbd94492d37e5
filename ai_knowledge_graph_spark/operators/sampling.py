"""Deterministic sampling / splitting operators for corpus construction.

A training-data pipeline needs reproducible, data-derived sampling: the
same document must land in the same split on every run, on any cluster, at
any partitioning — so all decisions hash the document key, never use RNG
state or task ids. The md5-bucket scheme (first 8 hex chars -> int64 ->
mod 10_000) is portable between Spark and the DuckDB oracle literal-for-
literal, so every sampling decision is value-hash gated by the driver.

The reference has no sampling layer (it processes whole input files);
these are the corpus-mixing ops the 100 TB brief adds. All are stateless
per-row filters/projections — no shuffle at all; they pipeline into
whatever scan or join precedes them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 10000) from md5(key ':' salt).

    First 8 hex chars -> 32-bit int -> mod 10^4: portable to any SQL engine
    (DuckDB twin: ('0x' || substr(md5(k || ':' || s), 1, 8))::BIGINT % 10000).
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS).alias(
        "bucket"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "stratified",
) -> DataFrame:
    """Keep each row with its stratum's rate, decided by key hash.

    Per-stratum rates rebalance a corpus (e.g. downsample the head
    language); rows in strata not listed get ``default_rate``. Pure row
    filter — no shuffle, no RNG, stable across runs/partitionings, and the
    kept set is monotone in the rate (raising en 0.5 -> 0.6 only ADDS docs,
    a property hash sampling gives for free and reservoir sampling lacks).
    """
    threshold = F.lit(int(default_rate * BUCKETS))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * BUCKETS))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Append ``split``: deterministic train/val/test assignment by key hash.

    Split boundaries are cumulative weight buckets; a document's split never
    changes when the corpus grows (no global count involved), which is the
    leakage-safety property a training pipeline needs. No shuffle.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, wt in items[:-1]:
        acc += wt
        cond = bucket < int(acc * BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def mix_corpus(
    df: DataFrame,
    quotas: dict[str, int],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
    allow_upsample: bool = True,
) -> DataFrame:
    """Data mixing with EXACT per-source document quotas and epoch
    upsampling: the step that turns per-source target proportions (a LLaMA/
    Pile-style mixture spec, pre-multiplied into integer doc quotas) into
    the actual training corpus.

    Returns (key_col, source_col, epoch): source ``s`` contributes exactly
    ``quotas[s]`` rows — every doc repeated ``quotas[s] // n_s`` times
    ("epochs over the source") plus one extra epoch for the
    ``quotas[s] % n_s`` docs ranked first by key hash. Sources absent from
    ``quotas`` are dropped. With ``allow_upsample=False`` quotas clamp to
    the source size (downsampling only). Deterministic: hash ranks, no RNG,
    rerun- and partitioning-stable.

    Selection never sorts the corpus. A doc's rank order inside its source
    is (bucket, hash, key) over the 10k-bucket scheme, realized as:

      1. per-(source, bucket) histogram — one hash agg, output is tiny
         (|sources| x 10^4 rows), cumulated with a window OVER THE
         HISTOGRAM, not the data
      2. docs in buckets wholly under the remainder get the extra epoch via
         a join against that histogram (AQE broadcasts it)
      3. only the single boundary bucket per source — ~1/10^4 of the
         source — is ranked with a row_number window

    so the exact-top-k selection costs one linear agg + one join + a window
    over 0.01% of the data, at any corpus size. (The approximate
    alternative is stratified_sample; this operator is for when the mixture
    spec must be hit exactly.)

    The reference has no mixing layer (single-corpus, whole-file reads);
    this is a first-class training-data-pipeline operator per the brief.
    """
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(s, int(k)) for s, k in sorted(quotas.items())],
        f"{source_col} string, _q long",
    )
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    d = df.select(
        F.col(key_col),
        F.col(source_col),
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS).alias("_b"),
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long").alias("_fh"),
    )
    hist = d.groupBy(source_col, "_b").agg(F.count(F.lit(1)).alias("_bc"))
    per_src = hist.groupBy(source_col).agg(F.sum("_bc").alias("_n"))
    q = per_src.join(F.broadcast(qdf), source_col)
    if not allow_upsample:
        q = q.withColumn("_q", F.least("_q", "_n"))
    q = q.withColumn("_eps", (F.col("_q") / F.col("_n")).cast("long")).withColumn(
        "_rem", F.col("_q") - F.col("_eps") * F.col("_n")
    )
    cum = Window.partitionBy(source_col).orderBy("_b")
    hinfo = (
        hist.join(F.broadcast(q.select(source_col, "_eps", "_rem")), source_col)
        .withColumn("_cum", F.sum("_bc").over(cum))
        .withColumn("_prev", F.col("_cum") - F.col("_bc"))
    )
    joined = d.join(hinfo, [source_col, "_b"])
    is_boundary = (F.col("_prev") < F.col("_rem")) & (F.col("_cum") > F.col("_rem"))
    plain = joined.filter(~is_boundary).withColumn(
        "_extra", (F.col("_cum") <= F.col("_rem")).cast("long")
    )
    bw = Window.partitionBy(source_col, "_b").orderBy("_fh", key_col)
    boundary = (
        joined.filter(is_boundary)
        .withColumn("_rn", F.row_number().over(bw))
        .withColumn(
            "_extra",
            (F.col("_rn") <= F.col("_rem") - F.col("_prev")).cast("long"),
        )
        .drop("_rn")
    )
    sel = plain.unionByName(boundary).withColumn(
        "_e", F.col("_eps") + F.col("_extra")
    )
    return (
        sel.filter(F.col("_e") >= 1)
        .select(
            F.col(key_col),
            F.col(source_col),
            F.explode(F.sequence(F.lit(1), F.col("_e").cast("int"))).alias(
                "epoch"
            ),
        )
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "pack",
) -> DataFrame:
    """GPT-style sequence packing: deterministically shuffle the corpus by
    key hash, concatenate every document's token stream, slice the stream
    into fixed ``ctx_len`` blocks ("packs"), and report each (document,
    pack) segment — the physical batch layout an LLM pretraining run feeds
    the model after :func:`mix_corpus` decides WHAT to train on.

    Returns one row per segment:
      (key_col, pack_id, doc_offset, pack_offset, seg_len) — all offsets in
      tokens; a doc longer than ``ctx_len`` spans several packs, a short doc
      shares its pack with neighbors. Every pack is exactly ``ctx_len``
      tokens except the final partial one; document order (and therefore the
      whole layout) is a pure function of the keys — rerun- and
      partitioning-stable, no RNG.

    Token counts default to whitespace tokens (textstats ws_tokens
    semantics); pass ``tokens_col`` to pack by a precomputed count (e.g.
    real BPE lengths).

    Scale: the global concatenation offset is a cumulative sum realized as
    range-repartition on the hash order + per-partition running sum + a
    driver-side, partition-count-sized offset table broadcast back — the
    same shape as standardize.distributed_rank, so there is NO single-task
    global window at any corpus size. One range shuffle of (key, n) pairs
    total; the explode emits ceil(n/ctx_len)+1 rows per doc. The reference
    has no packing layer; this is a training-data-pipeline operator per the
    brief.
    """
    n_tok = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
        ).cast("long")
    )
    toks = (
        df.select(
            F.col(key_col),
            n_tok.alias("_n"),
            F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))).alias(
                "_ord"
            ),
        )
        .filter(F.col("_n") > 0)
    )

    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        toks.repartitionByRange(nparts, "_ord", key_col)
        .withColumn("_pid", F.spark_partition_id())
        # pin partition ids: they feed the running sum AND the offset table
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_pid").orderBy("_ord", key_col)
    local = ranged.withColumn("_cum_in", F.sum("_n").over(w))
    # per-partition token totals: metadata-sized (<= shuffle partitions)
    totals = {
        r["_pid"]: r["_t"]
        for r in ranged.groupBy("_pid").agg(F.sum("_n").alias("_t")).collect()
    }
    running = 0
    offs = []
    for pid in sorted(totals):
        offs.append((pid, running))
        running += totals[pid]
    odf = spark.createDataFrame(offs or [(0, 0)], "_pid int, _off long")

    ctx = F.lit(int(ctx_len)).cast("long")
    seg = (
        local.join(F.broadcast(odf), "_pid")
        .withColumn("_start", F.col("_cum_in") + F.col("_off") - F.col("_n"))
        .withColumn("_first", F.floor(F.col("_start") / ctx))
        .withColumn("_last", F.floor((F.col("_start") + F.col("_n") - 1) / ctx))
        .select(
            key_col,
            "_n",
            "_start",
            F.explode(F.sequence("_first", "_last")).alias("pack_id"),
        )
    )
    pstart = F.col("pack_id") * ctx
    pend = pstart + ctx
    dend = F.col("_start") + F.col("_n")
    return seg.select(
        F.col(key_col),
        F.col("pack_id").cast("long").alias("pack_id"),
        F.greatest(pstart - F.col("_start"), F.lit(0).cast("long")).alias(
            "doc_offset"
        ),
        F.greatest(F.col("_start") - pstart, F.lit(0).cast("long")).alias(
            "pack_offset"
        ),
        (F.least(pend, dend) - F.greatest(pstart, F.col("_start"))).alias("seg_len"),
    )


def rendezvous_shards(
    df: DataFrame,
    key_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """(shard, n_rows): rendezvous (highest-random-weight, Thaler &
    Ravishankar 1996) shard assignment histogram — the data-layout
    primitive for writing a corpus to N stable output shards: adding or
    removing a shard moves only ~1/N of the keys (consistent hashing
    without a ring), and the assignment is a pure function of
    (key, shard), so re-runs and late-arriving rows land identically.

    Entirely row-local: each key scores all n_shards with the portable
    48-bit md5 hash and keeps the (h, shard)-lexicographic max via
    array_max — no shuffle until the n_shards-row histogram agg.
    """
    sep = F.lit("\x1f")

    def score(s):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col(key_col).cast("string"), sep, s.cast("string"))),
                1, 12,
            ),
            16, 10,
        ).cast("long")
        return F.struct(h.alias("h"), s.cast("int").alias("shard"))

    shard = F.array_max(
        F.transform(F.sequence(F.lit(0), F.lit(n_shards - 1)), score)
    ).getField("shard")
    return (
        df.select(shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


def uncertainty_sample(
    scored: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    score_col: str = "raw_score",
) -> DataFrame:
    """(doc_id, raw_score, uncertainty, rank): uncertainty sampling for
    active learning (Lewis & Gale 1994) — the k documents whose
    classifier margin is closest to the decision boundary (|raw| with a
    zero-bias linear gate), i.e. the rows a human labeler improves the
    model most by judging. Entirely int64 (the classifier's raw_score is
    exact), bounded top-k via TakeOrderedAndProject + a rank over the
    k-row result; ties break on id.
    """
    out = (
        scored.select(
            F.col(id_col).alias("doc_id"),
            F.col(score_col).cast("long").alias("raw_score"),
            F.abs(F.col(score_col)).cast("long").alias("uncertainty"),
        )
        .orderBy(F.asc("uncertainty"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.asc("uncertainty"), F.asc("doc_id"))
    return out.withColumn("rank", F.row_number().over(w).cast("long"))
