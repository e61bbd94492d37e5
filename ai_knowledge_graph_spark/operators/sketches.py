"""Distributed probabilistic sketches with EXACT replayability.

Bloom filter, Count-Min, and HyperLogLog builds as pure DataFrame
aggregations — the summaries a 100 TB pipeline keeps instead of raw keys
(URL membership, heavy-hitter counts, distinct cardinality). Unlike
``df.stat.bloomFilter`` / ``approx_count_distinct`` (opaque JVM sketches),
these materialize the sketch AS A TABLE (words / counters / registers), so
they are persistable, mergeable with a further ``groupBy`` (all three are
commutative monoids: bit_or / sum / max), shippable to other systems, and
bit-identical to the DuckDB oracle:

  * hashing is the repo's 48-bit md5-prefix int64 family
  * Bloom uses 63 bits per word (bit 63 never set — no signed-overflow
    divergence between engines)
  * HLL's harmonic sum is computed in DECIMAL as sum(2^(62-M_j)) — an
    exact integer — so the one double division at the end is the ONLY
    floating-point step (register-sum order can never change the result)

Reference has no sketch layer; at 100 TB these are the standard tools the
brief's dedup/curation families hand off to (e.g. bloom-gating a daily
batch against the historical URL set without touching the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WORD_BITS = 63
_H48 = 1 << 48


def _h48(col, salt):
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")


def bloom_build(
    df: DataFrame, col: str, n_bits: int = 65536, k: int = 4
) -> DataFrame:
    """(word, bits): Bloom filter over ``df[col]`` as a table of 63-bit
    words. One linear pass: k hash positions per value (computed inside
    the projection), one map-side-combined ``bit_or`` per word. Merge two
    filters with ``union -> groupBy(word).agg(bit_or(bits))``."""
    pos = df.select(
        F.explode(
            F.array(
                *[(_h48(F.col(col), f"bloom{i}") % n_bits) for i in range(k)]
            )
        ).alias("_p")
    )
    return (
        pos.select(
            (F.col("_p") / _WORD_BITS).cast("long").alias("word"),
            (F.col("_p") % _WORD_BITS).alias("_b"),
        )
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(_b as int))")
            ).alias("bits")
        )
    )


def bloom_contains(
    items: DataFrame, bloom: DataFrame, col: str, n_bits: int = 65536, k: int = 4
) -> DataFrame:
    """items + ``maybe_present``: true iff ALL k bits are set (standard
    no-false-negative semantics). The probe is one equi-join of the items'
    k (word) keys against the word table — never a scan of the keyed data
    the filter summarizes."""
    probes = items.select(
        F.col(col).alias("_v"),
        F.explode(
            F.array(
                *[(_h48(F.col(col), f"bloom{i}") % n_bits) for i in range(k)]
            )
        ).alias("_p"),
    ).select(
        "_v",
        (F.col("_p") / _WORD_BITS).cast("long").alias("word"),
        (F.col("_p") % _WORD_BITS).alias("_b"),
    )
    hit = F.when(
        F.col("bits").isNotNull()
        & (F.expr("shiftright(bits, cast(_b as int)) % 2") == 1),
        1,
    ).otherwise(0)
    agg = (
        probes.join(bloom, "word", "left")
        .select("_v", hit.alias("_hit"))
        .groupBy("_v")
        .agg((F.min("_hit") == 1).alias("maybe_present"))
    )
    return items.join(
        agg.withColumnRenamed("_v", col), col, "left"
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(row, cms_col, cnt): Count-Min sketch — depth x width exact int64
    counters. One explode to depth rows per value + one map-side-combined
    sum; merge sketches by summing counters."""
    rows = df.select(
        F.posexplode(
            F.array(
                *[(_h48(F.col(col), f"cms{d}") % width) for d in range(depth)]
            )
        ).alias("row", "cms_col")
    )
    return rows.groupBy("row", "cms_col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_lookup(
    items: DataFrame, cms: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """items + ``cms_count``: min over the depth counters — the classic
    overestimate-only point query (>= true count, never under)."""
    probes = items.select(
        F.col(col).alias("_v"),
        F.posexplode(
            F.array(
                *[(_h48(F.col(col), f"cms{d}") % width) for d in range(depth)]
            )
        ).alias("row", "cms_col"),
    )
    agg = (
        probes.join(cms, ["row", "cms_col"], "left")
        .select("_v", F.coalesce("cnt", F.lit(0)).alias("_c"))
        .groupBy("_v")
        .agg(F.min("_c").alias("cms_count"))
    )
    return items.join(agg.withColumnRenamed("_v", col), col, "left")


def hll_build(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """(bucket, register): HyperLogLog registers, m = 2^p buckets from the
    top p bits of the 48-bit hash, register = max(rho) with rho = leading
    zeros of the low 48-p bits + 1 (computed EXACTLY via the binary-string
    length — no float log anywhere). Only touched buckets get a row;
    :func:`hll_estimate` fills the rest with 0. Merge with max(register).
    """
    rest_bits = 48 - p
    h = _h48(F.col(col), "hll")
    rest = h % F.lit(1 << rest_bits)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    return (
        df.select(
            F.shiftright(h, rest_bits).alias("bucket"),
            rho.cast("int").alias("_rho"),
        )
        .groupBy("bucket")
        .agg(F.max("_rho").alias("register"))
    )


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """One row (estimate, n_zero_registers): the HLL cardinality estimate
    with the standard small-range linear-counting correction.

    The harmonic denominator sum(2^-M_j) is computed as the EXACT integer
    sum(2^(62-M_j)) in decimal(38,0) (M_j <= 39+1 at p>=8, so terms fit
    int64 and the sum fits decimal38 for m <= 2^14) — summation order
    cannot perturb the result; the single double division + the alpha_m
    constant are the only floating-point ops, so round(6) hash-compares.
    """
    spark = registers.sparkSession
    m = 1 << p
    all_b = spark.range(m).select(F.col("id").alias("bucket"))
    full = all_b.join(registers, "bucket", "left").select(
        F.coalesce("register", F.lit(0)).alias("r")
    )
    term = F.expr("shiftleft(cast(1 as bigint), cast(62 - r as int))")
    agg = full.agg(
        F.sum(term.cast("decimal(38,0)")).alias("_s"),
        F.sum(F.when(F.col("r") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(2**62))
        / F.col("_s").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero").cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.round(est, 6).alias("estimate"),
        F.col("n_zero").alias("n_zero_registers"),
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    ps: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """(p, bucket, upper_bound, cum_count, n): mergeable log2-histogram
    quantiles — each non-negative value lands in bucket floor(log2(v))
    (v=0 -> bucket 0), the histogram is a counter monoid like this
    module's Bloom/CMS/HLL tables (union = add counts, so per-shard
    sketches merge without re-reading data), and quantile p is the first
    bucket whose cumulative count reaches ceil(p% of n) — answer
    guaranteed within a 2x value band (the bucket's [2^b, 2^(b+1)-1]).

    Exact integers everywhere: the bucket is the binary-string length
    minus one (length(conv(v,10,2)) - 1 — no float log2), the ceil
    target is (n*p + 99) DIV 100, the cumulative window runs over at
    most 64 bucket rows.
    """
    b = (
        F.length(F.conv(F.col(value_col).cast("long").cast("string"), 10, 2))
        - 1
    ).cast("int")
    hist = (
        df.filter(F.col(value_col) >= 0)
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bucket",
        F.sum("c").over(w).cast("long").alias("cum_count"),
        F.sum("c").over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n"),
    ).localCheckpoint(eager=True)
    out = None
    for p in ps:
        hit = (
            cum.filter(F.expr(f"cum_count >= (n * {p} + 99) DIV 100"))
            .orderBy("bucket")
            .limit(1)
            .select(
                F.lit(p).cast("long").alias("p"),
                F.col("bucket").cast("long").alias("bucket"),
                F.expr("CAST(pow(2, bucket + 1) AS BIGINT) - 1").alias(
                    "upper_bound"
                ),
                "cum_count",
                "n",
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out
