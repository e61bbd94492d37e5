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

from pyspark.sql import Column, DataFrame
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
