"""Checkpointed stage outputs with per-partition lineage; idempotent resume.

The reference checkpoints by rewriting the whole triple list as JSON every 10
chunks and resuming from ``max(chunk)`` (main.py:119-171) — a global, lossy
watermark. Here every stage writes a parquet table plus a lineage table of
per-partition row counts and content hashes; a re-run that finds a committed
stage (`_SUCCESS`) reads it back instead of recomputing, making any stage
resume idempotent (north_rule). Parquet stands in for Iceberg: this image has
no Iceberg runtime jar, and the write/read surface used here (atomic
`_SUCCESS` commit, partition pruning) maps 1:1 onto
``df.writeTo(table).createOrReplace()`` when the catalog is available.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_path(root: str, stage: str) -> str:
    return os.path.join(root, stage)


def stage_is_complete(root: str, stage: str) -> bool:
    return os.path.exists(os.path.join(_stage_path(root, stage), "_SUCCESS"))


def lineage_rows(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage: (stage, partition_id, rows, content_hash).

    content_hash is an order-insensitive 64-bit aggregate (sum of xxhash64
    over all columns) — enough to prove a resumed stage is byte-equivalent.
    """
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        # Sum in decimal(38,0): a bigint sum of xxhash64 values overflows
        # (ANSI mode raises); decimal keeps the aggregate exact + commutative.
        .withColumn(
            "row_hash",
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)"),
        )
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("rows"), F.sum("row_hash").alias("content_hash"))
        .select(
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.col("rows"),
            F.col("content_hash").cast("decimal(38,0)"),
        )
    )


def checkpoint_stage(
    spark: SparkSession,
    df: DataFrame,
    root: str | None,
    stage: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as the committed output of ``stage`` (or read it back).

    - checkpointing off (root None): pass-through.
    - stage already committed: skip compute, read the committed table (resume).
    - otherwise: write table + lineage, return the read-back DataFrame (which
      also truncates the logical plan for downstream stages).
    """
    if root is None:
        return df
    path = _stage_path(root, stage)
    if stage_is_complete(root, stage):
        return spark.read.parquet(path)

    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)

    committed = spark.read.parquet(path)
    lineage_rows(committed, stage).write.mode("overwrite").parquet(
        os.path.join(root, "_lineage", stage)
    )
    return committed


def content_hash(df: DataFrame) -> tuple[int, int]:
    """(row_count, order-insensitive content hash) — idempotency checks."""
    row = (
        df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"))
        .collect()[0]
    )
    return int(row["n"]), int(row["s"] or 0)


def read_lineage(spark: SparkSession, root: str, stage: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "_lineage", stage))
