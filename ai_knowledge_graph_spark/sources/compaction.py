"""Parquet small-file compaction — the table-maintenance pass every
long-running crawl/ingest pipeline needs.

Streaming ingest (foreachBatch parquet sinks, per-batch edge commits) and
incremental crawls produce many small files; at 10^12 rows the resulting
file-listing and per-file open costs dominate scans long before data does.
Compaction rewrites a table into ~``target_file_mb``-sized files, and —
when ``order_cols`` is given — range-clusters rows across files
(``repartitionByRange`` + ``sortWithinPartitions``) so parquet min/max
column statistics prune file ranges for selective queries: the poor
man's Z-order, and exactly what an Iceberg ``rewrite_data_files`` with a
sort order does (this engine's materialize falls back to bucketed parquet
in sandboxes without an Iceberg catalog; compaction is the matching
maintenance op).

Size estimation reads Catalyst's logical-plan statistics (parquet footer
sizes), so it works the same on any filesystem Spark can reach; the file
count is data-derived, not hard-coded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def plan_compaction(df: DataFrame, target_file_mb: int = 128) -> int:
    """Number of output files for ``df`` at the target size: Catalyst's
    size-in-bytes estimate over the target, at least 1."""
    size_bytes = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    return max(1, math.ceil(size_bytes / (target_file_mb * 1024 * 1024)))


def compact_table(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
    order_cols: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``in_path`` into ``out_path`` with
    ~``target_file_mb`` files; returns {'n_files_in', 'n_files_out',
    'rows'} for the maintenance log.

    With ``order_cols``: rows are range-partitioned across output files on
    those columns and sorted within each file, so every output file covers
    a disjoint key range (verified by the pytest reading per-file min/max)
    — selective scans then prune whole files from the parquet footer
    stats. Without: plain coalescing repartition (pure size fix).

    The rewrite is one shuffle (range or round-robin); the range version's
    sampling pass is Spark's built-in range-boundary sample, linear and
    tiny. Idempotent: re-running overwrites with identical content.
    """
    df = spark.read.parquet(in_path)
    n_in = len(df.inputFiles())
    n_out = plan_compaction(df, target_file_mb)
    if order_cols:
        out = df.repartitionByRange(n_out, *order_cols).sortWithinPartitions(
            *order_cols
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(out_path)
    written = spark.read.parquet(out_path)
    return {
        "n_files_in": n_in,
        "n_files_out": len(written.inputFiles()),
        "rows": written.count(),
    }
