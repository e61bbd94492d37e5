"""Incremental ingest: streaming extraction + windowed event aggregation.

The reference's only incremental facility is the chunk-watermark checkpoint
(main.py:119-171). Its Spark-native generalization: Structured Streaming
with ``Trigger.AvailableNow`` over the pages table, ``foreachBatch`` running
the SAME batch extract stage per micro-batch, and the engine's stage
checkpointing giving exactly-once sink semantics (idempotent per-batch
parquet commits keyed by batch id).

Also a watermarked tumbling-window aggregation over the `events` table — the
standard late-data pattern — exercised in tests against the equivalent batch
query (results must match exactly once the stream drains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import pages_to_raw_triples
from ..schemas import PAGES


def _as_stream_dir(path: str) -> str:
    """FileStreamSource requires a directory; testdata ships single parquet
    files — expose one through a symlinked temp dir."""
    import os
    import tempfile

    if not os.path.isfile(path):
        return path
    d = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
    return d


def stream_extract_pages(
    spark: SparkSession,
    pages_path: str,
    out_path: str,
    checkpoint_dir: str,
    chunk_size: int = 100,
    overlap: int = 20,
) -> None:
    """Incrementally extract triples from a growing pages directory.

    AvailableNow drains everything present then stops — the batch-parity
    trigger; a live deployment switches the trigger only.
    """
    stream = (
        spark.readStream.schema(PAGES).format("parquet").load(pages_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = pages_to_raw_triples(
            batch_df, chunk_size=chunk_size, overlap=overlap, stage_partitions=None
        )
        # idempotent per-batch commit: re-running a batch overwrites its own
        # subdirectory only
        triples.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts_stream(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window aggregation over events, drained
    synchronously into a memory sink; returns the result DataFrame.

    Matches ``windowed_event_counts_batch`` exactly once drained.
    """
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_as_stream_dir(events_path))
        .withColumn("ts", F.col("ts").cast("timestamp"))  # watermark needs TZ-aware
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("total_value", 6).alias("total_value"),
        )
    )
    name = f"evt_counts_{abs(hash(events_path)) % 10_000_000}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def windowed_event_counts_batch(spark: SparkSession, events_path: str, window: str = "1 hour") -> DataFrame:
    """Batch equivalent (the oracle for the streaming test + a queries() op)."""
    events = spark.read.parquet(events_path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("total_value", 6).alias("total_value"),
        )
    )


def stream_dedup_documents(
    spark: SparkSession,
    docs_path: str,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup on content hash — the incremental form of the
    corpus dedup (sources/corpus.dedup_corpus): first-arrived document per
    whitespace-normalized sha256 survives, later duplicates are dropped by
    the state store.

    Uses Structured Streaming ``dropDuplicates`` over the hash key; with a
    ``ts_col`` the watermark bounds state size (state for hashes older than
    the watermark is evicted — at 100 TB/day ingest an unbounded exact-dedup
    state is the thing that kills the job, so production runs pair this with
    a periodic compaction join against the materialized corpus table).
    Drained synchronously via AvailableNow into a memory sink.
    """
    from ..sources.corpus import content_hash_col

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(_as_stream_dir(docs_path))
        .withColumn("content_sha", content_hash_col("text"))
    )
    if ts_col is not None:
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        stream = stream.withWatermark(ts_col, watermark)
        # Key on content_sha ONLY: identical documents arriving with different
        # timestamps are still duplicates. dropDuplicatesWithinWatermark keeps
        # the content-only key while letting the watermark evict old state
        # (plain dropDuplicates(["content_sha", ts_col]) would treat each
        # timestamp as a distinct document).
        deduped = stream.dropDuplicatesWithinWatermark(["content_sha"])
    else:
        deduped = stream.dropDuplicates(["content_sha"])
    name = f"dedup_{abs(hash(docs_path)) % 10_000_000}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")
