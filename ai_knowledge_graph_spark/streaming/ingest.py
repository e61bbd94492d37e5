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


def windowed_event_counts_late(
    spark: SparkSession,
    batches: list[DataFrame],
    window: str = "1 hour",
    watermark: str = "2 hours",
    metrics_out: dict | None = None,
) -> DataFrame:
    """APPEND-mode tumbling-window aggregation with real late-data dropping.

    Each DataFrame in ``batches`` lands as one parquet file whose mtime pins
    its micro-batch order (the stream_kg technique); one AvailableNow run
    with maxFilesPerTrigger=1 processes them in sequence. Append mode emits
    a window only once the watermark passes its end, and rows arriving
    after that are dropped — the semantics complete-mode
    ``windowed_event_counts_stream`` cannot exhibit.

    Measured Spark 4.1 semantics this function (and its oracle) rely on:

    * the EVICTION watermark for micro-batch N is
      ``floor_ms(max event time through batch N-1) - delay`` — windows with
      ``end <= eviction_wm`` are finalized, emitted, and dropped from state
      at batch N;
    * the LATE-ROW FILTER for batch N uses the eviction watermark of batch
      N-1 (one batch behind — measured: with two batches nothing is ever
      dropped, ``numRowsDroppedByWatermark`` stays 0 even for month-old
      rows);
    * AvailableNow runs one extra empty flush batch, so every window whose
      end <= the final watermark is emitted by query end.

    ``metrics_out`` (optional dict) receives ``rows_dropped_late`` — the
    summed ``numRowsDroppedByWatermark`` across batches — so tests can
    assert the dropping actually happened, not just that output matches.

    Scale note: state is bounded by (windows within the watermark horizon x
    group keys); the file-batch staging is fixture plumbing — production
    feeds this same plan from a real source with the identical watermark
    semantics.
    """
    import glob
    import os
    import tempfile
    import uuid

    root = tempfile.mkdtemp(prefix="late_win_")
    src = f"{root}/src"
    for i, df in enumerate(batches):
        before = set(glob.glob(f"{src}/part-*"))
        df.coalesce(1).write.mode("append").parquet(src)
        mt = 1_000_000_000 + i * 100_000
        for f in set(glob.glob(f"{src}/part-*")) - before:
            os.utime(f, (mt, mt))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    name = f"late_win_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if metrics_out is not None:
        dropped = 0
        for p in q.recentProgress:
            for so in p.get("stateOperators") or []:
                dropped += so.get("numRowsDroppedByWatermark") or 0
        metrics_out["rows_dropped_late"] = dropped
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


def stream_sessionize(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    query_name: str = "stream_sessions",
    out_path: str | None = None,
) -> DataFrame:
    """Custom stateful streaming operator: gap sessionization with
    ``applyInPandasWithState`` — the batch twin is
    ``operators.events.sessionize`` + ``session_stats``.

    Per user, the state is the OPEN trailing session
    (start_sec, last_sec, n_events, total_value); each micro-batch sorts
    its arrivals by (ts, event_id) — the batch twin's exact order — folds
    them into the state, and EMITS every session that closed (a gap >
    ``gap_seconds`` appeared). The final open session per user stays in
    state: with AvailableNow over a static directory the emitted set is
    exactly the batch sessions minus each user's last one — asserted in
    tests — and a later run over appended data continues those sessions
    from the checkpoint, which is the whole point of keeping them open.

    Scale: state is O(1) per user (four scalars), grouped-map shuffles
    only (user_id)-hashed Arrow batches, and emission is append-mode so
    the sink never rewrites. Events arriving in a LATER micro-batch than
    a chronologically-later event misorder the fold — production input
    needs per-user batch ordering (file order here; a watermark +
    transformWithState reorder buffer is the upgrade path).

    Returns the drained result as a DataFrame with columns
    (user_id, start_sec, end_sec, n_events, total_value). With
    ``out_path=None`` (tests/driver contract) the sink is an in-memory
    table — DRIVER-BOUNDED, fine for bounded result sets only; pass
    ``out_path`` to append closed sessions to parquet instead, the
    at-scale sink (exactly-once via the checkpoint + append mode).
    """
    import pandas as pd  # noqa: F401
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_type = StructType(
        [
            StructField("user_id", LongType()),
            StructField("start_sec", LongType()),
            StructField("end_sec", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_type = StructType(
        [
            StructField("start_sec", LongType()),
            StructField("last_sec", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )

    def fold(key, pdfs, state: GroupState):
        import pandas as pd

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        secs = batch["ts"].astype("int64") // 10**9
        if state.exists:
            start, last, n, tot = state.get
        else:
            start = last = None
            n, tot = 0, 0.0
        closed = []
        for sec, val in zip(secs.tolist(), batch["value"].tolist()):
            if last is not None and sec - last > gap_seconds:
                closed.append((key[0], start, last, n, tot))
                start, n, tot = sec, 0, 0.0
            if start is None:
                start = sec
            last = sec
            n += 1
            tot += float(val)
        state.update((start, last, n, tot))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "start_sec", "end_sec", "n_events", "total_value"],
        )

    src = _as_stream_dir(events_path)
    schema = spark.read.parquet(events_path).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(src)
        .select("user_id", "ts", "event_id", "value")
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        fold, out_type, state_type, "append", GroupStateTimeout.NoTimeout
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if out_path is None:
        q = writer.format("memory").queryName(query_name).start()
        q.awaitTermination()
        return spark.table(query_name)
    q = writer.format("parquet").option("path", out_path).start()
    q.awaitTermination()
    return spark.read.parquet(out_path)


def _mapping_pointer(state_dir: str) -> str:
    return f"{state_dir}/mapping_POINTER"


def _current_mapping_path(state_dir: str) -> str | None:
    """Path of the last atomically-committed mapping version, or None."""
    import os

    pointer = _mapping_pointer(state_dir)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        return fh.read().strip()


def read_kg_mapping(spark: SparkSession, state_dir: str) -> DataFrame:
    """The live (variant -> standard) mapping state of
    :func:`stream_incremental_kg` — resolved through the atomic pointer, so
    readers never observe a half-written version directory."""
    current = _current_mapping_path(state_dir)
    if current is None:
        raise FileNotFoundError(f"no committed mapping under {state_dir}")
    return spark.read.parquet(current)


def stream_incremental_kg(
    spark: SparkSession,
    pages_path: str,
    state_dir: str,
    checkpoint_dir: str,
    chunk_size: int = 100,
    overlap: int = 20,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming end-to-end KG construction with a PERSISTED entity mapping:
    each micro-batch of pages is extracted, its triples standardized against
    the stored (variant -> standard) state via
    :func:`~..operators.standardize.incremental_entity_mapping` (O(batch),
    never a corpus recompute), batch edges committed idempotently, and the
    updated mapping written back — the daily-ingest shape of the north
    rule's resumable pipeline.

    Exactly-once reasoning: a replayed batch re-reads a mapping that already
    contains its variants; incremental_entity_mapping is idempotent there
    (known variants are stable, nothing new is added), so the re-derived
    edges are byte-identical. Mapping state is VERSIONED: each batch writes
    ``mapping_v{batch_id}`` and then atomically swaps a pointer file
    (``os.replace``) to name it — a crash mid-write leaves the pointer (and
    thus the live mapping) at the previous committed version, never at a
    half-written directory. A replayed batch whose pointer already names its
    own version skips the state write entirely (already committed). State
    lives as parquet under ``state_dir`` (a real cluster would point this at
    a catalog table; the protocol is unchanged).
    """
    import os

    from ..operators.standardize import (
        apply_standardization,
        build_entity_mapping,
        incremental_entity_mapping,
        valid_triples,
    )

    reader = spark.readStream.schema(PAGES).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(pages_path)
    pointer_path = _mapping_pointer(state_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        triples = valid_triples(
            pages_to_raw_triples(
                batch_df, chunk_size=chunk_size, overlap=overlap,
                stage_partitions=None,
            )
        )
        current = _current_mapping_path(state_dir)
        if current is not None:
            existing = sp.read.parquet(current).select("variant", "standard")
            updated = incremental_entity_mapping(triples, existing)
        else:
            updated = build_entity_mapping(
                triples, tie_order="lexicographic"
            ).withColumn("src", F.lit("new"))
        # eager cut: the mapping feeds both the edge join and the state
        # write — materialize once
        updated = updated.localCheckpoint(eager=True)
        edges = apply_standardization(
            triples, updated.select("variant", "standard")
        )
        edges.write.mode("overwrite").parquet(
            f"{state_dir}/edges/batch={batch_id}"
        )
        version_path = f"{state_dir}/mapping_v{batch_id}"
        if current != version_path:
            # fresh version dir (never the one the pointer names), then
            # atomic pointer swap: the live state is always a fully-written
            # directory no matter where a failure lands
            updated.write.mode("overwrite").parquet(version_path)
            tmp = pointer_path + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(version_path)
            os.replace(tmp, pointer_path)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
