"""stream_sessionize (applyInPandasWithState) vs the batch twin:
closed streaming sessions == batch sessions minus each user's open last."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.events import sessionize
from ai_knowledge_graph_spark.streaming.ingest import stream_sessionize

SF_DIR = "/root/testdata/sf0.001"


def _batch_sessions(spark, path, gap_seconds):
    ev = spark.read.parquet(path).select("user_id", "ts", "event_id", "value")
    s = sessionize(ev, gap_seconds=gap_seconds)
    per = s.groupBy("session_id").agg(
        F.first("user_id").alias("user_id"),
        F.min(F.unix_timestamp("ts")).alias("start_sec"),
        F.max(F.unix_timestamp("ts")).alias("end_sec"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    last = per.groupBy("user_id").agg(F.max("start_sec").alias("_last_start"))
    return (
        per.join(last, "user_id")
        .filter(F.col("start_sec") < F.col("_last_start"))
        .select("user_id", "start_sec", "end_sec", "n_events", "total_value")
    )


def test_streaming_matches_batch_closed_sessions(spark):
    gap = 1800
    path = f"{SF_DIR}/events.parquet"
    out = stream_sessionize(
        spark,
        path,
        checkpoint_dir=tempfile.mkdtemp(prefix="sess_ckpt_"),
        gap_seconds=gap,
        query_name="sess_parity",
    )
    got = {
        (r["user_id"], r["start_sec"], r["end_sec"], r["n_events"],
         round(r["total_value"], 6))
        for r in out.collect()
    }
    exp = {
        (r["user_id"], r["start_sec"], r["end_sec"], r["n_events"],
         round(r["total_value"], 6))
        for r in _batch_sessions(spark, path, gap).collect()
    }
    assert got == exp
    assert len(got) > 0
    # every user's OPEN session is withheld: streaming emits strictly fewer
    # sessions than the batch total, one fewer per active user
    n_total = (
        sessionize(
            spark.read.parquet(path).select("user_id", "ts", "event_id", "value"),
            gap_seconds=gap,
        )
        .select("session_id")
        .distinct()
        .count()
    )
    n_users = spark.read.parquet(path).select("user_id").distinct().count()
    assert len(got) == n_total - n_users


def test_parquet_sink_matches_memory_sink(spark):
    import tempfile

    path = f"{SF_DIR}/events.parquet"
    out_dir = tempfile.mkdtemp(prefix="sess_out_")
    got = stream_sessionize(
        spark,
        path,
        checkpoint_dir=tempfile.mkdtemp(prefix="sess_ckpt2_"),
        gap_seconds=1800,
        query_name="sess_parity2",
        out_path=out_dir,
    )
    rows = {
        (r["user_id"], r["start_sec"], r["end_sec"], r["n_events"],
         round(r["total_value"], 6))
        for r in got.collect()
    }
    exp = {
        (r["user_id"], r["start_sec"], r["end_sec"], r["n_events"],
         round(r["total_value"], 6))
        for r in _batch_sessions(spark, path, 1800).collect()
    }
    assert rows == exp
