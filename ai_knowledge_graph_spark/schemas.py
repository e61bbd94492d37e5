"""Explicit schemas for every persisted table — no schema inference anywhere.

The reference pipeline is schemaless ``list[dict]`` (main.py:62-64,154-155);
here every stage boundary has a fixed StructType so scans prune columns and
checkpoints are stable across runs.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Common-Crawl-style web pages (input_hint shape).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Chunker output: one row per (url, chunk_id), 1-indexed chunk ids to match
# the reference's chunk tagging (main.py:154-155).
CHUNKS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("chunk_text", T.StringType(), False),
        T.StructField("n_words", T.IntegerType(), False),
    ]
)

# The single pipeline IR: one row per triple. ``seq`` is the stable intra-run
# position (chunk-major, then extraction order within the chunk) standing in
# for the reference's list position — it drives every "last wins" /
# "keep first" tie-break (entity_standardization.py:327-331,356-375).
TRIPLES = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("chunk", T.IntegerType(), True),
        T.StructField("inferred", T.BooleanType(), False),
        T.StructField("seq", T.LongType(), True),
    ]
)

NODES = T.StructType(
    [
        T.StructField("canonical_id", T.LongType(), False),
        T.StructField("entity", T.StringType(), False),
        T.StructField("degree", T.LongType(), False),
        T.StructField("component_id", T.LongType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src_id", T.LongType(), False),
        T.StructField("dst_id", T.LongType(), False),
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("relation", T.StringType(), False),
        T.StructField("inferred", T.BooleanType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("chunk", T.IntegerType(), True),
    ]
)

# Per-partition lineage row written alongside every stage checkpoint.
LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("content_hash", T.DecimalType(38, 0), True),
    ]
)
