"""compact_table: small-file compaction + range-clustered layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.sources.compaction import compact_table


@pytest.fixture(scope="module")
def fragmented(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("compact")
    path = str(root / "frag")
    # 64 tiny files (the streaming-sink shape)
    (
        spark.range(20000)
        .select(
            F.col("id").alias("doc_id"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(64)
        .write.parquet(path)
    )
    return {"root": str(root), "path": path}


def test_compaction_preserves_content_and_shrinks_files(spark, fragmented):
    out = f"{fragmented['root']}/out"
    stats = compact_table(spark, fragmented["path"], out, target_file_mb=128)
    assert stats["n_files_in"] == 64
    assert stats["n_files_out"] < 8  # 20k rows ≪ 128 MB -> a few files
    assert stats["rows"] == 20000
    a = sorted(map(tuple, spark.read.parquet(fragmented["path"]).collect()))
    b = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert a == b


def test_compaction_range_clusters_disjoint_files(spark, fragmented):
    out = f"{fragmented['root']}/ordered"
    # force multiple output files via a tiny target so ranges are testable
    stats = compact_table(
        spark, fragmented["path"], out, target_file_mb=1, order_cols=["doc_id"]
    )
    assert stats["n_files_out"] >= 2
    files = spark.read.parquet(out).inputFiles()
    ranges = []
    for f in files:
        r = (
            spark.read.parquet(f.replace("file:", ""))
            .agg(F.min("doc_id"), F.max("doc_id"))
            .collect()[0]
        )
        ranges.append((r[0], r[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: {ranges}"
    # every row still present exactly once
    assert spark.read.parquet(out).count() == 20000


def test_compaction_idempotent(spark, fragmented):
    out = f"{fragmented['root']}/idem"
    s1 = compact_table(spark, fragmented["path"], out, target_file_mb=128)
    s2 = compact_table(spark, fragmented["path"], out, target_file_mb=128)
    assert s1 == s2
    assert spark.read.parquet(out).count() == 20000
