"""SparkSession construction with the engine's required runtime settings."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ai_knowledge_graph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a session tuned for this engine.

    AQE on (runtime coalesce + skew-join splitting), Arrow on (every custom
    operator is an Arrow-batched pandas UDF), UTC session TZ (DuckDB-oracle
    comparison), shuffle partitions sized to cores rather than the 200
    default. On a real cluster these come from spark-submit conf; the
    function only fills gaps so it is cluster-safe.
    """
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Whole-stage codegen: ON for real clusters (long-running executors amortize
    # JIT), OFF by default here — janino compilation in this sandbox measures
    # ~20x the actual query time for one-shot runs (174s -> 9s on the
    # standardize stage at 1k docs). Override with SPARK_GRAFT_CODEGEN=on.
    codegen = os.environ.get("SPARK_GRAFT_CODEGEN", "off") == "on"
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.codegen.wholeStage", str(codegen).lower())
        .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY" if codegen else "NO_CODEGEN")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Default 64MB advisory size collapses mid-size shuffles to 1-2
        # post-shuffle partitions, serializing stages no matter how many
        # cores; 8MB keeps parallelism while still coalescing tiny shuffles.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
        # AQE coalescing sizes stages by their shuffle INPUT bytes; fan-out
        # joins (transitive A->B->C: 24k edges in, 3.1M paths out) would run
        # the explosion plus everything downstream of it in 1-2 tasks. The
        # 1MB default floor is what collapses those small-input stages;
        # 16KB lets parallelismFirst spread them across all cores (measured
        # 8.5s -> 2.7s on the transitive stage at 16k docs / 8 cores).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions else int(cores)),
        )
        # UI off by default (driver overhead); BENCH/shuffle_probe.py turns it
        # on to read per-stage shuffle metrics from the REST API.
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "on" else "false",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # Shuffle/checkpoint scratch on tmpfs: the sandboxed overlay FS
        # serializes concurrent writers (32 task slots thrash it); RAM-backed
        # local dirs restore parallel shuffle-write throughput. On a real
        # cluster this is local NVMe per executor.
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread(df, min_partitions: int | None = None):
    """Repartition a DataFrame UP to the session's shuffle parallelism when
    its scan produced fewer partitions (a single small parquet file reads as
    1 partition, serializing every narrow stage built on it). No-op when the
    input is already parallel enough — at real scale inputs arrive in
    thousands of partitions and this never fires.
    """
    target = min_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
