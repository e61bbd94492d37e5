"""Materialize the final triple table into nodes/edges graph tables.

Reference counterpart: ``ICTGraphStore`` building a NetworkX MultiDiGraph in
memory (graph_store.py:62-115) plus the stats surface (:596-610). Here the
graph lands as two tables with stable 64-bit ids, degree, and component id —
bucketable by entity hash so the query layer's point lookups prune partitions
(north_star: nodes/edges partitioned by entity-hash bucket).

Multi-edges are preserved: one row per (src, dst, relation, url, chunk), the
MultiDiGraph semantics (graph_store.py:66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import components_for_triples, node_id


def normalize_node_name(col):
    """graph_store._normalize (:52-59): strip, lower, spaces/hyphens -> _."""
    return F.translate(F.lower(F.trim(col)), " -", "__")


def materialize_graph(
    triples: DataFrame, normalize_names: bool = False, id_bits: int = 64
) -> tuple[DataFrame, DataFrame]:
    """triples -> (nodes, edges).

    nodes(canonical_id, entity, degree, component_id)
    edges(src_id, dst_id, src, dst, relation, inferred, url, chunk)

    ``id_bits=128`` switches every id column (canonical_id, src_id, dst_id,
    component_id) to the two-seeded-xxhash64 struct<h,l> form for 10^10+
    entity runs (see operators/components.node_id); bucketed table writes
    then bucket on ``canonical_id.h`` (Iceberg's bucket transform needs a
    primitive — the high half alone distributes uniformly).
    """
    t = triples
    if normalize_names:
        t = t.withColumn("subject", normalize_node_name(F.col("subject"))).withColumn(
            "object", normalize_node_name(F.col("object"))
        )
    t = t.localCheckpoint(eager=True)  # feeds edges, degree, components

    edges = t.select(
        node_id(F.col("subject"), id_bits).alias("src_id"),
        node_id(F.col("object"), id_bits).alias("dst_id"),
        F.col("subject").alias("src"),
        F.col("object").alias("dst"),
        F.col("predicate").alias("relation"),
        F.coalesce(F.col("inferred"), F.lit(False)).alias("inferred"),
        *( [F.col("url")] if "url" in t.columns else [F.lit(None).cast("string").alias("url")] ),
        *( [F.col("chunk")] if "chunk" in t.columns else [F.lit(None).cast("int").alias("chunk")] ),
    )

    degree = (
        t.select(F.explode(F.array("subject", "object")).alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    comps = components_for_triples(t, id_bits=id_bits).select(
        "entity", F.col("component_id")
    )
    nodes = degree.join(comps, "entity", "left").select(
        node_id(F.col("entity"), id_bits).alias("canonical_id"),
        "entity",
        "degree",
        "component_id",
    )
    return nodes, edges


def iceberg_available(spark) -> bool:
    """True when an Iceberg catalog is on the classpath/config (the cluster
    case); this sandbox image ships no Iceberg jar."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_graph_tables(
    nodes: DataFrame,
    edges: DataFrame,
    nodes_table: str = "kg_nodes",
    edges_table: str = "kg_edges",
    buckets: int = 32,
    table_format: str = "auto",
) -> str:
    """Persist as bucketed tables: point lookups on src_id/canonical_id read
    one bucket; node-keyed joins co-locate without a shuffle.

    ``table_format``: 'iceberg' uses the DataFrameWriterV2 path with hidden
    bucket partitioning (``writeTo(...).partitionedBy(bucket(N, col))`` —
    the north_star layout); 'parquet' uses bucketed ``saveAsTable``;
    'auto' picks iceberg when its catalog is present (clusters), else
    parquet (this image). Returns the format used.

    Saved schema note (id_bits=128): alongside the struct id, the tables
    persist a flattened ``canonical_id_h`` / ``src_id_h`` long column — the
    bucketing/sort key (bucket transforms need a primitive, and parquet
    bucketing requires its key column to persist). Readers should treat it
    as the partitioning key, not data; it equals ``<id>.h``."""
    from pyspark.sql import types as T

    def _bucketable(df: DataFrame, col: str) -> tuple[DataFrame, str]:
        # 128-bit struct ids: bucket/sort transforms need a primitive, so
        # flatten the (uniformly distributed) high half into a key column.
        if isinstance(df.schema[col].dataType, T.StructType):
            return df.withColumn(f"{col}_h", F.col(f"{col}.h")), f"{col}_h"
        return df, col

    nodes, nodes_key = _bucketable(nodes, "canonical_id")
    edges, edges_key = _bucketable(edges, "src_id")
    fmt = table_format
    if fmt == "auto":
        fmt = "iceberg" if iceberg_available(nodes.sparkSession) else "parquet"
    if fmt == "iceberg":
        (
            nodes.writeTo(nodes_table)
            .partitionedBy(F.bucket(buckets, F.col(nodes_key)))
            .using("iceberg")
            .createOrReplace()
        )
        (
            edges.writeTo(edges_table)
            .partitionedBy(F.bucket(buckets, F.col(edges_key)))
            .using("iceberg")
            .createOrReplace()
        )
        return fmt
    (
        nodes.write.mode("overwrite")
        .bucketBy(buckets, nodes_key)
        .sortBy(nodes_key)
        .format("parquet")
        .saveAsTable(nodes_table)
    )
    (
        edges.write.mode("overwrite")
        .bucketBy(buckets, edges_key)
        .sortBy(edges_key)
        .format("parquet")
        .saveAsTable(edges_table)
    )
    return fmt


def graph_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """stats() surface (graph_store.py:596-610): counts, density, components."""
    n = nodes.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.count_distinct("component_id").alias("connected_components"),
    )
    e = edges.agg(
        F.count(F.lit(1)).alias("edges"),
        F.sum(F.col("inferred").cast("long")).alias("inferred_edges"),
        F.count_distinct("relation").alias("relation_types"),
    )
    return n.crossJoin(e).select(
        "*",
        (
            F.col("edges")
            / (F.col("nodes").cast("double") * (F.col("nodes") - F.lit(1)))
        ).alias("density"),
    )
