"""Triple/graph file formats (SURVEY §2.1 S2/S3/K1/K3).

JSON triple scan mirrors ICTGraphStore._load_triples (graph_store.py:82-115):
explicit schema, degenerate-row filters (null fields, empty object, literal
'none'), list-valued objects flattened one row per element
(scripts/clean_graph.py:104-115). ForceGraph nodes/links JSON mirrors
_load_graph_data (:117-150). CSV export mirrors the Neo4j exporter
(:620-639).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Raw triple JSON: object may be a string OR a list (LLM output shape).
_TRIPLE_JSON_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField("chunk", T.IntegerType()),
        T.StructField("inferred", T.BooleanType()),
    ]
)


def read_triples_json(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Load a triples JSON array; filter degenerate rows (F5).

    Filters (graph_store.py:94-105): any null field, blank object, literal
    'none' object (case-insensitive).
    """
    raw = spark.read.json(path, schema=_TRIPLE_JSON_SCHEMA, multiLine=multiline)
    return (
        raw.filter(
            F.col("subject").isNotNull()
            & F.col("predicate").isNotNull()
            & F.col("object").isNotNull()
            & (F.length(F.trim("object")) > 0)
            & (F.lower(F.trim("object")) != "none")
        )
        .select(
            "subject",
            "predicate",
            "object",
            F.coalesce("chunk", F.lit(0)).alias("chunk"),
            F.coalesce("inferred", F.lit(False)).alias("inferred"),
        )
    )


_FORCEGRAPH_SCHEMA = T.StructType(
    [
        T.StructField(
            "nodes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("definition", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("source", T.StringType()),
                        T.StructField("target", T.StringType()),
                        T.StructField("relation", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def read_forcegraph_json(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """ForceGraph {nodes:[], links:[]} -> (nodes, edges) DataFrames (S3)."""
    raw = spark.read.json(path, schema=_FORCEGRAPH_SCHEMA, multiLine=True)
    nodes = raw.select(F.explode("nodes").alias("n")).select(
        F.col("n.id").alias("entity"),
        F.col("n.type").alias("node_type"),
        F.col("n.definition").alias("definition"),
    )
    edges = raw.select(F.explode("links").alias("l")).select(
        F.col("l.source").alias("src"),
        F.col("l.target").alias("dst"),
        F.coalesce(F.col("l.relation"), F.lit("related")).alias("relation"),
    )
    return nodes, edges


def write_triples_json(triples: DataFrame, path: str) -> None:
    """K1: triples -> JSON lines (distributed counterpart of the pretty-array
    dump at main.py:294-301; a JSON array is a single-writer format)."""
    triples.select("subject", "predicate", "object", "chunk", "inferred").write.mode(
        "overwrite"
    ).json(path)


def export_neo4j_csv(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """K3 (graph_store.py:620-639): nodes.csv / edges.csv with headers,
    quoted fields."""
    nodes.select(
        F.col("entity").alias("name:ID"),
        F.col("degree").alias("degree:int"),
        F.col("component_id").alias("component:long"),
    ).write.mode("overwrite").option("header", True).option("quoteAll", True).csv(
        f"{out_dir}/nodes"
    )
    edges.select(
        F.col("src").alias(":START_ID"),
        F.col("dst").alias(":END_ID"),
        F.col("relation").alias("relation"),
        F.col("inferred").alias("inferred:boolean"),
    ).write.mode("overwrite").option("header", True).option("quoteAll", True).csv(
        f"{out_dir}/edges"
    )


# N-Triples string-literal escapes (RDF 1.1 N-Triples §2.4 ECHAR), applied
# in this exact order (backslash FIRST or the later escapes double up).
# The same four (pattern, replacement) pairs are embedded literal-for-
# literal in the oracle SQL, so the formatting itself is hash-gated.
NTRIPLES_ESCAPES = (
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\t", "\\t"),
)


def ntriples_lines(
    triples: DataFrame, base: str = "http://kg.local/"
) -> DataFrame:
    """(line): canonical RDF 1.1 N-Triples serialization of the KG —
    ``<{base}e/{subject}> <{base}p/{predicate}> "object" .`` — one triple
    per line, the line-oriented RDF format built for exactly this kind of
    distributed write (every line independent; parallel part-files
    concatenate into a valid document, unlike Turtle/RDF-XML).
    Subjects/predicates mint IRIs under ``base`` (spaces percent-encoded
    — the only IRI-illegal byte the standardizer lets through: entities
    are lowercased alnum/space after cleaning); objects serialize as
    escaped string literals (ECHAR set in :data:`NTRIPLES_ESCAPES`).

    Row-local select over the triple set — no shuffle, no UDF; pair with
    :func:`write_ntriples` for the text sink. Beyond-reference surface:
    the reference exports JSON/Neo4j-CSV/HTML (graph_store.py); N-Triples
    is the interop format those can't provide (loads into any triple
    store / SPARQL engine unchanged).
    """

    def iri(col, kind):
        return F.concat(
            F.lit("<" + base + kind + "/"),
            F.regexp_replace(col, " ", "%20"),
            F.lit(">"),
        )

    lit = F.col("object")
    for pat, rep in NTRIPLES_ESCAPES:
        lit = F.replace(lit, F.lit(pat), F.lit(rep))
    return triples.select("subject", "predicate", "object").distinct().select(
        F.concat(
            iri(F.col("subject"), "e"),
            F.lit(" "),
            iri(F.col("predicate"), "p"),
            F.lit(' "'),
            lit,
            F.lit('" .'),
        ).alias("line")
    )


def write_ntriples(
    triples: DataFrame, path: str, base: str = "http://kg.local/"
) -> None:
    """K-family sink: the KG as an N-Triples document (part-files of
    independent lines; cat them for a single .nt)."""
    ntriples_lines(triples, base=base).write.mode("overwrite").text(path)
