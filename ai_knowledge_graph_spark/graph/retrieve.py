"""Hybrid-RAG graph expansion (SURVEY §3.3; graph_retriever.retrieve
:219-326). The vector-search step is an external service boundary; the
graph-side steps rebuilt here:

  1. prioritize concepts, expand only the top ``max_expand`` (:256-262)
  2. per-concept neighbor cap ``graph_top_k``, global hard cap
     ``max_total`` triples, + a ``defined_as`` row per concept with a
     definition (:264-301)
  3. context string capped at ``max_context_chars`` (:304-318)

The reference's greedy sequential loop with a running global cap is
order-dependent; the rebuild totalizes the same priority order
(priority, concept, neighbor rank) and takes the first ``max_total`` —
a window + limit over a by-construction tiny set (≤ max_expand × (top_k+1)
rows), so the expansion is join-pruned against the bucketed edge table and
never scans the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def graph_expand(
    edges: DataFrame,
    nodes: DataFrame,
    concepts: DataFrame,
    graph_top_k: int = 5,
    max_expand: int = 20,
    max_total: int = 50,
) -> DataFrame:
    """concepts(concept, priority) -> up to ``max_total`` context triples
    (subject, predicate, object, concept, rank).

    priority: lower = expand earlier (the reference puts query concepts
    before chunk concepts, :259-262).
    """
    top = F.broadcast(
        concepts.orderBy("priority", "concept").limit(max_expand)
    )

    out_n = (
        edges.join(top, edges["src"] == top["concept"])
        .select(
            "concept", "priority",
            F.col("src").alias("subject"),
            F.col("relation").alias("predicate"),
            F.col("dst").alias("object"),
            F.lit(0).alias("dir_ord"),  # out-edges first (reference list order)
            F.col("dst").alias("nb"),
        )
    )
    in_n = (
        edges.join(top, edges["dst"] == top["concept"])
        .select(
            "concept", "priority",
            F.col("src").alias("subject"),
            F.col("relation").alias("predicate"),
            F.col("dst").alias("object"),
            F.lit(1).alias("dir_ord"),
            F.col("src").alias("nb"),
        )
    )
    nb = out_n.unionByName(in_n).dropDuplicates(
        ["concept", "predicate", "nb"]  # the reference's seen-set key (:277)
    )
    w = Window.partitionBy("concept").orderBy("dir_ord", "nb", "predicate")
    capped = (
        nb.withColumn("nb_rank", F.row_number().over(w))
        .filter(F.col("nb_rank") <= graph_top_k)
        .select("concept", "priority", "subject", "predicate", "object", "nb_rank")
    )

    defs = (
        nodes.join(top, nodes["entity"] == top["concept"])
        .filter(F.col("definition").isNotNull() & (F.length("definition") > 0))
        .select(
            "concept", "priority",
            F.col("entity").alias("subject"),
            F.lit("defined_as").alias("predicate"),
            F.col("definition").alias("object"),
            F.lit(10**6).alias("nb_rank"),  # after the concept's neighbors
        )
    )

    ranked = capped.unionByName(defs).orderBy("priority", "concept", "nb_rank")
    return (
        ranked.limit(max_total)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy("priority", "concept", "nb_rank", "predicate", "object")
            ),
        )
        .select("subject", "predicate", "object", "concept", "rank")
    )


def format_context(
    graph_triples: DataFrame,
    chunks: list[dict] | None = None,
    max_context_chars: int = 6000,
) -> str:
    """Step 3-4 (:304-318): render the (bounded) expansion + retrieved chunks
    into the LLM context string, truncated at ``max_context_chars``. The
    collect is bounded by ``max_total`` rows upstream."""
    rows = graph_triples.orderBy("rank").collect()
    graph_context = "\n".join(
        f"{r['subject']} {r['predicate']} {r['object']}" for r in rows
    )
    chunk_text = "\n\n---\n\n".join(
        f"[Source: {c.get('source', '?')}]\n{c['text']}" for c in (chunks or [])
    )
    combined = (
        "## Retrieved Knowledge Base Content\n"
        f"{chunk_text}\n\n"
        "## Graph-Derived Relationships\n"
        f"{graph_context}"
    )
    if len(combined) > max_context_chars:
        combined = combined[:max_context_chars] + "\n\n[context truncated]"
    return combined
