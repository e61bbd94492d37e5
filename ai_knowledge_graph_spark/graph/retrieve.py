"""Hybrid-RAG retrieval (SURVEY §3.3; graph_retriever.retrieve :219-326),
end-to-end:

  0. chunk-embedding vector search (:231-234, Chroma similarity_search
     replaced by ops/similarity.cosine_topk — exact baseline; srp_topk is
     the bucketed scale path)
  1. concept extraction from retrieved chunks + the query (:246-254,
     _extract_concepts :436-451 as a broadcast containment join — the
     retrieved-text side is tiny, the node table streams)
  2. prioritize concepts, expand only the top ``max_expand`` (:256-262)
  3. per-concept neighbor cap ``graph_top_k``, global hard cap
     ``max_total`` triples, + a ``defined_as`` row per concept with a
     definition (:264-301)
  4. context string capped at ``max_context_chars`` (:304-318)

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

from ..operators.similarity import cosine_topk, ivf_topk, srp_topk


def vector_search_chunks(
    chunks: DataFrame,
    query_embedding: list[float],
    k: int = 5,
    id_col: str = "chunk_id",
    vec_col: str = "embedding",
    ann: str = "exact",
    **ann_kwargs,
) -> DataFrame:
    """Step 1 (:231-244): top-``k`` chunks by cosine for one query vector.

    chunks(chunk_id, source, text, embedding) -> the same rows + (score, rk).
    ``ann`` selects the search strategy: ``'exact'`` (cosine_topk full scan —
    the parity baseline), ``'srp'`` (multi-table SRP-LSH bucket probe) or
    ``'ivf'`` (inverted-list probe) for chunk tables that outgrow a full
    scan per query; extra ``ann_kwargs`` (n_planes/tables/nlist/n_probe/...)
    pass through to the chosen operator."""
    spark = chunks.sparkSession
    q = spark.createDataFrame(
        [(-1, [float(x) for x in query_embedding])],
        f"{id_col} long, {vec_col} array<double>",
    )
    searchers = {"exact": cosine_topk, "srp": srp_topk, "ivf": ivf_topk}
    if ann not in searchers:
        raise ValueError(f"ann must be one of {sorted(searchers)}, got {ann!r}")
    if ann == "srp":
        ann_kwargs.setdefault("dim", len(query_embedding))
    hits = searchers[ann](
        chunks.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
        q.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")),
        k=k,
        **ann_kwargs,
    ).select(F.col("neighbor_id").alias(id_col), F.col("cosine").alias("score"), "rk")
    return hits.join(chunks.drop(vec_col), id_col)


def extract_concepts(texts: DataFrame, nodes: DataFrame, text_col: str = "text") -> DataFrame:
    """_extract_concepts (:436-451) over a bounded text set: node names of
    length ≥ 3 whose raw or underscore→space form appears in the lowercased
    text. The text side is ≤ vector_top_k+1 rows and broadcasts; the node
    table streams through a containment predicate — linear in |nodes|, never
    quadratic. Returns distinct (concept) rows."""
    t = F.broadcast(
        texts.select(F.lower(F.col(text_col)).alias("_lt")).distinct()
    )
    labels = nodes.select(F.col("entity").alias("concept")).distinct().filter(
        F.length("concept") >= 3
    )
    lc = F.lower(F.col("concept"))
    return (
        labels.join(
            t,
            F.col("_lt").contains(lc)
            | F.col("_lt").contains(F.replace(lc, F.lit("_"), F.lit(" "))),
        )
        .select("concept")
        .distinct()
    )


def retrieve(
    query_text: str,
    query_embedding: list[float],
    chunks: DataFrame,
    edges: DataFrame,
    nodes: DataFrame,
    vector_top_k: int = 5,
    graph_top_k: int = 5,
    max_expand: int = 20,
    max_total: int = 50,
    max_context_chars: int = 6000,
    ann: str = "exact",
) -> dict:
    """Full hybrid retrieval (graph_retriever.retrieve :219-326).

    Returns the reference's dict surface: chunks, graph_context,
    graph_entities, graph_triples (as a DataFrame), combined_context.
    Query concepts get priority 0, chunk-only concepts priority 1
    (:256-262); within a priority the order is totalized lexicographically
    (the reference iterates a set). ``ann`` selects the vector-search
    strategy ('exact' | 'srp' | 'ivf' — see vector_search_chunks).
    """
    spark = chunks.sparkSession
    if "definition" not in nodes.columns:
        nodes = nodes.withColumn("definition", F.lit(None).cast("string"))

    top_chunks = vector_search_chunks(
        chunks, query_embedding, k=vector_top_k, ann=ann
    ).localCheckpoint(eager=True)

    qtext = spark.createDataFrame([(query_text,)], "text string")
    query_concepts = extract_concepts(qtext, nodes)
    chunk_concepts = extract_concepts(top_chunks, nodes)
    concepts = (
        query_concepts.withColumn("priority", F.lit(0))
        .unionByName(
            chunk_concepts.join(query_concepts, "concept", "left_anti")
            .withColumn("priority", F.lit(1))
        )
        .localCheckpoint(eager=True)
    )

    triples = graph_expand(
        edges,
        nodes,
        concepts,
        graph_top_k=graph_top_k,
        max_expand=max_expand,
        max_total=max_total,
    ).localCheckpoint(eager=True)

    chunk_rows = [
        {"text": r["text"], "source": r["source"], "score": float(r["score"])}
        for r in top_chunks.orderBy("rk").collect()
    ]
    graph_rows = triples.orderBy("rank").collect()
    graph_context = "\n".join(
        f"{r['subject']} {r['predicate']} {r['object']}" for r in graph_rows
    )
    # Bounded collect: the reference returns the UNCAPPED concept set
    # (graph_retriever.py:323) but only ever expands max_expand of them
    # (:256-262); against a web-scale node vocabulary an uncapped set is an
    # unbounded driver collect, so we return exactly the expansion set —
    # the same (priority, concept) order the expansion itself uses.
    entity_rows = concepts.orderBy("priority", "concept").limit(max_expand).collect()
    return {
        "chunks": chunk_rows,
        "graph_context": graph_context,
        "graph_entities": sorted(r["concept"] for r in entity_rows),
        "graph_triples": triples,
        "combined_context": format_context(triples, chunk_rows, max_context_chars),
    }


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
    # The reference's seen-set key is (concept, relation, neighbor) (:277);
    # its first-encounter row wins, and out-edges are encountered first.
    # row_number (not dropDuplicates) keeps that choice deterministic.
    wdup = Window.partitionBy("concept", "predicate", "nb").orderBy(
        "dir_ord", "subject", "object"
    )
    nb = (
        out_n.unionByName(in_n)
        .withColumn("_dup", F.row_number().over(wdup))
        .filter(F.col("_dup") == 1)
        .drop("_dup")
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
