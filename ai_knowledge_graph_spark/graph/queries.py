"""Graph query layer over the materialized nodes/edges tables.

Each function re-expresses an ``ICTGraphStore`` query (reference
graph_store.py) as a DataFrame expression over the bucketed tables — point
lookups prune to one bucket, BFS expansions are iterative joins driven from
the driver (frontier stays a DataFrame; no collect of edge data).

Reference parity map:
  neighbors           <- get_neighbors          (graph_store.py:392-434, J7)
  k_hop_neighborhood  <- get_neighborhood       (:436-456, J8/G3)
  shortest_path       <- find_path              (:458-468, J9/G4)
  path_with_relations <- find_path_with_relations (:470-498)
  search              <- search                 (:567-592, W4)
  relation_histogram  <- get_all_relation_types (:560-565, A3)
  degree_centrality   <- G.degree()             (visualization.py:171, G5/A6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def neighbors(
    edges: DataFrame,
    node: str,
    relation: str | None = None,
    direction: str = "both",
) -> DataFrame:
    """Out-/in-edges of ``node`` -> (node, relation, direction).

    The src/dst equality predicates push down into the bucketed scan.
    """
    parts = []
    if direction in ("out", "both"):
        out = edges.filter(F.col("src") == node).select(
            F.col("dst").alias("node"),
            F.col("relation"),
            F.lit("out").alias("direction"),
        )
        parts.append(out)
    if direction in ("in", "both"):
        inn = edges.filter(F.col("dst") == node).select(
            F.col("src").alias("node"),
            F.col("relation"),
            F.lit("in").alias("direction"),
        )
        parts.append(inn)
    result = parts[0]
    for p in parts[1:]:
        result = result.unionByName(p)
    if relation is not None:
        result = result.filter(F.col("relation") == relation)
    return result


def _undirected(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    return fwd.unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()


def k_hop_neighborhood(edges: DataFrame, node: str, hops: int = 2) -> DataFrame:
    """Entities within ``hops`` undirected hops -> (entity, hop).

    Driver-orchestrated frontier expansion: ``hops`` is small by construction
    (reference default 2), each step one equi-join on the frontier.
    """
    und = _undirected(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame([(node, 0)], ["entity", "hop"])
    frontier = visited.select("entity")
    for h in range(1, hops + 1):
        nxt = (
            und.join(frontier, und.a == frontier.entity)
            .select(F.col("b").alias("entity"))
            .distinct()
            .join(visited.select("entity"), "entity", "left_anti")
            .withColumn("hop", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("entity")
    return visited


def shortest_path(
    edges: DataFrame, source: str, target: str, max_hops: int = 10
) -> list[str]:
    """BFS shortest path, directed first, undirected fallback — mirroring
    nx.shortest_path then to_undirected (graph_store.py:458-468). Returns the
    node list ([] if unreachable). Path reconstruction rides a path-array
    column on the frontier; ties broken lexicographically for determinism
    (networkx returns an arbitrary shortest path)."""
    for directed in (True, False):
        path = _bfs_path(edges, source, target, directed, max_hops)
        if path:
            return path
    return []


def _bfs_path(
    edges: DataFrame, source: str, target: str, directed: bool, max_hops: int
) -> list[str]:
    rel = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    if not directed:
        rel = rel.unionByName(
            edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
    rel = rel.distinct().localCheckpoint(eager=True)
    spark = edges.sparkSession

    frontier = spark.createDataFrame(
        [(source, [source])], "entity string, path array<string>"
    )
    visited = frontier.select("entity")
    for _ in range(max_hops):
        hit = frontier.filter(F.col("entity") == target).orderBy("path").take(1)
        if hit:
            return list(hit[0]["path"])
        expanded = (
            rel.join(frontier, rel.a == frontier.entity)
            .select(F.col("b").alias("entity"), F.array_append("path", F.col("b")).alias("path"))
            .join(visited, "entity", "left_anti")
        )
        # One (lexicographically-least) path per newly reached node.
        w = Window.partitionBy("entity").orderBy("path")
        frontier = (
            expanded.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            return []
        visited = visited.unionByName(frontier.select("entity")).localCheckpoint(
            eager=True
        )
    return []


def path_with_relations(
    edges: DataFrame, source: str, target: str, max_hops: int = 10
) -> DataFrame:
    """(from, to, relation, reversed) per path step (graph_store.py:470-498).

    Like the reference, forward edges are preferred and the reverse edge is
    consulted only when no forward edge exists for a step; the 'first edge'
    of a multi-edge is replaced by the lexicographically-least relation."""
    spark = edges.sparkSession
    path = shortest_path(edges, source, target, max_hops)
    schema = "step int, src string, dst string"
    if len(path) < 2:
        steps = spark.createDataFrame([], schema)
    else:
        steps = spark.createDataFrame(
            [(i, path[i], path[i + 1]) for i in range(len(path) - 1)], schema
        )
    fwd = edges.groupBy("src", "dst").agg(F.min("relation").alias("fwd_rel"))
    rev = edges.groupBy("src", "dst").agg(F.min("relation").alias("rev_rel"))
    return (
        steps.join(fwd, ["src", "dst"], "left")
        .join(
            rev,
            (steps.src == rev.dst) & (steps.dst == rev.src),
            "left",
        )
        .select(
            "step",
            F.when(F.col("fwd_rel").isNotNull(), steps.src).otherwise(steps.dst).alias("from"),
            F.when(F.col("fwd_rel").isNotNull(), steps.dst).otherwise(steps.src).alias("to"),
            F.coalesce("fwd_rel", "rev_rel").alias("relation"),
            F.col("fwd_rel").isNull().alias("reversed"),
        )
        .orderBy("step")
    )


def search(nodes: DataFrame, query: str, top_k: int = 20) -> DataFrame:
    """Text search over node names (graph_store.py:567-592): +10 contains,
    +50 exact; rank by (-score, -degree); deterministic entity tiebreak."""
    q = query.lower()
    scored = nodes.select(
        "entity",
        "degree",
        (
            F.when(F.col("entity").contains(q), F.lit(10)).otherwise(F.lit(0))
            + F.when(F.col("entity") == q, F.lit(50)).otherwise(F.lit(0))
        ).alias("score"),
    ).filter(F.col("score") > 0)
    return scored.orderBy(
        F.desc("score"), F.desc("degree"), F.asc("entity")
    ).limit(top_k)


def relation_histogram(edges: DataFrame) -> DataFrame:
    """Edge-relation counts (graph_store.py:560-565)."""
    return edges.groupBy("relation").agg(F.count(F.lit(1)).alias("cnt"))


def models_for_pattern(
    edges: DataFrame, nodes: DataFrame, pattern: str
) -> DataFrame:
    """J10 (graph_store.get_models_for_pattern:500-525): models whose edges
    touch ``pattern``, i.e. edges with one endpoint of node_type='model' and
    the other equal to the pattern node. Broadcast the (small) model-node
    dim against the edge fact table."""
    models = F.broadcast(
        nodes.filter(F.col("node_type") == "model").select(
            F.col("entity").alias("model")
        )
    )
    out_side = (
        edges.filter(F.col("dst") == pattern)
        .join(models, edges["src"] == models["model"])
        .select("model", "relation")
    )
    in_side = (
        edges.filter(F.col("src") == pattern)
        .join(models, edges["dst"] == models["model"])
        .select("model", "relation")
    )
    return out_side.unionByName(in_side).distinct()


def related_concepts(edges: DataFrame, concept: str, max_hops: int = 2) -> DataFrame:
    """graph_store.get_related_concepts (:527-545): 1-hop neighbors grouped by
    relation, plus 2-hop neighbors keyed 'rel1→rel2' (excluding the source).
    Returns (relation_path, node) rows — the relational form of the dict of
    lists; distinct per (path, node) like the reference's de-dup append."""
    hop1 = neighbors(edges, concept).select(
        F.col("relation").alias("r1"), F.col("node").alias("n1")
    )
    out = hop1.select(F.col("r1").alias("relation_path"), F.col("n1").alias("node"))
    if max_hops >= 2:
        h1 = hop1.localCheckpoint(eager=True)
        e = edges.select("src", "dst", "relation")
        und = e.select(
            F.col("src").alias("a"), F.col("dst").alias("b"), "relation"
        ).unionByName(
            e.select(F.col("dst").alias("a"), F.col("src").alias("b"), "relation")
        )
        hop2 = (
            h1.join(und, h1["n1"] == und["a"])
            .filter(F.col("b") != concept)
            .select(
                F.concat(F.col("r1"), F.lit("→"), F.col("relation")).alias(
                    "relation_path"
                ),
                F.col("b").alias("node"),
            )
        )
        out = out.unionByName(hop2)
    return out.distinct()


def concept_definition(nodes: DataFrame, concept: str) -> DataFrame:
    """graph_store.get_concept_definition (:547-553): definition attr lookup
    — a partition-pruned point read on the nodes table."""
    return nodes.filter(F.col("entity") == concept).select("entity", "definition")


def nodes_by_type(nodes: DataFrame, node_type: str) -> DataFrame:
    """graph_store.get_nodes_by_type (:555-558)."""
    return nodes.filter(F.col("node_type") == node_type).select("entity")
