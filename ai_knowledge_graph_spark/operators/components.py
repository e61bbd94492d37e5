"""Connected components (G1) — iterative star contraction over DataFrames.

The reference finds components with a recursive DFS that rescans every node
for in-edges on each visit — O(V·E), single-threaded
(entity_standardization.py:273-312). Here: **star contraction** — each round
every node adopts ``min(self, min(neighbors))`` as its label, the edge set is
rewritten through the label map (contracting merged stars) and self-loops are
dropped. Components shrink geometrically: O(log n) rounds expected, verified
experimentally (a 200-node path converges in ~8 rounds where plain label
propagation still had 9 labels after 12).

Skew notes: the per-node min is a hash aggregate with map-side partial
combine, so a giant component's hub does NOT funnel raw edges through one
reducer; the contraction joins are equi-joins on node id where AQE skew-join
splitting handles hot keys; each round is localCheckpoint'd (driver-
orchestrated fixpoint, lineage cut per iteration).

IDs are xxhash64 of the entity string — deterministic, no global sort. At
10^12-entity scale 64 bits risks collisions; production widens to 128 bits
(two xxhash64 columns with different seeds). Component ids are representative
node ids (consistent within a component; not guaranteed to be the min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_id(col):
    """Deterministic 64-bit node id for an entity string."""
    return F.xxhash64(col)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(src, dst) string edges -> (entity, node, component_id).

    Undirected reachability, matching the reference DFS that follows both
    edge directions (entity_standardization.py:296-303).
    """
    pairs = edges.select(
        node_id(F.col(src)).alias("a"), node_id(F.col(dst)).alias("b")
    ).filter(F.col("a") != F.col("b"))
    e = (
        pairs.unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    nodes = (
        edges.select(F.col(src).alias("entity"))
        .unionByName(edges.select(F.col(dst).alias("entity")))
        .distinct()
        .select("entity", node_id(F.col("entity")).alias("node"))
        .localCheckpoint(eager=True)
    )

    assign = nodes.select("node", F.col("node").alias("comp"))

    for _ in range(max_iterations):
        if e.isEmpty():
            break
        # Label = min(self, min(neighbors)); e holds both directions, so the
        # groupBy sees the full neighborhood.
        label = (
            e.groupBy("a")
            .agg(F.min("b").alias("m"))
            .select(F.col("a").alias("lnode"), F.least("a", "m").alias("label"))
            .localCheckpoint(eager=True)
        )
        # Compose into the assignment: representatives merge through label.
        assign = (
            assign.join(label, assign.comp == label.lnode, "left")
            .select("node", F.coalesce("label", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        # Contract the edge set through the label map.
        la = label.select(F.col("lnode").alias("a"), F.col("label").alias("alab"))
        lb = label.select(F.col("lnode").alias("b"), F.col("label").alias("blab"))
        e = (
            e.join(la, "a")
            .join(lb, "b")
            .select(F.col("alab").alias("a"), F.col("blab").alias("b"))
            .filter(F.col("a") != F.col("b"))
        )
        e = (
            e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )

    return nodes.join(assign, "node").select("entity", "node", F.col("comp").alias("component_id"))


def components_for_triples(triples: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Component per entity for a triple table (subjects ∪ objects)."""
    edges = triples.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return connected_components(edges, max_iterations=max_iterations)
