"""Random-walk corpus generation and label-propagation communities.

Representation-learning front-end the reference stops short of (its graph
surface ends at visualization communities, src/knowledge_graph/
visualization.py:165-205): a KG built from web crawls feeds node-embedding
training (DeepWalk, Perozzi et al., KDD 2014 / node2vec, Grover & Leskovec,
KDD 2016) with walk corpora, and schema-free clustering with label
propagation (Raghavan et al., Phys. Rev. E 2007).

Determinism contract (the whole module is oracle-replayable):

* :func:`random_walks` — the "random" neighbor choice at node ``u`` on step
  ``t`` is ``argmin over out-neighbors v of md5(u, t, v)`` — a fixed hash
  ordering, so the walk corpus is a pure function of the edge set. One
  hash equi-join on the current node plus one map-side-combinable
  ``min_by`` per step; frontier size never exceeds the start-node count.
* :func:`lpa_communities` — SYNCHRONOUS label propagation with the
  deterministic tie-break (max neighbor-label count, then lexicographically
  smallest label). Each round is one join on the undirected neighbor list
  plus two hash aggregations — the (node,label) count combines map-side,
  and the winner is a ``min_by`` over ``struct(-count, label)``, never a
  window over an unbounded partition. The degree%8 / LPA community
  surface in graph/centrality.py stays the visualization path; this is
  the oracle-gated analytics twin.

Scale notes (100 TB bar): both operators are a constant number of
shuffles per step/round, all keyed on node ids; payloads are (node,
string) pairs. No collects, no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def random_walks(
    edges: DataFrame,
    steps: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(start, step, node): one deterministic walk of ``steps`` hops from
    every distinct source node over the distinct directed edge set.

    Step rule: at node ``u`` on step ``t`` move to the out-neighbor ``v``
    minimizing ``md5(u <US> t <US> v)`` (US = chr(31)). Walks that reach a
    sink stop early (rows simply end); step 0 is the start node itself.
    """
    e = (
        edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        e.select(F.col("e_src").alias("start"))
        .distinct()
        .select("start", F.lit(0).alias("step"), F.col("start").alias("node"))
        .localCheckpoint(eager=True)
    )
    out = frontier
    for t in range(1, steps + 1):
        key = F.md5(
            F.concat_ws(_SEP, F.col("node"), F.lit(str(t)), F.col("e_dst"))
        )
        frontier = (
            frontier.join(e, frontier.node == e.e_src)
            .groupBy("start")
            .agg(F.min_by("e_dst", key).alias("node"))
            .select("start", F.lit(t).alias("step"), "node")
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(frontier)
    return out


def lpa_communities(
    edges: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, label): synchronous label propagation over the undirected
    simple graph induced by ``edges``, ``rounds`` full rounds.

    Init: every node labeled with itself. Round: each node adopts the most
    frequent label among its neighbors' PREVIOUS-round labels; ties break
    to the lexicographically smallest label. Isolated nodes cannot occur
    (every node in the edge set has a neighbor by construction).
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        labels = (
            und.join(labels, und.b == labels.node)
            .groupBy(F.col("a").alias("n"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(F.col("n").alias("node"))
            .agg(
                F.min_by(
                    "label", F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    return labels
