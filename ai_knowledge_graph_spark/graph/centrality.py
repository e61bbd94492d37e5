"""Centrality & community operators (SURVEY §2.9 G5-G9).

The reference computes these single-node for visualization sizing
(visualization.py:165-205): degree, exact betweenness, eigenvector power
iteration, Louvain with a degree%8 fallback. Here:

  degree_centrality      -> hash agg (G5/A6)
  eigenvector_centrality -> driver-orchestrated power iteration over the edge
                            table (G7) — normalized per iteration, fixed
                            rounds, checkpointed lineage
  label_propagation      -> community detection via iterative
                            majority-neighbor label adoption (the distributed
                            stand-in for Louvain, G8); deterministic
                            tie-breaks (min label)
  degree_mod_communities -> the reference's literal fallback ``degree % 8``
                            (visualization.py:196-205)
  betweenness is exact-O(V·E) by definition (Brandes); the engine exposes a
  sampled-source approximation: BFS fan-out from k seed nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degree_centrality(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.explode(F.array("src", "dst")).alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def eigenvector_centrality(
    edges: DataFrame, iterations: int = 20, tol: float = 1e-6
) -> DataFrame:
    """Power iteration on the undirected adjacency (nx parity: undirected view
    of score flow; reference uses nx.eigenvector_centrality on the DiGraph —
    which itself uses in-edges; we follow in-edge semantics)."""
    und = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    und = und.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scores = nodes.select("entity", F.lit(1.0).alias("score"))
    for _ in range(iterations):
        contrib = (
            und.join(scores, und.a == scores.entity)
            .select(F.col("b").alias("entity"), "score")
            .groupBy("entity")
            .agg(F.sum("score").alias("in_score"))
        )
        new = nodes.join(contrib, "entity", "left").select(
            "entity", F.coalesce("in_score", F.lit(0.0)).alias("score")
        )
        norm = new.agg(F.sqrt(F.sum(F.col("score") ** 2)).alias("n")).collect()[0]["n"]
        if not norm:
            break
        new = new.select("entity", (F.col("score") / F.lit(norm)).alias("score"))
        new = new.localCheckpoint(eager=True)
        scores = new
    return scores


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    """(entity, pagerank): fixed-iteration PageRank over the directed edge
    multiset (parallel edges count as extra weight, matching a KG where two
    predicates between the same pair mean a stronger link).

    Per iteration: one equi-join rank×edges on src (the out-degree is folded
    onto the edge table ONCE before the loop — it is constant, so joining it
    every round was a wasted exchange), one hash agg on dst, and a left join
    back onto the node set so sinks keep receiving teleport mass. The
    dangling mass rides IN-PLAN as a broadcast scalar (ranks carry a constant
    ``dang`` flag, so the mass is a filter+agg over the checkpointed rank
    table — no per-round ``.first()`` driver job; one Spark job per
    iteration instead of two). Each round is localCheckpoint'd to cut the
    lineage — plan depth stays O(1) per iteration, and the rank table is
    (node, double, bool), the minimal shuffle payload. Dangling mass is
    redistributed uniformly (standard formulation), so ranks sum to 1 every
    round.

    ``broadcast_max_rows``: when the node count is below this, the rank table
    is broadcast into the edge join (checkpointed tables carry no size stats,
    so Spark would otherwise plan a full shuffle of the edge table EVERY
    round). Above it, the shuffled join plan is kept — at web scale a rank
    table does not fit an executor. Scale-adaptive per guide §2/§3: derived
    from the measured node count, not a constant tuned to one corpus size.

    Not in the reference (its centrality surface is visualization.py:165-205);
    included because link-graph PageRank is the canonical web-corpus quality
    prior a Common-Crawl pipeline feeds into document scoring.
    """
    e = edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
    e = e.localCheckpoint(eager=True)
    outdeg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Constants across iterations, one checkpoint job each: the node table
    # carries its dangling flag from the start (no separate marked table),
    # edges carry the src out-degree.
    marked = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .join(outdeg, F.col("node") == outdeg.e_src, "left")
        .select("node", F.col("outdeg").isNull().alias("dang"))
        .localCheckpoint(eager=True)
    )
    n = marked.count()
    if n == 0:
        return marked.select(
            F.col("node").alias("entity"), F.lit(0.0).alias("pagerank")
        )
    small = n <= broadcast_max_rows
    ew = e.join(outdeg, "e_src").localCheckpoint(eager=True)
    ranks = marked.select("node", F.lit(1.0 / n).alias("pr"), "dang")
    for _ in range(iterations):
        rb = F.broadcast(ranks) if small else ranks
        contrib = (
            ew.join(rb, ew.e_src == rb.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("in_mass"))
        )
        if small:
            contrib = F.broadcast(contrib)
        # Scalar dangling mass as a 1-row broadcast: same aggregate as the
        # old per-round driver collect, evaluated inside the iteration job.
        dmass = F.broadcast(
            ranks.filter(F.col("dang")).agg(F.sum("pr").alias("_dm"))
        )
        ranks = (
            marked.join(contrib, "node", "left")
            .crossJoin(dmass)
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce("in_mass", F.lit(0.0))
                        + F.coalesce(F.col("_dm"), F.lit(0.0)) / F.lit(float(n))
                    )
                ).alias("pr"),
                "dang",
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("node").alias("entity"), F.col("pr").alias("pagerank"))


def label_propagation_communities(
    edges: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(entity, community): deterministic hub-attraction label propagation.

    Classic synchronous LPA oscillates on symmetric structures (a star flips
    hub/spoke labels forever) and async LPA is nondeterministic. This variant
    is both convergent and deterministic: every node attaches to its
    dominating neighbor — the max by (degree, node id) among neighbors that
    strictly dominate the node itself — forming a forest rooted at local
    degree maxima; root labels then propagate down with pointer jumping
    (O(log depth) rounds). Communities = attraction trees, the same
    hubs-absorb-spokes intuition Louvain's first level captures.
    """
    from ..operators.components import node_id

    und0 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    und = (
        und0.unionByName(und0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .select(node_id(F.col("a")).alias("a"), node_id(F.col("b")).alias("b"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .select("entity", node_id(F.col("entity")).alias("node"))
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))

    ranked = und.join(deg.withColumnRenamed("a", "b").withColumnRenamed("deg", "bdeg"), "b").join(
        deg.withColumnRenamed("deg", "adeg"), "a"
    )
    dominating = ranked.filter(
        (F.col("bdeg") > F.col("adeg"))
        | ((F.col("bdeg") == F.col("adeg")) & (F.col("b") > F.col("a")))
    )
    w = Window.partitionBy("a").orderBy(F.desc("bdeg"), F.desc("b"))
    parent = (
        dominating.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("a").alias("node"), F.col("b").alias("parent"))
    )
    labels = (
        nodes.join(parent, "node", "left")
        .select("node", F.coalesce("parent", "node").alias("label"))
        .localCheckpoint(eager=True)
    )
    # pointer jumping to the root
    for _ in range(max_iterations):
        up = labels.select(F.col("node").alias("jn"), F.col("label").alias("jl"))
        new = (
            labels.join(up, labels.label == up.jn, "left")
            .select("node", F.coalesce("jl", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return nodes.join(labels, "node").select("entity", F.col("label").alias("community"))


def degree_mod_communities(edges: DataFrame, k: int = 8) -> DataFrame:
    """The reference's Louvain fallback: community = degree % k
    (visualization.py:196-205)."""
    return degree_centrality(edges).select(
        "entity", (F.col("degree") % F.lit(k)).alias("community")
    )


def approx_betweenness(
    edges: DataFrame, sample_sources: int = 8, max_hops: int = 6
) -> DataFrame:
    """Sampled-source betweenness proxy: how often a node sits on a BFS
    shortest-path tree edge from k deterministic seed sources (lowest entity
    names). Exact Brandes is O(V·E) and driver-side by nature; this is the
    distributed approximation for sizing/ranking use (viz-only in the
    reference)."""
    und0 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    und = (
        und0.unionByName(und0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sources = [
        r["entity"]
        for r in (
            edges.select(F.col("src").alias("entity"))
            .unionByName(edges.select(F.col("dst").alias("entity")))
            .distinct()
            .orderBy("entity")
            .limit(sample_sources)
            .collect()
        )
    ]
    spark = edges.sparkSession
    counts = None
    for src in sources:
        visited = spark.createDataFrame([(src,)], ["entity"])
        frontier = visited
        hops = 0
        mids = None
        while hops < max_hops:
            nxt = (
                und.join(frontier, und.a == frontier.entity)
                .select(F.col("b").alias("entity"))
                .distinct()
                .join(visited, "entity", "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            # interior nodes of the BFS tree = previous frontier (non-source)
            if hops > 0:
                mids = frontier if mids is None else mids.unionByName(frontier)
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
            hops += 1
        if mids is not None:
            c = mids.groupBy("entity").agg(F.count(F.lit(1)).alias("on_path"))
            counts = c if counts is None else counts.unionByName(c)
    if counts is None:
        return spark.createDataFrame([], "entity string, betweenness double")
    return counts.groupBy("entity").agg(
        (F.sum("on_path") / F.lit(len(sources))).alias("betweenness")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(entity, triangles, clustering): per-node triangle count and local
    clustering coefficient over the UNDIRECTED simple graph (parallel edges,
    direction, and self-loops collapsed — nx.triangles semantics; the
    reference computes no triangle metric, this extends §2.9 the same way
    pagerank does).

    Skew-bounded degree orientation (the standard distributed scheme): every
    undirected edge is oriented from its lower-(degree, id) endpoint to the
    higher one, so each wedge-join key's fan-out is bounded by the oriented
    out-degree — O(sqrt(m)) for any graph, independent of hub size. Wedges
    (a->b, a->c) then equi-join against the oriented edge (b->c); each
    triangle is found exactly once. Three hash shuffles total (degree,
    wedge self-join, closing-edge join); no windows, no driver loops.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("entity").alias("a"), F.col("degree").alias("_dega"))
    db = deg.select(F.col("entity").alias("b"), F.col("degree").alias("_degb"))
    # orient low (degree, id) -> high (degree, id); total order so exactly
    # one direction per edge
    lo_first = (F.col("_dega") < F.col("_degb")) | (
        (F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
        .localCheckpoint(eager=True)
    )
    w1 = oriented.select(F.col("lo"), F.col("hi").alias("x"))
    w2 = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "lo").filter(F.col("x") < F.col("y"))
    # close the wedge: (x, y) must be an oriented edge in EITHER direction
    closing = oriented.select(
        F.least("lo", "hi").alias("x"), F.greatest("lo", "hi").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"]).select(
        F.col("lo").alias("v1"), F.col("x").alias("v2"), F.col("y").alias("v3")
    )
    per_node = (
        tris.select(F.explode(F.array("v1", "v2", "v3")).alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, "entity", "left")
        .select(
            "entity",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(entity, hub, authority): fixed-iteration HITS (Kleinberg) over the
    directed edge multiset, L1-normalized each half-step.

    The classic web-graph companion to :func:`pagerank` (the reference has
    neither; its centrality surface is visualization.py:165-205): hubs
    point at good authorities, authorities are pointed at by good hubs.
    Per iteration: authority = L1-normalized in-sum of hub scores, then
    hub = L1-normalized out-sum of the NEW authority scores — the standard
    update order, matching networkx.hits with one synchronous sweep.

    Plan shape per iteration: two equi-joins score×edges + two hash aggs
    (map-side combined) + two scalar L1 norms (a single driver double each,
    same shape as pagerank's dangling-mass reduce). Score tables stay
    (node, double) — the minimal shuffle payload; each round is
    localCheckpoint'd so plan depth stays O(1) per iteration.
    """
    e = edges.select(
        F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col("node").alias("entity"),
            F.lit(0.0).alias("hub"),
            F.lit(0.0).alias("authority"),
        )
    small = n <= 2_000_000
    hub = nodes.select("node", F.lit(1.0 / n).alias("s"))
    auth = hub

    def _norm_div(scored):
        # L1 norm as a 1-row broadcast scalar folded into the half-step's
        # checkpoint job (was a per-half-step .first() driver job); the
        # `or 1.0` zero/None guard is mirrored in-plan.
        norm = F.broadcast(scored.agg(F.sum("s").alias("_nm")))
        guarded = F.when(
            F.col("_nm").isNull() | (F.col("_nm") == 0.0), F.lit(1.0)
        ).otherwise(F.col("_nm"))
        return scored.crossJoin(norm).select(
            "node", (F.col("s") / guarded).alias("s")
        )

    for _ in range(iterations):
        hb = F.broadcast(hub) if small else hub
        in_sum = (
            e.join(hb, e.e_src == hb.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum("s").alias("_m"))
        )
        auth = nodes.join(
            F.broadcast(in_sum) if small else in_sum, "node", "left"
        ).select("node", F.coalesce("_m", F.lit(0.0)).alias("s"))
        auth = _norm_div(auth).localCheckpoint(eager=True)
        ab = F.broadcast(auth) if small else auth
        out_sum = (
            e.join(ab, e.e_dst == ab.node)
            .groupBy(F.col("e_src").alias("node"))
            .agg(F.sum("s").alias("_m"))
        )
        hub = nodes.join(
            F.broadcast(out_sum) if small else out_sum, "node", "left"
        ).select("node", F.coalesce("_m", F.lit(0.0)).alias("s"))
        hub = _norm_div(hub).localCheckpoint(eager=True)
    return (
        hub.withColumnRenamed("s", "hub")
        .join(auth.withColumnRenamed("s", "authority"), "node")
        .select(F.col("node").alias("entity"), "hub", "authority")
    )


def k_core(
    edges: DataFrame, k: int = 3, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(entity, core_degree): the k-core of the UNDIRECTED simple graph —
    the maximal subgraph where every node has degree >= k — by iterative
    peeling (drop all nodes with degree < k, recompute, repeat to
    fixpoint). The standard dense-subgraph primitive for web/link graphs
    (spam farms and boilerplate hubs concentrate in high cores); not in the
    reference (§2.9 extension, same basis as pagerank/triangles).

    Each peel round: one map-side-combined degree agg + two broadcast-or-
    hash semi-joins against the surviving node set + one driver-side count
    (the fixpoint test — a scalar, same shape as pagerank's dangling
    reduce). Rounds are localCheckpoint'd so plan depth stays O(1); the
    number of rounds is bounded by the graph's degeneracy ordering depth,
    typically single-digit for web-shaped graphs.
    """
    und = (
        edges.select(
            F.least(src_col, dst_col).alias("a"),
            F.greatest(src_col, dst_col).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    while True:
        deg = (
            und.select(F.explode(F.array("a", "b")).alias("entity"))
            .groupBy("entity")
            .agg(F.count(F.lit(1)).alias("core_degree"))
            .localCheckpoint(eager=True)
        )
        keep = deg.filter(F.col("core_degree") >= k)
        n_keep = keep.count()
        if n_keep == deg.count():
            return keep
        # Surviving-node set is ≤ the node count: broadcast it into both
        # semi-joins when it fits (the peel then never shuffles the edge
        # table, only rewrites it in place per round).
        kn = keep.select(F.col("entity"))
        if n_keep <= 2_000_000:
            kn = F.broadcast(kn)
        und = (
            und.join(kn.withColumnRenamed("entity", "a"), "a", "left_semi")
            .join(kn.withColumnRenamed("entity", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """(entity, pagerank): personalized PageRank — teleport restricted to
    the ``seeds`` node set (TrustRank, Gyongyi et al. 2004, when seeds are
    trusted pages). The standard seed-propagation quality prior of a web
    corpus: mass flows outward from the trusted set, so spam farms that
    inflate vanilla PageRank via link exchanges score near zero unless
    they are reachable from trust.

        pr_v = (1-d)*t_v + d*(in_mass_v + dangling_mass*t_v)

    with t_v = 1/|S| on seed nodes present in the graph, else 0 (dangling
    mass teleports back to the seeds — mass stays on the trust-reachable
    set and ranks sum to 1 every round). Same plan shape per iteration as
    :func:`pagerank` (one equi-join, one map-side-combined agg, one scalar
    dangling reduce, localCheckpoint per round); the teleport column rides
    the node table, adding nothing to the shuffle payload.

    Raises ValueError if no seed occurs in the graph (the fixpoint would
    be identically zero).
    """
    e = edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
    )
    marked = nodes.join(
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("_s", F.lit(1.0)),
        "node",
        "left",
    ).localCheckpoint(eager=True)
    n_seed = marked.filter(F.col("_s").isNotNull()).count()
    if n_seed == 0:
        raise ValueError("personalized_pagerank: no seed occurs in the graph")
    outdeg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Constants across iterations, materialized once: edges with src
    # out-degree folded on, node table with teleport weight + dangling flag.
    ew = e.join(outdeg, "e_src").localCheckpoint(eager=True)
    nodes_t = (
        marked.join(outdeg, marked.node == outdeg.e_src, "left")
        .select(
            "node",
            (F.coalesce("_s", F.lit(0.0)) / F.lit(float(n_seed))).alias("t"),
            F.col("outdeg").isNull().alias("dang"),
        )
        .localCheckpoint(eager=True)
    )
    small = nodes_t.count() <= 2_000_000
    ranks = nodes_t.select("node", F.col("t").alias("pr"), "t", "dang")
    for _ in range(iterations):
        rb = F.broadcast(ranks) if small else ranks
        contrib = (
            ew.join(rb, ew.e_src == rb.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("in_mass"))
        )
        if small:
            contrib = F.broadcast(contrib)
        # Dangling mass in-plan (ranks carry the constant flag): one Spark
        # job per iteration instead of a checkpoint + a driver .first().
        dmass = F.broadcast(
            ranks.filter(F.col("dang")).agg(F.sum("pr").alias("_dm"))
        )
        ranks = (
            nodes_t.join(contrib, "node", "left")
            .crossJoin(dmass)
            .select(
                "node",
                (
                    F.lit(1.0 - damping) * F.col("t")
                    + F.lit(damping)
                    * (
                        F.coalesce("in_mass", F.lit(0.0))
                        + F.coalesce(F.col("_dm"), F.lit(0.0)) * F.col("t")
                    )
                ).alias("pr"),
                "t",
                "dang",
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("node").alias("entity"), F.col("pr").alias("pagerank"))


def seed_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(entity, ppr): fixed-iteration personalized PageRank — teleport mass
    goes ONLY to ``seeds`` (node column: ``node``), so scores measure
    relevance-to-the-seed-set rather than global importance (the standard
    KG entity-relevance / related-entity primitive; Haveliwala 2002's
    topic-sensitive PageRank with a hard seed distribution).

    Same per-iteration plan as :func:`pagerank` (one src equi-join, one
    dst hash agg, one scalar dangling reduce, one node-set left join,
    per-round localCheckpoint); the only differences are the initial
    vector (uniform over seeds) and the teleport term (seeds-only, also
    absorbing the dangling mass). Non-seed nodes unreachable from the
    seeds keep exactly 0.0.
    """
    e = edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sd = (
        seeds.select(F.col("node"))
        .distinct()
        .join(nodes, "node", "left_semi")
        .select("node", F.lit(True).alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    s = sd.count()
    if s == 0:
        return nodes.select(F.col("node").alias("entity"), F.lit(0.0).alias("ppr"))
    outdeg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("outdeg"))
    # Constants across iterations, materialized once: edges with src
    # out-degree folded on, node table with seed + dangling flags.
    ew = e.join(outdeg, "e_src").localCheckpoint(eager=True)
    marked = (
        nodes.join(sd, "node", "left")
        .join(outdeg, nodes.node == outdeg.e_src, "left")
        .select("node", "is_seed", F.col("outdeg").isNull().alias("dang"))
        .localCheckpoint(eager=True)
    )
    small = marked.count() <= 2_000_000
    ranks = marked.select(
        "node",
        F.when(F.col("is_seed"), F.lit(1.0 / s)).otherwise(F.lit(0.0)).alias("pr"),
        "is_seed",
        "dang",
    )
    for _ in range(iterations):
        rb = F.broadcast(ranks) if small else ranks
        contrib = (
            ew.join(rb, ew.e_src == rb.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("in_mass"))
        )
        if small:
            contrib = F.broadcast(contrib)
        dmass = F.broadcast(
            ranks.filter(F.col("dang")).agg(F.sum("pr").alias("_dm"))
        )
        # teleport share per seed, same exact op order as the SQL oracle's
        # term-for-term mirror — now evaluated in-plan from the broadcast
        # dangling scalar (one Spark job per iteration instead of two)
        t = (
            F.lit(1.0 - damping)
            + F.lit(damping) * F.coalesce(F.col("_dm"), F.lit(0.0))
        ) / F.lit(float(s))
        ranks = (
            marked.join(contrib, "node", "left")
            .crossJoin(dmass)
            .select(
                "node",
                (
                    F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                    + F.when(F.col("is_seed"), t).otherwise(F.lit(0.0))
                ).alias("pr"),
                "is_seed",
                "dang",
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("node").alias("entity"), F.col("pr").alias("ppr"))


def katz_centrality(
    edges: DataFrame,
    iterations: int = 5,
    alpha_inv: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(entity, katz_micro): fixed-iteration Katz centrality (Katz 1953)
    — x' = beta + alpha * A^T x with beta = 1 and alpha = 1/alpha_inv —
    the path-counting prestige measure that, unlike PageRank, does not
    normalize by out-degree (a page linked by one prolific hub scores
    as high as one linked by a careful curator; useful as a CONTRAST
    feature next to pagerank in a link-quality ensemble).

    The recursion runs entirely in int64 micro-units: x0 = 0,
    x' = 1e6 + (sum of in-neighbor x) DIV alpha_inv — integer
    truncation both ends, bit-exact on replay. Magnitude bound:
    after k rounds x <= 1e6 * sum((d_max/alpha_inv)^j, j<=k), so with
    the default alpha_inv=10 the int64 budget holds to hub in-degrees
    of ~450 at 5 rounds; raise alpha_inv for hubbier graphs.
    Per-iteration plan is pagerank's: one equi-join on src, one
    map-side-combined agg on dst, per-round localCheckpoint; payload
    (node, long).
    """
    e = edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    small = nodes.count() <= 2_000_000
    ranks = nodes.select("node", F.lit(0).cast("long").alias("x"))
    for r in range(iterations):
        rb = F.broadcast(ranks) if small else ranks
        mass = (
            e.join(rb, e.e_src == rb.node)
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum("x").alias("m"))
        )
        ranks = nodes.join(
            F.broadcast(mass) if small else mass, "node", "left"
        ).select(
            "node",
            F.expr(
                f"1000000 + coalesce(m, 0L) DIV {alpha_inv}"
            ).cast("long").alias("x"),
        )
        # single consumer per round: chain lazily, checkpoint periodically
        if (r + 1) % 3 == 0 and (r + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        F.col("node").alias("entity"), F.col("x").alias("katz_micro")
    )
