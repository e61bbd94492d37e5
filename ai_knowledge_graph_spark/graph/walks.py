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
    # Frontier never exceeds the start-node count; when that fits an executor
    # broadcast it into the step join so the (much larger, constant) edge
    # table is never shuffled — checkpointed tables carry no size stats, so
    # without the hint Spark re-shuffles e EVERY step. Above the threshold
    # the shuffled join plan is kept (web-scale node tables don't broadcast).
    small = frontier.count() <= 2_000_000
    out = frontier
    for t in range(1, steps + 1):
        key = F.md5(
            F.concat_ws(_SEP, F.col("node"), F.lit(str(t)), F.col("e_dst"))
        )
        fb = F.broadcast(frontier) if small else frontier
        frontier = (
            fb.join(e, fb.node == e.e_src)
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
    # Label table = one row per node; broadcast it into the round join when
    # it fits so the (constant, larger) undirected edge table is never
    # re-shuffled — without the hint the checkpointed label table has no
    # size stats and Spark shuffles BOTH sides every round.
    small = labels.count() <= 2_000_000
    for r in range(rounds):
        lb = F.broadcast(labels) if small else labels
        labels = (
            und.join(lb, und.b == lb.node)
            .groupBy(F.col("a").alias("n"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(F.col("n").alias("node"))
            .agg(
                F.min_by(
                    "label", F.struct((-F.col("c")).alias("nc"), F.col("label"))
                ).alias("label")
            )
        )
        # Each round's labels feed exactly ONE consumer (the next round), so
        # rounds chain lazily into one Spark job; a periodic checkpoint
        # bounds plan depth for large `rounds` without a barrier per round.
        if (r + 1) % 3 == 0 and (r + 1) < rounds:
            labels = labels.localCheckpoint(eager=True)
    return labels


def maximal_independent_set(
    edges: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, state): Luby-style maximal-independent-set election over the
    undirected simple graph, ``rounds`` synchronous rounds (Luby, SIAM J.
    Comput. 1986) — the classic parallel symmetry-breaking primitive
    (schedule non-conflicting entity-merge batches, pick cluster exemplars).

    Round ``r``: every still-active node draws the deterministic priority
    ``(md5(node <US> r), node)``; a node joins the MIS iff its priority is
    strictly smaller than every active neighbor's, then it and its
    neighbors leave the active set. The node id in the priority makes the
    order total, so no round can deadlock. States after ``rounds``:
    ``in`` (elected), ``out`` (dominated by an elected neighbor),
    ``undecided`` (ran out of rounds — Luby needs O(log n) in expectation;
    fixed rounds keep the operator oracle-replayable).

    Plan shape per round: one join of the edge list onto the active set's
    priorities, one map-side-combinable min aggregation per node, one
    anti-join to shrink the active set. All shuffles are node-keyed.
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    active = (
        und.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    )
    decided = None
    for r in range(rounds):
        pri = active.select(
            "node",
            F.struct(
                F.md5(F.concat_ws(_SEP, F.col("node"), F.lit(str(r)))).alias("h"),
                F.col("node").alias("n"),
            ).alias("p"),
        ).localCheckpoint(eager=True)
        # smallest active-neighbor priority per active node
        nbr_min = (
            und.join(pri.select(F.col("node").alias("b"), F.col("p").alias("np")), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("np").alias("min_np"))
        )
        cand = pri.join(nbr_min, "node", "left")
        selected = cand.filter(
            F.col("min_np").isNull() | (F.col("p") < F.col("min_np"))
        ).select("node").localCheckpoint(eager=True)
        dominated = (
            und.join(selected.select(F.col("node").alias("a")), "a")
            .select(F.col("b").alias("node"))
            .distinct()
            .join(selected, "node", "left_anti")
            .join(active, "node", "left_semi")
            .localCheckpoint(eager=True)
        )
        batch = selected.withColumn("state", F.lit("in")).unionByName(
            dominated.withColumn("state", F.lit("out"))
        )
        decided = batch if decided is None else decided.unionByName(batch)
        active = (
            active.join(selected, "node", "left_anti")
            .join(dominated, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
    rest = active.withColumn("state", F.lit("undecided"))
    return rest if decided is None else decided.unionByName(rest)


def hyperball(
    edges: DataFrame,
    radius: int = 3,
    p: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, ball_size, n_zero_registers): HyperBall (Boldi & Vigna,
    arXiv 2013) — per-node HyperLogLog sketches of the out-reachable ball
    within ``radius`` hops, iterated by max-merging each node's sketch
    with its successors'. THE algorithm for neighborhood functions /
    centralities on web-scale graphs (it computed distance distributions
    on 3.5B-page crawls); exact BFS from every node is |V| frontiers,
    HyperBall is one (node, bucket)-keyed aggregation per hop.

    Registers are kept RELATIONALLY — (node, bucket, register) rows,
    absent bucket = 0 — so the merge is a plain groupBy().max() that
    combines map-side, and rho is exact integer arithmetic (the
    operators/sketches.py hll_build convention: 48-bit md5 prefix, top
    ``p`` bucket bits, rho = leading-zero count of the rest + 1, computed
    via binary-string length — no float log). The cardinality estimate
    mirrors hll_estimate: exact integer harmonic sum 2^(62-r) in
    decimal(38,0), one double division, standard linear-counting
    correction — so ``ball_size`` round(6)-hash-compares.

    Plan shape per hop: one hash join of the edge list onto the sketch
    (keyed on the successor) + one map-side-combinable max; sketch size
    is at most |V| * 2^p rows. At 10^12 edges this is the published
    HyperBall schema sharded by node.
    """
    m = 1 << p
    rest_bits = 48 - p
    e = (
        edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hb:"), F.col("node"))), 1, 12), 16, 10
    ).cast("bigint")
    rest = h % F.lit(1 << rest_bits)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits) - F.length(F.bin(rest)) + 1
    )
    sketch = nodes.select(
        "node",
        F.shiftright(h, rest_bits).alias("bucket"),
        rho.cast("int").alias("register"),
    ).localCheckpoint(eager=True)
    for _ in range(radius):
        succ = e.join(sketch, sketch.node == e.e_dst).select(
            F.col("e_src").alias("node"), "bucket", "register"
        )
        sketch = (
            sketch.unionByName(succ)
            .groupBy("node", "bucket")
            .agg(F.max("register").alias("register"))
            .localCheckpoint(eager=True)
        )
    term = F.expr(
        "shiftleft(cast(1 as bigint), cast(62 - register as int))"
    ).cast("decimal(38,0)")
    per = sketch.groupBy("node").agg(
        F.sum(term).alias("_s"),
        F.count(F.lit(1)).alias("_np"),
    )
    n_zero = (F.lit(m) - F.col("_np")).cast("long")
    s_full = F.col("_s") + n_zero.cast("decimal(38,0)") * F.lit(2**62).cast(
        "decimal(38,0)"
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (
        F.lit(alpha)
        * F.lit(float(m))
        * F.lit(float(m))
        * F.lit(float(2**62))
        / s_full.cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(raw)
    return per.select(
        "node",
        F.round(est, 6).alias("ball_size"),
        n_zero.alias("n_zero_registers"),
    )


def node2vec_walks(
    edges: DataFrame,
    steps: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(start, step, node): second-order (node2vec-style) deterministic
    walks — like :func:`random_walks` but NON-BACKTRACKING: at node ``u``
    with predecessor ``w``, neighbors ``v != w`` are preferred over
    returning to ``w`` (the p-parameter of Grover & Leskovec 2016 pushed
    to its deterministic limit: return only when it is the sole option).

    Choice key = ``('1' if v == prev else '0') || md5(u, t, v)`` — the
    backtrack flag dominates the hash order, so a non-backtracking
    neighbor always wins; among equals the md5 order decides. Same plan
    shape as random_walks (one equi-join + one min_by per step); the
    walk state additionally carries the predecessor, a constant-width
    column.
    """
    e = (
        edges.select(F.col(src_col).alias("e_src"), F.col(dst_col).alias("e_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        e.select(F.col("e_src").alias("start"))
        .distinct()
        .select(
            "start",
            F.lit(0).alias("step"),
            F.lit("").alias("prev"),
            F.col("start").alias("node"),
        )
        .localCheckpoint(eager=True)
    )
    out = frontier.select("start", "step", "node")
    for t in range(1, steps + 1):
        key = F.concat(
            F.when(F.col("e_dst") == F.col("prev"), F.lit("1")).otherwise(
                F.lit("0")
            ),
            F.md5(F.concat_ws(_SEP, F.col("node"), F.lit(str(t)), F.col("e_dst"))),
        )
        frontier = (
            frontier.join(e, frontier.node == e.e_src)
            .groupBy("start")
            .agg(
                F.min_by("e_dst", key).alias("nx"),
                F.max("node").alias("prev"),  # group-constant: one node/start
            )
            .select(
                "start", F.lit(t).alias("step"), "prev", F.col("nx").alias("node")
            )
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(frontier.select("start", "step", "node"))
    return out


def ktruss(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node_a, node_b, support): edges surviving ``rounds`` synchronous
    k-truss peels (Cohen 2008) — every surviving edge sat in >= k-2
    triangles of the then-current graph at each peel; the community
    backbone primitive one notch stronger than k-core (which bounds
    degree, not shared neighborhoods).

    ``support`` is the edge's triangle count at the FINAL peel (the value
    that justified its survival). Fixed synchronous rounds keep the
    operator oracle-replayable; a fixpoint loop is the production variant
    (each extra round is one more pass of the same plan).

    Plan shape per round: wedge enumeration (one self-join of the
    symmetric adjacency on the shared neighbor) + one join back onto the
    canonical edge list + one map-side-combinable count + one filter —
    all node/edge-keyed shuffles, the triangles-operator schema iterated.

    Requires ``k >= 3`` (at k=2 the support threshold is vacuous and the
    support join would silently drop triangle-free survivors).
    """
    if k < 3:
        raise ValueError("ktruss requires k >= 3")
    cur = (
        edges.select(F.col(src_col).alias("x"), F.col(dst_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sup = None
    for _ in range(rounds):
        sym = cur.unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        wedges = (
            sym.select(F.col("a").alias("x"), F.col("b").alias("w"))
            .join(
                sym.select(F.col("a").alias("y"), F.col("b").alias("w2")),
                F.col("w") == F.col("w2"),
            )
            .filter(F.col("x") < F.col("y"))
            .select(F.col("x").alias("a"), F.col("y").alias("b"), "w")
        )
        sup = (
            wedges.join(cur, ["a", "b"], "left_semi")
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        cur = (
            cur.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        sup = sup.localCheckpoint(eager=True)
    return cur.join(sup, ["a", "b"]).select(
        F.col("a").alias("node_a"), F.col("b").alias("node_b"), "support"
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(label, n_nodes, intra_edges, degree_sum, contribution): Newman
    modularity decomposition of a community assignment over the undirected
    simple graph — per community c, ``contribution`` is the additive term
    ``m_c/m - (d_c/2m)^2`` (Newman & Girvan 2004), so the graph's
    modularity Q is the sum of the column. The standard "did the
    clustering find real structure" score for LPA/Louvain output.

    ``labels`` is (node, label) — any assignment (LPA here). One canonical
    edge list (a<b, deduped), one degree agg, two broadcast-size joins of
    the label table onto edge endpoints, one count per community, and the
    scalar m attached via a crossJoin of a 1-row aggregate (no
    driver-side collect). Integer counts everywhere; the only float step
    is the final formula, round(6).
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
    lab = labels.select(F.col("node"), F.col("label")).localCheckpoint(eager=True)
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    per_label = (
        deg.join(lab, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("deg").alias("degree_sum"),
        )
    )
    la = lab.select(F.col("node").alias("a"), F.col("label").alias("_la"))
    lb = lab.select(F.col("node").alias("b"), F.col("label").alias("_lb"))
    intra = (
        und.join(la, "a")
        .join(lb, "b")
        .filter(F.col("_la") == F.col("_lb"))
        .groupBy(F.col("_la").alias("label"))
        .agg(F.count(F.lit(1)).alias("intra_edges"))
    )
    m = und.agg(F.count(F.lit(1)).alias("_m"))
    md = F.col("_m").cast("double")
    half = F.col("degree_sum").cast("double") / (F.lit(2.0) * md)
    return (
        per_label.join(intra, "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce("intra_edges", F.lit(0)).cast("long").alias("intra_edges"),
            F.col("degree_sum").cast("long").alias("degree_sum"),
            F.round(
                F.coalesce("intra_edges", F.lit(0)).cast("double") / md
                - half * half,
                6,
            ).alias("contribution"),
        )
    )


def scc(
    edges: DataFrame,
    doublings: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, scc_id, scc_size): strongly connected components of the
    DIRECTED graph, exact for every cycle realizable within
    ``2**doublings`` hops (default 8) — path-doubling closure, then
    mutual-reachability grouping with scc_id = min member.

    Doubling (Valiant 1975's transitive-closure squaring): after round r
    the pair set holds every (u,v) with a directed path of <= 2^r hops,
    so rounds are LOGARITHMIC in path length — 3 shuffles buy 8 hops
    where frontier BFS needs 8. Mutuality = one left-semi join of the
    closure against its own transpose; components then need no iteration
    at all (u,v mutual => same SCC => same min partner). Self-pairs are
    filtered throughout: composing x->u with u->y never needs (u,u), and
    singleton SCCs re-enter via the identity union at the end.

    Pair-set size is the scale knob: closure is O(sum of reachable-set
    sizes), fine for the bounded-diameter neighborhoods this targets
    (cycle detection in KG predicates, redirect loops, template link
    rings); for whole-web SCC use the FW-BW partition trick on top.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    reach = e
    for _ in range(doublings):
        l = reach.select("src", F.col("dst").alias("_mid"))
        r = reach.select(F.col("src").alias("_mid"), F.col("dst").alias("_d2"))
        two = l.join(r, "_mid").select("src", F.col("_d2").alias("dst"))
        reach = (
            reach.unionByName(two)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    transpose = reach.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    mutual = reach.join(transpose, ["src", "dst"], "left_semi")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    partners = mutual.select(
        F.col("src").alias("node"), F.col("dst").alias("p")
    ).unionByName(nodes.select("node", F.col("node").alias("p")))
    sid = partners.groupBy("node").agg(F.min("p").alias("scc_id"))
    size = sid.groupBy("scc_id").agg(F.count(F.lit(1)).alias("scc_size"))
    return sid.join(size, "scc_id").select("node", "scc_id", "scc_size")


def harmonic_centrality(
    edges: DataFrame,
    radius: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(entity, n_reached, harmonic_micro): EXACT bounded harmonic
    centrality over the undirected simple graph — sum of 1/d(v,u) over
    every u within ``radius`` hops of v (Boldi & Vigna's centrality; the
    exact small-radius twin of the HyperBall estimate in
    :func:`hyperball`, for when the ball fits and the ranking must be
    reproducible).

    BFS by relational iteration: round r extends the known-distance pair
    set by one hop and keeps min(d) per (node, other) — pair-set size is
    the sum of ball sizes, the same scale class as the closure in
    :func:`scc`. The 1/d terms are frozen to exact integers
    (``1000000 DIV d``) before the sum, so the ranking is
    hash-reproducible across engines — no float accumulation anywhere.
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dist = und.select(
        F.col("a").alias("node"), F.col("b").alias("other"), F.lit(1).alias("d")
    ).localCheckpoint(eager=True)
    for r in range(2, radius + 1):
        ext = (
            dist.filter(F.col("d") == r - 1)
            .join(und.select(F.col("a").alias("other"), F.col("b").alias("nxt")), "other")
            .filter(F.col("node") != F.col("nxt"))
            .select("node", F.col("nxt").alias("other"), F.lit(r).alias("d"))
        )
        dist = (
            dist.unionByName(ext)
            .groupBy("node", "other")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
    return dist.groupBy(F.col("node").alias("entity")).agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum(F.expr("1000000 DIV d")).cast("long").alias("harmonic_micro"),
    )


def community_profiles(
    edges: DataFrame,
    rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(label, n_nodes, top_entity, top_degree): per-community rollup of
    the LPA communities — size plus the highest-degree member (the
    community's "hub", ties to the lexicographically smallest entity),
    the summary table a KG browser shows per cluster.

    Composes :func:`lpa_communities` with the same undirected simple
    graph's degree table; the hub pick is a min_by over
    struct(-degree, entity) (one hash agg, no per-community window).
    """
    labels = lpa_communities(edges, rounds, src_col, dst_col)
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min(F.struct((-F.col("deg")).alias("nd"), F.col("node").alias("e"))).alias("_m"),
        )
        .select(
            "label",
            "n_nodes",
            F.col("_m.e").alias("top_entity"),
            (-F.col("_m.nd")).cast("long").alias("top_degree"),
        )
    )
