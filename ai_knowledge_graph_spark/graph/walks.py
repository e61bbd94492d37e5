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
