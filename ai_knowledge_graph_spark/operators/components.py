"""Connected components (G1) — iterative star contraction over DataFrames.

The reference finds components with a recursive DFS that rescans every node
for in-edges on each visit — O(V·E), single-threaded
(entity_standardization.py:273-312). Here: **star contraction** — each round
every node adopts ``min(self, min(neighbors))`` as its label, the edge set is
rewritten through the label map (contracting merged stars) and self-loops are
dropped. Components shrink geometrically: O(log n) rounds expected, verified
experimentally (a 200-node path converges in ~8 rounds where plain label
propagation still had 9 labels after 12).

Skew handling (north_star: "large-component salting to kill skew"):

* The per-node min is a hash aggregate with map-side partial combine, so a
  giant component's hub does NOT funnel raw edges through one reducer.
* The label-application joins (``assign ⋈ label`` and the two contraction
  joins) DO concentrate on a giant component's representative id: at web
  scale one component can hold a large fraction of all nodes, and every one
  of its rows carries the same join key. Each round therefore detects hot
  keys (probe-side multiplicity > ``hot_threshold`` via a map-side-combined
  count), replicates each hot key's single label row ``num_salts`` times,
  and scatters the hot probe rows across the replicas with a deterministic
  salt hashed from a per-row-unique column (the node id / the opposite edge
  endpoint — unique within a hot group by construction). A reducer's share
  of one hot key is bounded by ~|key|/num_salts; cold keys take the plain
  equi-join, where AQE skew splitting remains as a second line of defense.
* Each round is localCheckpoint'd (driver-orchestrated fixpoint, lineage cut
  per iteration).

IDs are xxhash64 of the entity string — deterministic, no global sort. At
10^12-entity scale 64 bits risks birthday collisions (~3% at 10^12), which
would silently merge two components; ``id_bits=128`` widens to two
independently-seeded xxhash64 columns packed in a struct (orderable and
joinable like a scalar; collision odds ~1e-14 at 10^12). Component ids are
representative node ids (consistent within a component; not guaranteed to be
the min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_id(col, id_bits: int = 64):
    """Deterministic node id for an entity string.

    64: single xxhash64 (bench/test default — cheapest shuffle key).
    128: struct of two differently-seeded xxhash64s (the second mixes in a
    literal to reseed) — use at 10^10+ entities where 64-bit birthday
    collisions become material. Structs compare field-by-field, so min/least/
    join/groupBy all work unchanged.
    """
    if id_bits == 64:
        return F.xxhash64(col)
    if id_bits == 128:
        return F.struct(
            F.xxhash64(col).alias("h"), F.xxhash64(col, F.lit(1)).alias("l")
        )
    raise ValueError(f"id_bits must be 64 or 128, got {id_bits}")


def _hot_keys(df: DataFrame, key: str, hot_threshold: int) -> DataFrame:
    """Keys of ``df`` whose row multiplicity exceeds ``hot_threshold``.

    One map-side-combined count; the survivors are by definition few
    (≤ |df| / hot_threshold rows), so the result broadcasts.
    """
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > F.lit(hot_threshold))
        .select(F.col(key).alias("_hk"))
        .localCheckpoint(eager=True)
    )


def _salted_left_lookup(
    df: DataFrame,
    key: str,
    salt_src: str,
    labels: DataFrame,
    lkey: str,
    lval: str,
    out_cols: list,
    num_salts: int,
    hot_threshold: int,
    hot: DataFrame | None = None,
    broadcast_labels: bool = False,
) -> DataFrame:
    """``df LEFT JOIN labels ON df[key] == labels[lkey]`` with hot keys
    salted. ``labels`` must be unique per ``lkey``; ``salt_src`` must be a
    column of ``df`` that is distinct within any one hot key's row group
    (spreads that group uniformly over ``num_salts`` reducers). ``out_cols``
    are selected from the joined result (may reference ``lval``, which is
    null for unmatched rows). ``hot`` short-circuits detection with a
    precomputed ``(_hk)`` key set (callers that probe the same skewed key
    space twice detect once). ``broadcast_labels`` pins a broadcast hash
    join in the fast path (callers set it from a measured node count:
    checkpointed label tables carry no size stats, so without the hint the
    probe side would be shuffled on every lookup)."""
    if hot is None:
        hot = _hot_keys(df, key, hot_threshold)
    if hot.isEmpty():
        # Fast path (the overwhelmingly common case): nothing is hot, so the
        # plain equi-join plan — no probe-side split, no replicated labels.
        # hot is localCheckpoint'd, so the isEmpty probe is free.
        lb = F.broadcast(labels) if broadcast_labels else labels
        return df.join(lb, df[key] == lb[lkey], "left").select(*out_cols)
    hot = F.broadcast(hot)

    flagged = df.join(hot, df[key] == hot["_hk"], "left")
    cold = (
        flagged.filter(F.col("_hk").isNull())
        .drop("_hk")
        .join(labels, F.col(key) == labels[lkey], "left")
        .select(*out_cols)
    )

    hot_probe = (
        flagged.filter(F.col("_hk").isNotNull())
        .drop("_hk")
        .withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(num_salts)))
    )
    hot_labels = labels.join(hot, labels[lkey] == hot["_hk"], "left_semi").withColumn(
        "_lsalt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(num_salts)]))
    )
    hot_joined = (
        hot_probe.join(
            hot_labels,
            (F.col(key) == hot_labels[lkey]) & (F.col("_salt") == hot_labels["_lsalt"]),
            "left",
        )
        .select(*out_cols)
    )
    return cold.unionByName(hot_joined)


def _contract_components(
    e: DataFrame,
    nodes: DataFrame,
    max_iterations: int,
    num_salts: int,
    hot_threshold: int,
) -> DataFrame:
    """Shared star-contraction fixpoint: ``e`` = symmetric distinct id pairs
    (a, b), localCheckpoint'd; ``nodes`` = distinct (node) ids,
    localCheckpoint'd. Returns (node, comp) with one representative per
    component. Ids may be any orderable/joinable type (long or the 128-bit
    struct)."""
    assign = nodes.select("node", F.col("node").alias("comp"))

    # A join key's multiplicity is bounded by the node count, so a graph
    # with ≤ hot_threshold nodes cannot have a hot key — skip detection
    # entirely (hands every lookup a statically-empty hot set, taking the
    # plain-join fast path with zero per-iteration overhead).
    n_nodes = nodes.count()
    use_salt = n_nodes > hot_threshold
    # Label table ≤ node count: when it fits an executor, broadcast it into
    # the three per-round lookups — otherwise the checkpointed (stats-less)
    # label table forces a shuffle of assign AND both edge probes each round.
    bcast = n_nodes <= 2_000_000
    empty_hot = nodes.select(F.col("node").alias("_hk")).limit(0)

    for _ in range(max_iterations):
        if e.isEmpty():
            break
        # Label = min(self, min(neighbors)); e holds both directions, so the
        # groupBy sees the full neighborhood (map-side partial combine).
        label = (
            e.groupBy("a")
            .agg(F.min("b").alias("m"))
            .select(F.col("a").alias("lnode"), F.least("a", "m").alias("label"))
        )
        if use_salt or not bcast:
            # Salted/shuffled consumers probe the label table three times —
            # materialize once. In broadcast mode each consumer rebuilds it
            # as a cheap agg over the checkpointed e inside the round's one
            # job, so the extra barrier job costs more than it saves.
            label = label.localCheckpoint(eager=True)
        # Compose into the assignment: representatives merge through label.
        # ``comp`` is the skewed key (a giant component's rows all carry its
        # representative); ``node`` is unique per row -> perfect salt source.
        assign = _salted_left_lookup(
            assign,
            key="comp",
            salt_src="node",
            labels=label,
            lkey="lnode",
            lval="label",
            out_cols=["node", F.coalesce("label", "comp").alias("comp")],
            num_salts=num_salts,
            hot_threshold=hot_threshold,
            hot=None if use_salt else empty_hot,
            broadcast_labels=bcast,
        )
        # Contract the edge set through the label map. Every endpoint has a
        # label row (e is symmetric), so the left lookup never misses; the
        # opposite endpoint is distinct within a hot group (e holds distinct
        # pairs) and serves as the salt source. e is symmetric, so one hot
        # scan of `a` covers the `b`-keyed lookup too.
        hot_e = _hot_keys(e, "a", hot_threshold) if use_salt else empty_hot
        la = label.select(F.col("lnode").alias("_la_n"), F.col("label").alias("alab"))
        e = _salted_left_lookup(
            e,
            key="a",
            salt_src="b",
            labels=la,
            lkey="_la_n",
            lval="alab",
            # Keep the PRE-contraction endpoint as the next salt source: the
            # contracted `a` can be constant within a hot-b group (that is
            # what contraction does), which would defeat the salt.
            out_cols=[
                F.col("alab").alias("a"),
                F.col("b").alias("b"),
                F.col("a").alias("_sa"),
            ],
            num_salts=num_salts,
            hot_threshold=hot_threshold,
            hot=hot_e,
            broadcast_labels=bcast,
        )
        lb = label.select(F.col("lnode").alias("_lb_n"), F.col("label").alias("blab"))
        e = _salted_left_lookup(
            e,
            key="b",
            salt_src="_sa",
            labels=lb,
            lkey="_lb_n",
            lval="blab",
            out_cols=[F.col("a").alias("a"), F.col("blab").alias("b")],
            num_salts=num_salts,
            hot_threshold=hot_threshold,
            hot=hot_e,
            broadcast_labels=bcast,
        ).filter(F.col("a") != F.col("b"))
        e = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
        # Materialize the round's two outputs (assignment + contracted edges)
        # in ONE checkpoint job via a tag union — node/comp and a/b share an
        # id type, so both halves ride one cached table and the per-round
        # job count halves. Consumers split it back with a tag filter.
        merged = (
            assign.select(
                F.lit(0).alias("_t"),
                F.col("node").alias("_x"),
                F.col("comp").alias("_y"),
            )
            .unionByName(
                e.select(
                    F.lit(1).alias("_t"),
                    F.col("a").alias("_x"),
                    F.col("b").alias("_y"),
                )
            )
            .localCheckpoint(eager=True)
        )
        assign = merged.filter(F.col("_t") == 0).select(
            F.col("_x").alias("node"), F.col("_y").alias("comp")
        )
        e = merged.filter(F.col("_t") == 1).select(
            F.col("_x").alias("a"), F.col("_y").alias("b")
        )
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds"
        )
    return assign


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    id_bits: int = 64,
    num_salts: int = 32,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """(src, dst) string edges -> (entity, node, component_id).

    Undirected reachability, matching the reference DFS that follows both
    edge directions (entity_standardization.py:296-303).

    ``num_salts``/``hot_threshold`` tune the large-component salting (see
    module docstring); ``hot_threshold`` is rows-per-join-key, so the default
    only engages for components (or hubs) above a million members — at which
    point an unsalted join would put all of them on one reducer.
    """
    pairs = edges.select(
        node_id(F.col(src), id_bits).alias("a"),
        node_id(F.col(dst), id_bits).alias("b"),
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
        .select("entity", node_id(F.col("entity"), id_bits).alias("node"))
        .localCheckpoint(eager=True)
    )

    assign = _contract_components(
        e, nodes.select("node"), max_iterations, num_salts, hot_threshold
    )
    return nodes.join(assign, "node").select(
        "entity", "node", F.col("comp").alias("component_id")
    )


def components_from_pairs(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 50,
    num_salts: int = 32,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Components over already-numeric id pairs -> (node, group_id) with
    ``group_id`` = the MINIMUM id in the node's component (normalized from
    the contraction representative by one map-side-combined groupBy — the
    deterministic survivor choice a dedup pipeline needs). Only ids that
    appear in ``pairs`` come back; callers map absent ids to themselves.

    Same salted star contraction as :func:`connected_components`; skew
    bounds hold for a giant near-dup cluster (e.g. one boilerplate page
    duplicated 10^8 times) exactly as for a giant entity component.
    """
    p = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    e = (
        p.unionByName(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # e is symmetric, so distinct(a) IS the node set — derived from the
    # checkpoint instead of re-evaluating the (often expensive) upstream
    # pair plan a second time.
    nodes = (
        e.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    )
    assign = _contract_components(e, nodes, max_iterations, num_salts, hot_threshold)
    gmin = assign.groupBy("comp").agg(F.min("node").alias("group_id"))
    if nodes.count() <= 2_000_000:
        gmin = F.broadcast(gmin)
    return assign.join(gmin, "comp").select("node", "group_id")


def components_for_triples(
    triples: DataFrame,
    max_iterations: int = 50,
    id_bits: int = 64,
    num_salts: int = 32,
    hot_threshold: int = 1_000_000,
) -> DataFrame:
    """Component per entity for a triple table (subjects ∪ objects)."""
    edges = triples.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return connected_components(
        edges,
        max_iterations=max_iterations,
        id_bits=id_bits,
        num_salts=num_salts,
        hot_threshold=hot_threshold,
    )
