"""Knowledge-graph analytics over the standardized triple store.

Beyond-reference operators a production KG built from web crawls needs
(the reference — src/knowledge_graph/entity_standardization.py — stops at
inference; these consume its output):

* :func:`mine_rules` — AMIE-style 2-hop horn-rule mining
  (Galarraga et al., WWW 2013): rules ``p(A,B) ∧ q(B,C) ⇒ r(A,C)`` with
  support / body-count / confidence, computed as two hash joins plus
  map-side-combinable aggregations — never a cross product.
* :func:`fuse_facts` — source-majority knowledge fusion (Dong et al.,
  VLDB 2014 "Knowledge Vault" flavor, simplified to voting): for each
  (subject, object) pick the predicate asserted by the most distinct
  source documents, with deterministic tie-breaks, and report its share
  of the pair's sources.
* :func:`kg_diff` — edge-level diff between two crawl snapshots of the
  same KG (added / removed / kept), the triple-store twin of the page
  snapshot diff in operators/webcrawl.py.
* :func:`entity_roles` — predicate-profile entity typing: per entity,
  out/in degree and the dominant outgoing/incoming predicate (its "role"
  in the schema-free graph), the standard first step of ontology
  induction over open-domain triples.
* :func:`kg_negatives` — filtered negative sampling for KG-embedding
  training (TransE protocol, Bordes et al., NeurIPS 2013): deterministic
  hash-driven head/tail corruption, anti-joined against true triples.
* :func:`match_basic_pattern` — SPARQL-style basic-graph-pattern matching
  compiled to a Catalyst join tree (variables = join keys, constants =
  pushed filters).
* :func:`entity_summary` — top-k most informative facts per entity by
  predicate inverse-frequency (RELIN/FACES informativeness core), ranked
  with the lossless two-phase bounded rank so hub entities never window
  through one reducer.

Scale notes (100 TB bar): every operator below is a constant number of
shuffles keyed on entities or SPO — rule mining shuffles on the join
entity then on (A,C); fusion is two map-side-combined aggregations over
(s,o,p) and (s,o); diff is one full-outer hash join on SPO; roles are two
aggregations plus one outer join on entity. No windows over unbounded
partitions, no collects, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mine_rules(
    triples: DataFrame,
    min_support: int = 2,
    max_rules: int | None = None,
    max_join_fanout: int | None = None,
) -> DataFrame:
    """Mine 2-hop horn rules ``p(A,B) ∧ q(B,C) ⇒ r(A,C)`` from an SPO set.

    Input: DataFrame with ``subject, predicate, object`` (other columns
    ignored). Edges are de-duplicated to distinct SPO first, so mention
    multiplicity does not inflate counts.

    Output: ``p, q, r, support, body_count, confidence`` where

    * ``body_count(p,q)``  = #distinct (A,C), A≠C, with p(A,B) and q(B,C)
      for some B;
    * ``support(p,q,r)``   = #distinct such (A,C) that also satisfy r(A,C);
    * ``confidence``       = support / body_count (round 6).

    Rules below ``min_support`` are dropped (AMIE's support pruning).

    Plan shape: edges self-join on the shared entity B (one shuffle on
    entity), distinct (p,q,A,C) instances (one shuffle), inner join to the
    head edge set on (A,C) (hash join), then two grouped counts that
    map-side combine.

    100 TB guard: the B-join emits in_degree(B) * out_degree(B) candidate
    rows per shared entity — quadratic on hub entities (the same hot-key
    law operators/inference.py bounds with max_block_size). With
    ``max_join_fanout=K`` an entity whose in*out product exceeds K is
    dropped from the BODY join entirely (both sides, so no one-sided
    asymmetry), trading those rules for a hard per-key output bound —
    the standard AMIE functionality cap. None (default) keeps exact
    semantics for oracle parity.
    """
    spo = triples.select("subject", "predicate", "object").distinct()
    if max_join_fanout is not None:
        deg = (
            spo.groupBy(F.col("object").alias("b"))
            .agg(F.count(F.lit(1)).alias("d_in"))
            .join(
                spo.groupBy(F.col("subject").alias("b")).agg(
                    F.count(F.lit(1)).alias("d_out")
                ),
                "b",
            )
            .filter(F.col("d_in") * F.col("d_out") <= max_join_fanout)
            .select("b")
        )
        # hot hubs are FEW by definition; the survivor set is a semi-join
        # filter applied symmetrically to both body sides
        spo_body = spo
        left_f = spo_body.join(
            deg.withColumnRenamed("b", "object"), "object", "left_semi"
        )
        right_f = spo_body.join(
            deg.withColumnRenamed("b", "subject"), "subject", "left_semi"
        )
    else:
        left_f = right_f = spo
    left = left_f.select(
        F.col("subject").alias("a"),
        F.col("predicate").alias("p"),
        F.col("object").alias("b"),
    )
    right = right_f.select(
        F.col("subject").alias("b"),
        F.col("predicate").alias("q"),
        F.col("object").alias("c"),
    )
    body = (
        left.join(right, "b")
        .filter(F.col("a") != F.col("c"))
        .select("p", "q", "a", "c")
        .distinct()
    )
    heads = spo.select(
        F.col("subject").alias("a"),
        F.col("predicate").alias("r"),
        F.col("object").alias("c"),
    )
    body_counts = body.groupBy("p", "q").agg(
        F.count(F.lit(1)).alias("body_count")
    )
    supports = (
        body.join(heads, ["a", "c"])
        .groupBy("p", "q", "r")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = (
        supports.join(body_counts, ["p", "q"])
        .select(
            "p",
            "q",
            "r",
            "support",
            "body_count",
            F.round(
                F.col("support").cast("double") / F.col("body_count"), 6
            ).alias("confidence"),
        )
    )
    if max_rules is not None:
        out = out.orderBy(
            F.desc("confidence"), F.desc("support"), "p", "q", "r"
        ).limit(max_rules)
    return out


def fuse_facts(std_triples: DataFrame) -> DataFrame:
    """Source-majority fact fusion over provenance-carrying triples.

    Input: standardized triples with ``subject, predicate, object, doc_id``
    (operators/standardize.py output). For each (subject, object) pair the
    winning predicate is the one asserted by the most *distinct* source
    documents; ties break on total mention count, then lexicographically
    smallest predicate (fully deterministic).

    Output: ``subject, object, predicate, n_docs, n_mentions,
    pair_docs, support_ratio`` — ``pair_docs`` is the number of distinct
    docs asserting *any* predicate for the pair and ``support_ratio =
    n_docs / pair_docs`` (round 6), i.e. the winner's source share.

    Plan shape: one aggregation on (s,o,p) with map-side combine, a
    window over (s,o) groups — bounded by the pair's predicate fan-out,
    never the corpus — and one aggregation on (s,o) joined back. Two
    shuffles total on the same (s,o) key space; AQE coalesces them.
    """
    per_pred = std_triples.groupBy("subject", "object", "predicate").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_mentions"),
    )
    # distinct docs asserting anything for the pair (across predicates)
    pair_totals = (
        std_triples.groupBy("subject", "object")
        .agg(F.countDistinct("doc_id").alias("pair_docs"))
    )
    w = Window.partitionBy("subject", "object").orderBy(
        F.desc("n_docs"), F.desc("n_mentions"), F.asc("predicate")
    )
    winners = (
        per_pred.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return winners.join(pair_totals, ["subject", "object"]).select(
        "subject",
        "object",
        "predicate",
        "n_docs",
        "n_mentions",
        "pair_docs",
        F.round(
            F.col("n_docs").cast("double") / F.col("pair_docs"), 6
        ).alias("support_ratio"),
    )


def kg_diff(old_triples: DataFrame, new_triples: DataFrame) -> DataFrame:
    """Edge-level diff between two KG snapshots (e.g. successive crawls).

    Inputs: two SPO DataFrames (extra columns ignored; mention
    multiplicity collapsed via distinct). Output: ``subject, predicate,
    object, status`` with status in {'added','removed','kept'} relative to
    old → new.

    Plan shape: one full-outer hash join on the composite SPO key —
    a single co-partitioned shuffle per side; linear in edges.
    """
    old = (
        old_triples.select("subject", "predicate", "object")
        .distinct()
        .withColumn("in_old", F.lit(True))
    )
    new = (
        new_triples.select("subject", "predicate", "object")
        .distinct()
        .withColumn("in_new", F.lit(True))
    )
    return (
        old.join(new, ["subject", "predicate", "object"], "full_outer")
        .select(
            "subject",
            "predicate",
            "object",
            F.when(F.col("in_old").isNull(), F.lit("added"))
            .when(F.col("in_new").isNull(), F.lit("removed"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


def triple_history(snapshots: list[DataFrame]) -> DataFrame:
    """SCD2-style validity intervals for triples across ordered KG snapshots.

    Input: N snapshot SPO DataFrames (crawl 0..N-1, oldest first; extra
    columns ignored, mention multiplicity collapsed). Output: one row per
    maximal consecutive run of snapshots containing the triple:
    ``subject, predicate, object, first_snap, last_snap, is_current``
    (is_current = the run reaches the latest snapshot). A triple that
    disappears and re-appears yields multiple rows — the temporal-KG twin
    of operators/webcrawl.py's page SCD2.

    Plan shape: union of tagged snapshots, ONE aggregation on SPO building
    a presence bitmask (sum of distinct 2^snap — map-side combinable),
    then run extraction as pure column arithmetic over sequence(0, N-1)
    higher-order functions: a start is a set bit whose predecessor is
    clear; its end is start + the length of the all-ones prefix of
    (mask >> start). No window, no per-key sort, payload bounded by N.
    N is the number of crawls (tens at most), never data-sized.
    """
    n = len(snapshots)
    tagged = None
    for i, df in enumerate(snapshots):
        t = (
            df.select("subject", "predicate", "object")
            .distinct()
            .withColumn("snap", F.lit(i))
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    # column shift counts must go through expr (pyspark's shiftleft only
    # accepts literal shifts)
    masked = tagged.groupBy("subject", "predicate", "object").agg(
        F.sum(F.expr("shiftleft(1L, snap)")).alias("mask")
    )
    # starts: set bits with a clear predecessor; run length: all-ones
    # prefix of (mask >> start) — ((m >> s) & (2^(l+1)-1)) == 2^(l+1)-1
    runs = masked.withColumn(
        "runs",
        F.expr(
            f"""
            transform(
              filter(sequence(0, {n - 1}),
                     s -> ((mask >> s) % 2) = 1
                          AND (s = 0 OR ((mask >> (s - 1)) % 2) = 0)),
              s -> struct(
                s AS first_snap,
                s + size(filter(sequence(s, {n - 1}),
                        j -> (shiftright(mask, s) & (shiftleft(1L, j - s + 1) - 1))
                             = shiftleft(1L, j - s + 1) - 1)) - 1 AS last_snap))
            """
        ),
    )
    out = runs.select(
        "subject",
        "predicate",
        "object",
        F.explode("runs").alias("r"),
    )
    return out.select(
        "subject",
        "predicate",
        "object",
        F.col("r.first_snap").cast("int").alias("first_snap"),
        F.col("r.last_snap").cast("int").alias("last_snap"),
        (F.col("r.last_snap") == F.lit(n - 1)).alias("is_current"),
    )


def entity_roles(triples: DataFrame) -> DataFrame:
    """Predicate-profile entity typing over an SPO set.

    For each entity in the (distinct) graph: out-degree, in-degree, and
    the dominant outgoing / incoming predicate — max distinct-edge count,
    ties to the lexicographically smallest predicate. Entities that never
    appear in a role get degree 0 and a NULL predicate for that side.

    Output: ``entity, n_out, n_in, top_out_pred, top_in_pred``.

    Plan shape: distinct SPO, two grouped counts on (entity, predicate),
    per-side max_by via one more map-side-combined aggregation (struct
    max — no window needed), one full-outer join on entity. All shuffles
    are entity-keyed; skew equals the graph's degree skew, which the
    engine's centrality family already tolerates at bench scale.
    """
    spo = triples.select("subject", "predicate", "object").distinct()

    def side(src_col: str, deg_name: str, top_name: str) -> DataFrame:
        per = spo.groupBy(F.col(src_col).alias("entity"), "predicate").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        # max_by on (cnt desc, predicate asc): encode as struct ordering —
        # max over (cnt, neg-lex predicate) is not expressible directly, so
        # use min over (-cnt, predicate) via struct comparison.
        return per.groupBy("entity").agg(
            F.sum("cnt").alias(deg_name),
            F.min(F.struct(-F.col("cnt"), F.col("predicate"))).alias("_m"),
        ).select(
            "entity", deg_name, F.col("_m.predicate").alias(top_name)
        )

    out_side = side("subject", "n_out", "top_out_pred")
    in_side = side("object", "n_in", "top_in_pred")
    return (
        out_side.join(in_side, "entity", "full_outer")
        .select(
            "entity",
            F.coalesce("n_out", F.lit(0)).alias("n_out"),
            F.coalesce("n_in", F.lit(0)).alias("n_in"),
            "top_out_pred",
            "top_in_pred",
        )
    )


def _h48(*cols) -> "F.Column":
    """48-bit non-negative int64 hash, portable to the SQL oracle:
    Spark ``conv(substring(md5(x),1,12),16,10)`` equals DuckDB
    ``('0x'||substr(md5(x),1,12))::BIGINT`` (12 hex digits keep the value
    inside int64 for downstream modular arithmetic)."""
    return F.conv(F.substring(F.md5(F.concat(*cols)), 1, 12), 16, 10).cast("long")


def kg_negatives(
    triples: DataFrame,
    k: int = 2,
    salt: str = "neg",
) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (the TransE
    protocol: Bordes et al., NeurIPS 2013): for every positive triple emit
    ``k`` corrupted variants — head or tail replaced by a pseudo-random
    vocabulary entity — and drop corruptions that are themselves true
    triples (the "filtered" setting, which otherwise poisons the margin
    loss with false negatives).

    Determinism: the corrupted side and the replacement entity both come
    from 48-bit md5 hashes of (salt, s, p, o, j), so reruns and the SQL
    oracle reproduce the sample exactly — no RNG state, no
    partition-placement dependence.

    Output: ``subject, predicate, object, neg_idx, neg_subject,
    neg_object`` — one row per surviving corruption (collisions with true
    triples are dropped, so a positive can yield < k rows).

    Plan shape (100 TB): entity vocabulary = distinct-union + dense ids
    via :func:`distributed_rank` (range repartition, no single-task
    window); candidates = positives × k via a literal ``sequence`` explode
    (no shuffle); replacement lookup = one hash equi-join on the dense id
    (AQE broadcasts the vocab when it measures small); the filter = one
    left_anti join on the corrupted SPO. Everything is entity/SPO-keyed
    shuffles — no cross product, no Python, no collect.

    Reference repo stops at graph construction (no embedding-training
    surface); this is the training-data complement, same family as the
    training_qa sink (reference main.py's JSONL export).
    """
    from ai_knowledge_graph_spark.operators.standardize import distributed_rank

    spo = triples.select("subject", "predicate", "object").distinct()
    spo = spo.localCheckpoint(eager=True)  # feeds vocab, candidates, filter
    ents = (
        spo.select(F.col("subject").alias("entity"))
        .union(spo.select("object"))
        .distinct()
    )
    vocab = distributed_rank(ents, ["entity"], out="eid").localCheckpoint(eager=True)
    n = vocab.groupBy().agg(F.count(F.lit(1)).alias("n_ents"))

    cand = (
        spo.crossJoin(F.broadcast(n))
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx")
        )
        .select(
            "subject",
            "predicate",
            "object",
            "neg_idx",
            (
                _h48(
                    F.lit(salt + "A"),
                    F.col("subject"),
                    F.lit("\x1f"),
                    F.col("predicate"),
                    F.lit("\x1f"),
                    F.col("object"),
                    F.lit("\x1f"),
                    F.col("neg_idx").cast("string"),
                )
                % 2
                == 0
            ).alias("_head"),
            (
                _h48(
                    F.lit(salt + "B"),
                    F.col("subject"),
                    F.lit("\x1f"),
                    F.col("predicate"),
                    F.lit("\x1f"),
                    F.col("object"),
                    F.lit("\x1f"),
                    F.col("neg_idx").cast("string"),
                )
                % F.col("n_ents")
                + 1
            ).alias("eid"),
        )
    )
    corrupted = (
        cand.join(vocab, "eid")
        .select(
            "subject",
            "predicate",
            "object",
            "neg_idx",
            F.when(F.col("_head"), F.col("entity")).otherwise(F.col("subject")).alias(
                "neg_subject"
            ),
            F.when(F.col("_head"), F.col("object")).otherwise(F.col("entity")).alias(
                "neg_object"
            ),
        )
    )
    true_spo = spo.select(
        F.col("subject").alias("neg_subject"),
        "predicate",
        F.col("object").alias("neg_object"),
    )
    return corrupted.join(
        true_spo, ["neg_subject", "predicate", "neg_object"], "left_anti"
    ).select(
        "subject", "predicate", "object", "neg_idx", "neg_subject", "neg_object"
    )


def match_basic_pattern(
    triples: DataFrame,
    pattern: list[tuple[str, str, str]],
) -> DataFrame:
    """SPARQL-style basic-graph-pattern matching with set semantics: each
    pattern element is ``(subject, predicate, object)`` where a token
    starting with ``?`` is a variable and anything else a constant.
    Returns one column per variable (the ``?`` stripped), one row per
    distinct solution binding.

    Declarative-plan story: each element compiles to a filtered projection
    of the (distinct) triple store; elements chain with hash equi-joins on
    their shared variables, so Catalyst sees an ordinary join tree —
    constant filters push into the scan, AQE picks broadcast sides and
    splits skewed hub joins. Order selective elements (more constants)
    first: the fold joins in the given order.

    Guards: every element needs >= 1 variable, and every element after
    the first must share >= 1 variable with the ones before it (a
    disconnected pattern is a cartesian product — refused rather than
    silently exploded). A variable repeated inside one element becomes an
    equality filter on that element.

    Set semantics note: the store is ``distinct()``-ed first, and every
    variable is kept in the output, so join outputs are duplicate-free by
    construction — no final DISTINCT shuffle.
    """
    spo = triples.select("subject", "predicate", "object").distinct()
    bound: DataFrame | None = None
    seen: set[str] = set()
    for i, (s, p, o) in enumerate(pattern):
        el = spo
        cols: dict[str, str] = {}
        for tok, col in ((s, "subject"), (p, "predicate"), (o, "object")):
            if tok.startswith("?"):
                var = tok[1:]
                if var in cols:  # repeated var inside one element
                    el = el.filter(F.col(cols[var]) == F.col(col))
                else:
                    cols[var] = col
            else:
                el = el.filter(F.col(col) == tok)
        if not cols:
            raise ValueError(f"pattern element {i} has no variables: {(s, p, o)}")
        el = el.select(*(F.col(c).alias(v) for v, c in cols.items()))
        if bound is None:
            bound = el
        else:
            shared = sorted(seen & set(cols))
            if not shared:
                raise ValueError(
                    f"pattern element {i} shares no variable with the "
                    f"previous elements (disconnected pattern = cartesian "
                    f"product; refused)"
                )
            bound = bound.join(el, shared)
        seen |= set(cols)
    assert bound is not None, "empty pattern"
    return bound.select(*sorted(seen))


def entity_summary(
    triples: DataFrame,
    k: int = 3,
    n_buckets: int = 64,
) -> DataFrame:
    """Entity summarization: the top-``k`` most informative outgoing facts
    per entity, scored by predicate inverse-frequency (the RELIN/FACES
    family's informativeness core, reduced to its scalable skeleton):
    ``idf_micro = round(ln(|E| / |edges with p|) * 1e6)`` — rarer
    predicates say more about an entity than ubiquitous ones.

    The idf is frozen to int64 micro-units BEFORE ranking (the DSIR
    trick), so ordering — and the SQL oracle's hash — can never flip on
    float formatting. Ties: idf desc, predicate asc, object asc.

    Output: ``entity, predicate, object, idf_micro, fact_rank``
    (fact_rank 1..k).

    Plan shape (100 TB): predicate histogram is one map-side-combined
    aggregation joined back by broadcast (predicate vocabulary is tiny);
    the per-entity top-k uses the LOSSLESS two-phase bounded rank from
    frontier_schedule — rank within (entity, hash-bucket) first and keep
    ``<= k`` (a superset: ranks only shrink on subsets), then exact rank
    over the ``<= n_buckets * k`` survivors per entity — so a hub entity
    with 10^7 facts never sorts through one reducer.
    """
    spo = triples.select("subject", "predicate", "object").distinct()
    spo = spo.localCheckpoint(eager=True)  # feeds histogram + ranking
    total = spo.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    pred = (
        spo.groupBy("predicate")
        .agg(F.count(F.lit(1)).alias("_pc"))
        .crossJoin(F.broadcast(total))
        .select(
            "predicate",
            F.round(
                F.log(F.col("_n").cast("double") / F.col("_pc").cast("double")) * 1e6
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    facts = spo.join(F.broadcast(pred), "predicate").select(
        F.col("subject").alias("entity"), "predicate", "object", "idf_micro"
    )
    order = [
        F.col("idf_micro").desc(),
        F.col("predicate").asc(),
        F.col("object").asc(),
    ]
    bucket = F.pmod(F.xxhash64("predicate", "object"), F.lit(n_buckets))
    w1 = Window.partitionBy("entity", bucket).orderBy(*order)
    survivors = facts.withColumn("_brank", F.row_number().over(w1)).filter(
        F.col("_brank") <= k
    )
    w2 = Window.partitionBy("entity").orderBy(*order)
    return (
        survivors.withColumn("fact_rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("fact_rank") <= k)
        .select("entity", "predicate", "object", "idf_micro", "fact_rank")
    )


def entity_trends(snapshots: list[DataFrame]) -> DataFrame:
    """(entity, snap, mentions, total, burst): per-snapshot entity mention
    counts across crawl snapshots with exact-integer burst flagging — the
    temporal-attention signal (Kleinberg, KDD 2002 burst detection,
    reduced to its shuffle-friendly core) a crawl-fed KG uses to surface
    trending entities.

    ``mentions`` counts subject+object occurrences of the entity in that
    snapshot's triple multiset; ``burst`` is true iff the snapshot holds
    strictly more than twice the entity's average share:
    ``mentions * n_snapshots > 2 * total``. Pure int64 arithmetic — no
    float thresholds to diverge on.

    Plan shape: one union + one map-side-combined count per snapshot, one
    total aggregation, one hash join on entity. Entities absent from a
    snapshot produce no row (their mentions are 0 by omission; total sums
    the present rows).
    """
    if not snapshots:
        raise ValueError("entity_trends requires at least one snapshot")
    n = len(snapshots)
    per = None
    for i, s in enumerate(snapshots):
        m = (
            s.select(F.col("subject").alias("entity"))
            .unionByName(s.select(F.col("object").alias("entity")))
            .groupBy("entity")
            .agg(F.count(F.lit(1)).alias("mentions"))
            .select("entity", F.lit(i).alias("snap"), "mentions")
        )
        per = m if per is None else per.unionByName(m)
    tot = per.groupBy("entity").agg(F.sum("mentions").alias("total"))
    return per.join(tot, "entity").select(
        "entity",
        "snap",
        "mentions",
        "total",
        (F.col("mentions") * n > F.lit(2) * F.col("total")).alias("burst"),
    )


def link_predict(
    triples: DataFrame,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """(node_a, node_b, common, aa_micro): Adamic-Adar link prediction
    (Adamic & Adar, Social Networks 2003) over the undirected simple graph
    of the triple store — the standard KG-completion candidate scorer:
    non-adjacent pairs sharing neighbors, scored by
    ``sum over common z of 1/ln(deg(z))``, rare hubs weighing more.

    ``aa_micro`` freezes each 1/ln term to int64 micro-units BEFORE the
    sum (the tfidf/DSIR trick), so scores are summation-order-independent
    and hash-exact. Common neighbors always have degree >= 2, so ln > 0.

    Plan shape: one self-join of the undirected adjacency on the shared
    neighbor z (the wedge enumeration triangles/rule-mining also use), a
    degree join on z, one map-side-combinable aggregation per (a, b), and
    an anti-join against the edge set (predict NEW links only).

    100 TB guard: a hub z emits deg(z)^2 wedges; ``max_hub_degree=K``
    drops z above K from the wedge join entirely (both sides), the same
    functionality cap as mine_rules' max_join_fanout — scores then
    undercount hub-mediated similarity, which Adamic-Adar's 1/ln weight
    already discounts to near-zero.
    """
    e = triples.select(F.col("subject").alias("a"), F.col("object").alias("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy(F.col("a").alias("z")).agg(F.count(F.lit(1)).alias("deg"))
    if max_hub_degree is not None:
        deg = deg.filter(F.col("deg") <= max_hub_degree)
    # a common neighbor is adjacent to two distinct nodes, so deg >= 2 —
    # the filter both encodes that invariant and keeps ln(deg) > 0 under
    # ANSI division
    w = deg.filter(F.col("deg") >= 2).withColumn(
        "w",
        F.round(F.lit(1_000_000.0) / F.log(F.col("deg").cast("double"))).cast(
            "bigint"
        ),
    )
    wedges = (
        und.select(F.col("a").alias("x"), F.col("b").alias("z"))
        .join(und.select(F.col("a").alias("y"), F.col("b").alias("z2")),
              F.col("z") == F.col("z2"))
        .filter(F.col("x") < F.col("y"))
        .join(w.select("z", "w"), "z")
    )
    scored = wedges.groupBy(F.col("x").alias("node_a"), F.col("y").alias("node_b")).agg(
        F.count(F.lit(1)).alias("common"),
        F.sum("w").alias("aa_micro"),
    )
    adjacent = und.select(F.col("a").alias("node_a"), F.col("b").alias("node_b"))
    return scored.join(adjacent, ["node_a", "node_b"], "left_anti")


def degree_assortativity(triples: DataFrame) -> DataFrame:
    """One row (n_nodes, n_edges, assortativity): Pearson degree
    assortativity (Newman, PRL 2002) of the undirected simple graph — the
    single scalar that says whether hubs link to hubs (>0, social-style)
    or to leaves (<0, web/biology-style); a KG health metric worth
    tracking per crawl snapshot.

    Computed over the symmetric directed edge list (each undirected edge
    contributes both (j,k) and (k,j), Newman's convention): with
    j,k = endpoint degrees,

        r = [S_jk/M - (S_j/M)^2] / [S_jj/M - (S_j/M)^2]

    where S_jk = sum(j*k), S_j = sum(j), S_jj = sum(j^2) and M = row
    count. All sums are exact int64 aggregations (degree products of a
    48-degree hub on 10^12 edges stay far under 2^63); the final formula
    is the only floating-point step, round(6).

    Plan shape: one degree aggregation, two hash joins to attach endpoint
    degrees, one global aggregate. Returns assortativity NULL for
    degree-regular graphs (variance 0).
    """
    e = triples.select(F.col("subject").alias("a"), F.col("object").alias("b"))
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    paired = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("j")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("k")), "b")
    )
    agg = paired.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum(F.col("j") * F.col("k")).alias("s_jk"),
        F.sum("j").alias("s_j"),
        F.sum(F.col("j") * F.col("j")).alias("s_jj"),
    )
    n_nodes = deg.count()
    md = F.col("m2").cast("double")
    mean = F.col("s_j").cast("double") / md
    num = F.col("s_jk").cast("double") / md - mean * mean
    den = F.col("s_jj").cast("double") / md - mean * mean
    return agg.select(
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
        (F.col("m2") / 2).cast("bigint").alias("n_edges"),
        F.round(
            F.when(den != 0.0, num / den),
            6,
        ).alias("assortativity"),
    )


def functional_violations(triples: DataFrame) -> DataFrame:
    """(predicate, n_subjects, n_objects, func_violations, inv_violations,
    func_ppm, inv_ppm): ontology consistency profiling — for each
    predicate, how many subjects assert MORE THAN ONE distinct object
    (violating a functional-property reading, owl:FunctionalProperty) and
    how many objects are asserted by more than one distinct subject
    (violating the inverse-functional reading). The standard KG-quality
    pass for deciding which predicates are safe to treat as keys /
    merge signals.

    Two (predicate, endpoint)-keyed count-distinct aggregations + one
    predicate-keyed rollup each + one broadcast-size join; ppm shares are
    exact integer arithmetic (x*1e6 DIV n).
    """
    spo = triples.select("subject", "predicate", "object").distinct()
    fwd = (
        spo.groupBy("predicate", "subject")
        .agg(F.count(F.lit(1)).alias("n_obj"))
        .groupBy("predicate")
        .agg(
            F.count(F.lit(1)).alias("n_subjects"),
            F.sum((F.col("n_obj") > 1).cast("long")).alias("func_violations"),
        )
    )
    inv = (
        spo.groupBy("predicate", "object")
        .agg(F.count(F.lit(1)).alias("n_subj"))
        .groupBy("predicate")
        .agg(
            F.count(F.lit(1)).alias("n_objects"),
            F.sum((F.col("n_subj") > 1).cast("long")).alias("inv_violations"),
        )
    )
    return fwd.join(inv, "predicate").select(
        "predicate",
        F.col("n_subjects").cast("long").alias("n_subjects"),
        F.col("n_objects").cast("long").alias("n_objects"),
        F.col("func_violations").cast("long").alias("func_violations"),
        F.col("inv_violations").cast("long").alias("inv_violations"),
        F.expr("(func_violations * 1000000) DIV n_subjects").alias("func_ppm"),
        F.expr("(inv_violations * 1000000) DIV n_objects").alias("inv_ppm"),
    )


def cocitation(
    edges: DataFrame,
    min_count: int = 2,
    max_fanout: int = 64,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(a, b, n_common): co-citation strength (Small, JASIS 1973) — pairs
    of targets cited by at least ``min_count`` common sources, ordered
    pairs canonicalized a < b. The directed sibling of the Adamic-Adar
    wedge in :func:`link_predict`: raw common-source counts on the
    citation direction, the classic "related pages/papers" signal.

    Bibliographic coupling (Kessler 1963) is the same operator on the
    transposed edge list — pass edges with src/dst swapped.

    Sources citing more than ``max_fanout`` targets are dropped before
    the wedge self-join (hub guard: an index page citing 10k URLs would
    contribute 50M wedges and zero signal). One distinct, one fanout
    aggregation + semi-join, one src-keyed self-join, one pair-keyed
    count — all key-partitioned shuffles.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ok = e.groupBy("src").agg(F.count(F.lit(1)).alias("_f")).filter(
        F.col("_f") <= max_fanout
    )
    ee = e.join(ok.select("src"), "src", "left_semi")
    l = ee.select("src", F.col("dst").alias("a"))
    r = ee.select("src", F.col("dst").alias("b"))
    return (
        l.join(r, "src")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_count)
    )


def transe_score(triples: DataFrame, dim: int = 8) -> DataFrame:
    """(subject, predicate, object, transe_score): deterministic TransE
    plausibility scoring (Bordes et al., NeurIPS 2013): score =
    sum_k |h_k + r_k - t_k| over integer embedding components derived
    from the portable 48-bit hash (``_h48(name, k) % 2001 - 1000``),
    entity and relation vocabularies salted apart. Lower = more
    plausible under the translation model; the scoring half of the
    training loop whose negative-sampling half is :func:`kg_negatives`.

    Vectors are materialized per DISTINCT entity/predicate (vocab-sized,
    not triple-sized — the 100 TB shape), attached with three
    broadcast-friendly equi-joins, and reduced with zip_with/aggregate
    entirely in int64 — no floats anywhere, so the ranking is exactly
    reproducible.
    """
    sep = F.lit("\x1f")

    def vec(name_col, salt):
        def comp(k):
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            name_col, sep, F.lit(salt), sep, k.cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            return h % 2001 - 1000

        return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)

    # Checkpoint the deduplicated triple set ONCE (it feeds four branches:
    # the join spine plus all three vocab derivations); do NOT checkpoint
    # ents/rels themselves — re-joining projections of a checkpointed
    # LogicalRDD back onto its own source trips a Spark 4.1 attribute-
    # binding bug ("Could not find predicate#N in [name,v]") on small
    # inputs where every join broadcasts.
    spo = (
        triples.select("subject", "predicate", "object")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ents = (
        spo.select(F.col("subject").alias("name"))
        .unionByName(spo.select(F.col("object").alias("name")))
        .distinct()
        .select("name", vec(F.col("name"), "ent").alias("v"))
    )
    rels = (
        spo.select(F.col("predicate").alias("name"))
        .distinct()
        .select("name", vec(F.col("name"), "rel").alias("v"))
    )
    hv = ents.select(F.col("name").alias("subject"), F.col("v").alias("_h"))
    tv = ents.select(F.col("name").alias("object"), F.col("v").alias("_t"))
    rv = rels.select(F.col("name").alias("predicate"), F.col("v").alias("_r"))
    diff = F.zip_with(
        F.zip_with(F.col("_h"), F.col("_r"), lambda a, b: a + b),
        F.col("_t"),
        lambda a, b: F.abs(a - b),
    )
    return (
        spo.join(F.broadcast(hv), "subject")
        .join(F.broadcast(rv), "predicate")
        .join(F.broadcast(tv), "object")
        .select(
            "subject", "predicate", "object",
            F.aggregate(
                diff, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("transe_score"),
        )
    )


def predicate_symmetry(triples: DataFrame, min_edges: int = 2) -> DataFrame:
    """(predicate, n_edges, n_sym, sym_ppm): symmetric-predicate discovery
    — for each predicate, the share of its distinct (s, o) edges whose
    reverse (o, s) also carries the SAME predicate. An ontology-learning
    profile (schema induction from data, the empirical half of
    functional_violations' declared-constraint check): predicates near
    1e6 ppm behave as symmetric relations ("related to"), near 0 as
    strictly directed ("part of").

    One distinct + one self-equi-join on (predicate, reversed pair) +
    one predicate-keyed agg; self-loops count as trivially symmetric
    (their reverse is themselves), which is the honest reading.
    """
    spo = triples.select("subject", "predicate", "object").distinct()
    spo = spo.localCheckpoint(eager=True)
    rev = spo.select(
        F.col("object").alias("subject"),
        "predicate",
        F.col("subject").alias("object"),
        F.lit(1).alias("_r"),
    )
    return (
        spo.join(rev, ["subject", "predicate", "object"], "left")
        .groupBy("predicate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.coalesce("_r", F.lit(0))).cast("long").alias("n_sym"),
        )
        .filter(F.col("n_edges") >= min_edges)
        .select(
            "predicate", "n_edges", "n_sym",
            F.expr("(n_sym * 1000000) DIV n_edges").alias("sym_ppm"),
        )
    )


def predicate_inverses(
    triples: DataFrame, min_support: int = 2
) -> DataFrame:
    """(predicate, inverse, n_support, n_p, conf_ppm): inverse-predicate
    rule mining — AMIE-style rules q(b, a) <= p(a, b) with support =
    |{(a,b): p(a,b) and q(b,a)}| and confidence = support / |p| (PCA-free
    denominator; the rule_mining sibling for the inverse shape, distinct
    predicates only — the p = q diagonal is predicate_symmetry's job).

    One distinct + one equi-join of the edge set against its reversal on
    the (subject, object) pair + one (p, q)-keyed agg; join fan-out is
    bounded by pair multiplicity across predicates (the predicate
    vocabulary is schema-sized).
    """
    spo = triples.select("subject", "predicate", "object").distinct()
    spo = spo.localCheckpoint(eager=True)
    rev = spo.select(
        F.col("object").alias("subject"),
        F.col("predicate").alias("inverse"),
        F.col("subject").alias("object"),
    )
    sup = (
        spo.join(rev, ["subject", "object"])
        .filter(F.col("predicate") != F.col("inverse"))
        .groupBy("predicate", "inverse")
        .agg(F.count(F.lit(1)).cast("long").alias("n_support"))
        .filter(F.col("n_support") >= min_support)
    )
    np_ = spo.groupBy("predicate").agg(
        F.count(F.lit(1)).cast("long").alias("n_p")
    )
    return sup.join(F.broadcast(np_), "predicate").select(
        "predicate", "inverse", "n_support", "n_p",
        F.expr("(n_support * 1000000) DIV n_p").alias("conf_ppm"),
    )


def topological_layers(
    triples: DataFrame, rounds: int = 4
) -> DataFrame:
    """(entity, layer): bounded topological layering — synchronous
    zero-in-degree peeling (Kahn's algorithm, the distributed variant:
    every currently-source node peels per round, so layer = longest
    incoming path length for DAG nodes). Nodes still unpeeled after
    ``rounds`` get layer -1: the cyclic core plus anything deeper than
    the bound — the is-my-ontology-a-DAG diagnostic that complements
    functional_violations (a "subclass of" hierarchy should layer
    cleanly; a -1 residue inside it is a cycle to fix).

    Per round: one distinct-dst anti-join (the new layer) + two
    anti/semi joins shrinking the node and edge sets, each
    localCheckpoint'd — the kcore peeling shape, O(rounds) fixed plan
    depth.
    """
    e = (
        triples.select(
            F.col("subject").alias("src"), F.col("object").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = None
    for k in range(rounds):
        dsts = e.select(F.col("dst").alias("node")).distinct()
        zero = nodes.join(dsts, "node", "left_anti").localCheckpoint(
            eager=True
        )
        layer = zero.select(
            F.col("node").alias("entity"), F.lit(k).cast("long").alias("layer")
        )
        out = layer if out is None else out.unionByName(layer)
        nodes = nodes.join(zero, "node", "left_anti").localCheckpoint(
            eager=True
        )
        e = e.join(
            zero.withColumnRenamed("node", "src"), "src", "left_anti"
        ).localCheckpoint(eager=True)
    residue = nodes.select(
        F.col("node").alias("entity"), F.lit(-1).cast("long").alias("layer")
    )
    return out.unionByName(residue)


def degree_distribution(triples: DataFrame) -> DataFrame:
    """(bucket, lo_degree, n_nodes): log2-bucketed undirected degree
    histogram of the KG — the scale-free sanity check (a web-ish graph
    shows a heavy power-law tail; a bell-shaped histogram says the
    extractor is emitting template noise, a single giant bucket says a
    hub exploded). Mergeable counter monoid like the quantile sketch;
    bucket = binary length of the degree (distinct-neighbor count).
    """
    e = triples.select(
        F.col("subject").alias("a"), F.col("object").alias("b")
    )
    und = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    bucket = (
        F.length(F.conv(F.col("deg").cast("string"), 10, 2)) - 1
    ).cast("long")
    return (
        deg.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .select(
            "bucket",
            F.expr("CAST(pow(2, bucket) AS BIGINT)").alias("lo_degree"),
            "n_nodes",
        )
    )


def distmult_score(triples: DataFrame, dim: int = 8) -> DataFrame:
    """(subject, predicate, object, distmult_score): deterministic
    DistMult plausibility scoring (Yang et al., ICLR 2015): score =
    sum_k h_k * r_k * t_k — the bilinear-diagonal sibling of
    :func:`transe_score` (same hash-derived integer vectors, same vocab
    tables), capturing SYMMETRIC relational patterns TransE cannot
    (DistMult scores (s, p, o) and (o, p, s) identically by
    construction). Shipping both scorers is the standard KG-embedding
    ensemble move; disagreement between them flags relation types whose
    geometry neither model fits.

    Integer bounds: each component is in [-1000, 1000], so one product
    is <= 1e9 and the dim-8 sum <= 8e9 — exact in int64, no floats,
    hash-reproducible. Same plan shape as transe_score: vocab-sized
    vector materialization + three broadcast equi-joins + a zip_with
    reduction; one checkpoint on the shared spo spine (NOT on the vocab
    projections — the Spark 4.1 attribute-binding trap documented
    there).
    """
    sep = F.lit("\x1f")

    def vec(name_col, salt):
        def comp(k):
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            name_col, sep, F.lit(salt), sep, k.cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            return h % 2001 - 1000

        return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)

    spo = (
        triples.select("subject", "predicate", "object")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ents = (
        spo.select(F.col("subject").alias("name"))
        .unionByName(spo.select(F.col("object").alias("name")))
        .distinct()
        .select("name", vec(F.col("name"), "ent").alias("v"))
    )
    rels = (
        spo.select(F.col("predicate").alias("name"))
        .distinct()
        .select("name", vec(F.col("name"), "rel").alias("v"))
    )
    hv = ents.select(F.col("name").alias("subject"), F.col("v").alias("_h"))
    tv = ents.select(F.col("name").alias("object"), F.col("v").alias("_t"))
    rv = rels.select(F.col("name").alias("predicate"), F.col("v").alias("_r"))
    prod = F.zip_with(
        F.zip_with(F.col("_h"), F.col("_r"), lambda a, b: a * b),
        F.col("_t"),
        lambda a, b: a * b,
    )
    return (
        spo.join(F.broadcast(hv), "subject")
        .join(F.broadcast(rv), "predicate")
        .join(F.broadcast(tv), "object")
        .select(
            "subject", "predicate", "object",
            F.aggregate(
                prod, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("distmult_score"),
        )
    )


def link_prediction_eval(
    triples: DataFrame,
    dim: int = 8,
    test_mod: int = 8,
    model: str = "transe",
) -> DataFrame:
    """(predicate, n_test, mrr_micro, hits1, hits3, hits10): FILTERED
    link-prediction evaluation (the Bordes et al. protocol every KG
    embedding paper reports): a deterministic 1/test_mod sample of
    triples is held out as the test set; for each test (h, r, t) the
    true tail is ranked against every entity e by the chosen model's
    score s(h, r, e) — ``model="transe"`` (sum |h+r-e|, lower better) or
    ``model="distmult"`` (sum h*r*e, higher better; negated internally
    so one lower-is-better rank path serves both) — EXCLUDING candidates
    that form another true triple (h, r, e): the "filtered" setting, so
    known facts never count as errors. rank ties break by entity name,
    so ranks are deterministic; reciprocal rank freezes to
    1e6 DIV rank int64 micro-units BEFORE the per-predicate mean
    (integer end to end — hash-reproducible). Running both models over
    the same test sample is the standard diagnostic pair: symmetric
    relations crater TransE MRR but not DistMult.

    This is the evaluation half that closes the KG-embedding loop:
    :func:`transe_score` scores, :func:`kg_negatives` corrupts,
    this ranks. Per-predicate MRR/Hits@k is the standard diagnostic for
    WHICH relation types the geometry fails on (1-N relations crater
    tail-ranking MRR; symmetric ones crater TransE but not DistMult).

    Scale shape: candidate generation is test x |E| — the protocol's
    inherent cost. Both factors are bounded by design: the test side is
    a 1/test_mod hash sample (eval never needs the full corpus), and
    the entity side is the vocab-sized vector table broadcast to it
    (same broadcast-nested-loop shape as IVF centroid assignment).
    Per-test-triple rank reduction is one hash agg keyed on the test
    triple. At production vocab sizes, bound the candidate side by
    relation-type blocks or :func:`kg_negatives` samples — documented
    knob, same join tree.
    """
    sep = F.lit("\x1f")

    def vec(name_col, salt):
        def comp(k):
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            name_col, sep, F.lit(salt), sep, k.cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            return h % 2001 - 1000

        return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)

    spo = (
        triples.select("subject", "predicate", "object")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ents = (
        spo.select(F.col("subject").alias("name"))
        .unionByName(spo.select(F.col("object").alias("name")))
        .distinct()
        .select("name", vec(F.col("name"), "ent").alias("v"))
        .localCheckpoint(eager=True)
    )
    rels = spo.select(F.col("predicate").alias("name")).distinct().select(
        "name", vec(F.col("name"), "rel").alias("v")
    )
    gate = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("subject"), sep, F.col("predicate"), sep,
                        F.col("object"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % test_mod
        == 0
    )
    test = spo.filter(gate)
    hv = ents.select(F.col("name").alias("subject"), F.col("v").alias("_h"))
    rv = rels.select(F.col("name").alias("predicate"), F.col("v").alias("_r"))
    tv = ents.select(F.col("name").alias("object"), F.col("v").alias("_t"))
    # pre-combine h and r once per test triple (h+r for TransE, h*r for
    # DistMult); score(e) is then one zip_with against each candidate
    # vector. DistMult is higher-is-better, so its score is NEGATED to
    # ride the same lower-is-better rank path.
    if model == "transe":
        hr = F.zip_with(F.col("_h"), F.col("_r"), lambda a, b: a + b)

        def reduce_(hr_col, vcol):
            return F.aggregate(
                F.zip_with(hr_col, vcol, lambda a, b: F.abs(a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
    elif model == "distmult":
        hr = F.zip_with(F.col("_h"), F.col("_r"), lambda a, b: a * b)

        def reduce_(hr_col, vcol):
            return -F.aggregate(
                F.zip_with(hr_col, vcol, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
    else:
        raise ValueError(f"unknown model: {model!r}")
    scored_true = (
        test.join(F.broadcast(hv), "subject")
        .join(F.broadcast(rv), "predicate")
        .join(F.broadcast(tv), "object")
        .select(
            "subject", "predicate", "object", hr.alias("_hr"),
            reduce_(hr, F.col("_t")).alias("_s_true"),
        )
    )
    # explicit broadcast cross join: the eval protocol's test x |E|
    # candidate grid (both sides bounded — see docstring scale note)
    cand = scored_true.crossJoin(
        F.broadcast(ents.select(F.col("name").alias("_e"), F.col("v").alias("_ev")))
    )
    s_cand = reduce_(F.col("_hr"), F.col("_ev"))
    known = spo.select(
        "subject", "predicate", F.col("object").alias("_e"),
        F.lit(1).alias("_known"),
    )
    ranked = (
        cand.select(
            "subject", "predicate", "object", "_s_true", "_e",
            s_cand.alias("_s"),
        )
        .join(known, ["subject", "predicate", "_e"], "left")
        .filter(  # filtered protocol: drop other TRUE tails (keep t itself)
            F.col("_known").isNull() | (F.col("_e") == F.col("object"))
        )
        .groupBy("subject", "predicate", "object")
        .agg(
            (
                F.lit(1).cast("long")
                + F.sum(
                    F.when(
                        (F.col("_s") < F.col("_s_true"))
                        | (
                            (F.col("_s") == F.col("_s_true"))
                            & (F.col("_e") < F.col("object"))
                        ),
                        1,
                    ).otherwise(0)
                ).cast("long")
            ).alias("_rank")
        )
    )
    return (
        ranked.groupBy("predicate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.expr("1000000 DIV _rank")).cast("long").alias("_rr_sum"),
            F.sum(F.when(F.col("_rank") <= 1, 1).otherwise(0))
            .cast("long")
            .alias("hits1"),
            F.sum(F.when(F.col("_rank") <= 3, 1).otherwise(0))
            .cast("long")
            .alias("hits3"),
            F.sum(F.when(F.col("_rank") <= 10, 1).otherwise(0))
            .cast("long")
            .alias("hits10"),
        )
        .select(
            "predicate", "n_test",
            F.expr("_rr_sum DIV n_test").alias("mrr_micro"),
            "hits1", "hits3", "hits10",
        )
    )


def match_property_path(
    triples: DataFrame,
    path,
    max_depth: int = 3,
) -> DataFrame:
    """(src, dst): SPARQL 1.1 property-path evaluation with set semantics
    — the navigational layer :func:`match_basic_pattern` (single-hop BGPs)
    cannot express. ``path`` is a small AST of nested tuples:

    * ``"pred"``                 — one edge with that predicate
    * ``("inv", p)``             — inverse path (``^p``)
    * ``("seq", p1, p2, ...)``   — sequence (``p1/p2``)
    * ``("alt", p1, p2, ...)``   — alternation (``p1|p2``)
    * ``("plus", p)``            — one-or-more (``p+``), expanded to
      ``max_depth`` hops (bounded, like the inference stage's one-step
      closure: unbounded recursion is not a 100 TB-safe primitive, and
      SPARQL engines bound or materialize it too)

    Compilation is structural: every node returns a distinct (src, dst)
    pair set; ``seq`` is a hash equi-join on the shared midpoint, ``alt``
    a union + distinct, ``inv`` a projection swap, ``plus`` ``max_depth``
    chained equi-joins unioned then distinct-ed. Catalyst sees a plain
    join/union tree — predicate constants push into the scan, AQE picks
    broadcast sides. Depth is bounded by the AST, so plan size is static.

    Set semantics: each combinator distincts its output, so path
    multiplicity never fans out multiplicatively down the tree (the
    W3C spec's semantics for paths is also set-based).
    """

    def preds_of(node) -> set[str]:
        if isinstance(node, str):
            return {node}
        out: set[str] = set()
        for a in node[1:]:
            out |= preds_of(a)
        return out

    # prune to the predicates the path actually names BEFORE the
    # distinct + checkpoint: the IN-filter pushes into the scan, and the
    # materialized working set is the named-predicate edges, not the
    # whole store (a path touching one rare predicate must not shuffle
    # the full KG)
    spo = (
        triples.select("subject", "predicate", "object")
        .filter(F.col("predicate").isin(*sorted(preds_of(path))))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def edge(pred: str) -> DataFrame:
        return spo.filter(F.col("predicate") == pred).select(
            F.col("subject").alias("src"), F.col("object").alias("dst")
        ).distinct()

    def seq2(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.join(
                b.select(F.col("src").alias("_mid"), F.col("dst").alias("_d")),
                a["dst"] == F.col("_mid"),
            )
            .select("src", F.col("_d").alias("dst"))
            .distinct()
        )

    def compile_(node) -> DataFrame:
        if isinstance(node, str):
            return edge(node)
        op, *args = node
        if op == "inv":
            r = compile_(args[0])
            return r.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        if op == "seq":
            out = compile_(args[0])
            for a in args[1:]:
                out = seq2(out, compile_(a))
            return out
        if op == "alt":
            out = compile_(args[0])
            for a in args[1:]:
                out = out.unionByName(compile_(a))
            return out.distinct()
        if op == "plus":
            base = compile_(args[0]).localCheckpoint(eager=True)
            out, hop = base, base
            for _ in range(max_depth - 1):
                hop = seq2(hop, base)
                out = out.unionByName(hop)
            return out.distinct()
        raise ValueError(f"unknown path op: {op!r}")

    return compile_(path)


def align_entities(
    kg_a: DataFrame,
    kg_b: DataFrame,
    min_score: int = 1,
) -> DataFrame:
    """(entity_a, entity_b, n_shared, score_ppm): entity alignment
    between two KGs (e.g. two crawl batches before a merge — the
    incremental-construction step after :func:`kg_diff` tells you the
    edge delta and incr_mapping extends the canonical mapping): for each
    entity in A, the best-matching entity in B by shared relational
    context — the count of exactly-shared outgoing ``(predicate,
    object)`` and incoming ``(subject, predicate)`` facts — normalized
    by A's context size (ppm). Ties break by (score desc, entity_b asc);
    one row per aligned A-entity.

    Candidate generation is the context join itself: entities only pair
    if they SHARE a concrete fact partner, so the pair space is bounded
    by fact-key multiplicity (an equi-join on (predicate, object) /
    (subject, predicate) keys — the token-blocking idea applied to graph
    context, never an A x B cross product). Hub keys fan out like any
    hot join key; cap them upstream with the same max_block_size
    discipline as lexical inference if a predicate-object pair is shared
    by thousands of entities.

    Scores are exact integer counts; the final per-entity argmax is a
    max_by over a struct ordering — no windows over unbounded
    partitions.
    """
    def ctx(kg: DataFrame, side: str) -> DataFrame:
        spo = kg.select("subject", "predicate", "object").distinct()
        out = spo.select(
            F.col("subject").alias(side),
            F.concat(F.lit("o\x1f"), "predicate", F.lit("\x1f"), "object")
            .alias("fact"),
        )
        inc = spo.select(
            F.col("object").alias(side),
            F.concat(F.lit("i\x1f"), "subject", F.lit("\x1f"), "predicate")
            .alias("fact"),
        )
        return out.unionByName(inc).distinct()

    ca = ctx(kg_a, "entity_a").localCheckpoint(eager=True)
    cb = ctx(kg_b, "entity_b")
    sizes = ca.groupBy("entity_a").agg(
        F.count(F.lit(1)).cast("long").alias("_n_ctx")
    )
    shared = (
        ca.join(cb, "fact")
        .groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_score)
    )
    scored = shared.join(F.broadcast(sizes), "entity_a").select(
        "entity_a", "entity_b", "n_shared",
        F.expr("(n_shared * 1000000) DIV _n_ctx").alias("score_ppm"),
    )
    # argmax with an ASC name tie-break can't ride one max_by struct
    # (struct ordering would need a DESC-then-ASC mix); two map-side-
    # combined aggs on the same key do it losslessly: keep all
    # best-score rows, then min(entity_b).
    top = scored.join(
        scored.groupBy("entity_a").agg(F.max("score_ppm").alias("_best")),
        "entity_a",
    ).filter(F.col("score_ppm") == F.col("_best"))
    return (
        top.groupBy("entity_a")
        .agg(
            F.min("entity_b").alias("entity_b"),
            # n_shared must come from the SELECTED row: equal score_ppm
            # with different n_shared is possible once n_ctx > 1e6 (the
            # DIV quantization), and a bare max() could mix rows
            F.min_by("n_shared", "entity_b").alias("n_shared"),
            F.max("score_ppm").alias("score_ppm"),
        )
    )


def validate_shapes(triples: DataFrame, shapes) -> DataFrame:
    """(shape_id, entity, check_kind, pred, have, want): SHACL-style
    cardinality validation over the open-domain KG — the declarative QA
    gate that closes the construct->validate loop (ontology_check tests
    declared domain/range pairs; this tests per-entity predicate
    cardinalities, the sh:minCount / sh:maxCount core of W3C SHACL).

    ``shapes`` is a list of ``(shape_id, target_pred, check_kind, pred,
    n)``: for every entity that has at least one outgoing ``target_pred``
    edge (sh:targetSubjectsOf), require ``min_count``/``max_count`` n
    distinct ``pred`` objects. Output is VIOLATIONS ONLY (bounded by the
    violating-entity count, not the KG), with the observed count so the
    row is actionable.

    Plan: triples distinct once; per shape one filtered distinct target
    projection left-joined to one filtered per-entity count agg — the
    shape list is schema-sized, so the union is a static plan. Counts
    are over distinct (s, p, o), so mention multiplicity never trips a
    max_count.
    """
    spo = (
        triples.select("subject", "predicate", "object")
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = None
    for sid, target, kind, pred, n in shapes:
        if kind not in ("min_count", "max_count"):
            raise ValueError(f"unknown check_kind: {kind!r}")
        targets = (
            spo.filter(F.col("predicate") == target)
            .select(F.col("subject").alias("entity"))
            .distinct()
        )
        cnt = (
            spo.filter(F.col("predicate") == pred)
            .groupBy(F.col("subject").alias("entity"))
            .agg(F.count(F.lit(1)).cast("long").alias("_have"))
        )
        have = F.coalesce(F.col("_have"), F.lit(0).cast("long"))
        joined = targets.join(cnt, "entity", "left")
        bad = joined.filter(
            have < n if kind == "min_count" else have > n
        ).select(
            F.lit(sid).cast("long").alias("shape_id"),
            "entity",
            F.lit(kind).alias("check_kind"),
            F.lit(pred).alias("pred"),
            have.alias("have"),
            F.lit(n).cast("long").alias("want"),
        )
        out = bad if out is None else out.unionByName(bad)
    if out is None:
        raise ValueError("shapes must be non-empty")
    return out


def complex_score(triples: DataFrame, dim: int = 8) -> DataFrame:
    """(subject, predicate, object, complex_score): deterministic ComplEx
    plausibility scoring (Trouillon et al., ICML 2016) — completes the
    standard trio next to :func:`transe_score` (directional translation)
    and :func:`distmult_score` (symmetric bilinear): complex-valued
    embeddings score Re(<h, r, conj(t)>), which is ASYMMETRIC in (h, t)
    whenever r has a nonzero imaginary part, so anti-symmetric relations
    ("parent of") are representable — the case both siblings fail.

    Real/imaginary components come from the same portable 48-bit hash
    with distinct salts (ent/enti, rel/reli). Per-dim score =
    rr*(hr*tr + hi*ti) + ri*(hi*tr - hr*ti) (the standard expansion;
    the ri term flips sign under h<->t swap — that is the asymmetry);
    each term <= 1e9, the 4*dim sum <= 3.2e10 — exact int64, no floats,
    hash-reproducible. Same plan as the siblings: vocab-sized vector
    materialization, three broadcast equi-joins, zip_with reduction,
    one checkpoint on the shared spo spine.
    """
    sep = F.lit("\x1f")

    def vec(name_col, salt):
        def comp(k):
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            name_col, sep, F.lit(salt), sep, k.cast("string")
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            return h % 2001 - 1000

        return F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp)

    spo = (
        triples.select("subject", "predicate", "object")
        .distinct()
        .localCheckpoint(eager=True)
    )
    names = (
        spo.select(F.col("subject").alias("name"))
        .unionByName(spo.select(F.col("object").alias("name")))
        .distinct()
    )
    ents = names.select(
        "name", vec(F.col("name"), "ent").alias("re"),
        vec(F.col("name"), "enti").alias("im"),
    )
    rels = spo.select(F.col("predicate").alias("name")).distinct().select(
        "name", vec(F.col("name"), "rel").alias("re"),
        vec(F.col("name"), "reli").alias("im"),
    )
    hv = ents.select(
        F.col("name").alias("subject"),
        F.col("re").alias("_hr"), F.col("im").alias("_hi"),
    )
    tv = ents.select(
        F.col("name").alias("object"),
        F.col("re").alias("_tr"), F.col("im").alias("_ti"),
    )
    rv = rels.select(
        F.col("name").alias("predicate"),
        F.col("re").alias("_rr"), F.col("im").alias("_ri"),
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def at(col, i):
        return F.element_at(F.col(col), i + 1)

    term = F.transform(
        idx,
        lambda i: at("_hr", i) * at("_rr", i) * at("_tr", i)
        + at("_hi", i) * at("_rr", i) * at("_ti", i)
        + at("_hi", i) * at("_ri", i) * at("_tr", i)
        - at("_hr", i) * at("_ri", i) * at("_ti", i),
    )
    return (
        spo.join(F.broadcast(hv), "subject")
        .join(F.broadcast(rv), "predicate")
        .join(F.broadcast(tv), "object")
        .select(
            "subject", "predicate", "object",
            F.aggregate(
                term, F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("complex_score"),
        )
    )
