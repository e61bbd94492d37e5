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
