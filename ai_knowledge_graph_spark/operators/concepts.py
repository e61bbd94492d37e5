"""Query-side support operators: concept extraction, relevance filtering,
and the LLM-prompt assembly joins.

Reference parity map:
  extract_concepts            <- GraphRAGRetriever._extract_concepts
                                 (graph_retriever.py:436-450, P5)
  term_relevance              <- audit_quality.is_ict_related (audit_quality.py:7-33, F10)
  candidate_pairs_in_community<- within-community disconnected-pair scan
                                 (entity_standardization.py:569-591, J5)
  context_triples             <- context semi-join + cap
                                 (entity_standardization.py:597-609, J6)
  per_relation_cap            <- RAG context item cap (rag_chat.py:240-246, W5)

The reference iterates Python sets for J5 ordering (nondeterministic across
interpreters); these rebuilds use total lexicographic orders — they feed LLM
prompt assembly (config-gated off in parity runs), not the P/R-gated output.

Scale notes: the concept vocabulary broadcasts (it is the *node-name* set, at
worst the entity vocabulary); the containment join is a broadcast
nested-loop whose build side is the vocab, never a shuffle of the corpus.
J5 pairs are generated per-community and the candidate space is bounded by
the window rank, so no global quadratic blowup survives the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_concepts(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    concept_col: str = "entity",
) -> DataFrame:
    """(doc_id, concept) — vocabulary names found in each document (P5).

    Reference semantics (graph_retriever.py:436-450): skip names < 3 chars;
    match if the name itself OR its underscore->space form occurs in the
    lowered text; result is a set (distinct).
    """
    names = (
        vocab.select(F.col(concept_col).alias("concept"))
        .filter(F.length("concept") >= 3)
        .distinct()
        .withColumn("spaced", F.replace(F.col("concept"), F.lit("_"), F.lit(" ")))
    )
    lowered = docs.select(
        F.col(id_col).alias("doc_id"), F.lower(F.col(text_col)).alias("tl")
    )
    return (
        lowered.join(
            F.broadcast(names),
            F.col("tl").contains(F.col("concept"))
            | F.col("tl").contains(F.col("spaced")),
        )
        .select("doc_id", "concept")
        .distinct()
    )


def term_relevance(
    triples: DataFrame, terms: list[str]
) -> DataFrame:
    """Triples where subject OR object contains any domain term (F10,
    audit_quality.py:30-33: ``any(term in t.lower().strip())``)."""
    term_arr = F.array(*[F.lit(t) for t in sorted(terms)])

    def _hit(col):
        target = F.trim(F.lower(col))
        return F.exists(term_arr, lambda t: target.contains(t))

    return triples.withColumn(
        "relevant", _hit(F.col("subject")) | _hit(F.col("object"))
    )


def candidate_pairs_in_community(
    triples: DataFrame, components: DataFrame, cap: int = 10
) -> DataFrame:
    """(component_rep, a, b) — unconnected same-community ordered pairs that
    share a word or contain each other, capped per community (J5).

    ``components`` is (entity, component_rep). The reference's dict-iteration
    pair order is replaced by a lexicographic total order before the cap.
    """
    feats = components.select(
        "entity",
        "component_rep",
        F.filter(F.split(F.lower("entity"), r"\s+"), lambda w: w != F.lit("")).alias(
            "words"
        ),
        F.lower("entity").alias("elow"),
    )
    a = feats.select(
        F.col("component_rep").alias("cr"),
        F.col("entity").alias("a"),
        F.col("words").alias("aw"),
        F.col("elow").alias("al"),
    )
    b = feats.select(
        F.col("component_rep").alias("cr"),
        F.col("entity").alias("b"),
        F.col("words").alias("bw"),
        F.col("elow").alias("bl"),
    )
    pairs = a.join(b, "cr").filter(F.col("a") != F.col("b"))
    edges = triples.select(
        F.col("subject").alias("a"), F.col("object").alias("b")
    ).distinct()
    pairs = pairs.join(edges, ["a", "b"], "left_anti")
    related = (
        (F.size(F.array_intersect("aw", "bw")) > 0)
        | F.col("bl").contains(F.col("al"))
        | F.col("al").contains(F.col("bl"))
    )
    w = Window.partitionBy("cr").orderBy(F.asc("a"), F.asc("b"))
    return (
        pairs.filter(related)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select(F.col("cr").alias("component_rep"), "a", "b")
    )


def context_triples(
    triples: DataFrame, entities: DataFrame, cap: int = 20
) -> DataFrame:
    """Triples touching any entity of interest, first ``cap`` in list order
    (J6, entity_standardization.py:597-609). ``entities`` is a one-column
    DataFrame; list order = the engine's positional key (url, chunk, t_idx).
    """
    ents = F.broadcast(entities.select(F.col(entities.columns[0]).alias("e")).distinct())
    hit = triples.join(
        ents, (F.col("subject") == F.col("e")) | (F.col("object") == F.col("e")), "left_semi"
    )
    w = Window.orderBy(
        F.col("url").asc_nulls_first(),
        F.col("chunk").asc_nulls_first(),
        F.col("t_idx").asc_nulls_first(),
        F.col("subject").asc(),
        F.col("predicate").asc(),
        F.col("object").asc(),
    )
    return (
        hit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )


def per_relation_cap(
    triples: DataFrame, cap: int = 4
) -> DataFrame:
    """<= ``cap`` objects per (subject, predicate) group, lexicographic
    survivors (W5, rag_chat.py:240-246)."""
    w = Window.partitionBy("subject", "predicate").orderBy(F.asc("object"))
    return (
        triples.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )


def entity_cooccurrence_pmi(
    std_triples: DataFrame,
    min_pair_count: int = 2,
    context_cols: tuple[str, str] = ("doc_id", "chunk"),
) -> DataFrame:
    """(entity_a, entity_b, pair_count, pmi, npmi): chunk-windowed entity
    association mining — the classic co-occurrence signal a KG layers on
    top of its explicit edges (Church & Hanks 1990 PMI; Bouma 2009 NPMI).

    A "context" is a (doc_id, chunk); an entity occurs in a context if it
    appears as subject or object of any triple there. All counts are exact
    int64; pmi = ln(pair*N / (ca*cb)) and npmi = pmi / ln(N/pair) are the
    only float steps, rounded to 6 (the lm_perplexity precedent). The pair
    self-join is per-context (entities within one chunk only — never a
    global cross product); cost is sum over contexts of k², the standard
    co-occurrence envelope, with ``min_pair_count`` pruning the long tail
    AFTER aggregation (map-side combined).
    """
    ctx = list(context_cols)
    mentions = (
        std_triples.select(
            *ctx,
            F.explode(F.array("subject", "object")).alias("entity"),
        )
        .distinct()
    )
    n_ctx = std_triples.select(*ctx).distinct().count()
    ent_ctx = mentions.groupBy("entity").agg(
        F.count(F.lit(1)).alias("ctx_count")
    )
    a = mentions.select(*ctx, F.col("entity").alias("entity_a"))
    b = mentions.select(*ctx, F.col("entity").alias("entity_b"))
    pairs = (
        a.join(b, ctx)
        .filter(F.col("entity_a") < F.col("entity_b"))
        .groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_count)
    )
    ca = ent_ctx.select(
        F.col("entity").alias("entity_a"), F.col("ctx_count").alias("_ca")
    )
    cb = ent_ctx.select(
        F.col("entity").alias("entity_b"), F.col("ctx_count").alias("_cb")
    )
    pmi = F.log(
        (F.col("pair_count") * F.lit(n_ctx)).cast("double")
        / (F.col("_ca") * F.col("_cb")).cast("double")
    )
    npmi = pmi / F.log(
        F.lit(n_ctx).cast("double") / F.col("pair_count").cast("double")
    )
    return (
        pairs.join(ca, "entity_a")
        .join(cb, "entity_b")
        .select(
            "entity_a",
            "entity_b",
            "pair_count",
            F.round(pmi, 6).alias("pmi"),
            F.round(npmi, 6).alias("npmi"),
        )
    )
