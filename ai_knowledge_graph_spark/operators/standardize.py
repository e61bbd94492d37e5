"""Phase-2 entity standardization as distributed DataFrame transforms.

Reference semantics: entity_standardization.py:33-181 (``standardize_entities``).
The reference is O(n^2) nested Python loops over an in-memory dict; here every
step is a shuffle-bounded Spark op:

  1. valid-triple filter                      -> filter (F1)
  2. unique lowered entities                  -> explode + distinct (A2)
  3. stopword normalization                   -> pandas UDF over *distinct*
                                                 entities only (X3; python
                                                 ``re`` for unicode \\w parity)
  4. canonical form per normalized group      -> count agg + window (A1+W1)
  5. second-pass word-subset / stem merge     -> token- and stem-blocked
                                                 self-joins (J4), assignment
                                                 ordering replayed with a
                                                 window over pair ranks
  6. mapping apply                            -> broadcast left joins (J1)
  7. self-loop filter                         -> filter (F2)

Determinism notes (SURVEY.md §7 D2): the reference leaks Python set iteration
order in the second pass (ties in the length sort) — this build totalizes the
order with a lexicographic tiebreak; the reference-parity test absorbs the
residual divergence in its P/R >= 0.95 tolerance while the engine's own oracle
(oracle/refimpl.py) matches exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import limit_predicate_length, normalize_entity


@F.pandas_udf(T.StringType())
def normalize_entity_udf(s: pd.Series) -> pd.Series:
    # Stays a pandas UDF (python `re`) for unicode \w/\b parity with the
    # reference (entity_standardization.py:82); runs on DISTINCT entities
    # only, so the python stage is tiny relative to the triple table.
    return s.map(normalize_entity)


def limit_predicate_col(col):
    """F3 as a pure SQL expression (JVM-side, codegen'd) — same semantics as
    functions.text.limit_predicate_length: <=3 words pass through *unchanged*
    (original string, whitespace runs preserved), longer predicates keep the
    first 3 words minus a trailing stopword (entity_standardization.py:7-31).
    ``(?U)\\s+`` matches python str.split()'s unicode whitespace handling."""
    col = F.col(col) if isinstance(col, str) else col
    words = F.filter(F.split(col, r"(?U)\s+"), lambda w: w != F.lit(""))
    kept3 = F.slice(words, 1, 3)
    last_kept = F.lower(F.element_at(kept3, 3))
    stop_arr = F.array(
        *[
            F.lit(w)
            for w in ("a", "an", "the", "of", "with", "by", "to", "from", "in", "on", "for")
        ]
    )
    return F.when(F.size(words) <= 3, col).otherwise(
        F.when(
            F.array_contains(stop_arr, last_kept),
            F.array_join(F.slice(words, 1, 2), " "),
        ).otherwise(F.array_join(kept3, " "))
    )


def valid_triples(triples: DataFrame) -> DataFrame:
    """F1: keep rows with all of subject/predicate/object (main.py:61-66)."""
    return triples.filter(
        F.col("subject").isNotNull()
        & F.col("predicate").isNotNull()
        & F.col("object").isNotNull()
    )


def entity_counts(triples: DataFrame) -> DataFrame:
    """A1: (entity, cnt) — occurrences of each lowered entity as subject or
    object, counted per mention (entity_standardization.py:100-108)."""
    return (
        triples.select(
            F.explode(F.array(F.lower("subject"), F.lower("object"))).alias("entity")
        )
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def first_pass_mapping(counts: DataFrame) -> DataFrame:
    """(variant -> standard) via normalized grouping + canonical selection.

    W1 total order: count desc, char-length asc, variant asc — provably the
    reference's effective tie-break (its stable sort at
    entity_standardization.py:111 over insertion order sorted by (-len, lex)
    reduces to exactly this order).
    """
    normalized = counts.withColumn("normalized", normalize_entity_udf(F.col("entity")))
    grouped = normalized.filter(F.col("normalized") != "")  # skip empties (:91)
    w = Window.partitionBy("normalized").orderBy(
        F.desc("cnt"), F.length("entity").asc(), F.asc("entity")
    )
    winners = (
        grouped.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("normalized"), F.col("entity").alias("standard"))
    )
    return grouped.select("entity", "normalized").join(winners, "normalized").select(
        F.col("entity").alias("variant"), "standard"
    )


def _forms_with_features(mapping: DataFrame) -> DataFrame:
    """Distinct standard forms + word/stem features + a total-order rank.

    Rank replays the reference's scan order ``sorted(standard_forms, key=len)``
    (entity_standardization.py:121) with a lexicographic tiebreak.
    """
    forms = mapping.select(F.col("standard").alias("form")).distinct()
    forms = forms.select(
        "form",
        F.array_distinct(F.filter(F.split("form", r"\s+"), lambda w: w != F.lit(""))).alias(
            "words"
        ),
        F.length("form").alias("clen"),
    )
    forms = forms.withColumn(
        "stems",
        F.array_distinct(
            F.transform(
                F.filter(F.col("words"), lambda w: F.length(w) > 4),
                lambda w: F.substring(w, 1, 4),
            )
        ),
    )
    w = Window.orderBy(F.col("clen").asc(), F.col("form").asc())
    # Global rank over standard forms: acceptable because the form set is the
    # *post-merge vocabulary* (orders of magnitude smaller than triples); at
    # extreme scale swap for zipWithIndex on the sorted form table.
    return forms.withColumn("rank", F.row_number().over(w)).localCheckpoint(eager=True)


def second_pass_assignments(mapping: DataFrame) -> DataFrame:
    """Word-subset + shared-stem merges between standard forms (J4).

    Reference: entity_standardization.py:115-155. Pair (e1, e2) with
    rank(e1) < rank(e2):
      - e1.words ⊆ e2.words  -> assign e2 -> e1
      - elif e2.words ⊆ e1.words -> assign e1 -> e2
      - elif shared 4-char stems ratio strictly > 0.5 -> longer (chars) ->
        shorter, char-length tie keeps e1 as target.
    Later pairs overwrite earlier assignments of the same key (dict
    semantics) -> keep the assignment with max (rank_i, rank_j).

    Blocking is lossless: a subset pair shares the subset side's first word;
    a stem pair shares at least one stem. Each blocked join is an equi-join
    (no cross product); AQE splits skewed token blocks at runtime.
    """
    forms = _forms_with_features(mapping)

    lhs = forms.select(
        F.col("form").alias("f1"),
        F.col("words").alias("words1"),
        F.col("stems").alias("stems1"),
        F.col("clen").alias("clen1"),
        F.col("rank").alias("rank1"),
    )
    rhs = forms.select(
        F.col("form").alias("f2"),
        F.col("words").alias("words2"),
        F.col("stems").alias("stems2"),
        F.col("clen").alias("clen2"),
        F.col("rank").alias("rank2"),
    )

    # Block A — subset candidates: the potential-subset side joins its first
    # word against every word of the other side.
    subset_keyed = lhs.select("f1", (F.element_at("words1", 1)).alias("bword"), "rank1")
    rhs_words = rhs.select("f2", F.explode("words2").alias("bword"), "rank2")
    cand_subset = (
        subset_keyed.join(rhs_words, "bword")
        .filter(F.col("f1") != F.col("f2"))
        .select("f1", "f2")
    )
    # Both roles: f1-as-subset-of-f2 and f2-as-subset-of-f1 are produced by
    # swapping; normalize to unordered (by rank) later.

    # Block B — stem candidates: any shared stem.
    lhs_stems = lhs.select("f1", F.explode("stems1").alias("bstem"))
    rhs_stems = rhs.select("f2", F.explode("stems2").alias("bstem"))
    cand_stems = (
        lhs_stems.join(rhs_stems, "bstem")
        .filter(F.col("f1") != F.col("f2"))
        .select("f1", "f2")
    )

    cands = cand_subset.unionByName(cand_stems)
    # Unordered pair, then orient by rank: i = lower rank (earlier in scan).
    pairs = cands.select(
        F.least("f1", "f2").alias("fa"), F.greatest("f1", "f2").alias("fb")
    ).distinct()

    a = forms.select(
        F.col("form").alias("fa"),
        F.col("words").alias("wa"),
        F.col("stems").alias("sa"),
        F.col("clen").alias("la"),
        F.col("rank").alias("ra"),
    )
    b = forms.select(
        F.col("form").alias("fb"),
        F.col("words").alias("wb"),
        F.col("stems").alias("sb"),
        F.col("clen").alias("lb"),
        F.col("rank").alias("rb"),
    )
    feat = pairs.join(a, "fa").join(b, "fb")

    # Orient: e1 = lower rank, e2 = higher rank.
    feat = feat.select(
        F.when(F.col("ra") < F.col("rb"), F.col("fa")).otherwise(F.col("fb")).alias("e1"),
        F.when(F.col("ra") < F.col("rb"), F.col("wa")).otherwise(F.col("wb")).alias("w1"),
        F.when(F.col("ra") < F.col("rb"), F.col("sa")).otherwise(F.col("sb")).alias("s1"),
        F.when(F.col("ra") < F.col("rb"), F.col("la")).otherwise(F.col("lb")).alias("l1"),
        F.least("ra", "rb").alias("r1"),
        F.when(F.col("ra") < F.col("rb"), F.col("fb")).otherwise(F.col("fa")).alias("e2"),
        F.when(F.col("ra") < F.col("rb"), F.col("wb")).otherwise(F.col("wa")).alias("w2"),
        F.when(F.col("ra") < F.col("rb"), F.col("sb")).otherwise(F.col("sa")).alias("s2"),
        F.when(F.col("ra") < F.col("rb"), F.col("lb")).otherwise(F.col("la")).alias("l2"),
        F.greatest("ra", "rb").alias("r2"),
    )

    subset12 = (F.size(F.array_except("w1", "w2")) == 0) & (F.size("w1") > 0)
    subset21 = (F.size(F.array_except("w2", "w1")) == 0) & (F.size("w2") > 0)
    shared_stems = F.size(F.array_intersect("s1", "s2"))
    stem_hit = (shared_stems > 0) & (
        shared_stems / F.greatest(F.size("s1"), F.size("s2")) > F.lit(0.5)
    )

    assigned = feat.select(
        "r1",
        "r2",
        F.when(subset12, F.col("e2"))
        .when(subset21, F.col("e1"))
        .when(stem_hit & (F.col("l1") <= F.col("l2")), F.col("e2"))
        .when(stem_hit, F.col("e1"))
        .alias("key"),
        F.when(subset12, F.col("e1"))
        .when(subset21, F.col("e2"))
        .when(stem_hit & (F.col("l1") <= F.col("l2")), F.col("e1"))
        .when(stem_hit, F.col("e2"))
        .alias("value"),
    ).filter(F.col("key").isNotNull())

    # Dict-overwrite replay: last pair in (r1, r2) loop order wins per key.
    w = Window.partitionBy("key").orderBy(F.desc("r1"), F.desc("r2"))
    return (
        assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "value")
    )


def build_entity_mapping(triples: DataFrame) -> DataFrame:
    """Full (variant -> standard) mapping: first pass overridden by second.

    Reference quirk preserved (entity_standardization.py:153-155): the second
    pass only overrides the mapping *key equal to the old standard form* —
    variants that pointed at the old form keep pointing at it; only exact
    occurrences of the old form itself get the new target.
    """
    counts = entity_counts(triples)
    first = first_pass_mapping(counts)
    second = second_pass_assignments(first)
    return (
        first.join(second, first.variant == second.key, "left")
        .select(
            "variant",
            F.coalesce(second.value, first.standard).alias("standard"),
        )
    )


def apply_standardization(
    triples: DataFrame, mapping: DataFrame, broadcast_mapping: bool = True
) -> DataFrame:
    """J1 + F3 + F2: map entities through the mapping, truncate predicates,
    default chunk to 0, drop self-loops.

    Lookup misses keep the *original-cased* entity (reference
    entity_standardization.py:164-166 ``dict.get`` default) — this happens
    exactly for entities whose normalized form is empty.

    ``broadcast_mapping=True`` forces a broadcast hash join (mapping ≪
    triples, the common case). At web scale where the entity vocabulary
    itself no longer fits an executor, pass False and let AQE pick a
    sort-merge join on the lowered-entity key.
    """
    submap = mapping.select(
        F.col("variant").alias("s_variant"), F.col("standard").alias("s_standard")
    )
    objmap = mapping.select(
        F.col("variant").alias("o_variant"), F.col("standard").alias("o_standard")
    )
    if broadcast_mapping:
        submap, objmap = F.broadcast(submap), F.broadcast(objmap)
    out = (
        triples.join(submap, F.lower(F.col("subject")) == F.col("s_variant"), "left")
        .join(objmap, F.lower(F.col("object")) == F.col("o_variant"), "left")
        .select(
            F.coalesce("s_standard", "subject").alias("subject"),
            limit_predicate_col("predicate").alias("predicate"),
            F.coalesce("o_standard", "object").alias("object"),
            F.col("url"),
            F.coalesce(F.col("chunk"), F.lit(0)).alias("chunk"),  # .get("chunk", 0)
            F.col("t_idx"),
            F.lit(False).alias("inferred"),
        )
    )
    return out.filter(F.col("subject") != F.col("object"))


def standardize_triples(triples: DataFrame, broadcast_mapping: bool = True) -> DataFrame:
    """Phase 2 end-to-end: validate, build mapping, apply, filter.

    ``valid`` and ``mapping`` feed multiple downstream branches; they are
    persisted so the (expensive) upstream extraction plan evaluates once —
    Spark does not share common sub-plans across join branches otherwise.
    """
    # Eager local checkpoints: these feed multiple downstream branches that
    # Spark executes as parallel stages; a lazy persist() races (both branches
    # compute before the cache fills) and re-derives the whole upstream plan.
    valid = valid_triples(triples).localCheckpoint(eager=True)
    mapping = build_entity_mapping(valid).localCheckpoint(eager=True)
    return apply_standardization(valid, mapping, broadcast_mapping=broadcast_mapping)
