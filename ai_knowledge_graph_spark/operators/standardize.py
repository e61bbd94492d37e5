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
    """(variant -> standard, + normalized group key) via normalized grouping
    + canonical selection.

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
    # first() over the ordered window hands every row its group's rank-1
    # entity directly — same winner as the old rn==1 + self-join, with ONE
    # UDF evaluation and one exchange instead of two of each.
    return grouped.select(
        F.col("entity").alias("variant"),
        F.first("entity").over(w).alias("standard"),
        "normalized",
    )


def standard_form_set_rank(mapping: DataFrame) -> DataFrame:
    """(form, set_rank): iteration position of each standard form in the
    reference's ``standard_forms = set(standardized_entities.values())``
    (entity_standardization.py:120).

    Deterministic derivation: ``standardized_entities`` is built group by
    group in group-first-appearance order over the (-len, lex)-sorted entity
    list (:86-113), each group contributing its one standard form — so the
    set's distinct-insertion sequence is the standard forms ordered by their
    group's earliest variant under (-len(variant), variant). A real Python
    set replays that sequence in a PYTHONHASHSEED=0 worker (same seed as the
    subprocess oracle; see inference.entity_set_rank for the rationale).
    Single-task over the *form vocabulary* only — parity-mode cost.
    """
    gkey = mapping.groupBy("normalized").agg(
        F.min(
            F.struct(
                (-F.length("variant")).alias("nl"), F.col("variant").alias("v")
            )
        ).alias("gkey")
    )
    forms = (
        mapping.select("normalized", F.col("standard").alias("form"))
        .distinct()
        .join(gkey, "normalized")
        .select("form", "gkey")
    )

    def _replay(pdf: pd.DataFrame) -> pd.DataFrame:
        ordered = pdf.sort_values(
            "gkey", key=lambda s: s.map(lambda r: (r["nl"], r["v"]))
        )["form"]
        seen: set[str] = set()
        for f in ordered:
            seen.add(f)
        return pd.DataFrame({"form": list(seen), "set_rank": range(len(seen))})

    return (
        forms.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_replay, "form string, set_rank long")
    )


def distributed_rank(df: DataFrame, order_cols: list, out: str = "rank") -> DataFrame:
    """Dense global row_number over ``order_cols`` WITHOUT a single-task
    window: range-repartition on the sort key, rank within each partition,
    then add per-partition offsets (a partition-count-sized cumulative sum).

    ``order_cols`` must be a total order (no ties) or ranks become
    partition-placement-dependent. Output is 1-based like row_number().
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # pin partition ids: they feed two branches (ranks + offsets) and a
        # recompute could re-range rows differently
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = ranged.withColumn("_lrn", F.row_number().over(w))
    # Per-partition offsets: metadata-sized (≤ shuffle_partitions rows), so
    # the cumulative sum runs on the driver — no single-partition exchange
    # anywhere in the plan.
    counts = {
        r["_pid"]: r["_c"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    }
    running = 0
    offsets = []
    for pid in sorted(counts):
        offsets.append((pid, running))
        running += counts[pid]
    odf = df.sparkSession.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    return (
        ranked.join(F.broadcast(odf), "_pid")
        # long, not int: this function exists precisely for the >2^31-row
        # regime where a single-task window would die
        .withColumn(out, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrn", "_off")
    )


def _forms_with_features(
    mapping: DataFrame, tie_order: str = "reference", rank_kind: str = "long"
) -> DataFrame:
    """Distinct standard forms + word/stem features + a total-order rank.

    Rank replays the reference's scan order ``sorted(standard_forms, key=len)``
    (entity_standardization.py:121) — a *stable* sort, so equal-length forms
    keep their set-iteration order. ``tie_order='reference'`` reproduces that
    order exactly via standard_form_set_rank(); ``'lexicographic'`` totalizes
    ties by form text instead (the SQL-expressible web-scale mode).

    ``rank_kind='struct'`` (lexicographic mode only): instead of a global
    row_number, carry the sort key itself — ``struct(clen, form)`` — as the
    rank. Struct comparison is lexicographic field-by-field, so every
    consumer comparison (least/greatest/<=/window order) is order-isomorphic
    to the integer rank, while the rank assignment costs ZERO extra work
    (distributed_rank pays a range repartition + checkpoint + offset join +
    driver collect). Callers that need a real integer rank (the pandas LSH
    scorer schema) keep ``'long'``.
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
    if tie_order == "reference":
        # Parity mode: the set-iteration replay is single-task by nature (it
        # replays CPython set order); the global rank window that follows is
        # the same cost class. Documented parity-only path.
        ranks = standard_form_set_rank(mapping)
        forms = forms.join(F.broadcast(ranks), forms.form == ranks.form).drop(ranks.form)
        w = Window.orderBy(F.col("clen").asc(), F.col("set_rank").asc())
        ranked = forms.withColumn("rank", F.row_number().over(w))
    elif rank_kind == "struct":
        # Web-scale mode, struct rank: the (clen, form) sort key IS the
        # total order — no rank stage at all.
        ranked = forms.withColumn("rank", F.struct(F.col("clen"), F.col("form")))
    else:
        # Web-scale mode: distributed rank (range partition + local
        # row_number + offsets) — no stage funnels the form vocabulary
        # through one task.
        ranked = distributed_rank(
            forms, [F.col("clen").asc(), F.col("form").asc()], out="rank"
        )
    return (
        ranked.select("form", "words", "stems", "clen", "rank")
        .localCheckpoint(eager=True)
    )


def _lsh_candidate_pairs(
    forms: DataFrame,
    num_hashes: int = 16,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """MinHash-LSH candidate pairs over standard-form token sets (the
    north_star's entity-canonicalization blocking letter: MinHash-LSH over
    surface forms).

    Token set = words ∪ 4-char stems (the features the merge rules actually
    compare). Portable affine minhash over md5 (same scheme as
    ops/dedup.minhash_signatures); banded signatures bucket-join so the pair
    set is linear in colliding candidates, never quadratic in the
    vocabulary. LOSSY by design: a subset/stem pair with low token-set
    Jaccard can miss every band — measured recall vs the lossless blocking
    is recorded in COVERAGE.md; lossless stays the default.
    """
    from .dedup import _M31, minhash_coeffs

    rows = num_hashes // bands
    toks = forms.select(
        "form", F.explode(F.array_union("words", "stems")).alias("tok")
    )
    h0 = F.conv(F.substring(F.md5("tok"), 1, 12), 16, 10).cast("bigint") % F.lit(_M31)
    mins = [
        F.min((F.lit(a) * h0 + F.lit(b)) % F.lit(_M31)).alias(f"m{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes, seed))
    ]
    sig = toks.groupBy("form").agg(*mins)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"m{b * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        "form", F.explode(F.array(*band_structs)).alias("bk")
    ).select("form", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    lhs = buckets.select("band", "bh", F.col("form").alias("f1"))
    rhs = buckets.select("band", "bh", F.col("form").alias("f2"))
    return (
        lhs.join(rhs, ["band", "bh"])
        .filter(F.col("f1") < F.col("f2"))
        .select("f1", "f2")
        .distinct()
    )


# applyInPandas/mapInPandas scorer output schema for the second-pass rules.
_SCORE_SCHEMA = "r1 long, r2 long, key string, value string"


def _score_pairs_pandas(cands: DataFrame) -> DataFrame:
    """The second-pass rule chain (entity_standardization.py:115-155) as an
    Arrow-batched pair scorer — the north_star's applyInPandas pairwise
    scoring shape. Semantically identical to the column-expression evaluator
    in second_pass_assignments (pytest-pinned); used by the LSH blocking
    mode where candidates arrive as an explicit pair table."""

    def _score(batches):
        for pdf in batches:
            out = {"r1": [], "r2": [], "key": [], "value": []}
            for row in pdf.itertuples(index=False):
                if row.rk1 <= row.rk2:
                    e1, e1w, e1s, e1l, r1 = row.f1, row.w1, row.s1, row.l1, row.rk1
                    e2, e2w, e2s, e2l, r2 = row.f2, row.w2, row.s2, row.l2, row.rk2
                else:
                    e1, e1w, e1s, e1l, r1 = row.f2, row.w2, row.s2, row.l2, row.rk2
                    e2, e2w, e2s, e2l, r2 = row.f1, row.w1, row.s1, row.l1, row.rk1
                w1, w2 = set(e1w), set(e2w)
                s1, s2 = set(e1s), set(e2s)
                key = value = None
                if w1 and w1 <= w2:
                    key, value = e2, e1
                elif w2 and w2 <= w1:
                    key, value = e1, e2
                else:
                    shared = len(s1 & s2)
                    if shared > 0 and shared / max(len(s1), len(s2)) > 0.5:
                        if e1l <= e2l:
                            key, value = e2, e1
                        else:
                            key, value = e1, e2
                if key is not None:
                    out["r1"].append(r1)
                    out["r2"].append(r2)
                    out["key"].append(key)
                    out["value"].append(value)
            yield pd.DataFrame(out)

    return cands.mapInPandas(_score, _SCORE_SCHEMA)


def second_pass_assignments(
    mapping: DataFrame,
    tie_order: str = "reference",
    blocking: str = "lossless",
) -> DataFrame:
    """Word-subset + shared-stem merges between standard forms (J4).

    ``blocking='lossless'`` (default): first-word/stem equi-join blocks —
    exact w.r.t. the reference predicates. ``blocking='minhash-lsh'``: the
    north_star's MinHash-LSH-over-surface-forms blocking with the
    applyInPandas pair scorer — lossy (recall measured in COVERAGE.md) but
    with a candidate count governed by band collisions rather than token
    frequency, for vocabularies whose hot tokens defeat equi-join blocking.

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

    The full rule chain is evaluated INSIDE each blocked join (features ride
    on both join sides) and only the surviving assignments are materialized —
    never the candidate-pair set itself. A pair surfaced by both blockings
    (or by several shared stems) evaluates to the identical assignment, so a
    cheap distinct on the (small) assignment set replaces a distinct on the
    (huge) pair set. Measured at 20k forms / 160M candidates this is the
    difference between ~90s and a stuck job.
    """
    # The pandas LSH scorer declares (r1, r2) as longs in its Arrow schema;
    # every other path only ever COMPARES ranks, so the struct surrogate
    # (order-isomorphic, zero-cost) is used there.
    rank_kind = (
        "struct"
        if tie_order == "lexicographic" and blocking != "minhash-lsh"
        else "long"
    )
    forms = _forms_with_features(mapping, tie_order=tie_order, rank_kind=rank_kind)
    # Form vocabulary size is known (forms is checkpointed): broadcast the
    # probe sides of the blocking self-joins when it fits an executor, so
    # the exploded word/stem tables never shuffle.
    small = forms.count() <= 2_000_000

    lhs = forms.select(
        F.col("form").alias("f1"),
        F.col("words").alias("w1"),
        F.col("stems").alias("s1"),
        F.col("clen").alias("l1"),
        F.col("rank").alias("rk1"),
    )
    rhs = forms.select(
        F.col("form").alias("f2"),
        F.col("words").alias("w2"),
        F.col("stems").alias("s2"),
        F.col("clen").alias("l2"),
        F.col("rank").alias("rk2"),
    )

    def _assignments(cands: DataFrame) -> DataFrame:
        """Evaluate the reference's elif chain on (f1, f2) candidate rows
        carrying both feature sets; emit (r1, r2, key, value) assignments."""
        # Orient: e1 = lower rank (earlier in the scan), e2 = higher.
        flip = F.col("rk1") > F.col("rk2")
        e1w = F.when(flip, F.col("w2")).otherwise(F.col("w1"))
        e2w = F.when(flip, F.col("w1")).otherwise(F.col("w2"))
        e1s = F.when(flip, F.col("s2")).otherwise(F.col("s1"))
        e2s = F.when(flip, F.col("s1")).otherwise(F.col("s2"))
        e1l = F.when(flip, F.col("l2")).otherwise(F.col("l1"))
        e2l = F.when(flip, F.col("l1")).otherwise(F.col("l2"))
        e1 = F.when(flip, F.col("f2")).otherwise(F.col("f1"))
        e2 = F.when(flip, F.col("f1")).otherwise(F.col("f2"))

        subset12 = (F.size(F.array_except(e1w, e2w)) == 0) & (F.size(e1w) > 0)
        subset21 = (F.size(F.array_except(e2w, e1w)) == 0) & (F.size(e2w) > 0)
        shared = F.size(F.array_intersect(e1s, e2s))
        stem_hit = (shared > 0) & (
            shared / F.greatest(F.size(e1s), F.size(e2s)) > F.lit(0.5)
        )

        return cands.select(
            F.least("rk1", "rk2").alias("r1"),
            F.greatest("rk1", "rk2").alias("r2"),
            F.when(subset12, e2)
            .when(subset21, e1)
            .when(stem_hit & (e1l <= e2l), e2)
            .when(stem_hit, e1)
            .alias("key"),
            F.when(subset12, e1)
            .when(subset21, e2)
            .when(stem_hit & (e1l <= e2l), e1)
            .when(stem_hit, e2)
            .alias("value"),
        ).filter(F.col("key").isNotNull())

    if blocking == "minhash-lsh":
        cand = _lsh_candidate_pairs(forms)
        scored = cand.join(lhs, "f1").join(rhs, "f2")
        assigned = _score_pairs_pandas(scored).distinct()
    else:
        # Block A — subset candidates: the potential-subset side joins its
        # first word against every word of the other side (both roles covered
        # since lhs/rhs each span all forms).
        lhs_a = lhs.withColumn("bkey", F.element_at("w1", 1))
        blk_a = (F.broadcast(lhs_a) if small else lhs_a).join(
            rhs.withColumn("bkey", F.explode("w2")), "bkey"
        ).filter(F.col("f1") != F.col("f2"))

        # Block B — stem candidates: any shared stem.
        lhs_b = lhs.withColumn("bkey", F.explode("s1"))
        blk_b = (F.broadcast(lhs_b) if small else lhs_b).join(
            rhs.withColumn("bkey", F.explode("s2")), "bkey"
        ).filter(F.col("f1") != F.col("f2"))

        assigned = _assignments(blk_a).unionByName(_assignments(blk_b)).distinct()

    # Dict-overwrite replay: last pair in (r1, r2) loop order wins per key.
    w = Window.partitionBy("key").orderBy(F.desc("r1"), F.desc("r2"))
    return (
        assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "value")
    )


def build_entity_mapping(
    triples: DataFrame,
    tie_order: str = "reference",
    blocking: str = "lossless",
    broadcast_second: bool = True,
) -> DataFrame:
    """Full (variant -> standard) mapping: first pass overridden by second.

    Reference quirk preserved (entity_standardization.py:153-155): the second
    pass only overrides the mapping *key equal to the old standard form* —
    variants that pointed at the old form keep pointing at it; only exact
    occurrences of the old form itself get the new target.

    ``broadcast_second``: the second-pass assignment set is a subset of the
    form vocabulary; both sides of the final join are checkpoint-derived
    (no size stats), so without the hint Spark shuffles the full first-pass
    mapping. Pass False at vocabulary sizes that no longer fit an executor
    (same regime as ``apply_standardization(broadcast_mapping=False)``).
    """
    counts = entity_counts(triples)
    # first feeds second_pass (via _forms_with_features) AND the final join:
    # without the eager cut each consumer re-derives the counts aggregation
    # over the full triple table (measured 22.6s -> 9s standardize at 32k
    # docs). The checkpoint itself is vocabulary-sized.
    first = first_pass_mapping(counts).localCheckpoint(eager=True)
    second = second_pass_assignments(first, tie_order=tie_order, blocking=blocking)
    if broadcast_second:
        second = F.broadcast(second)
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


def standardize_triples(
    triples: DataFrame,
    broadcast_mapping: bool = True,
    tie_order: str = "reference",
    blocking: str = "lossless",
) -> DataFrame:
    """Phase 2 end-to-end: validate, build mapping, apply, filter.

    ``valid`` and ``mapping`` feed multiple downstream branches; they are
    persisted so the (expensive) upstream extraction plan evaluates once —
    Spark does not share common sub-plans across join branches otherwise.
    """
    # The pipeline hands this stage a checkpointed input (pipeline._stage /
    # conftest), so the cheap valid-filter is NOT re-materialized here —
    # recomputing a filter over a checkpoint costs one scan, materializing a
    # second full copy costs a barrier job at every corpus size. The mapping
    # (vocabulary-sized) feeds two joins and IS eagerly cut.
    valid = valid_triples(triples)
    mapping = build_entity_mapping(
        valid,
        tie_order=tie_order,
        blocking=blocking,
        broadcast_second=broadcast_mapping,
    ).localCheckpoint(eager=True)
    return apply_standardization(valid, mapping, broadcast_mapping=broadcast_mapping)


def incremental_entity_mapping(
    new_triples: DataFrame, existing_mapping: DataFrame
) -> DataFrame:
    """Daily-ingest entity mapping update: extend an existing (variant ->
    standard) mapping with a NEW batch of raw triples, never recomputing the
    old corpus — the KG twin of curation.exact_substring_dedup_incremental.

    Semantics (the reference has no incremental mode; these are the
    stability rules a persisted KG needs):

      1. Variants already in the mapping keep their standard — canonical
         ids downstream never churn on re-ingest (src='existing').
      2. Unknown variants whose normalized group key matches an existing
         group adopt that group's standard, chosen deterministically as
         min(standard) over the group's rows (src='adopted'; second-pass
         overrides can split a group across standards — min is the stable
         pick).
      3. Genuinely new groups elect a canonical by the first-pass W1 order
         over BATCH counts (count desc, length asc, variant asc;
         src='new'). Frequency-dependent choices therefore see only the
         batch — an incremental mapping is NOT guaranteed equal to a full
         rebuild (same trade the incremental ExactSubstr path documents).

    Cost is O(batch) plus vocabulary-sized joins: the existing mapping and
    its per-group standards are broadcast; batch counts are one map-side
    combined aggregation; the new-group election windows over batch-only
    groups. Returns the UPDATED full mapping (variant, standard, src).
    """
    counts = entity_counts(valid_triples(new_triples))
    batch = (
        counts.withColumn("normalized", normalize_entity_udf(F.col("entity")))
        .filter(F.col("normalized") != "")
    )
    em = existing_mapping.select("variant", "standard")
    unknown = batch.join(
        F.broadcast(em.select(F.col("variant").alias("entity"))),
        "entity",
        "left_anti",
    )
    exist_groups = (
        em.withColumn("normalized", normalize_entity_udf(F.col("variant")))
        .filter(F.col("normalized") != "")
        .groupBy("normalized")
        .agg(F.min("standard").alias("standard"))
    )
    adopted = unknown.join(F.broadcast(exist_groups), "normalized").select(
        F.col("entity").alias("variant"),
        "standard",
        F.lit("adopted").alias("src"),
    )
    fresh = unknown.join(exist_groups, "normalized", "left_anti")
    w = Window.partitionBy("normalized").orderBy(
        F.desc("cnt"), F.length("entity").asc(), F.asc("entity")
    )
    # first() over the ordered window == old rn==1 winner + re-join, with
    # half the exchanges (same rewrite as first_pass_mapping).
    fresh_map = fresh.select(
        F.col("entity").alias("variant"),
        F.first("entity").over(w).alias("standard"),
        F.lit("new").alias("src"),
    )
    return (
        em.select("variant", "standard", F.lit("existing").alias("src"))
        .unionByName(adopted)
        .unionByName(fresh_map)
    )


def fuzzy_entity_pairs(
    entities: DataFrame,
    max_dist: int = 2,
    prefix_len: int = 2,
    min_len: int = 4,
    max_block_size: int = 1000,
    entity_col: str = "entity",
) -> DataFrame:
    """(entity_a, entity_b, edit_dist): typo-tolerant entity-resolution
    candidates — distinct names from ``entities[entity_col]`` whose edit
    distance is within ``max_dist``, the Levenshtein complement to the
    token/stem similarity join of second_pass_assignments (reference
    entity_standardization.py's first-word/length heuristics catch
    rewordings; this catches spelling drift like "recieve"/"receive"
    that shares no stem).

    Scale shape: prefix-``prefix_len`` blocking (the standard ER block
    for typo matching — documented recall limit: edits inside the prefix
    are missed), a length band (abs(len diff) <= max_dist, cheap
    pre-filter that prunes most block pairs before the O(len²) DP), and
    a ``max_block_size`` hot-block guard mirroring lexical_inference's —
    oversized blocks (degenerate shared prefixes) are dropped whole
    rather than exploding O(block²).

    Entities are gated to printable ASCII on both engine and oracle:
    Spark's levenshtein counts codepoints while DuckDB's counts UTF-8
    bytes, so non-ASCII rows are not oracle-comparable (measured:
    'café'/'cafe' = 1 vs 2).
    """
    ents = (
        entities.select(F.col(entity_col).alias("entity"))
        .distinct()
        .filter(
            (F.length("entity") >= min_len)
            & ~F.col("entity").rlike("[^ -~]")
        )
        .select("entity", F.substring("entity", 1, prefix_len).alias("blk"))
        .localCheckpoint(eager=True)
    )
    ok = (
        ents.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= max_block_size)
        .select("blk")
    )
    blocked = ents.join(ok, "blk")
    left = blocked.select("blk", F.col("entity").alias("entity_a"))
    right = blocked.select("blk", F.col("entity").alias("entity_b"))
    return (
        left.join(right, "blk")
        .filter(
            (F.col("entity_a") < F.col("entity_b"))
            & (
                F.abs(F.length("entity_a") - F.length("entity_b"))
                <= max_dist
            )
        )
        .select(
            "entity_a",
            "entity_b",
            F.levenshtein("entity_a", "entity_b").cast("long").alias(
                "edit_dist"
            ),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


def snm_pairs(
    entities: DataFrame,
    window: int = 3,
    max_dist: int = 2,
    min_len: int = 4,
    entity_col: str = "entity",
) -> DataFrame:
    """(entity_a, entity_b, edit_dist): sorted-neighborhood ER candidates
    (Hernandez & Stolfo 1995) — entities sort lexicographically and each
    compares against its next ``window`` neighbors, then Levenshtein <=
    ``max_dist`` verifies. The classic alternative blocking to
    fuzzy_entity_pairs' prefix buckets: SNM's recall hole is edits that
    move a string far in sort order (first-character edits — the same
    hole, reached differently), while its candidate count is exactly
    n*window regardless of key-distribution skew — no hot-block guard
    needed, which is the property that makes it attractive at scale.

    The global sort uses distributed_rank (range repartition + offset
    table — no single-task window); neighbor pairs are ``window``
    rank-offset equi-joins (explode of 1..window), each a plain shuffled
    join on an int key. ASCII gate as in fuzzy_entity_pairs (engine
    levenshtein counts codepoints, DuckDB bytes).
    """
    ents = (
        entities.select(F.col(entity_col).alias("entity"))
        .distinct()
        .filter(
            (F.length("entity") >= min_len) & ~F.col("entity").rlike("[^ -~]")
        )
    )
    ranked = distributed_rank(ents, ["entity"]).localCheckpoint(eager=True)
    # each entity probes the ranks of its next `window` sort neighbors;
    # rank_b > rank_a implies entity_a < entity_b, so orientation is
    # canonical by construction
    probes = ranked.select(
        F.col("entity").alias("entity_a"),
        F.explode(
            F.array(*[F.col("rank") + F.lit(j) for j in range(1, window + 1)])
        ).alias("rank"),
    )
    return (
        probes.join(
            ranked.select(F.col("entity").alias("entity_b"), "rank"), "rank"
        )
        .select(
            "entity_a",
            "entity_b",
            F.levenshtein("entity_a", "entity_b").cast("long").alias(
                "edit_dist"
            ),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )
