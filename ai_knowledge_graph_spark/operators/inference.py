"""Phase-3 relationship inference as joins (no LLM stages; config-gated off).

Reference semantics: entity_standardization.py:183-271 with
``use_llm_for_inference = false`` — i.e. transitive inference (:314-354) +
lexical-similarity inference (:661-752) + dedup (:356-375) + final predicate
truncation + self-loop filter. The reference's nested Python loops become:

  transitive  -> self equi-join on the distinct edge set + left-anti join
                 against existing (s, o) pairs (J2+J3), with the "last
                 predicate wins" dict replayed as a window (W3)
  lexical     -> token-blocked and 4-gram-blocked self-joins over the entity
                 vocabulary (J4) instead of the O(n^2) all-pairs loop
  dedup       -> window keeping the reference's survivor: the *last*
                 non-inferred copy if any, else an inferred copy (W2)

Determinism: pair iteration order (reference: hash order of a Python set) is
totalized lexicographically; emitted-triple *content* only depends on it for
the symmetric "related to" case (direction of the pair), which the P/R
tolerance absorbs and oracle/refimpl.py mirrors exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .standardize import limit_predicate_col, valid_triples

# Ordering columns standing in for the reference's list position.
def _pos_desc():
    return [
        F.col("url").desc_nulls_last(),
        F.col("chunk").desc_nulls_last(),
        F.col("t_idx").desc_nulls_last(),
    ]


def last_predicate_edges(triples: DataFrame) -> DataFrame:
    """Distinct (subject, object) with the last-seen predicate (W3).

    The reference builds ``predicates[(s, o)] = p`` by overwriting in list
    order (entity_standardization.py:327-331), so the last triple per (s, o)
    defines the pair's predicate for transitive composition.
    """
    # max_by over a position struct instead of a window: aggregates get
    # map-side partial combine, so the shuffle carries one candidate per
    # (subject, object) per map partition instead of every triple row —
    # this is the full-triple-table shuffle of the transitive branch.
    # Struct comparison puts null fields lowest, matching desc_nulls_last
    # per position column (positions are non-null for extracted triples
    # anyway; inferred rows never reach this function).
    key = F.struct(F.col("url"), F.col("chunk"), F.col("t_idx"))
    return triples.groupBy("subject", "object").agg(
        F.max_by("predicate", key).alias("predicate")
    )


def transitive_inference(
    triples: DataFrame,
    broadcast_max_rows: int = 5_000_000,
    distinct_rows: bool = True,
) -> DataFrame:
    """A->B->C => A->C one-step composition (G2/J2/J3).

    Predicate: ``indirectly p1`` if p1 == p2 else ``p1 via B``, truncated at
    emission (entity_standardization.py:338-349). One new row per distinct
    (A, B, C) path whose (A, C) pair has no existing edge.

    ``distinct_rows=False`` skips the final distinct: rows mapping to the
    same output (different mid, same truncated predicate) stay duplicated —
    content-identical, so a downstream one-row-per-(s,p,o) dedup (the
    infer_relationships pipeline) produces the same survivors while this
    operator saves a full output-sized exchange (measured: only 4% of path
    rows collapse at bench scale, so the distinct cost far exceeds the
    extra rows it removes from the downstream window).

    When the distinct edge set fits an executor (measured count ≤
    ``broadcast_max_rows``) it is BROADCAST into both the path self-join and
    the existing-edge anti-join: the path table (|paths| ≫ |edges| on any
    graph with hubs) is then never shuffled — the only remaining exchange is
    the final distinct over the (much smaller) emitted-triple set. Above the
    threshold the shuffled plan is kept; AQE splits skewed mid keys.
    """
    edges = last_predicate_edges(triples).localCheckpoint(eager=True)
    small = edges.count() <= broadcast_max_rows
    e1 = edges.select(
        F.col("subject").alias("subj"),
        F.col("object").alias("mid"),
        F.col("predicate").alias("p1"),
    )
    e2 = edges.select(
        F.col("subject").alias("mid"),
        F.col("object").alias("obj"),
        F.col("predicate").alias("p2"),
    )
    if small:
        e2 = F.broadcast(e2)
    paths = e1.join(e2, "mid").filter(F.col("subj") != F.col("obj"))
    existing = edges.select(
        F.col("subject").alias("subj"), F.col("object").alias("obj")
    )
    if small:
        existing = F.broadcast(existing)
    fresh = paths.join(existing, ["subj", "obj"], "left_anti")
    new_pred = F.when(
        F.col("p1") == F.col("p2"), F.concat(F.lit("indirectly "), F.col("p1"))
    ).otherwise(F.concat(F.col("p1"), F.lit(" via "), F.col("mid")))
    out = fresh.select(
        F.col("subj").alias("subject"),
        limit_predicate_col(new_pred).alias("predicate"),
        F.col("obj").alias("object"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("int").alias("chunk"),
        F.lit(None).cast("int").alias("t_idx"),
        F.lit(True).alias("inferred"),
        F.lit("transitive").alias("stage"),
    )
    return out.distinct() if distinct_rows else out


def _entity_features(triples: DataFrame) -> DataFrame:
    """Distinct entities with lowered form, word set, and 4-char prefix."""
    ents = (
        triples.select(F.col("subject").alias("entity"))
        .unionByName(triples.select(F.col("object").alias("entity")))
        .distinct()
    )
    return ents.select(
        "entity",
        F.lower("entity").alias("elow"),
        F.array_distinct(
            F.filter(F.split(F.lower("entity"), r"\s+"), lambda w: w != F.lit(""))
        ).alias("words"),
    )


def entity_set_rank(triples: DataFrame) -> DataFrame:
    """(entity, set_rank): the reference's ``list(all_entities)`` position.

    The reference builds ``all_entities`` by inserting subject then object per
    triple in list order (entity_standardization.py:218-223) and later
    iterates it (:682) — CPython set order, a pure function of the *distinct
    insertion sequence* and the interpreter hash seed. PySpark python workers
    always run with PYTHONHASHSEED=0 (pyspark/core/context.py:298), the same
    seed the subprocess oracle pins, so replaying the insertions into a real
    Python set inside one worker task reproduces the order bit-exactly.

    The replay is a single-task reduction over the DISTINCT vocabulary (not
    the triple table) — the same driver-bottleneck class as the reference's
    own global entity pass. It only runs in ``pair_order='reference'`` parity
    mode; the web-scale path (``pair_order='lexicographic'``) never calls it.

    The insertion sequence needs only an *order*, not consecutive integers,
    so first occurrence is a fully parallel ``min(struct(...))`` aggregation
    over the positional key — no global row_number window (which would drag
    every triple through one partition).
    """
    occ = triples.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("url").alias("u"),
                    F.col("chunk").alias("c"),
                    F.col("t_idx").alias("t"),
                    F.lit(0).alias("side"),
                    F.col("subject").alias("entity"),
                ),
                F.struct(
                    F.col("url").alias("u"),
                    F.col("chunk").alias("c"),
                    F.col("t_idx").alias("t"),
                    F.lit(1).alias("side"),
                    F.col("object").alias("entity"),
                ),
            )
        ).alias("x")
    ).select(
        F.col("x.entity").alias("entity"),
        F.struct("x.u", "x.c", "x.t", "x.side").alias("occ_key"),
    )
    first = occ.groupBy("entity").agg(F.min("occ_key").alias("first_occ"))

    def _replay(pdf: pd.DataFrame) -> pd.DataFrame:
        entities = pdf.sort_values(
            "first_occ", key=lambda s: s.map(lambda r: (r["u"], r["c"], r["t"], r["side"]))
        )["entity"]
        s: set[str] = set()
        for e in entities:
            s.add(e)
        return pd.DataFrame({"entity": list(s), "set_rank": range(len(s))})

    return (
        first.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_replay, "entity string, set_rank long")
    )


def lexical_inference(
    triples: DataFrame,
    max_block_size: int = 0,
    pair_order: str = "reference",
    broadcast_max_rows: int = 5_000_000,
) -> DataFrame:
    """Lexical-similarity inference (entity_standardization.py:661-752).

    Candidate pairs come from two lossless blockings instead of all-pairs:
      * shared-word pairs: explode lowered words, self-join on the word;
      * containment pairs: the shorter entity's 4-char prefix must occur
        among the longer entity's 4-grams (plus a broadcast pass for
        entities shorter than 4 chars, which no 4-gram key can block).

    Rules per unordered pair:
      * a shared word exists: the longest shared word, if >= 4 chars, emits
        a ``relates to`` / ``related to`` edge directed by startswith; a
        shared word < 4 chars emits nothing AND suppresses the containment
        check (the reference's elif chain, :708-736);
      * otherwise substring containment emits ``is type of``.
    Pairs already connected in either direction are skipped (:686).

    Direction of the *symmetric* ``related to`` branch (both or neither
    entity startswith the shared word) is the only rule that depends on the
    reference's pair iteration order: subject = the entity appearing first in
    ``list(all_entities)``. ``pair_order='reference'`` reproduces that order
    exactly via entity_set_rank(); ``pair_order='lexicographic'`` uses a
    plain total order instead — semantically equivalent output modulo that
    direction, with no single-task rank step, for web-scale runs.

    ``max_block_size`` > 0 drops blocking KEYS whose document frequency
    exceeds the cap — both shared words AND containment 4-grams (each a
    Zipf-exposed key space where one key shared by n entities emits O(n^2)
    candidate pairs); 0 keeps exact reference semantics. Measured
    guard-on/off at bench scale by BENCH/skew_probe.py.

    Broadcast shape: the feature/word/gram tables are all VOCABULARY-sized;
    when the measured vocabulary fits an executor (``broadcast_max_rows``)
    one side of each blocking join and the feature lookups are broadcast, so
    the candidate-PAIR table (the big intermediate) is never shuffled — its
    only exchanges are the distincts that define the pair set. Checkpointed
    tables carry no size stats, so without the hints Spark would shuffle the
    pair table five times (2 feature joins, 2 anti-joins, 1 blocking side).
    """
    feats = _entity_features(triples).localCheckpoint(eager=True)
    small = feats.count() <= broadcast_max_rows

    def _bc(df):
        return F.broadcast(df) if small else df

    words = feats.select("entity", F.explode("words").alias("w"))
    if max_block_size > 0:
        hot = (
            words.groupBy("w")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_block_size)
            .select("w")
        )
        words = words.join(F.broadcast(hot), "w", "left_anti")
    w1 = words.select(F.col("entity").alias("x"), "w")
    w2 = words.select(F.col("entity").alias("y"), "w")
    # No per-blocking distinct: the union below carries duplicates into ONE
    # distinct whose partial (map-side) aggregation collapses them before
    # the shuffle — three exchanges fewer for the same pair set.
    cand_shared = (
        w1.join(_bc(w2), "w").filter(F.col("x") < F.col("y")).select("x", "y")
    )

    # Containment blocking: prefix-4 of the contained side appears among the
    # container's 4-grams. (A substring's first 4 chars are a 4-gram of the
    # container.)
    short4 = feats.filter(F.length("elow") >= 4).select(
        F.col("entity").alias("se"), F.substring("elow", 1, 4).alias("g")
    )
    grams = feats.filter(F.length("elow") >= 4).select(
        F.col("entity").alias("le"),
        F.explode(
            F.expr("transform(sequence(1, length(elow) - 3), i -> substring(elow, i, 4))")
        ).alias("g"),
    )
    if max_block_size > 0:
        # the containment blocking key is just as Zipf-exposed as the word
        # key (a 4-gram shared by n container entities emits O(n * probes)
        # candidates): cap it with the same rule, df measured on the
        # container side
        hot_g = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_block_size)
            .select("g")
        )
        grams = grams.join(F.broadcast(hot_g), "g", "left_anti")
    cand_contain = (
        _bc(short4).join(grams, "g")
        .filter(F.col("se") != F.col("le"))
        .select(
            F.least("se", "le").alias("x"), F.greatest("se", "le").alias("y")
        )
    )
    # Entities shorter than 4 chars: tiny vocabulary slice — broadcast pass.
    tiny = feats.filter(F.length("elow") < 4).select(
        F.col("entity").alias("se"), F.col("elow").alias("slow")
    )
    cand_tiny = (
        feats.select(F.col("entity").alias("le"), F.col("elow").alias("llow"))
        .join(F.broadcast(tiny), F.col("llow").contains(F.col("slow")))
        .filter(F.col("se") != F.col("le"))
        .select(F.least("se", "le").alias("x"), F.greatest("se", "le").alias("y"))
    )

    pairs = cand_shared.unionByName(cand_contain).unionByName(cand_tiny).distinct()

    fx = feats.select(
        F.col("entity").alias("x"), F.col("elow").alias("xlow"), F.col("words").alias("xwords")
    )
    fy = feats.select(
        F.col("entity").alias("y"), F.col("elow").alias("ylow"), F.col("words").alias("ywords")
    )
    scored = pairs.join(_bc(fx), "x").join(_bc(fy), "y")

    if pair_order == "reference":
        ranks = entity_set_rank(triples).localCheckpoint(eager=True)
        rx = ranks.select(F.col("entity").alias("x"), F.col("set_rank").alias("rank_x"))
        ry = ranks.select(F.col("entity").alias("y"), F.col("set_rank").alias("rank_y"))
        scored = scored.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    else:
        x_first = F.col("x") < F.col("y")  # pairs are built with x < y

    # Skip pairs already connected in either direction (:686). The distinct
    # edge set gets its own broadcast decision (it can exceed the vocabulary);
    # broadcast turns both anti-joins into map-side probes of the pair table.
    existing = triples.select("subject", "object").distinct().localCheckpoint(eager=True)
    if existing.count() <= broadcast_max_rows:
        existing = F.broadcast(existing)
    scored = scored.join(
        existing,
        (scored.x == existing.subject) & (scored.y == existing.object),
        "left_anti",
    )
    scored = scored.join(
        existing,
        (scored.x == existing.object) & (scored.y == existing.subject),
        "left_anti",
    )

    if pair_order == "reference":
        # Exact per-pair scoring: execute the reference's literal rule chain
        # (entity_standardization.py:699-749) over Arrow batches in a seed-0
        # python worker — real CPython sets, so `max(shared_words, key=len)`
        # tie choice and intersection iteration order match the oracle
        # bit-for-bit. Roles (e1 = earlier in list(all_entities)) come from
        # the set ranks. This is the north-star pairwise-scoring shape:
        # blocking stays relational, scoring is a vectorized batch UDF.
        def _score_reference(batches):
            for pdf in batches:
                subs, preds, objs = [], [], []
                for x, y, rkx, rky in zip(
                    pdf["x"], pdf["y"], pdf["rank_x"], pdf["rank_y"]
                ):
                    e1, e2 = (x, y) if rkx < rky else (y, x)
                    e1_lower, e2_lower = e1.lower(), e2.lower()
                    e1_words = set(e1_lower.split())
                    e2_words = set(e2_lower.split())
                    shared_words = e1_words.intersection(e2_words)
                    if shared_words:
                        main_shared = max(shared_words, key=len)
                        if len(main_shared) < 4:
                            continue
                        if e1_lower.startswith(main_shared) and not e2_lower.startswith(
                            main_shared
                        ):
                            subs.append(e2); preds.append("relates to"); objs.append(e1)
                        elif e2_lower.startswith(main_shared) and not e1_lower.startswith(
                            main_shared
                        ):
                            subs.append(e1); preds.append("relates to"); objs.append(e2)
                        else:
                            subs.append(e1); preds.append("related to"); objs.append(e2)
                    elif e1_lower in e2_lower:
                        subs.append(e2); preds.append("is type of"); objs.append(e1)
                    elif e2_lower in e1_lower:
                        subs.append(e1); preds.append("is type of"); objs.append(e2)
                yield pd.DataFrame(
                    {"subject": subs, "predicate": preds, "object": objs}
                )

        return (
            scored.select("x", "y", "rank_x", "rank_y")
            .mapInPandas(
                _score_reference, "subject string, predicate string, object string"
            )
            .select(
                "subject",
                "predicate",
                "object",
                F.lit(None).cast("string").alias("url"),
                F.lit(None).cast("int").alias("chunk"),
                F.lit(None).cast("int").alias("t_idx"),
                F.lit(True).alias("inferred"),
                F.lit("lexical").alias("stage"),
            )
        )

    shared = F.array_intersect("xwords", "ywords")
    # Longest shared word; ties pick the lexicographically largest (the
    # reference's max() keeps the first in set-iteration order — untotalized).
    main_shared = F.when(
        F.size(shared) > 0,
        F.array_max(F.transform(shared, lambda w: F.struct(F.length(w).alias("l"), w.alias("w")))).getField("w"),
    )
    x_starts = F.col("xlow").startswith(main_shared)
    y_starts = F.col("ylow").startswith(main_shared)

    has_shared = F.size(shared) > 0
    big_shared = has_shared & (F.length(main_shared) >= 4)

    subject_col = (
        F.when(big_shared & x_starts & ~y_starts, F.col("y"))
        .when(big_shared & y_starts & ~x_starts, F.col("x"))
        .when(big_shared & x_first, F.col("x"))
        .when(big_shared, F.col("y"))
        .when(~has_shared & F.col("ylow").contains(F.col("xlow")), F.col("y"))
        .when(~has_shared & F.col("xlow").contains(F.col("ylow")), F.col("x"))
    )
    object_col = (
        F.when(big_shared & x_starts & ~y_starts, F.col("x"))
        .when(big_shared & y_starts & ~x_starts, F.col("y"))
        .when(big_shared & x_first, F.col("y"))
        .when(big_shared, F.col("x"))
        .when(~has_shared & F.col("ylow").contains(F.col("xlow")), F.col("x"))
        .when(~has_shared & F.col("xlow").contains(F.col("ylow")), F.col("y"))
    )
    predicate_col = (
        F.when(big_shared & (x_starts != y_starts), F.lit("relates to"))
        .when(big_shared, F.lit("related to"))
        .when(
            ~has_shared
            & (F.col("ylow").contains(F.col("xlow")) | F.col("xlow").contains(F.col("ylow"))),
            F.lit("is type of"),
        )
    )

    return (
        scored.select(
            subject_col.alias("subject"),
            predicate_col.alias("predicate"),
            object_col.alias("object"),
        )
        .filter(F.col("predicate").isNotNull())
        .select(
            "subject",
            "predicate",
            "object",
            F.lit(None).cast("string").alias("url"),
            F.lit(None).cast("int").alias("chunk"),
            F.lit(None).cast("int").alias("t_idx"),
            F.lit(True).alias("inferred"),
            F.lit("lexical").alias("stage"),
        )
    )


def deduplicate_triples(triples: DataFrame) -> DataFrame:
    """W2: per (s, p, o) keep the last non-inferred copy, else an inferred one.

    Reference dict replay (entity_standardization.py:366-375): non-inferred
    triples overwrite unconditionally (so the *last* wins), inferred ones
    only fill empty slots (so the *first* wins — but inferred duplicates are
    content-identical, carrying no metadata, so any survivor is equivalent).
    """
    # Window, not a payload-struct aggregate: a max_by/min_by split agg was
    # measured (r2) to INCREASE the stage's shuffle 135->194 MB — partial
    # aggregates carry two full payload structs per key while cross-branch
    # duplicates don't collapse map-side, so the window's flat rows win.
    order = [F.col("inferred").asc(), *_pos_desc()]
    if "stage" in triples.columns:
        order.append(F.col("stage").asc_nulls_last())  # totalize inferred ties
    w = Window.partitionBy("subject", "predicate", "object").orderBy(*order)
    return (
        triples.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def infer_relationships(
    triples: DataFrame,
    apply_transitive: bool = True,
    apply_lexical: bool = True,
    max_block_size: int = 0,
    pair_order: str = "reference",
    extra_inferred: DataFrame | None = None,
) -> DataFrame:
    """Phase 3 end-to-end: infer, union, dedup, truncate, drop self-loops
    (entity_standardization.py:183-271). ``extra_inferred`` carries the
    LLM-stage triples (operators/llm_stages, steps 3-4 of the reference's
    phase 3) into the same union+dedup the reference applies (:254-268)."""
    valid = valid_triples(triples)
    if "stage" not in valid.columns:
        valid = valid.withColumn("stage", F.lit("extract"))
    if "inferred" not in valid.columns:
        valid = valid.withColumn("inferred", F.lit(False))
    # No eager cut here: the pipeline feeds a checkpointed stage output, so
    # each branch re-reads that checkpoint through a cheap filter instead of
    # waiting on a second full materialization barrier.

    # The two inference branches each run eager sub-materializations (edge
    # set, entity features, existing-pair set) — sequential barrier jobs that
    # leave cores idle between stages. Spark job submission is thread-safe;
    # building the branches from two driver threads interleaves their jobs on
    # the scheduler and fills the cluster (a real multi-executor cluster
    # benefits the same way).
    import concurrent.futures

    builders = []
    if apply_transitive:
        # distinct_rows=False: duplicated path rows are content-identical,
        # and deduplicate_triples below keeps one row per (s, p, o) anyway —
        # the operator-level distinct would be a redundant full exchange.
        builders.append(lambda: transitive_inference(valid, distinct_rows=False))
    if apply_lexical:
        builders.append(
            lambda: lexical_inference(
                valid, max_block_size=max_block_size, pair_order=pair_order
            )
        )
    parts = [valid]
    if builders:
        with concurrent.futures.ThreadPoolExecutor(len(builders)) as ex:
            futures = [ex.submit(b) for b in builders]
            parts.extend(f.result() for f in futures)

    if extra_inferred is not None:
        parts.append(extra_inferred)
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p, allowMissingColumns=True)

    deduped = deduplicate_triples(unioned)
    truncated = deduped.withColumn("predicate", limit_predicate_col("predicate"))
    return truncated.filter(F.col("subject") != F.col("object"))
