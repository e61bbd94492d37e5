"""End-to-end corpus curation: the composed training-data filter pipeline.

This is the operator a pretraining-data user actually runs — the
composition of the engine's hygiene primitives into one declarative plan:

  1. language gate        (metadata lang column)
  2. quality gate         (textstats.quality_scores)
  3. repetition gate      (webcrawl.repetition_stats, Gopher-style)
  4. exact dedup          (normalized-sha survivor = min doc_id)
  5. near-dup dedup       (MinHash-LSH pairs -> salted components ->
                           min-id survivor, dedup.near_dup_dedup)
  6. split assignment     (sampling.hash_split, leakage-safe)

Everything stays one lazy DataFrame composition — Catalyst pushes the
cheap row-local gates (1-3) into the scan side so the expensive pairwise
stage (5) only sees the surviving subset, exactly the funnel a 100 TB
curation run needs (each stage's input is the previous stage's survivors,
never the raw corpus). No stage collects; stage 4/5 are the only shuffles
(hash aggs + the LSH band join).

The reference's corpus layer stops at whole-file reads + exact dedup
(scripts/prepare_data.py:124-177); this composes the engine's superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_near_dup, near_dup_dedup
from .sampling import hash_split
from .textstats import quality_scores
from .webcrawl import repetition_stats


def curate_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    max_dup_gram_frac: float = 0.06,
    jaccard_threshold: float = 0.5,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """The curated corpus: (doc_id, lang, quality, dup_gram_frac, split).

    Gate order is cheapest-first so each stage's candidate set shrinks
    before the next pays for it; the near-dup stage (the only super-linear
    one) runs last, over survivors only.
    """
    kept = docs.filter(F.col("lang").isin(*langs))

    q = quality_scores(kept).filter(F.col("quality") >= min_quality)

    rep = repetition_stats(q.select("doc_id", "text"))
    q = q.join(
        rep.filter(F.col("dup_gram_frac") <= max_dup_gram_frac).select(
            "doc_id", "dup_gram_frac"
        ),
        "doc_id",
    )

    # exact dedup: min doc_id survives per normalized content hash
    sha = F.sha2(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), 256)
    hashed = q.withColumn("_sha", sha)
    keepers = hashed.groupBy("_sha").agg(F.min("doc_id").alias("doc_id"))
    exact = hashed.join(keepers, ["_sha", "doc_id"], "left_semi").drop("_sha")
    exact = exact.localCheckpoint(eager=True)  # feeds two branches below

    # near-dup dedup among exact-dedup survivors only
    pairs = minhash_near_dup(
        exact.select("doc_id", "text"),
        k=k,
        num_hashes=num_hashes,
        bands=bands,
        threshold=jaccard_threshold,
    )
    survivors = near_dup_dedup(exact, pairs)

    return hash_split(survivors, "doc_id", weights=split_weights).select(
        "doc_id", "lang", "quality", "dup_gram_frac", "split"
    )


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int = 1,
) -> DataFrame:
    """Corpus-level duplicated-line removal (CCNet / RefinedWeb boilerplate
    pass): any line whose total occurrence count across the corpus exceeds
    ``max_occurrences`` is dropped from EVERY document; surviving lines are
    rejoined in original order.

    Returns (id_col, text [cleaned], n_lines, n_dropped) — one row per input
    document, including documents whose every line was dropped (text "").

    The navigation headers, cookie banners and copyright footers of a web
    corpus repeat across millions of pages; in-document signals
    (repetition_stats) cannot see them. This is the cross-document
    complement, and at 100 TB it is three linear passes:

      1. posexplode the line arrays (JVM split, no Python)
      2. hash-agg line -> total count; the over-threshold "hot" set IS the
         boilerplate, which is tiny relative to the corpus but too big to
         assume broadcastable at 10^12 docs — so survivors come from a
         left_anti shuffle join on the line key (AQE turns it into a
         broadcast join automatically when the hot side measures small)
      3. re-group by document, array_sort by position, concat_ws —
         per-document state is bounded by document length, so the
         collect_list carries no skew beyond the longest page

    The reference has no corpus layer at all (main.py:283-284 reads whole
    local files); this operator exists for the Common-Crawl shape the north
    rule targets.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_ln"),
    )
    hot = (
        lines.groupBy("_ln")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") > max_occurrences)
        .select("_ln")
    )
    kept = lines.join(hot, "_ln", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_ln"))),
                lambda s: s["_ln"],
            ),
        ).alias("_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("_text", F.lit("")).alias(text_col),
            "n_lines",
            (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_dropped"
            ),
        )
    )


def _gram_hashes(words, k: int):
    """int64 hashes of every k-word window of ``words`` (array column).

    Hash = first 12 hex digits of md5 of the space-joined window — the
    repo's DuckDB-portable int64 hash (Spark ``conv(substring(md5,1,12))``
    == DuckDB ``('0x'||substr(md5,1,12))::BIGINT``; 48 bits, N=12 so the
    value stays exact in int64 arithmetic on both engines).
    Documents shorter than k words produce an empty array (guarded: a bare
    ``sequence(1, n-k+1)`` would DESCEND for n < k and emit phantom grams).
    """
    n = F.size(words)
    gram = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat_ws(" ", F.slice(words, i, k))), 1, 12),
        16,
        10,
    ).cast("long")
    return F.when(
        n >= k,
        F.transform(F.sequence(F.lit(1), n - F.lit(k - 1)), gram),
    ).otherwise(F.array().cast("array<bigint>"))


def _word_array(col):
    return F.filter(F.split(col, r"\s+"), lambda w: w != F.lit(""))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any k-word
    window with an evaluation set (the GPT-3/Pile "13-gram collision" rule).

    Returns one row per input document:
    (id_col, n_grams, n_hits [distinct colliding grams], contaminated).
    Callers drop flagged docs with ``.filter(~F.col("contaminated"))``.

    Scale shape (100 TB corpus, MB-scale eval suites):
      * the benchmark side is grams -> distinct -> broadcast — eval sets
        are tiny by construction, so the corpus-side probe is a broadcast
        semi-join, never a shuffle of corpus grams
      * the corpus side is one linear pass (JVM split/transform/explode,
        48-bit gram hashes only — window text is never shipped)
      * only COLLIDING grams reach the per-doc count agg, so the one
        shuffle carries O(collisions), not O(corpus grams)
      * per-doc gram totals come from arithmetic (len-k+1), not from
        counting the exploded side — zero-gram docs still get a row

    The reference has no decontamination (its corpus layer is whole-file
    reads, main.py:283-284); this is a first-class training-data-pipeline
    operator per the build brief.
    """
    bench_grams = (
        benchmark.select(
            F.explode(
                _gram_hashes(_word_array(F.col(bench_text_col)), k)
            ).alias("_g")
        )
        .distinct()
    )
    words = _word_array(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        F.greatest(F.size(words) - F.lit(k - 1), F.lit(0))
        .cast("long")
        .alias("n_grams"),
    )
    hits = (
        docs.select(F.col(id_col), F.explode(_gram_hashes(words, k)).alias("_g"))
        .join(F.broadcast(bench_grams), "_g", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("_g").alias("_hits"))
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce("_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("_hits", F.lit(0)) >= min_hits).alias("contaminated"),
    )


# PII patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookaround, no backrefs) so the DuckDB oracle runs the SAME pattern
# strings. Insertion order IS redaction order: each pattern counts and
# replaces on the text as left by the previous one (an email's +tag local
# part must be consumed before the phone pattern can see its digits).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d\-]{7,}\d",
}


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Scrub emails / IPv4 addresses / phone numbers, in place.

    Returns the input with ``text_col`` redacted (each match replaced by
    ``<NAME>``) plus one ``n_<name>`` count column per pattern. Pure
    sequential ``regexp_replace`` / ``regexp_extract_all`` column
    expressions — row-local, shuffle-free, whole-stage-codegen-able, so the
    pass is a linear scan at any corpus size.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    redacted = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(
            F.size(F.regexp_extract_all(redacted, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, f"<{name.upper()}>")
    others = [c for c in docs.columns if c != text_col]
    return docs.select(*others, redacted.alias(text_col), *counts)


def exact_substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): every token position covered by a
    k-token window whose exact content occurs >= ``min_count`` times in
    the WHOLE corpus (across documents or repeated within one) is removed
    from every document; survivors are rejoined in original order.

    Returns (id_col, text [cleaned, single-space rejoined], n_tokens,
    n_removed, n_spans) — one row per input document; ``n_spans`` is the
    number of maximal contiguous removed regions (adjacent/overlapping
    duplicate windows merge into one span).

    This is the suffix-array dedup of the paper re-expressed for Spark:
    instead of one global suffix array (inherently sequential to build),
    hash every k-token window and count — identical removal semantics for
    the fixed window length, and every stage is a linear scan or a hash
    shuffle whose payload is (doc, pos, int64):

      1. one posexplode of per-window hashes (the k-token window string is
         hashed inside the projection and never shipped — bytes hashed are
         n*k per doc, CPU-bounded, trivially partition-parallel; a rolling
         Rabin-Karp inside mapInPandas would cut the k factor but leave
         the JVM and is deliberately not the default)
      2. hash-agg hash -> count; windows >= min_count join back
         (AQE broadcasts the hot side when it measures small)
      3. covered positions = explode of the k offsets of DUPLICATED
         windows only (linear in duplicated volume, not corpus volume)
      4. left_anti on (doc, pos) + per-doc ordered rebuild — per-doc state
         bounded by document length, same shape as line_dedup
      5. span count = interval merge over duplicate window starts (per-doc
         window over the duplicated subset only)

    48-bit window hashes: ~1e-6 collision odds at 1e9 distinct windows
    per the birthday bound are acceptable for dedup (a collision removes
    one innocent span); raise to N=16 hex digits off the DuckDB-parity
    path if needed. Reference has no substring-level dedup at all (its
    corpus layer is whole-file exact dedup, scripts/prepare_data.py:124).
    """
    base = _substr_base(docs, id_col, text_col)
    wins = base.select(
        id_col, F.posexplode(_gram_hashes(F.col("_ws"), k)).alias("_wpos", "_h")
    )
    hot = (
        wins.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_h")
    )
    dup = wins.join(hot, "_h").select(id_col, "_wpos")
    return _apply_window_removal(base, dup, k, id_col, text_col)


def _substr_base(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        _word_array(F.col(text_col)).alias("_ws"),
    ).select(id_col, "_ws", F.size("_ws").cast("long").alias("n_tokens"))


def _apply_window_removal(
    base: DataFrame, dup: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """Shared removal stage of the ExactSubstr family: duplicated window
    starts -> covered positions -> anti-join + ordered rebuild + merged
    span count (see exact_substring_dedup for the plan-shape notes)."""
    from pyspark.sql import Window

    cov = dup.select(
        id_col,
        F.explode(
            F.sequence(F.col("_wpos"), F.col("_wpos") + F.lit(k - 1))
        ).alias("_pos"),
    ).distinct()
    toks = base.select(id_col, F.posexplode("_ws").alias("_pos", "_tok"))
    kept = toks.join(cov, [id_col, "_pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_tok"))),
                lambda s: s["_tok"],
            ),
        ).alias("_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    prev_end = F.max(F.col("_wpos") + F.lit(k)).over(
        Window.partitionBy(id_col)
        .orderBy("_wpos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        dup.select(id_col, "_wpos", prev_end.alias("_pe"))
        .select(
            id_col,
            F.when(
                F.col("_pe").isNull() | (F.col("_wpos") > F.col("_pe")), 1
            )
            .otherwise(0)
            .alias("_new"),
        )
        .groupBy(id_col)
        .agg(F.sum("_new").alias("_n_spans"))
    )
    return (
        base.select(id_col, "n_tokens")
        .join(rebuilt, id_col, "left")
        .join(spans, id_col, "left")
        .select(
            id_col,
            F.coalesce("_text", F.lit("")).alias(text_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce("_n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )


def exact_substring_hash_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """(_h, cnt): the persistable ExactSubstr index — corpus-wide k-token
    window-hash counts. Write it out (bucketed by _h for probe joins) and
    feed it to :func:`exact_substring_dedup_incremental` so daily batches
    never rescan the historical corpus."""
    base = _substr_base(docs, id_col, text_col)
    return (
        base.select(F.explode(_gram_hashes(F.col("_ws"), k)).alias("_h"))
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def exact_substring_dedup_incremental(
    new_docs: DataFrame,
    base_counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Daily-ingest ExactSubstr: dedup the NEW batch against an existing
    corpus's stored window-hash counts (``base_counts`` from
    :func:`exact_substring_hash_counts`) plus the batch itself — without
    recomputing anything over the old corpus.

    A window is removed when (its count within the new batch) + (its
    stored corpus count) reaches ``min_count`` — identical semantics to
    running :func:`exact_substring_dedup` over corpus ∪ batch and keeping
    the batch rows, except historical docs are not re-cleaned (their text
    is never read). Per-day cost is O(batch) plus one equi-join probe of
    the batch's distinct window hashes into the stored index — never
    O(corpus). Same output schema as exact_substring_dedup.
    """
    base = _substr_base(new_docs, id_col, text_col)
    wins = base.select(
        id_col, F.posexplode(_gram_hashes(F.col("_ws"), k)).alias("_wpos", "_h")
    )
    new_counts = wins.groupBy("_h").agg(F.count(F.lit(1)).alias("_cn"))
    hot = (
        new_counts.join(base_counts, new_counts["_h"] == base_counts["_h"], "left")
        .select(
            new_counts["_h"],
            (F.col("_cn") + F.coalesce("cnt", F.lit(0))).alias("_c"),
        )
        .filter(F.col("_c") >= min_count)
        .select("_h")
    )
    dup = wins.join(hot, "_h").select(id_col, "_wpos")
    return _apply_window_removal(base, dup, k, id_col, text_col)


def host_boilerplate(
    pages: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_share: float = 0.5,
) -> DataFrame:
    """(host, line, n_pages, host_pages): lines that repeat across at least
    ``min_share`` of a host's pages — per-host boilerplate (nav bars,
    footers, cookie banners), the host-scoped refinement of corpus-level
    line_dedup that CCNet applies per-shard and RefinedWeb per-domain.

    A line counts once per page it appears on (presence, not multiplicity).
    The share test is exact integer arithmetic: ``n_pages * 1_000_000 >=
    round(min_share * 1e6) * host_pages`` — no float division to diverge
    between engines.

    Plan shape: line explode → distinct (host, page, line) → one count
    keyed on (host, line), one count keyed on host, one hash join on host.
    Host hotness is bounded: the per-(host,line) count combines map-side,
    and the host-pages dimension is one row per host (broadcastable).
    """
    share_micro = int(round(min_share * 1_000_000))
    lines = (
        pages.select(
            F.col(host_col).alias("host"),
            F.col(id_col).alias("page_id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("line"),
        )
        .filter(F.trim(F.col("line")) != "")
        .distinct()
    )
    per_line = lines.groupBy("host", "line").agg(
        F.countDistinct("page_id").alias("n_pages")
    )
    per_host = pages.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(F.col(id_col)).alias("host_pages")
    )
    return (
        per_line.join(F.broadcast(per_host), "host")
        .filter(
            F.col("n_pages") * F.lit(1_000_000)
            >= F.lit(share_micro) * F.col("host_pages")
        )
        .select("host", "line", "n_pages", "host_pages")
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level FIRST-OCCURRENCE paragraph dedup (the Dolma / RefinedWeb
    exact-paragraph pass): every exact paragraph keeps only its first
    occurrence in corpus order (smallest (doc_id, position)); all later
    copies are dropped from their documents. Complements
    :func:`line_dedup`, which drops high-frequency lines EVERYWHERE — here
    one canonical copy always survives, the right rule for syndicated
    article bodies (the content should stay in the corpus exactly once).

    Returns (id_col, text [cleaned], n_paras, n_kept) — one row per input
    document, including documents whose every paragraph was a later copy
    (text ""). First-occurrence selection is one paragraph-keyed
    min-aggregation over the lexicographic struct key ``(doc_id, pos)``
    (overflow-free and id-type-agnostic — an arithmetic ordinal like
    ``id * K + pos`` would silently collide across documents once a
    document holds >= K paragraphs), then one join back; no windows, no
    global sort.
    """
    ex = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).localCheckpoint(eager=True)
    first = ex.groupBy("para").agg(
        F.min(F.struct("_id", "pos")).alias("_first")
    )
    kept = (
        ex.join(first, "para")
        .filter(
            (F.col("_id") == F.col("_first._id"))
            & (F.col("pos") == F.col("_first.pos"))
        )
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s.getField("para"),
                ),
                sep,
            ).alias("_text"),
        )
    )
    totals = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("n_paras"))
    return totals.join(kept, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("_text", F.lit("")).alias(text_col),
        F.col("n_paras").cast("long").alias("n_paras"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


# leetspeak normalization shared with the oracle: digits that commonly
# stand in for letters. Applied AFTER lowercasing, BEFORE tokenization.
LEET_FROM = "013457"
LEET_TO = "oieast"


def blocklist_hits(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, n_hits): obfuscation-tolerant blocklist filter —
    the C4 "bad words" gate (Raffel et al. 2020 filter any document
    containing a listed word) hardened against the trivial leetspeak
    dodge: text lowercases and maps 0->o 1->i 3->e 4->a 5->s 7->t
    BEFORE tokenizing, so "sp4m" still hits a "spam" entry. Emits one
    row per (doc, matched term) with the hit count; a curation funnel
    anti-joins documents on doc_id to drop them.

    Shape: one row-local translate + token explode, then a broadcast
    semi-ish join against the |terms|-row blocklist and a (doc, term)
    hash agg — linear in tokens, the blocklist is driver-sized by
    definition.
    """
    normed = F.translate(F.lower(F.col(text_col)), LEET_FROM, LEET_TO)
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.regexp_extract_all(normed, F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tl = docs.sparkSession.createDataFrame([(t,) for t in terms], ["term"])
    return (
        tok.join(F.broadcast(tl), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """(split_a, split_b, n_pairs): near-duplicate leakage audit across
    train/val/test splits — how many verified near-dup pairs STRADDLE
    split boundaries. A random split of a near-dup-contaminated corpus
    leaks test answers into train (the published decontamination failure
    mode); the fix is splitting by near-dup GROUP, and this operator is
    the gate proving whether that was done: off-diagonal rows must be
    zero for a leakage-safe split.

    ``pairs`` is any (a, b) duplicate-pair set (e.g. minhash_near_dup's
    output); ``splits`` maps id -> split. Two broadcastable equi-joins
    (the split table is one narrow row per doc) + one tiny agg keyed by
    the 3x3 split matrix; pair orientation canonicalizes on SPLIT name
    so (train, test) and (test, train) count as one cell.
    """
    sa = splits.select(
        F.col(id_col).alias("a"), F.col(split_col).alias("_sa")
    )
    sb = splits.select(
        F.col(id_col).alias("b"), F.col(split_col).alias("_sb")
    )
    return (
        pairs.select("a", "b")
        .join(sa, "a")
        .join(sb, "b")
        .select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def novelty_curve(
    docs: DataFrame,
    gram_n: int = 8,
    batch_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(batch, n_grams, n_new, novelty_ppm): corpus novelty curve — per
    arrival batch (``id DIV batch_size``), the share of its word
    ``gram_n``-gram occurrences whose gram was NEVER seen in an earlier
    batch. The diminishing-returns readout of continued crawling: a
    healthy growing corpus decays slowly; a curve that crashes to ~0
    says the crawler is re-fetching what it already has (and a flat ~1e6
    says the dedup upstream is broken).

    Two hash aggs over the exploded gram stream (md5-48bit gram keys —
    the decontaminate/ExactSubstr convention): first occurrence batch
    per gram (min), then per-batch totals vs grams-first-seen-here,
    joined on the batch key. Linear; never materializes a seen-set per
    batch.
    """
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit("")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (gram_n - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(words, i, gram_n), " ")), 1, 12
            ),
            16, 10,
        ).cast("long"),
    )
    g = (
        # guard BEFORE building grams: Spark sequence(1, size-(n-1))
        # DESCENDS when the doc is shorter than one gram (the winnow
        # gotcha); DuckDB's range is empty there, so the oracle drops
        # short docs the same way this filter does.
        docs.filter(F.size(words) >= gram_n)
        .select(
            F.expr(f"{id_col} DIV {batch_size}").cast("long").alias("batch"),
            grams.alias("gs"),
        )
        .select("batch", F.explode("gs").alias("g"))
        .localCheckpoint(eager=True)
    )
    first = g.groupBy("g").agg(F.min("batch").alias("fb"))
    per_batch = g.groupBy("batch").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    new = (
        g.join(first, "g")
        .filter(F.col("batch") == F.col("fb"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    return (
        per_batch.join(new, "batch", "left")
        .select(
            "batch", "n_grams",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.expr(
                "(coalesce(n_new, 0L) * 1000000) DIV n_grams"
            ).alias("novelty_ppm"),
        )
    )
