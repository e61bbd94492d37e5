"""Text-analysis operators for training-data pipelines (all JVM-side).

Language ID (stopword-overlap heuristic), quality scoring
(length/punct/stopword ratios), token counting (whitespace + BPE-ish regex),
and document fingerprinting (content hash + positional sketch). Each has a
DuckDB-SQL mirror in __spark_entry__ so the driver's value-hash gate covers
them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import NORMALIZE_STOPWORDS

LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is", "to"),
    "de": ("der", "die", "das", "und", "ist", "zu"),
    "fr": ("le", "la", "les", "et", "est", "de"),
    "es": ("el", "la", "los", "y", "es", "de"),
}

BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(col):
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != F.lit(""))


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Best-overlap language guess; 'en' wins ties (deterministic)."""
    words = _words(F.col(text_col))

    def _cnt(markers):
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    cnts = {lang: _cnt(markers) for lang, markers in LANG_MARKERS.items()}
    others = lambda lang: F.greatest(*[c for l2, c in cnts.items() if l2 != lang])  # noqa: E731
    pred = F.lit("en")
    for lang in ("de", "fr", "es"):
        pred = F.when(cnts[lang] > others(lang), F.lit(lang)).otherwise(pred)
    return docs.withColumn("pred_lang", pred)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "*",
        F.size(_words(F.col(text_col))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text_col, F.lit(BPE_TOKEN_RE), 0)).alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    words = _words(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in sorted(NORMALIZE_STOPWORDS)])
    n_words = F.size(words)
    stop_ratio = F.when(
        n_words > 0, F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))) / n_words
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length(text_col) > 0,
        F.size(F.regexp_extract_all(text_col, F.lit(r"[^A-Za-z0-9\s]"), 0)) / F.length(text_col),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "*",
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(F.least(n_words / F.lit(100.0), F.lit(1.0)) * (1 - punct_ratio), 6).alias("quality"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: sha256 of normalized text + a positional
    64-bit sketch (xor-free rolling combination of the first/middle/last
    shingle hashes) for cheap prefix-tamper detection."""
    normed = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    words = _words(F.col(text_col))
    n = F.size(words)
    # decimal(38,0) arithmetic: md5-derived terms near 2^60 overflow bigint
    # under ANSI when scaled
    pick = lambda idx: F.conv(  # noqa: E731
        F.substring(F.md5(F.element_at(words, idx)), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    mixed = (
        pick(F.lit(1))
        + pick((n / 2).cast("int") + 1) * F.lit(31)
        + pick(n) * F.lit(961)
    ) % F.lit(2**62)
    sketch = F.when(n >= 3, mixed.cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return docs.select(
        "*",
        F.sha2(normed, 256).alias("content_sha256"),
        sketch.alias("position_sketch"),
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    dim: int = 4096,
    bias: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-bag-of-words linear classifier scoring — the shape of the
    fasttext/logistic "quality classifier" gate a GPT-3-style curation
    pipeline runs over every document.

    Tokens hash into ``dim`` buckets (md5, portable); ``weights`` maps
    bucket -> integer weight (milli-units). Returns
    (id_col, n_tokens, raw_score [= bias + sum of token-bucket weights,
    exact int64], score [= sigmoid(raw_score/1000), convenience double]).

    Keeping the dot product in int64 makes the score exact and
    summation-order-independent — the oracle can hash-compare raw_score;
    only the sigmoid is floating point. Plan shape at 100 TB:

      * one linear explode of tokens (JVM split, no Python)
      * broadcast join against the weight table (|dim| rows — a learned
        model's weights, tiny by definition)
      * per-doc sum with map-side combine: a doc's tokens sit in one
        partition, so the shuffle carries O(docs), not O(tokens)
      * zero-token docs rejoin with raw_score = bias

    ``weights=None`` uses deterministic pseudo-weights derived from the
    bucket id's md5 (weight in [-1000, 1000]) — the stand-in for a learned
    model in tests/benchmarks.

    The reference has no classifier gate (its quality pass is the rule
    filters in audit_quality.py:7-46); this is a first-class
    training-data-pipeline operator per the brief.
    """
    spark = docs.sparkSession
    if weights is None:
        weights = spark.range(dim).select(
            F.col("id").alias("bucket"),
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 2001
                - 1000
            ).alias("weight"),
        )
    toks = docs.select(
        F.col(id_col),
        F.explode(_words(F.col(text_col))).alias("_t"),
    ).select(
        id_col,
        (
            F.conv(F.substring(F.md5("_t"), 1, 8), 16, 10).cast("long")
            % F.lit(dim)
        ).alias("bucket"),
    )
    sums = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("weight").alias("_sum"),
            F.count(F.lit(1)).alias("_nt"),
        )
    )
    base = docs.select(
        F.col(id_col),
        F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    raw = F.coalesce(F.col("_sum"), F.lit(0)) + F.lit(bias)
    return base.join(sums, id_col, "left").select(
        id_col,
        "n_tokens",
        raw.cast("long").alias("raw_score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-(raw / F.lit(1000.0))))).alias(
            "score"
        ),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS algorithm): (id_col, pos, fp_hash), the rightmost-minimum
    k-gram hash of every ``window`` consecutive k-grams, deduplicated.

    The published guarantee: any two documents sharing a token run of
    length >= window + k - 1 share at least one fingerprint, while only
    ~2/(window+1) of all gram hashes are kept — the local, position-robust
    alternative to MinHash for plagiarism/near-dup detection.

    Relational formulation (no per-row Python, exact int64 end to end):
    grams explode to the <= ``window`` winnowing windows that contain them
    (O(G*window) rows, same order as ExactSubstr's coverage explode), the
    per-window rightmost minimum resolves in two map-side-combinable hash
    aggregations (min(h) then max(pos) among its holders — NO rank window
    over the exploded set), and the final distinct collapses adjacent
    windows that picked the same gram. Grams are hashed inside the
    projection (48-bit md5 prefix, the repo's DuckDB-portable int64 hash);
    tokens are lowercased per MOSS's normalization.
    """
    words = _words(F.col(text_col))
    gram = lambda i: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat_ws(" ", F.slice(words, i, k))), 1, 12),
        16,
        10,
    ).cast("long")
    n = F.size(words)
    grams = docs.select(
        F.col(id_col),
        (n - F.lit(k - 1)).alias("_g"),
        F.posexplode(
            F.when(
                n >= k,
                F.transform(F.sequence(F.lit(1), n - F.lit(k - 1)), gram),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("_pos", "_h"),
    )
    # window starts containing gram _pos: [max(0,_pos-window+1), min(_pos, G-window)]
    # NB: a bare sequence(start, stop) DESCENDS when start > stop (the
    # phantom-gram trap _gram_hashes documents) — guard the G < window case
    # (no complete winnowing window -> no fingerprints, per MOSS)
    _start = F.greatest(F.lit(0), F.col("_pos") - F.lit(window - 1))
    _stop = F.least(F.col("_pos"), F.col("_g") - F.lit(window))
    members = grams.select(
        id_col,
        "_h",
        "_pos",
        F.explode(
            F.when(_start <= _stop, F.sequence(_start, _stop)).otherwise(
                F.array().cast("array<int>")
            )
        ).alias("_j"),
    )
    wmin = members.groupBy(id_col, "_j").agg(F.min("_h").alias("_mh"))
    sel = (
        members.join(wmin, [id_col, "_j"])
        .filter(F.col("_h") == F.col("_mh"))
        .groupBy(id_col, "_j")
        .agg(F.max("_pos").alias("pos"), F.min("_mh").alias("fp_hash"))
    )
    return sel.select(id_col, "pos", "fp_hash").distinct()


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher quality-filter rule set (Rae et al. 2021, app. A, as
    adopted by MassiveText/RefinedWeb/Dolma): per document, the measured
    signals, each rule's verdict, and the overall gate.

      ok_word_count  50 <= n_words <= 100,000
      ok_mean_len    3 <= mean word length <= 10
      ok_symbol      (count('#') + count('...')) / n_words <= 0.1
      ok_bullet      <= 90% of lines start with a bullet (-, *, •)
      ok_ellipsis    <= 30% of lines end with an ellipsis (... or …)
      ok_alpha       >= 80% of words contain an alphabetic character
      ok_stop        >= 2 distinct Gopher stop words present
      gopher_pass    all of the above

    Every verdict is computed in EXACT integer arithmetic (e.g.
    ``10*symbols <= n_words`` instead of a double ratio compare), so the
    gate can never flip on a float boundary and the SQL oracle matches
    bit-for-bit; the reported ratio columns are round(6) doubles for
    human consumption only. Row-local column expressions throughout —
    shuffle-free, codegen-able, a linear scan at any corpus size.
    """
    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    nw = F.size(words).cast("long")
    nl = F.size(lines).cast("long")
    chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), 0)
    ).cast("long")
    bullets = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•]"))
    ).cast("long")
    ellipses = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    ).cast("long")
    alpha = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    low = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(low, s),
        )
    ).cast("long")
    ok_wc = (nw >= 50) & (nw <= 100_000)
    ok_ml = (F.lit(3) * nw <= chars) & (chars <= F.lit(10) * nw) & (nw > 0)
    ok_sym = F.lit(10) * symbols <= nw
    ok_bul = F.lit(10) * bullets <= F.lit(9) * nl
    ok_ell = F.lit(10) * ellipses <= F.lit(3) * nl
    ok_alpha = F.lit(5) * alpha >= F.lit(4) * nw
    ok_stop = stop_hits >= 2
    ratio = lambda a, b: F.when(  # noqa: E731
        b > 0, F.round(a.cast("double") / b, 6)
    ).otherwise(F.lit(0.0))
    return docs.select(
        "*",
        nw.alias("n_words"),
        ratio(chars, nw).alias("mean_word_len"),
        ratio(symbols, nw).alias("symbol_ratio"),
        ratio(bullets, nl).alias("bullet_frac"),
        ratio(ellipses, nl).alias("ellipsis_frac"),
        ratio(alpha, nw).alias("alpha_frac"),
        stop_hits.alias("n_stop_hits"),
        ok_wc.alias("ok_word_count"),
        ok_ml.alias("ok_mean_len"),
        ok_sym.alias("ok_symbol"),
        ok_bul.alias("ok_bullet"),
        ok_ell.alias("ok_ellipsis"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
        (
            ok_wc & ok_ml & ok_sym & ok_bul & ok_ell & ok_alpha & ok_stop
        ).alias("gopher_pass"),
    )


# Placeholder blocklist — the production List-of-Dirty-Naughty-Words is
# pluggable via the bad_words parameter; these two synthetic tokens exist so
# the rule path is exercised end-to-end by fixtures and the oracle.
C4_BAD_WORDS = ("spamword", "scamword")


def c4_rules(
    docs: DataFrame,
    text_col: str = "text",
    bad_words: tuple[str, ...] = C4_BAD_WORDS,
    min_sentences: int = 3,
    min_line_words: int = 5,
) -> DataFrame:
    """The C4 cleaning-rule set (Raffel et al. 2020, §2.2, "Colossal Clean
    Crawled Corpus"): per document, line-level retention plus page-level
    gates, and the cleaned text.

    Line is RETAINED iff all of:
      - ends in a terminal punctuation mark (``.`` ``!`` ``?`` ``"``)
      - has >= ``min_line_words`` whitespace words
      - does not contain the word "javascript" (case-insensitive)

    Page PASSES iff all of:
      - cleaned text has >= ``min_sentences`` sentences (counted as
        occurrences of ``.``/``!``/``?`` in the retained lines — a
        documented simplification of the paper's sentence splitter)
      - does not contain "lorem ipsum" (case-insensitive)
      - does not contain a curly brace ``{``
      - no whitespace word (lowercased, leading/trailing non-alphanumerics
        stripped) is on the ``bad_words`` blocklist

    All verdicts are integer/boolean comparisons on counts — no float
    thresholds anywhere, so the DuckDB oracle matches bit-for-bit. Row-local
    column expressions throughout: shuffle-free, codegen-able, a linear scan
    at any corpus size. The paper's remaining rule — corpus-level
    three-sentence-span dedup — is the cross-document complement and is
    covered by :func:`~..curation.exact_substring_dedup` / ``line_dedup``.

    Output adds: n_lines, n_kept_lines, n_sentences, has_lorem, has_brace,
    has_bad_word, c4_pass, clean_text.
    """
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    kept = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]$')
        & (
            F.size(F.filter(F.split(l, r"\s+"), lambda w: w != F.lit("")))
            >= min_line_words
        )
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )
    clean_text = F.array_join(kept, "\n")
    n_sentences = F.size(
        F.regexp_extract_all(clean_text, F.lit(r"[.!?]"), 0)
    ).cast("long")
    low = F.lower(F.col(text_col))
    has_lorem = F.contains(low, F.lit("lorem ipsum"))
    has_brace = F.contains(F.col(text_col), F.lit("{"))
    stripped = F.transform(
        F.filter(F.split(low, r"\s+"), lambda w: w != F.lit("")),
        lambda w: F.regexp_replace(w, r"^[^a-z0-9]+|[^a-z0-9]+$", ""),
    )
    has_bad = F.exists(
        F.array(*[F.lit(b) for b in bad_words]),
        lambda b: F.array_contains(stripped, b),
    )
    return docs.select(
        "*",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_bad.alias("has_bad_word"),
        (
            (n_sentences >= min_sentences)
            & ~has_lorem
            & ~has_brace
            & ~has_bad
        ).alias("c4_pass"),
        clean_text.alias("clean_text"),
    )


def train_quality_classifier(
    labeled: DataFrame,
    dim: int = 4096,
    text_col: str = "text",
    label_col: str = "label",
    max_iter: int = 20,
    reg_param: float = 0.01,
):
    """Train the fasttext-shaped quality gate in-engine and export it in
    :func:`classifier_score`'s weight-table format.

    Returns (weights_df, bias_milli): ``weights_df`` is (bucket, weight)
    with weights in integer milli-units over the SAME md5 token-bucket
    space classifier_score hashes into, so the trained model drops
    straight into the pure-JVM scorer — train once on a labeled sample
    with MLlib (driver-coordinated L-BFGS, executor-distributed gradient
    passes), then score 100 TB with broadcast-join arithmetic and no
    Python anywhere in the scoring path.

    Feature assembly: per-doc hashed-BoW count vectors built entirely
    JVM-side (bucket-count map -> dense array -> ``array_to_vector``) —
    NO Python in the training-data path either; MLlib's L-BFGS does the
    distributed gradient passes.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    spark = labeled.sparkSession
    toks = labeled.select(
        label_col,
        F.monotonically_increasing_id().alias("_rid"),
        _words(F.col(text_col)).alias("_ws"),
    ).select(
        label_col,
        "_rid",
        F.explode_outer("_ws").alias("_t"),
    ).select(
        label_col,
        "_rid",
        F.when(
            F.col("_t").isNotNull(),
            F.conv(F.substring(F.md5("_t"), 1, 8), 16, 10).cast("long")
            % F.lit(dim),
        ).alias("bucket"),
    )
    counts = (
        toks.groupBy("_rid", label_col, "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .groupBy("_rid", label_col)
        .agg(
            F.map_from_entries(
                F.filter(
                    F.collect_list(
                        F.when(
                            F.col("bucket").isNotNull(),
                            F.struct("bucket", "c"),
                        )
                    ),
                    lambda e: e.isNotNull(),
                )
            ).alias("_m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("bigint")), F.lit(0.0)
        ),
    )
    train_df = counts.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(dense).alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(train_df)
    coefs = model.coefficients
    if hasattr(coefs, "indices"):
        rows = [
            (int(i), int(round(float(v) * 1000)))
            for i, v in zip(coefs.indices, coefs.values)
        ]
    else:
        rows = [
            (int(i), int(round(float(v) * 1000)))
            for i, v in enumerate(coefs)
            if float(v) != 0.0
        ]
    weights = spark.createDataFrame(rows or [(0, 0)], "bucket long, weight long")
    return weights, int(round(float(model.intercept) * 1000))


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, word, tf, df, score_micro, rank): per-document TF-IDF
    keyword extraction — the per-doc complement of the query-side BM25
    ranker (same token model: lowercased ``\\w+`` words).

    idf = ln((N+1)/(df+1)) + 1 (smoothed, the sklearn convention) is frozen
    to int64 micro-units BEFORE the tf multiply, so the score and the
    ranking are exact integer arithmetic — order-independent and
    hash-stable against the oracle; ln is the single float step. Two
    map-side-combined aggregations (tf, then df off the tf table — the df
    pass never rereads the corpus), a vocabulary-sized broadcast join, and
    a per-doc window over that doc's distinct words only.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+"), 0)
        ).alias("word"),
    )
    tf = words.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(id_col).distinct().count()
    idf_micro = F.round(
        (
            F.log(
                (F.lit(n_docs) + 1).cast("double")
                / (F.col("df") + 1).cast("double")
            )
            + F.lit(1.0)
        )
        * 1e6,
        0,
    ).cast("long")
    scored = tf.join(F.broadcast(df_tbl.withColumn("_idf", idf_micro)), "word")
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("word")
    )
    return (
        scored.withColumn("score_micro", F.col("tf") * F.col("_idf"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "word", "tf", "df", "score_micro", "rank")
    )


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(..., n_words, n_sentences, n_syllables, fk_grade, reading_ease):
    Flesch-Kincaid grade level and Flesch reading ease (Kincaid et al.
    1975) — the classic rule-based readability pair, a standard
    quality/complexity signal in web-corpus curation stacks.

    Sentences = non-blank ``[.!?]+`` segments; words = lowercase alnum
    runs; syllables = vowel-group count per word, floored at 1 (the
    standard heuristic). All three counts are exact integers computed
    inside whole-stage codegen (regexp + array HOFs, no UDFs); the two
    formulas are the only float steps, round(6), written with the same
    operation order the SQL oracle uses. Degenerate docs (no words or
    no sentences) report NULL scores rather than dividing by zero.
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    sents = F.filter(
        F.split(F.col(text_col), r"[.!?]+"), lambda s: F.trim(s) != F.lit("")
    )
    syl = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.lit(1),
            F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)),
        ),
    )
    base = docs.select(
        "*",
        F.size(words).cast("long").alias("n_words"),
        F.size(sents).cast("long").alias("n_sentences"),
        syl.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    ok = (F.col("n_words") > 0) & (F.col("n_sentences") > 0)
    return base.select(
        "*",
        F.when(
            ok,
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
            ),
        ).alias("fk_grade"),
        F.when(
            ok,
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
            ),
        ).alias("reading_ease"),
    )


def rake_keywords(
    docs: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, phrase, phrase_len, score_micro, rank): RAKE keyword
    extraction (Rose et al. 2010) with CORPUS-level word statistics —
    candidate phrases are maximal stopword-free runs of alnum words;
    each member word scores degree/frequency where degree sums the
    lengths of every corpus phrase containing it; a phrase scores the
    sum of its members. Corpus-wide stats (the distributed twist on
    single-doc RAKE) make scores comparable across documents.

    Word scores are frozen to exact integers ((degree * 1e6) DIV freq)
    BEFORE the phrase sum, so ranking is hash-reproducible. Phrase
    membership dedups per (doc, phrase-instance); per-doc top_k uses a
    doc-partitioned row_number (bounded per-key cardinality: a doc's
    own phrase count). Ties break (score desc, phrase asc).
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    stop_arr = F.array(*[F.lit(w) for w in sorted(NORMALIZE_STOPWORDS)])
    ex = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(words).alias("pos", "word"),
    ).select(
        "_id", "pos", "word",
        F.array_contains(stop_arr, F.col("word")).alias("is_stop"),
    )
    w = Window.partitionBy("_id").orderBy("pos")
    ph = (
        ex.withColumn("phrase_idx", F.sum(F.col("is_stop").cast("int")).over(w))
        .filter(~F.col("is_stop"))
        .groupBy("_id", "phrase_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.getField("word"),
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("phrase_len"),
        )
        .localCheckpoint(eager=True)
    )
    members = ph.select(
        "_id", "phrase_idx", "phrase_len",
        F.explode(F.split(F.col("phrase"), " ")).alias("word"),
    )
    wstats = (
        members.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("phrase_len").alias("degree"),
        )
        .select("word", F.expr("(degree * 1000000) DIV freq").alias("wscore"))
    )
    scored = (
        members.join(wstats, "word")
        .groupBy("_id", "phrase_idx")
        .agg(F.sum("wscore").alias("score_micro"))
        .join(ph, ["_id", "phrase_idx"])
    )
    rw = Window.partitionBy("_id").orderBy(
        F.desc("score_micro"), F.asc("phrase")
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("_id").alias(id_col),
            "phrase",
            F.col("phrase_len").cast("long").alias("phrase_len"),
            F.col("score_micro").cast("long").alias("score_micro"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def llr_keywords(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    top_k: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """(source, word, n_in_source, llr_milli, rank): per-source
    distinctive-term mining by Dunning log-likelihood ratio (Dunning
    1993; the topic-signature method of Lin & Hovy 2000) — for each
    source, the words whose frequency there most exceeds the rest of
    the corpus, the standard "what is this domain about" profiler.

    LLR contingency: a = count(word, source), b = word elsewhere,
    c = other words in source, d = everything else. Each x*ln(x) term
    is frozen to round(x*ln(x)*1000) int64 BEFORE the signed sum (the
    DSIR trick), so no float accumulation order can flip a result;
    llr_milli = 2*(sum of frozen terms). One token explode + one
    (source, word) count + two marginal joins + the scalar N via a
    broadcast crossJoin; per-source top_k is a source-partitioned
    row_number (source cardinality is tiny).
    """
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0
    )
    tok = docs.select(
        F.col(source_col).alias("source"), F.explode(words).alias("word")
    ).localCheckpoint(eager=True)
    a = tok.groupBy("source", "word").agg(F.count(F.lit(1)).alias("a"))
    wt = tok.groupBy("word").agg(F.count(F.lit(1)).alias("_wt"))
    st = tok.groupBy("source").agg(F.count(F.lit(1)).alias("_st"))
    n = tok.agg(F.count(F.lit(1)).alias("_n"))

    def xlx(x):
        xd = x.cast("double")
        return (
            F.when(x > 0, F.round(xd * F.log(xd) * F.lit(1000.0)))
            .otherwise(F.lit(0))
            .cast("long")
        )

    b = F.col("_wt") - F.col("a")
    c = F.col("_st") - F.col("a")
    d = F.col("_n") - F.col("_wt") - F.col("_st") + F.col("a")
    llr = F.lit(2) * (
        xlx(F.col("a")) + xlx(b) + xlx(c) + xlx(d)
        - xlx(F.col("a") + b) - xlx(c + d)
        - xlx(F.col("a") + c) - xlx(b + d)
        + xlx(F.col("_n"))
    )
    # Dunning LLR is two-sided: an UNDER-represented word scores just as
    # high as an over-represented one. Gate on over-representation
    # (p(word|source) > p(word), i.e. a*N > wt*st) so only genuinely
    # distinctive terms rank. Compared in DOUBLE — at web scale the
    # count products exceed int64; IEEE evaluation is identical in the
    # engine and the oracle.
    over = (
        F.col("a").cast("double") * F.col("_n").cast("double")
        > F.col("_wt").cast("double") * F.col("_st").cast("double")
    )
    scored = (
        a.filter(F.col("a") >= min_count)
        .join(wt, "word")
        .join(st, "source")
        .crossJoin(F.broadcast(n))
        .filter(over)
        .select(
            "source", "word",
            F.col("a").cast("long").alias("n_in_source"),
            llr.cast("long").alias("llr_milli"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("llr_milli"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "source", "word", "n_in_source", "llr_milli",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def textrank_keywords(
    docs: DataFrame,
    iterations: int = 5,
    top_k: int = 50,
    min_len: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(word, tr_micro, rank): corpus-level TextRank keyword extraction
    (Mihalcea & Tarau, EMNLP 2004) — PageRank over the word co-occurrence
    graph built from adjacent content words (lowercase alpha tokens of
    length >= min_len with stopwords removed; window = 2, undirected).

    The rank recursion runs entirely in int64 micro-units: total mass
    1e12, pr0 = 1e12 DIV n, per iteration
    ``pr' = (0.15 * 1e12) DIV n + (85 * in_mass) DIV 100`` with
    ``in_mass = sum(pr DIV degree)`` — integer truncation on both ends,
    so the fixpoint is bit-exact and hash-reproducible (no float
    accumulation order anywhere; the documented trade is a tiny mass
    leak per iteration, identical on every replay). The symmetrized
    edge set guarantees degree >= 1 for every node, so there is no
    dangling term.

    Shape: adjacency pairs are row-local array ops (no self-join);
    each PageRank round is one equi-join + one hash agg on (word, long)
    payloads with per-round localCheckpoint (O(1) plan depth); the
    final top_k is an orderBy+limit (TakeOrderedAndProject) with rank
    attached over the bounded top_k-row result.
    """
    stop_arr = F.array(*[F.lit(w) for w in sorted(NORMALIZE_STOPWORDS)])
    toks = F.filter(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0),
        lambda w: (F.length(w) >= min_len) & ~F.array_contains(stop_arr, w),
    )
    seq = docs.select(toks.alias("ws")).filter(F.size("ws") >= 2)
    pairs = seq.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("a"),
                    F.element_at("ws", i + 1).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b").filter(F.col("a") != F.col("b"))
    und = pairs.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).distinct()
    e = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col("node").alias("word"),
            F.lit(0).cast("long").alias("tr_micro"),
            F.lit(0).cast("long").alias("rank"),
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    # Rank table = one row per word; broadcast it into the round join when
    # it fits (checkpointed tables have no size stats, so Spark would
    # otherwise re-shuffle the edge table every round). Degree is constant
    # across rounds: annotate the edge table once, map-side when broadcast.
    small = n <= 2_000_000
    ew = e.join(F.broadcast(deg) if small else deg, "src")
    total = 1_000_000_000_000
    teleport = (15 * total // 100) // n  # both DIVs exact int, same both sides
    ranks = nodes.select("node", F.lit(total // n).cast("long").alias("pr"))
    for r in range(iterations):
        rb = F.broadcast(ranks) if small else ranks
        mass = (
            ew.join(rb, ew.src == rb.node)
            .select(F.col("dst"), F.expr("pr DIV deg").alias("c"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(
            F.broadcast(mass) if small else mass, "node", "left"
        ).select(
            "node",
            (
                F.lit(teleport).cast("long")
                + F.expr("(85 * coalesce(m, 0L)) DIV 100")
            ).alias("pr"),
        )
        # ranks feed exactly ONE consumer per round (the next round), so
        # rounds chain lazily into one job; periodic checkpoint only bounds
        # plan depth for large iteration counts.
        if (r + 1) % 3 == 0 and (r + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    top = (
        ranks.orderBy(F.desc("pr"), F.asc("node"))
        .limit(top_k)
        .select(F.col("node").alias("word"), F.col("pr").alias("tr_micro"))
    )
    # rank window runs over the already-limited top_k rows (bounded by
    # construction, same caveat as hybrid_rrf's result-list windows)
    w = Window.orderBy(F.desc("tr_micro"), F.asc("word"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def centroid_summaries(
    docs: DataFrame,
    seg_len: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, seg_idx, summary, score_nano): centroid extractive
    summarization (the SumBasic/centroid family, Nenkova & Vanderwende
    2005) — each document's most corpus-representative ``seg_len``-word
    window, the cheap deterministic "summary" column a training-data
    pipeline materializes for augmentation and preview.

    Documents split into consecutive full windows of ``seg_len`` words
    (row-local array slice; the ragged tail window is dropped so every
    candidate has identical length and scores are comparable). A window
    scores the sum of its non-stopword members' corpus probabilities —
    frozen to nano ints ((count * 1e9) DIV total) BEFORE the per-window
    sum — DIV seg_len; windows whose members are all stopwords score 0.
    Top-1 per doc by (score desc, seg_idx asc) via a per-doc-bounded
    row_number. Shape: one vocab-sized count + a broadcastable prob
    join; everything else row-local.
    """
    stop_arr = F.array(*[F.lit(w) for w in sorted(NORMALIZE_STOPWORDS)])
    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    dw = docs.select(F.col(id_col).alias("doc_id"), ws.alias("ws"))
    dw = dw.localCheckpoint(eager=True)

    def notstop(w):
        return ~F.array_contains(stop_arr, w)

    tok = dw.select(
        F.explode(F.filter("ws", notstop)).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # Corpus token total as a 1-row broadcast scalar (same max(count, 1)
    # guard, exact int DIV) — no separate driver .count() job.
    ctot = F.broadcast(
        tok.agg(F.greatest(F.count(F.lit(1)), F.lit(1)).alias("_T"))
    )
    probs = cnt.crossJoin(ctot).select(
        "w", F.expr("(c * 1000000000) DIV _T").alias("p_nano")
    )

    # guard: Spark sequence(1, 0) DESCENDS (the winnow gotcha) — docs
    # shorter than one window carry no candidate and are dropped here
    # (DuckDB's range(1, 1) is empty, so the oracle drops them the same way)
    segs = dw.filter(F.size("ws") >= seg_len).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.size("ws") / seg_len).cast("int")),
                lambda i: F.struct(
                    i.alias("seg_idx"),
                    F.slice("ws", (i - F.lit(1)) * seg_len + 1, seg_len).alias(
                        "seg"
                    ),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.seg_idx", "s.seg")

    # The window text rides THROUGH the scoring aggregation (first(seg) —
    # constant within a group, partial-agg collapses it map-side), so there
    # is no segs checkpoint and no (doc, seg) re-join exchange. explode_outer
    # keeps all-stopword windows as a null-word row, whose missed prob
    # lookup sums to NULL -> coalesced 0, exactly the old left-join score.
    scored = (
        segs.select(
            "doc_id",
            "seg_idx",
            "seg",
            F.explode_outer(F.filter("seg", notstop)).alias("w"),
        )
        .join(F.broadcast(probs), "w", "left")
        .groupBy("doc_id", "seg_idx")
        .agg(
            F.first("seg").alias("seg"),
            F.expr(f"sum(p_nano) DIV {seg_len}").alias("score_nano"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_nano"), F.asc("seg_idx")
    )
    return (
        scored.select(
            "doc_id",
            "seg_idx",
            F.array_join("seg", " ").alias("summary"),
            F.coalesce("score_nano", F.lit(0)).cast("long").alias("score_nano"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("seg_idx").cast("long").alias("seg_idx"),
            "summary",
            "score_nano",
        )
    )


def zipf_fit(
    docs: DataFrame,
    top_ranks: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """(n_ranks, slope): Zipf-law exponent of the corpus frequency
    distribution — the least-squares slope of ln(freq) on ln(rank) over
    the ``top_ranks`` head of the vocabulary (fitting only the head is
    the standard practice AND the int64-overflow bound: with ranks
    capped at 100 and ln frozen to micro ints (|x| <= ~1.4e7), every
    moment n*Sxy, Sx*Sy stays under 2^63). Healthy natural-language
    corpora fit slope ~ -1; a badly deduplicated or template-heavy crawl
    drifts far from it, making this a one-row corpus QA gate.

    All sums are int64 over frozen ln micro-units; the only float step
    is the final slope division, rounded to 6 on both engine and oracle.
    The rank table is top_ranks rows by construction
    (TakeOrderedAndProject + a bounded row_number).
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    cnt = (
        docs.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(top_ranks)
    )
    ranked = cnt.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w"))),
    ).select(
        F.expr("CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT)").alias("x"),
        F.expr("CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)").alias("y"),
    )
    return (
        ranked.agg(
            F.count(F.lit(1)).alias("nr"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .select(
            F.col("nr").cast("long").alias("n_ranks"),
            F.expr(
                "CASE WHEN nr * sxx - sx * sx <> 0 THEN "
                "round(CAST(nr * sxy - sx * sy AS DOUBLE)"
                " / CAST(nr * sxx - sx * sx AS DOUBLE), 6) END"
            ).alias("slope"),
        )
    )


# The collocation PMI expression, applied verbatim by engine (F.expr) and
# oracle so the float op order matches; n12/nl/nr/N are exact ints.
_PMI_SQL = (
    "CAST(round(ln(CAST(n12 AS DOUBLE) * CAST(N AS DOUBLE)"
    " / (CAST(nl AS DOUBLE) * CAST(nr AS DOUBLE))) * 1000000.0) AS BIGINT)"
)


def word_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n12, pmi_micro, rank): corpus collocation mining — the
    top adjacent word bigrams by pointwise mutual information
    (Church & Hanks 1990), PMI = ln(p(w1,w2) / (p(w1·) p(·w2))) with the
    marginals taken over bigram slots (left-word and right-word counts),
    so the probabilities live in one event space and the measure is
    exact. The word-level twin of entity_pmi's chunk-window association.

    n12/nl/nr/N are exact int64 counts; ln is the only float step,
    frozen to micro ints through the shared ``_PMI_SQL`` expression.
    Shape: one row-local adjacency explode, three hash aggs (bigrams +
    two marginals), two broadcastable marginal joins, bounded top_k.
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    seq = docs.select(words.alias("ws")).filter(F.size("ws") >= 2)
    pairs = seq.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2").localCheckpoint(eager=True)
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    left = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("nl"))
    right = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("nr"))
    n_total = max(pairs.count(), 1)
    scored = (
        big.filter(F.col("n12") >= min_count)
        .join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .select(
            "w1", "w2",
            F.col("n12").cast("long").alias("n12"),
            F.col("nl").cast("long").alias("nl"),
            F.col("nr").cast("long").alias("nr"),
            F.lit(n_total).cast("long").alias("N"),
        )
        .select(
            "w1", "w2", "n12", F.expr(_PMI_SQL).alias("pmi_micro")
        )
        .orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long"))


def vocab_coverage(
    docs: DataFrame,
    ks: tuple[int, ...] = (10, 20, 50),
    text_col: str = "text",
) -> DataFrame:
    """(k, top_tokens, cover_ppm): cumulative token coverage of the top-k
    vocabulary — what share of the corpus token stream the k most
    frequent words account for. The head-coverage curve is the cheap
    corpus-health twin of zipf_fit (a boilerplate-heavy crawl covers 90%
    with a handful of words; a healthy mix doesn't) and sizes
    stopword/vocab lists empirically.

    Exact int64 end to end: counts, a bounded top-max(ks) rank
    (TakeOrderedAndProject + row_number over the bounded result), a
    running sum over those <= max(ks) rows, cover_ppm = (cum * 1e6) DIV
    total.
    """
    kmax = max(ks)
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    tok = docs.select(F.explode(words).alias("w"))
    total = max(tok.count(), 1)
    top = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(kmax)
    )
    w = Window.orderBy(F.desc("c"), F.asc("w"))
    cum = Window.orderBy(F.desc("c"), F.asc("w")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = top.select(
        F.row_number().over(w).alias("k"),
        F.sum("c").over(cum).cast("long").alias("top_tokens"),
    )
    return ranked.filter(F.col("k").isin(*ks)).select(
        F.col("k").cast("long").alias("k"),
        "top_tokens",
        F.expr(f"(top_tokens * 1000000) DIV {total}").alias("cover_ppm"),
    )


# the adjacent-block cosine, applied verbatim on both sides: dot/na/nb are
# exact int64 (sums of count products); sqrt and one division are the only
# float steps, frozen to micro before any comparison.
_TILE_SIM_SQL = (
    "CAST(round(CAST(dot AS DOUBLE)"
    " / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) * 1000000.0) AS BIGINT)"
)


def topic_shifts(
    docs: DataFrame,
    window_words: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, gap_idx, sim_micro): TextTiling-style topic segmentation
    (Hearst 1997) — documents split into consecutive ``window_words``
    blocks; each inter-block gap scores the cosine similarity of the two
    adjacent blocks' term vectors, and the row returned per document is
    its SHARPPEST topic shift (global-minimum gap, ties to the earliest),
    the split point a long-document chunker should cut at before
    embedding.

    Counts and dot products are exact int64; the cosine's sqrt/division
    are frozen to micro ints through the shared ``_TILE_SIM_SQL``
    expression. Shape: row-local windowing (the summarize slice), one
    (doc, window, word) count agg, a self-equi-join on (doc, word) at
    window+1 (each word matches only its neighbor window — linear), two
    norm aggs, one per-doc min_by. Docs with fewer than 2 full windows
    drop (no gap to score).
    """
    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    dw = docs.select(F.col(id_col).alias("doc_id"), ws.alias("ws")).filter(
        F.size("ws") >= 2 * window_words
    )
    segs = dw.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), (F.size("ws") / window_words).cast("int")),
                lambda i: F.struct(
                    i.alias("win"),
                    F.slice(
                        "ws", (i - F.lit(1)) * window_words + 1, window_words
                    ).alias("seg"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.win", F.explode("s.seg").alias("w"))
    cnt = segs.groupBy("doc_id", "win", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cnt = cnt.localCheckpoint(eager=True)
    norms = cnt.groupBy("doc_id", "win").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("nn")
    )
    nxt = cnt.select(
        "doc_id", (F.col("win") - 1).alias("win"), "w",
        F.col("c").alias("c2"),
    )
    dots = (
        cnt.join(nxt, ["doc_id", "win", "w"])
        .groupBy("doc_id", "win")
        .agg(F.sum(F.col("c") * F.col("c2")).cast("long").alias("dot"))
    )
    gaps = (
        norms.select("doc_id", "win", F.col("nn").alias("na"))
        .join(
            norms.select(
                "doc_id", (F.col("win") - 1).alias("win"),
                F.col("nn").alias("nb"),
            ),
            ["doc_id", "win"],
        )
        .join(dots, ["doc_id", "win"], "left")
        .select(
            "doc_id",
            F.col("win").cast("long").alias("gap_idx"),
            F.coalesce("dot", F.lit(0)).cast("long").alias("dot"),
            "na", "nb",
        )
        .select("doc_id", "gap_idx", F.expr(_TILE_SIM_SQL).alias("sim_micro"))
    )
    return (
        gaps.groupBy("doc_id")
        .agg(
            F.min(F.struct("sim_micro", "gap_idx")).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.gap_idx").alias("gap_idx"),
            F.col("m.sim_micro").alias("sim_micro"),
        )
    )


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, entropy_milli): character-bigram Shannon
    entropy per document in milli-nats — the gibberish detector (random
    byte soup maxes entropy; 'aaaa...' keyboard mash or template spam
    floors it; natural language sits in a recognizable band, which is
    how CCNet/Gopher-class pipelines use it).

    H = ln(n) - (1/n)*sum(c_i ln c_i) over bigram counts; every x*ln(x)
    term freezes to round(x ln x * 1000) int64 (the LLR/DSIR trick)
    BEFORE the signed sum, and the final division is integer:
    entropy_milli = (xlx(n) - sum xlx(c)) DIV n. Entirely row-group
    local: one bigram explode + one (doc, bigram) count + one per-doc
    agg; nothing corpus-wide.
    """
    t = F.lower(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc_id"), t.alias("_t")).filter(
        F.length("_t") >= 2
    )
    bg = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_t") - 1),
                lambda i: F.col("_t").substr(i, F.lit(2)),
            )
        ).alias("bg"),
    )
    cnt = bg.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    xlx = "CAST(round(CAST({x} AS DOUBLE) * ln(CAST({x} AS DOUBLE)) * 1000.0) AS BIGINT)"
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.expr(xlx.format(x="c"))).cast("long").alias("sxlx"),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_bigrams"),
            F.expr(
                "(" + xlx.format(x="n") + " - sxlx) DIV n"
            ).alias("entropy_milli"),
        )
    )


def next_word_table(
    docs: DataFrame,
    top_k: int = 3,
    min_count: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(w1, w2, n12, cond_ppm, rank): the conditional bigram table — per
    word, its ``top_k`` most likely successors with exact ppm conditional
    probability (n12 * 1e6 DIV n1 over bigram-slot counts). The
    maximum-likelihood bigram LM every autocomplete/next-token baseline
    starts from, and the probability twin of word_collocations' PMI
    (PMI finds SURPRISING pairs; this finds LIKELY ones).

    Row-local adjacency explode + two hash aggs + a per-w1 bounded
    row_number (per-key cardinality = a word's distinct successors).
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    seq = docs.select(words.alias("ws")).filter(F.size("ws") >= 2)
    pairs = seq.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2").localCheckpoint(eager=True)
    n1 = pairs.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n12 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n12"))
        .filter(F.col("n12") >= min_count)
    )
    w = Window.partitionBy("w1").orderBy(F.desc("n12"), F.asc("w2"))
    return (
        n12.join(F.broadcast(n1), "w1")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            "w1", "w2", "n12",
            F.expr("(n12 * 1000000) DIV n1").alias("cond_ppm"),
            "rank",
        )
    )


def quality_percentiles(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, raw_score, pct_ppm): rank-normalized classifier quality —
    each document's percentile (ppm) within the corpus by the exact
    int64 classifier margin, ties broken by id. Rank normalization is
    how heterogeneous quality signals become comparable before mixing
    (the FineWeb/DataComp recipe: filter by percentile, not by raw
    threshold, so the gate is calibration-free and survives classifier
    retraining).

    The global rank uses distributed_rank (range repartition + offset
    table — no single-task window); pct_ppm = (rank * 1e6) DIV n.
    """
    from .standardize import distributed_rank

    scored = classifier_score(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("doc_id"), "raw_score"
    )
    n = max(scored.count(), 1)
    ranked = distributed_rank(scored, [F.desc("raw_score"), F.asc("doc_id")])
    return ranked.select(
        "doc_id",
        F.col("raw_score").cast("long").alias("raw_score"),
        F.expr(f"(rank * 1000000) DIV {n}").alias("pct_ppm"),
    )


# tiny AFINN-style valence lexicon, shared literal-for-literal with the
# oracle (integer milli-valences; a real deployment broadcasts the full
# AFINN/VADER table through the same plan)
SENTIMENT_LEXICON = {
    "good": 3000, "great": 4000, "excellent": 5000, "love": 4000,
    "fast": 2000, "win": 3000, "best": 4000, "happy": 3000,
    "bad": -3000, "terrible": -4000, "awful": -5000, "hate": -4000,
    "slow": -2000, "fail": -3000, "worst": -4000, "error": -3000,
}


def sentiment_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_matched, sent_milli): lexicon sentiment scoring — the
    AFINN-style integer-valence average (Nielsen 2011) over matched
    words, in exact milli units (sum of matched valences DIV matched
    count; 0 matches -> NULL score, not fake-neutral 0). The cheap
    deterministic polarity feature a curation pipeline adds next to
    quality/toxicity gates.

    One token explode + a broadcast join against the lexicon (model-
    sized by definition) + a per-doc agg; docs with no matched word keep
    a row with n_matched = 0 via the left join back.
    """
    spark = docs.sparkSession
    lex = spark.createDataFrame(
        list(SENTIMENT_LEXICON.items()), "w STRING, v LONG"
    )
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    tok = docs.select(F.col(id_col).alias("doc_id"), F.explode(words).alias("w"))
    matched = (
        tok.join(F.broadcast(lex), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("v").cast("long").alias("_s"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.expr(
                "CASE WHEN n_matched > 0 THEN _s DIV n_matched END"
            ).alias("sent_milli"),
        )
    )
