"""Distributed BPE tokenizer training (Sennrich et al. 2016) + encoder.

A training-data pipeline at 100 TB trains its tokenizer on the corpus it
just curated. BPE reduces to K rounds of (count adjacent symbol pairs over
the word histogram) -> (pick the most frequent pair) -> (merge it); the
histogram is vocabulary-sized, so after the single corpus-wide word count
every round is cheap and fully distributed.

The trick that keeps BOTH the engine and the DuckDB oracle exact: a word's
symbol sequence is represented as a double-separator-delimited string
(``\\x1f\\x1f s1 \\x1f\\x1f s2 ...``), and applying merge (A, B) is a plain
string ``replace`` of ``\\x1f A \\x1f\\x1f B \\x1f`` with ``\\x1f AB \\x1f``.
Left-to-right non-overlapping replace on the double-separator form is
EXACTLY BPE's merge semantics (consecutive A B A B -> AB AB; A A A with
merge (A,A) -> AA A), no UDF anywhere, and DuckDB's ``replace`` shares the
semantics — so even this iterative operator gets a hash-exact oracle
(unrolled with MATERIALIZED CTEs, like pagerank/hits/kcore).

Reference repo has no tokenizer (its LLM prompts are whole chunks,
llm.py:23-55); this is beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # U+001F unit separator: reserved, filtered out of input words
SEP2 = SEP + SEP
EOW = "</w>"  # end-of-word marker symbol (reserved, standard BPE)

MERGES_SCHEMA = "merge_rank int, lhs string, rhs string, pair_count long"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) — corpus-wide whitespace-word occurrence counts.

    The ONE corpus-sized pass of BPE training: explode (linear) + map-side
    combined hash aggregation; output is vocabulary-sized. Words containing
    the reserved separator byte are dropped (never occurs in real text).
    """
    return (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"),
                    lambda w: (w != F.lit("")) & ~F.contains(w, F.lit(SEP)),
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _initial_rep(word_col: Column) -> Column:
    """word -> double-separator symbol string of its chars + the EOW mark."""
    syms = F.concat(
        F.regexp_extract_all(word_col, F.lit("."), 0), F.array(F.lit(EOW))
    )
    return F.concat(F.lit(SEP2), F.array_join(syms, SEP2), F.lit(SEP2))


def _symbols(rep_col: Column) -> Column:
    return F.filter(F.split(rep_col, SEP2), lambda s: s != F.lit(""))


def _pair_counts(hist: DataFrame) -> DataFrame:
    """(pair, c): adjacent-symbol pair counts weighted by word frequency.

    Vocabulary-sized explode + map-side-combined sum — each round shuffles
    only (distinct pair, partial count) rows.
    """
    syms = _symbols(F.col("rep"))
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, F.lit(1), n - 1),
        F.slice(syms, F.lit(2), n - 1),
        lambda a, b: F.concat(a, F.lit(SEP), b),
    )
    return (
        hist.select(F.explode(pairs).alias("pair"), "wcount")
        .groupBy("pair")
        .agg(F.sum("wcount").alias("c"))
    )


def merge_pattern(lhs: str, rhs: str) -> tuple[str, str]:
    """(search, replace) strings applying merge (lhs, rhs) to a rep."""
    return SEP + lhs + SEP2 + rhs + SEP, SEP + lhs + rhs + SEP


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns ``MERGES_SCHEMA`` rows.

    One corpus-wide word count (the only corpus-sized pass), then K rounds
    over the vocabulary-sized histogram. When the measured vocabulary is at
    most ``local_threshold`` distinct words, the histogram is collected ONCE
    and the K rounds run on the driver (:func:`_train_bpe_local_counts` —
    the model-scale split this module's docstring prescribes: the histogram
    is model-sized, not data-sized, and a driver loop replaces 2·K Spark
    jobs with zero). The result is bit-identical to the distributed loop
    (same (count desc, pair asc) tie-break; pinned by
    test_train_bpe_local_path_matches_distributed).

    Above the threshold (a vocabulary that should not sit on the driver)
    each round runs distributed: pair count -> deterministic best collected
    as ONE driver row -> merge applied as a JVM string replace ->
    localCheckpoint. Stops early if no pair is left. ``local_threshold=0``
    forces the distributed path.
    """
    spark = docs.sparkSession
    words = word_histogram(docs, text_col).localCheckpoint(eager=True)
    if words.count() <= local_threshold:
        counts = {r["word"]: r["wcount"] for r in words.collect()}
        merges = _train_bpe_local_counts(counts, n_merges)
        return spark.createDataFrame(merges, MERGES_SCHEMA)
    hist = words.select(_initial_rep(F.col("word")).alias("rep"), "wcount")
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = (
            _pair_counts(hist)
            .orderBy(F.col("c").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs = best[0]["pair"].split(SEP)
        merges.append((rank, lhs, rhs, int(best[0]["c"])))
        pat, repl = merge_pattern(lhs, rhs)
        hist = hist.withColumn(
            "rep", F.replace(F.col("rep"), F.lit(pat), F.lit(repl))
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame | list[tuple[int, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens, n_tokens): encode each doc with a trained merge table.

    The merge table IS the model — vocabulary-sized, collected once and
    compiled into a K-deep chain of JVM string replaces applied per word
    (explode -> replace chain -> regroup in word order via sort_array).
    Suited to validation / token-count passes at moderate K; a production
    100 TB tokenization run would export the same merge table to a
    purpose-built tokenizer rather than a K-deep expression tree.
    """
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_rank").collect()
        merges = [(r["merge_rank"], r["lhs"], r["rhs"]) for r in rows]
    words = _words(docs, id_col, text_col)
    rep = _initial_rep(F.col("word"))
    for _, lhs, rhs in sorted(merges):
        pat, repl = merge_pattern(lhs, rhs)
        rep = F.replace(rep, F.lit(pat), F.lit(repl))
    toks = words.select(id_col, "pos", _symbols(rep).alias("toks"))
    return _regroup(toks, id_col)


def _regroup(toks: DataFrame, id_col: str) -> DataFrame:
    """(id, pos, toks) -> (id, tokens, n_tokens) in word order."""
    return (
        toks.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
        .select(id_col, "tokens", F.size("tokens").cast("long").alias("n_tokens"))
    )


def _words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, word): whitespace words, reserved-separator words dropped
    (the same tokenization as word_histogram / bpe_encode)."""
    return docs.select(
        id_col,
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), r"\s+"),
                lambda w: (w != F.lit("")) & ~F.contains(w, F.lit(SEP)),
            )
        ).alias("pos", "word"),
    )


def train_bpe_local(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str]]:
    """Driver-side BPE trainer over an ALREADY-AGGREGATED word histogram
    (Sennrich et al. 2016; same (count desc, pair asc) tiebreak as
    :func:`train_bpe`, pinned equal by the pytest replay). The histogram is
    vocabulary-sized — model-scale, not corpus-scale — so at any corpus
    size the right split is: one distributed word_histogram() pass, collect
    the vocab, train here (K rounds over the vocab with incremental-free
    rescan is fine into the tens of thousands of merges), then encode
    distributed with :func:`bpe_encode_ranked`."""
    return [(r, a, b) for r, a, b, _c in _train_bpe_local_counts(word_counts, n_merges)]


def _train_bpe_local_counts(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """:func:`train_bpe_local` plus the winning pair's count per merge —
    the exact row shape of ``MERGES_SCHEMA`` (what :func:`train_bpe`'s
    local path returns)."""
    from collections import Counter

    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): c for w, c in word_counts.items() if SEP not in w
    }
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), cnt_best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1])
        )
        merges.append((rank, a, b, int(cnt_best)))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """The tokenizer inner loop: repeatedly merge the LOWEST-RANK adjacent
    pair (all occurrences, left-to-right non-overlapping) until none is in
    the table. Provably identical to replaying the merges in rank order
    (a pair of rank s can only become adjacent once both its symbols exist,
    i.e. after merges of rank < s — so rank-order replay never misses one),
    which is what train_bpe's replace chain does; pinned by the K=8 parity
    test against bpe_encode. Linear in len(word) per merge round, and the
    number of rounds is bounded by len(word) — independent of table size K.
    """
    syms = list(word)
    syms.append(EOW)
    while len(syms) > 1:
        best_rank: int | None = None
        best_pair = ("", "")
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_rank is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_ranked(
    docs: DataFrame,
    merges: DataFrame | list[tuple[int, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, tokens, n_tokens): the PRODUCTION encoder — same output as
    :func:`bpe_encode`, built for real merge counts (K ~ 30,000).

    The merge table ships ONCE as a SparkContext broadcast ``{(lhs, rhs):
    rank}`` dict (a 30k-entry dict is ~3 MB — model-sized, not data-sized),
    and an Arrow-batched pandas UDF runs the standard min-rank merge loop
    per word. Cost is linear in corpus tokens and INDEPENDENT of K — no
    K-deep expression tree, no driver-side plan-building cost (the failure
    mode that capped bpe_encode at validation-scale K).

    The UDF runs over the DISTINCT word vocabulary, not the exploded corpus
    (the same distinct-first shape as entity standardization): at 100 TB
    the distinct-word table is orders of magnitude smaller than the token
    stream, and the per-batch memo cache makes even repeated vocabulary
    entries nearly free. The corpus-sized step is a plain equi-join of
    (id, pos, word) with (word, tokens) — AQE broadcasts it when the
    vocabulary is small enough, shuffle-joins otherwise.
    """
    import pandas as pd

    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_rank").collect()
        merges = [(r["merge_rank"], r["lhs"], r["rhs"]) for r in rows]
    ranks = {(lhs, rhs): rank for rank, lhs, rhs in sorted(merges)}
    bc = docs.sparkSession.sparkContext.broadcast(ranks)

    # NOTE: no type hints on `enc` — `from __future__ import annotations`
    # stringifies them and pyspark's hint-resolver can't see the local
    # `pd` import; hint-less pandas_udf defaults to SCALAR, which is what
    # this is.
    @F.pandas_udf("array<string>")
    def enc(batch):
        table = bc.value
        cache: dict[str, list[str]] = {}

        def one(w: str) -> list[str]:
            t = cache.get(w)
            if t is None:
                t = encode_word(w, table)
                cache[w] = t
            return t

        return batch.map(one)

    words = _words(docs, id_col, text_col)
    vocab = (
        words.select("word").distinct().withColumn("toks", enc(F.col("word")))
    )
    return _regroup(words.join(vocab, "word"), id_col)


def bpe_compression_stats(
    docs: DataFrame,
    merges: DataFrame | list[tuple[int, str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(n_docs, n_words, n_chars, n_tokens, tokens_per_word_ppm,
    chars_per_token_ppm): corpus-level tokenizer evaluation — the
    compression metrics (fertility = tokens/word, chars/token) every
    tokenizer-training loop reports on held-out text before a vocab
    ships; a merge table that stops compressing flags under-training,
    one that balloons fertility on a new domain flags vocabulary drift.

    Composes :func:`bpe_encode_ranked` (the production encoder — linear
    in tokens, independent of merge count) with the SAME whitespace word
    split, so the ratios are exact int64 ppm ((a * 1e6) DIV b) over
    consistent token/word universes. One row out.
    """
    enc = bpe_encode_ranked(docs, merges, id_col=id_col, text_col=text_col)
    words = _words(docs, id_col, text_col)
    wagg = words.agg(
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.length("word")).cast("long").alias("n_chars"),
    )
    tagg = enc.agg(F.sum("n_tokens").cast("long").alias("n_tokens"))
    return (
        wagg.crossJoin(F.broadcast(tagg))
        .select(
            "n_docs", "n_words", "n_chars", "n_tokens",
            F.expr("(n_tokens * 1000000) DIV n_words").alias(
                "tokens_per_word_ppm"
            ),
            F.expr("(n_chars * 1000000) DIV n_tokens").alias(
                "chars_per_token_ppm"
            ),
        )
    )
