"""BM25 ranked retrieval over the document corpus.

The reference's retrieval surface is graph-structural (degree/frequency
search ranking, graph_store query paths) plus the RAG cosine retriever; a
web-corpus engine also needs the classic lexical ranker. BM25 (Robertson/
Sparck Jones, the Okapi formulation used by Lucene/Elasticsearch) is the
standard: idf-weighted, length-normalized term-frequency saturation.

Plan shape at 100 TB:

  * one linear token explode with the query-term filter applied BEFORE any
    aggregation — the explode's output is pruned to O(matching tokens),
    so everything downstream is query-sized, not corpus-sized
  * df (docs-per-term) is a terms-sized table -> broadcast
  * corpus stats (N, avgdl) are one row -> broadcast crossJoin
  * per-doc sum with map-side combine, then a global top-k which compiles
    to TakeOrderedAndProject (per-partition heap + driver merge of k rows
    — no single-task sort at any size)

All counts (tf, df, dl, N) are exact int64; avgdl is computed as
sum(dl)/N in one double division so the DuckDB oracle reproduces the score
bit-comparably after round(.,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import _words
from ..session import spread

K1 = 1.2
B = 0.75


def bm25_rank(
    docs: DataFrame,
    query_terms: list[str],
    top_n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top ``top_n`` documents by BM25 score for ``query_terms``.

    Returns (id_col, matched, bm25) with ``matched`` = number of distinct
    query terms present and ``bm25`` = round(score, 6); ties broken by
    ascending id for a deterministic result set.
    """
    base = docs.select(
        F.col(id_col),
        F.size(_words(F.col(text_col))).cast("long").alias("dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    tf = (
        docs.select(
            F.col(id_col), F.explode(_words(F.col(text_col))).alias("t")
        )
        .where(F.col("t").isin(list(query_terms)))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("t").agg(F.countDistinct(id_col).alias("df"))

    k1 = F.lit(float(K1))
    b = F.lit(float(B))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + k1 * (
        F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * (F.col("tf") * (k1 + F.lit(1.0)) / denom)

    return (
        tf.join(F.broadcast(df), "t")
        .join(base, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("matched"),
            F.round(F.sum(term_score), 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(top_n)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) — THE
    standard hybrid-retrieval combiner: given result lists each carrying
    (id_col, rank [1-based]), score every id as

        rrf_score = sum over lists of 1 / (k + rank)

    (absent from a list contributes 0; k=60 is the published default).
    Returns (id_col, rrf_score [round 6], n_lists) sorted by
    (rrf_score desc, id) — rank-only fusion needs no score calibration
    between BM25 and cosine, which is exactly why RRF beats weighted-sum
    fusion in practice.

    The fusion is a chain of full-outer hash equi-joins over the result
    lists — each list is top-n-sized (query-bounded, tiny), so at 100 TB
    the cost lives in the upstream retrievers, never here. The additions
    run left-to-right in list order: deterministic FP summation, oracle
    bit-parity after round(6).
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    joined = None
    cols: list[str] = []
    for i, r in enumerate(rankings):
        c = f"_rrf{i}"
        t = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias(c),
        )
        joined = t if joined is None else joined.join(t, id_col, "full")
        cols.append(c)
    score = F.coalesce(F.col(cols[0]), F.lit(0.0))
    for c in cols[1:]:
        score = score + F.coalesce(F.col(c), F.lit(0.0))
    n_lists = sum(
        (F.col(c).isNotNull().cast("int") for c in cols[1:]),
        F.col(cols[0]).isNotNull().cast("int"),
    )
    return (
        joined.select(
            id_col,
            F.round(score, 6).alias("rrf_score"),
            n_lists.cast("long").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, doc_id, tf, positions, df, cf): positional inverted index —
    the materialized retrieval artifact behind bm25_rank (which recomputes
    term stats per query batch; a 100 TB corpus builds THIS once and
    serves queries from it).

    ``positions`` is the comma-joined ascending word-offset list (0-based)
    of the term in the document, ``tf`` its length; ``df`` = number of
    documents containing the term, ``cf`` = total corpus occurrences.

    Plan shape: posexplode words → one hash aggregation keyed (term,
    doc) building tf + the sorted position list (collect_list bounded by
    per-doc term frequency, never a cross-doc window) → one term-keyed
    aggregation for df/cf → one hash join on term. At scale the output is
    naturally bucketable by term — the standard sharded-index layout.
    """
    words = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
        ).alias("pos", "term"),
    )
    postings = words.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("pos")), lambda p: p.cast("string")),
            ",",
        ).alias("positions"),
    )
    stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )
    return postings.join(stats, "term").select(
        "term", "doc_id", "tf", "positions", "df", "cf"
    )


def ndcg_at_k(
    run: DataFrame,
    gold: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rk",
) -> DataFrame:
    """(query_id, dcg_micro, ndcg_ppm): graded ranking evaluation — nDCG@k
    of the ``run`` ranking against the ``gold`` ranking (gain of an item =
    k+1 - its gold rank, 0 if absent), the standard IR eval that the ANN
    recall grid can't express (recall@k is position-blind; nDCG penalizes
    an ANN that finds the right set in the wrong order).

    All arithmetic is int64: per-position discounts 1e6/log2(r+1) are
    precomputed in the DRIVER as integer literals (shared with any oracle
    — runtime log2 differs across libms in the last ulp), so
    dcg_micro = sum(gain * w[rank]) is exact and
    ndcg_ppm = (dcg * 1e6) DIV idcg with idcg the constant perfect-order
    DCG. Shape: one broadcastable equi-join run x gold on (query, item)
    + one hash agg per query — linear in run size.
    """
    import math

    w = {r: int(round(1_000_000 / math.log2(r + 1))) for r in range(1, k + 1)}
    idcg = sum((k + 1 - r) * w[r] for r in range(1, k + 1))
    wmap = F.create_map(
        *[F.lit(x) for r in w for x in (r, w[r])]
    )
    gains = gold.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        # clamp: a gold rank beyond k contributes gain 0, never negative
        F.greatest(F.lit(0), F.lit(k + 1) - F.col(rank_col))
        .cast("long")
        .alias("_gain"),
    )
    r = run.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        # run positions beyond k carry discount 0 (outside the cutoff),
        # so an all-beyond-k query sums to 0, not NULL
        F.coalesce(wmap[F.col(rank_col).cast("int")], F.lit(0))
        .cast("long")
        .alias("_w"),
    )
    return (
        r.join(gains, ["_q", "_i"], "left")
        .groupBy(F.col("_q").alias(query_col))
        .agg(
            F.coalesce(
                F.sum(F.coalesce("_gain", F.lit(0)) * F.col("_w")), F.lit(0)
            )
            .cast("long")
            .alias("dcg_micro")
        )
        .select(
            query_col,
            "dcg_micro",
            F.expr(f"(dcg_micro * 1000000) DIV {idcg}").alias("ndcg_ppm"),
        )
    )


# The Dirichlet term score as ONE shared SQL expression string: the engine
# applies it via F.expr and the oracle embeds it verbatim, so the float op
# order is identical by construction (tf/cf/len/C all exact ints; ln and
# one division are the only float steps, frozen to micro before the sum).
_DIRICHLET_TERM_SQL = (
    "CAST(round(ln((CAST(tf AS DOUBLE)"
    " + CAST({mu} AS DOUBLE) * CAST(cf AS DOUBLE) / CAST(C AS DOUBLE))"
    " / (CAST(len AS DOUBLE) + CAST({mu} AS DOUBLE))) * 1000000.0) AS BIGINT)"
)


def dirichlet_lm_rank(
    docs: DataFrame,
    query_terms: list[str],
    mu: int = 2000,
    top_n: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, qlm_micro, rank): query-likelihood retrieval with Dirichlet
    smoothing (Zhai & Lafferty 2001) — score(q,d) = sum over query terms of
    ln((tf + mu*cf/C) / (len_d + mu)) — the probabilistic complement to
    bm25_rank (BM25 zeroes absent terms; the LM smooths them with corpus
    mass, so it ranks even zero-overlap docs).

    Per-term log scores are frozen to int64 micro-units BEFORE the per-doc
    sum. Shape: token explode -> per-doc tf for the |q| query terms only
    (filter BEFORE aggregation, the bm25_rank rule) -> broadcast cross of
    the |q|-row term-stats table against per-doc lengths -> hash agg ->
    TakeOrderedAndProject top_n; linear in corpus tokens.
    """
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
    base = spread(docs).select(
        F.col(id_col).alias("doc_id"), words.alias("ws")
    ).localCheckpoint(eager=True)
    lens = base.select("doc_id", F.size("ws").cast("long").alias("len"))
    tok = base.select("doc_id", F.explode("ws").alias("w"))
    # Corpus token total as a 1-row broadcast scalar (same max(count, 1)
    # int guard) — evaluated inside the scoring job instead of a separate
    # driver .count() round trip.
    ctot = F.broadcast(
        tok.agg(
            F.greatest(F.count(F.lit(1)), F.lit(1)).cast("long").alias("C")
        )
    )
    qt = F.array(*[F.lit(t) for t in query_terms])
    qtok = tok.filter(F.array_contains(qt, F.col("w")))
    cf = qtok.groupBy("w").agg(F.count(F.lit(1)).alias("cf"))
    terms = (
        docs.sparkSession.createDataFrame([(t,) for t in query_terms], ["w"])
        .join(cf, "w", "left")
        .select("w", F.coalesce("cf", F.lit(0)).cast("long").alias("cf"))
    )
    tf = qtok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        lens.crossJoin(F.broadcast(terms))
        .join(tf, ["doc_id", "w"], "left")
        .crossJoin(ctot)
        .select(
            "doc_id",
            F.coalesce("tf", F.lit(0)).cast("long").alias("tf"),
            "cf",
            "len",
            "C",
        )
        .select(
            "doc_id",
            F.expr(_DIRICHLET_TERM_SQL.format(mu=mu)).alias("term_micro"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term_micro").cast("long").alias("qlm_micro"))
        .orderBy(F.desc("qlm_micro"), F.asc("doc_id"))
        .limit(top_n)
    )
    w = Window.orderBy(F.desc("qlm_micro"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long"))


def hard_negatives(
    lexical: DataFrame,
    dense_gold: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, lex_rank): hard-negative mining for contrastive retrieval
    training (the DPR/ANCE recipe: negatives that a LEXICAL retriever
    ranks highly but the dense gold does not contain are the hard ones —
    random negatives are too easy to teach anything). ``lexical`` must
    carry (id, rank); ``dense_gold`` the gold id set. One anti-join, rank
    preserved so samplers can weight by difficulty.
    """
    gold = dense_gold.select(F.col(id_col)).distinct()
    return (
        lexical.select(F.col(id_col), F.col("rank").cast("long").alias("lex_rank"))
        .join(gold, id_col, "left_anti")
    )
