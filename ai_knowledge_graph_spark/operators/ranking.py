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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _words

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
