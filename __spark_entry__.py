"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md §2
(KG pipeline stages + graph ops + training-data ops over the provided
tables); ``oracle_sql()`` gives the DuckDB-runnable ANSI-SQL mirror for each —
including a recursive-CTE replay of the reference's word-window chunker and a
full SQL build of the standardization/inference pipeline, so the driver's
value-hash comparison covers the whole engine, not just leaf aggregations.

Chunk parameters for the documents-table queries are 20/5 (driver documents
are 25-110 words, so the windowing + tail-chunk rules all fire).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.functions.extract import (
    PREDICATE_FUNCTION_WORDS,
    RELATION_VERBS,
)
from ai_knowledge_graph_spark.functions.text import (
    NORMALIZE_STOPWORDS,
    PREDICATE_TRAILING_STOPWORDS,
)

CHUNK_SIZE = 20
OVERLAP = 5
# The inference family (lexical pairs, transitive closure, components) is
# inherently quadratic in the entity vocabulary — by reference semantics, not
# by implementation. Those queries run over a fixed 50-document slice on BOTH
# sides so the DuckDB oracle stays tractable at any scale factor while the
# Spark side still exercises the full blocked-join machinery.
INFER_DOCS = 50

# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_pages(spark: SparkSession, sf_dir: str, max_doc: int | None = None) -> DataFrame:
    # url encodes doc_id zero-padded so string order == numeric order (the
    # engine's positional tie-breaks sort on url).
    docs = _docs(spark, sf_dir)
    if max_doc is not None:
        docs = docs.filter(F.col("doc_id") < max_doc)
    return docs.select(
        F.format_string("doc%012d", F.col("doc_id")).alias("url"), "text"
    )


def _doc_id(col="url"):
    return F.substring(F.col(col), 4, 12).cast("bigint").alias("doc_id")


# Stage cache: queries() entries are invoked independently by the driver but
# share the upstream pipeline; computed stages are localCheckpoint'd once per
# (session, sf_dir).
_CACHE: dict[tuple, DataFrame] = {}


def _cached(spark: SparkSession, sf_dir: str, key: str, build) -> DataFrame:
    k = (id(spark), sf_dir, key)
    if k not in _CACHE:
        _CACHE[k] = build().localCheckpoint(eager=True)
    return _CACHE[k]


def _chunks(spark: SparkSession, sf_dir: str, max_doc: int | None = None) -> DataFrame:
    from ai_knowledge_graph_spark.operators.chunking import chunk_pages

    return _cached(
        spark, sf_dir, f"chunks{max_doc}",
        lambda: chunk_pages(_doc_pages(spark, sf_dir, max_doc), CHUNK_SIZE, OVERLAP),
    )


def _raw_triples(spark: SparkSession, sf_dir: str, max_doc: int | None = None) -> DataFrame:
    from ai_knowledge_graph_spark.operators.extraction import extract_from_chunks

    return _cached(
        spark, sf_dir, f"raw{max_doc}",
        lambda: extract_from_chunks(_chunks(spark, sf_dir, max_doc)),
    )


def _std_triples(spark: SparkSession, sf_dir: str, max_doc: int | None = None) -> DataFrame:
    from ai_knowledge_graph_spark.operators.standardize import standardize_triples

    return _cached(
        spark, sf_dir, f"std{max_doc}",
        # lexicographic tie order: the SQL-expressible second-pass scan
        # order (reference set-order ties are covered by the parity tests).
        lambda: standardize_triples(
            _raw_triples(spark, sf_dir, max_doc), tie_order="lexicographic"
        ),
    )


def q_chunks(spark, sf_dir):
    return _chunks(spark, sf_dir).select(
        _doc_id(), "chunk_id", "chunk_text", "n_words"
    )


def q_chunk_stats(spark, sf_dir):
    return (
        _chunks(spark, sf_dir)
        .groupBy(_doc_id())
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_words").alias("total_chunk_words"),
            F.max("n_words").alias("max_chunk_words"),
        )
    )


def q_triples_raw(spark, sf_dir):
    return _raw_triples(spark, sf_dir).select(
        _doc_id(), "chunk", "t_idx", "subject", "predicate", "object"
    )


def q_predicate_histogram(spark, sf_dir):
    return (
        _raw_triples(spark, sf_dir)
        .groupBy("predicate")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_entity_counts(spark, sf_dir):
    from ai_knowledge_graph_spark.operators.standardize import entity_counts

    return entity_counts(_raw_triples(spark, sf_dir)).select("entity", "cnt")


def q_unique_entities(spark, sf_dir):
    raw = _raw_triples(spark, sf_dir)
    return (
        raw.select(F.col("subject").alias("entity"))
        .union(raw.select("object"))
        .distinct()
    )


def q_entity_mapping(spark, sf_dir):
    from ai_knowledge_graph_spark.operators.standardize import build_entity_mapping

    return build_entity_mapping(
        _raw_triples(spark, sf_dir), tie_order="lexicographic"
    ).select(
        "variant", "standard"
    )


def q_standardize(spark, sf_dir):
    return _std_triples(spark, sf_dir).select(
        _doc_id(), "chunk", "subject", "predicate", "object"
    )


def _fin_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ai_knowledge_graph_spark.operators.inference import infer_relationships

    return _cached(
        spark, sf_dir, "fin",
        # lexicographic: the SQL-expressible symmetric-pair direction (see
        # q_lexical); reference order is covered by the parity gate.
        lambda: infer_relationships(
            _std_triples(spark, sf_dir, INFER_DOCS), pair_order="lexicographic"
        ),
    )


def q_transitive(spark, sf_dir):
    from ai_knowledge_graph_spark.operators.inference import transitive_inference

    return transitive_inference(_std_triples(spark, sf_dir, INFER_DOCS)).select(
        "subject", "predicate", "object"
    )


def q_lexical(spark, sf_dir):
    from ai_knowledge_graph_spark.operators.inference import lexical_inference

    # lexicographic pair order: the one SQL-expressible direction for the
    # symmetric `related to` branch (the DuckDB oracle cannot replay CPython
    # set-iteration order; reference order is covered by the parity gate).
    return lexical_inference(
        _std_triples(spark, sf_dir, INFER_DOCS), pair_order="lexicographic"
    ).select("subject", "predicate", "object")


def q_infer_full(spark, sf_dir):
    return _fin_triples(spark, sf_dir).select(
        "subject", "predicate", "object", "inferred"
    )


def q_components(spark, sf_dir):
    from pyspark.sql import Window

    from ai_knowledge_graph_spark.operators.components import components_for_triples

    comps = components_for_triples(_std_triples(spark, sf_dir, INFER_DOCS))
    w = Window.partitionBy("component_id")
    return comps.select(
        "entity", F.min("entity").over(w).alias("component_rep")
    )


def q_degree(spark, sf_dir):
    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return (
        std.select(F.explode(F.array("subject", "object")).alias("entity"))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def q_graph_stats(spark, sf_dir):
    fin = _fin_triples(spark, sf_dir)
    ents = fin.select(F.col("subject").alias("e")).union(fin.select("object")).distinct()
    return fin.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.sum(F.col("inferred").cast("long")).alias("n_inferred"),
        F.count_distinct("predicate").alias("n_predicates"),
    ).crossJoin(ents.agg(F.count(F.lit(1)).alias("n_entities")))


# --- training-data / data-hygiene operators over documents & embeddings ----


def q_dedup_exact(spark, sf_dir):
    # S5: content-hash dedup on whitespace-normalized text (prepare_data.py:124-128)
    docs = _docs(spark, sf_dir)
    normed = docs.select(
        "doc_id",
        F.sha2(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), 256).alias(
            "content_hash"
        ),
    )
    return normed.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc_id")
    )


def q_token_count(spark, sf_dir):
    # whitespace tokens + BPE-ish regex tokens (words / numbers / single punct)
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != F.lit(""))).alias(
            "ws_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)).alias(
            "bpe_tokens"
        ),
        F.length("text").alias("n_chars"),
    )


def q_quality_score(spark, sf_dir):
    # length / punctuation / stopword-ratio heuristic quality score
    docs = _docs(spark, sf_dir)
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != F.lit(""))
    stop_arr = F.array(*[F.lit(w) for w in sorted(NORMALIZE_STOPWORDS)])
    n_words = F.size(words)
    stop_ratio = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))) / n_words,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length("text") > 0,
        F.size(F.regexp_extract_all("text", F.lit(r"[^A-Za-z0-9\s]"), 0))
        / F.length("text"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * (1 - punct_ratio), 6
        ).alias("quality"),
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    # near-duplicate detection: 3-word shingles, exact Jaccard >= 0.5
    docs = _docs(spark, sf_dir)
    worded = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != F.lit("")).alias(
            "words"
        ),
    ).filter(F.size("words") >= 3)
    shingled = worded.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(1, size(words) - 2),"
                " i -> concat_ws(' ', words[i-1], words[i], words[i+1]))"
            )
        ).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles"))
    sh = shingled.filter(F.col("n_sh") > 0)
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("sh"))
    a = ex.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"), "sh")
    b = ex.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jacc = inter.withColumn(
        "jaccard",
        F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
    )
    return jacc.filter(F.col("jaccard") >= 0.5).select("a", "b", "jaccard")


def q_embedding_topk(spark, sf_dir):
    # brute-force cosine top-5 neighbors for query vectors vec_id < 5
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cand = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    # Broadcast the QUERY side (few rows) and stream the corpus side — at
    # scale the corpus never fits an executor; the reverse broadcast would.
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (norm(F.col("qv")) * norm(F.col("cv"))), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def q_lang_id(spark, sf_dir):
    # heuristic n-gram/stopword language id over a tiny wordlist per language
    docs = _docs(spark, sf_dir)
    en = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "is", "to")])
    de = F.array(*[F.lit(w) for w in ("der", "die", "das", "und", "ist", "zu")])
    fr = F.array(*[F.lit(w) for w in ("le", "la", "les", "et", "est", "de")])
    words = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != F.lit(""))
    cnt = lambda arr: F.size(F.filter(words, lambda w: F.array_contains(arr, w)))  # noqa: E731
    return docs.select(
        "doc_id",
        F.when(cnt(de) > F.greatest(cnt(en), cnt(fr)), F.lit("de"))
        .when(cnt(fr) > F.greatest(cnt(en), cnt(de)), F.lit("fr"))
        .otherwise(F.lit("en"))
        .alias("pred_lang"),
    )


def q_clean_graph(spark, sf_dir):
    # scripts/clean_graph.py pipeline: normalize, short/noise filters,
    # predicate merges, case-insensitive dedup, singleton-predicate filter.
    from ai_knowledge_graph_spark.operators.cleaning import clean_triples

    return clean_triples(_raw_triples(spark, sf_dir), min_pred_count=2).select(
        "subject", "predicate", "object"
    )


# --- near-dup / fingerprint / ANN family (training-data ops) ---------------


def q_minhash_signatures(spark, sf_dir):
    # MinHash signatures over 3-word shingles; 8 portable hash fns (md5-based)
    from ai_knowledge_graph_spark.operators.dedup import minhash_signatures, shingles

    sh = shingles(_docs(spark, sf_dir), k=3)
    sigs = minhash_signatures(sh, num_hashes=8, seed=7)
    return sigs.select("doc_id", F.posexplode("sig").alias("h_idx", "sig_val"))


def q_minhash_lsh_pairs(spark, sf_dir):
    # shingle -> minhash -> LSH band bucket-join -> exact-Jaccard verify
    from ai_knowledge_graph_spark.operators.dedup import minhash_near_dup

    return minhash_near_dup(
        _docs(spark, sf_dir), k=3, num_hashes=8, bands=4, threshold=0.5
    )


def q_near_dup_groups(spark, sf_dir):
    # dedup APPLICATION: verified pairs -> salted connected components ->
    # min-id survivor label for every doc (singletons label themselves)
    from ai_knowledge_graph_spark.operators.dedup import (
        minhash_near_dup,
        near_dup_groups,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_near_dup(docs, k=3, num_hashes=8, bands=4, threshold=0.5)
    return near_dup_groups(docs, pairs)


def q_minhash_dedup_docs(spark, sf_dir):
    # the corpus AFTER near-dup removal: cluster losers anti-joined out
    from ai_knowledge_graph_spark.operators.dedup import (
        minhash_near_dup,
        near_dup_dedup,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_near_dup(docs, k=3, num_hashes=8, bands=4, threshold=0.5)
    return near_dup_dedup(docs, pairs).select("doc_id")


def q_multimodal_stats(spark, sf_dir):
    # REAL stdlib decode round-trip (no media libs): payloads are actual
    # BMP / PPM-PGM / RIFF-WAV / PNG / JPEG bytes synthesized
    # deterministically from doc_id by the encoders in ops/multimodal.py,
    # then parsed back by extract_media_metadata's struct decoders (PNG:
    # IHDR fixed offsets; JPEG: SOFn marker scan). The oracle recomputes
    # every decoded field arithmetically from doc_id — a decoder that
    # misreads any header offset mismatches.
    import pandas as pd

    from ai_knowledge_graph_spark.operators.multimodal import (
        extract_media_metadata,
        make_bmp,
        make_jpeg,
        make_png,
        make_ppm,
        make_wav,
    )
    from ai_knowledge_graph_spark.session import spread

    docs = spread(_docs(spark, sf_dir).select("doc_id"))

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = did % 5
                if kind == 0:
                    payload = make_bmp(8 + did % 16, 4 + did % 8, seed=did)
                    mtype = "image"
                elif kind == 1:
                    payload = make_ppm(
                        5 + did % 12, 3 + did % 9, seed=did, gray=(did % 2 == 1)
                    )
                    mtype = "image"
                elif kind == 3:
                    payload = make_png(
                        6 + did % 10, 4 + did % 7, seed=did, gray=(did % 2 == 1)
                    )
                    mtype = "image"
                elif kind == 4:
                    payload = make_jpeg(
                        16 * (1 + did % 8),
                        8 * (1 + did % 6),
                        seed=did,
                        gray=(did % 2 == 1),
                        n_entropy=16 + did % 32,
                    )
                    mtype = "image"
                else:
                    payload = make_wav(
                        8000 + 500 * (did % 5), 400 + did % 100, 1 + did % 2, seed=did
                    )
                    mtype = "audio"
                rows.append(
                    {"url": f"m{did}", "payload": payload, "media_type": mtype}
                )
            yield pd.DataFrame(rows, columns=["url", "payload", "media_type"])

    media = docs.mapInPandas(
        gen, "url string, payload binary, media_type string"
    )
    meta = extract_media_metadata(media)
    return meta.select(
        F.substring("url", 2, 20).cast("long").alias("doc_id"),
        "media_type",
        "codec",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_channels").cast("long").alias("n_channels"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


def q_simhash(spark, sf_dir):
    from ai_knowledge_graph_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir))


def q_simhash_pairs(spark, sf_dir):
    # 15-bit-band blocking (pigeonhole-complete for hamming <= 3) + verify
    from ai_knowledge_graph_spark.operators.dedup import simhash_near_dup

    return simhash_near_dup(_docs(spark, sf_dir), max_hamming=3)


def q_fingerprint(spark, sf_dir):
    # content sha256 + positional 64-bit sketch (rolling-hash style)
    from ai_knowledge_graph_spark.operators.textstats import fingerprints

    return fingerprints(_docs(spark, sf_dir)).select(
        "doc_id", "content_sha256", "position_sketch"
    )


def q_srp_topk(spark, sf_dir):
    # LSH-bucketed ANN: signed-random-projection buckets (2 tables x 8
    # planes), exact cosine on the candidate union — the scale path next to
    # brute-force embedding_topk.
    from ai_knowledge_graph_spark.operators.similarity import srp_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    return srp_topk(emb, q, k=5, n_planes=8, tables=2, dim=64, seed=42)


def q_stream_dedup(spark, sf_dir):
    # Structured Streaming exact-dedup (AvailableNow, stateful
    # dropDuplicates on the content hash): projected to the surviving hash
    # set, which is deterministic under any arrival order — so the batch
    # DuckDB oracle is exact even though the op runs through the streaming
    # state store.
    from ai_knowledge_graph_spark.streaming.ingest import stream_dedup_documents

    out = stream_dedup_documents(spark, f"{sf_dir}/documents.parquet")
    return out.select("content_sha").distinct()


def q_stream_sessions(spark, sf_dir):
    # Stateful streaming sessionization (applyInPandasWithState): emits
    # every CLOSED session; each user's trailing session stays open in
    # state — so the batch oracle is sessions minus last-per-user.
    import tempfile
    import uuid

    from ai_knowledge_graph_spark.streaming.ingest import stream_sessionize

    out = stream_sessionize(
        spark,
        f"{sf_dir}/events.parquet",
        checkpoint_dir=tempfile.mkdtemp(prefix="sess_q_ckpt_"),
        gap_seconds=1800,
        query_name=f"sess_q_{uuid.uuid4().hex[:8]}",
    )
    return out.select(
        "user_id",
        "start_sec",
        "end_sec",
        "n_events",
        F.round("total_value", 6).alias("total_value"),
    )


def q_embedding_near_dup(spark, sf_dir):
    # Embedding-cosine near-dup pairs: SRP-bucketed candidates (2 tables x 8
    # planes), exact cosine >= 0.3 — the embedding flavor of the near-dup
    # family (threshold fits the synthetic corpus's cosine range).
    from ai_knowledge_graph_spark.operators.similarity import embedding_near_dup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup(
        emb, threshold=0.3, n_planes=8, tables=2, dim=64, seed=42
    )


# --- graph query layer (J7-J9, W4) over the KG built from documents --------


def _kg_edges(spark, sf_dir):
    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return std.select(
        F.col("subject").alias("src"),
        F.col("predicate").alias("relation"),
        F.col("object").alias("dst"),
    )


def _top_nodes(spark, sf_dir, n=2) -> list[str]:
    """Deterministic probe nodes: max degree, lexicographic tiebreak."""
    deg = q_degree(spark, sf_dir)
    rows = deg.orderBy(F.desc("degree"), F.asc("entity")).take(n)
    return [r["entity"] for r in rows]


def q_neighbors(spark, sf_dir):
    # J7: in-/out-edges of the max-degree node
    from ai_knowledge_graph_spark.graph.queries import neighbors

    node = _top_nodes(spark, sf_dir, 1)[0]
    return neighbors(_kg_edges(spark, sf_dir), node)


def q_khop(spark, sf_dir):
    # J8/G3: 2-hop undirected neighborhood of the max-degree node
    from ai_knowledge_graph_spark.graph.queries import k_hop_neighborhood

    node = _top_nodes(spark, sf_dir, 1)[0]
    return k_hop_neighborhood(_kg_edges(spark, sf_dir), node, hops=2)


def q_shortest_dist(spark, sf_dir):
    # J9/G4: undirected BFS distance between the two highest-degree nodes
    # (hop index of the BFS frontier = shortest distance)
    from ai_knowledge_graph_spark.graph.queries import k_hop_neighborhood

    src, dst = _top_nodes(spark, sf_dir, 2)
    hops = k_hop_neighborhood(_kg_edges(spark, sf_dir), src, hops=10)
    return hops.filter(F.col("entity") == dst).select(
        F.lit(src).alias("source"),
        F.col("entity").alias("target"),
        F.col("hop").alias("dist"),
    )


def q_related_concepts(spark, sf_dir):
    # get_related_concepts: 1-hop by relation + 2-hop by 'r1→r2' path
    from ai_knowledge_graph_spark.graph.queries import related_concepts

    node = _top_nodes(spark, sf_dir, 1)[0]
    return related_concepts(_kg_edges(spark, sf_dir), node, max_hops=2)


def q_search(spark, sf_dir):
    # W4: text search over node names, rank by (-score, -degree, entity)
    from ai_knowledge_graph_spark.graph.queries import search

    node = _top_nodes(spark, sf_dir, 1)[0]
    nodes = _cached(spark, sf_dir, "deg_nodes", lambda: q_degree(spark, sf_dir))
    return search(nodes, node, top_k=20)


# --- query-side support ops (P5, F10, J5, J6, W5) ---------------------------

RELEVANCE_TERMS = ["join", "hash", "merge sort", "scan", "window", "stream"]


def q_concepts(spark, sf_dir):
    # P5: KG node names found in each document (broadcast vocabulary scan)
    from ai_knowledge_graph_spark.operators.concepts import extract_concepts

    vocab = _cached(
        spark, sf_dir, "vocab",
        lambda: _std_triples(spark, sf_dir, INFER_DOCS)
        .select(F.col("subject").alias("entity"))
        .union(_std_triples(spark, sf_dir, INFER_DOCS).select("object"))
        .distinct(),
    )
    return extract_concepts(_docs(spark, sf_dir), vocab)


def q_term_relevance(spark, sf_dir):
    # F10: domain-term relevance flag per triple (audit_quality.py:30-33)
    from ai_knowledge_graph_spark.operators.concepts import term_relevance

    return term_relevance(
        _std_triples(spark, sf_dir, INFER_DOCS), RELEVANCE_TERMS
    ).select("subject", "predicate", "object", "relevant")


def _components_rep(spark, sf_dir):
    return _cached(spark, sf_dir, "comps_rep", lambda: q_components(spark, sf_dir))


def q_candidate_pairs(spark, sf_dir):
    # J5: unconnected-but-similar same-community pairs, capped per community
    from ai_knowledge_graph_spark.operators.concepts import candidate_pairs_in_community

    return candidate_pairs_in_community(
        _std_triples(spark, sf_dir, INFER_DOCS), _components_rep(spark, sf_dir), cap=10
    )


def q_context_triples(spark, sf_dir):
    # J6: first 20 triples (list order) touching any candidate-pair entity
    from ai_knowledge_graph_spark.operators.concepts import context_triples

    pairs = q_candidate_pairs(spark, sf_dir)
    ents = pairs.select(F.col("a").alias("e")).union(pairs.select("b")).distinct()
    return context_triples(
        _std_triples(spark, sf_dir, INFER_DOCS), ents, cap=20
    ).select(_doc_id(), "chunk", "subject", "predicate", "object")


def q_rag_retrieve(spark, sf_dir):
    # Hybrid RAG retrieval wired end-to-end (graph_retriever.py:219-326):
    # chunk-embedding cosine top-5 -> concept extraction from retrieved
    # chunks + query -> prioritized graph expansion with per-concept and
    # global caps. Query = doc 0's text + embedding 0 (deterministic).
    from ai_knowledge_graph_spark.graph.retrieve import retrieve

    docs = _docs(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    chunks = docs.join(emb, docs["doc_id"] == emb["vec_id"]).select(
        F.col("doc_id").alias("chunk_id"),
        F.format_string("doc%012d", F.col("doc_id")).alias("source"),
        "text",
        "embedding",
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    qtext = docs.filter(F.col("doc_id") == 0).first()["text"]
    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(
        F.col("subject").alias("src"),
        F.col("predicate").alias("relation"),
        F.col("object").alias("dst"),
    ).distinct()
    nodes = std.select(
        F.explode(F.array("subject", "object")).alias("entity")
    ).distinct()
    out = retrieve(qtext, qvec, chunks, edges, nodes, vector_top_k=5)
    return out["graph_triples"].select(
        "subject", "predicate", "object", "concept", "rank"
    )


def q_training_qa_v3(spark, sf_dir):
    # v3 QA families (training_generator_v3.py): multi-hop chain QA
    # (:960-1087) + cross-reference QA (:2227-2455) over the std graph, with
    # the seeded category balancing of generate_all (:120-172).
    from ai_knowledge_graph_spark.operators.training import (
        balance_categories,
        cross_ref_qa,
        multi_hop_qa,
    )

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(
        F.col("subject").alias("src"),
        F.col("predicate").alias("relation"),
        F.col("object").alias("dst"),
    )
    qa = multi_hop_qa(edges, max_fanout=2).unionByName(
        cross_ref_qa(edges, max_per_anchor=2)
    )
    return balance_categories(qa, cap=25, seed=42)


def q_relation_cap(spark, sf_dir):
    # W5: <= 4 objects per (subject, predicate) group
    from ai_knowledge_graph_spark.operators.concepts import per_relation_cap

    return per_relation_cap(_std_triples(spark, sf_dir, INFER_DOCS), cap=4).select(
        "subject", "predicate", "object"
    )


# --- S5 corpus prep / J11 logic scoring / K5 training QA --------------------


def q_corpus_dedup(spark, sf_dir):
    # S5: near-empty filter + whitespace-normalized sha256 content dedup
    from ai_knowledge_graph_spark.sources.corpus import dedup_corpus

    docs = _docs(spark, sf_dir).select(
        F.format_string("doc%012d.txt", F.col("doc_id")).alias("path"), "text"
    )
    return dedup_corpus(docs).select(
        F.substring("path", 4, 12).cast("bigint").alias("doc_id"), "content_sha"
    )


def q_model_scores(spark, sf_dir):
    # J11: requirement-match scoring (specificity join + blended score)
    from pyspark.sql import Window

    from ai_knowledge_graph_spark.graph.logic import score_models

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    models = (
        std.groupBy("subject")
        .count()
        .orderBy(F.desc("count"), F.asc("subject"))
        .limit(3)
        .select(F.col("subject").alias("model"))
    )
    reqs = (
        std.join(models, std["subject"] == models["model"])
        .select("model", F.concat_ws(" ", "predicate", "object").alias("requirement"))
        .distinct()
    )
    w = Window.partitionBy("model").orderBy("requirement")
    reqs = reqs.withColumn("rn", F.row_number().over(w)).filter("rn <= 8").drop("rn")
    detected = (
        std.groupBy(F.lower(F.col("object")).alias("concept"))
        .count()
        .orderBy(F.desc("count"), F.asc("concept"))
        .limit(10)
        .select("concept")
    )
    return score_models(reqs, detected).select(
        "model",
        "total_reqs",
        "satisfied",
        F.round("weighted_spec", 6).alias("weighted_spec"),
        F.round("max_spec", 6).alias("max_spec"),
        F.round("score", 6).alias("score"),
    )


def q_ivf_topk(spark, sf_dir):
    # IVF ANN: hash-bucketed coarse centroids, probe 4 lists, exact cosine
    # within probed lists — the third similarity-search path (brute-force /
    # SRP-LSH / IVF)
    from ai_knowledge_graph_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, q, k=5, nlist=16, n_probe=4)


def q_training_qa(spark, sf_dir):
    # K5: relationship Q&A template expansion over distinct std edges
    from ai_knowledge_graph_spark.operators.training import relationship_qa

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(
        F.col("subject").alias("src"),
        F.col("object").alias("dst"),
        F.col("predicate").alias("relation"),
    ).distinct()
    return relationship_qa(edges)


# --- web-crawl ingest operators (north-rule pages shape) -------------------


def _crawl_pages(spark, sf_dir):
    """Synthesize a multi-crawl pages table from documents: urls collide
    across doc_ids (doc_id % 50 per source) so each url has several crawls;
    warc_ts is minute-spaced from a fixed epoch. Deterministic, column-only."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.org/p"),
            (F.col("doc_id") % 50).cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id") * 60).alias("warc_ts"),
        "doc_id",
        "text",
        "lang",
    )


def q_html_extract(spark, sf_dir):
    # North-rule per-row invariant: byte-identical extracted text per url.
    # Wrap each doc's text into html bytes JVM-side (the exact column twin of
    # the fixture wrapper), run the REAL extractor (Arrow pandas UDF over the
    # binary column), and emit the byte-equality verdict + extracted sha.
    from ai_knowledge_graph_spark.operators.webcrawl import (
        html_roundtrip_check,
        wrap_html_expr,
    )

    pages = _docs(spark, sf_dir).select(
        "doc_id", "text", wrap_html_expr("text").alias("html")
    )
    out = html_roundtrip_check(pages)
    return out.select("doc_id", "roundtrip_ok", "extracted_sha256", "extracted_chars")


def q_latest_crawl(spark, sf_dir):
    # As-of dedup: newest crawl per url via map-side-combinable max_by agg.
    from ai_knowledge_graph_spark.operators.webcrawl import latest_snapshot

    pages = _crawl_pages(spark, sf_dir).select("url", "warc_ts", "doc_id", "text")
    latest = latest_snapshot(pages, tie_cols=("doc_id",))
    return latest.select(
        "url",
        F.col("doc_id").alias("latest_doc_id"),
        F.sha2(F.col("text"), 256).alias("latest_sha256"),
        "n_crawls",
    )


def q_e2e_crawl_kg(spark, sf_dir):
    # NORTH-RULE COMPOSITION in one query: Common-Crawl-style pages
    # (url, warc_ts, html binary, text, lang) -> as-of latest-crawl dedup
    # (max_by per url) -> REAL html->text extraction (Arrow pandas UDF;
    # everything downstream consumes the EXTRACTED bytes, not the fixture
    # text column) -> min-length curation gate -> chunk -> triple
    # extraction -> entity standardization -> relationship inference.
    # Output = the final KG edge multiset, value-hashed against an oracle
    # that replays the entire chain in SQL: latest-crawl = correlated
    # max(doc_id) per (source, url-slot) group (warc_ts is strictly
    # monotone in doc_id by construction, tie_col doc_id — same winner),
    # and extracted text = the text column (the byte-identical per-url
    # invariant certified by html_extract; if the extractor diverges, the
    # triples here mismatch too). Url-slot < 25 bounds the corpus to ~50
    # winner docs so the unrolled inference CTEs stay oracle-affordable.
    from ai_knowledge_graph_spark.operators.extraction import (
        pages_to_raw_triples,
    )
    from ai_knowledge_graph_spark.operators.inference import (
        infer_relationships,
    )
    from ai_knowledge_graph_spark.operators.standardize import (
        standardize_triples,
    )
    from ai_knowledge_graph_spark.operators.webcrawl import (
        extract_html_text,
        latest_snapshot,
        wrap_html_expr,
    )

    pages = (
        _crawl_pages(spark, sf_dir)
        .filter(F.col("doc_id") % 50 < 25)
        .select(
            "url", "warc_ts", "doc_id", wrap_html_expr("text").alias("html")
        )
    )
    latest = latest_snapshot(pages, tie_cols=("doc_id",))
    ext = extract_html_text(latest)
    words = F.filter(
        F.split(F.col("extracted_text"), r"\s+"), lambda w: w != F.lit("")
    )
    docs = ext.filter(F.size(words) >= 10).select(
        F.format_string("doc%012d", F.col("doc_id")).alias("url"),
        F.col("extracted_text").alias("text"),
    )
    # Fused chunk+extract (one mapInPandas pass, one Arrow round-trip —
    # chunk text never crosses the JVM/Python boundary twice); identical
    # rows to extract_from_chunks(chunk_pages(...)), pytest-pinned.
    raw = pages_to_raw_triples(docs, CHUNK_SIZE, OVERLAP, lang_filter=None)
    std = standardize_triples(raw, tie_order="lexicographic")
    fin = infer_relationships(std, pair_order="lexicographic")
    return fin.select("subject", "predicate", "object", "inferred")


def q_frontier(spark, sf_dir):
    # Politeness-aware crawl-frontier scheduling over the distinct crawl
    # urls: md5-derived priority (shared literal-for-literal with the
    # oracle), budget max_per_host=3 (exercises the lossless two-phase
    # bounded rank), k_per_host=2 (so rounds 0/1 both appear). The oracle
    # computes host arithmetically from the url generator (source ||
    # '.example.org') and replays rank/round in one window.
    from ai_knowledge_graph_spark.operators.webcrawl import frontier_schedule

    urls = _crawl_pages(spark, sf_dir).select("url").distinct()
    urls = urls.withColumn(
        "priority",
        F.conv(F.substring(F.md5("url"), 1, 6), 16, 10).cast("long"),
    )
    out = frontier_schedule(
        urls, k_per_host=2, max_per_host=3, priority_col="priority"
    )
    return out.select("url", "host", "priority", "fetch_rank", "fetch_round")


def q_scd2(spark, sf_dir):
    # SCD2 change timeline over the synthetic multi-crawl pages: digest
    # runs of 2 consecutive crawls (dv = (crawl_idx div 2) % 4) exercise
    # the collapse; intervals chain gap-free per url.
    from ai_knowledge_graph_spark.operators.webcrawl import scd2_versions

    pages = _crawl_pages(spark, sf_dir)
    dv = F.expr("(doc_id div 50 div 2) % 4").cast("string")
    snaps = pages.select(
        "url",
        "warc_ts",
        "doc_id",
        F.sha2(F.concat(F.col("url"), dv), 256).alias("digest"),
    )
    out = scd2_versions(snaps)
    return out.select(
        "url",
        F.col("version").cast("long").alias("version"),
        F.unix_timestamp("valid_from").alias("valid_from_sec"),
        F.unix_timestamp("valid_to").alias("valid_to_sec"),
        "is_current",
        "digest",
    )


def q_repetition_stats(spark, sf_dir):
    # Gopher-style repetition signals: duplicate-bigram fraction + top-bigram
    # mass per document.
    from ai_knowledge_graph_spark.operators.webcrawl import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


def q_domain_stats(spark, sf_dir):
    # Per-domain corpus rollup (source acts as the registrable domain).
    from ai_knowledge_graph_spark.operators.webcrawl import domain_stats

    return domain_stats(_docs(spark, sf_dir)).withColumnRenamed("source", "domain")


def q_corpus_cube(spark, sf_dir):
    # CUBE (source x lang) with exact interpolated size percentiles.
    from ai_knowledge_graph_spark.operators.webcrawl import corpus_cube

    return corpus_cube(_docs(spark, sf_dir))


def q_canonical_crawl(spark, sf_dir):
    # Canonical-URL as-of dedup: deterministic messy-URL variants (host case,
    # fragment, default port, tracking params, param order) collapse to one
    # identity; newest crawl per identity survives. The oracle computes the
    # expected canonical form directly from (source, doc_id) — independent of
    # the engine's regex normalizer.
    from ai_knowledge_graph_spark.operators.webcrawl import canonical_url_dedup

    docs = _docs(spark, sf_dir)
    k = (F.col("doc_id") % 50).cast("string")
    v = F.col("doc_id") % 4
    base = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/p"), k
    )
    url = (
        F.when(v == 0, base)
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://"), F.upper(F.col("source")),
                F.lit(".EXAMPLE.ORG/p"), k, F.lit("#sec"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.org:443/p"), k, F.lit("?utm_source=bench"),
            ),
        )
        .otherwise(F.concat(base, F.lit("?b=2&a=1")))
    )
    pages = docs.select(
        url.alias("url"),
        F.timestamp_seconds(F.lit(1767225600) + F.col("doc_id") * 60).alias(
            "warc_ts"
        ),
        "doc_id",
        "text",
    )
    out = canonical_url_dedup(pages, tie_cols=("doc_id",))
    return out.select(
        "canonical_url",
        "url",
        F.col("doc_id").alias("latest_doc_id"),
        F.sha2(F.col("text"), 256).alias("latest_sha256"),
        "n_crawls",
    )


def q_snapshot_diff(spark, sf_dir):
    # Incremental re-crawl delta: full-outer 1:1 digest join between two
    # snapshot cuts — added / removed / changed / unchanged per url.
    from ai_knowledge_graph_spark.operators.webcrawl import snapshot_diff

    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/d"),
        F.col("doc_id").cast("string"),
    )
    old = docs.filter(F.col("doc_id") % 7 != 0).select(
        url.alias("url"), F.sha2(F.col("text"), 256).alias("content_sha")
    )
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        url.alias("url"),
        F.sha2(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
            256,
        ).alias("content_sha"),
    )
    return snapshot_diff(old, new)


# --- KG analytics over the standardized triple store (round 4) -------------


def q_rule_mining(spark, sf_dir):
    # AMIE-style 2-hop horn rules p(A,B) ∧ q(B,C) ⇒ r(A,C) with
    # support / body-count / confidence over the standardized KG.
    from ai_knowledge_graph_spark.graph.kgops import mine_rules

    # Mined over the INFERRED graph (std + transitive + lexical): within
    # phase-2 edges alone a direct head A->C almost never coexists with a
    # 2-hop body (inference only adds A->C where it is missing), so the
    # gate would be trivially empty. Over the closed graph, mining
    # re-discovers the inference patterns as high-confidence rules.
    fin = _fin_triples(spark, sf_dir)
    return mine_rules(fin, min_support=2)


def q_fact_fusion(spark, sf_dir):
    # source-majority knowledge fusion: winning predicate per (s,o) by
    # distinct supporting docs, deterministic tie-breaks, source share.
    from ai_knowledge_graph_spark.graph.kgops import fuse_facts

    std = _std_triples(spark, sf_dir, INFER_DOCS).withColumn("doc_id", _doc_id())
    return fuse_facts(std)


def q_kg_diff(spark, sf_dir):
    # edge diff between two crawl snapshots of the extracted KG:
    # crawl1 = docs [0,40), crawl2 = docs [10,50) — added/removed/kept.
    from ai_knowledge_graph_spark.graph.kgops import kg_diff

    raw = _raw_triples(spark, sf_dir, INFER_DOCS).withColumn("doc_id", _doc_id())
    old = raw.filter(F.col("doc_id") < 40)
    new = raw.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < INFER_DOCS))
    return kg_diff(old, new)


def q_redirects(spark, sf_dir):
    # redirect-chain resolution by pointer jumping (log-rounds path
    # halving). Fixture: url(d) redirects to url(d-1) when d%10 in 1..3,
    # giving chains of length 0-3 ending at each decade's %10==0 url; the
    # oracle states the closed form (final = d - d%10, hops = d%10).
    from ai_knowledge_graph_spark.operators.webcrawl import resolve_redirects

    docs = _docs(spark, sf_dir)
    edges = docs.filter((F.col("doc_id") % 10 >= 1) & (F.col("doc_id") % 10 <= 3)).select(
        F.format_string("doc%012d", F.col("doc_id")).alias("src"),
        F.format_string("doc%012d", F.col("doc_id") - 1).alias("dst"),
    )
    return resolve_redirects(edges, max_hops=32)


def q_sitemap(spark, sf_dir):
    # sitemap.xml ingestion: per-source sitemaps synthesized JVM-side (one
    # <url> entry per doc: loc always, lastmod for doc_id%3==0, priority
    # 0.9 for doc_id%4==0), parsed back by parse_sitemaps; the oracle
    # states each entry's expected fields arithmetically.
    from ai_knowledge_graph_spark.operators.webcrawl import parse_sitemaps

    docs = _docs(spark, sf_dir)
    entry = F.concat(
        F.lit("<url><loc>"),
        F.format_string("https://%s.example.org/p%d", "source", (F.col("doc_id") % 50).cast("int")),
        F.lit("</loc>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.format_string("<lastmod>2024-01-%02d</lastmod>", (F.col("doc_id") % 28 + 1).cast("int")),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("<priority>0.9</priority>")).otherwise(
            F.lit("")
        ),
        F.lit("</url>"),
    )
    maps = (
        docs.select("source", entry.alias("_e"))
        .groupBy("source")
        .agg(
            F.concat(
                F.lit("<urlset>"), F.concat_ws("", F.collect_list("_e")), F.lit("</urlset>")
            ).alias("sitemap_xml")
        )
        .select(F.concat(F.col("source"), F.lit(".example.org")).alias("host"), "sitemap_xml")
    )
    return parse_sitemaps(maps)


def q_triple_history(spark, sf_dir):
    # SCD2 validity intervals for triples across three overlapping crawl
    # snapshots (docs [0,30) / [10,40) / [20,50)): maximal consecutive
    # presence runs, re-appearances yielding multiple rows.
    from ai_knowledge_graph_spark.graph.kgops import triple_history

    raw = _raw_triples(spark, sf_dir, INFER_DOCS).withColumn("doc_id", _doc_id())
    snaps = [
        raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in ((0, 30), (10, 40), (20, 50))
    ]
    return triple_history(snaps)


def q_entity_roles(spark, sf_dir):
    # predicate-profile entity typing: degrees + dominant out/in predicate.
    from ai_knowledge_graph_spark.graph.kgops import entity_roles

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    out = entity_roles(std)
    return out.select(
        "entity",
        "n_out",
        "n_in",
        F.coalesce("top_out_pred", F.lit("")).alias("top_out_pred"),
        F.coalesce("top_in_pred", F.lit("")).alias("top_in_pred"),
    )


def q_kg_negatives(spark, sf_dir):
    # filtered TransE-style negative sampling over the standardized KG:
    # k=2 deterministic md5-driven corruptions per positive, anti-joined
    # against true triples (Bordes et al. 2013 "filtered" protocol).
    from ai_knowledge_graph_spark.graph.kgops import kg_negatives

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return kg_negatives(std, k=2)


def q_kg_distmult(spark, sf_dir):
    # deterministic DistMult bilinear-diagonal scoring (dim=8) over the
    # standardized KG — the symmetric-relation sibling of q_transe (same
    # hash-derived integer vectors, products exact in int64).
    from ai_knowledge_graph_spark.graph.kgops import distmult_score

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return distmult_score(std, dim=8)


def q_kg_mrr(spark, sf_dir):
    # FILTERED link-prediction evaluation (Bordes et al. protocol):
    # 1/8 md5 test sample, true tail ranked against every entity by
    # TransE score with known tails excluded; per-predicate MRR
    # (micro-frozen reciprocal ranks) + Hits@1/3/10.
    from ai_knowledge_graph_spark.graph.kgops import link_prediction_eval

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return link_prediction_eval(std, dim=8, test_mod=8)


def q_ntriples(spark, sf_dir):
    # canonical RDF 1.1 N-Triples serialization of the standardized KG
    # (IRIs minted under http://kg.local/, ECHAR-escaped literals) —
    # the formatting itself is the thing under test.
    from ai_knowledge_graph_spark.sources.triples_io import ntriples_lines

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return ntriples_lines(std)


def q_property_path(spark, sf_dir):
    # SPARQL 1.1 property-path evaluation compiled to a join/union tree:
    # (group+ / (join | sort)) — bounded one-or-more (3 hops) chained
    # into an alternation, set semantics at every combinator.
    from ai_knowledge_graph_spark.graph.kgops import match_property_path

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    path = ("seq", ("plus", "group"), ("alt", "join", "sort"))
    return match_property_path(std, path, max_depth=3)


def q_kg_align(spark, sf_dir):
    # entity alignment between two crawl-batch KGs (docs [0,40) vs
    # [10,50)) by shared relational context — exactly-shared outgoing
    # (p,o) / incoming (s,p) facts, best match per A-entity with
    # deterministic (score desc, name asc) tie-break.
    from ai_knowledge_graph_spark.graph.kgops import align_entities

    raw = _raw_triples(spark, sf_dir, INFER_DOCS).withColumn("doc_id", _doc_id())
    kg_a = raw.filter(F.col("doc_id") < 40)
    kg_b = raw.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < INFER_DOCS))
    return align_entities(kg_a, kg_b, min_score=2)


# SHACL-lite shape table shared by q_kg_shacl and its oracle builder:
# (shape_id, target_pred, check_kind, pred, n) — entities with >= 1
# outgoing target_pred edge must have min/max n distinct pred objects.
SHACL_SHAPES = [
    (1, "group", "min_count", "sort", 1),
    (2, "group", "max_count", "join", 1),
    (3, "join", "min_count", "join", 2),
]


def q_kg_complex(spark, sf_dir):
    # ComplEx plausibility scoring (dim=8): Re(<h, r, conj(t)>) over
    # hash-derived integer real/imag vectors — the asymmetric member of
    # the TransE/DistMult/ComplEx trio, exact int64.
    from ai_knowledge_graph_spark.graph.kgops import complex_score

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return complex_score(std, dim=8)


def q_kg_shacl(spark, sf_dir):
    # SHACL-style sh:minCount/sh:maxCount validation (violations only)
    # over the standardized KG, sh:targetSubjectsOf targeting.
    from ai_knowledge_graph_spark.graph.kgops import validate_shapes

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return validate_shapes(std, SHACL_SHAPES)


def q_kg_pattern(spark, sf_dir):
    # SPARQL-style basic graph pattern over the standardized KG:
    # ?x group ?y . ?y ?p ?z  — 2-hop walks that start with a "group" edge.
    from ai_knowledge_graph_spark.graph.kgops import match_basic_pattern

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return match_basic_pattern(std, [("?x", "group", "?y"), ("?y", "?p", "?z")])


def q_entity_summary(spark, sf_dir):
    # top-3 most informative outgoing facts per entity by predicate
    # inverse-frequency (micro-unit-frozen idf, lossless two-phase rank).
    from ai_knowledge_graph_spark.graph.kgops import entity_summary

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return entity_summary(std, k=3)


def q_quantiles(spark, sf_dir):
    # exact global quantiles of document char-length: value-histogram +
    # range-partitioned cumulative counts — sketch-free, deterministic.
    from ai_knowledge_graph_spark.operators.stats import exact_quantiles

    docs = _docs(spark, sf_dir).select(F.length("text").cast("long").alias("v"))
    return exact_quantiles(docs, "v", [0.25, 0.5, 0.75, 0.9, 0.99]).select(
        "p", F.col("value").alias("value"), "rank"
    )


def q_random_walks(spark, sf_dir):
    # Deterministic DeepWalk corpus over the standardized KG edges: 4 hops
    # from every source node; step choice = argmin md5(node, t, neighbor).
    from ai_knowledge_graph_spark.graph.walks import random_walks

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return random_walks(edges, steps=4)


def q_lpa(spark, sf_dir):
    # Synchronous label propagation (4 rounds, deterministic tie-break:
    # max neighbor-label count then lexicographic min) over the undirected
    # standardized KG — the oracle-gated twin of the viz communities.
    from ai_knowledge_graph_spark.graph.walks import lpa_communities

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return lpa_communities(edges, rounds=4)


def q_hearst(spark, sf_dir):
    # Hearst-pattern hypernym mining: pages synthesized from each doc's
    # words (w1 such as w2, w3 and w4. w5 and w6 and other w1. w2 including
    # w3 and w4. w6 especially w5.) so the oracle can state the expected
    # (hyponym, is_a hypernym) rows arithmetically while the engine runs
    # the real sentence/regex extractor.
    from ai_knowledge_graph_spark.operators.hearst import hearst_hypernyms

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    docs = docs.filter(F.size(ws) >= 6)
    e = lambda i: F.element_at(ws, i)  # noqa: E731
    L = F.lit
    t = F.concat(
        e(1), L(" such as "), e(2), L(", "), e(3), L(" and "), e(4), L(". "),
        e(5), L(" and "), e(6), L(" and other "), e(1), L(". "),
        e(2), L(" including "), e(3), L(" and "), e(4), L(". "),
        e(6), L(" especially "), e(5), L("."),
    )
    return hearst_hypernyms(docs.select("doc_id", t.alias("text")))


def q_cdc_chunks(spark, sf_dir):
    # Content-defined chunking over the documents table: word-level
    # rolling-hash boundaries (3-gram md5 % 8), chunk hashes + cross-doc
    # share counts.
    from ai_knowledge_graph_spark.operators.dedup import cdc_chunks

    return cdc_chunks(_docs(spark, sf_dir).select("doc_id", "text"))


def q_knn_classify(spark, sf_dir):
    # k-NN majority-vote weak labeling: every 7th vector plays "unlabeled
    # query", the rest are the labeled corpus; 5 exact cosine neighbors,
    # ties to the smaller label.
    from ai_knowledge_graph_spark.operators.similarity import knn_classify

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 7 == 0)
    cands = emb.filter(F.col("vec_id") % 7 != 0)
    return knn_classify(cands, queries, k=5)


def q_taxonomy(spark, sf_dir):
    # Hearst pairs -> bounded is_a closure (depth 2, min-support composition,
    # max across derivations, minimal-depth semantics).
    from ai_knowledge_graph_spark.operators.hearst import (
        hearst_hypernyms,
        taxonomy_closure,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    docs = docs.filter(F.size(ws) >= 6)
    e = lambda i: F.element_at(ws, i)  # noqa: E731
    L = F.lit
    t = F.concat(
        e(1), L(" such as "), e(2), L(", "), e(3), L(" and "), e(4), L(". "),
        e(5), L(" and "), e(6), L(" and other "), e(1), L(". "),
        e(2), L(" including "), e(3), L(" and "), e(4), L(". "),
        e(6), L(" especially "), e(5), L("."),
    )
    pairs = hearst_hypernyms(docs.select("doc_id", t.alias("text")))
    return taxonomy_closure(pairs, depth=2)


def q_mis(spark, sf_dir):
    # Luby-style maximal independent set over the undirected std KG,
    # 4 deterministic-priority rounds.
    from ai_knowledge_graph_spark.graph.walks import maximal_independent_set

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return maximal_independent_set(edges, rounds=4)


def q_entity_trends(spark, sf_dir):
    # Per-snapshot entity mention counts + exact-integer burst flag over
    # the triple_history snapshot windows.
    from ai_knowledge_graph_spark.graph.kgops import entity_trends

    raw = _raw_triples(spark, sf_dir, INFER_DOCS).withColumn("doc_id", _doc_id())
    snaps = [
        raw.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for lo, hi in ((0, 30), (10, 40), (20, 50))
    ]
    return entity_trends(snaps)


def q_anchor_corpus(spark, sf_dir):
    # Aggregated anchor texts per link target (the Brin & Page §2.2
    # description signal) from the arithmetic link fixture.
    from ai_knowledge_graph_spark.operators.webcrawl import (
        anchor_corpus,
        extract_links,
    )

    pages = _link_fixture_pages(spark, sf_dir)
    return anchor_corpus(extract_links(pages))


def q_host_boilerplate(spark, sf_dir):
    # Per-host boilerplate lines (>= 50% of the host's pages): synthesized
    # nav line on every page, footer on even docs, per-doc body line.
    from ai_knowledge_graph_spark.operators.curation import host_boilerplate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    docs = docs.filter(F.size(ws) >= 5)
    host = F.concat(F.lit("host"), s(d % 7))
    text = F.concat(
        F.lit("NAV "), host, F.lit(" | menu\n"),
        F.array_join(F.slice(ws, 1, 5), " "), F.lit("\n"),
        F.when(d % 2 == 0, F.concat(F.lit("FOOT "), host)).otherwise(
            F.concat(F.lit("ALT "), s(d % 3))
        ),
    )
    pages = docs.select(host.alias("host"), d.alias("doc_id"), text.alias("text"))
    return host_boilerplate(pages, min_share=0.5)


def q_inverted_index(spark, sf_dir):
    # positional inverted index over documents: postings + df/cf stats.
    from ai_knowledge_graph_spark.operators.ranking import inverted_index

    return inverted_index(_docs(spark, sf_dir).select("doc_id", "text"))


def q_link_predict(spark, sf_dir):
    # Adamic-Adar link prediction over the std KG: wedge join + micro-unit
    # 1/ln(deg) weights + anti-join against existing edges.
    from ai_knowledge_graph_spark.graph.kgops import link_predict

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return link_predict(std)


def q_containment(spark, sf_dir):
    # Asymmetric containment (quote/excerpt) detection: 6-word shingles,
    # hot-shingle cap df<=20, exact integer ppm threshold 0.8.
    from ai_knowledge_graph_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _docs(spark, sf_dir), k=6, min_containment=0.8, max_shingle_df=20
    )


def q_assortativity(spark, sf_dir):
    # Pearson degree assortativity of the undirected std KG: exact int64
    # moment sums, one final float formula.
    from ai_knowledge_graph_spark.graph.kgops import degree_assortativity

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return degree_assortativity(std)


def q_hyperball(spark, sf_dir):
    # HyperBall neighborhood function over the std KG: per-node HLL
    # sketches of the 3-hop out-ball, relational registers, exact-integer
    # harmonic sums.
    from ai_knowledge_graph_spark.graph.walks import hyperball

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return hyperball(edges, radius=3, p=6)


def q_node2vec(spark, sf_dir):
    # Second-order non-backtracking walks (node2vec p->inf determinized)
    # over the std KG, 4 hops.
    from ai_knowledge_graph_spark.graph.walks import node2vec_walks

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return node2vec_walks(edges, steps=4)


def q_ktruss(spark, sf_dir):
    # 3-truss peeling over the undirected std KG, 3 synchronous rounds.
    from ai_knowledge_graph_spark.graph.walks import ktruss

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return ktruss(edges, k=3, rounds=3)


def q_url_templates(spark, sf_dir):
    # URL pattern mining over two synthesized URL families per doc
    # (digit-parameterized article path + static page); the oracle states
    # the expected templates literally, so an engine regex bug mismatches.
    from ai_knowledge_graph_spark.operators.webcrawl import url_templates

    docs = _docs(spark, sf_dir).select("doc_id")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(F.lit("https://host"), s(d % 7), F.lit(".example.com"))
    u1 = F.concat(host, F.lit("/article/"), s(d), F.lit("/page"), s(d % 3),
                  F.lit(".html"))
    u2 = F.concat(host, F.lit("/static/about.html"))
    pages = docs.select(u1.alias("url")).unionByName(docs.select(u2.alias("url")))
    return url_templates(pages)


def q_modularity(spark, sf_dir):
    # Newman modularity decomposition of the LPA communities (4 rounds)
    # over the undirected std KG — the quality score for q_lpa's output.
    from ai_knowledge_graph_spark.graph.walks import lpa_communities, modularity

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return modularity(edges, lpa_communities(edges, rounds=4))


def q_scc(spark, sf_dir):
    # Strongly connected components over an arithmetically-synthesized
    # directed graph (per-group cycles of length 3-6 + tail chains + a
    # forward group link), so the oracle can replay the doubling closure
    # on the exact same edge list. 3 doublings = 8-hop bound > max cycle.
    from ai_knowledge_graph_spark.graph.walks import scc

    d = F.col("doc_id")
    docs = _docs(spark, sf_dir).select(
        "doc_id", (d - d % 8).alias("base"), (d % 8).alias("r"),
        (F.lit(3) + ((d - d % 8) / 8).cast("long") % 4).alias("cl"),
    )
    cyc = docs.select(
        F.col("doc_id").alias("src"),
        F.when(
            F.col("r") < F.col("cl"),
            F.col("base") + (F.col("r") + 1) % F.col("cl"),
        )
        .otherwise(F.col("doc_id") - 1)
        .alias("dst"),
    )
    link = docs.filter(F.col("r") == 7).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
    )
    return scc(cyc.unionByName(link), doublings=3)


def q_funnel(spark, sf_dir):
    # view -> click -> purchase funnel, 7-day entry-anchored window.
    from ai_knowledge_graph_spark.operators.events import funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel(ev, steps=("view", "click", "purchase"), window_sec=7 * 86400)


def q_retention(spark, sf_dir):
    # signup-anchored weekly retention cohorts.
    from ai_knowledge_graph_spark.operators.events import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return retention_cohorts(ev, anchor_type="signup")


def q_ontology_check(spark, sf_dir):
    # functional / inverse-functional violation profile per predicate.
    from ai_knowledge_graph_spark.graph.kgops import functional_violations

    return functional_violations(_std_triples(spark, sf_dir, INFER_DOCS))


def q_harmonic(spark, sf_dir):
    # exact bounded harmonic centrality (radius 3) over the undirected
    # std KG — the reproducible-ranking twin of q_hyperball.
    from ai_knowledge_graph_spark.graph.walks import harmonic_centrality

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return harmonic_centrality(edges, radius=3)


def q_pagerank(spark, sf_dir):
    # Link-graph PageRank over the standardized KG edges (5 rounds, d=0.85).
    from ai_knowledge_graph_spark.graph.centrality import pagerank

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    pr = pagerank(edges, damping=0.85, iterations=5)
    return pr.select("entity", F.round("pagerank", 6).alias("pagerank"))


def q_ppr(spark, sf_dir):
    # Personalized PageRank from a deterministic seed set (~1/4 of nodes,
    # md5 first hex in 0-3) — relevance-to-seeds, 5 rounds, d=0.85.
    from ai_knowledge_graph_spark.graph.centrality import seed_pagerank

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(
        F.substring(F.md5(F.col("node")), 1, 1).isin("0", "1", "2", "3")
    )
    pr = seed_pagerank(edges, seeds, damping=0.85, iterations=5)
    return pr.select("entity", F.round("ppr", 6).alias("ppr"))


def q_cocite(spark, sf_dir):
    # co-citation strength over the DIRECTED std KG: object pairs cited
    # by common subjects (hub subjects > 64 objects dropped). min_count=1
    # keeps the full wedge spectrum — the KG is sparse enough that >= 2
    # is empty above sf0.001.
    from ai_knowledge_graph_spark.graph.kgops import cocitation

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return cocitation(edges, min_count=1, max_fanout=64)


def q_bibcouple(spark, sf_dir):
    # bibliographic coupling = co-citation on the transposed edges:
    # subject pairs citing common objects.
    from ai_knowledge_graph_spark.graph.kgops import cocitation

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("object").alias("src"), F.col("subject").alias("dst"))
    return cocitation(edges, min_count=1, max_fanout=64)


def q_paragraph_dedup(spark, sf_dir):
    # Dolma-style first-occurrence exact paragraph dedup over the same
    # synthesized nav-header/footer structure as q_line_dedup (different
    # rule: one canonical copy survives instead of hot lines dropping
    # everywhere).
    from ai_knowledge_graph_spark.operators.curation import paragraph_dedup

    docs = _docs(spark, sf_dir)
    synth = docs.select(
        "doc_id",
        F.concat(
            F.lit("HOME | ABOUT | CONTACT\n"),
            F.col("text"),
            F.lit("\nCopyright "),
            F.col("source"),
        ).alias("text"),
    )
    return paragraph_dedup(synth)


def q_readability(spark, sf_dir):
    # Flesch-Kincaid grade + reading ease over documents.
    from ai_knowledge_graph_spark.operators.textstats import readability

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return readability(docs).select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        "fk_grade", "reading_ease",
    )


def q_rake(spark, sf_dir):
    # RAKE keyword extraction with corpus-level word stats, top 3 per doc.
    from ai_knowledge_graph_spark.operators.textstats import rake_keywords

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return rake_keywords(docs, top_k=3)


def q_recrawl(spark, sf_dir):
    # change-rate recrawl scheduling over 4 arithmetic snapshot cuts:
    # presence (doc_id+s) % 11 != 0, content version bumps when
    # (doc_id+t) % 3 == 0 at snapshot t.
    from ai_knowledge_graph_spark.operators.webcrawl import recrawl_priority

    docs = _docs(spark, sf_dir)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/d"),
        F.col("doc_id").cast("string"),
    )
    snaps = []
    for s in range(4):
        ver = sum(
            ((F.col("doc_id") + F.lit(t)) % 3 == 0).cast("int")
            for t in range(1, s + 1)
        ) if s else F.lit(0)
        snaps.append(
            docs.filter((F.col("doc_id") + F.lit(s)) % 11 != 0).select(
                url.alias("url"),
                F.concat(F.lit("v"), ver.cast("string")).alias("content_sha"),
            )
        )
    return recrawl_priority(snaps)


def q_transe(spark, sf_dir):
    # deterministic TransE plausibility scoring (dim=8) over the
    # standardized KG; integer embeddings from the portable md5-48bit
    # hash, int64 L1 score — the scoring half of kg_negatives' loop.
    from ai_knowledge_graph_spark.graph.kgops import transe_score

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    return transe_score(std, dim=8)


def q_profile(spark, sf_dir):
    # one-pass per-column dataset profiler over documents (ingest
    # sanity primitive): rows / nulls / distinct / native-order min+max.
    from ai_knowledge_graph_spark.operators.stats import profile_columns

    docs = _docs(spark, sf_dir)
    return profile_columns(docs, ["doc_id", "text", "lang", "source", "n_chars"])


def q_llr_keywords(spark, sf_dir):
    # per-source distinctive terms by Dunning log-likelihood ratio,
    # x*ln(x) terms frozen to int64 millis before the signed sum.
    from ai_knowledge_graph_spark.operators.textstats import llr_keywords

    docs = _docs(spark, sf_dir).select("source", "text")
    return llr_keywords(docs, top_k=5, min_count=5)


def q_textrank(spark, sf_dir):
    # corpus-level TextRank keywords: integer-micro PageRank (5 rounds)
    # over the adjacent-content-word co-occurrence graph; bit-exact int64
    # recursion, top-50 by (score desc, word asc).
    from ai_knowledge_graph_spark.operators.textstats import textrank_keywords

    return textrank_keywords(_docs(spark, sf_dir), iterations=5, top_k=50)


def q_fuzzy_pairs(spark, sf_dir):
    # prefix-blocked Levenshtein entity-resolution candidates (dist <= 2).
    # The clean synthetic entities carry no natural typos (measured: zero
    # pairs at dist<=3 above sf0.001), so the fixture injects them
    # arithmetically — for every std entity whose md5 starts 0-7, a
    # variant with the character at position (h48 % len) + 1 deleted —
    # and the oracle replays the same injection. Variants whose edit
    # falls inside the 2-char blocking prefix land in a different block
    # and are (deliberately) missed: the documented prefix-block recall
    # limit, exercised deterministically.
    from ai_knowledge_graph_spark.operators.standardize import (
        fuzzy_entity_pairs,
    )

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    ents = (
        std.select(F.col("subject").alias("entity"))
        .unionByName(std.select(F.col("object").alias("entity")))
        .distinct()
    )
    h48 = F.conv(F.substring(F.md5("entity"), 1, 12), 16, 10).cast("long")
    noisy = (
        ents.filter(F.substring(F.md5("entity"), 1, 1).rlike("[0-7]"))
        .select(
            "entity", (h48 % F.length("entity") + 1).cast("int").alias("p")
        )
        .select(
            F.concat(
                F.expr("substring(entity, 1, p - 1)"),
                F.expr("substring(entity, p + 1)"),
            ).alias("entity")
        )
    )
    return fuzzy_entity_pairs(ents.unionByName(noisy))


def q_hard_negatives(spark, sf_dir):
    # contrastive hard negatives: BM25 top-50 hits absent from the dense
    # exact-cosine top-50 around vec 0 (the hybrid_rrf lists).
    from pyspark.sql import Window

    from ai_knowledge_graph_spark.operators.ranking import (
        bm25_rank,
        hard_negatives,
    )
    from ai_knowledge_graph_spark.operators.similarity import cosine_topk

    lex = bm25_rank(_docs(spark, sf_dir), BM25_QUERY, top_n=50).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("rank"),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dense = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=50).select(
        F.col("neighbor_id").alias("doc_id")
    )
    return hard_negatives(lex, dense)


def q_degree_dist(spark, sf_dir):
    # log2-bucketed undirected degree histogram of the std KG.
    from ai_knowledge_graph_spark.graph.kgops import degree_distribution

    return degree_distribution(_std_triples(spark, sf_dir, INFER_DOCS))


def q_itemsets(spark, sf_dir):
    # per-session event-type pair itemsets (market-basket level 2).
    from ai_knowledge_graph_spark.operators.events import session_itemsets

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_itemsets(ev, min_support=3)


def q_sentiment(spark, sf_dir):
    # AFINN-style integer lexicon sentiment, milli average, NULL when no
    # lexicon word matches.
    from ai_knowledge_graph_spark.operators.textstats import sentiment_scores

    return sentiment_scores(_docs(spark, sf_dir))


def q_quality_pct(spark, sf_dir):
    # calibration-free percentile normalization of the classifier margin
    # (the FineWeb-style percentile gate input).
    from ai_knowledge_graph_spark.operators.textstats import (
        quality_percentiles,
    )

    return quality_percentiles(_docs(spark, sf_dir))


def q_next_word(spark, sf_dir):
    # conditional bigram table: per word, top-3 successors with exact
    # ppm conditional probability.
    from ai_knowledge_graph_spark.operators.textstats import next_word_table

    return next_word_table(_docs(spark, sf_dir), top_k=3, min_count=3)


def q_community_profile(spark, sf_dir):
    # per-LPA-community size + highest-degree hub (ties lexicographic).
    from ai_knowledge_graph_spark.graph.walks import community_profiles

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return community_profiles(edges, rounds=4)


def q_snm_pairs(spark, sf_dir):
    # sorted-neighborhood ER candidates (window 3, lev <= 2) over the
    # same typo-injected entity fixture as fuzzy_pairs — SNM catches the
    # deletions prefix blocking keeps, and vice versa.
    from ai_knowledge_graph_spark.operators.standardize import snm_pairs

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    ents = (
        std.select(F.col("subject").alias("entity"))
        .unionByName(std.select(F.col("object").alias("entity")))
        .distinct()
    )
    h48 = F.conv(F.substring(F.md5("entity"), 1, 12), 16, 10).cast("long")
    noisy = (
        ents.filter(F.substring(F.md5("entity"), 1, 1).rlike("[0-7]"))
        .select(
            "entity", (h48 % F.length("entity") + 1).cast("int").alias("p")
        )
        .select(
            F.concat(
                F.expr("substring(entity, 1, p - 1)"),
                F.expr("substring(entity, p + 1)"),
            ).alias("entity")
        )
    )
    return snm_pairs(ents.unionByName(noisy), window=3, max_dist=2)


def q_distinct_curve(spark, sf_dir):
    # cumulative-distinct user growth curve (first-seen-day formulation).
    from ai_knowledge_graph_spark.operators.events import distinct_curve

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return distinct_curve(ev)


def q_uncertain(spark, sf_dir):
    # active-learning uncertainty sampling over the classifier gate's
    # exact int64 margins (top-50 closest to the boundary).
    from ai_knowledge_graph_spark.operators.sampling import (
        uncertainty_sample,
    )
    from ai_knowledge_graph_spark.operators.textstats import classifier_score

    scored = classifier_score(_docs(spark, sf_dir), dim=4096)
    return uncertainty_sample(scored, k=50)


def q_embedding_pool(spark, sf_dir):
    # chunk->doc mean pooling (vec_id DIV 10 groups), micro-frozen
    # components, integer mean. LONG (row-per-component) form: every
    # column is atomic, so the driver's pandas canonicalizer can sort
    # and hash it (the array-valued pool_embeddings stays the library
    # API; its round-4 driver row failed only on the list column).
    from ai_knowledge_graph_spark.operators.similarity import (
        pool_embeddings_long,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pool_embeddings_long(emb, group_size=10)


def q_host_dup(spark, sf_dir):
    # per-source exact-duplicate rate (normalized-content sha).
    from ai_knowledge_graph_spark.operators.dedup import host_dup_rate

    return host_dup_rate(_docs(spark, sf_dir))


def q_convert_latency(spark, sf_dir):
    # log2-bucketed first click->purchase latency distribution.
    from ai_knowledge_graph_spark.operators.events import convert_latency

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return convert_latency(ev, "click", "purchase")


def q_topo_layers(spark, sf_dir):
    # bounded Kahn layering of the std KG; -1 = cyclic/deep residue.
    from ai_knowledge_graph_spark.graph.kgops import topological_layers

    return topological_layers(_std_triples(spark, sf_dir, INFER_DOCS), rounds=4)


def q_novelty(spark, sf_dir):
    # per-arrival-batch novel 8-gram share (crawl diminishing-returns).
    from ai_knowledge_graph_spark.operators.curation import novelty_curve

    return novelty_curve(_docs(spark, sf_dir), gram_n=8, batch_size=100)


def q_embedding_qa(spark, sf_dir):
    # one-row vector-table QA gate (dims / NULLs / zero norms / unit share).
    from ai_knowledge_graph_spark.operators.similarity import embedding_qa

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_qa(emb, expected_dim=64)


def q_session_incidents(spark, sf_dir):
    # interval-overlap join: sessions x corpus error hours (cover-bucket
    # plan, no theta join).
    from ai_knowledge_graph_spark.operators.events import session_incidents

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_incidents(ev, incident_type="error")


def q_char_entropy(spark, sf_dir):
    # char-bigram Shannon entropy per doc, milli-nats, xlx int freeze.
    from ai_knowledge_graph_spark.operators.textstats import char_entropy

    return char_entropy(_docs(spark, sf_dir))


def q_revenue_nation(spark, sf_dir):
    # TPC-H Q5-shape star join over the warehouse tables; revenue frozen
    # to int64 cents per row before the sum, nation broadcast.
    from ai_knowledge_graph_spark.operators.relational import (
        revenue_by_nation,
    )

    return revenue_by_nation(
        spark.read.parquet(f"{sf_dir}/customer.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        spark.read.parquet(f"{sf_dir}/nation.parquet"),
    )


def q_rolling(spark, sf_dir):
    # daily event counts + trailing 7-day RANGE-window rolling sums.
    from ai_knowledge_graph_spark.operators.events import rolling_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rolling_counts(ev, window_days=7)


def q_event_corr(spark, sf_dir):
    # Pearson correlation of click vs purchase daily counts (int64
    # moments, one shared-expression float step).
    from ai_knowledge_graph_spark.operators.events import event_correlation

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_correlation(ev, "click", "purchase")


def q_topic_shift(spark, sf_dir):
    # TextTiling-style sharpest topic shift per doc (10-word blocks,
    # micro-frozen adjacent-block cosine).
    from ai_knowledge_graph_spark.operators.textstats import topic_shifts

    return topic_shifts(_docs(spark, sf_dir), window_words=10)


def q_ab_lift(spark, sf_dir):
    # deterministic A/B cohort conversion readout (md5 user split,
    # purchase conversion, ppm rates).
    from ai_knowledge_graph_spark.operators.events import ab_lift

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ab_lift(ev, convert_type="purchase")


def q_lang_mismatch(spark, sf_dir):
    # declared-vs-predicted language confusion matrix: the ingest QA
    # readout over the lang_id heuristic.
    from ai_knowledge_graph_spark.operators.textstats import language_id

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    return (
        language_id(docs)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def q_quantile_sketch(spark, sf_dir):
    # mergeable log2-histogram quantiles of document length (p50/90/99).
    from ai_knowledge_graph_spark.operators.sketches import quantile_sketch

    return quantile_sketch(_docs(spark, sf_dir), "n_chars", ps=(50, 90, 99))


def q_split_leakage(spark, sf_dir):
    # near-dup leakage audit across the hash_split train/val/test cells.
    from ai_knowledge_graph_spark.operators.curation import split_leakage
    from ai_knowledge_graph_spark.operators.dedup import minhash_near_dup
    from ai_knowledge_graph_spark.operators.sampling import hash_split

    docs = _docs(spark, sf_dir)
    pairs = minhash_near_dup(docs, k=3, num_hashes=8, bands=4, threshold=0.5)
    splits = hash_split(docs, "doc_id").select("doc_id", "split")
    return split_leakage(pairs, splits)


def q_range_join(spark, sf_dir):
    # interval join via the two-bucket trick (no theta join): every
    # purchase within 1h AFTER each click by the same user.
    from ai_knowledge_graph_spark.operators.events import range_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return range_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        window_sec=3600,
    )


def q_pred_symmetry(spark, sf_dir):
    # symmetric-predicate discovery (reverse-edge share). Mined over the
    # INFERRED graph for the same reason as rule_mining: phase-2 edges
    # alone rarely carry both directions; the closed graph re-surfaces
    # the inference symmetries as near-1e6-ppm predicates.
    from ai_knowledge_graph_spark.graph.kgops import predicate_symmetry

    return predicate_symmetry(_fin_triples(spark, sf_dir))


def q_pred_inverse(spark, sf_dir):
    # AMIE-style inverse rules q(b,a) <= p(a,b) with ppm confidence,
    # over the inferred graph (empty over std — measured 0 rows).
    from ai_knowledge_graph_spark.graph.kgops import predicate_inverses

    return predicate_inverses(_fin_triples(spark, sf_dir), min_support=1)


def q_bpe_eval(spark, sf_dir):
    # tokenizer compression eval: train 8 merges, encode with the
    # production Arrow encoder, report corpus fertility + chars/token.
    from ai_knowledge_graph_spark.operators.tokenizer import (
        bpe_compression_stats,
        train_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe(docs.select("text"), n_merges=8)
    return bpe_compression_stats(docs, merges)


def q_outliers(spark, sf_dir):
    # per-source 2-sigma doc-length outliers on exact integer moments.
    from ai_knowledge_graph_spark.operators.stats import length_outliers

    return length_outliers(_docs(spark, sf_dir), k_sigma=2)


def q_coverage(spark, sf_dir):
    # cumulative head coverage of the token stream at k = 5/10/20.
    from ai_knowledge_graph_spark.operators.textstats import vocab_coverage

    return vocab_coverage(_docs(spark, sf_dir), ks=(5, 10, 20))


def q_katz(spark, sf_dir):
    # Katz centrality over the std KG (5 rounds, alpha=1/10), int64
    # micro recursion — the non-degree-normalized contrast to pagerank.
    from ai_knowledge_graph_spark.graph.centrality import katz_centrality

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return katz_centrality(edges, iterations=5, alpha_inv=10)


def q_shards(spark, sf_dir):
    # rendezvous-hash shard histogram over documents (8 shards).
    from ai_knowledge_graph_spark.operators.sampling import rendezvous_shards

    return rendezvous_shards(_docs(spark, sf_dir), key_col="doc_id", n_shards=8)


def q_collocations(spark, sf_dir):
    # top-20 adjacent-bigram collocations by micro-frozen PMI.
    from ai_knowledge_graph_spark.operators.textstats import word_collocations

    return word_collocations(_docs(spark, sf_dir), min_count=5, top_k=20)


BLOCKLIST_TERMS = ["spark", "batch", "merge"]


def q_blocklist(spark, sf_dir):
    # leetspeak-normalized blocklist hits (the C4 bad-words gate shape).
    from ai_knowledge_graph_spark.operators.curation import blocklist_hits

    return blocklist_hits(_docs(spark, sf_dir), BLOCKLIST_TERMS)


def q_zipf(spark, sf_dir):
    # Zipf exponent of the corpus frequency head (top-100 ranks): int64
    # moments over micro-frozen ln, one final rounded division.
    from ai_knowledge_graph_spark.operators.textstats import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), top_ranks=100)


def q_qlm(spark, sf_dir):
    # Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty),
    # same query terms as bm25; per-term log frozen to micro ints via a
    # SQL expression string shared verbatim with the oracle.
    from ai_knowledge_graph_spark.operators.ranking import dirichlet_lm_rank

    return dirichlet_lm_rank(_docs(spark, sf_dir), BM25_QUERY, mu=2000, top_n=20)


def q_session_paths(spark, sf_dir):
    # top in-session event trigrams (30-min gap sessions).
    from ai_knowledge_graph_spark.operators.events import session_paths

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_paths(ev, top_n=10)


def q_ndcg(spark, sf_dir):
    # graded ranking eval: nDCG@5 of the SRP-bucketed ANN against the
    # exact-cosine gold ranking (gain = 6 - exact rank); integer discount
    # table shared literal-for-literal with the oracle.
    from ai_knowledge_graph_spark.operators.ranking import ndcg_at_k

    run = q_srp_topk(spark, sf_dir).select("query_id", "neighbor_id", "rk")
    gold = q_embedding_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", "rk"
    )
    return ndcg_at_k(run, gold, k=5)


def q_er_eval(spark, sf_dir):
    # pair-level confusion of the fuzzy ER candidates against the known
    # injected-typo gold pairs — quantifies the prefix-block recall loss
    # deterministically (edits inside the 2-char prefix become FN).
    from ai_knowledge_graph_spark.operators.dedup import dedup_eval

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    ents = (
        std.select(F.col("subject").alias("entity"))
        .unionByName(std.select(F.col("object").alias("entity")))
        .distinct()
    )
    h48 = F.conv(F.substring(F.md5("entity"), 1, 12), 16, 10).cast("long")
    marked = ents.filter(
        F.substring(F.md5("entity"), 1, 1).rlike("[0-7]")
    ).select("entity", (h48 % F.length("entity") + 1).cast("int").alias("p"))
    variants = marked.select(
        F.col("entity").alias("entity_a"),
        F.concat(
            F.expr("substring(entity, 1, p - 1)"), F.expr("substring(entity, p + 1)")
        ).alias("entity_b"),
    )
    gold = variants.filter(
        (F.col("entity_a") != F.col("entity_b"))
        & (F.length("entity_b") >= 4)
        & ~F.col("entity_a").rlike("[^ -~]")
    )
    pred = q_fuzzy_pairs(spark, sf_dir)
    return dedup_eval(pred, gold)


def q_summarize(spark, sf_dir):
    # centroid extractive summarization: each doc's most corpus-
    # representative 15-word window, nano-frozen probability scoring.
    from ai_knowledge_graph_spark.operators.textstats import (
        centroid_summaries,
    )

    return centroid_summaries(_docs(spark, sf_dir), seg_len=15)


def q_markov(spark, sf_dir):
    # first-order clickstream transition matrix: per-user (ts, event_id)
    # ordered bigrams, source-conditional probability frozen to ppm.
    from ai_knowledge_graph_spark.operators.events import markov_transitions

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return markov_transitions(ev)


# --- event analytics + deterministic sampling ------------------------------


def q_stream_late(spark, sf_dir):
    # APPEND-mode streaming windowed aggregation with REAL late-data
    # dropping: three mtime-ordered file batches through one AvailableNow
    # run. Batch 0 = even events before Jan 21 (establishes the watermark),
    # batch 1 = everything from Jan 21 on (advances it), batch 2 = odd
    # events before Jan 11 — ENTIRELY late by the time the (one-batch-
    # lagged) late filter sees them, so they are dropped by the watermark,
    # not merged. Final emitted set = windows over batches 0∪1 whose end
    # precedes the final watermark (max event time, ms-floored, - 2h);
    # the oracle replays exactly that.
    from ai_knowledge_graph_spark.streaming.ingest import windowed_event_counts_late

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "event_type", "value"
    )
    b0 = ev.filter((F.col("event_id") % 2 == 0) & (F.col("ts") < "2024-01-21"))
    b1 = ev.filter(F.col("ts") >= "2024-01-21")
    b2 = ev.filter((F.col("event_id") % 2 == 1) & (F.col("ts") < "2024-01-11"))
    out = windowed_event_counts_late(spark, [b0, b1, b2])
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_sec"),
        "event_type",
        "n",
        "total_value",
    )


def q_asof_purchase_signup(spark, sf_dir):
    # backward as-of join: each purchase -> latest preceding signup by the
    # same user (union-tag window shape, not a theta-join)
    from ai_knowledge_graph_spark.operators.events import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup")
    out = asof_join(
        purchases,
        signups,
        payload_cols=("event_id", "ts"),
        tiebreak_col="event_id",
        prefix="anchor_",
    )
    return out.select(
        "event_id",
        "anchor_event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("anchor_ts")).alias("gap_sec"),
    )


def q_sessions(spark, sf_dir):
    # gap sessionization (30 min) + per-session rollup
    from ai_knowledge_graph_spark.operators.events import session_stats, sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "value"
    )
    return session_stats(sessionize(ev))


def q_event_windows(spark, sf_dir):
    # tumbling 1-hour windowed aggregation (batch twin of the streaming op)
    from ai_knowledge_graph_spark.streaming.ingest import windowed_event_counts_batch

    out = windowed_event_counts_batch(spark, f"{sf_dir}/events.parquet")
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_sec"),
        "event_type",
        "n",
        "total_value",
    )


SAMPLE_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.1}


def q_stratified_sample(spark, sf_dir):
    # deterministic per-language hash sampling (corpus mixing)
    from ai_knowledge_graph_spark.operators.sampling import stratified_sample

    docs = _docs(spark, sf_dir)
    out = stratified_sample(
        docs, "lang", SAMPLE_RATES, key_col="doc_id", default_rate=0.75
    )
    return out.select("doc_id", "lang")


def q_hash_split(spark, sf_dir):
    # leakage-safe train/val/test assignment by document-key hash
    from ai_knowledge_graph_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf_dir), "doc_id").select("doc_id", "split")


def q_line_dedup(spark, sf_dir):
    # CCNet/RefinedWeb-style corpus-level boilerplate-line removal: lines
    # occurring > 2x across the corpus (synthetic nav header on every doc,
    # per-source copyright footer) are dropped from every document.
    from ai_knowledge_graph_spark.operators.curation import line_dedup

    docs = _docs(spark, sf_dir)
    synth = docs.select(
        "doc_id",
        F.concat(
            F.lit("HOME | ABOUT | CONTACT\n"),
            F.col("text"),
            F.lit("\nCopyright "),
            F.col("source"),
        ).alias("text"),
    )
    return line_dedup(synth, max_occurrences=2)


def q_curate_corpus(spark, sf_dir):
    # the composed curation funnel: lang -> quality -> repetition -> exact
    # dedup -> near-dup dedup -> split assignment
    from ai_knowledge_graph_spark.operators.curation import curate_corpus

    return curate_corpus(_docs(spark, sf_dir))


def q_classifier_score(spark, sf_dir):
    # Hashed-BoW linear classifier gate with deterministic pseudo-weights;
    # the dot product stays in int64 (raw_score) so it is exact and
    # summation-order-independent on both engines.
    from ai_knowledge_graph_spark.operators.textstats import classifier_score

    out = classifier_score(_docs(spark, sf_dir), dim=4096)
    # round(6) the sigmoid like every other float column in this file: JVM
    # Math.exp and DuckDB libm exp diverge at the last ulp (measured 45/500
    # rows at sf0.01), which a strict value-hash protocol flags.
    return out.withColumn("score", F.round("score", 6))


def q_mix_corpus(spark, sf_dir):
    # Data mixing with exact integer quotas (each source has 25 docs):
    # src0 upsampled 2.4 epochs, src1 exactly 1, src2/src3 downsampled,
    # all other sources dropped. Oracle replays the selection as a plain
    # (bucket, hash, key) rank — the engine's histogram/boundary-bucket
    # algorithm must produce the identical set.
    from ai_knowledge_graph_spark.operators.sampling import mix_corpus

    return mix_corpus(
        _docs(spark, sf_dir), {"src0": 60, "src1": 25, "src2": 13, "src3": 5}
    )


def q_decontaminate(spark, sf_dir):
    # Benchmark decontamination (GPT-3/Pile 13-gram collision rule): the
    # synthetic eval set is a 50-word slice (words 11-60) of every 19th
    # document, so those docs (and any near-dups of them) self-flag.
    from ai_knowledge_graph_spark.operators.curation import (
        _word_array,
        decontaminate,
    )

    docs = _docs(spark, sf_dir)
    words = _word_array(F.col("text"))
    bench = docs.filter(F.col("doc_id") % 19 == 0).select(
        F.concat_ws(" ", F.slice(words, 11, 50)).alias("text")
    )
    return decontaminate(docs, bench, k=13, min_hits=1)


def q_pii_redact(spark, sf_dir):
    # PII scrubbing: deterministic synthetic email / IPv4 / phone suffixes
    # (only some docs get each type, so counts vary), redacted in place.
    from ai_knowledge_graph_spark.operators.curation import redact_pii

    docs = _docs(spark, sf_dir)
    did = F.col("doc_id")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" contact "), F.col("source"), F.lit("_"),
                    did.cast("string"), F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 4 == 0,
                F.concat(
                    F.lit(" ip 10."), (did % 200).cast("string"),
                    F.lit(".0."), (did % 250).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(synth)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline over sf0.001 documents."""
    from ai_knowledge_graph_spark.config import load_config
    from ai_knowledge_graph_spark.pipeline import run_pipeline

    docs = _docs(spark, "/root/testdata/sf0.001")
    pages = docs.select(
        F.format_string("doc%012d", F.col("doc_id")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode("text", "UTF-8").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
    cfg = load_config()
    cfg["chunking"] = {"chunk_size": CHUNK_SIZE, "overlap": OVERLAP}
    return run_pipeline(spark, pages, cfg)


def q_pack_sequences(spark, sf_dir):
    # GPT-style sequence packing: hash-shuffled concat of the corpus token
    # stream sliced into 512-token packs; one row per (doc, pack) segment.
    from ai_knowledge_graph_spark.operators.sampling import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), ctx_len=512)


def q_hits(spark, sf_dir):
    # Kleinberg HITS over the standardized KG edges (5 L1-normalized
    # synchronous sweeps) — the web-graph companion to pagerank.
    from ai_knowledge_graph_spark.graph.centrality import hits

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    out = hits(edges, iterations=5)
    return out.select(
        "entity",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _dsir_split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return (
        docs.filter(F.col("doc_id") % 19 != 0),
        docs.filter(F.col("doc_id") % 19 == 0),
    )


def q_sketch_bloom(spark, sf_dir):
    # Bloom word-table over the corpus half (doc_id < 400), probed by every
    # doc id: present keys must read true (no false negatives); the false
    # positives on the absent half are deterministic and oracle-replayed.
    from ai_knowledge_graph_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("doc_id").cast("string").alias("key")
    )
    bloom = bloom_build(docs.filter("doc_id < 400"), "key", n_bits=4096, k=4)
    out = bloom_contains(docs, bloom, "key", n_bits=4096, k=4)
    return out.select("doc_id", "maybe_present")


def q_sketch_cms(spark, sf_dir):
    # Count-Min over the source column (skewed repeats), point-queried per
    # distinct source — exact int64 counters, overestimate-only.
    from ai_knowledge_graph_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("source").alias("key")
    )
    cms = cms_build(docs, "key", depth=4, width=64)
    return cms_lookup(docs.distinct(), cms, "key", depth=4, width=64)


def q_sketch_hll(spark, sf_dir):
    # HyperLogLog distinct-token estimate (p=10): registers from exploded
    # whitespace tokens; the harmonic sum stays exact integer so the one
    # double division hash-compares.
    from ai_knowledge_graph_spark.operators.sketches import (
        hll_build,
        hll_estimate,
    )

    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("key"))
        .filter(F.col("key") != "")
    )
    return hll_estimate(hll_build(toks, "key", p=10), p=10)


def q_exact_substring_incr(spark, sf_dir):
    # Incremental ExactSubstr: docs < 400 are the stored corpus (only its
    # (hash,count) index is used), docs >= 400 the new batch. Oracle = the
    # full-run SQL over corpus ∪ batch restricted to batch rows — the
    # equivalence the incremental path guarantees.
    from ai_knowledge_graph_spark.operators.curation import (
        exact_substring_dedup_incremental,
        exact_substring_hash_counts,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    counts = exact_substring_hash_counts(corpus, k=12)
    return exact_substring_dedup_incremental(batch, counts, k=12, min_count=2)


def q_dsir_weights(spark, sf_dir):
    # DSIR log importance weights of the raw split against the held-out
    # target split (same doc_id%19 partition as decontaminate).
    from ai_knowledge_graph_spark.operators.dsir import dsir_weights

    raw, tgt = _dsir_split(spark, sf_dir)
    out = dsir_weights(raw, tgt, n_buckets=4096)
    return out.select(
        "doc_id", "n_grams", F.round("log_weight", 6).alias("log_weight")
    )


def q_dsir_sample(spark, sf_dir):
    # deterministic Gumbel top-50 importance resample.
    from ai_knowledge_graph_spark.operators.dsir import dsir_resample

    raw, tgt = _dsir_split(spark, sf_dir)
    out = dsir_resample(raw, tgt, k=50, n_buckets=4096)
    return out.select(
        "doc_id",
        "n_grams",
        F.round("log_weight", 6).alias("log_weight"),
        F.round("gumbel_key", 6).alias("gumbel_key"),
    )


def q_semdedup(spark, sf_dir):
    # SemDeDup over the embeddings table: hash-seeded 16-cluster index,
    # keep-first in ascending-centroid-sim order, cosine >= 0.35 marks a
    # semantic dup (synthetic embeddings top out near 0.49 in-cluster).
    from ai_knowledge_graph_spark.operators.similarity import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return semdedup(emb, threshold=0.35, nlist=16)


def q_robots(spark, sf_dir):
    # robots.txt gate over synthesized per-domain policies: three policy
    # variants by domain hash, four URL path shapes by doc_id. The oracle
    # computes expected verdicts from the GENERATOR (not by replaying the
    # parser), so an engine parse bug surfaces as a mismatch.
    from ai_knowledge_graph_spark.operators.webcrawl import robots_filter

    docs = _docs(spark, sf_dir)
    variant = (
        F.conv(F.substring(F.md5("source"), 1, 8), 16, 10).cast("long") % 3
    )
    robots = (
        docs.select("source")
        .distinct()
        .select(
            F.col("source").alias("domain"),
            F.when(
                variant == 0,
                F.lit(
                    "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
                    "\nUser-agent: badbot\nDisallow: /\n"
                ),
            )
            .when(
                variant == 1,
                F.lit("User-agent: *\nDisallow: /\nAllow: /pub\n"),
            )
            .otherwise(F.lit("User-agent: badbot\nDisallow: /\n"))
            .alias("robots_txt"),
        )
    )
    k = F.col("doc_id").cast("string")
    pcase = F.col("doc_id") % 4
    urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.when(pcase == 0, F.lit(""))
            .when(pcase == 1, F.concat(F.lit("/private/doc"), k))
            .when(pcase == 2, F.concat(F.lit("/private/ok/doc"), k))
            .otherwise(F.concat(F.lit("/pub/doc"), k)),
        ).alias("url"),
    )
    return robots_filter(urls, robots).select("doc_id", "url", "robots_allowed")


def q_gopher(spark, sf_dir):
    # Gopher quality rules (Rae et al. 2021): per-rule verdicts in exact
    # integer arithmetic + round(6) info ratios.
    from ai_knowledge_graph_spark.operators.textstats import gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return gopher_rules(docs).drop("text")


def _link_fixture_pages(spark, sf_dir):
    """Deterministic crawl pages with six anchor shapes per doc: absolute
    (mixed case), root-relative (+query/tracking/fragment), path-relative
    (dot segments), protocol-relative (+default port), mailto (must drop),
    and fragment-only (self). Everything below is arithmetic on doc_id, so
    the oracle can state the EXPECTED edges without ever parsing html."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.lit("https://host"), s(d % 7), F.lit(".example.com/sec"),
        s(d % 5), F.lit("/sub/p"), s(d), F.lit(".html"),
    )
    html = F.concat(
        F.lit("<html><body><p>intro</p>"),
        F.lit('<a href="HTTPS://Host'), s((d + 1) % 7),
        F.lit('.Example.Com/x/y.html">first link</a>'),
        F.lit('<a href="/top/z'), s(d % 11),
        F.lit('.html?b=2&utm_source=t&a=1#frag">second link</a>'),
        F.lit('<a href="../rel'), s(d % 3),
        F.lit('/page.html">third link</a>'),
        F.lit('<a href="//host'), s((d + 2) % 7),
        F.lit('.example.com:443/pr">fourth link</a>'),
        F.lit('<a href="mailto:user@example.com">write us</a>'),
        F.lit('<a href="#section">self anchor</a>'),
        F.lit("</body></html>"),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return docs.select(
        "doc_id", url.alias("url"), F.encode(html, "UTF-8").alias("html")
    )


_LINK_ORACLE_PRELUDE = """
WITH u AS (
  SELECT doc_id,
    'https://host' || (doc_id % 7) || '.example.com/sec' || (doc_id % 5)
      || '/sub/p' || doc_id || '.html' AS url
  FROM documents
), expected AS (
  SELECT doc_id, url, p.pos,
    CASE p.pos
      WHEN 0 THEN 'HTTPS://Host' || ((doc_id + 1) % 7) || '.Example.Com/x/y.html'
      WHEN 1 THEN '/top/z' || (doc_id % 11) || '.html?b=2&utm_source=t&a=1#frag'
      WHEN 2 THEN '../rel' || (doc_id % 3) || '/page.html'
      WHEN 3 THEN '//host' || ((doc_id + 2) % 7) || '.example.com:443/pr'
      WHEN 4 THEN 'mailto:user@example.com'
      ELSE '#section' END AS href_raw,
    CASE p.pos
      WHEN 0 THEN 'first link' WHEN 1 THEN 'second link'
      WHEN 2 THEN 'third link' WHEN 3 THEN 'fourth link'
      WHEN 4 THEN 'write us' ELSE 'self anchor' END AS anchor_text,
    CASE p.pos
      WHEN 0 THEN 'https://host' || ((doc_id + 1) % 7) || '.example.com/x/y.html'
      WHEN 1 THEN 'https://host' || (doc_id % 7) || '.example.com/top/z'
                  || (doc_id % 11) || '.html?a=1&b=2'
      WHEN 2 THEN 'https://host' || (doc_id % 7) || '.example.com/sec'
                  || (doc_id % 5) || '/rel' || (doc_id % 3) || '/page.html'
      WHEN 3 THEN 'https://host' || ((doc_id + 2) % 7) || '.example.com/pr'
      WHEN 4 THEN NULL
      ELSE url END AS dst_url
  FROM u, (VALUES (0), (1), (2), (3), (4), (5)) AS p(pos)
)
"""


def q_link_graph(spark, sf_dir):
    # Hyperlink extraction + RFC 3986 resolution + canonicalization over
    # synthesized crawl html. The oracle never parses html: it states the
    # expected (href_raw, anchor_text, dst_url) per (doc, position) directly
    # from the generator arithmetic, so any extractor/resolver/normalizer
    # bug surfaces as a hash mismatch.
    from ai_knowledge_graph_spark.operators.webcrawl import extract_links

    pages = _link_fixture_pages(spark, sf_dir)
    return extract_links(pages).select(
        "url", "pos", "href_raw", "anchor_text", "dst_url"
    )


def q_host_graph(spark, sf_dir):
    # Host-level web graph from the extracted link table (map-side-combined
    # count by host pair); oracle aggregates the arithmetic edge list.
    from ai_knowledge_graph_spark.operators.webcrawl import (
        extract_links,
        host_graph,
    )

    pages = _link_fixture_pages(spark, sf_dir)
    return host_graph(extract_links(pages)).select(
        "src_host", "dst_host", "n_links"
    )


def q_tfidf(spark, sf_dir):
    # Per-doc TF-IDF keywords: idf frozen to int64 micro-units before the
    # tf multiply, so scores + ranking are exact integer arithmetic.
    from ai_knowledge_graph_spark.operators.textstats import tfidf_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return tfidf_keywords(docs, top_k=5)


def q_entity_pmi(spark, sf_dir):
    # Chunk-windowed PMI/NPMI entity association mining over the
    # standardized graph; counts exact int64, ln/divide the only float
    # steps (round 6, the lm_perplexity precedent).
    from ai_knowledge_graph_spark.operators.concepts import (
        entity_cooccurrence_pmi,
    )

    return entity_cooccurrence_pmi(
        _std_triples(spark, sf_dir), context_cols=("url", "chunk")
    )


def q_incr_mapping(spark, sf_dir):
    # Incremental KG standardization (daily ingest): mapping built over the
    # first 300 docs, then extended with the remaining docs' triples without
    # recomputing the old corpus. Oracle rebuilds the existing mapping with
    # the SAME CTE chain (counts filtered to doc_id < 300) and replays the
    # adopt/new-group rules in independent SQL.
    from ai_knowledge_graph_spark.operators.standardize import (
        build_entity_mapping,
        incremental_entity_mapping,
    )

    raw = _raw_triples(spark, sf_dir)
    split = "doc000000000300"  # zero-padded url: string order == doc order
    existing = build_entity_mapping(
        raw.filter(F.col("url") < split), tie_order="lexicographic"
    )
    batch = raw.filter(F.col("url") >= split)
    return incremental_entity_mapping(batch, existing)


def q_stream_kg(spark, sf_dir):
    # STREAMING e2e KG construction: two "days" of pages (doc_id < 300 /
    # >= 300 — the same split as incr_mapping) land as two files whose
    # mtimes pin the batch order; ONE Trigger.AvailableNow run with
    # maxFilesPerTrigger=1 processes them as micro-batches 0 and 1 through
    # stream_incremental_kg's persisted-mapping pipeline (batch 0 builds
    # the mapping, batch 1 extends it incrementally — O(batch), the old
    # corpus is never re-read). Output = the per-batch edge multiset; the
    # oracle replays the full chain in SQL: day-1 mapping CTEs (counts
    # filtered to doc_id < 300), the adopt/new-group incremental rules,
    # then each batch's triples applied through ITS mapping version.
    import glob
    import os
    import shutil
    import tempfile

    from ai_knowledge_graph_spark.streaming.ingest import stream_incremental_kg

    root = tempfile.mkdtemp(prefix="qstream_kg_")
    pages = f"{root}/pages"
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        for df, mt in (
            (docs.filter(F.col("doc_id") < 300), 1_000_000_000),
            (docs.filter(F.col("doc_id") >= 300), 1_000_100_000),
        ):
            before = set(glob.glob(f"{pages}/part-*"))
            (
                df.select(
                    F.format_string("doc%012d", "doc_id").alias("url"),
                    "text",
                    # constant: the stream's lang gate must pass every doc,
                    # exactly as the oracle's replay over `documents` does
                    F.lit("en").alias("lang"),
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(pages)
            )
            for f in set(glob.glob(f"{pages}/part-*")) - before:
                os.utime(f, (mt, mt))
        stream_incremental_kg(
            spark,
            pages,
            f"{root}/state",
            f"{root}/ckpt",
            chunk_size=CHUNK_SIZE,
            overlap=OVERLAP,
            max_files_per_trigger=1,
        )
        out = (
            spark.read.parquet(f"{root}/state/edges")
            .groupBy(
                F.col("batch").cast("int").alias("batch"),
                "subject",
                "predicate",
                "object",
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def q_anchor_mentions(spark, sf_dir):
    # Anchor-text entity linking: synthesized pages whose anchor texts are
    # the 1st/3rd words of each doc (so they hit the KG's variant space),
    # extracted + matched against the SAME entity-standardization mapping
    # the triples pipeline resolves. Oracle composes the full mapping CTE
    # chain with arithmetic expected anchors — html is never parsed there.
    from ai_knowledge_graph_spark.operators.standardize import (
        build_entity_mapping,
    )
    from ai_knowledge_graph_spark.operators.webcrawl import (
        anchor_entity_mentions,
        extract_links,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))
    # guard (mirrored in the oracle's dw CTE): a <3-word doc would NULL
    # element_at(ws, 3) and thus the whole concat, silently dropping BOTH
    # anchors engine-side while the oracle's UNION branch for ws[1] stays
    docs = docs.filter(F.size(ws) >= 3)
    url = F.concat(
        F.lit("https://host"), s(d % 7), F.lit(".example.com/p"), s(d),
        F.lit(".html"),
    )
    html = F.concat(
        F.lit('<html><body><a href="/t'), s((d + 1) % 50),
        F.lit('.html">'), F.element_at(ws, 1), F.lit("</a>"),
        F.lit('<a href="/t'), s((d + 7) % 50),
        F.lit('.html">'), F.element_at(ws, 3), F.lit("</a></body></html>"),
    )
    pages = docs.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    links = extract_links(pages)
    mapping = build_entity_mapping(
        _raw_triples(spark, sf_dir), tie_order="lexicographic"
    )
    return anchor_entity_mentions(links, mapping)


def q_pq_topk(spark, sf_dir):
    # Product-quantization ANN (Jégou et al. 2011): hash-seeded codebooks,
    # 4 subspaces x 16 centroids, asymmetric-distance top-5 in exact int64
    # micro-units (compressed-domain path, rerank=0 = the oracle mode).
    from ai_knowledge_graph_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk(emb, q, k=5, m=4, ksub=16)


def _pq_oracle_sql(m: int = 4, dsub: int = 16, ksub: int = 16, k: int = 5) -> str:
    js = ", ".join(f"({j})" for j in range(m))
    return f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), buck AS (
  SELECT vec_id,
    CAST((('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % {ksub}) AS INT) AS b
  FROM base
), reps AS (SELECT b AS centroid_id, min(vec_id) AS rid FROM buck GROUP BY 1),
sub AS MATERIALIZED (
  SELECT r.centroid_id, s.j, list_slice(b.v, s.j * {dsub} + 1, (s.j + 1) * {dsub}) AS c
  FROM reps r JOIN base b ON b.vec_id = r.rid, (VALUES {js}) AS s(j)
), nsub AS MATERIALIZED (
  SELECT vec_id, s.j, list_slice(v, s.j * {dsub} + 1, (s.j + 1) * {dsub}) AS nv
  FROM base, (VALUES {js}) AS s(j)
), dists AS MATERIALIZED (
  SELECT n.vec_id, n.j, c.centroid_id,
    CAST(round((list_dot_product(n.nv, n.nv) - 2 * list_dot_product(n.nv, c.c)
                + list_dot_product(c.c, c.c)) * 1e6) AS BIGINT) AS dm
  FROM nsub n JOIN sub c ON c.j = n.j
), codes AS MATERIALIZED (
  SELECT vec_id, j, centroid_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY dm, centroid_id) AS pr
    FROM dists) WHERE pr = 1
), adc AS MATERIALIZED (
  SELECT qd.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(qd.dm) AS BIGINT) AS adc_micro
  FROM codes c
  JOIN dists qd ON qd.j = c.j AND qd.centroid_id = c.code AND qd.vec_id < 5
  WHERE c.vec_id <> qd.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_micro, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_micro, neighbor_id) AS rk
  FROM adc) WHERE rk <= {k}"""


def q_ivfpq_topk(spark, sf_dir):
    # IVF-PQ composed ANN (the FAISS-standard scale index): coarse hash-
    # seeded quantizer -> residual PQ codes per inverted list -> per-
    # (query, probed-list) ADC tables over the query residual. All exact
    # int64 micro-units end to end, so the full composition is hash-gated.
    from ai_knowledge_graph_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    return ivfpq_topk(
        emb, q, k=5, nlist=8, n_probe=2, m=4, ksub=16
    ).select("query_id", "neighbor_id", "adc_micro", "rk")


def _ivfpq_oracle_sql(
    nlist: int = 8,
    n_probe: int = 2,
    m: int = 4,
    dsub: int = 16,
    ksub: int = 16,
    k: int = 5,
    dim: int = 64,
) -> str:
    js = ", ".join(f"({j})" for j in range(m))
    # NB single outer paren pair: DuckDB's CAST parser rejects
    # CAST((((x))::T % n) AS INT) with an extra wrap
    h = "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT"
    micro = (
        "CAST(round((list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b})) * 1e6) AS BIGINT)"
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cbuck AS (
  SELECT vec_id, CAST(({h} % {nlist}) AS INT) AS b FROM base
), creps AS (SELECT b AS centroid_id, min(vec_id) AS rid FROM cbuck GROUP BY 1),
cents AS MATERIALIZED (
  SELECT r.centroid_id, b.v AS c FROM creps r JOIN base b ON b.vec_id = r.rid
), cdists AS MATERIALIZED (
  SELECT n.vec_id, c.centroid_id, {micro.format(a='n.v', b='c.c')} AS dm
  FROM base n CROSS JOIN cents c
), cassign AS MATERIALIZED (
  SELECT vec_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dm, centroid_id) AS pr
    FROM cdists) WHERE pr = 1
), rbase AS MATERIALIZED (
  SELECT a.vec_id, a.centroid_id,
    list_transform(range(1, {dim + 1}), i -> b.v[i] - c.c[i]) AS rv
  FROM cassign a JOIN base b USING (vec_id) JOIN cents c USING (centroid_id)
), rbuck AS (
  SELECT vec_id, CAST(({h} % {ksub}) AS INT) AS b FROM base
), rreps AS (SELECT b AS code_id, min(vec_id) AS rid FROM rbuck GROUP BY 1),
rsub AS MATERIALIZED (
  SELECT r.code_id, s.j, list_slice(rb.rv, s.j * {dsub} + 1, (s.j + 1) * {dsub}) AS c
  FROM rreps r JOIN rbase rb ON rb.vec_id = r.rid, (VALUES {js}) AS s(j)
), nsub AS MATERIALIZED (
  SELECT vec_id, centroid_id, s.j,
         list_slice(rv, s.j * {dsub} + 1, (s.j + 1) * {dsub}) AS nv
  FROM rbase, (VALUES {js}) AS s(j)
), ndists AS MATERIALIZED (
  SELECT n.vec_id, n.centroid_id, n.j, c.code_id,
         {micro.format(a='n.nv', b='c.c')} AS dm
  FROM nsub n JOIN rsub c ON c.j = n.j
), codes AS MATERIALIZED (
  SELECT vec_id, centroid_id, j, code_id AS code FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY dm, code_id) AS pr
    FROM ndists) WHERE pr = 1
), qprobe AS MATERIALIZED (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dm, centroid_id) AS pr
    FROM cdists WHERE vec_id < 5) WHERE pr <= {n_probe}
), qr AS MATERIALIZED (
  SELECT p.query_id, p.centroid_id,
    list_transform(range(1, {dim + 1}), i -> b.v[i] - c.c[i]) AS qrv
  FROM qprobe p JOIN base b ON b.vec_id = p.query_id JOIN cents c USING (centroid_id)
), qsub AS MATERIALIZED (
  SELECT query_id, centroid_id, s.j,
         list_slice(qrv, s.j * {dsub} + 1, (s.j + 1) * {dsub}) AS qv
  FROM qr, (VALUES {js}) AS s(j)
), qdists AS MATERIALIZED (
  SELECT q.query_id, q.centroid_id, q.j, c.code_id,
         {micro.format(a='q.qv', b='c.c')} AS dm
  FROM qsub q JOIN rsub c ON c.j = q.j
), adc AS MATERIALIZED (
  SELECT qd.query_id, c.vec_id AS neighbor_id, CAST(SUM(qd.dm) AS BIGINT) AS adc_micro
  FROM codes c
  JOIN qdists qd ON qd.centroid_id = c.centroid_id AND qd.j = c.j
                AND qd.code_id = c.code
  WHERE c.vec_id <> qd.query_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_micro, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_micro, neighbor_id) AS rk
  FROM adc) WHERE rk <= {k}"""


def q_bpe_merges(spark, sf_dir):
    # Distributed BPE training (Sennrich et al. 2016), 8 merges over the
    # documents corpus. The double-separator string representation makes the
    # merge step a plain string replace with EXACT BPE semantics on both
    # engines, so even this iterative operator is hash-gated (the oracle
    # unrolls 8 rounds with MATERIALIZED CTEs, pagerank-style).
    from ai_knowledge_graph_spark.operators.tokenizer import train_bpe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    return train_bpe(docs, n_merges=8)


def q_bpe_encode(spark, sf_dir):
    # Tokenization APPLY: train 8 merges on the corpus, then encode every
    # document with the learned table (the train->encode->pack story's
    # middle step) via the PRODUCTION encoder — broadcast merge-rank dict
    # + Arrow pandas UDF over the distinct vocabulary, linear in tokens and
    # independent of K (bpe_encode's K-deep replace chain is the
    # validation twin, parity-pinned in tests). Output is hash-gated:
    # per-doc token count + sha256 of the chr(31)-joined token stream; the
    # oracle re-derives the merge table with the same unrolled CTE chain as
    # bpe_merges and replays the 8 replaces over each doc's word sequence
    # in position order — rank-order replay == min-rank loop (see
    # tokenizer.encode_word docstring).
    from ai_knowledge_graph_spark.operators.tokenizer import (
        SEP,
        bpe_encode_ranked,
        train_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    merges = train_bpe(docs.select("text"), n_merges=8)
    enc = bpe_encode_ranked(docs, merges)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.sha2(F.array_join("tokens", SEP), 256).alias("tokens_sha"),
    )


def _bpe_chain_parts(k: int) -> list[str]:
    """Shared unrolled-training prelude: CTEs w0, r0..r{k}, p0.., b0..b{k-1}."""
    sep = "chr(31)"
    sep2 = "(chr(31) || chr(31))"
    parts = [
        f"""
WITH w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS wcount FROM (
    SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '' AND NOT contains(x, chr(31)))) AS word
    FROM documents) GROUP BY word
), r0 AS MATERIALIZED (
  SELECT {sep2} || array_to_string(list_append(regexp_extract_all(word, '.'), '</w>'),
                                   {sep2}) || {sep2} AS rep,
         wcount
  FROM w0
)"""
    ]
    for i in range(k):
        parts.append(
            f""", p{i} AS MATERIALIZED (
  SELECT syms[i] || {sep} || syms[i + 1] AS pair, SUM(wcount) AS c FROM (
    SELECT syms, wcount, unnest(range(1, len(syms))) AS i FROM (
      SELECT list_filter(string_split(rep, {sep2}), x -> x <> '') AS syms, wcount
      FROM r{i}))
  GROUP BY 1
), b{i} AS MATERIALIZED (
  SELECT {i} AS merge_rank,
         string_split(pair, {sep})[1] AS lhs,
         string_split(pair, {sep})[2] AS rhs,
         CAST(c AS BIGINT) AS pair_count
  FROM p{i} ORDER BY c DESC, pair LIMIT 1
), r{i + 1} AS MATERIALIZED (
  SELECT replace(rep, {sep} || b.lhs || {sep2} || b.rhs || {sep},
                      {sep} || b.lhs || b.rhs || {sep}) AS rep, wcount
  FROM r{i}, b{i} b
)"""
        )
    return parts


def _bpe_oracle_sql(k: int = 8) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(merge_rank AS INTEGER) AS merge_rank, lhs, rhs, pair_count FROM b{i}"
        for i in range(k)
    )
    return "".join(_bpe_chain_parts(k)) + "\n" + union


def _bpe_encode_oracle_sql(k: int = 8) -> str:
    """bpe_merges' training chain + a per-document replay of the k merges
    over each word in position order (docs with zero words drop out, like
    the engine's explode->groupBy)."""
    sep = "chr(31)"
    sep2 = "(chr(31) || chr(31))"
    parts = list(_bpe_chain_parts(k))
    parts.append(
        f""", dwords AS MATERIALIZED (
  SELECT doc_id, words FROM (
    SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '' AND NOT contains(x, chr(31))) AS words
    FROM documents)
  WHERE len(words) > 0
), e0 AS MATERIALIZED (
  SELECT doc_id, i AS pos,
         {sep2} || array_to_string(list_append(regexp_extract_all(words[i], '.'), '</w>'),
                                   {sep2}) || {sep2} AS rep
  FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM dwords)
)"""
    )
    for i in range(k):
        parts.append(
            f""", e{i + 1} AS MATERIALIZED (
  SELECT doc_id, pos,
         replace(rep, {sep} || b.lhs || {sep2} || b.rhs || {sep},
                      {sep} || b.lhs || b.rhs || {sep}) AS rep
  FROM e{i}, b{i} b
)"""
        )
    parts.append(
        f"""
SELECT doc_id,
       CAST(SUM(len(syms)) AS BIGINT) AS n_tokens,
       sha256(string_agg(array_to_string(syms, {sep}), {sep} ORDER BY pos)) AS tokens_sha
FROM (SELECT doc_id, pos,
             list_filter(string_split(rep, {sep2}), x -> x <> '') AS syms
      FROM e{k})
GROUP BY doc_id"""
    )
    return "".join(parts)


def _bpe_eval_oracle_sql(k: int = 8) -> str:
    """The encode chain of _bpe_encode_oracle_sql with a corpus-level
    compression-stats final select (bpe_eval's oracle)."""
    sep2 = "(chr(31) || chr(31))"
    full = _bpe_encode_oracle_sql(k)
    head = full[: full.rindex("\nSELECT doc_id,")]
    return head + f""",
wstats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(words)) AS BIGINT) AS n_words,
         CAST(sum(list_sum(list_transform(words, w -> len(w)))) AS BIGINT)
           AS n_chars
  FROM dwords
),
tstats AS (
  SELECT CAST(sum(len(list_filter(string_split(rep, {sep2}), x -> x <> '')))
              AS BIGINT) AS n_tokens
  FROM e{k}
)
SELECT w.n_docs, w.n_words, w.n_chars, t.n_tokens,
       CAST((t.n_tokens * 1000000) // w.n_words AS BIGINT)
         AS tokens_per_word_ppm,
       CAST((w.n_chars * 1000000) // t.n_tokens AS BIGINT)
         AS chars_per_token_ppm
FROM wstats w, tstats t"""


def q_c4(spark, sf_dir):
    # C4 cleaning rules (Raffel et al. 2020 §2.2): line retention + page
    # gates. The fixture text has no line/punctuation structure, so it is
    # synthesized deterministically JVM-side (word slices + doc_id-keyed
    # terminal marks / rule-triggering injections); the oracle rebuilds the
    # same text with the same SQL and applies its own independent DuckDB
    # list-op rule implementation.
    from ai_knowledge_graph_spark.operators.textstats import c4_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != F.lit(""))

    def j(a, n):
        return F.array_join(F.slice(ws, a, n), " ")

    m = F.col("doc_id") % 3
    l1 = F.concat(j(1, 8), F.lit("."))
    l2 = F.concat(
        j(9, 8), F.when(m == 0, F.lit("!")).when(m == 1, F.lit("?")).otherwise(F.lit(""))
    )
    l3 = F.concat(j(17, 3), F.lit("."))
    l4 = F.when(
        F.col("doc_id") % 7 == 0,
        F.lit("Please enable javascript to view this page."),
    ).otherwise(
        F.concat(
            j(20, 6),
            F.when(F.col("doc_id") % 2 == 0, F.lit(".")).otherwise(F.lit("")),
        )
    )
    l5 = (
        F.when(
            F.col("doc_id") % 37 == 0,
            F.lit("Lorem ipsum dolor sit amet consectetur adipiscing."),
        )
        .when(F.col("doc_id") % 41 == 0, F.lit("function f() { return 1; }"))
        .when(
            F.col("doc_id") % 43 == 0,
            F.lit("buy spamword pills online right now."),
        )
        .otherwise(F.concat(j(26, 7), F.lit('"')))
    )
    pages = docs.select(
        "doc_id", F.concat_ws("\n", l1, l2, l3, l4, l5).alias("text")
    )
    out = c4_rules(pages)
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "has_lorem",
        "has_brace",
        "has_bad_word",
        "c4_pass",
        F.sha2("clean_text", 256).alias("clean_sha256"),
    )


def q_winnow(spark, sf_dir):
    # MOSS winnowing fingerprints: k=5 grams, window=4, rightmost-min.
    from ai_knowledge_graph_spark.operators.textstats import (
        winnow_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = winnow_fingerprints(docs, k=5, window=4)
    return out.select("doc_id", F.col("pos").cast("long").alias("pos"), "fp_hash")


def q_exact_substring(spark, sf_dir):
    # Lee-et-al. ExactSubstr dedup over the documents table: every token
    # position covered by a 12-token window occurring >= 2x corpus-wide is
    # removed; cleaned text + removal stats per doc.
    from ai_knowledge_graph_spark.operators.curation import (
        exact_substring_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return exact_substring_dedup(docs, k=12, min_count=2)


def q_trustrank(spark, sf_dir):
    # Personalized PageRank from a deterministic hash-selected seed set
    # (TrustRank shape): teleport restricted to ~1/7 of the node set.
    from ai_knowledge_graph_spark.graph.centrality import (
        personalized_pagerank,
    )

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(
        F.conv(F.substring(F.md5("node"), 1, 8), 16, 10).cast("long") % 7 == 0
    )
    out = personalized_pagerank(edges, seeds, damping=0.85, iterations=5)
    return out.select("entity", F.round("pagerank", 6).alias("pagerank"))


def q_kcore(spark, sf_dir):
    # 2-core of the standardized KG (undirected simple graph): iterative
    # peel to fixpoint. k=2 strips the tree fringe and keeps the cyclic
    # backbone (non-empty at both oracle SFs; the 3-core is empty).
    from ai_knowledge_graph_spark.graph.centrality import k_core

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return k_core(edges, k=2)


def q_lm_perplexity(spark, sf_dir):
    # CCNet-style LM gate: add-one bigram self-perplexity per document +
    # exact rank-tertile head/middle/tail bucket. All counts int64; the
    # only floats are the final ln()/divide, rounded to 6 on both engines.
    from ai_knowledge_graph_spark.operators.lm import lm_perplexity

    return lm_perplexity(_docs(spark, sf_dir))


BM25_QUERY = ["spark", "window", "merge"]


def q_bm25(spark, sf_dir):
    # Okapi BM25 top-50 lexical retrieval; query-term filter applied before
    # any aggregation so the plan is query-sized past the token explode.
    from ai_knowledge_graph_spark.operators.ranking import bm25_rank

    return bm25_rank(_docs(spark, sf_dir), BM25_QUERY, top_n=50)


def q_hybrid_rrf(spark, sf_dir):
    # Hybrid retrieval: RRF-fuse BM25 top-50 (lexical) with cosine top-50
    # around vec 0 (dense). Both ranks computed on rounded scores with id
    # tiebreaks, so rank parity with the oracle is exact; the rank windows
    # run over 50-row result lists (bounded by construction).
    from pyspark.sql import Window

    from ai_knowledge_graph_spark.operators.ranking import bm25_rank, rrf_fuse
    from ai_knowledge_graph_spark.operators.similarity import cosine_topk

    lex = bm25_rank(_docs(spark, sf_dir), BM25_QUERY, top_n=50)
    lex_r = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("rank"),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    vec = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=50)
    vec_r = vec.select(F.col("neighbor_id").alias("doc_id"), F.col("rk").alias("rank"))
    return rrf_fuse([lex_r, vec_r], k=60)


def q_triangles(spark, sf_dir):
    # per-node triangle counts + local clustering coefficient over the
    # standardized KG edges (degree-oriented wedge join, skew-bounded).
    from ai_knowledge_graph_spark.graph.centrality import triangle_counts

    std = _std_triples(spark, sf_dir, INFER_DOCS)
    edges = std.select(F.col("subject").alias("src"), F.col("object").alias("dst"))
    return triangle_counts(edges)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER POLICY (round 5): the driver's correctness artifact windows
    # the FIRST 50 dict entries. Round 5 dedicates the window to the
    # never-driver-certified backlog (94 queries green only in builder/
    # judge sweeps), highest value first, plus llr_keywords whose
    # semantics changed this round. Every query keeps an oracle either
    # way; COVERAGE.md carries the query -> certifying-round ledger.
    return {
        # -- ROUND-5 WINDOW: never driver-certified backlog, highest value
        # first (north-rule composition, LLM-curation canon, streaming,
        # kgops, graph analytics), plus the queries whose semantics
        # changed this round (embedding_pool long form, paragraph_dedup
        # struct-min key, llr_keywords one-sided gate)
        "e2e_crawl_kg": q_e2e_crawl_kg,
        "embedding_pool": q_embedding_pool,
        "exact_substring": q_exact_substring,
        "semdedup": q_semdedup,
        "dsir_weights": q_dsir_weights,
        "c4": q_c4,
        "gopher": q_gopher,
        "decontaminate": q_decontaminate,
        "line_dedup": q_line_dedup,
        "mix_corpus": q_mix_corpus,
        "pack_sequences": q_pack_sequences,
        "paragraph_dedup": q_paragraph_dedup,
        "llr_keywords": q_llr_keywords,
        "stream_kg": q_stream_kg,
        "frontier": q_frontier,
        "ivfpq_topk": q_ivfpq_topk,
        "rule_mining": q_rule_mining,
        "fact_fusion": q_fact_fusion,
        "kg_diff": q_kg_diff,
        "entity_roles": q_entity_roles,
        "quantiles": q_quantiles,
        "hearst": q_hearst,
        "cdc_chunks": q_cdc_chunks,
        "knn_classify": q_knn_classify,
        "taxonomy": q_taxonomy,
        "mis": q_mis,
        "modularity": q_modularity,
        "scc": q_scc,
        "funnel": q_funnel,
        "retention": q_retention,
        "readability": q_readability,
        "rake": q_rake,
        "recrawl": q_recrawl,
        "pagerank": q_pagerank,
        "bm25": q_bm25,
        "hits": q_hits,
        "kcore": q_kcore,
        "trustrank": q_trustrank,
        "triangles": q_triangles,
        "lm_perplexity": q_lm_perplexity,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "pq_topk": q_pq_topk,
        "classifier_score": q_classifier_score,
        "pii_redact": q_pii_redact,
        "dsir_sample": q_dsir_sample,
        "stream_sessions": q_stream_sessions,
        "stream_late": q_stream_late,
        "curate_corpus": q_curate_corpus,
        "canonical_crawl": q_canonical_crawl,
        # -- remaining never-driver-certified backlog (judge-r4 green)
        "entity_trends": q_entity_trends,
        "anchor_corpus": q_anchor_corpus,
        "host_boilerplate": q_host_boilerplate,
        "inverted_index": q_inverted_index,
        "link_predict": q_link_predict,
        "containment": q_containment,
        "assortativity": q_assortativity,
        "hyperball": q_hyperball,
        "node2vec": q_node2vec,
        "ktruss": q_ktruss,
        "url_templates": q_url_templates,
        "ontology_check": q_ontology_check,
        "harmonic": q_harmonic,
        "ppr": q_ppr,
        "cocite": q_cocite,
        "bibcouple": q_bibcouple,
        "triple_history": q_triple_history,
        "redirects": q_redirects,
        "sitemap": q_sitemap,
        "kg_negatives": q_kg_negatives,
        "kg_pattern": q_kg_pattern,
        "entity_summary": q_entity_summary,
        "snapshot_diff": q_snapshot_diff,
        "repetition_stats": q_repetition_stats,
        "domain_stats": q_domain_stats,
        "asof_purchase_signup": q_asof_purchase_signup,
        "sessions": q_sessions,
        "event_windows": q_event_windows,
        "stratified_sample": q_stratified_sample,
        "hash_split": q_hash_split,
        "corpus_cube": q_corpus_cube,
        "winnow": q_winnow,
        "link_graph": q_link_graph,
        "anchor_mentions": q_anchor_mentions,
        "incr_mapping": q_incr_mapping,
        "entity_pmi": q_entity_pmi,
        "tfidf": q_tfidf,
        "host_graph": q_host_graph,
        "robots": q_robots,
        "scd2": q_scd2,
        "hybrid_rrf": q_hybrid_rrf,
        "exact_substring_incr": q_exact_substring_incr,
        "sketch_bloom": q_sketch_bloom,
        "sketch_cms": q_sketch_cms,
        "sketch_hll": q_sketch_hll,
        # -- round-5 additions (post-window by design: the round-5 window
        # is reserved for the certification backlog; these are covered by
        # test_entry + test_driver_canon + the sweep until a future window)
        "kg_distmult": q_kg_distmult,
        "kg_mrr": q_kg_mrr,
        "ntriples": q_ntriples,
        "property_path": q_property_path,
        "kg_align": q_kg_align,
        "kg_shacl": q_kg_shacl,
        "kg_complex": q_kg_complex,
        # -- driver-certified round 4
        "hard_negatives": q_hard_negatives,
        "degree_dist": q_degree_dist,
        "itemsets": q_itemsets,
        "sentiment": q_sentiment,
        "quality_pct": q_quality_pct,
        "next_word": q_next_word,
        "community_profile": q_community_profile,
        "snm_pairs": q_snm_pairs,
        "distinct_curve": q_distinct_curve,
        "uncertain": q_uncertain,
        "host_dup": q_host_dup,
        "convert_latency": q_convert_latency,
        "topo_layers": q_topo_layers,
        "novelty": q_novelty,
        "embedding_qa": q_embedding_qa,
        "session_incidents": q_session_incidents,
        "char_entropy": q_char_entropy,
        "revenue_nation": q_revenue_nation,
        "rolling": q_rolling,
        "event_corr": q_event_corr,
        "topic_shift": q_topic_shift,
        "ab_lift": q_ab_lift,
        "lang_mismatch": q_lang_mismatch,
        "quantile_sketch": q_quantile_sketch,
        "split_leakage": q_split_leakage,
        "range_join": q_range_join,
        "pred_symmetry": q_pred_symmetry,
        "pred_inverse": q_pred_inverse,
        "bpe_eval": q_bpe_eval,
        "outliers": q_outliers,
        "coverage": q_coverage,
        "katz": q_katz,
        "shards": q_shards,
        "collocations": q_collocations,
        "blocklist": q_blocklist,
        "zipf": q_zipf,
        "qlm": q_qlm,
        "session_paths": q_session_paths,
        "ndcg": q_ndcg,
        "er_eval": q_er_eval,
        "summarize": q_summarize,
        "textrank": q_textrank,
        "fuzzy_pairs": q_fuzzy_pairs,
        "markov": q_markov,
        "transe": q_transe,
        "profile": q_profile,
        "random_walks": q_random_walks,
        "lpa": q_lpa,
        # -- driver-certified rounds 2-3
        "near_dup_groups": q_near_dup_groups,
        "minhash_dedup_docs": q_minhash_dedup_docs,
        "multimodal_stats": q_multimodal_stats,
        "html_extract": q_html_extract,
        "latest_crawl": q_latest_crawl,
        "rag_retrieve": q_rag_retrieve,
        "training_qa_v3": q_training_qa_v3,
        "embedding_near_dup": q_embedding_near_dup,
        "stream_dedup": q_stream_dedup,
        # -- driver-certified round 1 (the long-stable core)
        "chunks": q_chunks,
        "chunk_stats": q_chunk_stats,
        "triples_raw": q_triples_raw,
        "predicate_histogram": q_predicate_histogram,
        "entity_counts": q_entity_counts,
        "unique_entities": q_unique_entities,
        "entity_mapping": q_entity_mapping,
        "standardize": q_standardize,
        "transitive": q_transitive,
        "lexical": q_lexical,
        "infer_full": q_infer_full,
        "components": q_components,
        "degree": q_degree,
        "graph_stats": q_graph_stats,
        "clean_graph": q_clean_graph,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "quality_score": q_quality_score,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "embedding_topk": q_embedding_topk,
        "lang_id": q_lang_id,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "fingerprint": q_fingerprint,
        "srp_topk": q_srp_topk,
        "neighbors": q_neighbors,
        "khop": q_khop,
        "shortest_dist": q_shortest_dist,
        "search": q_search,
        "related_concepts": q_related_concepts,
        "concepts": q_concepts,
        "term_relevance": q_term_relevance,
        "candidate_pairs": q_candidate_pairs,
        "context_triples": q_context_triples,
        "relation_cap": q_relation_cap,
        "corpus_dedup": q_corpus_dedup,
        "model_scores": q_model_scores,
        "training_qa": q_training_qa,
        "ivf_topk": q_ivf_topk,
    }


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

def _arr(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(words)) + "]"


_VERBS = _arr(RELATION_VERBS)
_FW = _arr(PREDICATE_FUNCTION_WORDS)
_PSTOP = _arr(PREDICATE_TRAILING_STOPWORDS)
_NSTOP = _arr(NORMALIZE_STOPWORDS)


def _w(expr: str) -> str:
    """Non-empty whitespace tokens of a string expression."""
    return f"list_filter(regexp_split_to_array({expr}, '\\s+'), w -> w <> '')"


def _trunc(expr: str) -> str:
    """limit_predicate_length as SQL (entity_standardization.py:7-31)."""
    w = _w(expr)
    return (
        f"(CASE WHEN len({w}) <= 3 THEN {expr} "
        f"WHEN list_contains({_PSTOP}, lower(({w})[3])) THEN array_to_string(({w})[1:2], ' ') "
        f"ELSE array_to_string(({w})[1:3], ' ') END)"
    )


# Recursive replay of the reference chunker (text_utils.py:5-46) + the
# deterministic extractor, shared prelude for every KG oracle query.
def _prelude(doc_filter: str = "TRUE") -> str:
    return f"""
WITH RECURSIVE doc_words AS (
  SELECT doc_id, text, {_w('text')} AS ws, len({_w('text')}) AS n
  FROM documents WHERE {doc_filter}
),
st AS (
  SELECT doc_id, ws, n, 0 AS start, 1 AS cid, FALSE AS is_tail
  FROM doc_words WHERE n > {CHUNK_SIZE}
  UNION ALL
  SELECT doc_id, ws, n,
         least(start + {CHUNK_SIZE}, n) - {OVERLAP},
         cid + 1,
         (least(start + {CHUNK_SIZE}, n) - {OVERLAP} + {CHUNK_SIZE} - {OVERLAP} >= n)
  FROM st
  WHERE NOT is_tail AND least(start + {CHUNK_SIZE}, n) - {OVERLAP} < n
),
chunks AS (
  SELECT doc_id, 1 AS chunk_id, text AS chunk_text, n AS n_words
  FROM doc_words WHERE n <= {CHUNK_SIZE}
  UNION ALL
  SELECT doc_id, cid,
         array_to_string(ws[start + 1 : least(start + {CHUNK_SIZE}, n)], ' '),
         least(start + {CHUNK_SIZE}, n) - start
  FROM st
),
sentences AS (
  SELECT doc_id, chunk_id,
         unnest(regexp_split_to_array(chunk_text, '[.!?]+')) AS sentence,
         generate_subscripts(regexp_split_to_array(chunk_text, '[.!?]+'), 1) AS si
  FROM chunks
),
sent_toks AS (
  SELECT doc_id, chunk_id, si, {_w('sentence')} AS t, len({_w('sentence')}) AS nt
  FROM sentences
),
verbed AS (
  SELECT *, list_min(list_filter(
      list_transform(t, (w, i) -> CASE WHEN list_contains({_VERBS}, lower(w)) THEN i END),
      v -> v IS NOT NULL)) AS vi
  FROM sent_toks
),
spans AS (
  SELECT doc_id, chunk_id, si, t, nt, vi, vi + f1 + f2 + f3 AS pe FROM (
    SELECT *, CASE WHEN f2 = 1 AND nt >= vi + 3 AND list_contains({_FW}, lower(t[vi + 3])) THEN 1 ELSE 0 END AS f3 FROM (
      SELECT *, CASE WHEN f1 = 1 AND nt >= vi + 2 AND list_contains({_FW}, lower(t[vi + 2])) THEN 1 ELSE 0 END AS f2 FROM (
        SELECT *, CASE WHEN nt >= vi + 1 AND list_contains({_FW}, lower(t[vi + 1])) THEN 1 ELSE 0 END AS f1
        FROM verbed WHERE vi IS NOT NULL AND vi >= 2
      )
    )
  )
),
extracted AS (
  SELECT doc_id, chunk_id AS chunk, si,
    lower(array_to_string(t[greatest(1, vi - 4) : vi - 1], ' ')) AS subject,
    lower(array_to_string(t[vi : pe], ' ')) AS raw_predicate,
    lower(array_to_string(t[pe + 1 : least(nt, pe + 4)], ' ')) AS object
  FROM spans WHERE pe < nt
),
triples1 AS (
  SELECT doc_id, chunk,
    row_number() OVER (PARTITION BY doc_id, chunk ORDER BY si) - 1 AS t_idx,
    subject, {_trunc('raw_predicate')} AS predicate, object
  FROM extracted
)
"""


_PRELUDE = _prelude()
_PRELUDE_INFER = _prelude(f"doc_id < {INFER_DOCS}")

# Phase-2 standardization in SQL (entity_standardization.py:33-181).
_STD_CTES = f"""
, counts AS (
  SELECT e AS entity, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT lower(subject) AS e FROM triples1
    UNION ALL SELECT lower(object) FROM triples1
  ) GROUP BY 1
),
grouped AS (
  SELECT * FROM (
    SELECT entity, cnt,
      array_to_string(list_filter(regexp_extract_all(lower(entity), '\\w+'),
                      w -> NOT list_contains({_NSTOP}, w)), ' ') AS norm
    FROM counts
  ) WHERE norm <> ''
),
winners AS (
  SELECT norm, entity AS standard FROM (
    SELECT *, row_number() OVER (PARTITION BY norm ORDER BY cnt DESC, length(entity) ASC, entity ASC) AS rn
    FROM grouped
  ) WHERE rn = 1
),
first_map AS (
  SELECT g.entity AS variant, w.standard FROM grouped g JOIN winners w USING (norm)
),
formf AS (
  SELECT form,
    list_distinct({_w('form')}) AS words,
    list_distinct(list_transform(list_filter({_w('form')}, w -> length(w) > 4), w -> w[1:4])) AS stems,
    length(form) AS clen,
    row_number() OVER (ORDER BY length(form), form) AS rnk
  FROM (SELECT DISTINCT standard AS form FROM first_map)
),
pair_flags AS (
  SELECT a.form AS f1, a.clen AS l1, a.rnk AS r1, b.form AS f2, b.clen AS l2, b.rnk AS r2,
    (len(list_filter(a.words, x -> NOT list_contains(b.words, x))) = 0 AND len(a.words) > 0) AS sub12,
    (len(list_filter(b.words, x -> NOT list_contains(a.words, x))) = 0 AND len(b.words) > 0) AS sub21,
    (len(list_intersect(a.stems, b.stems)) > 0 AND
     CAST(len(list_intersect(a.stems, b.stems)) AS DOUBLE) / greatest(len(a.stems), len(b.stems)) > 0.5) AS stemhit
  FROM formf a JOIN formf b ON a.rnk < b.rnk
),
assigned AS (
  SELECT r1, r2,
    CASE WHEN sub12 THEN f2 WHEN sub21 THEN f1
         WHEN stemhit AND l1 <= l2 THEN f2 WHEN stemhit THEN f1 END AS key,
    CASE WHEN sub12 THEN f1 WHEN sub21 THEN f2
         WHEN stemhit AND l1 <= l2 THEN f1 WHEN stemhit THEN f2 END AS value
  FROM pair_flags
  WHERE sub12 OR sub21 OR stemhit
),
second AS (
  SELECT key, value FROM (
    SELECT *, row_number() OVER (PARTITION BY key ORDER BY r1 DESC, r2 DESC) AS rn FROM assigned
  ) WHERE rn = 1
),
final_map AS (
  SELECT f.variant, coalesce(s.value, f.standard) AS standard
  FROM first_map f LEFT JOIN second s ON f.variant = s.key
),
std AS (
  SELECT * FROM (
    SELECT coalesce(ms.standard, t.subject) AS subject,
           {_trunc('t.predicate')} AS predicate,
           coalesce(mo.standard, t.object) AS object,
           coalesce(t.chunk, 0) AS chunk, t.doc_id, t.t_idx
    FROM triples1 t
    LEFT JOIN final_map ms ON lower(t.subject) = ms.variant
    LEFT JOIN final_map mo ON lower(t.object) = mo.variant
  ) WHERE subject <> object
)
"""

# Phase-3 inference in SQL (entity_standardization.py:183-352,661-752).
_INFER_CTES = f"""
, lastp AS (
  SELECT subject, object, predicate FROM (
    SELECT *, row_number() OVER (PARTITION BY subject, object ORDER BY doc_id DESC, chunk DESC, t_idx DESC) AS rn
    FROM std
  ) WHERE rn = 1
),
trans AS (
  SELECT DISTINCT e1.subject AS subject,
    {_trunc("(CASE WHEN e1.predicate = e2.predicate THEN 'indirectly ' || e1.predicate ELSE e1.predicate || ' via ' || e1.object END)")} AS predicate,
    e2.object AS object
  FROM lastp e1 JOIN lastp e2 ON e1.object = e2.subject
  WHERE e1.subject <> e2.object
    AND NOT EXISTS (SELECT 1 FROM lastp x WHERE x.subject = e1.subject AND x.object = e2.object)
),
ents AS (
  SELECT DISTINCT entity FROM (
    SELECT subject AS entity FROM std UNION ALL SELECT object FROM std)
),
entf AS (
  SELECT entity, lower(entity) AS elow,
    list_distinct({_w('lower(entity)')}) AS words
  FROM ents
),
lex_pairs AS (
  SELECT x.entity AS xe, x.elow AS xlow, y.entity AS ye, y.elow AS ylow,
    list_intersect(x.words, y.words) AS shared
  FROM entf x JOIN entf y ON x.entity < y.entity
  WHERE NOT EXISTS (
    SELECT 1 FROM lastp p
    WHERE (p.subject = x.entity AND p.object = y.entity)
       OR (p.subject = y.entity AND p.object = x.entity))
),
lex_scored AS (
  SELECT *,
    CASE WHEN len(shared) > 0 THEN
      list_max(list_filter(shared, w -> length(w) = list_max(list_transform(shared, x -> length(x)))))
    END AS mains
  FROM lex_pairs
),
lex AS (
  SELECT
    CASE WHEN big AND xs AND NOT ys THEN ye
         WHEN big AND ys AND NOT xs THEN xe
         WHEN big THEN xe
         WHEN nosh AND contains(ylow, xlow) THEN ye
         WHEN nosh AND contains(xlow, ylow) THEN xe END AS subject,
    CASE WHEN big AND (xs <> ys) THEN 'relates to'
         WHEN big THEN 'related to'
         WHEN nosh AND (contains(ylow, xlow) OR contains(xlow, ylow)) THEN 'is type of' END AS predicate,
    CASE WHEN big AND xs AND NOT ys THEN xe
         WHEN big AND ys AND NOT xs THEN ye
         WHEN big THEN ye
         WHEN nosh AND contains(ylow, xlow) THEN xe
         WHEN nosh AND contains(xlow, ylow) THEN ye END AS object
  FROM (
    SELECT *,
      (len(shared) > 0 AND length(mains) >= 4) AS big,
      (len(shared) = 0) AS nosh,
      (mains IS NOT NULL AND starts_with(xlow, mains)) AS xs,
      (mains IS NOT NULL AND starts_with(ylow, mains)) AS ys
    FROM lex_scored
  ) WHERE predicate IS NOT NULL
),
merged AS (
  SELECT subject, predicate, object, FALSE AS inferred, doc_id, chunk, t_idx FROM std
  UNION ALL
  SELECT subject, predicate, object, TRUE, NULL, NULL, NULL FROM trans
  UNION ALL
  SELECT subject, predicate, object, TRUE, NULL, NULL, NULL FROM lex
),
dedup AS (
  SELECT subject, {_trunc('predicate')} AS predicate, object, inferred FROM (
    SELECT *, row_number() OVER (
      PARTITION BY subject, predicate, object
      ORDER BY inferred ASC, doc_id DESC NULLS LAST, chunk DESC NULLS LAST, t_idx DESC NULLS LAST
    ) AS rn
    FROM merged
  ) WHERE rn = 1 AND subject <> object
)
"""



def _sql_cos(a: str, b: str) -> str:
    """DuckDB cosine that is BIT-IDENTICAL to the engine's fold: dot and
    norms accumulated left-to-right in DOUBLE (list_dot_product on DOUBLE[]),
    denominator as sqrt(na)*sqrt(nb). The builtin list_cosine_similarity
    accumulates in float32 and differs by ~1e-7 — enough to flip round(,6)
    at a .5 boundary (seen at sf0.01)."""
    return (
        f"(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))))"
    )


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    # The exact whitespace class Python's str.split() collapses, in RE2
    # syntax — mirrors sources/corpus.PY_WS_RUN so both sides hash Unicode
    # whitespace alike (used by corpus_dedup and stream_dedup).
    _pyws = (
        "[\\x{09}-\\x{0d}\\x{1c}-\\x{1f} \\x{85}\\x{a0}\\x{1680}"
        "\\x{2000}-\\x{200a}\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]+"
    )

    sql["chunks"] = (
        _PRELUDE
        + "SELECT doc_id, chunk_id, chunk_text, CAST(n_words AS INT) AS n_words FROM chunks"
    )
    sql["chunk_stats"] = _PRELUDE + """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_words) AS BIGINT) AS total_chunk_words,
       CAST(max(n_words) AS INT) AS max_chunk_words
FROM chunks GROUP BY doc_id"""
    sql["triples_raw"] = (
        _PRELUDE
        + "SELECT doc_id, CAST(chunk AS INT) AS chunk, CAST(t_idx AS INT) AS t_idx, subject, predicate, object FROM triples1"
    )
    sql["predicate_histogram"] = (
        _PRELUDE
        + "SELECT predicate, CAST(count(*) AS BIGINT) AS cnt FROM triples1 GROUP BY 1"
    )
    sql["entity_counts"] = _PRELUDE + """
SELECT e AS entity, CAST(count(*) AS BIGINT) AS cnt FROM (
  SELECT lower(subject) AS e FROM triples1 UNION ALL SELECT lower(object) FROM triples1
) GROUP BY 1"""
    sql["unique_entities"] = (
        _PRELUDE
        + "SELECT DISTINCT entity FROM (SELECT subject AS entity FROM triples1"
        + " UNION ALL SELECT object FROM triples1)"
    )
    sql["entity_mapping"] = _PRELUDE + _STD_CTES + "SELECT variant, standard FROM final_map"
    # incremental KG standardization: existing mapping = same CTE chain
    # with counts filtered to doc_id < 300; batch counts + adopt/new rules
    # replayed in independent SQL over the rest.
    _STD_CTES_EXISTING = _STD_CTES.replace(
        "SELECT lower(subject) AS e FROM triples1\n"
        "    UNION ALL SELECT lower(object) FROM triples1",
        "SELECT lower(subject) AS e FROM triples1 WHERE doc_id < 300\n"
        "    UNION ALL SELECT lower(object) FROM triples1 WHERE doc_id < 300",
    )
    assert "doc_id < 300" in _STD_CTES_EXISTING
    _norm = (
        "array_to_string(list_filter(regexp_extract_all(lower({e}), '\\w+'),"
        f" w -> NOT list_contains({_NSTOP}, w)), ' ')"
    )
    _INCR_CTES_BLOCK = f""", bcounts AS (
  SELECT e AS entity, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT lower(subject) AS e FROM triples1 WHERE doc_id >= 300
    UNION ALL SELECT lower(object) FROM triples1 WHERE doc_id >= 300
  ) GROUP BY 1
), bnorm AS (
  SELECT * FROM (
    SELECT entity, cnt, {_norm.format(e='entity')} AS norm FROM bcounts
  ) WHERE norm <> ''
), unknown AS (
  SELECT b.* FROM bnorm b LEFT JOIN final_map m ON b.entity = m.variant
  WHERE m.variant IS NULL
), exist_groups AS (
  SELECT norm, min(standard) AS standard FROM (
    SELECT {_norm.format(e='variant')} AS norm, standard FROM final_map
  ) WHERE norm <> '' GROUP BY 1
), adopted AS (
  SELECT u.entity AS variant, g.standard FROM unknown u
  JOIN exist_groups g USING (norm)
), fresh AS (
  SELECT u.* FROM unknown u LEFT JOIN exist_groups g USING (norm)
  WHERE g.norm IS NULL
), fresh_winners AS (
  SELECT norm, entity AS standard FROM (
    SELECT *, row_number() OVER (
      PARTITION BY norm ORDER BY cnt DESC, length(entity) ASC, entity ASC) AS rn
    FROM fresh
  ) WHERE rn = 1
), fresh_map AS (
  SELECT f.entity AS variant, w.standard FROM fresh f
  JOIN fresh_winners w USING (norm)
)"""
    sql["incr_mapping"] = (
        _PRELUDE + _STD_CTES_EXISTING + _INCR_CTES_BLOCK
        + """
SELECT variant, standard, 'existing' AS src FROM final_map
UNION ALL SELECT variant, standard, 'adopted' FROM adopted
UNION ALL SELECT variant, standard, 'new' FROM fresh_map"""
    )

    # streaming e2e: batch-0 edges through the day-1 mapping (the std CTE
    # of the EXISTING chain restricted to day-1 docs), batch-1 edges
    # through the incrementally-extended mapping (map2), same application
    # semantics (lookup miss keeps original case, predicate truncation,
    # self-loop drop) — multiset-compared per batch.
    sql["stream_kg"] = (
        _PRELUDE + _STD_CTES_EXISTING + _INCR_CTES_BLOCK
        + f""", map2 AS (
  SELECT variant, standard FROM final_map
  UNION ALL SELECT variant, standard FROM adopted
  UNION ALL SELECT variant, standard FROM fresh_map
), b0 AS (
  SELECT subject, predicate, object FROM std WHERE doc_id < 300
), b1 AS (
  SELECT * FROM (
    SELECT coalesce(ms.standard, t.subject) AS subject,
           {_trunc('t.predicate')} AS predicate,
           coalesce(mo.standard, t.object) AS object
    FROM triples1 t
    LEFT JOIN map2 ms ON lower(t.subject) = ms.variant
    LEFT JOIN map2 mo ON lower(t.object) = mo.variant
    WHERE t.doc_id >= 300
  ) WHERE subject <> object
)
SELECT batch, subject, predicate, object, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT 0 AS batch, * FROM b0
  UNION ALL SELECT 1, * FROM b1
)
GROUP BY 1, 2, 3, 4"""
    )

    # TF-IDF keywords: smoothed idf frozen to micro-units, integer scores.
    sql["tfidf"] = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS word
  FROM documents
), tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
), dfx AS (
  SELECT word, CAST(df_inner AS BIGINT) AS df,
    CAST(round((ln(CAST((SELECT count(DISTINCT doc_id) FROM documents) + 1 AS DOUBLE)
                   / CAST(df_inner + 1 AS DOUBLE)) + CAST(1.0 AS DOUBLE)) * 1e6) AS BIGINT) AS idf_micro
  FROM (SELECT word, count(*) AS df_inner FROM tf GROUP BY 1) d
)
SELECT doc_id, word, tf, df, score_micro, CAST(rank AS INT) AS rank FROM (
  SELECT t.doc_id, t.word, t.tf, d.df, t.tf * d.idf_micro AS score_micro,
    row_number() OVER (PARTITION BY t.doc_id ORDER BY t.tf * d.idf_micro DESC, t.word ASC) AS rank
  FROM tf t JOIN dfx d USING (word)
) WHERE rank <= 5"""

    # chunk-windowed PMI/NPMI over the standardized graph: exact int64
    # counts; ln/divide round(6) are the only float steps.
    sql["entity_pmi"] = (
        _PRELUDE
        + _STD_CTES
        + """, mentions AS (
  SELECT DISTINCT doc_id, chunk, e AS entity FROM (
    SELECT doc_id, chunk, subject AS e FROM std
    UNION ALL SELECT doc_id, chunk, object FROM std)
), nctx AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM (SELECT DISTINCT doc_id, chunk FROM std)
), entctx AS (
  SELECT entity, CAST(count(*) AS BIGINT) AS c FROM mentions GROUP BY 1
), prs AS (
  SELECT a.entity AS entity_a, b.entity AS entity_b,
         CAST(count(*) AS BIGINT) AS pair_count
  FROM mentions a
  JOIN mentions b ON a.doc_id = b.doc_id AND a.chunk = b.chunk
                 AND a.entity < b.entity
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT entity_a, entity_b, pair_count,
  round(ln(CAST(pair_count * nctx.n AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE)), 6) AS pmi,
  round(ln(CAST(pair_count * nctx.n AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE))
        / ln(CAST(nctx.n AS DOUBLE) / CAST(pair_count AS DOUBLE)), 6) AS npmi
FROM prs, nctx
JOIN entctx ca ON ca.entity = prs.entity_a
JOIN entctx cb ON cb.entity = prs.entity_b"""
    )

    # anchor-text entity linking: same mapping CTE chain + arithmetic
    # expected anchors (1st/3rd word of each doc, root-relative targets).
    sql["anchor_mentions"] = (
        _PRELUDE
        + _STD_CTES
        + """, dw AS (
  SELECT doc_id, ws FROM (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
    FROM documents)
  WHERE len(ws) >= 3
), anchors AS (
  SELECT doc_id, ws[1] AS anchor_text,
    'https://host' || (doc_id % 7) || '.example.com/t' || ((doc_id + 1) % 50)
      || '.html' AS dst_url
  FROM dw
  UNION ALL
  SELECT doc_id, ws[3],
    'https://host' || (doc_id % 7) || '.example.com/t' || ((doc_id + 7) % 50)
      || '.html'
  FROM dw
)
SELECT m.standard AS entity, a.dst_url, CAST(count(*) AS BIGINT) AS n_mentions
FROM anchors a JOIN final_map m ON lower(trim(a.anchor_text)) = m.variant
GROUP BY 1, 2"""
    )
    sql["standardize"] = (
        _PRELUDE
        + _STD_CTES
        + "SELECT doc_id, CAST(chunk AS INT) AS chunk, subject, predicate, object FROM std"
    )
    sql["transitive"] = (
        _PRELUDE_INFER + _STD_CTES + _INFER_CTES.split(",\nents AS")[0]
        + "SELECT subject, predicate, object FROM trans"
    )
    sql["lexical"] = (
        _PRELUDE_INFER + _STD_CTES + _INFER_CTES
        + "SELECT subject, predicate, object FROM lex"
    )
    # e2e composition: latest-crawl winner per (source, url-slot) group
    # via correlated max(doc_id) (warc_ts monotone in doc_id), url-slot
    # < 25, >= 10-word curation gate, then the full standardize+infer
    # replay. Extracted text == text by the html_extract invariant.
    _e2e_filter = (
        "doc_id % 50 < 25 AND doc_id = ("
        "SELECT max(d2.doc_id) FROM documents d2 "
        "WHERE d2.source = documents.source "
        "AND d2.doc_id % 50 = documents.doc_id % 50) "
        f"AND len({_w('text')}) >= 10"
    )
    sql["e2e_crawl_kg"] = (
        _prelude(_e2e_filter) + _STD_CTES + _INFER_CTES
        + "SELECT subject, predicate, object, inferred FROM dedup"
    )
    sql["frontier"] = """
WITH u AS (
  SELECT DISTINCT 'https://' || source || '.example.org/p'
         || (doc_id % 50) AS url, source || '.example.org' AS host
  FROM documents
), p AS (
  SELECT url, host,
         ('0x' || substr(md5(url), 1, 6))::BIGINT AS priority
  FROM u
), r AS (
  SELECT url, host, priority,
         row_number() OVER (
           PARTITION BY host ORDER BY priority DESC, url
         ) AS fetch_rank
  FROM p
)
SELECT url, host, priority, CAST(fetch_rank AS BIGINT) AS fetch_rank,
       CAST((fetch_rank - 1) // 2 AS BIGINT) AS fetch_round
FROM r WHERE fetch_rank <= 3"""
    sql["infer_full"] = (
        _PRELUDE_INFER + _STD_CTES + _INFER_CTES
        + "SELECT subject, predicate, object, inferred FROM dedup"
    )
    # AMIE-style 2-hop rule mining over the inferred KG (kgops.mine_rules)
    sql["rule_mining"] = _PRELUDE_INFER + _STD_CTES + _INFER_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM dedup),
body AS (
  SELECT DISTINCT l.predicate AS p, r.predicate AS q,
         l.subject AS a, r.object AS c
  FROM spo l JOIN spo r ON l.object = r.subject
  WHERE l.subject <> r.object
),
bc AS (SELECT p, q, CAST(count(*) AS BIGINT) AS body_count FROM body GROUP BY 1, 2),
sup AS (
  SELECT b.p, b.q, h.predicate AS r, CAST(count(*) AS BIGINT) AS support
  FROM body b JOIN spo h ON b.a = h.subject AND b.c = h.object
  GROUP BY 1, 2, 3 HAVING count(*) >= 2
)
SELECT s.p, s.q, s.r, s.support, bc.body_count,
       round(CAST(s.support AS DOUBLE) / bc.body_count, 6) AS confidence
FROM sup s JOIN bc USING (p, q)"""
    # source-majority fact fusion (kgops.fuse_facts)
    sql["fact_fusion"] = _PRELUDE_INFER + _STD_CTES + """
, pp AS (
  SELECT subject, object, predicate,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_mentions
  FROM std GROUP BY 1, 2, 3
),
pt AS (
  SELECT subject, object,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS pair_docs
  FROM std GROUP BY 1, 2
),
wn AS (
  SELECT *, row_number() OVER (
    PARTITION BY subject, object
    ORDER BY n_docs DESC, n_mentions DESC, predicate ASC) AS rn
  FROM pp
)
SELECT wn.subject, wn.object, wn.predicate, wn.n_docs, wn.n_mentions,
       pt.pair_docs,
       round(CAST(wn.n_docs AS DOUBLE) / pt.pair_docs, 6) AS support_ratio
FROM wn JOIN pt USING (subject, object) WHERE rn = 1"""
    # edge diff between two crawl snapshots of the raw extracted KG
    # (kgops.kg_diff; crawl1 = docs [0,40), crawl2 = docs [10,50))
    sql["kg_diff"] = _PRELUDE_INFER + """
, oldg AS (SELECT DISTINCT subject, predicate, object
           FROM triples1 WHERE doc_id < 40),
newg AS (SELECT DISTINCT subject, predicate, object
         FROM triples1 WHERE doc_id >= 10 AND doc_id < 50)
SELECT coalesce(o.subject, n.subject) AS subject,
       coalesce(o.predicate, n.predicate) AS predicate,
       coalesce(o.object, n.object) AS object,
       CASE WHEN o.subject IS NULL THEN 'added'
            WHEN n.subject IS NULL THEN 'removed'
            ELSE 'kept' END AS status
FROM oldg o FULL OUTER JOIN newg n
  ON o.subject = n.subject AND o.predicate = n.predicate
 AND o.object = n.object"""
    # redirect resolution (webcrawl.resolve_redirects): the oracle states
    # the fixture's closed form — urls d%10 in 0..3 form per-decade chains
    # 3->2->1->0, so final = d - d%10 and hops = d%10, all resolved.
    sql["redirects"] = """
SELECT printf('doc%012d', doc_id) AS url,
       printf('doc%012d', doc_id - doc_id % 10) AS final_url,
       CAST(doc_id % 10 AS INT) AS hops,
       TRUE AS resolved
FROM documents WHERE doc_id % 10 <= 3"""
    # sitemap parse (webcrawl.parse_sitemaps): arithmetic oracle — one row
    # per doc entry, lastmod/priority present per the fixture's mod rules.
    sql["sitemap"] = """
SELECT source || '.example.org' AS host,
       'https://' || source || '.example.org/p' || CAST(doc_id % 50 AS VARCHAR) AS url,
       CASE WHEN doc_id % 3 = 0
            THEN printf('2024-01-%02d', doc_id % 28 + 1) END AS lastmod,
       CASE WHEN doc_id % 4 = 0 THEN CAST(0.9 AS DOUBLE)
            ELSE CAST(0.5 AS DOUBLE) END AS priority
FROM documents"""
    # SCD2 triple validity runs across three crawl slices
    # (kgops.triple_history); runs computed relationally: a start is a
    # membership row with no predecessor, its end the snap before the
    # first gap (else the last snapshot).
    sql["triple_history"] = _PRELUDE_INFER + """
, member AS (
  SELECT DISTINCT v.snap, t.subject, t.predicate, t.object
  FROM triples1 t
  JOIN (VALUES (0, 0, 30), (1, 10, 40), (2, 20, 50)) v(snap, lo, hi)
    ON t.doc_id >= v.lo AND t.doc_id < v.hi
),
runs AS (
  SELECT m.subject, m.predicate, m.object, m.snap AS first_snap,
    coalesce((
      SELECT min(g.s) - 1 FROM (VALUES (0), (1), (2)) g(s)
      WHERE g.s > m.snap AND NOT EXISTS (
        SELECT 1 FROM member x
        WHERE x.subject = m.subject AND x.predicate = m.predicate
          AND x.object = m.object AND x.snap = g.s)
    ), 2) AS last_snap
  FROM member m
  WHERE m.snap = 0 OR NOT EXISTS (
    SELECT 1 FROM member p
    WHERE p.subject = m.subject AND p.predicate = m.predicate
      AND p.object = m.object AND p.snap = m.snap - 1)
)
SELECT subject, predicate, object,
       CAST(first_snap AS INT) AS first_snap,
       CAST(last_snap AS INT) AS last_snap,
       last_snap = 2 AS is_current
FROM runs"""
    # predicate-profile entity typing (kgops.entity_roles)
    sql["entity_roles"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std),
po AS (SELECT subject AS entity, predicate, count(*) AS cnt
       FROM spo GROUP BY 1, 2),
pi AS (SELECT object AS entity, predicate, count(*) AS cnt
       FROM spo GROUP BY 1, 2),
osum AS (SELECT entity, CAST(sum(cnt) AS BIGINT) AS n_out FROM po GROUP BY 1),
otop AS (SELECT entity, predicate AS top_out_pred FROM (
  SELECT *, row_number() OVER (
    PARTITION BY entity ORDER BY cnt DESC, predicate ASC) AS rn FROM po
) WHERE rn = 1),
isum AS (SELECT entity, CAST(sum(cnt) AS BIGINT) AS n_in FROM pi GROUP BY 1),
itop AS (SELECT entity, predicate AS top_in_pred FROM (
  SELECT *, row_number() OVER (
    PARTITION BY entity ORDER BY cnt DESC, predicate ASC) AS rn FROM pi
) WHERE rn = 1),
outs AS (SELECT * FROM osum JOIN otop USING (entity)),
ins AS (SELECT * FROM isum JOIN itop USING (entity))
SELECT coalesce(outs.entity, ins.entity) AS entity,
       coalesce(n_out, 0) AS n_out, coalesce(n_in, 0) AS n_in,
       coalesce(top_out_pred, '') AS top_out_pred,
       coalesce(top_in_pred, '') AS top_in_pred
FROM outs FULL OUTER JOIN ins ON outs.entity = ins.entity"""
    # filtered negative sampling (kgops.kg_negatives, k=2): vocab dense ids
    # via row_number over entity order (== distributed_rank's total order),
    # md5-48bit side + candidate hashes shared literal-for-literal, NOT
    # EXISTS replays the filtered-protocol anti-join.
    sql["kg_negatives"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std),
ents AS (
  SELECT entity, row_number() OVER (ORDER BY entity) AS eid
  FROM (SELECT DISTINCT subject AS entity FROM spo
        UNION SELECT object FROM spo)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_ents FROM ents),
cand AS (
  SELECT s.subject, s.predicate, s.object, j.neg_idx,
    (('0x' || substr(md5('negA' || s.subject || chr(31) || s.predicate ||
       chr(31) || s.object || chr(31) || CAST(j.neg_idx AS VARCHAR)), 1, 12)
     )::BIGINT % 2) = 0 AS ishead,
    ('0x' || substr(md5('negB' || s.subject || chr(31) || s.predicate ||
       chr(31) || s.object || chr(31) || CAST(j.neg_idx AS VARCHAR)), 1, 12)
     )::BIGINT % nn.n_ents + 1 AS eid
  FROM spo s CROSS JOIN (VALUES (0), (1)) j(neg_idx) CROSS JOIN nn
),
corr AS (
  SELECT c.subject, c.predicate, c.object, CAST(c.neg_idx AS INT) AS neg_idx,
         CASE WHEN c.ishead THEN e.entity ELSE c.subject END AS neg_subject,
         CASE WHEN c.ishead THEN c.object ELSE e.entity END AS neg_object
  FROM cand c JOIN ents e USING (eid)
)
SELECT subject, predicate, object, neg_idx, neg_subject, neg_object
FROM corr WHERE NOT EXISTS (
  SELECT 1 FROM spo t WHERE t.subject = corr.neg_subject
    AND t.predicate = corr.predicate AND t.object = corr.neg_object)"""
    # exact global quantiles of doc char-length (stats.exact_quantiles):
    # rank r = max(1, ceil(p*n)) inverse empirical CDF; value = smallest v
    # whose cumulative count reaches r. Both sides compute r with the same
    # double multiply + ceil.
    sql["quantiles"] = """
WITH hist AS (
  SELECT CAST(length(text) AS BIGINT) AS value,
         CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1
),
cum AS (
  SELECT value, cnt, CAST(sum(cnt) OVER (ORDER BY value) AS BIGINT) AS c
  FROM hist
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
pr AS (SELECT CAST(p AS DOUBLE) AS p FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) v(p)),
tr AS (
  SELECT p, greatest(CAST(ceiling(p * n) AS BIGINT), 1) AS rank
  FROM pr CROSS JOIN tot
)
SELECT tr.p, c.value, tr.rank
FROM tr JOIN cum c ON c.c >= tr.rank AND c.c - c.cnt < tr.rank"""
    # deterministic DeepWalk walks: 4 unrolled argmin-md5 steps (walks.py)
    _walk_ctes = []
    for _t in range(1, 5):
        _prev_w = f"w{_t - 1}"
        _walk_ctes.append(f""",
w{_t} AS MATERIALIZED (
  SELECT w.start,
         min_by(e.dst, md5(w.node || chr(31) || '{_t}' || chr(31) || e.dst)) AS node
  FROM {_prev_w} w JOIN e ON w.node = e.src
  GROUP BY w.start
)""")
    sql["random_walks"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (SELECT DISTINCT subject AS src, object AS dst FROM std),
w0 AS MATERIALIZED (SELECT DISTINCT src AS start, src AS node FROM e)"""
        + "".join(_walk_ctes)
        + """
SELECT start, 0 AS step, node FROM w0"""
        + "".join(
            f"\nUNION ALL SELECT start, {_t} AS step, node FROM w{_t}"
            for _t in range(1, 5)
        )
    )

    # synchronous LPA, 4 unrolled rounds; tie-break (count desc, label asc)
    # via row_number — the engine's min_by(struct(-c, label)) twin.
    _lpa_ctes = []
    for _t in range(1, 5):
        _lpa_ctes.append(f""",
l{_t} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT u.a AS node, l.label, count(*) AS c,
           row_number() OVER (PARTITION BY u.a
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM und u JOIN l{_t - 1} l ON u.b = l.node
    GROUP BY u.a, l.label
  ) WHERE rn = 1
)""")
    sql["lpa"] = (
        _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM ed
    UNION ALL SELECT dst AS a, src AS b FROM ed
  ) WHERE a <> b
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und)"""
        + "".join(_lpa_ctes)
        + """
SELECT node, label FROM l4"""
    )

    # Newman modularity of the LPA communities: replay the lpa CTE chain,
    # then exact integer edge/degree counts + one float formula (the
    # half-term is written twice so both engines square the same quotient)
    sql["modularity"] = (
        _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM ed
    UNION ALL SELECT dst AS a, src AS b FROM ed
  ) WHERE a <> b
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und)"""
        + "".join(_lpa_ctes)
        + """
, canon AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM und
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS node FROM canon UNION ALL SELECT b AS node FROM canon
  ) GROUP BY 1
),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM canon),
pl AS (
  SELECT l.label, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d.deg) AS BIGINT) AS degree_sum
  FROM deg d JOIN l4 l ON d.node = l.node GROUP BY 1
),
ie AS (
  SELECT la.label AS label, CAST(count(*) AS BIGINT) AS intra_edges
  FROM canon c
  JOIN l4 la ON c.a = la.node
  JOIN l4 lb ON c.b = lb.node
  WHERE la.label = lb.label GROUP BY 1
)
SELECT pl.label, pl.n_nodes,
       CAST(coalesce(ie.intra_edges, 0) AS BIGINT) AS intra_edges,
       pl.degree_sum,
       round(CAST(coalesce(ie.intra_edges, 0) AS DOUBLE) / CAST(mm.m AS DOUBLE)
             - (CAST(pl.degree_sum AS DOUBLE)
                / (CAST(2.0 AS DOUBLE) * CAST(mm.m AS DOUBLE)))
             * (CAST(pl.degree_sum AS DOUBLE)
                / (CAST(2.0 AS DOUBLE) * CAST(mm.m AS DOUBLE))), 6)
         AS contribution
FROM pl LEFT JOIN ie USING (label) CROSS JOIN mm"""
    )

    # Hearst hypernyms: expected rows stated arithmetically from the word
    # positions the fixture text is synthesized from (hearst.py patterns).
    sql["hearst"] = f"""
WITH dw AS (
  SELECT doc_id, {_w('text')} AS ws FROM documents
  WHERE len({_w('text')}) >= 6
),
r AS (
  SELECT doc_id, ws[2] AS hyponym, ws[1] AS hypernym, 'such_as' AS pattern FROM dw
  UNION ALL SELECT doc_id, ws[3], ws[1], 'such_as' FROM dw
  UNION ALL SELECT doc_id, ws[4], ws[1], 'such_as' FROM dw
  UNION ALL SELECT doc_id, ws[5], ws[1], 'other' FROM dw
  UNION ALL SELECT doc_id, ws[6], ws[1], 'other' FROM dw
  UNION ALL SELECT doc_id, ws[3], ws[2], 'including' FROM dw
  UNION ALL SELECT doc_id, ws[4], ws[2], 'including' FROM dw
  UNION ALL SELECT doc_id, ws[5], ws[6], 'especially' FROM dw
)
SELECT hyponym, hypernym, pattern,
       CAST(count(*) AS BIGINT) AS support,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM r WHERE hyponym <> hypernym
GROUP BY hyponym, hypernym, pattern"""

    # content-defined chunking: 3-gram rolling-hash boundaries (md5 48-bit
    # prefix % 8), running-sum chunk ids, chunk hash + cross-doc shares.
    sql["cdc_chunks"] = f"""
WITH wsrc AS (
  SELECT doc_id, unnest({_w('text')}) AS word,
         generate_subscripts({_w('text')}, 1) - 1 AS pos
  FROM documents
),
b AS (
  SELECT doc_id, pos, word,
         CASE WHEN pos >= 2
               AND ('0x' || substr(md5(lag(word, 2) OVER w || ' ' ||
                                       lag(word, 1) OVER w || ' ' || word),
                                   1, 12))::BIGINT % 8 = 0
              THEN 1 ELSE 0 END AS bd
  FROM wsrc WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
c AS (
  SELECT doc_id, pos, word,
         CAST(coalesce(sum(bd) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS BIGINT) AS chunk_no
  FROM b
),
ch AS (
  SELECT doc_id, chunk_no,
         CAST(min(pos) AS INTEGER) AS start_pos,
         CAST(count(*) AS BIGINT) AS n_words,
         md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
  FROM c GROUP BY doc_id, chunk_no
),
sh AS (
  SELECT chunk_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM ch GROUP BY chunk_hash
)
SELECT doc_id, chunk_no, start_pos, n_words, chunk_hash, n_docs
FROM ch JOIN sh USING (chunk_hash)"""

    # k-NN majority-vote labeling: exact cosine top-5 + (votes desc, label)
    sql["knn_classify"] = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 7 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, label
  FROM embeddings WHERE vec_id % 7 <> 0
),
s AS (
  SELECT q.query_id, c.neighbor_id, c.label,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round({_sql_cos('q.qv', 'c.cv')}, 6) DESC, c.neighbor_id
         ) AS rk
  FROM q CROSS JOIN c
),
v AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
  FROM s WHERE rk <= 5 GROUP BY query_id, label
)
SELECT query_id, label AS predicted_label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, label ASC) AS rn
  FROM v
) WHERE rn = 1"""

    # Hearst pairs -> depth-2 is_a closure (hearst fixture arithmetic base)
    sql["taxonomy"] = f"""
WITH dw AS (
  SELECT doc_id, {_w('text')} AS ws FROM documents
  WHERE len({_w('text')}) >= 6
),
r AS (
  SELECT doc_id, ws[2] AS hyponym, ws[1] AS hypernym FROM dw
  UNION ALL SELECT doc_id, ws[3], ws[1] FROM dw
  UNION ALL SELECT doc_id, ws[4], ws[1] FROM dw
  UNION ALL SELECT doc_id, ws[5], ws[1] FROM dw
  UNION ALL SELECT doc_id, ws[6], ws[1] FROM dw
  UNION ALL SELECT doc_id, ws[3], ws[2] FROM dw
  UNION ALL SELECT doc_id, ws[4], ws[2] FROM dw
  UNION ALL SELECT doc_id, ws[5], ws[6] FROM dw
),
base AS MATERIALIZED (
  SELECT hyponym, hypernym, CAST(count(*) AS BIGINT) AS support
  FROM r WHERE hyponym <> hypernym GROUP BY hyponym, hypernym
),
d2 AS MATERIALIZED (
  SELECT l.hyponym, r.hypernym,
         CAST(max(least(l.support, r.support)) AS BIGINT) AS support
  FROM base l JOIN base r ON l.hypernym = r.hyponym
  WHERE l.hyponym <> r.hypernym
  GROUP BY l.hyponym, r.hypernym
)
SELECT hyponym, hypernym, 1 AS depth, support FROM base
UNION ALL
SELECT d2.hyponym, d2.hypernym, 2 AS depth, d2.support FROM d2
WHERE NOT EXISTS (
  SELECT 1 FROM base b
  WHERE b.hyponym = d2.hyponym AND b.hypernym = d2.hypernym
)"""

    # Luby MIS: 4 unrolled rounds; (md5, node) total-order priorities
    _mis_ctes = []
    for _r in range(4):
        _mis_ctes.append(f""",
p{_r} AS MATERIALIZED (
  SELECT node, md5(node || chr(31) || '{_r}') AS h FROM a{_r}
),
s{_r} AS MATERIALIZED (
  SELECT p.node FROM p{_r} p
  WHERE NOT EXISTS (
    SELECT 1 FROM und u JOIN p{_r} q ON u.b = q.node
    WHERE u.a = p.node AND (q.h, q.node) < (p.h, p.node)
  )
),
o{_r} AS MATERIALIZED (
  SELECT DISTINCT u.b AS node FROM und u JOIN s{_r} s ON u.a = s.node
  WHERE u.b NOT IN (SELECT node FROM s{_r})
),
a{_r + 1} AS MATERIALIZED (
  SELECT node FROM a{_r}
  WHERE node NOT IN (SELECT node FROM s{_r})
    AND node NOT IN (SELECT node FROM o{_r})
)""")
    sql["mis"] = (
        _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM ed
    UNION ALL SELECT dst AS a, src AS b FROM ed
  ) WHERE a <> b
),
a0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM und)"""
        + "".join(_mis_ctes)
        + """
SELECT node, 'in' AS state FROM s0"""
        + "".join(
            f"\nUNION ALL SELECT node, 'in' FROM s{_r}" for _r in range(1, 4)
        )
        + "".join(
            f"""\nUNION ALL SELECT node, 'out' FROM o{_r}
  WHERE node IN (SELECT node FROM a{_r})""" for _r in range(4)
        )
        + """
UNION ALL SELECT node, 'undecided' FROM a4"""
    )

    # per-snapshot entity mention counts + strict-inequality burst flag
    sql["entity_trends"] = _PRELUDE_INFER + """
, snapped AS (
  SELECT v.snap, t.subject, t.object
  FROM triples1 t
  JOIN (VALUES (0, 0, 30), (1, 10, 40), (2, 20, 50)) v(snap, lo, hi)
    ON t.doc_id >= v.lo AND t.doc_id < v.hi
),
men AS (
  SELECT snap, entity, CAST(count(*) AS BIGINT) AS mentions FROM (
    SELECT snap, subject AS entity FROM snapped
    UNION ALL SELECT snap, object FROM snapped
  ) GROUP BY snap, entity
),
tot AS (
  SELECT entity, CAST(sum(mentions) AS BIGINT) AS total FROM men GROUP BY entity
)
SELECT m.entity, CAST(m.snap AS INT) AS snap, m.mentions, t.total,
       m.mentions * 3 > 2 * t.total AS burst
FROM men m JOIN tot t USING (entity)"""

    # anchor-text corpus per link target (arithmetic link fixture)
    sql["anchor_corpus"] = (
        _LINK_ORACLE_PRELUDE
        + """
SELECT dst_url, anchor_text,
  CAST(count(*) AS BIGINT) AS n_mentions,
  CAST(count(DISTINCT 'host' || (doc_id % 7) || '.example.com') AS BIGINT)
    AS n_src_hosts
FROM expected
WHERE dst_url IS NOT NULL AND trim(anchor_text) <> ''
GROUP BY 1, 2"""
    )

    # per-host boilerplate lines: presence-counted, exact-integer share test
    sql["host_boilerplate"] = f"""
WITH d AS (
  SELECT doc_id, 'host' || (doc_id % 7) AS host, {_w('text')} AS ws
  FROM documents WHERE len({_w('text')}) >= 5
),
l AS (
  SELECT host, doc_id,
         'NAV host' || (doc_id % 7) || ' | menu' AS line FROM d
  UNION ALL SELECT host, doc_id, array_to_string(ws[1:5], ' ') FROM d
  UNION ALL SELECT host, doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'FOOT host' || (doc_id % 7)
         ELSE 'ALT ' || (doc_id % 3) END FROM d
),
ld AS (SELECT DISTINCT host, doc_id, line FROM l),
pl AS (
  SELECT host, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
  FROM ld GROUP BY host, line
),
ph AS (
  SELECT host, CAST(count(DISTINCT doc_id) AS BIGINT) AS host_pages
  FROM d GROUP BY host
)
SELECT pl.host, pl.line, pl.n_pages, ph.host_pages
FROM pl JOIN ph USING (host)
WHERE pl.n_pages * 1000000 >= 500000 * ph.host_pages"""

    # positional inverted index: postings + term stats
    sql["inverted_index"] = f"""
WITH wsrc AS (
  SELECT doc_id, unnest({_w('text')}) AS term,
         generate_subscripts({_w('text')}, 1) - 1 AS pos
  FROM documents
),
p AS (
  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
         string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS positions
  FROM wsrc GROUP BY term, doc_id
),
s AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
  FROM p GROUP BY term
)
SELECT p.term, p.doc_id, p.tf, p.positions, s.df, s.cf
FROM p JOIN s USING (term)"""

    # Adamic-Adar link prediction: wedges + micro-unit 1/ln(deg) weights
    sql["link_predict"] = _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM ed
    UNION ALL SELECT dst AS a, src AS b FROM ed
  ) WHERE a <> b
),
deg AS (SELECT a AS z, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY a),
w AS (
  SELECT z, CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS w
  FROM deg WHERE deg >= 2
),
wedge AS (
  SELECT u1.a AS x, u2.a AS y, u1.b AS z
  FROM und u1 JOIN und u2 ON u1.b = u2.b
  WHERE u1.a < u2.a
),
sc AS (
  SELECT x AS node_a, y AS node_b,
         CAST(count(*) AS BIGINT) AS common,
         CAST(sum(w.w) AS BIGINT) AS aa_micro
  FROM wedge JOIN w ON wedge.z = w.z GROUP BY x, y
)
SELECT node_a, node_b, common, aa_micro FROM sc
WHERE NOT EXISTS (
  SELECT 1 FROM und u WHERE u.a = sc.node_a AND u.b = sc.node_b
)"""

    # asymmetric shingle containment (quote detection), 6-grams, df cap 20
    sql["containment"] = r"""
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(words) - 5, 0) + 1),
    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' ||
         words[i+3] || ' ' || words[i+4] || ' ' || words[i+5])) AS shingles
  FROM (SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           w -> w <> '') AS words
        FROM documents)
  WHERE len(words) >= 6
),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS size_a FROM ex GROUP BY doc_id),
hot AS (SELECT s FROM ex GROUP BY s HAVING count(*) > 20),
exq AS (SELECT * FROM ex WHERE s NOT IN (SELECT s FROM hot)),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
  FROM exq a JOIN exq b ON a.s = b.s AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b, p.shared, z.size_a,
       CAST((p.shared * 1000000) // z.size_a AS BIGINT) AS containment_ppm
FROM p JOIN sizes z ON z.doc_id = p.doc_a
WHERE (p.shared * 1000000) // z.size_a >= 800000"""

    # Pearson degree assortativity: exact int64 moments, one float formula
    sql["assortativity"] = _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM ed
    UNION ALL SELECT dst AS a, src AS b FROM ed
  ) WHERE a <> b
),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY a),
pr AS (
  SELECT dj.deg AS j, dk.deg AS k
  FROM und u
  JOIN deg dj ON u.a = dj.node
  JOIN deg dk ON u.b = dk.node
),
ag AS (
  SELECT CAST(count(*) AS BIGINT) AS m2,
         CAST(sum(j * k) AS BIGINT) AS s_jk,
         CAST(sum(j) AS BIGINT) AS s_j,
         CAST(sum(j * j) AS BIGINT) AS s_jj
  FROM pr
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
SELECT nn.n_nodes, CAST(m2 // 2 AS BIGINT) AS n_edges,
       round(CASE WHEN den <> CAST(0.0 AS DOUBLE) THEN num / den END, 6)
         AS assortativity
FROM (
  SELECT m2,
    CAST(s_jk AS DOUBLE) / CAST(m2 AS DOUBLE)
      - (CAST(s_j AS DOUBLE) / CAST(m2 AS DOUBLE))
        * (CAST(s_j AS DOUBLE) / CAST(m2 AS DOUBLE)) AS num,
    CAST(s_jj AS DOUBLE) / CAST(m2 AS DOUBLE)
      - (CAST(s_j AS DOUBLE) / CAST(m2 AS DOUBLE))
        * (CAST(s_j AS DOUBLE) / CAST(m2 AS DOUBLE)) AS den
  FROM ag
), nn"""

    # HyperBall: 3 unrolled max-merge rounds over relational HLL registers
    _hb_ctes = []
    for _t in range(1, 4):
        _hb_ctes.append(f""",
k{_t} AS MATERIALIZED (
  SELECT node, bucket, max(register) AS register FROM (
    SELECT node, bucket, register FROM k{_t - 1}
    UNION ALL
    SELECT e.src AS node, k.bucket, k.register
    FROM ed e JOIN k{_t - 1} k ON k.node = e.dst
  ) GROUP BY node, bucket
)""")
    sql["hyperball"] = (
        _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
vn AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed
  )
),
h0 AS (
  SELECT node, ('0x' || substr(md5('hb:' || node), 1, 12))::BIGINT AS hv
  FROM vn
),
k0 AS MATERIALIZED (
  SELECT node, hv // 4398046511104 AS bucket,
         CASE WHEN hv % 4398046511104 = 0 THEN 43
              ELSE 42 - length(bin(hv % 4398046511104)) + 1 END AS register
  FROM h0
)"""
        + "".join(_hb_ctes)
        + """,
per AS (
  SELECT node,
         sum(1::BIGINT << CAST(62 - register AS INT)) AS s_present,
         CAST(count(*) AS BIGINT) AS np
  FROM k3 GROUP BY node
)
SELECT node,
       round(CASE WHEN raw <= CAST(160 AS DOUBLE) AND n_zero > 0
                  THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / n_zero)
                  ELSE raw END, 6) AS ball_size,
       n_zero AS n_zero_registers
FROM (
  SELECT node, (64 - np) AS n_zero,
    CAST(0.7213 AS DOUBLE)
      / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(64 AS DOUBLE))
      * CAST(64 AS DOUBLE) * CAST(64 AS DOUBLE)
      * CAST(4611686018427387904 AS DOUBLE)
      / CAST(s_present + (64 - np) * CAST(4611686018427387904 AS HUGEINT)
             AS DOUBLE) AS raw
  FROM per
)"""
    )

    # second-order non-backtracking walks: 4 unrolled min_by CTEs whose
    # key prefixes a backtrack flag onto the md5 order
    _n2v_ctes = []
    for _t in range(1, 5):
        _n2v_ctes.append(f""",
v{_t} AS MATERIALIZED (
  SELECT w.start,
         max(w.node) AS prev,
         min_by(e.dst,
                (CASE WHEN e.dst = w.prev THEN '1' ELSE '0' END)
                || md5(w.node || chr(31) || '{_t}' || chr(31) || e.dst)) AS node
  FROM v{_t - 1} w JOIN e ON w.node = e.src
  GROUP BY w.start
)""")
    sql["node2vec"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (SELECT DISTINCT subject AS src, object AS dst FROM std),
v0 AS MATERIALIZED (
  SELECT DISTINCT src AS start, '' AS prev, src AS node FROM e
)"""
        + "".join(_n2v_ctes)
        + """
SELECT start, 0 AS step, node FROM v0"""
        + "".join(
            f"\nUNION ALL SELECT start, {_t} AS step, node FROM v{_t}"
            for _t in range(1, 5)
        )
    )

    # 3-truss: 3 unrolled peels (wedge join + canonical-edge join + count)
    _kt_ctes = []
    for _r in range(1, 4):
        _kt_ctes.append(f""",
y{_r - 1} AS (
  SELECT a, b FROM t{_r - 1} UNION ALL SELECT b, a FROM t{_r - 1}
),
s{_r} AS MATERIALIZED (
  SELECT w1.a AS a, w2.a AS b, CAST(count(*) AS BIGINT) AS support
  FROM (SELECT a, b AS w FROM y{_r - 1}) w1
  JOIN (SELECT a, b AS w FROM y{_r - 1}) w2
    ON w1.w = w2.w AND w1.a < w2.a
  JOIN t{_r - 1} ec ON ec.a = w1.a AND ec.b = w2.a
  GROUP BY w1.a, w2.a
),
t{_r} AS MATERIALIZED (
  SELECT e.a, e.b FROM t{_r - 1} e
  JOIN s{_r} s ON e.a = s.a AND e.b = s.b
  WHERE s.support >= 1
)""")
    sql["ktruss"] = (
        _PRELUDE_INFER + _STD_CTES + """
, t0 AS MATERIALIZED (
  SELECT DISTINCT least(subject, object) AS a,
                  greatest(subject, object) AS b
  FROM std WHERE subject <> object
)"""
        + "".join(_kt_ctes)
        + """
SELECT t3.a AS node_a, t3.b AS node_b, s3.support
FROM t3 JOIN s3 ON t3.a = s3.a AND t3.b = s3.b"""
    )

    # URL template mining: oracle states the expected templates literally
    sql["url_templates"] = """
WITH l AS (
  SELECT 'host' || (doc_id % 7) || '.example.com' AS host,
         'https://host{n}.example.com/article/{n}/page{n}.html' AS template,
         'https://host' || (doc_id % 7) || '.example.com/article/' || doc_id
           || '/page' || (doc_id % 3) || '.html' AS u
  FROM documents
  UNION ALL
  SELECT 'host' || (doc_id % 7) || '.example.com',
         'https://host{n}.example.com/static/about.html',
         'https://host' || (doc_id % 7) || '.example.com/static/about.html'
  FROM documents
)
SELECT host, template, CAST(count(*) AS BIGINT) AS n_urls,
       min(u) AS example_url
FROM l GROUP BY host, template"""

    # bounded SCC: replay the arithmetic edge fixture + 3 path-doubling
    # rounds (8-hop closure) + mutual-reachability min-partner grouping
    _scc_ctes = []
    for _k in range(1, 4):
        _scc_ctes.append(f""",
r{_k} AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM r{_k - 1}
    UNION ALL
    SELECT a.src AS src, b.dst AS dst
    FROM r{_k - 1} a JOIN r{_k - 1} b ON a.dst = b.src
  ) WHERE src <> dst
)""")
    sql["scc"] = (
        """
WITH prm AS (
  SELECT doc_id AS i, doc_id - (doc_id % 8) AS base, doc_id % 8 AS r,
         3 + ((doc_id // 8) % 4) AS cl
  FROM documents
),
r0 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT i AS src,
           CASE WHEN r < cl THEN base + ((r + 1) % cl) ELSE i - 1 END AS dst
    FROM prm
    UNION ALL
    SELECT i AS src, i + 1 AS dst FROM prm WHERE r = 7
  ) WHERE src <> dst
)"""
        + "".join(_scc_ctes)
        + """,
mut AS (
  SELECT a.src AS node, a.dst AS pp
  FROM r3 a JOIN r3 b ON a.src = b.dst AND a.dst = b.src
),
nodes AS (SELECT src AS node FROM r0 UNION SELECT dst FROM r0),
part AS (
  SELECT node, pp FROM mut UNION ALL SELECT node, node AS pp FROM nodes
),
sid AS (SELECT node, min(pp) AS scc_id FROM part GROUP BY node),
sz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size FROM sid GROUP BY 1)
SELECT s.node, s.scc_id, z.scc_size FROM sid s JOIN sz z USING (scc_id)"""
    )

    # funnel: entry-anchored 7-day window, strict step ordering, all
    # comparisons on floor-epoch seconds (events-family convention)
    sql["funnel"] = """
WITH s1 AS (
  SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS view_sec
  FROM events WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, CAST(min(floor(epoch(e.ts))) AS BIGINT) AS click_sec
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click'
    AND floor(epoch(e.ts)) > s1.view_sec
    AND floor(epoch(e.ts)) <= s1.view_sec + 604800
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, CAST(min(floor(epoch(e.ts))) AS BIGINT) AS purchase_sec
  FROM events e
  JOIN s2 ON e.user_id = s2.user_id
  JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase'
    AND floor(epoch(e.ts)) > s2.click_sec
    AND floor(epoch(e.ts)) <= s1.view_sec + 604800
  GROUP BY 1
)
SELECT s1.user_id, s1.view_sec, s2.click_sec, s3.purchase_sec,
       CAST(1 + CAST(s2.click_sec IS NOT NULL AS INT)
              + CAST(s3.purchase_sec IS NOT NULL AS INT) AS BIGINT)
         AS steps_completed
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id"""

    # retention: signup-anchored relative weekly cohorts, pure integer
    # bucket arithmetic
    sql["retention"] = """
WITH anc AS (
  SELECT user_id, CAST(min(floor(epoch(ts))) AS BIGINT) AS anchor_sec
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
act AS (
  SELECT e.user_id,
         anc.anchor_sec // 604800 AS cohort_week,
         (CAST(floor(epoch(e.ts)) AS BIGINT) - anc.anchor_sec) // 604800
           AS week_offset
  FROM events e JOIN anc ON e.user_id = anc.user_id
  WHERE CAST(floor(epoch(e.ts)) AS BIGINT) >= anc.anchor_sec
)
SELECT cohort_week, week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM act GROUP BY 1, 2"""

    # ontology consistency: functional / inverse-functional violation
    # profile per predicate, exact integer ppm shares
    sql["ontology_check"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std),
fwd AS (
  SELECT predicate, CAST(count(*) AS BIGINT) AS n_subjects,
         CAST(sum(CASE WHEN n_obj > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS func_violations
  FROM (SELECT predicate, subject, count(*) AS n_obj FROM spo GROUP BY 1, 2)
  GROUP BY 1
),
inv AS (
  SELECT predicate, CAST(count(*) AS BIGINT) AS n_objects,
         CAST(sum(CASE WHEN n_subj > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS inv_violations
  FROM (SELECT predicate, object, count(*) AS n_subj FROM spo GROUP BY 1, 2)
  GROUP BY 1
)
SELECT fwd.predicate, fwd.n_subjects, inv.n_objects,
       fwd.func_violations, inv.inv_violations,
       (fwd.func_violations * 1000000) // fwd.n_subjects AS func_ppm,
       (inv.inv_violations * 1000000) // inv.n_objects AS inv_ppm
FROM fwd JOIN inv ON fwd.predicate = inv.predicate"""

    # exact bounded harmonic centrality: 2 unrolled min-distance BFS
    # extensions over the symmetric edge set, 1/d frozen to 1000000 // d
    sql["harmonic"] = _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM ed
    UNION ALL SELECT dst AS a, src AS b FROM ed
  ) WHERE a <> b
),
d1 AS MATERIALIZED (SELECT a AS node, b AS other, 1 AS d FROM und),
d2 AS MATERIALIZED (
  SELECT node, other, min(d) AS d FROM (
    SELECT node, other, d FROM d1
    UNION ALL
    SELECT x.node AS node, u.b AS other, 2 AS d
    FROM d1 x JOIN und u ON x.other = u.a
    WHERE x.d = 1 AND x.node <> u.b
  ) GROUP BY 1, 2
),
d3 AS MATERIALIZED (
  SELECT node, other, min(d) AS d FROM (
    SELECT node, other, d FROM d2
    UNION ALL
    SELECT x.node AS node, u.b AS other, 3 AS d
    FROM d2 x JOIN und u ON x.other = u.a
    WHERE x.d = 2 AND x.node <> u.b
  ) GROUP BY 1, 2
)
SELECT node AS entity, CAST(count(*) AS BIGINT) AS n_reached,
       CAST(sum(1000000 // d) AS BIGINT) AS harmonic_micro
FROM d3 GROUP BY 1"""

    # basic graph pattern ?x group ?y . ?y ?p ?z (kgops.match_basic_pattern)
    sql["kg_pattern"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std)
SELECT b.predicate AS p, a.subject AS x, a.object AS y, b.object AS z
FROM spo a JOIN spo b ON a.object = b.subject
WHERE a.predicate = 'group'"""
    # entity summarization: top-3 outgoing facts by predicate idf
    # (kgops.entity_summary; idf frozen to int64 micro-units before rank)
    sql["entity_summary"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM spo),
pidf AS (
  SELECT predicate,
         CAST(round(ln(CAST(any_value(tot.n) AS DOUBLE) /
                       CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS idf_micro
  FROM spo CROSS JOIN tot GROUP BY predicate
),
facts AS (
  SELECT s.subject AS entity, s.predicate, s.object, p.idf_micro
  FROM spo s JOIN pidf p USING (predicate)
),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY entity
    ORDER BY idf_micro DESC, predicate ASC, object ASC) AS fact_rank
  FROM facts
)
SELECT entity, predicate, object, idf_micro, CAST(fact_rank AS INT) AS fact_rank
FROM rk WHERE fact_rank <= 3"""
    sql["components"] = _PRELUDE_INFER + _STD_CTES + """
, und AS (
  SELECT DISTINCT a, b FROM (
    SELECT subject AS a, object AS b FROM std
    UNION ALL SELECT object, subject FROM std)
),
reach AS (
  SELECT a, b FROM und
  UNION SELECT a AS a, a AS b FROM und
  UNION SELECT u.a, r.b FROM und u JOIN reach r ON u.b = r.a
)
SELECT a AS entity, min(b) AS component_rep FROM reach GROUP BY a"""
    sql["degree"] = _PRELUDE_INFER + _STD_CTES + """
SELECT e AS entity, CAST(count(*) AS BIGINT) AS degree FROM (
  SELECT subject AS e FROM std UNION ALL SELECT object FROM std
) GROUP BY 1"""
    sql["graph_stats"] = _PRELUDE_INFER + _STD_CTES + _INFER_CTES + """
SELECT CAST(count(*) AS BIGINT) AS n_triples,
       CAST(sum(CASE WHEN inferred THEN 1 ELSE 0 END) AS BIGINT) AS n_inferred,
       CAST(count(DISTINCT predicate) AS BIGINT) AS n_predicates,
       (SELECT CAST(count(DISTINCT e) AS BIGINT) FROM (
          SELECT subject AS e FROM dedup UNION ALL SELECT object FROM dedup)) AS n_entities
FROM dedup"""
    sql["clean_graph"] = _PRELUDE + _CLEAN_SQL
    sql["dedup_exact"] = """
SELECT sha256(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS content_hash,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1"""
    sql["token_count"] = f"""
SELECT doc_id,
  CAST(len({_w('text')}) AS INT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens,
  CAST(length(text) AS INT) AS n_chars
FROM documents"""
    sql["quality_score"] = f"""
WITH base AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words,
    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
    length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
  CAST(len(words) AS INT) AS n_words,
  round(CASE WHEN len(words) > 0 THEN
    CAST(len(list_filter(words, w -> list_contains({_NSTOP}, w))) AS DOUBLE) / len(words)
    ELSE 0.0 END, 6) AS stopword_ratio,
  round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 6) AS punct_ratio,
  round(least(len(words) / 100.0, 1.0) *
        (1 - CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END), 6) AS quality
FROM base"""
    sql["ngram_jaccard_pairs"] = """
WITH sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(1, greatest(len(words) - 2, 0) + 1),
    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
  FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words FROM documents)
  WHERE len(words) >= 3
),
ex AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, a.n_sh AS na, b.n_sh AS nb, CAST(count(*) AS BIGINT) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT a, b, round(CAST(shared AS DOUBLE) / (na + nb - shared), 6) AS jaccard
FROM inter WHERE CAST(shared AS DOUBLE) / (na + nb - shared) >= 0.5"""
    sql["embedding_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    round({_sql_cos("q.qv", "e.embedding")}, 6) AS cosine
  FROM q CROSS JOIN embeddings e
  WHERE q.query_id <> e.vec_id
)
SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
) WHERE rk <= 5"""
    sql["lang_id"] = """
WITH base AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words
  FROM documents
),
cnts AS (
  SELECT doc_id,
    len(list_filter(words, w -> list_contains(['the','a','of','and','is','to'], w))) AS en,
    len(list_filter(words, w -> list_contains(['der','die','das','und','ist','zu'], w))) AS de,
    len(list_filter(words, w -> list_contains(['le','la','les','et','est','de'], w))) AS fr
  FROM base
)
SELECT doc_id,
  CASE WHEN de > greatest(en, fr) THEN 'de'
       WHEN fr > greatest(en, de) THEN 'fr'
       ELSE 'en' END AS pred_lang
FROM cnts"""

    # --- near-dup family: md5-hex-prefix hashes are bit-identical in Spark
    # (conv(substring(md5(x),1,15),16,10)) and DuckDB ('0x'||substr)::HUGEINT.
    from ai_knowledge_graph_spark.operators.dedup import _M31, minhash_coeffs

    NH, SEED = 8, 7
    _coeffs = minhash_coeffs(NH, SEED)
    _sh_body = f"""sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(words) - 2, 0) + 1),
    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS shingle
  FROM (SELECT doc_id, {_w('lower(text)')} AS words FROM documents)
  WHERE len(words) >= 3
),
h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 12))::BIGINT % {_M31} AS h0 FROM sh),
sig AS (
  SELECT doc_id,
    {', '.join(
        f"min(({a} * h0 + {b}) % {_M31}) AS m{i}"
        for i, (a, b) in enumerate(_coeffs)
    )}
  FROM h GROUP BY doc_id
)"""
    _sh_cte = "WITH " + _sh_body
    sql["minhash_signatures"] = _sh_cte + f"""
SELECT doc_id,
  unnest([{', '.join(str(i) for i in range(NH))}]) AS h_idx,
  unnest([{', '.join(f'm{i}' for i in range(NH))}]) AS sig_val
FROM sig"""

    _band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, m{2 * b}::VARCHAR || ',' || m{2 * b + 1}::VARCHAR AS bucket FROM sig"
        for b in range(4)
    )
    _pairs_body = f""",
bands AS (
  {_band_selects}
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
npairs AS (
  SELECT i.a, i.b, round(CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared), 6) AS jaccard
  FROM inter i
  JOIN counts ca ON i.a = ca.doc_id
  JOIN counts cb ON i.b = cb.doc_id
  WHERE EXISTS (SELECT 1 FROM cand c WHERE c.a = i.a AND c.b = i.b)
    AND round(CAST(shared AS DOUBLE) / (ca.n_sh + cb.n_sh - shared), 6) >= 0.5
)"""
    sql["minhash_lsh_pairs"] = (
        _sh_cte + _pairs_body + "\nSELECT a, b, jaccard FROM npairs"
    )

    # Cluster closure of the verified pair graph: group_id = min doc_id of
    # the component (mirrors near_dup_groups' salted star contraction). The
    # pair graph at the oracle SF is tiny, so a recursive reachability CTE
    # (UNION dedups -> terminates) is an exact single-node replay.
    _closure_body = """,
ndedges AS (SELECT a AS s, b AS d FROM npairs UNION SELECT b, a FROM npairs),
ndreach AS (
  SELECT s, d FROM ndedges
  UNION
  SELECT r.s, e.d FROM ndreach r JOIN ndedges e ON r.d = e.s
),
ndlabels AS (
  SELECT s AS doc_id, least(s, min(d)) AS group_id FROM ndreach GROUP BY s
)"""
    sql["near_dup_groups"] = (
        "WITH RECURSIVE " + _sh_body + _pairs_body + _closure_body + """
SELECT d.doc_id, coalesce(l.group_id, d.doc_id) AS group_id
FROM documents d LEFT JOIN ndlabels l USING (doc_id)"""
    )
    sql["minhash_dedup_docs"] = (
        "WITH RECURSIVE " + _sh_body + _pairs_body + _closure_body + """
SELECT d.doc_id
FROM documents d LEFT JOIN ndlabels l USING (doc_id)
WHERE l.group_id IS NULL OR l.group_id = d.doc_id"""
    )

    # Decoded-field mirror of q_multimodal_stats: the Spark side parses real
    # BMP/PPM/WAV bytes; the oracle recomputes what those headers must say
    # from the same doc_id arithmetic the encoders used.
    sql["multimodal_stats"] = """
WITH m AS (
  SELECT doc_id, doc_id % 5 AS kind, doc_id % 2 AS godd,
    8 + doc_id % 16 AS bw, 4 + doc_id % 8 AS bh,
    5 + doc_id % 12 AS pw, 3 + doc_id % 9 AS ph,
    6 + doc_id % 10 AS gw, 4 + doc_id % 7 AS gh,
    16 * (1 + doc_id % 8) AS jw, 8 * (1 + doc_id % 6) AS jh,
    16 + doc_id % 32 AS jne,
    8000 + 500 * (doc_id % 5) AS sr, 400 + doc_id % 100 AS ns, 1 + doc_id % 2 AS ch
  FROM documents
), g AS (
  SELECT *, CASE WHEN godd = 1 THEN 1 ELSE 3 END AS gch FROM m
)
SELECT doc_id,
  CASE WHEN kind = 2 THEN 'audio' ELSE 'image' END AS media_type,
  CASE kind WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm' WHEN 3 THEN 'png'
            WHEN 4 THEN 'jpeg' ELSE 'wav' END AS codec,
  CAST(CASE kind
    WHEN 0 THEN 54 + ((3 * bw + 3) // 4) * 4 * bh
    WHEN 1 THEN 3 + length(pw::VARCHAR) + 1 + length(ph::VARCHAR) + 5
              + gch * pw * ph
    WHEN 3 THEN 68 + gh * (1 + gch * gw)
    WHEN 4 THEN 40 + 5 * gch + jne
    ELSE 44 + ns * ch * 2 END AS BIGINT) AS n_bytes,
  CAST(CASE kind WHEN 0 THEN bw WHEN 1 THEN pw WHEN 3 THEN gw
       WHEN 4 THEN jw END AS BIGINT) AS width,
  CAST(CASE kind WHEN 0 THEN bh WHEN 1 THEN ph WHEN 3 THEN gh
       WHEN 4 THEN jh END AS BIGINT) AS height,
  CAST(CASE kind WHEN 0 THEN 3 WHEN 1 THEN gch WHEN 3 THEN gch
       WHEN 4 THEN gch ELSE ch END AS BIGINT) AS n_channels,
  CAST(CASE WHEN kind = 2 THEN sr END AS BIGINT) AS sample_rate,
  CAST(CASE WHEN kind = 2 THEN ns * 1000 // sr END AS BIGINT) AS duration_ms,
  CAST(CASE WHEN kind = 2 THEN ns ELSE 1 END AS BIGINT) AS n_frames
FROM g"""

    BITS = 60
    _simhash_cte = f"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(words)) AS word
  FROM (SELECT doc_id, {_w('lower(text)')} AS words FROM documents)
),
hh AS (SELECT doc_id, ('0x' || substr(md5(word), 1, 15))::BIGINT AS h FROM w),
sums AS (
  SELECT doc_id,
    {', '.join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(BITS)
    )}
  FROM hh GROUP BY doc_id
),
sim AS (
  SELECT doc_id,
    ({' + '.join(f'CASE WHEN b{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END' for i in range(BITS))}) AS simhash
  FROM sums
)"""
    sql["simhash"] = _simhash_cte + "\nSELECT doc_id, simhash FROM sim"

    sql["simhash_pairs"] = _simhash_cte + """,
sb AS (
  SELECT doc_id, simhash, t.band, (simhash >> (t.band * 15)) & 32767 AS val
  FROM sim, (SELECT unnest([0, 1, 2, 3]) AS band) t
),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.simhash AS ha, r.simhash AS hb
  FROM sb l JOIN sb r ON l.band = r.band AND l.val = r.val AND l.doc_id < r.doc_id
)
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cands WHERE bit_count(xor(ha, hb)) <= 3"""

    sql["fingerprint"] = f"""
WITH base AS (
  SELECT doc_id, text, {_w('lower(text)')} AS w, len({_w('lower(text)')}) AS n
  FROM documents
),
picks AS (
  SELECT doc_id, text, n,
    (('0x' || substr(md5(w[1]), 1, 15))::BIGINT)::HUGEINT AS p1,
    (('0x' || substr(md5(w[n // 2 + 1]), 1, 15))::BIGINT)::HUGEINT AS pm,
    (('0x' || substr(md5(w[n]), 1, 15))::BIGINT)::HUGEINT AS pn
  FROM base
)
SELECT doc_id,
  sha256(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS content_sha256,
  CASE WHEN n >= 3 THEN ((p1 + pm * 31 + pn * 961) % {2**62})::BIGINT
       ELSE 0::BIGINT END AS position_sketch
FROM picks"""

    # --- SRP-LSH ANN: plane literals inlined from the same deterministic
    # generator the engine uses (numpy RandomState, rounded to 6 dp).
    from ai_knowledge_graph_spark.operators.similarity import make_planes

    def _plane_lit(p):
        return "[" + ", ".join(f"{x!r}" for x in p) + "]::DOUBLE[]"

    def _bucket_expr(planes, vec):
        return " + ".join(
            f"(CASE WHEN list_inner_product({vec}::DOUBLE[], {_plane_lit(p)}) > 0"
            f" THEN {1 << (len(planes) - 1 - i)} ELSE 0 END)"
            for i, p in enumerate(planes)
        )

    _tbl_cands = "\n  UNION ".join(
        f"""SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
  FROM (SELECT vec_id, {_bucket_expr(make_planes(64, 8, 42 + 1000 * t), 'embedding')} AS bkt
        FROM embeddings WHERE vec_id < 5) q
  JOIN (SELECT vec_id, {_bucket_expr(make_planes(64, 8, 42 + 1000 * t), 'embedding')} AS bkt
        FROM embeddings) e
    ON q.bkt = e.bkt AND q.vec_id <> e.vec_id"""
        for t in range(2)
    )
    sql["srp_topk"] = f"""
WITH cand AS (
  {_tbl_cands}
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
    round({_sql_cos("q.embedding", "e.embedding")}, 6) AS cosine
  FROM cand c
  JOIN embeddings q ON q.vec_id = c.query_id
  JOIN embeddings e ON e.vec_id = c.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
) WHERE rk <= 5"""

    # Streaming exact-dedup, projected to the deterministic hash set (the
    # streaming state store's first-arrival choice is not SQL-replayable,
    # the surviving hash SET is).
    sql["stream_dedup"] = f"""
SELECT DISTINCT sha256(trim(regexp_replace(text, '{_pyws}', ' ', 'g'))) AS content_sha
FROM documents"""

    # Embedding near-dup: same SRP bucketing, symmetric pair self-join,
    # exact-cosine threshold.
    _nd_cands = "\n  UNION ".join(
        f"""SELECT a.vec_id AS a, b.vec_id AS b
  FROM (SELECT vec_id, {_bucket_expr(make_planes(64, 8, 42 + 1000 * t), 'embedding')} AS bkt
        FROM embeddings) a
  JOIN (SELECT vec_id, {_bucket_expr(make_planes(64, 8, 42 + 1000 * t), 'embedding')} AS bkt
        FROM embeddings) b
    ON a.bkt = b.bkt AND a.vec_id < b.vec_id"""
        for t in range(2)
    )
    sql["embedding_near_dup"] = f"""
WITH cand AS (
  {_nd_cands}
)
SELECT a, b, cosine FROM (
  SELECT c.a, c.b,
    round({_sql_cos("ea.embedding", "eb.embedding")}, 6) AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a
  JOIN embeddings eb ON eb.vec_id = c.b
) WHERE cosine >= 0.3"""

    # --- graph query layer over the std KG slice ----------------------------
    graph_pre = _PRELUDE_INFER + _STD_CTES + """
, deg AS (
  SELECT entity, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT subject AS entity FROM std UNION ALL SELECT object FROM std
  ) GROUP BY 1
),
top1 AS (SELECT entity FROM deg ORDER BY degree DESC, entity ASC LIMIT 1),
top2 AS (SELECT entity FROM deg ORDER BY degree DESC, entity ASC LIMIT 1 OFFSET 1),
edges AS (SELECT subject AS src, predicate AS relation, object AS dst FROM std),
und AS (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM edges UNION ALL SELECT dst, src FROM edges
  )
)
"""
    sql["neighbors"] = graph_pre + """
SELECT dst AS node, relation, 'out' AS direction FROM edges WHERE src = (SELECT entity FROM top1)
UNION ALL
SELECT src AS node, relation, 'in' AS direction FROM edges WHERE dst = (SELECT entity FROM top1)"""

    sql["khop"] = graph_pre + """,
h1 AS (
  SELECT DISTINCT b AS entity FROM und WHERE a = (SELECT entity FROM top1)
    AND b <> (SELECT entity FROM top1)
),
h2 AS (
  SELECT DISTINCT u.b AS entity FROM und u JOIN h1 ON u.a = h1.entity
  WHERE u.b <> (SELECT entity FROM top1)
    AND u.b NOT IN (SELECT entity FROM h1)
)
SELECT entity, 0 AS hop FROM top1
UNION ALL SELECT entity, 1 FROM h1
UNION ALL SELECT entity, 2 FROM h2"""

    sql["shortest_dist"] = graph_pre + """,
bfs AS (
  SELECT entity, 0 AS d FROM top1
  UNION
  SELECT und.b, bfs.d + 1 FROM bfs JOIN und ON und.a = bfs.entity WHERE bfs.d < 10
)
SELECT (SELECT entity FROM top1) AS source, entity AS target, min(d) AS dist
FROM bfs WHERE entity = (SELECT entity FROM top2) GROUP BY entity"""

    sql["related_concepts"] = graph_pre + """,
hop1 AS (
  SELECT relation AS r1, dst AS n1 FROM edges WHERE src = (SELECT entity FROM top1)
  UNION ALL
  SELECT relation, src FROM edges WHERE dst = (SELECT entity FROM top1)
),
undr AS (
  SELECT src AS a, dst AS b, relation FROM edges
  UNION ALL SELECT dst, src, relation FROM edges
)
SELECT DISTINCT r1 AS relation_path, n1 AS node FROM hop1
UNION
SELECT DISTINCT h.r1 || '→' || u.relation AS relation_path, u.b AS node
FROM hop1 h JOIN undr u ON u.a = h.n1
WHERE u.b <> (SELECT entity FROM top1)"""

    sql["search"] = graph_pre + """
SELECT entity, degree, score FROM (
  SELECT entity, degree,
    (CASE WHEN contains(entity, (SELECT entity FROM top1)) THEN 10 ELSE 0 END +
     CASE WHEN entity = (SELECT entity FROM top1) THEN 50 ELSE 0 END) AS score
  FROM deg
) WHERE score > 0
ORDER BY score DESC, degree DESC, entity ASC LIMIT 20"""

    # --- query-side support ops (P5, F10, J5, J6, W5) -----------------------
    sql["concepts"] = graph_pre + """
SELECT DISTINCT d.doc_id, v.entity AS concept
FROM documents d
JOIN (SELECT DISTINCT entity FROM deg WHERE length(entity) >= 3) v
  ON contains(lower(d.text), v.entity)
  OR contains(lower(d.text), replace(v.entity, '_', ' '))"""

    _terms_arr = _arr(RELEVANCE_TERMS)
    sql["term_relevance"] = _PRELUDE_INFER + _STD_CTES + f"""
SELECT subject, predicate, object,
  (len(list_filter({_terms_arr}, t -> contains(trim(lower(subject)), t))) > 0 OR
   len(list_filter({_terms_arr}, t -> contains(trim(lower(object)), t))) > 0) AS relevant
FROM std"""

    _pairs_ctes = """
, und2 AS (
  SELECT DISTINCT a, b FROM (
    SELECT subject AS a, object AS b FROM std
    UNION ALL SELECT object, subject FROM std)
),
reach AS (
  SELECT a, b FROM und2
  UNION SELECT a AS a, a AS b FROM und2
  UNION SELECT u.a, r.b FROM und2 u JOIN reach r ON u.b = r.a
),
crep AS (SELECT a AS entity, min(b) AS component_rep FROM reach GROUP BY a),
featsj AS (
  SELECT entity, component_rep,
    list_filter(regexp_split_to_array(lower(entity), '\\s+'), w -> w <> '') AS words,
    lower(entity) AS elow
  FROM crep
),
cpairs AS (
  SELECT component_rep, a, b FROM (
    SELECT x.component_rep, x.entity AS a, y.entity AS b,
      row_number() OVER (PARTITION BY x.component_rep ORDER BY x.entity, y.entity) AS rn
    FROM featsj x JOIN featsj y
      ON x.component_rep = y.component_rep AND x.entity <> y.entity
    WHERE NOT EXISTS (SELECT 1 FROM std s WHERE s.subject = x.entity AND s.object = y.entity)
      AND (len(list_intersect(x.words, y.words)) > 0
           OR contains(y.elow, x.elow) OR contains(x.elow, y.elow))
  ) WHERE rn <= 10
)"""
    sql["candidate_pairs"] = (
        _PRELUDE_INFER + _STD_CTES + _pairs_ctes + "\nSELECT component_rep, a, b FROM cpairs"
    )

    sql["context_triples"] = _PRELUDE_INFER + _STD_CTES + _pairs_ctes + """
SELECT doc_id, chunk, subject, predicate, object FROM (
  SELECT t.*, row_number() OVER (
    ORDER BY t.doc_id, t.chunk, t.t_idx, t.subject, t.predicate, t.object) AS rn
  FROM std t
  WHERE EXISTS (SELECT 1 FROM cpairs c WHERE c.a = t.subject OR c.b = t.subject
                                          OR c.a = t.object OR c.b = t.object)
) WHERE rn <= 20"""

    sql["relation_cap"] = _PRELUDE_INFER + _STD_CTES + """
SELECT subject, predicate, object FROM (
  SELECT subject, predicate, object,
    row_number() OVER (PARTITION BY subject, predicate ORDER BY object) AS rn
  FROM std
) WHERE rn <= 4"""

    # v3 QA families: 2-hop path join + shared-neighbor pairs + seeded
    # md5-portable category balancing (training_generator_v3.py).
    sql["training_qa_v3"] = _PRELUDE_INFER + _STD_CTES + """
, eedges AS (SELECT DISTINCT subject AS src, predicate AS relation, object AS dst FROM std),
fcap AS (
  SELECT src, relation, dst FROM (
    SELECT *, row_number() OVER (PARTITION BY src ORDER BY dst, relation) AS fr
    FROM eedges
  ) WHERE fr <= 2
),
paths AS (
  SELECT replace(l.src, '_', ' ') AS la, replace(l.relation, '_', ' ') AS lr1,
         replace(l.dst, '_', ' ') AS lb, replace(r.relation, '_', ' ') AS lr2,
         replace(r.dst, '_', ' ') AS lc
  FROM fcap l JOIN fcap r ON l.dst = r.src
  WHERE l.src <> r.dst
),
walk AS (
  SELECT printf('Walk me through the chain from %s to %s.', la, lc) AS instruction,
         printf('The chain runs in two steps. Step 1: %s %s %s. Step 2: %s %s %s. Each step must complete before the next — without %s the link from %s to %s does not hold.',
                la, lr1, lb, lb, lr2, lc, lb, la, lc) AS output,
         'multi_hop_walkthrough' AS category
  FROM paths
),
nxt AS (
  SELECT printf('I have confirmed %s %s %s. What comes next?', la, lr1, lb) AS instruction,
         printf('Good — that is the first link. Next: %s %s %s. Only once both links hold does the full chain from %s to %s apply.',
                lb, lr2, lc, la, lc) AS output,
         'multi_hop_next_step' AS category
  FROM paths
),
acap AS (
  SELECT src, relation, dst FROM (
    SELECT *, row_number() OVER (PARTITION BY dst ORDER BY src, relation) AS ar
    FROM eedges
  ) WHERE ar <= 2
),
xpairs AS (
  SELECT replace(l.src, '_', ' ') AS la, replace(l.relation, '_', ' ') AS lr1,
         replace(r.src, '_', ' ') AS lb, replace(r.relation, '_', ' ') AS lr2,
         replace(l.dst, '_', ' ') AS lx
  FROM acap l JOIN acap r ON l.dst = r.dst
  WHERE l.src < r.src
),
xref AS (
  SELECT printf('How do %s and %s both relate to %s?', la, lb, lx) AS instruction,
         printf('Both connect to %s, from different angles: %s %s %s, while %s %s %s. Understanding both links clarifies how %s sits between them.',
                lx, la, lr1, lx, lb, lr2, lx, lx) AS output,
         'cross_ref_qa' AS category
  FROM xpairs
),
qa AS (
  SELECT * FROM walk UNION ALL SELECT * FROM nxt UNION ALL SELECT * FROM xref
)
SELECT instruction, output, category FROM (
  SELECT *, row_number() OVER (
    PARTITION BY category
    ORDER BY ('0x' || substr(md5(instruction || '|' || output || '|42'), 1, 15))::BIGINT,
             instruction) AS br
  FROM qa
) WHERE br <= 25"""

    # Hybrid RAG retrieval (graph_retriever.py:219-326): cosine top-5 chunks,
    # concept containment extraction, prioritized capped graph expansion.
    sql["rag_retrieve"] = _PRELUDE_INFER + _STD_CTES + f"""
, qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
qt AS (SELECT lower(text) AS lt FROM documents WHERE doc_id = 0),
chunkse AS (
  SELECT d.doc_id AS chunk_id, lower(d.text) AS ltext, e.embedding
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
),
tops AS (
  SELECT chunk_id, ltext FROM (
    SELECT c.chunk_id, c.ltext,
      row_number() OVER (
        ORDER BY round({_sql_cos("q.embedding", "c.embedding")}, 6) DESC,
                 c.chunk_id ASC) AS rk
    FROM chunkse c, qv q
  ) WHERE rk <= 5
),
ents AS (
  SELECT DISTINCT e AS concept FROM (
    SELECT subject AS e FROM std UNION SELECT object FROM std
  ) WHERE length(e) >= 3
),
qconc AS (
  SELECT DISTINCT concept FROM ents, qt
  WHERE contains(qt.lt, lower(concept))
     OR contains(qt.lt, replace(lower(concept), '_', ' '))
),
cconc AS (
  SELECT DISTINCT concept FROM ents, tops t
  WHERE contains(t.ltext, lower(concept))
     OR contains(t.ltext, replace(lower(concept), '_', ' '))
),
conc AS (
  SELECT concept, 0 AS priority FROM qconc
  UNION ALL
  SELECT concept, 1 FROM cconc WHERE concept NOT IN (SELECT concept FROM qconc)
),
top_conc AS (SELECT concept, priority FROM conc ORDER BY priority, concept LIMIT 20),
eedges AS (SELECT DISTINCT subject AS src, predicate AS relation, object AS dst FROM std),
nb0 AS (
  SELECT t.concept, t.priority, e.src AS subject, e.relation AS predicate,
         e.dst AS object, 0 AS dir_ord, e.dst AS nb
  FROM eedges e JOIN top_conc t ON e.src = t.concept
  UNION ALL
  SELECT t.concept, t.priority, e.src, e.relation, e.dst, 1, e.src
  FROM eedges e JOIN top_conc t ON e.dst = t.concept
),
nbd AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY concept, predicate, nb ORDER BY dir_ord, subject, object) AS dup
    FROM nb0
  ) WHERE dup = 1
),
capped AS (
  SELECT * FROM (
    SELECT concept, priority, subject, predicate, object,
      row_number() OVER (
        PARTITION BY concept ORDER BY dir_ord, nb, predicate) AS nb_rank
    FROM nbd
  ) WHERE nb_rank <= 5
),
ranked AS (
  SELECT * FROM capped ORDER BY priority, concept, nb_rank LIMIT 50
)
SELECT subject, predicate, object, concept,
  CAST(row_number() OVER (
    ORDER BY priority, concept, nb_rank, predicate, object) AS INT) AS rank
FROM ranked"""

    # S5: content dedup — normalize whitespace, sha256, min-path survivor.
    # (_pyws — the Python-whitespace class in RE2 syntax — is defined at the
    # top of oracle_sql.)
    sql["corpus_dedup"] = f"""
WITH hashed AS (
  SELECT doc_id, format('doc{{:012d}}.txt', doc_id) AS path,
         sha256(trim(regexp_replace(text, '{_pyws}', ' ', 'g'))) AS content_sha
  FROM documents
  WHERE length(regexp_replace(text, '^{_pyws}|{_pyws}$', '', 'g')) >= 50
)
SELECT doc_id, content_sha FROM (
  SELECT *, row_number() OVER (PARTITION BY content_sha ORDER BY path) AS rn
  FROM hashed
) WHERE rn = 1"""

    # J11: requirement-match scoring (logic_engine.py:359-498)
    sql["model_scores"] = _PRELUDE_INFER + _STD_CTES + """
, model_top AS (
  SELECT model FROM (
    SELECT subject AS model, count(*) AS c FROM std GROUP BY 1
  ) ORDER BY c DESC, model ASC LIMIT 3
),
reqs0 AS (
  SELECT DISTINCT m.model, s.predicate || ' ' || s.object AS requirement
  FROM std s JOIN model_top m ON s.subject = m.model
),
reqs AS (
  SELECT model, requirement, lower(requirement) AS req_lower FROM (
    SELECT *, row_number() OVER (PARTITION BY model ORDER BY requirement) AS rn
    FROM reqs0
  ) WHERE rn <= 8
),
sharing AS (
  SELECT req_lower, count(DISTINCT model) AS sharing FROM reqs GROUP BY 1
),
detected AS (
  SELECT concept FROM (
    SELECT lower(object) AS concept, count(*) AS c FROM std GROUP BY 1
  ) ORDER BY c DESC, concept ASC LIMIT 10
),
det AS (
  SELECT DISTINCT lower(concept) AS det_raw,
         replace(lower(concept), '_', ' ') AS det_label
  FROM detected
),
per_req AS (
  SELECT r.model, r.req_lower, 1.0 / s.sharing AS specificity,
         bool_or(d.det_raw IS NOT NULL) AS is_met
  FROM reqs r
  JOIN sharing s USING (req_lower)
  LEFT JOIN det d
    ON contains(r.req_lower, d.det_label) OR contains(r.req_lower, d.det_raw)
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT model, CAST(count(*) AS BIGINT) AS total_reqs,
         CAST(sum(CASE WHEN is_met THEN 1 ELSE 0 END) AS BIGINT) AS satisfied,
         sum(CASE WHEN is_met THEN specificity ELSE 0.0 END) AS weighted_spec,
         sum(specificity) AS max_spec
  FROM per_req GROUP BY 1
)
SELECT model, total_reqs, satisfied,
  round(weighted_spec, 6) AS weighted_spec,
  round(max_spec, 6) AS max_spec,
  round((CAST(satisfied AS DOUBLE) / total_reqs) * 7.0
        + (weighted_spec / greatest(max_spec, 0.01)) * 3.0
        + CASE WHEN satisfied = total_reqs THEN 1.5 ELSE 0.0 END, 6) AS score
FROM scored"""

    # IVF ANN: md5-hash-bucketed coarse centroids (min-id rep per bucket),
    # probe 4 nearest lists per query, exact cosine within probed lists
    sql["ivf_topk"] = f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings),
buck AS (
  SELECT vec_id,
    CAST((('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 16) AS INT)
      AS centroid_bucket
  FROM base
),
reps AS (SELECT centroid_bucket AS centroid_id, min(vec_id) AS rep_id FROM buck GROUP BY 1),
cents AS (SELECT r.centroid_id, b.embedding AS centroid FROM reps r JOIN base b ON b.vec_id = r.rep_id),
corpus_assign AS (
  SELECT vec_id AS neighbor_id, centroid_id FROM (
    SELECT b.vec_id, c.centroid_id,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY round({_sql_cos("b.embedding", "c.centroid")}, 6) DESC,
                 c.centroid_id ASC) AS pr
    FROM base b CROSS JOIN cents c
  ) WHERE pr <= 1
),
q_assign AS (
  SELECT vec_id AS query_id, centroid_id FROM (
    SELECT b.vec_id, c.centroid_id,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY round({_sql_cos("b.embedding", "c.centroid")}, 6) DESC,
                 c.centroid_id ASC) AS pr
    FROM base b CROSS JOIN cents c WHERE b.vec_id < 5
  ) WHERE pr <= 4
),
scored AS (
  SELECT q.query_id, ca.neighbor_id,
    round({_sql_cos("qe.embedding", "ne.embedding")}, 6) AS cosine
  FROM q_assign q
  JOIN corpus_assign ca USING (centroid_id)
  JOIN embeddings qe ON qe.vec_id = q.query_id
  JOIN embeddings ne ON ne.vec_id = ca.neighbor_id
  WHERE q.query_id <> ca.neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rk AS INT) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM scored
) WHERE rk <= 5"""

    # K5: relationship Q&A — template dim tables mirrored from the operator
    from ai_knowledge_graph_spark.operators.training import (
        GENERIC_TEMPLATES,
        RELATION_TEMPLATES,
    )

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    tmpl_rows = ", ".join(
        f"({_q(rel)}, {idx}, {len(ts)}, {_q(instr)}, {_q(ans)})"
        for rel, ts in RELATION_TEMPLATES.items()
        for idx, (instr, ans) in enumerate(ts)
    )
    gen_rows = ", ".join(
        f"({idx}, {len(GENERIC_TEMPLATES)}, {_q(instr)}, {_q(ans)})"
        for idx, (instr, ans) in enumerate(GENERIC_TEMPLATES)
    )
    _render = (
        "replace(replace(replace({col}, '{{src}}', replace(e.src, '_', ' ')), "
        "'{{tgt}}', replace(e.dst, '_', ' ')), '{{rel}}', replace(e.relation, '_', ' '))"
    )
    sql["training_qa"] = _PRELUDE_INFER + _STD_CTES + f"""
, edges AS (
  SELECT DISTINCT subject AS src, object AS dst, predicate AS relation FROM std
),
tmpl(relation, t_idx, n_templates, instr, answer) AS (VALUES {tmpl_rows}),
gtmpl(t_idx, n_templates, instr, answer) AS (VALUES {gen_rows})
SELECT {_render.format(col="t.instr")} AS instruction,
       {_render.format(col="t.answer")} AS output,
       'relationship_qa' AS category
FROM edges e JOIN tmpl t USING (relation)
WHERE (length(e.src) + length(e.dst)) % t.n_templates = t.t_idx
UNION ALL
SELECT {_render.format(col="t.instr")} AS instruction,
       {_render.format(col="t.answer")} AS output,
       'relationship_qa_generic' AS category
FROM edges e CROSS JOIN gtmpl t
WHERE e.relation NOT IN (SELECT relation FROM tmpl)
  AND (length(e.src) + length(e.dst)) % t.n_templates = t.t_idx"""

    # --- web-crawl ingest operators -------------------------------------

    # html.escape(quote=True) order: & < > " ' — and the extractor's inverse
    # (tag strip FIRST, then entity unescape, matching html_to_text).
    _esc = (
        "replace(replace(replace(replace(replace(text, '&', '&amp;'), "
        "'<', '&lt;'), '>', '&gt;'), '\"', '&quot;'), chr(39), '&#x27;')"
    )
    _unesc = (
        "replace(replace(replace(replace(replace({col}, '&#x27;', chr(39)), "
        "'&quot;', '\"'), '&gt;', '>'), '&lt;', '<'), '&amp;', '&')"
    )
    sql["html_extract"] = f"""
WITH wrapped AS (
  SELECT doc_id, text,
    '<html><body><p>' || {_esc} || '</p></body></html>' AS html
  FROM documents
), extracted AS (
  SELECT doc_id, text,
    {_unesc.format(col="regexp_replace(html, '<[^>]*>', '', 'g')")} AS ex
  FROM wrapped
)
SELECT doc_id, ex = text AS roundtrip_ok, sha256(ex) AS extracted_sha256,
       CAST(length(ex) AS INT) AS extracted_chars
FROM extracted"""

    sql["latest_crawl"] = """
WITH pages AS (
  SELECT 'https://' || source || '.example.org/p' || CAST(doc_id % 50 AS VARCHAR) AS url,
         to_timestamp(1767225600 + doc_id * 60) AS warc_ts, doc_id, text
  FROM documents
)
SELECT url,
       max_by(doc_id, warc_ts) AS latest_doc_id,
       sha256(max_by(text, warc_ts)) AS latest_sha256,
       CAST(count(*) AS BIGINT) AS n_crawls
FROM pages GROUP BY url"""

    sql["canonical_crawl"] = """
WITH pages AS (
  SELECT doc_id, text, lower(source) AS lsrc, source,
         CAST(doc_id % 50 AS VARCHAR) AS k, doc_id % 4 AS v,
         to_timestamp(1767225600 + doc_id * 60) AS warc_ts
  FROM documents
), messy AS (
  SELECT doc_id, text, warc_ts,
    CASE v
      WHEN 0 THEN 'https://' || source || '.example.org/p' || k
      WHEN 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.ORG/p' || k || '#sec'
      WHEN 2 THEN 'https://' || source || '.example.org:443/p' || k
                  || '?utm_source=bench'
      ELSE 'https://' || source || '.example.org/p' || k || '?b=2&a=1'
    END AS url,
    'https://' || lsrc || '.example.org/p' || k ||
      CASE WHEN v = 3 THEN '?a=1&b=2' ELSE '' END AS canonical_url
  FROM pages
)
SELECT canonical_url,
       max_by(url, warc_ts) AS url,
       max_by(doc_id, warc_ts) AS latest_doc_id,
       sha256(max_by(text, warc_ts)) AS latest_sha256,
       CAST(count(*) AS BIGINT) AS n_crawls
FROM messy GROUP BY canonical_url"""

    sql["snapshot_diff"] = """
WITH base AS (
  SELECT doc_id, text,
    'https://' || source || '.example.org/d' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
), old AS (
  SELECT url, sha256(text) AS old_sha FROM base WHERE doc_id % 7 <> 0
), new AS (
  SELECT url,
         sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)
           AS new_sha
  FROM base WHERE doc_id % 5 <> 0
)
SELECT COALESCE(old.url, new.url) AS url,
  CASE WHEN old_sha IS NULL THEN 'added'
       WHEN new_sha IS NULL THEN 'removed'
       WHEN old_sha <> new_sha THEN 'changed'
       ELSE 'unchanged' END AS status,
  old_sha, new_sha
FROM old FULL OUTER JOIN new ON old.url = new.url"""

    sql["repetition_stats"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
), g AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 2
              THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
              ELSE [] END AS grams
  FROM w
), e AS (
  SELECT doc_id, unnest(grams) AS gram FROM g
), pg AS (
  SELECT doc_id, gram, count(*) AS cnt FROM e GROUP BY 1, 2
), s AS (
  SELECT doc_id, sum(cnt) AS n_grams, count(*) AS distinct_grams, max(cnt) AS top_cnt
  FROM pg GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.distinct_grams, 0) AS BIGINT) AS distinct_grams,
       round(CASE WHEN COALESCE(s.n_grams, 0) > 0
             THEN 1.0 - CAST(s.distinct_grams AS DOUBLE) / s.n_grams
             ELSE 0.0 END, 6) AS dup_gram_frac,
       round(CASE WHEN COALESCE(s.n_grams, 0) > 0
             THEN CAST(s.top_cnt AS DOUBLE) / s.n_grams
             ELSE 0.0 END, 6) AS top_gram_frac
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"""

    sql["domain_stats"] = """
WITH base AS (
  SELECT source, lang,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words,
    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
    length(text) AS n_chars
  FROM documents
), q AS (
  SELECT source, lang, len(words) AS n_words,
    round(least(len(words) / 100.0, 1.0) *
          (1 - CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars
               ELSE 0.0 END), 6) AS quality
  FROM base
)
SELECT source AS domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_words,
       round(avg(quality), 6) AS avg_quality,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM q GROUP BY 1"""

    # PageRank: unrolled fixed-iteration power method over the std edge
    # multiset — same damping/teleport/dangling formulation as
    # graph.centrality.pagerank, with float constants built by the same
    # IEEE ops ((1.0 - 0.85), 0.85) so both sides round identically at 6dp.
    _pr_iters = []
    _prev = "pr0"
    for _k in range(1, 6):
        _pr_iters.append(f""",
dang{_k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.pr), CAST(0 AS DOUBLE)) AS m
  FROM {_prev} p LEFT JOIN outdeg o ON p.node = o.src WHERE o.src IS NULL
),
mass{_k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(p.pr / o.od) AS m
  FROM e JOIN {_prev} p ON e.src = p.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
),
pr{_k} AS MATERIALIZED (
  SELECT n.node,
         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
         + CAST(0.85 AS DOUBLE) *
           (COALESCE(m.m, CAST(0 AS DOUBLE)) + (SELECT m FROM dang{_k}) / (SELECT n FROM nn)) AS pr
  FROM nodes n LEFT JOIN mass{_k} m ON n.node = m.node
)""")
        _prev = f"pr{_k}"
    sql["pagerank"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (SELECT subject AS src, object AS dst FROM std),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src),
pr0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM nodes)"""
        + "".join(_pr_iters)
        + f"""
SELECT node AS entity, round(pr, 6) AS pagerank FROM {_prev}"""
    )

    # personalized PageRank: the pagerank chain with a seeds-only teleport
    # (and dangling mass routed to seeds); the teleport scalar is written
    # in the engine's exact op order ((1-d) + d*dang) / s
    _ppr_iters = []
    _pprev = "qr0"
    for _k in range(1, 6):
        _ppr_iters.append(f""",
qdang{_k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.pr), CAST(0 AS DOUBLE)) AS m
  FROM {_pprev} p LEFT JOIN outdeg o ON p.node = o.src WHERE o.src IS NULL
),
qmass{_k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(p.pr / o.od) AS m
  FROM e JOIN {_pprev} p ON e.src = p.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
),
qr{_k} AS MATERIALIZED (
  SELECT n.node,
         CAST(0.85 AS DOUBLE) * COALESCE(m.m, CAST(0 AS DOUBLE))
         + CASE WHEN s.node IS NOT NULL THEN
             ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
              + CAST(0.85 AS DOUBLE) * (SELECT m FROM qdang{_k}))
             / (SELECT s FROM ss)
           ELSE CAST(0 AS DOUBLE) END AS pr
  FROM nodes n
  LEFT JOIN qmass{_k} m ON n.node = m.node
  LEFT JOIN sd s ON n.node = s.node
)""")
        _pprev = f"qr{_k}"
    sql["ppr"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (SELECT subject AS src, object AS dst FROM std),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
sd AS MATERIALIZED (
  SELECT node FROM nodes WHERE substr(md5(node), 1, 1) IN ('0', '1', '2', '3')
),
ss AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS s FROM sd),
outdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src),
qr0 AS MATERIALIZED (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL
              THEN CAST(1.0 AS DOUBLE) / (SELECT s FROM ss)
              ELSE CAST(0 AS DOUBLE) END AS pr
  FROM nodes n LEFT JOIN sd s ON n.node = s.node
)"""
        + "".join(_ppr_iters)
        + f"""
SELECT node AS entity, round(pr, 6) AS ppr FROM {_pprev}"""
    )

    # co-citation / bibliographic coupling: capped wedge joins on the
    # shared source (resp. shared target)
    _cocite_body = """
ok AS (SELECT src FROM e GROUP BY src HAVING count(*) <= 64),
ee AS MATERIALIZED (SELECT e.src, e.dst FROM e JOIN ok USING (src)),
pr AS (
  SELECT l.dst AS a, r.dst AS b, CAST(count(*) AS BIGINT) AS n_common
  FROM ee l JOIN ee r ON l.src = r.src AND l.dst < r.dst
  GROUP BY 1, 2
)
SELECT a, b, n_common FROM pr WHERE n_common >= 1"""
    sql["cocite"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (
  SELECT DISTINCT subject AS src, object AS dst FROM std
  WHERE subject <> object
),"""
        + _cocite_body
    )
    sql["bibcouple"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (
  SELECT DISTINCT object AS src, subject AS dst FROM std
  WHERE subject <> object
),"""
        + _cocite_body
    )

    # first-occurrence paragraph dedup over the line_dedup synth fixture;
    # the first-occurrence key is the lexicographic (doc_id, pos) min on
    # both sides (the engine takes min over a struct; here a row-valued
    # min) — overflow-free, no numeric-id or paragraph-count assumption
    sql["paragraph_dedup"] = """
WITH synth AS (
  SELECT doc_id,
         'HOME | ABOUT | CONTACT' || chr(10) || text || chr(10)
           || 'Copyright ' || source AS text
  FROM documents
),
ex AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS para,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS pos
  FROM synth
),
f AS (SELECT para, min(ROW(doc_id, pos)) AS fk FROM ex GROUP BY 1),
k AS (
  SELECT e.doc_id, e.pos, e.para
  FROM ex e JOIN f ON e.para = f.para
  WHERE ROW(e.doc_id, e.pos) = f.fk
),
ka AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(para, chr(10) ORDER BY pos) AS text
  FROM k GROUP BY 1
),
t AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM ex GROUP BY 1)
SELECT t.doc_id, coalesce(ka.text, '') AS text, t.n_paras,
       CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept
FROM t LEFT JOIN ka ON t.doc_id = ka.doc_id"""

    # Flesch-Kincaid: exact integer word/sentence/vowel-group counts,
    # float only in the two final formulas (round 6, same op order)
    sql["readability"] = """
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
         list_filter(string_split_regex(text, '[.!?]+'),
                     s -> trim(s) <> '') AS ss
  FROM documents
),
c AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(len(ss) AS BIGINT) AS n_sentences,
         CAST(coalesce(list_sum(list_transform(ws,
              x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)
           AS BIGINT) AS n_syllables
  FROM w
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 AND n_sentences > 0 THEN
         round(CAST(0.39 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               + CAST(11.8 AS DOUBLE)
                 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
               - CAST(15.59 AS DOUBLE), 6)
       END AS fk_grade,
       CASE WHEN n_words > 0 AND n_sentences > 0 THEN
         round(CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - CAST(84.6 AS DOUBLE)
                 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
       END AS reading_ease
FROM c"""

    # RAKE: stopword-boundary phrases, corpus word degree/freq frozen to
    # integer micro-scores BEFORE the phrase sum, per-doc top 3
    sql["rake"] = f"""
WITH ex AS MATERIALIZED (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1)
           - 1 AS pos
  FROM documents
),
st AS (
  SELECT doc_id, pos, word,
         list_contains({_NSTOP}, word) AS is_stop
  FROM ex
),
ph0 AS (
  SELECT doc_id, pos, word, is_stop,
         sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS phrase_idx
  FROM st
),
ph AS MATERIALIZED (
  SELECT doc_id, phrase_idx,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS phrase_len
  FROM ph0 WHERE NOT is_stop GROUP BY 1, 2
),
mem AS (
  SELECT doc_id, phrase_idx, phrase_len,
         unnest(string_split(phrase, ' ')) AS word
  FROM ph
),
ws AS (
  SELECT word, (sum(phrase_len) * 1000000) // count(*) AS wscore
  FROM mem GROUP BY 1
),
sc AS (
  SELECT m.doc_id, m.phrase_idx, CAST(sum(w.wscore) AS BIGINT) AS score_micro
  FROM mem m JOIN ws w ON m.word = w.word GROUP BY 1, 2
),
rk AS (
  SELECT p.doc_id, p.phrase, p.phrase_len, s.score_micro,
         row_number() OVER (PARTITION BY p.doc_id
                            ORDER BY s.score_micro DESC, p.phrase ASC) AS rank
  FROM ph p JOIN sc s
    ON p.doc_id = s.doc_id AND p.phrase_idx = s.phrase_idx
)
SELECT doc_id, phrase, phrase_len, score_micro,
       CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= 3"""

    # recrawl scheduling: replay the snapshot arithmetic (presence +
    # version bumps), consecutive-pair digest compare, integer ppm buckets
    sql["recrawl"] = """
WITH snaps AS MATERIALIZED (
  SELECT 'https://' || source || '.example.org/d' || doc_id AS url, s,
         'v' || (CASE WHEN s >= 1 AND (doc_id + 1) % 3 = 0 THEN 1 ELSE 0 END
               + CASE WHEN s >= 2 AND (doc_id + 2) % 3 = 0 THEN 1 ELSE 0 END
               + CASE WHEN s >= 3 AND (doc_id + 3) % 3 = 0 THEN 1 ELSE 0 END)
           AS sha
  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS s)
  WHERE (doc_id + s) % 11 <> 0
),
pres AS (SELECT url, CAST(count(*) AS BIGINT) AS n_snaps FROM snaps GROUP BY 1),
pairs AS (
  SELECT a.url, CAST(count(*) AS BIGINT) AS n_obs_pairs,
         CAST(sum(CASE WHEN a.sha <> b.sha THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changes
  FROM snaps a JOIN snaps b ON a.url = b.url AND b.s = a.s + 1
  GROUP BY 1
)
SELECT p.url, p.n_snaps,
       CAST(coalesce(r.n_obs_pairs, 0) AS BIGINT) AS n_obs_pairs,
       CAST(coalesce(r.n_changes, 0) AS BIGINT) AS n_changes,
       CASE WHEN coalesce(r.n_obs_pairs, 0) > 0
            THEN (r.n_changes * 1000000) // r.n_obs_pairs END AS change_ppm,
       CASE WHEN coalesce(r.n_obs_pairs, 0) = 0 THEN 'unknown'
            WHEN (r.n_changes * 1000000) // r.n_obs_pairs >= 500000 THEN 'fast'
            WHEN (r.n_changes * 1000000) // r.n_obs_pairs > 0 THEN 'medium'
            ELSE 'slow' END AS priority
FROM pres p LEFT JOIN pairs r USING (url)"""

    # TransE scoring (kgops.transe_score, dim=8): integer embedding
    # components from the shared md5-48bit scheme (entity/relation vocabs
    # salted 'ent'/'rel'), int64 L1 reduce per triple.
    sql["transe"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std),
ks AS (SELECT unnest(range(0, 8)) AS k),
terms AS (
  SELECT s.subject, s.predicate, s.object,
    abs((('0x' || substr(md5(s.subject || chr(31) || 'ent' || chr(31)
            || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000)
      + (('0x' || substr(md5(s.predicate || chr(31) || 'rel' || chr(31)
            || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000)
      - (('0x' || substr(md5(s.object || chr(31) || 'ent' || chr(31)
            || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000)) AS term
  FROM spo s CROSS JOIN ks k
)
SELECT subject, predicate, object, CAST(sum(term) AS BIGINT) AS transe_score
FROM terms GROUP BY 1, 2, 3"""

    # DistMult bilinear-diagonal scoring (kgops.distmult_score): same
    # hash-derived integer vectors as transe, per-component PRODUCT
    # h_k * r_k * t_k (each <= 1e9, dim-8 sum <= 8e9 — exact int64).
    sql["kg_distmult"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std),
ks AS (SELECT unnest(range(0, 8)) AS k),
terms AS (
  SELECT s.subject, s.predicate, s.object,
    (('0x' || substr(md5(s.subject || chr(31) || 'ent' || chr(31)
            || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000)
      * (('0x' || substr(md5(s.predicate || chr(31) || 'rel' || chr(31)
            || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000)
      * (('0x' || substr(md5(s.object || chr(31) || 'ent' || chr(31)
            || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000) AS term
  FROM spo s CROSS JOIN ks k
)
SELECT subject, predicate, object, CAST(sum(term) AS BIGINT) AS distmult_score
FROM terms GROUP BY 1, 2, 3"""

    # ComplEx scoring (kgops.complex_score): Re(<h, r, conj(t)>) with
    # real/imag integer vectors from distinct salts (ent/enti, rel/reli);
    # per-dim 4-term expansion, all int64.
    def _cvec(col, salt):
        return (
            f"(('0x' || substr(md5({col} || chr(31) || '{salt}' || chr(31)"
            f" || CAST(k.k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000)"
        )

    sql["kg_complex"] = _PRELUDE_INFER + _STD_CTES + f"""
, spo AS (SELECT DISTINCT subject, predicate, object FROM std),
ks AS (SELECT unnest(range(0, 8)) AS k),
terms AS (
  SELECT s.subject, s.predicate, s.object,
      {_cvec('s.subject', 'ent')} * {_cvec('s.predicate', 'rel')}
        * {_cvec('s.object', 'ent')}
    + {_cvec('s.subject', 'enti')} * {_cvec('s.predicate', 'rel')}
        * {_cvec('s.object', 'enti')}
    + {_cvec('s.subject', 'enti')} * {_cvec('s.predicate', 'reli')}
        * {_cvec('s.object', 'ent')}
    - {_cvec('s.subject', 'ent')} * {_cvec('s.predicate', 'reli')}
        * {_cvec('s.object', 'enti')} AS term
  FROM spo s CROSS JOIN ks k
)
SELECT subject, predicate, object, CAST(sum(term) AS BIGINT) AS complex_score
FROM terms GROUP BY 1, 2, 3"""

    # Filtered link-prediction eval (kgops.link_prediction_eval): 1/8 md5
    # test sample; true tail ranked against EVERY entity by TransE score,
    # candidates that form another true (h, r, e) excluded (the filtered
    # protocol); ties break by candidate name; reciprocal ranks freeze to
    # 1e6 DIV rank BEFORE the per-predicate integer mean.
    sql["kg_mrr"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS MATERIALIZED (SELECT DISTINCT subject, predicate, object FROM std),
ks AS (SELECT unnest(range(0, 8)) AS k),
enames AS MATERIALIZED (
  SELECT DISTINCT name FROM (
    SELECT subject AS name FROM spo
    UNION ALL SELECT object FROM spo)),
ev AS MATERIALIZED (
  SELECT name, k, ('0x' || substr(md5(name || chr(31) || 'ent' || chr(31)
      || CAST(k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000 AS c
  FROM enames CROSS JOIN ks),
rv AS MATERIALIZED (
  SELECT name, k, ('0x' || substr(md5(name || chr(31) || 'rel' || chr(31)
      || CAST(k AS VARCHAR)), 1, 12))::BIGINT % 2001 - 1000 AS c
  FROM (SELECT DISTINCT predicate AS name FROM spo) CROSS JOIN ks),
test AS (
  SELECT * FROM spo
  WHERE ('0x' || substr(md5(subject || chr(31) || predicate || chr(31)
      || object), 1, 12))::BIGINT % 8 = 0),
hr AS MATERIALIZED (
  SELECT t.subject, t.predicate, t.object, h.k, h.c + r.c AS hr
  FROM test t
  JOIN ev h ON h.name = t.subject
  JOIN rv r ON r.name = t.predicate AND r.k = h.k),
strue AS (
  SELECT h.subject, h.predicate, h.object,
         CAST(sum(abs(h.hr - te.c)) AS BIGINT) AS s_true
  FROM hr h JOIN ev te ON te.name = h.object AND te.k = h.k
  GROUP BY 1, 2, 3),
scand AS (
  SELECT h.subject, h.predicate, h.object, c.name AS e,
         CAST(sum(abs(h.hr - c.c)) AS BIGINT) AS s
  FROM hr h JOIN ev c ON c.k = h.k
  GROUP BY 1, 2, 3, 4),
ranked AS (
  SELECT s.subject, s.predicate, s.object,
    CAST(1 + sum(CASE WHEN (kn.known IS NULL OR c.e = s.object)
                       AND (c.s < s.s_true
                            OR (c.s = s.s_true AND c.e < s.object))
                 THEN 1 ELSE 0 END) AS BIGINT) AS rnk
  FROM strue s
  JOIN scand c USING (subject, predicate, object)
  LEFT JOIN (SELECT subject, predicate, object AS e, 1 AS known FROM spo) kn
    ON kn.subject = s.subject AND kn.predicate = s.predicate AND kn.e = c.e
  GROUP BY 1, 2, 3)
SELECT predicate, CAST(count(*) AS BIGINT) AS n_test,
  CAST(CAST(sum(1000000 // rnk) AS BIGINT) // count(*) AS BIGINT)
    AS mrr_micro,
  CAST(sum(CASE WHEN rnk <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits1,
  CAST(sum(CASE WHEN rnk <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS hits3,
  CAST(sum(CASE WHEN rnk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits10
FROM ranked GROUP BY 1"""

    # N-Triples serialization (triples_io.ntriples_lines): ECHAR escape
    # chain shared literal-for-literal with NTRIPLES_ESCAPES (backslash
    # FIRST), IRIs percent-encode the one IRI-illegal byte (space).
    sql["ntriples"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS (SELECT DISTINCT subject, predicate, object FROM std)
SELECT '<http://kg.local/e/' || replace(subject, ' ', '%20') || '> '
  || '<http://kg.local/p/' || replace(predicate, ' ', '%20') || '> "'
  || replace(replace(replace(replace(object,
       chr(92), chr(92) || chr(92)),
       '"', chr(92) || '"'),
       chr(10), chr(92) || 'n'),
       chr(9), chr(92) || 't')
  || '" .' AS line
FROM spo"""

    # SPARQL property path (kgops.match_property_path): the fixed path
    # (group+ / (join|sort)) unrolled — plus = 3 chained hops, every
    # combinator distinct-ed (set semantics on both engines).
    sql["property_path"] = _PRELUDE_INFER + _STD_CTES + """
, spo AS MATERIALIZED (SELECT DISTINCT subject, predicate, object FROM std),
g AS MATERIALIZED (
  SELECT DISTINCT subject AS src, object AS dst FROM spo
  WHERE predicate = 'group'),
g2 AS (SELECT DISTINCT a.src, b.dst FROM g a JOIN g b ON a.dst = b.src),
g3 AS (SELECT DISTINCT a.src, b.dst FROM g2 a JOIN g b ON a.dst = b.src),
plusg AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM g
    UNION ALL SELECT src, dst FROM g2
    UNION ALL SELECT src, dst FROM g3)),
altjs AS MATERIALIZED (
  SELECT DISTINCT subject AS src, object AS dst FROM spo
  WHERE predicate IN ('join', 'sort'))
SELECT DISTINCT p.src AS src, a.dst AS dst
FROM plusg p JOIN altjs a ON p.dst = a.src"""

    # Entity alignment (kgops.align_entities): shared-context counts
    # between the [0,40) and [10,50) crawl-batch KGs; argmax per
    # A-entity, (score desc, entity_b asc) tie-break; n_shared taken
    # from the selected row (min_by), not a row mix.
    sql["kg_align"] = _PRELUDE_INFER + """
, oldg AS MATERIALIZED (SELECT DISTINCT subject, predicate, object
    FROM triples1 WHERE doc_id < 40),
newg AS MATERIALIZED (SELECT DISTINCT subject, predicate, object
    FROM triples1 WHERE doc_id >= 10 AND doc_id < 50),
ca AS MATERIALIZED (
  SELECT DISTINCT entity_a, fact FROM (
    SELECT subject AS entity_a,
           'o' || chr(31) || predicate || chr(31) || object AS fact
    FROM oldg
    UNION ALL
    SELECT object, 'i' || chr(31) || subject || chr(31) || predicate
    FROM oldg)),
cb AS MATERIALIZED (
  SELECT DISTINCT entity_b, fact FROM (
    SELECT subject AS entity_b,
           'o' || chr(31) || predicate || chr(31) || object AS fact
    FROM newg
    UNION ALL
    SELECT object, 'i' || chr(31) || subject || chr(31) || predicate
    FROM newg)),
sizes AS (SELECT entity_a, CAST(count(*) AS BIGINT) AS n_ctx
          FROM ca GROUP BY 1),
shared AS (
  SELECT ca.entity_a, cb.entity_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM ca JOIN cb USING (fact) GROUP BY 1, 2 HAVING count(*) >= 2),
scored AS (
  SELECT s.entity_a, s.entity_b, s.n_shared,
         CAST(s.n_shared * 1000000 // z.n_ctx AS BIGINT) AS score_ppm
  FROM shared s JOIN sizes z USING (entity_a)),
best AS (SELECT entity_a, max(score_ppm) AS b FROM scored GROUP BY 1)
SELECT s.entity_a, min(s.entity_b) AS entity_b,
       CAST(min_by(s.n_shared, s.entity_b) AS BIGINT) AS n_shared,
       CAST(max(s.score_ppm) AS BIGINT) AS score_ppm
FROM scored s JOIN best b ON s.entity_a = b.entity_a AND s.score_ppm = b.b
GROUP BY 1"""

    # SHACL-lite cardinality validation (kgops.validate_shapes): one
    # UNION ALL branch per shape in the shared SHACL_SHAPES table;
    # violations only; counts over DISTINCT (s,p,o).
    _shacl_branches = []
    for _sid, _target, _kind, _pred, _n in SHACL_SHAPES:
        _cmp = "<" if _kind == "min_count" else ">"
        _shacl_branches.append(f"""
SELECT CAST({_sid} AS BIGINT) AS shape_id, t.entity,
       '{_kind}' AS check_kind, '{_pred}' AS pred,
       CAST(coalesce(c.have, 0) AS BIGINT) AS have,
       CAST({_n} AS BIGINT) AS want
FROM (SELECT DISTINCT subject AS entity FROM spo
      WHERE predicate = '{_target}') t
LEFT JOIN (SELECT subject AS entity, CAST(count(*) AS BIGINT) AS have
           FROM spo WHERE predicate = '{_pred}' GROUP BY 1) c
  USING (entity)
WHERE coalesce(c.have, 0) {_cmp} {_n}""")
    sql["kg_shacl"] = (
        _PRELUDE_INFER + _STD_CTES
        + "\n, spo AS MATERIALIZED (SELECT DISTINCT subject, predicate,"
          " object FROM std)\n"
        + "\nUNION ALL\n".join(_shacl_branches)
    )

    # column profiler (stats.profile_columns): one aggregate per column in
    # long format; min/max on the NATIVE type, cast to VARCHAR afterwards.
    sql["profile"] = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
  CAST(coalesce(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_nulls,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(min({c}) AS VARCHAR) AS min_str, CAST(max({c}) AS VARCHAR) AS max_str
FROM documents"""
        for c in ["doc_id", "text", "lang", "source", "n_chars"]
    )

    # Dunning LLR distinctive terms (textstats.llr_keywords): each x*ln(x)
    # term frozen to round(x*ln(x)*1000) int64 BEFORE the signed sum so no
    # float accumulation order can flip a result; per-source top 5.
    def _xlx(x):
        return (
            f"CASE WHEN {x} > 0 THEN CAST(round(CAST({x} AS DOUBLE)"
            f" * ln(CAST({x} AS DOUBLE)) * 1000.0) AS BIGINT) ELSE 0 END"
        )

    _llr_terms = " + ".join(
        [_xlx("aa"), _xlx("bb"), _xlx("cc"), _xlx("dd")]
    ) + " - " + " - ".join(
        [_xlx("aa + bb"), _xlx("cc + dd"), _xlx("aa + cc"), _xlx("bb + dd")]
    ) + " + " + _xlx("nn")
    sql["llr_keywords"] = f"""
WITH tok AS MATERIALIZED (
  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
),
a AS (SELECT source, word, CAST(count(*) AS BIGINT) AS aa FROM tok GROUP BY 1, 2),
wt AS (SELECT word, CAST(count(*) AS BIGINT) AS wtc FROM tok GROUP BY 1),
st AS (SELECT source, CAST(count(*) AS BIGINT) AS stc FROM tok GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM tok),
j AS (
  SELECT a.source, a.word, a.aa, wt.wtc - a.aa AS bb, st.stc - a.aa AS cc,
         n.nn - wt.wtc - st.stc + a.aa AS dd, n.nn
  FROM a JOIN wt USING (word) JOIN st ON a.source = st.source CROSS JOIN n
  WHERE a.aa >= 5
    AND CAST(a.aa AS DOUBLE) * CAST(n.nn AS DOUBLE)
        > CAST(wt.wtc AS DOUBLE) * CAST(st.stc AS DOUBLE)
),
sc AS (
  SELECT source, word, aa AS n_in_source,
         2 * ({_llr_terms}) AS llr_milli
  FROM j
),
r AS (
  SELECT source, word, n_in_source, llr_milli,
         row_number() OVER (PARTITION BY source
                            ORDER BY llr_milli DESC, word ASC) AS rank
  FROM sc
)
SELECT source, word, n_in_source, CAST(llr_milli AS BIGINT) AS llr_milli,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5"""

    # TextRank (textstats.textrank_keywords): integer-micro PageRank over
    # the adjacent-content-word graph. The recursion is pure int64 on both
    # sides (pr0 = 1e12 // n; pr' = 15e10 // n + 85*mass // 100 with
    # mass = sum(pr // deg)), so the unrolled fixpoint is bit-exact —
    # no round() anywhere, unlike the float pagerank oracle.
    _tr_iters = []
    _tprev = "tr0"
    for _k in range(1, 6):
        _tr_iters.append(f""",
tmass{_k} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(sum(p.pr // o.deg) AS BIGINT) AS m
  FROM e JOIN {_tprev} p ON e.src = p.node JOIN deg o ON e.src = o.src
  GROUP BY e.dst
),
tr{_k} AS MATERIALIZED (
  SELECT n.node,
         CAST(150000000000 AS BIGINT) // (SELECT n FROM nn)
         + (85 * COALESCE(m.m, 0)) // 100 AS pr
  FROM nodes n LEFT JOIN tmass{_k} m ON n.node = m.node
)""")
        _tprev = f"tr{_k}"
    sql["textrank"] = (
        f"""
WITH dw AS MATERIALIZED (
  SELECT list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                     w -> len(w) >= 3 AND NOT list_contains({_NSTOP}, w)) AS ws
  FROM documents
),
adj AS (
  SELECT ws[i] AS a, ws[i+1] AS b
  FROM dw, UNNEST(range(1, len(ws))) AS r(i)
  WHERE len(ws) >= 2
),
ue AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM adj WHERE a <> b
),
e AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM ue UNION ALL SELECT b, a FROM ue
),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src
),
tr0 AS MATERIALIZED (
  SELECT node, CAST(1000000000000 AS BIGINT) // (SELECT n FROM nn) AS pr
  FROM nodes
)"""
        + "".join(_tr_iters)
        + f"""
SELECT node AS word, CAST(pr AS BIGINT) AS tr_micro,
       CAST(row_number() OVER (ORDER BY pr DESC, node ASC) AS BIGINT) AS rank
FROM {_tprev} ORDER BY pr DESC, node ASC LIMIT 50"""
    )

    # fuzzy ER pairs (standardize.fuzzy_entity_pairs): prefix-2 block +
    # length band + levenshtein <= 2. The typo fixture (delete char at
    # (h48 % len) + 1 for md5-first-hex 0-7 entities) is replayed
    # literally; ASCII gate on both sides (Spark levenshtein counts
    # codepoints, DuckDB counts bytes).
    sql["fuzzy_pairs"] = _PRELUDE_INFER + _STD_CTES + """
, base AS MATERIALIZED (
  SELECT DISTINCT entity FROM (
    SELECT subject AS entity FROM std UNION ALL SELECT object FROM std)
),
noisy AS (
  SELECT concat(substr(entity, 1, p - 1), substr(entity, p + 1)) AS entity
  FROM (
    SELECT entity,
           CAST(('0x' || substr(md5(entity), 1, 12))::BIGINT
                % len(entity) + 1 AS INT) AS p
    FROM base WHERE substr(md5(entity), 1, 1) BETWEEN '0' AND '7')
),
ents AS MATERIALIZED (
  SELECT entity, substr(entity, 1, 2) AS blk FROM (
    SELECT DISTINCT entity FROM (
      SELECT entity FROM base UNION ALL SELECT entity FROM noisy)
  ) WHERE len(entity) >= 4 AND NOT regexp_matches(entity, '[^ -~]')
),
okb AS (SELECT blk FROM ents GROUP BY blk HAVING count(*) <= 1000)
SELECT x.entity AS entity_a, y.entity AS entity_b,
       CAST(levenshtein(x.entity, y.entity) AS BIGINT) AS edit_dist
FROM ents x JOIN okb USING (blk) JOIN ents y USING (blk)
WHERE x.entity < y.entity
  AND abs(len(x.entity) - len(y.entity)) <= 2
  AND levenshtein(x.entity, y.entity) <= 2"""

    # Markov transitions (events.markov_transitions): per-user lead over
    # (ts, event_id); source-conditional probability frozen to ppm ints.
    sql["markov"] = """
WITH s AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
c AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM s WHERE dst IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT src, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.src AS src_event, c.dst AS dst_event, c.n AS n_transitions,
       CAST((c.n * 1000000) // t.tot AS BIGINT) AS prob_ppm
FROM c JOIN t USING (src)"""

    # range join (events.range_join): the oracle is the NAIVE theta join
    # the engine's two-bucket plan must reproduce exactly.
    sql["range_join"] = """
WITH l AS (
  SELECT user_id, event_id AS left_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS lt
  FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, event_id AS right_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS rt
  FROM events WHERE event_type = 'purchase'
)
SELECT l.user_id, l.left_id, r.right_id,
       CAST(r.rt - l.lt AS BIGINT) AS gap_sec
FROM l JOIN r ON l.user_id = r.user_id
             AND r.rt >= l.lt AND r.rt - l.lt <= 3600"""

    # symmetric-predicate discovery (kgops.predicate_symmetry), over the
    # inferred (dedup) graph like rule_mining.
    sql["pred_symmetry"] = _PRELUDE_INFER + _STD_CTES + _INFER_CTES + """
, spo AS MATERIALIZED (SELECT DISTINCT subject, predicate, object FROM dedup),
g AS (
  SELECT s.predicate, CAST(count(*) AS BIGINT) AS n_edges,
         CAST(sum(CASE WHEN r.subject IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_sym
  FROM spo s LEFT JOIN spo r
    ON s.predicate = r.predicate AND s.subject = r.object
   AND s.object = r.subject
  GROUP BY s.predicate
)
SELECT predicate, n_edges, n_sym,
       CAST((n_sym * 1000000) // n_edges AS BIGINT) AS sym_ppm
FROM g WHERE n_edges >= 2"""

    # inverse-predicate rules (kgops.predicate_inverses), min_support=1,
    # over the inferred (dedup) graph (empty over std — measured).
    sql["pred_inverse"] = _PRELUDE_INFER + _STD_CTES + _INFER_CTES + """
, spo AS MATERIALIZED (SELECT DISTINCT subject, predicate, object FROM dedup),
sup AS (
  SELECT a.predicate, b.predicate AS inverse,
         CAST(count(*) AS BIGINT) AS n_support
  FROM spo a JOIN spo b
    ON a.subject = b.object AND a.object = b.subject
   AND a.predicate <> b.predicate
  GROUP BY 1, 2
),
np AS (SELECT predicate, CAST(count(*) AS BIGINT) AS n_p FROM spo GROUP BY 1)
SELECT s.predicate, s.inverse, s.n_support, np.n_p,
       CAST((s.n_support * 1000000) // np.n_p AS BIGINT) AS conf_ppm
FROM sup s JOIN np USING (predicate)
WHERE s.n_support >= 1"""

    # tokenizer compression eval (tokenizer.bpe_compression_stats): the
    # bpe_encode chain with a corpus-stats final select.
    sql["bpe_eval"] = _bpe_eval_oracle_sql(8)

    # per-source integer-moment length outliers (stats.length_outliers):
    # the shared _OUTLIER_SQL inequality, k = 2.
    from ai_knowledge_graph_spark.operators.stats import _OUTLIER_SQL

    sql["outliers"] = f"""
WITH base AS (
  SELECT source AS grp, doc_id, CAST(n_chars AS BIGINT) AS x FROM documents
),
mom AS (
  SELECT grp, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM base GROUP BY grp
)
SELECT b.grp AS source, b.doc_id, b.x AS n_chars
FROM base b JOIN mom m USING (grp)
WHERE {_OUTLIER_SQL.format(k2=4)}"""

    # head token coverage (textstats.vocab_coverage) at k = 5/10/20.
    sql["coverage"] = """
WITH tok AS MATERIALIZED (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
tot AS (SELECT greatest(CAST(count(*) AS BIGINT), 1) AS t FROM tok),
cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS k
  FROM cnt ORDER BY c DESC, w ASC LIMIT 20
),
r AS (
  SELECT k, CAST(sum(c) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS top_tokens
  FROM top
)
SELECT CAST(k AS BIGINT) AS k, top_tokens,
       CAST((top_tokens * 1000000) // (SELECT t FROM tot) AS BIGINT)
         AS cover_ppm
FROM r WHERE k IN (5, 10, 20)"""

    # Katz centrality (centrality.katz_centrality): x0 = 0, five unrolled
    # rounds of x' = 1e6 + sum(in x) // 10 — pure int64, bit-exact.
    _katz_iters = []
    _kprev = "k0"
    for _k in range(1, 6):
        _katz_iters.append(f""",
km{_k} AS MATERIALIZED (
  SELECT e.dst AS node, CAST(sum(p.x) AS BIGINT) AS m
  FROM e JOIN {_kprev} p ON e.src = p.node GROUP BY e.dst
),
k{_k} AS MATERIALIZED (
  SELECT n.node, 1000000 + COALESCE(m.m, 0) // 10 AS x
  FROM nodes n LEFT JOIN km{_k} m ON n.node = m.node
)""")
        _kprev = f"k{_k}"
    sql["katz"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (SELECT subject AS src, object AS dst FROM std),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
k0 AS MATERIALIZED (SELECT node, CAST(0 AS BIGINT) AS x FROM nodes)"""
        + "".join(_katz_iters)
        + f"""
SELECT node AS entity, CAST(x AS BIGINT) AS katz_micro FROM {_kprev}"""
    )

    # rendezvous sharding (sampling.rendezvous_shards): per-key max of the
    # (h48, shard) pair over 8 candidate shards; engine's array_max struct
    # order == oracle's (h DESC, shard DESC) row_number.
    sql["shards"] = """
WITH s AS (
  SELECT doc_id, i AS shard,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(31)
                             || CAST(i AS VARCHAR)), 1, 12))::BIGINT AS h
  FROM documents, UNNEST(range(0, 8)) r(i)
),
a AS (
  SELECT doc_id, shard,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, shard DESC) AS rn
  FROM s
)
SELECT CAST(shard AS INT) AS shard, CAST(count(*) AS BIGINT) AS n_rows
FROM a WHERE rn = 1 GROUP BY 1"""

    # PMI collocations (textstats.word_collocations): shared _PMI_SQL
    # expression, bigram-slot marginals, bounded top-20.
    from ai_knowledge_graph_spark.operators.textstats import _PMI_SQL

    sql["collocations"] = f"""
WITH dw AS MATERIALIZED (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
pairs AS MATERIALIZED (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM dw, UNNEST(range(1, len(ws))) AS r(i)
  WHERE len(ws) >= 2
),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM pairs GROUP BY 1, 2),
lft AS (SELECT w1, CAST(count(*) AS BIGINT) AS nl FROM pairs GROUP BY 1),
rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS nr FROM pairs GROUP BY 1),
tot AS (SELECT greatest(CAST(count(*) AS BIGINT), 1) AS N FROM pairs),
sc AS (
  SELECT b.w1, b.w2, b.n12, {_PMI_SQL} AS pmi_micro
  FROM (SELECT b0.*, l.nl, r.nr, (SELECT N FROM tot) AS N
        FROM big b0 JOIN lft l USING (w1) JOIN rgt r USING (w2)
        WHERE b0.n12 >= 5) b
)
SELECT w1, w2, n12, pmi_micro,
       CAST(row_number() OVER (ORDER BY pmi_micro DESC, w1, w2) AS BIGINT)
         AS rank
FROM sc ORDER BY pmi_micro DESC, w1, w2 LIMIT 20"""

    # blocklist gate (curation.blocklist_hits): lower + leet translate +
    # token join against the VALUES blocklist; same maps both sides.
    _bl_terms = ", ".join(f"('{t}')" for t in BLOCKLIST_TERMS)
    sql["blocklist"] = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(
           translate(lower(text), '013457', 'oieast'), '[a-z]+')) AS term
  FROM documents
)
SELECT t.doc_id, t.term, CAST(count(*) AS BIGINT) AS n_hits
FROM tok t JOIN (VALUES {_bl_terms}) b(term) USING (term)
GROUP BY 1, 2"""

    # Zipf-law slope (textstats.zipf_fit): int64 moments over micro-frozen
    # ln of the top-100 (freq, rank) head; the one float step is the final
    # division, round(6) both sides.
    sql["zipf"] = """
WITH cnt AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
    FROM documents)
  GROUP BY w
),
top AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rank
  FROM cnt ORDER BY c DESC, w ASC LIMIT 100
),
xy AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
  FROM top
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS nr, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy
)
SELECT nr AS n_ranks,
  CASE WHEN nr * sxx - sx * sx <> 0 THEN
    round(CAST(nr * sxy - sx * sy AS DOUBLE)
          / CAST(nr * sxx - sx * sx AS DOUBLE), 6) END AS slope
FROM m"""

    # Dirichlet query-likelihood retrieval (ranking.dirichlet_lm_rank):
    # the per-term expression is the module's _DIRICHLET_TERM_SQL applied
    # VERBATIM on both sides (same float op order by construction).
    from ai_knowledge_graph_spark.operators.ranking import (
        _DIRICHLET_TERM_SQL,
    )

    _qlm_terms = ", ".join(f"('{t}')" for t in BM25_QUERY)
    sql["qlm"] = f"""
WITH dw AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS len FROM dw),
ctot AS (
  SELECT greatest(CAST((SELECT COALESCE(sum(len(ws)), 0) FROM dw) AS BIGINT),
                  1) AS C
),
tokq AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(ws, w -> list_contains(
           [{", ".join("'" + t + "'" for t in BM25_QUERY)}], w))) AS w
  FROM dw
),
cfr AS (SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tokq GROUP BY w),
terms AS (
  SELECT t.w, COALESCE(cfr.cf, 0) AS cf
  FROM (VALUES {_qlm_terms}) t(w) LEFT JOIN cfr USING (w)
),
tfr AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM tokq GROUP BY 1, 2
),
rowsq AS (
  SELECT l.doc_id, COALESCE(f.tf, 0) AS tf, t.cf AS cf, l.len AS len,
         (SELECT C FROM ctot) AS C
  FROM lens l CROSS JOIN terms t
  LEFT JOIN tfr f ON l.doc_id = f.doc_id AND t.w = f.w
),
agg AS (
  SELECT doc_id,
         CAST(sum({_DIRICHLET_TERM_SQL.format(mu=2000)}) AS BIGINT)
           AS qlm_micro
  FROM rowsq GROUP BY doc_id
)
SELECT doc_id, qlm_micro,
       CAST(row_number() OVER (ORDER BY qlm_micro DESC, doc_id ASC)
            AS BIGINT) AS rank
FROM agg ORDER BY qlm_micro DESC, doc_id ASC LIMIT 20"""

    # in-session event trigrams (events.session_paths): the sessions CTE
    # chain (same gap rule as sql["sessions"]) + two leads per (user,
    # session), global bounded top-10.
    sql["session_paths"] = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), f AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                 THEN 1 ELSE 0 END AS ns
  FROM o
), x AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS idx
  FROM f
), tri AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id, idx
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id, idx
                                   ORDER BY ts, event_id) AS e3
  FROM x
), c AS (
  SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths
  FROM tri WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
)
SELECT e1, e2, e3, n_paths,
  CAST(row_number() OVER (ORDER BY n_paths DESC, e1, e2, e3) AS BIGINT)
    AS rank
FROM c ORDER BY n_paths DESC, e1, e2, e3 LIMIT 10"""

    # nDCG@5 of the SRP ANN ranking vs the exact-cosine gold ranking
    # (ranking.ndcg_at_k): gain = 6 - gold rank; the log2 discount table
    # is frozen to the SAME integer literals the engine computes in the
    # driver (runtime log2 differs across libms in the last ulp).
    import math as _math

    _ndcg_w = {
        r: int(round(1_000_000 / _math.log2(r + 1))) for r in range(1, 6)
    }
    _ndcg_idcg = sum((6 - r) * _ndcg_w[r] for r in range(1, 6))
    _ndcg_case = " ".join(f"WHEN {r} THEN {v}" for r, v in _ndcg_w.items())
    sql["ndcg"] = f"""
WITH run AS MATERIALIZED (
  SELECT query_id, neighbor_id, rk FROM ({sql["srp_topk"]})
),
gold AS MATERIALIZED (
  SELECT query_id, neighbor_id, CAST(6 - rk AS BIGINT) AS gain
  FROM ({sql["embedding_topk"]})
),
d AS (
  SELECT r.query_id,
         CAST(sum(COALESCE(g.gain, 0) * (CASE r.rk {_ndcg_case} END))
              AS BIGINT) AS dcg_micro
  FROM run r LEFT JOIN gold g
    ON r.query_id = g.query_id AND r.neighbor_id = g.neighbor_id
  GROUP BY r.query_id
)
SELECT query_id, dcg_micro,
       CAST((dcg_micro * 1000000) // {_ndcg_idcg} AS BIGINT) AS ndcg_ppm
FROM d"""

    # ER-pair confusion vs the injected-typo gold (dedup.dedup_eval):
    # pred = the fuzzy_pairs statement verbatim; gold = the same typo
    # injection, kept only where both sides pass the operator's gates
    # (len >= 4 + ASCII), so FN counts exactly the prefix-block misses.
    sql["er_eval"] = f"""
WITH pred AS MATERIALIZED (
  SELECT least(entity_a, entity_b) AS a, greatest(entity_a, entity_b) AS b
  FROM ({sql["fuzzy_pairs"]}) GROUP BY 1, 2
),
gold AS MATERIALIZED (
  SELECT least(entity, v) AS a, greatest(entity, v) AS b FROM (
    SELECT entity, concat(substr(entity, 1, p - 1), substr(entity, p + 1)) AS v
    FROM (
      SELECT entity,
             CAST(('0x' || substr(md5(entity), 1, 12))::BIGINT
                  % len(entity) + 1 AS INT) AS p
      FROM ({_PRELUDE_INFER + _STD_CTES}
            SELECT DISTINCT entity FROM (
              SELECT subject AS entity FROM std
              UNION ALL SELECT object FROM std))
      WHERE substr(md5(entity), 1, 1) BETWEEN '0' AND '7')
  ) WHERE v <> entity AND len(v) >= 4
        AND NOT regexp_matches(entity, '[^ -~]')
  GROUP BY 1, 2
),
j AS (
  SELECT p.a IS NOT NULL AS in_p, g.a IS NOT NULL AS in_g
  FROM pred p FULL OUTER JOIN gold g ON p.a = g.a AND p.b = g.b
),
c AS (
  SELECT
    CAST(COALESCE(sum(CASE WHEN in_p AND in_g THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
    CAST(COALESCE(sum(CASE WHEN in_p AND NOT in_g THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
    CAST(COALESCE(sum(CASE WHEN in_g AND NOT in_p THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn
  FROM j
)
SELECT tp, fp, fn,
  CASE WHEN tp + fp > 0 THEN CAST((tp * 1000000) // (tp + fp) AS BIGINT) END
    AS precision_ppm,
  CASE WHEN tp + fn > 0 THEN CAST((tp * 1000000) // (tp + fn) AS BIGINT) END
    AS recall_ppm
FROM c"""

    # centroid extractive summarization (textstats.centroid_summaries):
    # 15-word windows, nano-frozen corpus word probabilities, top-1 per
    # doc by (score desc, seg_idx asc). Short docs (< 15 words) drop on
    # both sides (Spark sequence guard == empty DuckDB range).
    sql["summarize"] = f"""
WITH dw AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
tok AS MATERIALIZED (
  SELECT unnest(list_filter(ws, w -> NOT list_contains({_NSTOP}, w))) AS w
  FROM dw
),
cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
tot AS (SELECT greatest(CAST(count(*) AS BIGINT), 1) AS t FROM tok),
p AS MATERIALIZED (
  SELECT w, (c * 1000000000) // (SELECT t FROM tot) AS p_nano FROM cnt
),
segs AS MATERIALIZED (
  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
         list_slice(ws, (i - 1) * 15 + 1, i * 15) AS seg
  FROM dw, UNNEST(range(1, len(ws) // 15 + 1)) AS r(i)
  WHERE len(ws) >= 15
),
sw AS (
  SELECT doc_id, seg_idx,
         unnest(list_filter(seg, w -> NOT list_contains({_NSTOP}, w))) AS w
  FROM segs
),
sc AS (
  SELECT doc_id, seg_idx, CAST(sum(p.p_nano) // 15 AS BIGINT) AS score_nano
  FROM sw JOIN p USING (w) GROUP BY 1, 2
),
r AS (
  SELECT s.doc_id, s.seg_idx, array_to_string(s.seg, ' ') AS summary,
         COALESCE(sc.score_nano, 0) AS score_nano,
         row_number() OVER (
           PARTITION BY s.doc_id
           ORDER BY COALESCE(sc.score_nano, 0) DESC, s.seg_idx ASC) AS rn
  FROM segs s LEFT JOIN sc ON s.doc_id = sc.doc_id AND s.seg_idx = sc.seg_idx
)
SELECT doc_id, seg_idx, summary, CAST(score_nano AS BIGINT) AS score_nano
FROM r WHERE rn = 1"""

    # --- event analytics + deterministic sampling -----------------------

    sql["asof_purchase_signup"] = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
s AS (SELECT * FROM events WHERE event_type = 'signup'),
j AS (
  SELECT p.event_id, s.event_id AS anchor_event_id,
         CAST(floor(epoch(p.ts)) - floor(epoch(s.ts)) AS BIGINT) AS gap_sec,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY s.ts DESC, s.event_id DESC) AS rn
  FROM p JOIN s ON p.user_id = s.user_id AND s.ts <= p.ts
)
SELECT p.event_id, j.anchor_event_id, j.gap_sec
FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON p.event_id = j.event_id"""

    sql["sessions"] = """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), f AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                 THEN 1 ELSE 0 END AS ns
  FROM o
), x AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS idx
  FROM f
)
SELECT CAST(user_id AS VARCHAR) || '-' || CAST(idx AS VARCHAR) AS session_id,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_sec,
       round(sum(value), 6) AS total_value
FROM x GROUP BY user_id, idx"""

    sql["event_windows"] = """
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start_sec,
       event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2"""

    # streaming late-data replay (windowed_event_counts_late semantics):
    # kept = batches 0 and 1 (batch 2 is dropped whole by the lagged late
    # filter); emitted windows are those ending at or before the final
    # watermark = ms-floored max kept event time minus the 2 h delay.
    sql["stream_late"] = """
WITH kept AS (
  SELECT ts, event_type, value FROM events
  WHERE (event_id % 2 = 0 AND ts < TIMESTAMP '2024-01-21')
     OR ts >= TIMESTAMP '2024-01-21'
), wm AS (
  SELECT (epoch_us(max(ts)) // 1000) * 1000 - 7200000000 AS wm_us FROM kept
), g AS (
  SELECT (epoch_us(ts) // 1000000 // 3600) * 3600 AS ws_sec, event_type,
         CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS total_value
  FROM kept GROUP BY 1, 2
)
SELECT CAST(ws_sec AS BIGINT) AS window_start_sec, event_type, n, total_value
FROM g, wm WHERE (ws_sec + 3600) * 1000000 <= wm.wm_us"""

    _bucket = (
        "(('0x' || substr(md5(CAST({k} AS VARCHAR) || ':{salt}'), 1, 8))::BIGINT"
        " % 10000)"
    )
    _rate_case = (
        "CASE "
        + " ".join(
            f"WHEN lang = '{lang}' THEN {int(rate * 10000)}"
            for lang, rate in sorted(SAMPLE_RATES.items())
        )
        + " ELSE 7500 END"
    )
    sql["stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE {_bucket.format(k='doc_id', salt='stratified')} < {_rate_case}"""

    sql["hash_split"] = f"""
SELECT doc_id,
       CASE WHEN {_bucket.format(k='doc_id', salt='split')} < 9000 THEN 'train'
            WHEN {_bucket.format(k='doc_id', salt='split')} < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents"""

    # Composed curation funnel: reuses the minhash-LSH + closure fragments
    # scoped to the filtered survivor set (replace the corpus source), so
    # every gate matches curation.curate_corpus stage-for-stage.
    _split_case = (
        f"CASE WHEN {_bucket.format(k='d.doc_id', salt='split')} < 9000 THEN 'train' "
        f"WHEN {_bucket.format(k='d.doc_id', salt='split')} < 9500 THEN 'val' "
        "ELSE 'test' END"
    )
    sql["line_dedup"] = """
WITH synth AS (
  SELECT doc_id,
    'HOME | ABOUT | CONTACT' || chr(10) || text || chr(10) ||
      'Copyright ' || source AS text
  FROM documents
), l AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM synth
), e AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ls) + 1),
                i -> struct_pack(pos := i, ln := ls[i])), recursive := true)
  FROM l
), hot AS (
  SELECT ln FROM e GROUP BY ln HAVING count(*) > 2
), kept AS (
  SELECT doc_id, pos, ln FROM e WHERE ln NOT IN (SELECT ln FROM hot)
), reb AS (
  SELECT doc_id, string_agg(ln, chr(10) ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS n_lines FROM e GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(r.text, '') AS text,
       CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(t.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped
FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id"""

    sql["classifier_score"] = r"""
WITH w AS (
  SELECT i AS bucket,
         ('0x'||substr(md5(CAST(i AS VARCHAR)),1,8))::BIGINT % 2001 - 1000
           AS weight
  FROM range(4096) t(i)
), tok AS (
  SELECT doc_id, ('0x'||substr(md5(t),1,8))::BIGINT % 4096 AS bucket
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS t
    FROM documents
  )
), s AS (
  SELECT doc_id, sum(weight) AS sm
  FROM tok JOIN w USING (bucket) GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(len(list_filter(string_split_regex(lower(d.text), '\s+'),
           x -> x <> '')) AS BIGINT) AS n_tokens,
  CAST(COALESCE(s.sm, 0) AS BIGINT) AS raw_score,
  round(1.0 / (1.0 + exp(-(COALESCE(s.sm, 0) / 1000.0))), 6) AS score
FROM documents d LEFT JOIN s USING (doc_id)"""

    sql["mix_corpus"] = """
WITH q AS (
  SELECT * FROM (VALUES ('src0', 60), ('src1', 25), ('src2', 13), ('src3', 5))
    AS t(source, k)
), d AS (
  SELECT doc_id, source,
    ('0x'||substr(md5(CAST(doc_id AS VARCHAR) || ':mix'),1,8))::BIGINT % 10000 AS b,
    ('0x'||substr(md5(CAST(doc_id AS VARCHAR) || ':mix'),1,12))::BIGINT AS fh
  FROM documents
), n AS (
  SELECT source, count(*) AS n FROM d GROUP BY source
), qq AS (
  SELECT q.source, k // n AS eps, k % n AS rem FROM q JOIN n USING (source)
), r AS (
  SELECT d.doc_id, d.source, eps, rem,
         row_number() OVER (PARTITION BY d.source ORDER BY b, fh, doc_id) AS rn
  FROM d JOIN qq ON d.source = qq.source
), e AS (
  SELECT doc_id, source,
         eps + CASE WHEN rn <= rem THEN 1 ELSE 0 END AS ep
  FROM r
)
SELECT doc_id, source, CAST(unnest(range(1, ep + 1)) AS INT) AS epoch
FROM e WHERE ep >= 1"""

    # k=13 grams: i ranges 1..len-12 (range upper bound is exclusive), the
    # window is ws[i:i+12] (DuckDB slices are 1-based INCLUSIVE = 13 words);
    # gram hash is the repo's portable 48-bit md5 prefix.
    sql["decontaminate"] = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM documents
), bw AS (
  SELECT ws[11:60] AS bs FROM w WHERE doc_id % 19 = 0
), bg AS (
  SELECT DISTINCT unnest(list_transform(range(1, len(bs) - 11),
           i -> ('0x'||substr(md5(array_to_string(bs[i:i+12], ' ')),1,12))::BIGINT)) AS g
  FROM bw WHERE len(bs) >= 13
), dg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - 11),
           i -> ('0x'||substr(md5(array_to_string(ws[i:i+12], ' ')),1,12))::BIGINT)) AS g
  FROM w WHERE len(ws) >= 13
), hits AS (
  SELECT doc_id, count(DISTINCT g) AS n_hits
  FROM dg WHERE g IN (SELECT g FROM bg) GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(greatest(len(ws) - 12, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(hits.n_hits, 0) >= 1 AS contaminated
FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id"""

    # Literal-for-literal the engine's PII_PATTERNS, applied in the same
    # sequential order (each stage counts+replaces on the previous stage's
    # output) — patterns live in the Java-regex ∩ RE2 common subset.
    from ai_knowledge_graph_spark.operators.curation import PII_PATTERNS

    _pii_email, _pii_ipv4, _pii_phone = (
        PII_PATTERNS["email"],
        PII_PATTERNS["ipv4"],
        PII_PATTERNS["phone"],
    )
    sql["pii_redact"] = f"""
WITH synth AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id % 3 = 0 THEN ' contact ' || source || '_' ||
      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
    CASE WHEN doc_id % 4 = 0 THEN ' ip 10.' || CAST(doc_id % 200 AS VARCHAR)
      || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' ||
      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS text
  FROM documents
), s1 AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{_pii_email}')) AS BIGINT) AS n_email,
    regexp_replace(text, '{_pii_email}', '<EMAIL>', 'g') AS t1
  FROM synth
), s2 AS (
  SELECT doc_id, n_email,
    CAST(len(regexp_extract_all(t1, '{_pii_ipv4}')) AS BIGINT) AS n_ipv4,
    regexp_replace(t1, '{_pii_ipv4}', '<IPV4>', 'g') AS t2
  FROM s1
)
SELECT doc_id,
  regexp_replace(t2, '{_pii_phone}', '<PHONE>', 'g') AS text,
  n_email, n_ipv4,
  CAST(len(regexp_extract_all(t2, '{_pii_phone}')) AS BIGINT) AS n_phone
FROM s2"""

    sql["curate_corpus"] = (
        """WITH RECURSIVE cbase AS (
  SELECT doc_id, lang, text,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS words,
    len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
    length(text) AS n_chars
  FROM documents WHERE lang = 'en'
), qual AS (
  SELECT doc_id, lang, text,
    round(least(len(words) / 100.0, 1.0) *
          (1 - CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars
               ELSE 0.0 END), 6) AS quality
  FROM cbase
), qkept AS (SELECT * FROM qual WHERE quality >= 0.3),
rw AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
  FROM qkept
), rg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS gram
  FROM rw WHERE len(ws) >= 2
), rpg AS (
  SELECT doc_id, gram, count(*) AS cnt FROM rg GROUP BY 1, 2
), rs AS (
  SELECT doc_id, round(1.0 - CAST(count(*) AS DOUBLE) / sum(cnt), 6) AS dup_gram_frac
  FROM rpg GROUP BY doc_id
), rkept AS (
  SELECT q.doc_id, q.lang, q.text, q.quality,
         COALESCE(rs.dup_gram_frac, 0.0) AS dup_gram_frac
  FROM qkept q LEFT JOIN rs USING (doc_id)
  WHERE COALESCE(rs.dup_gram_frac, 0.0) <= 0.06
), cshad AS (
  SELECT *, sha256(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS sha FROM rkept
), ckeep AS (SELECT sha, min(doc_id) AS doc_id FROM cshad GROUP BY sha),
kept AS (
  SELECT s.doc_id, s.lang, s.text, s.quality, s.dup_gram_frac
  FROM cshad s JOIN ckeep k ON s.sha = k.sha AND s.doc_id = k.doc_id
),
"""
        + _sh_body.replace("FROM documents)", "FROM kept)")
        + _pairs_body
        + _closure_body
        + f"""
SELECT d.doc_id, d.lang, d.quality, d.dup_gram_frac, {_split_case} AS split
FROM kept d LEFT JOIN ndlabels l USING (doc_id)
WHERE l.group_id IS NULL OR l.group_id = d.doc_id"""
    )

    # GPT-style sequence packing: deterministic hash-order concat of token
    # counts, global running sum, slice into 512-token packs; one row per
    # (doc, pack) segment. The Spark twin realizes the running sum as a
    # range-partitioned two-pass cumsum (no single-task window).
    sql["pack_sequences"] = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_w('text')}) AS BIGINT) AS n,
         md5(CAST(doc_id AS VARCHAR) || ':pack') AS ord
  FROM documents
), c AS (
  SELECT doc_id, n,
         CAST(SUM(n) OVER (ORDER BY ord, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n AS BIGINT) AS cs
  FROM t WHERE n > 0
), seg AS (
  SELECT doc_id, n, cs,
         unnest(range(cs // 512, (cs + n - 1) // 512 + 1)) AS pack_id
  FROM c
)
SELECT doc_id, CAST(pack_id AS BIGINT) AS pack_id,
  CAST(GREATEST(pack_id * 512 - cs, 0) AS BIGINT) AS doc_offset,
  CAST(GREATEST(cs - pack_id * 512, 0) AS BIGINT) AS pack_offset,
  CAST(LEAST((pack_id + 1) * 512, cs + n)
       - GREATEST(pack_id * 512, cs) AS BIGINT) AS seg_len
FROM seg"""

    # Triangle counts / local clustering over the std KG edges. With every
    # undirected edge normalized a<b, each triangle u<v<w matches exactly
    # once as (u,v)+(v,w) closed by (u,w) — the orientation trick the Spark
    # twin uses (by degree, for skew) is unnecessary single-node.
    sql["triangles"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(subject, object) AS a, GREATEST(subject, object) AS b
  FROM std WHERE subject <> object
), tdeg AS MATERIALIZED (
  SELECT entity, count(*) AS degree FROM (
    SELECT a AS entity FROM e0 UNION ALL SELECT b FROM e0
  ) GROUP BY entity
), tri AS MATERIALIZED (
  SELECT e1.a AS v1, e1.b AS v2, e2.b AS v3
  FROM e0 e1
  JOIN e0 e2 ON e2.a = e1.b
  JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
), pn AS (
  SELECT entity, count(*) AS triangles FROM (
    SELECT v1 AS entity FROM tri
    UNION ALL SELECT v2 FROM tri
    UNION ALL SELECT v3 FROM tri
  ) GROUP BY entity
)
SELECT d.entity, CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
  round(CASE WHEN d.degree >= 2
        THEN 2.0 * COALESCE(p.triangles, 0) / (d.degree * (d.degree - 1))
        ELSE 0.0 END, 6) AS clustering
FROM tdeg d LEFT JOIN pn p USING (entity)"""
    )

    # CCNet-style LM perplexity gate: add-one bigram self-perplexity. The
    # counts (c, cp, V, m) are exact int64 on both engines; ln() runs on
    # the identical double ratio, so round(.,6) hash-compares. The bucket
    # ranks the ROUNDED score, so it can only flip when the score column
    # (hash-compared anyway) flips.
    sql["lm_perplexity"] = r"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x <> '') AS a
  FROM documents
), t2 AS (
  SELECT doc_id, a, len(a) AS n FROM tok WHERE len(a) > 0
), bg AS (
  SELECT doc_id,
    CASE WHEN i = 1 THEN '<s>' ELSE a[CAST(i AS INT) - 1] END AS prev,
    a[CAST(i AS INT)] AS nxt
  FROM (SELECT doc_id, a, unnest(range(1, n + 1)) AS i FROM t2)
), c2 AS (
  SELECT prev, nxt, count(*) AS c FROM bg GROUP BY prev, nxt
), c1 AS (
  SELECT prev, count(*) AS cp FROM bg GROUP BY prev
), v AS (
  SELECT count(DISTINCT t) AS V FROM (SELECT unnest(a) AS t FROM t2)
), dbg AS (
  SELECT doc_id, prev, nxt, count(*) AS m FROM bg GROUP BY doc_id, prev, nxt
), s AS (
  SELECT doc_id,
         CAST(sum(m) AS BIGINT) AS n_bigrams,
         sum(m * ln((c + 1)::DOUBLE / (cp + V))) AS ll
  FROM dbg JOIN c2 USING (prev, nxt) JOIN c1 USING (prev) CROSS JOIN v
  GROUP BY doc_id
), sc AS (
  SELECT doc_id, n_bigrams, round(-ll / n_bigrams, 6) AS nll_per_token FROM s
), r AS (
  SELECT *, row_number() OVER (ORDER BY nll_per_token, doc_id) AS rk,
         count(*) OVER () AS cnt
  FROM sc
)
SELECT doc_id, n_bigrams, nll_per_token,
       CAST((3 * (rk - 1)) // cnt AS BIGINT) AS ppl_bucket
FROM r"""

    # Okapi BM25 top-50. Exact int64 tf/df/dl/N; avgdl = sum(dl)/N in one
    # double division; constants CAST to DOUBLE (bare 1.2 parses DECIMAL in
    # DuckDB and diverges at the last ulp); identical parenthesization to
    # the Spark expression; ties at the cutoff broken by doc_id on both
    # sides, and the rank/limit runs on the ROUNDED score.
    sql["bm25"] = r"""
WITH base AS (
  SELECT doc_id,
    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS BIGINT) AS dl
  FROM documents
), stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM base
), tf AS (
  SELECT doc_id, t, count(*) AS tf
  FROM (
    SELECT doc_id,
      unnest(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS t
    FROM documents
  )
  WHERE t IN ('spark', 'window', 'merge')
  GROUP BY doc_id, t
), dfreq AS (
  SELECT t, count(DISTINCT doc_id) AS df FROM tf GROUP BY t
), sc AS (
  SELECT tf.doc_id,
    CAST(count(*) AS BIGINT) AS matched,
    round(sum(
      ln((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))
         + CAST(1.0 AS DOUBLE))
      * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))
         / (tf + CAST(1.2 AS DOUBLE)
            * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
               + CAST(0.75 AS DOUBLE) * dl / avgdl)))
    ), 6) AS bm25
  FROM tf JOIN dfreq USING (t) JOIN base USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, matched, bm25 FROM sc
ORDER BY bm25 DESC, doc_id LIMIT 50"""

    # HITS: unrolled 5 L1-normalized synchronous sweeps, mirroring the
    # pagerank oracle's MATERIALIZED-per-iteration pattern (without
    # MATERIALIZED DuckDB re-inlines the extraction prelude per unrolled
    # step). auth_k uses hub_{k-1}; hub_k uses the NEW auth_k.
    _hits_iters = []
    _hprev, _aprev = "hub0", "hub0"
    for _k in range(1, 6):
        _hits_iters.append(f""",
asum{_k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.s) AS m
  FROM e JOIN {_hprev} h ON e.src = h.node GROUP BY e.dst
),
authu{_k} AS MATERIALIZED (
  SELECT n.node, COALESCE(m.m, CAST(0 AS DOUBLE)) AS s
  FROM nodes n LEFT JOIN asum{_k} m ON n.node = m.node
),
anorm{_k} AS MATERIALIZED (
  SELECT CASE WHEN sum(s) = 0 THEN CAST(1 AS DOUBLE) ELSE sum(s) END AS m
  FROM authu{_k}
),
auth{_k} AS MATERIALIZED (
  SELECT node, s / (SELECT m FROM anorm{_k}) AS s FROM authu{_k}
),
hsum{_k} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.s) AS m
  FROM e JOIN auth{_k} a ON e.dst = a.node GROUP BY e.src
),
hubu{_k} AS MATERIALIZED (
  SELECT n.node, COALESCE(m.m, CAST(0 AS DOUBLE)) AS s
  FROM nodes n LEFT JOIN hsum{_k} m ON n.node = m.node
),
hnorm{_k} AS MATERIALIZED (
  SELECT CASE WHEN sum(s) = 0 THEN CAST(1 AS DOUBLE) ELSE sum(s) END AS m
  FROM hubu{_k}
),
hub{_k} AS MATERIALIZED (
  SELECT node, s / (SELECT m FROM hnorm{_k}) AS s FROM hubu{_k}
)""")
        _hprev, _aprev = f"hub{_k}", f"auth{_k}"
    sql["hits"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (SELECT subject AS src, object AS dst FROM std),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
hub0 AS MATERIALIZED (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS s FROM nodes
)"""
        + "".join(_hits_iters)
        + f"""
SELECT h.node AS entity, round(h.s, 6) AS hub, round(a.s, 6) AS authority
FROM {_hprev} h JOIN {_aprev} a ON h.node = a.node"""
    )

    # k-core (k=2): unrolled peel rounds. Over-unrolled to 10 — measured
    # fixpoint depth is 4 (sf0.001) / 5 (sf0.01) and extra rounds are
    # no-ops once the core is stable. Same undirected-simple edge prep as
    # the triangles oracle.
    _kc_rounds = []
    for _r in range(1, 11):
        _kc_rounds.append(f""",
kdeg{_r} AS MATERIALIZED (
  SELECT entity, count(*) AS d FROM (
    SELECT a AS entity FROM ke{_r - 1} UNION ALL SELECT b FROM ke{_r - 1}
  ) GROUP BY entity
),
kkeep{_r} AS MATERIALIZED (SELECT entity FROM kdeg{_r} WHERE d >= 2),
ke{_r} AS MATERIALIZED (
  SELECT a, b FROM ke{_r - 1}
  WHERE a IN (SELECT entity FROM kkeep{_r})
    AND b IN (SELECT entity FROM kkeep{_r})
)""")
    sql["kcore"] = (
        _PRELUDE_INFER + _STD_CTES + """
, ke0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(subject, object) AS a, GREATEST(subject, object) AS b
  FROM std WHERE subject <> object
)"""
        + "".join(_kc_rounds)
        + """
SELECT entity, CAST(count(*) AS BIGINT) AS core_degree FROM (
  SELECT a AS entity FROM ke10 UNION ALL SELECT b FROM ke10
) GROUP BY entity HAVING count(*) >= 2"""
    )

    # ExactSubstr dedup, k=12 / min_count=2 — mirrors curation.
    # exact_substring_dedup stage-for-stage (0-based positions on both
    # sides; gram hash is the shared 48-bit md5-prefix int64; span merge
    # via the same UNBOUNDED-PRECEDING running-max-end window).
    sql["exact_substring"] = r"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS a
  FROM documents
), base AS (
  SELECT doc_id, a, len(a) AS n FROM tok
), w AS (
  SELECT doc_id, i - 1 AS wpos,
         ('0x'||substr(md5(array_to_string(a[i:i+11], ' ')),1,12))::BIGINT AS h
  FROM (SELECT doc_id, a, unnest(range(1, n - 12 + 2)) AS i FROM base WHERE n >= 12)
), hot AS (
  SELECT h FROM w GROUP BY h HAVING count(*) >= 2
), dup AS (
  SELECT doc_id, wpos FROM w WHERE h IN (SELECT h FROM hot)
), cov AS (
  SELECT DISTINCT doc_id, wpos + o AS pos
  FROM (SELECT doc_id, wpos, unnest(range(0, 12)) AS o FROM dup)
), toks AS (
  SELECT doc_id, i - 1 AS pos, a[CAST(i AS INT)] AS tok
  FROM (SELECT doc_id, a, unnest(range(1, n + 1)) AS i FROM base)
), kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM toks t
  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.doc_id IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text2,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
), spans AS (
  SELECT doc_id,
         sum(CASE WHEN pe IS NULL OR wpos > pe THEN 1 ELSE 0 END) AS n_spans
  FROM (
    SELECT doc_id, wpos,
           max(wpos + 12) OVER (PARTITION BY doc_id ORDER BY wpos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
    FROM dup
  ) GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(r.text2, '') AS text,
       CAST(b.n AS BIGINT) AS n_tokens,
       CAST(b.n - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans
FROM base b
LEFT JOIN rebuilt r USING (doc_id)
LEFT JOIN spans s USING (doc_id)"""

    # DSIR (arXiv:2302.03169): hashed unigram+bigram bucket multinomials,
    # add-1 smoothing, per-bucket log-ratio frozen to int64 micro-units
    # (so the per-doc sum is exact integer arithmetic on both engines);
    # resample = deterministic Gumbel top-k on hash-derived uniforms.
    _dsir_core = r"""
WITH rawd AS (SELECT doc_id, text FROM documents WHERE doc_id % 19 <> 0),
tgtd AS (SELECT doc_id, text FROM documents WHERE doc_id % 19 = 0),
rg AS MATERIALIZED (
  SELECT doc_id, ('0x'||substr(md5(g),1,12))::BIGINT % 4096 AS b
  FROM (
    SELECT doc_id,
      unnest(ws || list_transform(range(1, len(ws)),
                                  i -> ws[i] || ' ' || ws[i+1])) AS g
    FROM (SELECT doc_id,
            list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
          FROM rawd)
  )
), tg AS MATERIALIZED (
  SELECT ('0x'||substr(md5(g),1,12))::BIGINT % 4096 AS b
  FROM (
    SELECT unnest(ws || list_transform(range(1, len(ws)),
                                       i -> ws[i] || ' ' || ws[i+1])) AS g
    FROM (SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
          FROM tgtd)
  )
), tcnt AS (SELECT b, count(*) AS c FROM tg GROUP BY b),
rcnt AS (SELECT b, count(*) AS c FROM rg GROUP BY b),
ttot AS (SELECT count(*) AS t FROM tg),
rtot AS (SELECT count(*) AS t FROM rg),
lr AS MATERIALIZED (
  SELECT ab.b,
    CAST(round(
      (ln((COALESCE(tcnt.c, 0) + 1.0) / ((SELECT t FROM ttot) + 1.0 * 4096))
     - ln((COALESCE(rcnt.c, 0) + 1.0) / ((SELECT t FROM rtot) + 1.0 * 4096)))
      * 1000000, 0) AS BIGINT) AS m
  FROM (SELECT unnest(range(0, 4096)) AS b) ab
  LEFT JOIN tcnt ON tcnt.b = ab.b
  LEFT JOIN rcnt ON rcnt.b = ab.b
), sc AS MATERIALIZED (
  SELECT rg.doc_id, count(*) AS n_grams, sum(lr.m) AS wm
  FROM rg JOIN lr ON rg.b = lr.b GROUP BY rg.doc_id
), wtab AS MATERIALIZED (
  SELECT r.doc_id,
         CAST(COALESCE(sc.n_grams, 0) AS BIGINT) AS n_grams,
         CAST(COALESCE(sc.wm, 0) AS DOUBLE) / 1000000 AS lw
  FROM rawd r LEFT JOIN sc USING (doc_id)
)"""
    sql["dsir_weights"] = (
        _dsir_core
        + """
SELECT doc_id, n_grams, round(lw, 6) AS log_weight FROM wtab"""
    )
    sql["dsir_sample"] = (
        _dsir_core
        + """
SELECT doc_id, n_grams, round(lw, 6) AS log_weight,
       round(lw - ln(-ln(
         (('0x'||substr(md5('dsir' || CAST(doc_id AS VARCHAR)),1,12))::BIGINT + 1)
         / 281474976710657.0)), 6) AS gumbel_key
FROM wtab
ORDER BY (lw - ln(-ln(
         (('0x'||substr(md5('dsir' || CAST(doc_id AS VARCHAR)),1,12))::BIGINT + 1)
         / 281474976710657.0))) DESC, doc_id
LIMIT 50"""
    )

    # SemDeDup: same hash-seeded centroid CTEs as ivf_topk; in-cluster
    # rank ascending by (rounded centroid sim, id); dup iff cosine to an
    # earlier-ranked member of the SAME cluster >= 0.35.
    sql["semdedup"] = f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings),
buck AS (
  SELECT vec_id,
    CAST((('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 16) AS INT)
      AS centroid_bucket
  FROM base
),
reps AS (SELECT centroid_bucket AS centroid_id, min(vec_id) AS rep_id FROM buck GROUP BY 1),
cents AS (SELECT r.centroid_id, b.embedding AS centroid FROM reps r JOIN base b ON b.vec_id = r.rep_id),
asg AS MATERIALIZED (
  SELECT vec_id, centroid_id, centroid_sim,
    row_number() OVER (PARTITION BY centroid_id
                       ORDER BY centroid_sim ASC, vec_id ASC) AS rn
  FROM (
    SELECT b.vec_id, c.centroid_id,
      round({_sql_cos("b.embedding", "c.centroid")}, 6) AS centroid_sim,
      row_number() OVER (
        PARTITION BY b.vec_id
        ORDER BY round({_sql_cos("b.embedding", "c.centroid")}, 6) DESC,
                 c.centroid_id ASC) AS pr
    FROM base b CROSS JOIN cents c
  ) WHERE pr = 1
),
dups AS (
  SELECT DISTINCT x.vec_id
  FROM asg x JOIN asg y ON x.centroid_id = y.centroid_id AND y.rn < x.rn
  JOIN base a ON a.vec_id = x.vec_id
  JOIN base b ON b.vec_id = y.vec_id
  WHERE round({_sql_cos("a.embedding", "b.embedding")}, 6) >= 0.35
)
SELECT asg.vec_id, asg.centroid_id, asg.centroid_sim,
       (dups.vec_id IS NULL) AS kept
FROM asg LEFT JOIN dups ON asg.vec_id = dups.vec_id"""

    # Streaming sessionizer: the batch replay of "every closed session" =
    # gap sessions minus each user's last (trailing-open) one. Same
    # floor-epoch second arithmetic as the sessions oracle.
    sql["stream_sessions"] = """
WITH o AS (
  SELECT user_id, event_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), f AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                 THEN 1 ELSE 0 END AS ns
  FROM o
), x AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS idx
  FROM f
), per AS (
  SELECT user_id, idx,
         CAST(floor(epoch(min(ts))) AS BIGINT) AS start_sec,
         CAST(floor(epoch(max(ts))) AS BIGINT) AS end_sec,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value), 6) AS total_value
  FROM x GROUP BY user_id, idx
), last AS (
  SELECT user_id, max(idx) AS mx FROM per GROUP BY user_id
)
SELECT p.user_id, p.start_sec, p.end_sec, p.n_events, p.total_value
FROM per p JOIN last l ON p.user_id = l.user_id AND p.idx < l.mx"""

    # CUBE rollup: GROUPING() arithmetic mirrors Spark's grouping();
    # quantile_cont is the same linear-interpolation percentile as Spark's
    # exact percentile().
    sql["corpus_cube"] = """
SELECT source, lang,
       CAST(GROUPING(source) * 2 + GROUPING(lang) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_size,
       round(quantile_cont(n_chars, 0.5), 6) AS p50_size,
       round(quantile_cont(n_chars, 0.95), 6) AS p95_size
FROM documents
GROUP BY CUBE (source, lang)"""

    # TrustRank: the pagerank oracle with teleport restricted to the
    # hash-selected seed set; same IEEE constant construction
    # ((1.0 - 0.85) etc.) and MATERIALIZED-per-iteration unroll.
    _ppr_iters = []
    _pprev = "ppr0"
    for _k in range(1, 6):
        _ppr_iters.append(f""",
pdang{_k} AS MATERIALIZED (
  SELECT COALESCE(sum(p.pr), CAST(0 AS DOUBLE)) AS m
  FROM {_pprev} p LEFT JOIN outdeg o ON p.node = o.src WHERE o.src IS NULL
),
pmass{_k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(p.pr / o.od) AS m
  FROM e JOIN {_pprev} p ON e.src = p.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
),
ppr{_k} AS MATERIALIZED (
  SELECT tv.node,
         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * tv.t
         + CAST(0.85 AS DOUBLE) *
           (COALESCE(m.m, CAST(0 AS DOUBLE)) + (SELECT m FROM pdang{_k}) * tv.t) AS pr
  FROM tvec tv LEFT JOIN pmass{_k} m ON tv.node = m.node
)""")
        _pprev = f"ppr{_k}"
    sql["trustrank"] = (
        _PRELUDE_INFER + _STD_CTES + """
, e AS MATERIALIZED (SELECT subject AS src, object AS dst FROM std),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
outdeg AS MATERIALIZED (SELECT src, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src),
seeds AS MATERIALIZED (
  SELECT node FROM nodes WHERE ('0x'||substr(md5(node),1,8))::BIGINT % 7 = 0
),
sn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds),
tvec AS MATERIALIZED (
  SELECT n.node, CASE WHEN s.node IS NULL THEN CAST(0 AS DOUBLE)
                      ELSE CAST(1.0 AS DOUBLE) / (SELECT n FROM sn) END AS t
  FROM nodes n LEFT JOIN seeds s ON n.node = s.node
),
ppr0 AS MATERIALIZED (SELECT node, t AS pr FROM tvec)"""
        + "".join(_ppr_iters)
        + f"""
SELECT node AS entity, round(pr, 6) AS pagerank FROM {_pprev}"""
    )

    # Winnowing (k=5, window=4): grams explode to their covering window
    # starts (DuckDB range() is empty when stop<=start, so the G<window
    # case needs no guard here, unlike Spark's descending sequence);
    # rightmost-min via min(h) then max(pos) among holders.
    sql["winnow"] = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS a
  FROM documents
), base AS (
  SELECT doc_id, a, len(a) AS n FROM tok
), g AS MATERIALIZED (
  SELECT doc_id, n - 4 AS gcnt, i - 1 AS pos,
         ('0x'||substr(md5(array_to_string(a[i:i+4], ' ')),1,12))::BIGINT AS h
  FROM (SELECT doc_id, a, n, unnest(range(1, n - 5 + 2)) AS i
        FROM base WHERE n >= 5)
), mem AS MATERIALIZED (
  SELECT doc_id, h, pos,
         unnest(range(greatest(0, pos - 3), least(pos, gcnt - 4) + 1)) AS j
  FROM g
), wmin AS MATERIALIZED (
  SELECT doc_id, j, min(h) AS mh FROM mem GROUP BY doc_id, j
), sel AS (
  SELECT m.doc_id, m.j, max(m.pos) AS pos, min(m.h) AS fp_hash
  FROM mem m
  JOIN wmin w ON m.doc_id = w.doc_id AND m.j = w.j AND m.h = w.mh
  GROUP BY m.doc_id, m.j
)
SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, fp_hash FROM sel"""

    # Gopher rules: every verdict is exact integer arithmetic (10*x <= y),
    # regexes in the Java∩RE2 common subset, ratios round(6) info-only.
    sql["gopher"] = r"""
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws,
    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
                l -> l <> '') AS ls,
    len(regexp_extract_all(text, '#|\.\.\.')) AS symbols
  FROM documents
), m AS (
  SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS nw,
    CAST(len(ls) AS BIGINT) AS nl,
    CAST(COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS BIGINT) AS chars,
    CAST(symbols AS BIGINT) AS symbols,
    CAST(len(list_filter(ls, l -> regexp_matches(l, '^[-*•]'))) AS BIGINT) AS bullets,
    CAST(len(list_filter(ls, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS BIGINT) AS ellipses,
    CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
           s -> list_contains(list_transform(ws, x -> lower(x)), s))) AS BIGINT)
      AS stop_hits
  FROM w
)
SELECT doc_id,
  nw AS n_words,
  CASE WHEN nw > 0 THEN round(CAST(chars AS DOUBLE) / nw, 6) ELSE 0.0 END AS mean_word_len,
  CASE WHEN nw > 0 THEN round(CAST(symbols AS DOUBLE) / nw, 6) ELSE 0.0 END AS symbol_ratio,
  CASE WHEN nl > 0 THEN round(CAST(bullets AS DOUBLE) / nl, 6) ELSE 0.0 END AS bullet_frac,
  CASE WHEN nl > 0 THEN round(CAST(ellipses AS DOUBLE) / nl, 6) ELSE 0.0 END AS ellipsis_frac,
  CASE WHEN nw > 0 THEN round(CAST(alpha AS DOUBLE) / nw, 6) ELSE 0.0 END AS alpha_frac,
  stop_hits AS n_stop_hits,
  (nw >= 50 AND nw <= 100000) AS ok_word_count,
  (3 * nw <= chars AND chars <= 10 * nw AND nw > 0) AS ok_mean_len,
  (10 * symbols <= nw) AS ok_symbol,
  (10 * bullets <= 9 * nl) AS ok_bullet,
  (10 * ellipses <= 3 * nl) AS ok_ellipsis,
  (5 * alpha >= 4 * nw) AS ok_alpha,
  (stop_hits >= 2) AS ok_stop,
  ((nw >= 50 AND nw <= 100000) AND (3 * nw <= chars AND chars <= 10 * nw AND nw > 0)
   AND (10 * symbols <= nw) AND (10 * bullets <= 9 * nl)
   AND (10 * ellipses <= 3 * nl) AND (5 * alpha >= 4 * nw)
   AND (stop_hits >= 2)) AS gopher_pass
FROM m"""

    # C4 rules: the oracle rebuilds the synthesized line structure with the
    # same slice/CASE arithmetic (shared generator, like gopher's shared
    # text) and then applies an independent DuckDB list-op implementation of
    # the line/page rules; every verdict is count/boolean arithmetic.
    sql["c4"] = r"""
WITH base AS (
  SELECT doc_id,
    list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents
), built AS (
  SELECT doc_id,
    coalesce(array_to_string(list_slice(ws, 1, 8), ' '), '') || '.' AS l1,
    coalesce(array_to_string(list_slice(ws, 9, 16), ' '), '') ||
      CASE doc_id % 3 WHEN 0 THEN '!' WHEN 1 THEN '?' ELSE '' END AS l2,
    coalesce(array_to_string(list_slice(ws, 17, 19), ' '), '') || '.' AS l3,
    CASE WHEN doc_id % 7 = 0 THEN 'Please enable javascript to view this page.'
         ELSE coalesce(array_to_string(list_slice(ws, 20, 25), ' '), '') ||
              CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END END AS l4,
    CASE WHEN doc_id % 37 = 0 THEN 'Lorem ipsum dolor sit amet consectetur adipiscing.'
         WHEN doc_id % 41 = 0 THEN 'function f() { return 1; }'
         WHEN doc_id % 43 = 0 THEN 'buy spamword pills online right now.'
         ELSE coalesce(array_to_string(list_slice(ws, 26, 32), ' '), '') || '"' END AS l5
  FROM base
), doc AS (
  SELECT doc_id,
    l1 || chr(10) || l2 || chr(10) || l3 || chr(10) || l4 || chr(10) || l5 AS ctext
  FROM built
), r AS (
  SELECT doc_id, ctext,
    list_filter(list_transform(string_split(ctext, chr(10)), l -> trim(l)),
                l -> l <> '') AS ls
  FROM doc
), k AS (
  SELECT doc_id, ctext, ls,
    list_filter(ls, l ->
      regexp_matches(l, '[.!?"]$')
      AND len(list_filter(string_split_regex(l, '\s+'), w -> w <> '')) >= 5
      AND NOT contains(lower(l), 'javascript')) AS kept
  FROM r
), v AS (
  SELECT doc_id,
    CAST(len(ls) AS BIGINT) AS n_lines,
    CAST(len(kept) AS BIGINT) AS n_kept_lines,
    CAST(len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]')) AS BIGINT)
      AS n_sentences,
    contains(lower(ctext), 'lorem ipsum') AS has_lorem,
    contains(ctext, '{') AS has_brace,
    len(list_filter(
      list_transform(
        list_filter(string_split_regex(lower(ctext), '\s+'), w -> w <> ''),
        w -> regexp_replace(w, '^[^a-z0-9]+|[^a-z0-9]+$', '', 'g')),
      w -> w IN ('spamword', 'scamword'))) > 0 AS has_bad_word,
    sha256(array_to_string(kept, chr(10))) AS clean_sha256
  FROM k
)
SELECT doc_id, n_lines, n_kept_lines, n_sentences,
  has_lorem, has_brace, has_bad_word,
  (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace AND NOT has_bad_word)
    AS c4_pass,
  clean_sha256
FROM v"""

    # Link graph: expected edges stated arithmetically from the anchor
    # generator (no html parsing in the oracle — extractor/resolver/
    # normalizer bugs all mismatch). host_graph aggregates the same edges.
    # BPE: iterative oracle, 8 unrolled rounds (MATERIALIZED CTEs).
    sql["bpe_merges"] = _bpe_oracle_sql(8)
    sql["bpe_encode"] = _bpe_encode_oracle_sql(8)

    # PQ-ANN: exact int64 micro-unit distances end to end (argmin + ADC sum).
    sql["pq_topk"] = _pq_oracle_sql(4, 16, 16, 5)
    sql["ivfpq_topk"] = _ivfpq_oracle_sql()

    sql["link_graph"] = (
        _LINK_ORACLE_PRELUDE
        + """
SELECT url, CAST(pos AS INTEGER) AS pos, href_raw, anchor_text, dst_url
FROM expected"""
    )

    sql["host_graph"] = (
        _LINK_ORACLE_PRELUDE
        + """
SELECT 'host' || (doc_id % 7) || '.example.com' AS src_host,
  regexp_extract(dst_url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1) AS dst_host,
  COUNT(*) AS n_links
FROM expected
WHERE dst_url IS NOT NULL
GROUP BY 1, 2"""
    )

    # robots gate: the oracle derives each verdict arithmetically from the
    # (policy variant, path shape) pair the generator used — an engine-side
    # robots PARSER bug therefore mismatches (canonical_crawl philosophy).
    sql["robots"] = """
WITH d AS (
  SELECT doc_id, source,
    ('0x'||substr(md5(source),1,8))::BIGINT % 3 AS variant,
    doc_id % 4 AS pcase
  FROM documents
)
SELECT doc_id,
  'https://' || source || CASE pcase
     WHEN 0 THEN ''
     WHEN 1 THEN '/private/doc' || CAST(doc_id AS VARCHAR)
     WHEN 2 THEN '/private/ok/doc' || CAST(doc_id AS VARCHAR)
     ELSE '/pub/doc' || CAST(doc_id AS VARCHAR) END AS url,
  CASE WHEN variant = 2 THEN true
       WHEN variant = 0 THEN NOT (pcase = 1)
       ELSE (pcase = 3) END AS robots_allowed
FROM d"""

    # SCD2: replay the crawl synth arithmetically (warc_ts = epoch +
    # doc_id*60 -> exact int seconds), lag-collapse + lead-close windows.
    sql["scd2"] = """
WITH s AS (
  SELECT 'https://' || source || '.example.org/p' || CAST(doc_id % 50 AS VARCHAR) AS url,
         1767225600 + doc_id * 60 AS ts_sec,
         doc_id,
         sha256('https://' || source || '.example.org/p' || CAST(doc_id % 50 AS VARCHAR)
                || CAST((doc_id // 50 // 2) % 4 AS VARCHAR)) AS digest
  FROM documents
), chg AS (
  SELECT *, lag(digest) OVER (PARTITION BY url ORDER BY ts_sec, doc_id) AS prev
  FROM s
), kept AS (
  SELECT * FROM chg WHERE prev IS NULL OR prev <> digest
)
SELECT url,
       row_number() OVER (PARTITION BY url ORDER BY ts_sec, doc_id) AS version,
       ts_sec AS valid_from_sec,
       lead(ts_sec) OVER (PARTITION BY url ORDER BY ts_sec, doc_id) AS valid_to_sec,
       lead(ts_sec) OVER (PARTITION BY url ORDER BY ts_sec, doc_id) IS NULL AS is_current,
       digest
FROM kept"""

    # Hybrid RRF: wraps the bm25 oracle as a subquery (DuckDB allows WITH
    # inside parenthesized subqueries) + the embedding_topk shape for
    # query vec 0 / k=50; additions in list order (lex + vec) so the FP
    # sum mirrors the engine exactly.
    sql["hybrid_rrf"] = f"""
WITH lex AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM ({sql["bm25"]})
), vec AS MATERIALIZED (
  SELECT neighbor_id AS doc_id, rk AS rank FROM (
    SELECT e.vec_id AS neighbor_id,
      row_number() OVER (
        ORDER BY round({_sql_cos("e.embedding", "q.embedding")}, 6) DESC,
                 e.vec_id ASC) AS rk
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
  ) WHERE rk <= 50
)
SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
       round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.rank), CAST(0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.rank), CAST(0 AS DOUBLE)), 6) AS rrf_score,
       CAST((CASE WHEN l.rank IS NULL THEN 0 ELSE 1 END)
            + (CASE WHEN v.rank IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_lists
FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id"""

    # Incremental ExactSubstr == full run over corpus ∪ batch restricted
    # to the batch (the operator's defining equivalence, also pinned in
    # tests/test_exact_substring_incremental.py).
    sql["exact_substring_incr"] = (
        f"SELECT * FROM ({sql['exact_substring']}) WHERE doc_id >= 400"
    )

    # Sketch family: bit-exact replays — 63-bit bloom words (bit 63 never
    # set), exact CMS counters, HLL harmonic sum as an exact HUGEINT of
    # 2^(62-M_j) terms. Every double constant is CAST(... AS DOUBLE)
    # (bare decimals are DECIMAL in DuckDB).
    _bp = lambda expr, i: (  # noqa: E731
        f"(('0x'||substr(md5('bloom{i}:' || {expr}),1,12))::BIGINT % 4096)"
    )
    sql["sketch_bloom"] = f"""
WITH corpus AS (SELECT CAST(doc_id AS VARCHAR) AS v FROM documents WHERE doc_id < 400),
pos AS (
  SELECT unnest([{", ".join(_bp("v", i) for i in range(4))}]) AS p FROM corpus
),
words AS MATERIALIZED (
  SELECT p // 63 AS word, bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
  FROM pos GROUP BY 1
),
probes AS (
  SELECT doc_id, p // 63 AS word, p % 63 AS b FROM (
    SELECT doc_id,
      unnest([{", ".join(_bp("CAST(doc_id AS VARCHAR)", i) for i in range(4))}]) AS p
    FROM documents
  )
)
SELECT pr.doc_id,
       min(CASE WHEN w.bits IS NOT NULL AND (w.bits >> CAST(pr.b AS INT)) % 2 = 1
                THEN 1 ELSE 0 END) = 1 AS maybe_present
FROM probes pr LEFT JOIN words w ON pr.word = w.word
GROUP BY pr.doc_id"""

    _cp = lambda expr, d: (  # noqa: E731
        f"(('0x'||substr(md5('cms{d}:' || {expr}),1,12))::BIGINT % 64)"
    )
    sql["sketch_cms"] = f"""
WITH cells AS (
  SELECT r AS row, c AS cms_col FROM (
    SELECT unnest([{", ".join(str(d) for d in range(4))}]) AS r,
           unnest([{", ".join(_cp("source", d) for d in range(4))}]) AS c
    FROM documents
  )
),
cms AS MATERIALIZED (
  SELECT row, cms_col, count(*) AS cnt FROM cells GROUP BY row, cms_col
),
keys AS (SELECT DISTINCT source AS key FROM documents),
probes AS (
  SELECT key, r AS row, c AS cms_col FROM (
    SELECT key,
           unnest([{", ".join(str(d) for d in range(4))}]) AS r,
           unnest([{", ".join(_cp("key", d) for d in range(4))}]) AS c
    FROM keys
  )
)
SELECT p.key, CAST(min(COALESCE(cms.cnt, 0)) AS BIGINT) AS cms_count
FROM probes p LEFT JOIN cms ON p.row = cms.row AND p.cms_col = cms.cms_col
GROUP BY p.key"""

    sql["sketch_hll"] = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS key
  FROM documents
), h AS (
  SELECT ('0x'||substr(md5('hll:' || key),1,12))::BIGINT AS hv FROM toks
), regs AS MATERIALIZED (
  SELECT hv // 274877906944 AS bucket,
         max(CASE WHEN hv % 274877906944 = 0 THEN 39
                  ELSE 38 - length(bin(hv % 274877906944)) + 1 END) AS register
  FROM h GROUP BY 1
), fullr AS (
  SELECT COALESCE(r.register, 0) AS r
  FROM (SELECT unnest(range(0, 1024)) AS bucket) ab
  LEFT JOIN regs r ON ab.bucket = r.bucket
), agg AS (
  SELECT sum(1::BIGINT << CAST(62 - r AS INT)) AS s,
         CAST(sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
  FROM fullr
)
SELECT round(CASE WHEN raw <= CAST(2560 AS DOUBLE) AND n_zero > 0
             THEN CAST(1024 AS DOUBLE) * ln(CAST(1024 AS DOUBLE) / n_zero)
             ELSE raw END, 6) AS estimate,
       n_zero AS n_zero_registers
FROM (
  SELECT CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(1024 AS DOUBLE))
         * CAST(1024 AS DOUBLE) * CAST(1024 AS DOUBLE)
         * CAST(4611686018427387904 AS DOUBLE) / CAST(s AS DOUBLE) AS raw,
         n_zero
  FROM agg
)"""

    # mergeable log2-histogram quantiles (sketches.quantile_sketch) over
    # document length: bucket = binary length - 1 (no float log2), ceil
    # target (n*p + 99) // 100, first bucket reaching it.
    _qs_one = """
SELECT CAST({p} AS BIGINT) AS p, CAST(bucket AS BIGINT) AS bucket,
       CAST(pow(2, bucket + 1) AS BIGINT) - 1 AS upper_bound,
       cum_count, n
FROM qcum WHERE cum_count >= (n * {p} + 99) // 100
ORDER BY bucket LIMIT 1"""
    sql["quantile_sketch"] = (
        """
WITH qhist AS MATERIALIZED (
  SELECT length(bin(CAST(n_chars AS BIGINT))) - 1 AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM documents WHERE n_chars >= 0 GROUP BY 1
),
qcum AS MATERIALIZED (
  SELECT bucket,
         CAST(sum(c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_count,
         CAST(sum(c) OVER () AS BIGINT) AS n
  FROM qhist
)
"""
        + "\nUNION ALL\n".join(
            f"({_qs_one.format(p=p)})" for p in (50, 90, 99)
        )
    )

    # cross-split near-dup leakage (curation.split_leakage): composes the
    # verified-pair statement with the split assignment, canonicalized on
    # split name.
    sql["split_leakage"] = f"""
WITH pr AS MATERIALIZED (
  SELECT a, b FROM ({sql["minhash_lsh_pairs"]})
),
sp AS MATERIALIZED (
  SELECT doc_id, split FROM ({sql["hash_split"]})
)
SELECT least(sa.split, sb.split) AS split_a,
       greatest(sa.split, sb.split) AS split_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pr JOIN sp sa ON pr.a = sa.doc_id JOIN sp sb ON pr.b = sb.doc_id
GROUP BY 1, 2"""


    # contrastive hard negatives (ranking.hard_negatives): the
    # hybrid_rrf lex/vec list bodies, anti-joined.
    sql["hard_negatives"] = f"""
WITH lex AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
  FROM ({sql["bm25"]})
), vec AS MATERIALIZED (
  SELECT neighbor_id AS doc_id FROM (
    SELECT e.vec_id AS neighbor_id,
      row_number() OVER (
        ORDER BY round({_sql_cos("e.embedding", "q.embedding")}, 6) DESC,
                 e.vec_id ASC) AS rk
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
  ) WHERE rk <= 50
)
SELECT l.doc_id, CAST(l.rank AS BIGINT) AS lex_rank
FROM lex l LEFT JOIN vec v ON l.doc_id = v.doc_id
WHERE v.doc_id IS NULL"""

    # degree histogram (kgops.degree_distribution): log2 buckets over
    # undirected distinct-neighbor degree.
    sql["degree_dist"] = _PRELUDE_INFER + _STD_CTES + """
, dde AS (SELECT DISTINCT subject AS a, object AS b FROM std),
ddu AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM dde UNION ALL SELECT b, a FROM dde
  ) WHERE a <> b
),
ddg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg FROM ddu GROUP BY a)
SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
       CAST(pow(2, length(bin(deg)) - 1) AS BIGINT) AS lo_degree,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM ddg GROUP BY 1, 2"""

    # per-session event-type pair itemsets (events.session_itemsets):
    # sessions CTE chain + per-session sorted distinct type set + pair
    # combinations + support ppm against the total session count.
    sql["itemsets"] = """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), f AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                 THEN 1 ELSE 0 END AS ns
  FROM o
), x AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS idx
  FROM f
), per AS MATERIALIZED (
  SELECT user_id, idx, list_sort(list(DISTINCT event_type)) AS items
  FROM x GROUP BY user_id, idx
),
ntot AS (SELECT greatest(CAST(count(*) AS BIGINT), 1) AS n FROM per),
prs AS (
  SELECT items[i] AS a, items[j] AS b
  FROM per,
       UNNEST(range(1, len(items) + 1)) AS r(i),
       UNNEST(range(1, len(items) + 1)) AS r2(j)
  WHERE len(items) >= 2 AND j > i
)
SELECT a AS item_a, b AS item_b, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST((count(*) * 1000000) // (SELECT n FROM ntot) AS BIGINT)
         AS support_ppm
FROM prs GROUP BY 1, 2 HAVING count(*) >= 3"""

    # lexicon sentiment (textstats.sentiment_scores): the literal
    # SENTIMENT_LEXICON as a VALUES table, milli average, NULL on zero.
    from ai_knowledge_graph_spark.operators.textstats import (
        SENTIMENT_LEXICON,
    )

    _lex_vals = ", ".join(
        f"('{w}', {v})" for w, v in SENTIMENT_LEXICON.items()
    )
    sql["sentiment"] = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
),
m AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_matched,
         CAST(sum(l.v) AS BIGINT) AS s
  FROM tok t JOIN (VALUES {_lex_vals}) l(w, v) USING (w)
  GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(m.n_matched, 0) AS BIGINT) AS n_matched,
       CASE WHEN m.n_matched > 0 THEN CAST(m.s // m.n_matched AS BIGINT) END
         AS sent_milli
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN m ON d.doc_id = m.doc_id"""

    # percentile-normalized quality (textstats.quality_percentiles):
    # composes the classifier margin; rank = row_number (raw desc, id asc).
    sql["quality_pct"] = f"""
WITH qcs AS MATERIALIZED (
  SELECT doc_id, raw_score FROM ({sql["classifier_score"]})
),
qn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qcs)
SELECT doc_id, CAST(raw_score AS BIGINT) AS raw_score,
       CAST((row_number() OVER (ORDER BY raw_score DESC, doc_id ASC)
             * 1000000) // (SELECT n FROM qn) AS BIGINT) AS pct_ppm
FROM qcs"""

    # conditional bigram table (textstats.next_word_table).
    sql["next_word"] = """
WITH dw AS MATERIALIZED (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
prs AS MATERIALIZED (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM dw, UNNEST(range(1, len(ws))) AS r(i)
  WHERE len(ws) >= 2
),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS n1 FROM prs GROUP BY 1),
c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
  FROM prs GROUP BY 1, 2 HAVING count(*) >= 3
),
rnk AS (
  SELECT c12.w1, c12.w2, c12.n12, c1.n1,
         row_number() OVER (PARTITION BY c12.w1
                            ORDER BY c12.n12 DESC, c12.w2 ASC) AS rank
  FROM c12 JOIN c1 USING (w1)
)
SELECT w1, w2, n12, CAST((n12 * 1000000) // n1 AS BIGINT) AS cond_ppm,
       CAST(rank AS BIGINT) AS rank
FROM rnk WHERE rank <= 3"""

    # per-LPA-community rollup (walks.community_profiles): the lpa CTE
    # chain + degree + per-label hub pick (deg desc, node asc).
    sql["community_profile"] = (
        _PRELUDE_INFER + _STD_CTES + """
, ed AS (SELECT DISTINCT subject AS src, object AS dst FROM std),
und AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM ed
    UNION ALL SELECT dst AS a, src AS b FROM ed
  ) WHERE a <> b
),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und)"""
        + "".join(_lpa_ctes)
        + """,
cdeg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
cj AS (
  SELECT l.label, l.node, d.deg,
         row_number() OVER (PARTITION BY l.label
                            ORDER BY d.deg DESC, l.node ASC) AS rn,
         count(*) OVER (PARTITION BY l.label) AS nn
  FROM l4 l JOIN cdeg d ON l.node = d.node
)
SELECT label, CAST(nn AS BIGINT) AS n_nodes, node AS top_entity,
       CAST(deg AS BIGINT) AS top_degree
FROM cj WHERE rn = 1"""
    )

    # sorted-neighborhood ER (standardize.snm_pairs): same typo fixture as
    # fuzzy_pairs; rank = global row_number ORDER BY entity; neighbors
    # within 3 ranks, lev <= 2.
    sql["snm_pairs"] = _PRELUDE_INFER + _STD_CTES + """
, sbase AS MATERIALIZED (
  SELECT DISTINCT entity FROM (
    SELECT subject AS entity FROM std UNION ALL SELECT object FROM std)
),
snoisy AS (
  SELECT concat(substr(entity, 1, p - 1), substr(entity, p + 1)) AS entity
  FROM (
    SELECT entity,
           CAST(('0x' || substr(md5(entity), 1, 12))::BIGINT
                % len(entity) + 1 AS INT) AS p
    FROM sbase WHERE substr(md5(entity), 1, 1) BETWEEN '0' AND '7')
),
sents AS MATERIALIZED (
  SELECT entity, row_number() OVER (ORDER BY entity) AS rank FROM (
    SELECT DISTINCT entity FROM (
      SELECT entity FROM sbase UNION ALL SELECT entity FROM snoisy)
  ) WHERE len(entity) >= 4 AND NOT regexp_matches(entity, '[^ -~]')
)
SELECT a.entity AS entity_a, b.entity AS entity_b,
       CAST(levenshtein(a.entity, b.entity) AS BIGINT) AS edit_dist
FROM sents a JOIN sents b
  ON b.rank BETWEEN a.rank + 1 AND a.rank + 3
WHERE levenshtein(a.entity, b.entity) <= 2"""

    # cumulative-distinct growth (events.distinct_curve).
    sql["distinct_curve"] = """
WITH fs AS (
  SELECT user_id AS u,
         CAST(min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS BIGINT) AS fd
  FROM events GROUP BY 1
),
dd AS (
  SELECT fd AS day, CAST(count(*) AS BIGINT) AS n_new_users
  FROM fs GROUP BY 1
)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM dd"""

    # active-learning uncertainty sampling (sampling.uncertainty_sample):
    # composes the classifier's exact int64 margin.
    sql["uncertain"] = f"""
WITH cs AS MATERIALIZED (
  SELECT doc_id, raw_score FROM ({sql["classifier_score"]})
)
SELECT doc_id, CAST(raw_score AS BIGINT) AS raw_score,
       CAST(abs(raw_score) AS BIGINT) AS uncertainty,
       CAST(row_number() OVER (ORDER BY abs(raw_score) ASC, doc_id ASC)
            AS BIGINT) AS rank
FROM cs ORDER BY abs(raw_score) ASC, doc_id ASC LIMIT 50"""

    # chunk->doc mean pooling (similarity.pool_embeddings_long):
    # micro-frozen components, integer mean (both engines truncate
    # toward zero on negative integer division — verified). LONG form —
    # one row per (group, component), all columns atomic.
    sql["embedding_pool"] = """
WITH pcomp AS (
  SELECT vec_id // 10 AS group_id, i - 1 AS pos,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS v
  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS r(i)
),
pnv AS (
  SELECT vec_id // 10 AS group_id, CAST(count(*) AS BIGINT) AS n_vecs
  FROM embeddings GROUP BY 1
),
psm AS (
  SELECT group_id, pos, CAST(sum(v) AS BIGINT) AS s
  FROM pcomp GROUP BY 1, 2
)
SELECT CAST(s.group_id AS BIGINT) AS group_id, n.n_vecs,
       CAST(s.pos AS BIGINT) AS pos,
       CAST(s.s // n.n_vecs AS BIGINT) AS m
FROM psm s JOIN pnv n USING (group_id)"""

    # TextTiling sharpest shift (textstats.topic_shifts): 10-word blocks,
    # exact int64 counts/dots/norms, cosine frozen via the shared
    # _TILE_SIM_SQL, per-doc (sim, gap) lexicographic min.
    from ai_knowledge_graph_spark.operators.textstats import _TILE_SIM_SQL

    sql["topic_shift"] = f"""
WITH dw AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
tsegs AS MATERIALIZED (
  SELECT doc_id, i AS win, list_slice(ws, (i - 1) * 10 + 1, i * 10) AS seg
  FROM dw, UNNEST(range(1, len(ws) // 10 + 1)) AS r(i)
  WHERE len(ws) >= 20
),
tw AS MATERIALIZED (
  SELECT doc_id, win, unnest(seg) AS w FROM tsegs
),
tcnt AS MATERIALIZED (
  SELECT doc_id, win, w, CAST(count(*) AS BIGINT) AS c
  FROM tw GROUP BY 1, 2, 3
),
tnorm AS (
  SELECT doc_id, win, CAST(sum(c * c) AS BIGINT) AS nn
  FROM tcnt GROUP BY 1, 2
),
tdot AS (
  SELECT a.doc_id, a.win, CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM tcnt a JOIN tcnt b
    ON a.doc_id = b.doc_id AND b.win = a.win + 1 AND a.w = b.w
  GROUP BY 1, 2
),
tgap AS (
  SELECT na.doc_id, na.win AS gap_idx,
         COALESCE(d.dot, 0) AS dot, na.nn AS na, nb.nn AS nb
  FROM tnorm na
  JOIN tnorm nb ON na.doc_id = nb.doc_id AND nb.win = na.win + 1
  LEFT JOIN tdot d ON na.doc_id = d.doc_id AND na.win = d.win
),
tsim AS (
  SELECT doc_id, CAST(gap_idx AS BIGINT) AS gap_idx,
         {_TILE_SIM_SQL} AS sim_micro
  FROM tgap
),
tr2 AS (
  SELECT doc_id, gap_idx, sim_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sim_micro ASC, gap_idx ASC) AS rn
  FROM tsim
)
SELECT doc_id, gap_idx, sim_micro FROM tr2 WHERE rn = 1"""

    # A/B conversion readout (events.ab_lift): md5 user split, ppm rates.
    sql["ab_lift"] = """
WITH pu AS (
  SELECT user_id AS u,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1
),
c AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 12))::BIGINT
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS cohort,
         converted
  FROM pu
)
SELECT cohort, CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       CAST((sum(converted) * 1000000) // count(*) AS BIGINT) AS conv_ppm
FROM c GROUP BY 1"""

    # declared-vs-predicted language confusion (composes sql["lang_id"]).
    sql["lang_mismatch"] = f"""
SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN ({sql["lang_id"]}) p USING (doc_id)
GROUP BY 1, 2"""

    # per-source exact-dup rate (dedup.host_dup_rate): the dedup_exact
    # hash convention grouped by source.
    sql["host_dup"] = """
WITH hd AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT sha256(regexp_replace(trim(text), '\\s+', ' ',
                                                   'g'))) AS BIGINT)
           AS n_unique
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_unique,
       CAST(((n_docs - n_unique) * 1000000) // n_docs AS BIGINT) AS dup_ppm
FROM hd"""

    # conversion latency histogram (events.convert_latency): first click
    # per user -> first purchase at-or-after, log2(gap+1) buckets.
    sql["convert_latency"] = """
WITH b AS (
  SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s, event_type AS t
  FROM events
),
f0 AS (SELECT u, CAST(min(s) AS BIGINT) AS s0 FROM b
       WHERE t = 'click' GROUP BY 1),
g AS (
  SELECT f0.u, CAST(min(b.s - f0.s0) AS BIGINT) AS gap
  FROM f0 JOIN b ON b.u = f0.u AND b.t = 'purchase'
             AND b.s >= f0.s0 AND b.s - f0.s0 <= 604800
  GROUP BY 1
),
h AS (
  SELECT CAST(length(bin(gap + 1)) - 1 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM g GROUP BY 1
)
SELECT bucket, CAST(pow(2, bucket) AS BIGINT) - 1 AS lo_sec, n FROM h"""

    # bounded Kahn layering (kgops.topological_layers): 4 unrolled peels,
    # residue = -1.
    _tl_parts = []
    _tl_out = []
    for _k in range(4):
        _tl_parts.append(f""",
tz{_k} AS MATERIALIZED (
  SELECT node FROM tn{_k}
  WHERE node NOT IN (SELECT dst FROM te{_k})
),
tn{_k + 1} AS MATERIALIZED (
  SELECT node FROM tn{_k} WHERE node IN (SELECT dst FROM te{_k})
),
te{_k + 1} AS MATERIALIZED (
  SELECT src, dst FROM te{_k} WHERE src NOT IN (SELECT node FROM tz{_k})
)""")
        _tl_out.append(
            f"SELECT node AS entity, CAST({_k} AS BIGINT) AS layer FROM tz{_k}"
        )
    _tl_out.append(
        "SELECT node AS entity, CAST(-1 AS BIGINT) AS layer FROM tn4"
    )
    sql["topo_layers"] = (
        _PRELUDE_INFER + _STD_CTES + """
, te0 AS MATERIALIZED (SELECT DISTINCT subject AS src, object AS dst FROM std),
tn0 AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM te0 UNION ALL SELECT dst FROM te0)
)"""
        + "".join(_tl_parts)
        + "\n"
        + "\nUNION ALL\n".join(_tl_out)
    )

    # novelty curve (curation.novelty_curve): first-occurrence-batch per
    # 48-bit gram hash, per-batch new-share ppm.
    sql["novelty"] = """
WITH ng AS MATERIALIZED (
  SELECT batch, unnest(gs) AS g FROM (
    SELECT doc_id // 100 AS batch,
           list_transform(
             range(1, len(ws) - 6),
             i -> ('0x' || substr(md5(array_to_string(ws[i : i + 7], ' ')),
                                  1, 12))::BIGINT) AS gs
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS ws
          FROM documents)
  ) WHERE len(gs) >= 1
),
nf AS (SELECT g, CAST(min(batch) AS BIGINT) AS fb FROM ng GROUP BY g),
pb AS (SELECT batch, CAST(count(*) AS BIGINT) AS n_grams FROM ng GROUP BY 1),
nw AS (
  SELECT ng.batch, CAST(count(*) AS BIGINT) AS n_new
  FROM ng JOIN nf ON ng.g = nf.g AND ng.batch = nf.fb
  GROUP BY 1
)
SELECT CAST(pb.batch AS BIGINT) AS batch, pb.n_grams,
       CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new,
       CAST((COALESCE(nw.n_new, 0) * 1000000) // pb.n_grams AS BIGINT)
         AS novelty_ppm
FROM pb LEFT JOIN nw ON pb.batch = nw.batch"""

    # embedding QA (similarity.embedding_qa): per-component micro-frozen
    # norm^2, exact zero/unit tests.
    sql["embedding_qa"] = """
WITH rows_e AS (
  SELECT CASE WHEN len(embedding) <> 64 THEN 1 ELSE 0 END AS bad_dim,
         CASE WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
              THEN 1 ELSE 0 END AS has_null,
         CASE WHEN len(list_filter(embedding, x -> x IS NULL)) > 0
              THEN NULL
              ELSE list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                * 1000000.0) AS BIGINT)))
         END AS n2
  FROM embeddings
)
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(bad_dim) AS BIGINT) AS n_bad_dim,
       CAST(sum(has_null) AS BIGINT) AS n_null_component,
       CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_norm,
       CAST((sum(CASE WHEN n2 BETWEEN 999000 AND 1001000 THEN 1 ELSE 0 END)
             * 1000000) // count(*) AS BIGINT) AS n_unit_ppm
FROM rows_e"""

    # interval-overlap join (events.session_incidents): the sessions CTE
    # chain + cover-bucket explode vs incident hours.
    sql["session_incidents"] = """
WITH o AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), f AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR floor(epoch(ts)) - floor(epoch(prev_ts)) > 1800
                 THEN 1 ELSE 0 END AS ns
  FROM o
), x AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS idx
  FROM f
), sess AS (
  SELECT CAST(user_id AS VARCHAR) || '-' || CAST(idx AS VARCHAR)
           AS session_id,
         user_id,
         CAST(min(floor(epoch(ts))) AS BIGINT) AS lo,
         CAST(max(floor(epoch(ts))) AS BIGINT) AS hi
  FROM x GROUP BY user_id, idx
), cov AS (
  SELECT session_id, user_id,
         unnest(range(lo // 3600, hi // 3600 + 1)) AS b
  FROM sess
), inc AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS b,
         CAST(count(*) AS BIGINT) AS n_incidents
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT c.session_id, c.user_id, CAST(c.b * 3600 AS BIGINT) AS hour_sec,
       i.n_incidents
FROM cov c JOIN inc i USING (b)"""

    # char-bigram entropy (textstats.char_entropy): xlx milli freeze.
    _xlxm = (
        "CAST(round(CAST({x} AS DOUBLE) * ln(CAST({x} AS DOUBLE))"
        " * 1000.0) AS BIGINT)"
    )
    sql["char_entropy"] = f"""
WITH cbase AS (
  SELECT doc_id, lower(text) AS t FROM documents
  WHERE length(lower(text)) >= 2
),
cbg AS (
  SELECT doc_id, substr(t, i, 2) AS bg
  FROM cbase, UNNEST(range(1, length(t))) AS r(i)
),
ccnt AS (
  SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c FROM cbg GROUP BY 1, 2
),
ca AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum({_xlxm.format(x="c")}) AS BIGINT) AS sxlx
  FROM ccnt GROUP BY 1
)
SELECT doc_id, n AS n_bigrams,
       ({_xlxm.format(x="n")} - sxlx) // n AS entropy_milli
FROM ca"""

    # TPC-H Q5-shape revenue per nation (relational.revenue_by_nation):
    # the shared REVENUE_CENTS_SQL freezes per-row money to cents before
    # any aggregation.
    from ai_knowledge_graph_spark.operators.relational import (
        REVENUE_CENTS_SQL,
    )

    sql["revenue_nation"] = f"""
SELECT n.n_name,
       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
       CAST(sum({REVENUE_CENTS_SQL}) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name"""

    # trailing 7-day rolling event counts (events.rolling_counts): RANGE
    # frame over epoch days.
    sql["rolling"] = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
                         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS rolling_n
FROM daily"""

    # Pearson correlation of two event types' daily counts (shared
    # _PEARSON_SQL; outer-joined days, zero-filled).
    from ai_knowledge_graph_spark.operators.events import _PEARSON_SQL

    sql["event_corr"] = f"""
WITH base AS (
  SELECT event_type AS t, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
),
dx AS (SELECT day, CAST(count(*) AS BIGINT) AS x FROM base
       WHERE t = 'click' GROUP BY 1),
dy AS (SELECT day, CAST(count(*) AS BIGINT) AS y FROM base
       WHERE t = 'purchase' GROUP BY 1),
xy AS (
  SELECT COALESCE(x, 0) AS x, COALESCE(y, 0) AS y
  FROM dx FULL OUTER JOIN dy USING (day)
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
  FROM xy
)
SELECT n AS n_days,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN {_PEARSON_SQL} END AS corr_micro
FROM m"""

    return sql


# clean_graph oracle: mirrors scripts/clean_graph.py steps 2-7 over triples1.
_PRED_MERGES_SQL = """map {
  'is': 'is_a', 'are': 'is_a', 'be': 'is_a', 'was': 'is_a', 'were': 'is_a',
  'has': 'has_component', 'have': 'has_component',
  'include': 'includes', 'includes': 'includes',
  'value': 'has_value', 'set': 'belongs_to_set', 'exists': 'exists_in',
  'use': 'uses', 'used': 'uses', 'do': 'performs', 'does': 'performs',
  'make': 'produces', 'makes': 'produces', 'called': 'is_named', 'known': 'is_known_as'
}"""

_NOISE_RE = (
    "^(i|we|they|it|he|she|you|this|that|these|those|there|here)$"
    "|^(the|a|an|of|in|on|at|to|for|with|and|or|but|not)$"
    r"|^\d+$"
    r"|^[.\-_/\\]+$"
    "|^(file|page|line|section|chapter|part|item|example|note)$"
)

def _strip_quotes(expr: str) -> str:
    # python: .strip() -> .strip('"') -> .strip("'") -> .strip()
    return f"trim(trim(trim(trim({expr}), '\"'), ''''))"


_CLEAN_SQL = f"""
, normed AS (
  SELECT
    regexp_replace({_strip_quotes('subject')}, '\\s+', ' ', 'g') AS subject,
    replace(lower(regexp_replace({_strip_quotes('predicate')}, '\\s+', ' ', 'g')), ' ', '_') AS predicate,
    regexp_replace({_strip_quotes('object')}, '\\s+', ' ', 'g') AS object,
    doc_id, chunk, t_idx
  FROM triples1
  WHERE subject IS NOT NULL AND subject <> ''
    AND predicate IS NOT NULL AND predicate <> ''
    AND object IS NOT NULL AND trim(object) <> ''
),
longf AS (
  SELECT * FROM normed WHERE length(subject) >= 3 AND length(object) >= 3
),
noisef AS (
  SELECT * FROM longf
  WHERE NOT regexp_matches(lower(trim(subject)), '{_NOISE_RE}')
    AND NOT regexp_matches(lower(trim(object)), '{_NOISE_RE}')
),
mergedp AS (
  SELECT subject,
    coalesce(element_at({_PRED_MERGES_SQL}, predicate)[1], predicate) AS predicate,
    object, doc_id, chunk, t_idx
  FROM noisef
),
dedup2 AS (
  SELECT subject, predicate, object FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lower(subject), lower(predicate), lower(object)
      ORDER BY doc_id ASC, chunk ASC, t_idx ASC
    ) AS rn
    FROM mergedp
  ) WHERE rn = 1
),
predcnt AS (
  SELECT predicate, count(*) AS pc FROM dedup2 GROUP BY 1
)
SELECT d.subject, d.predicate, d.object
FROM dedup2 d JOIN predcnt p USING (predicate) WHERE p.pc >= 2
"""
