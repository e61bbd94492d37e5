"""200k-doc growth bench for the doc-ops family (round-3 verdict ask #4).

The KG pipeline has a 200k-doc scaling row in BASELINE.md; this gives the
document-operator family the same treatment: one combined 200k-doc run of
the five headliners — near-dup dedup application, ExactSubstr span dedup,
SemDeDup, the curation funnel, and PQ-ANN — with per-op timings, so the
growth vs the 5k-doc sf0.1 numbers can be tabled and checked for
superlinear stages.

Corpus: deterministic synthetic documents over a 5,000-word vocabulary
(hash-indexed; 40-80 words/doc) with a controlled duplicate structure —
every 10th doc is a 2-word mutation of its decade's base doc — so the
near-dup operators do real clustering work at a realistic (~10%) dup rate
instead of the sf fixtures' 30-word-soup collision regime, which at 200k
docs would measure bucket pathology, not operator cost. Embeddings:
20,000 x 64-dim seeded normals (10x the sf0.1 table). Everything is
generated DISTRIBUTED (mapInPandas over spark.range) and written once to
$DOC200K_DIR; re-runs reuse the parquet.

Usage:  PYTHONHASHSEED=0 python BENCH/doc_ops_200k.py
Prints one JSON line: {"metric": "doc_ops_200k_sec", "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

N_DOCS = int(os.environ.get("DOC200K_DOCS", "200000"))
N_EMB = int(os.environ.get("DOC200K_EMB", "20000"))
OUT = os.environ.get("DOC200K_DIR", "/tmp/sf_doc200k")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

LANGS = ["en", "de", "fr", "zh", "es"]


def _gen_documents(spark) -> None:
    import hashlib

    import pandas as pd

    vocab = [f"term{i:04d}" for i in range(5000)]

    def words_for(doc_id: int) -> list[str]:
        # every 10th doc (doc_id % 10 == 9) is a 2-word mutation of its
        # predecessor -> ~10% of docs are near-dups, in pairs (realistic
        # web-crawl dup rate; keeps component clustering honest without
        # collapsing the corpus into giant clusters)
        src = doc_id - 1 if doc_id % 10 == 9 else doc_id
        n = 40 + src % 41
        ws = [
            vocab[
                int.from_bytes(
                    hashlib.md5(f"{src}:{i}".encode()).digest()[:4], "big"
                )
                % len(vocab)
            ]
            for i in range(n)
        ]
        if doc_id != src:
            for j in (3, 20):
                ws[j % n] = vocab[(doc_id + j) % len(vocab)]
        return ws

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                text = " ".join(words_for(did))
                rows.append(
                    {
                        "doc_id": did,
                        "text": text,
                        "lang": LANGS[did % len(LANGS)],
                        "source": f"src{did % 20}",
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            )

    (
        spark.range(N_DOCS)
        .repartition(64)
        .mapInPandas(
            gen, "doc_id long, text string, lang string, source string, n_chars long"
        )
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )


def _gen_embeddings(spark) -> None:
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for vid in pdf["id"]:
                vid = int(vid)
                v = np.random.RandomState(vid).standard_normal(64)
                v = (v / np.linalg.norm(v)).astype("float32")
                rows.append(
                    {"vec_id": vid, "embedding": v.tolist(), "label": vid % 16}
                )
            yield pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])

    (
        spark.range(N_EMB)
        .repartition(32)
        .mapInPandas(gen, "vec_id long, embedding array<float>, label int")
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod
    from ai_knowledge_graph_spark.session import get_spark

    spark = get_spark("doc200k", master=f"local[{CPUS}]")
    t0 = time.time()
    if not os.path.exists(f"{OUT}/documents.parquet"):
        _gen_documents(spark)
        _gen_embeddings(spark)
    gen_sec = round(time.time() - t0, 1)

    ops = [
        ("near_dup_dedup", entry_mod.q_minhash_dedup_docs),
        ("exact_substring", entry_mod.q_exact_substring),
        ("semdedup", entry_mod.q_semdedup),
        ("curate_corpus", entry_mod.q_curate_corpus),
        ("pq_topk", entry_mod.q_pq_topk),
        # round-4 session-4 additions: CDC chunking (per-doc windows),
        # Hearst mining (regex scans + one agg), asymmetric containment
        # (capped shingle join) — all linear-family doc ops
        ("cdc_chunks", entry_mod.q_cdc_chunks),
        ("hearst", entry_mod.q_hearst),
        ("containment", entry_mod.q_containment),
        # round-5 additions (verdict ask #7): the text/IR family —
        # TextRank keywords (iterative agg over the bigram graph),
        # centroid summaries (windowed scoring), QLM retrieval (per-term
        # agg), LLR keywords (contingency aggs), PMI collocations
        # (bigram aggs) — all expected ~linear in corpus size
        ("textrank", entry_mod.q_textrank),
        ("summarize", entry_mod.q_summarize),
        ("qlm", entry_mod.q_qlm),
        ("llr_keywords", entry_mod.q_llr_keywords),
        ("collocations", entry_mod.q_collocations),
    ]
    def force(df) -> None:
        # noop sink: forces EVERY output column (count() lets Spark prune
        # expensive computed columns — exact_substring's cleaned text
        # measured 0.6 s "at 200k docs" under count() because the clean
        # text was never built), with no real sink cost
        df.write.mode("overwrite").format("noop").save()

    # untimed warm-up at sf0.001: spawns python workers + compiles every
    # plan's codegen classes so the 200k run measures steady-state cost
    for _, fn in ops:
        force(fn(spark, "/root/testdata/sf0.001"))

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, fn in ops:
        t = time.time()
        force(fn(spark, OUT))
        timings[name] = round(time.time() - t, 3)
    for name, fn in ops:  # row counts for the table, untimed
        counts[name] = fn(spark, OUT).count()

    # semdedup with nlist='auto' at two embedding-table sizes (2k = sf0.1,
    # 20k = this corpus): auto sizes nlist to hold expected cluster size
    # constant, so the 10x growth must land ~10x (the fixed-nlist law
    # measured 17.4x for the same pair in round 4)
    from ai_knowledge_graph_spark.operators.similarity import semdedup

    for tag, d in (("semdedup_auto_2k", "/root/testdata/sf0.1"),
                   ("semdedup_auto_20k", OUT)):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        force(semdedup(emb, threshold=0.35, nlist="auto"))  # warm
        t = time.time()
        force(semdedup(emb, threshold=0.35, nlist="auto"))
        timings[tag] = round(time.time() - t, 3)

    print(
        json.dumps(
            {
                "metric": "doc_ops_200k_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "rows": counts,
                "docs": N_DOCS,
                "embeddings": N_EMB,
                "gen_sec": gen_sec,
                "cores": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main()
