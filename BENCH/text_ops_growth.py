#!/usr/bin/env python3
"""Growth series for the text/IR operator family (verdict-r4 ask #7).

The shared doc_ops_200k corpus uses a `term0042`-style vocab; the text
operators tokenize `[a-z]+`, which collapses every token to the single
word "term" — TextRank's co-occurrence graph degenerates to zero nodes
and the timings measure nothing. This harness synthesizes an ALPHA-ONLY
vocab corpus (same md5-derived word choice, words like "wbcde") at TWO
sizes in one run and times each operator at both, so the growth ratio is
self-contained (both legs share the host window — ratios survive window
drift that absolute times do not).

Expected: ~linear (ratio ≈ size ratio) for every op — each is
tokenize + bounded-fanout explode + hash aggs; TextRank's iterations run
on the vocab-sized word graph (constant in doc count once the vocab
saturates), so its ratio may land BELOW the size ratio.

Prints one JSON line: timings at both sizes + per-op growth ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL = int(os.environ.get("TEXTOPS_SMALL", "20000"))
N_BIG = int(os.environ.get("TEXTOPS_BIG", "200000"))
OUT = os.environ.get("TEXTOPS_DIR", "/tmp/sf_textops")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _gen(spark, n_docs: int, path: str) -> None:
    import hashlib

    import pandas as pd

    # alpha-only vocab: digits of i mapped to letters -> "wbcde" for 1234;
    # every word length >= 2+1, zero stopword collisions, 5000 distinct
    vocab = [
        "w" + "".join(chr(97 + int(c)) for c in str(i)) for i in range(5000)
    ]

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                n = 40 + did % 41
                ws = [
                    vocab[
                        int.from_bytes(
                            hashlib.md5(f"{did}:{i}".encode()).digest()[:4],
                            "big",
                        )
                        % len(vocab)
                    ]
                    for i in range(n)
                ]
                text = " ".join(ws)
                rows.append(
                    {
                        "doc_id": did,
                        "text": text,
                        "lang": "en",
                        "source": f"src{did % 20}",
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "text", "lang", "source", "n_chars"],
            )

    (
        spark.range(n_docs)
        .repartition(64)
        .mapInPandas(
            gen,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        .write.mode("overwrite")
        .parquet(f"{path}/documents.parquet")
    )


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CODEGEN", "on")
    from ai_knowledge_graph_spark.session import get_spark
    from ai_knowledge_graph_spark.operators.ranking import dirichlet_lm_rank
    from ai_knowledge_graph_spark.operators.textstats import (
        centroid_summaries,
        llr_keywords,
        textrank_keywords,
        word_collocations,
    )

    import __spark_entry__ as entry_mod

    spark = get_spark(
        "text_ops_growth", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )

    def ops(docs):
        return [
            ("textrank", lambda: textrank_keywords(docs, iterations=5, top_k=50)),
            ("summarize", lambda: centroid_summaries(docs, seg_len=15)),
            (
                "qlm",
                lambda: dirichlet_lm_rank(
                    docs, entry_mod.BM25_QUERY, mu=2000, top_n=20
                ),
            ),
            (
                "llr_keywords",
                lambda: llr_keywords(
                    docs.select("source", "text"), top_k=5, min_count=5
                ),
            ),
            (
                "collocations",
                lambda: word_collocations(docs, min_count=5, top_k=20),
            ),
        ]

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    result: dict = {"sizes": {"small": N_SMALL, "big": N_BIG}, "timings": {}, "rows": {}}
    for tag, n in (("small", N_SMALL), ("big", N_BIG)):
        path = f"{OUT}_{tag}"
        _gen(spark, n, path)
        docs = spark.read.parquet(f"{path}/documents.parquet")
        result["timings"][tag] = {}
        result["rows"][tag] = {}
        for name, thunk in ops(docs):
            force(thunk())  # warm (JIT, scan cache)
            t = time.time()
            force(thunk())
            result["timings"][tag][name] = round(time.time() - t, 3)
            result["rows"][tag][name] = thunk().count()

    size_ratio = N_BIG / N_SMALL
    result["size_ratio"] = size_ratio
    result["growth_ratio"] = {
        name: round(
            result["timings"]["big"][name] / result["timings"]["small"][name], 2
        )
        for name in result["timings"]["big"]
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
