"""K=1024 BPE encode bench (round-3 verdict ask #2 'Done' criterion).

The replace-chain encoder cannot go past validation K (a K-deep expression
tree is un-codegen-able and driver-side tree building alone melts); this
measures the production path at a real merge depth: one distributed
word_histogram pass -> driver-side train (train_bpe_local; the histogram is
vocabulary-sized) -> bpe_encode_ranked over the corpus (broadcast rank
dict + Arrow pandas UDF over distinct words).

Corpus: the 200k-doc doc-ops bench corpus (5,000-term vocabulary — rich
enough to support >1024 genuine merges). Generate it first via
BENCH/doc_ops_200k.py if absent.

Usage: PYTHONHASHSEED=0 python BENCH/bpe_encode_k1024.py [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIR = os.environ.get("DOC200K_DIR", "/tmp/sf_doc200k")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main(k: int) -> None:
    from ai_knowledge_graph_spark.operators.tokenizer import (
        bpe_encode_ranked,
        train_bpe_local,
        word_histogram,
    )
    from ai_knowledge_graph_spark.session import get_spark

    spark = get_spark("bpe1024", master=f"local[{CPUS}]")
    docs = spark.read.parquet(f"{DIR}/documents.parquet").select("doc_id", "text")

    t0 = time.time()
    wc = {r["word"]: r["wcount"] for r in word_histogram(docs).collect()}
    hist_sec = round(time.time() - t0, 2)

    t0 = time.time()
    merges = train_bpe_local(wc, k)
    train_sec = round(time.time() - t0, 2)

    # warm-up: python workers + plan shapes, tiny slice
    bpe_encode_ranked(docs.limit(64), merges).count()

    t0 = time.time()
    out = bpe_encode_ranked(docs, merges)
    n_tokens = out.agg({"n_tokens": "sum"}).collect()[0][0]
    enc_sec = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "bpe_encode_k_sec",
                "value": enc_sec,
                "unit": "sec",
                "k_merges": len(merges),
                "vocab_words": len(wc),
                "docs": docs.count(),
                "total_tokens": int(n_tokens),
                "tokens_per_sec": round(n_tokens / enc_sec),
                "histogram_sec": hist_sec,
                "train_local_sec": train_sec,
                "cores": int(CPUS),
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
