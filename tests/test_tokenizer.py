"""train_bpe / bpe_encode: pure-Python Sennrich replay + encode properties."""

from __future__ import annotations

from collections import Counter

import pytest

from ai_knowledge_graph_spark.operators.tokenizer import (
    EOW,
    SEP,
    bpe_encode,
    train_bpe,
    word_histogram,
)

CORPUS = [
    (0, "low low low low low lower lower newest newest"),
    (1, "newest newest newest newest widest widest widest"),
    (2, "low lower newest widest new new new nested nest"),
]


def _py_bpe(texts, n_merges):
    """Sennrich et al. 2016 reference: same (count desc, pair asc) tiebreak."""
    wc = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w) + (EOW,): c for w, c in wc.items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + SEP + kv[0][1])
        )
        (a, b), c = best
        merges.append((rank, a, b, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_word_histogram(corpus_df):
    got = {r["word"]: r["wcount"] for r in word_histogram(corpus_df).collect()}
    exp = Counter(w for _, t in CORPUS for w in t.split())
    assert got == dict(exp)


def test_train_bpe_matches_python_replay(corpus_df):
    k = 30
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in train_bpe(corpus_df, n_merges=k).orderBy("merge_rank").collect()
    ]
    exp = _py_bpe([t for _, t in CORPUS], k)
    assert got == exp


def test_train_bpe_early_stop(spark):
    # single 1-char word: one pair (c, EOW), then nothing left to merge
    df = spark.createDataFrame([(0, "a a a")], "doc_id long, text string")
    merges = train_bpe(df, n_merges=10).collect()
    assert len(merges) == 1
    assert (merges[0]["lhs"], merges[0]["rhs"]) == ("a", EOW)


def test_bpe_encode_roundtrip(corpus_df):
    merges = train_bpe(corpus_df, n_merges=20)
    enc = {r["doc_id"]: r for r in bpe_encode(corpus_df, merges).collect()}
    for doc_id, text in CORPUS:
        toks = enc[doc_id]["tokens"]
        # concatenating tokens reconstructs the words + EOW marks, in order
        assert "".join(toks) == "".join(w + EOW for w in text.split())
        assert enc[doc_id]["n_tokens"] == len(toks)
        # frequent whole words become single tokens at k=20
    assert "low" + EOW in enc[0]["tokens"]


def test_bpe_encode_compresses(corpus_df):
    none = bpe_encode(corpus_df, [])
    some = bpe_encode(corpus_df, train_bpe(corpus_df, n_merges=20))
    n0 = {r["doc_id"]: r["n_tokens"] for r in none.collect()}
    n1 = {r["doc_id"]: r["n_tokens"] for r in some.collect()}
    assert all(n1[d] < n0[d] for d in n0)


def test_ranked_encoder_matches_replace_chain(corpus_df):
    """bpe_encode_ranked (broadcast rank dict + pandas UDF min-rank loop)
    must be token-identical to bpe_encode (K-deep replace chain replaying
    merges in rank order) — the equivalence argued in encode_word's
    docstring, pinned here at K=20 on the classic Sennrich corpus."""
    from ai_knowledge_graph_spark.operators.tokenizer import bpe_encode_ranked

    merges = train_bpe(corpus_df, n_merges=20)
    chain = {
        r["doc_id"]: list(r["tokens"]) for r in bpe_encode(corpus_df, merges).collect()
    }
    ranked = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode_ranked(corpus_df, merges).collect()
    }
    assert ranked == chain


def test_ranked_encoder_matches_chain_on_random_corpora(spark):
    """Property check over adversarial small alphabets (repeats like
    'aaaa' exercise the non-overlapping left-to-right rule; ab/ba chains
    exercise merge-creates-new-pair orderings)."""
    import random

    from ai_knowledge_graph_spark.operators.tokenizer import bpe_encode_ranked

    rng = random.Random(7)
    for trial in range(4):
        docs = [
            (
                i,
                " ".join(
                    "".join(rng.choice("aab") for _ in range(rng.randint(1, 7)))
                    for _ in range(rng.randint(1, 12))
                ),
            )
            for i in range(6)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        merges = train_bpe(df, n_merges=rng.randint(1, 12))
        chain = {
            r["doc_id"]: list(r["tokens"]) for r in bpe_encode(df, merges).collect()
        }
        ranked = {
            r["doc_id"]: list(r["tokens"])
            for r in bpe_encode_ranked(df, merges).collect()
        }
        assert ranked == chain, f"trial {trial}: {docs}"


def test_ranked_encoder_at_production_merge_count(spark):
    """The whole point of bpe_encode_ranked: K=1024 merges, where a
    1024-deep replace-expression chain is not a viable plan. The merge
    table is trained driver-side with the pure-Python Sennrich replay
    (already pinned equal to train_bpe above) — training depth is not
    what this test measures."""
    from ai_knowledge_graph_spark.operators.tokenizer import (
        bpe_encode_ranked,
        encode_word,
    )

    texts = [
        " ".join(
            f"w{(i * 7 + j) % 97}x{(i + j * 13) % 53}" for j in range(40)
        )
        for i in range(50)
    ]
    merges = [(r, a, b) for r, a, b, _ in _py_bpe(texts, 1024)]
    assert len(merges) > 200  # the corpus genuinely supports deep tables
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    enc = {r["doc_id"]: r for r in bpe_encode_ranked(df, merges).collect()}
    ranks = {(a, b): r for r, a, b in merges}
    for doc_id, text in enumerate(texts):
        exp = [t for w in text.split() for t in encode_word(w, ranks)]
        assert list(enc[doc_id]["tokens"]) == exp
        assert "".join(enc[doc_id]["tokens"]) == "".join(
            w + EOW for w in text.split()
        )


def test_train_bpe_local_matches_distributed(spark, corpus_df):
    """Driver-side trainer over the collected word histogram == the
    distributed trainer (same tiebreak), so train-local/encode-distributed
    is a faithful split at production K."""
    from ai_knowledge_graph_spark.operators.tokenizer import train_bpe_local

    wc = {r["word"]: r["wcount"] for r in word_histogram(corpus_df).collect()}
    local = train_bpe_local(wc, 30)
    dist = [
        (r["merge_rank"], r["lhs"], r["rhs"])
        for r in train_bpe(corpus_df, n_merges=30).orderBy("merge_rank").collect()
    ]
    assert local == dist


def test_train_bpe_local_path_matches_distributed(spark, corpus_df):
    """train_bpe's collect-and-train-local fast path (vocab <= threshold)
    returns the identical MERGES_SCHEMA rows — pair_count included — as the
    distributed per-round loop (local_threshold=0 forces it)."""
    fast = [
        tuple(r)
        for r in train_bpe(corpus_df, n_merges=30).orderBy("merge_rank").collect()
    ]
    dist = [
        tuple(r)
        for r in train_bpe(corpus_df, n_merges=30, local_threshold=0)
        .orderBy("merge_rank")
        .collect()
    ]
    assert fast == dist and len(fast) > 0
