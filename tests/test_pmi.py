"""entity_cooccurrence_pmi: pure-Python replay + association ordering."""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

from ai_knowledge_graph_spark.operators.concepts import entity_cooccurrence_pmi

# contexts: (doc, chunk) -> triples; a/b always together, a/x rarely
TRIPLES = [
    (0, 0, "a", "r", "b"),
    (0, 1, "a", "r", "b"),
    (1, 0, "a", "r", "b"),
    (1, 1, "a", "r", "x"),
    (2, 0, "x", "r", "y"),
    (2, 1, "a", "r", "b"),
    (3, 0, "x", "r", "a"),
    (3, 1, "y", "r", "b"),
]


def _py_pmi(min_pair_count=2):
    ctx_ents: dict = {}
    for d, c, s, _, o in TRIPLES:
        ctx_ents.setdefault((d, c), set()).update((s, o))
    n = len(ctx_ents)
    ent = Counter(e for es in ctx_ents.values() for e in es)
    pair = Counter(
        tuple(sorted(p))
        for es in ctx_ents.values()
        for p in combinations(sorted(es), 2)
    )
    out = {}
    for (x, y), pc in pair.items():
        if pc < min_pair_count:
            continue
        pmi = math.log(pc * n / (ent[x] * ent[y]))
        npmi = pmi / math.log(n / pc)
        out[(x, y)] = (pc, round(pmi, 6), round(npmi, 6))
    return out


def test_pmi_matches_python_replay(spark):
    df = spark.createDataFrame(
        TRIPLES, "doc_id long, chunk int, subject string, predicate string, object string"
    )
    got = {
        (r["entity_a"], r["entity_b"]): (r["pair_count"], r["pmi"], r["npmi"])
        for r in entity_cooccurrence_pmi(df).collect()
    }
    assert got == _py_pmi()


def test_pmi_ranks_true_associates_higher(spark):
    df = spark.createDataFrame(
        TRIPLES, "doc_id long, chunk int, subject string, predicate string, object string"
    )
    got = {
        (r["entity_a"], r["entity_b"]): r["npmi"]
        for r in entity_cooccurrence_pmi(df, min_pair_count=1).collect()
    }
    # a-b co-occur 4/5 of their contexts; a-x only once by accident
    assert got[("a", "b")] > got[("a", "x")]
    # npmi bounded in (-1, 1]
    assert all(-1.0 <= v <= 1.0 for v in got.values())
