"""Tests for containment_pairs, degree_assortativity, hyperball."""

from __future__ import annotations

import hashlib
import math

from ai_knowledge_graph_spark.graph.kgops import degree_assortativity
from ai_knowledge_graph_spark.graph.walks import hyperball
from ai_knowledge_graph_spark.operators.dedup import containment_pairs


# --- containment_pairs ----------------------------------------------------


def test_containment_quote_detection(spark):
    # doc 1 is a verbatim excerpt of doc 2: containment(1->2)=1.0 while
    # containment(2->1) is low
    quote = "alpha beta gamma delta epsilon"
    long_doc = "intro words here " + quote + " and a very long tail " + \
        "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "totally different text entirely now")],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["shared"], r["size_a"], r["containment_ppm"])
        for r in containment_pairs(docs, k=3, min_containment=0.5).collect()
    }
    # quote has 3 shingles (5 words, k=3), all inside doc 2
    assert got[(1, 2)] == (3, 3, 1_000_000)
    assert (2, 1) not in got  # 3/25 shingles of doc2 in doc1 -> below 0.5
    assert (1, 3) not in got and (3, 1) not in got


def test_containment_hot_shingle_cap(spark):
    # one shingle shared by all 4 docs; cap at df<=3 removes it
    docs = spark.createDataFrame(
        [(i, "common one two " + f"unique{i} word{i} tail{i}") for i in range(4)],
        ["doc_id", "text"],
    )
    uncapped = containment_pairs(docs, k=3, min_containment=0.1)
    capped = containment_pairs(docs, k=3, min_containment=0.1, max_shingle_df=3)
    assert uncapped.count() == 12  # all ordered pairs share "common one two"
    assert capped.count() == 0


# --- degree_assortativity ---------------------------------------------------


def _spo(spark, pairs):
    return spark.createDataFrame(
        [(a, "rel", b) for a, b in pairs], ["subject", "predicate", "object"]
    )


def test_assortativity_star_is_minus_one(spark):
    t = _spo(spark, [("hub", "l1"), ("hub", "l2"), ("hub", "l3")])
    row = degree_assortativity(t).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 3
    assert row["assortativity"] == -1.0


def test_assortativity_regular_graph_is_null(spark):
    # 4-cycle: every degree 2 -> zero variance -> NULL
    t = _spo(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    row = degree_assortativity(t).collect()[0]
    assert row["assortativity"] is None
    assert row["n_edges"] == 4


# --- hyperball --------------------------------------------------------------


def _py_hyperball(edges, radius=3, p=6):
    m = 1 << p
    rest_bits = 48 - p
    adj: dict[str, set] = {}
    nodes = set()
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
        nodes |= {s, d}

    def reg_of(n):
        h = int(hashlib.md5(f"hb:{n}".encode()).hexdigest()[:12], 16)
        bucket = h >> rest_bits
        rest = h % (1 << rest_bits)
        rho = rest_bits + 1 if rest == 0 else rest_bits - rest.bit_length() + 1
        return bucket, rho

    sketch = {n: {reg_of(n)[0]: reg_of(n)[1]} for n in nodes}
    for _ in range(radius):
        nxt = {}
        for n in nodes:
            merged = dict(sketch[n])
            for v in adj.get(n, ()):  # successors
                for b, r in sketch[v].items():
                    if merged.get(b, 0) < r:
                        merged[b] = r
            nxt[n] = merged
        sketch = nxt
    out = {}
    for n, regs in sketch.items():
        s = sum(1 << (62 - r) for r in regs.values()) + (m - len(regs)) * (1 << 62)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m * float(2**62) / float(s)
        n_zero = m - len(regs)
        if raw <= 2.5 * m and n_zero > 0:
            est = m * math.log(m / n_zero)
        else:
            est = raw
        out[n] = (round(est, 6), n_zero)
    return out


HB_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"),
    ("a", "c"), ("x", "a"), ("y", "x"),
]


def test_hyperball_matches_python_replay(spark):
    edges = spark.createDataFrame(HB_EDGES, ["src", "dst"])
    got = {
        r["node"]: (r["ball_size"], r["n_zero_registers"])
        for r in hyperball(edges, radius=3).collect()
    }
    assert got == _py_hyperball(HB_EDGES, radius=3)


def test_hyperball_ball_grows_with_radius(spark):
    edges = spark.createDataFrame(HB_EDGES, ["src", "dst"])
    r1 = {r["node"]: r["ball_size"] for r in hyperball(edges, radius=1).collect()}
    r3 = {r["node"]: r["ball_size"] for r in hyperball(edges, radius=3).collect()}
    assert all(r3[n] >= r1[n] for n in r1)
    # y reaches {y,x} at r=1 but {y,x,a,b,c} at r=3
    assert r3["y"] > r1["y"]
