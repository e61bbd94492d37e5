"""Tests for transe_score, profile_columns, llr_keywords."""

from __future__ import annotations

import math

from ai_knowledge_graph_spark.graph.kgops import transe_score
from ai_knowledge_graph_spark.operators.stats import profile_columns
from ai_knowledge_graph_spark.operators.textstats import llr_keywords


# --- transe_score ------------------------------------------------------------


def _h48(name: str, salt: str, k: int) -> int:
    import hashlib

    h = hashlib.md5(f"{name}\x1f{salt}\x1f{k}".encode()).hexdigest()[:12]
    return int(h, 16)


def _comp(name: str, salt: str, k: int) -> int:
    # Spark's % is a remainder (sign of dividend); _h48 is non-negative
    return _h48(name, salt, k) % 2001 - 1000


def test_transe_matches_hand_replay(spark):
    triples = spark.createDataFrame(
        [("a", "rel", "b"), ("b", "rel", "c")],
        ["subject", "predicate", "object"],
    )
    got = {
        (r["subject"], r["object"]): r["transe_score"]
        for r in transe_score(triples, dim=4).collect()
    }
    for s, o in [("a", "b"), ("b", "c")]:
        want = sum(
            abs(
                _comp(s, "ent", k) + _comp("rel", "rel", k) - _comp(o, "ent", k)
            )
            for k in range(4)
        )
        assert got[(s, o)] == want


def test_transe_deduplicates_and_is_deterministic(spark):
    triples = spark.createDataFrame(
        [("a", "r", "b"), ("a", "r", "b"), ("x", "r", "a")],
        ["subject", "predicate", "object"],
    )
    out1 = sorted(map(tuple, transe_score(triples).collect()))
    out2 = sorted(map(tuple, transe_score(triples).collect()))
    assert out1 == out2
    assert len(out1) == 2  # distinct (s,p,o)


def test_transe_self_translation_identity(spark):
    # h == t => score = sum |r_k| exactly (entity vectors cancel)
    triples = spark.createDataFrame(
        [("a", "r", "a")], ["subject", "predicate", "object"]
    )
    [row] = transe_score(triples, dim=8).collect()
    want = sum(abs(_comp("r", "rel", k)) for k in range(8))
    assert row["transe_score"] == want


# --- profile_columns ---------------------------------------------------------


def test_profile_basic(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (2, "y", 5.0), (2, None, 7.0)],
        ["k", "s", "v"],
    )
    got = {r["column"]: r for r in profile_columns(df, ["k", "s", "v"]).collect()}
    assert got["k"]["n_rows"] == 3
    assert got["k"]["n_nulls"] == 0 and got["k"]["n_distinct"] == 2
    assert (got["k"]["min_str"], got["k"]["max_str"]) == ("1", "2")
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["v"]["n_nulls"] == 1
    assert got["v"]["min_str"] == "5.0" and got["v"]["max_str"] == "7.0"


def test_profile_numeric_order_not_lexicographic(spark):
    # native-type min/max: 9 < 10 numerically (lexicographic would say "10" < "9")
    df = spark.createDataFrame([(9,), (10,)], ["n"])
    [r] = profile_columns(df, ["n"]).collect()
    assert (r["min_str"], r["max_str"]) == ("9", "10")


def test_profile_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k INT, dead STRING"
    )
    got = {r["column"]: r for r in profile_columns(df, ["dead"]).collect()}
    r = got["dead"]
    assert r["n_nulls"] == 2 and r["n_distinct"] == 0
    assert r["min_str"] is None and r["max_str"] is None


# --- llr_keywords ------------------------------------------------------------


def _xlx_milli(x: int) -> int:
    return int(round(x * math.log(x) * 1000.0)) if x > 0 else 0


def test_llr_hand_replay(spark):
    # source A: "apple" x6 + "common" x6; source B: "banana" x6 + "common" x6
    docs = spark.createDataFrame(
        [("A", "apple " * 6 + "common " * 6), ("B", "banana " * 6 + "common " * 6)],
        ["source", "text"],
    )
    rows = llr_keywords(docs, top_k=5, min_count=5).collect()
    got = {(r["source"], r["word"]): r for r in rows}
    # hand contingency for ("A","apple"): a=6, wt=6, st=12, n=24
    a, wt, st, n = 6, 6, 12, 24
    b, c, d = wt - a, st - a, n - wt - st + a
    want = 2 * (
        _xlx_milli(a) + _xlx_milli(b) + _xlx_milli(c) + _xlx_milli(d)
        - _xlx_milli(a + b) - _xlx_milli(c + d)
        - _xlx_milli(a + c) - _xlx_milli(b + d)
        + _xlx_milli(n)
    )
    assert got[("A", "apple")]["llr_milli"] == want
    assert got[("A", "apple")]["n_in_source"] == 6
    # distinctive words rank first in each source
    assert got[("A", "apple")]["rank"] == 1
    assert got[("B", "banana")]["rank"] == 1
    # "common" is evenly distributed (a*n == wt*st): the over-representation
    # gate excludes it entirely — LLR is two-sided, and an even (or under-
    # represented) word must not surface as a source's distinctive term
    assert ("A", "common") not in got and ("B", "common") not in got


def test_llr_min_count_gate_and_top_k(spark):
    docs = spark.createDataFrame(
        [("A", "rare " + "hot " * 10 + "warm " * 10)], ["source", "text"]
    )
    rows = llr_keywords(docs, top_k=1, min_count=5).collect()
    words = {r["word"] for r in rows}
    assert "rare" not in words  # below min_count
    assert len(rows) <= 1  # top_k respected


def test_llr_tie_break_alphabetical(spark):
    # two words with identical counts in the same source tie on llr;
    # rank order must be alphabetical
    docs = spark.createDataFrame(
        [("A", "zeta " * 6 + "alpha " * 6), ("B", "other " * 12)],
        ["source", "text"],
    )
    rows = [r for r in llr_keywords(docs, top_k=5).collect() if r["source"] == "A"]
    by_rank = {r["rank"]: r["word"] for r in rows}
    assert by_rank[1] == "alpha" and by_rank[2] == "zeta"
