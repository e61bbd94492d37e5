"""match_property_path / align_entities unit tests (hand-computable KGs)."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_spark.graph.kgops import (
    align_entities,
    match_property_path,
)

# a -p-> b -p-> c -p-> d -p-> e   (chain for plus-depth checks)
# a -q-> x, b -r-> x, x -p-> y
CHAIN = [
    ("a", "p", "b"),
    ("b", "p", "c"),
    ("c", "p", "d"),
    ("d", "p", "e"),
    ("a", "q", "x"),
    ("b", "r", "x"),
    ("x", "p", "y"),
]


def _kg(spark, rows=CHAIN):
    return spark.createDataFrame(rows, ["subject", "predicate", "object"])


def _pairs(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def test_single_predicate_and_inverse(spark):
    kg = _kg(spark)
    assert _pairs(match_property_path(kg, "q")) == {("a", "x")}
    assert _pairs(match_property_path(kg, ("inv", "q"))) == {("x", "a")}


def test_alt_is_set_union(spark):
    kg = _kg(spark)
    assert _pairs(match_property_path(kg, ("alt", "q", "r"))) == {
        ("a", "x"),
        ("b", "x"),
    }


def test_seq_joins_on_midpoint(spark):
    kg = _kg(spark)
    # q then p: a -q-> x -p-> y
    assert _pairs(match_property_path(kg, ("seq", "q", "p"))) == {("a", "y")}


def test_plus_is_depth_bounded(spark):
    kg = _kg(spark)
    got3 = _pairs(match_property_path(kg, ("plus", "p"), max_depth=3))
    # depth 3 from the chain: 1-hop (5 edges incl x->y), 2-hop, 3-hop
    expect3 = {
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"),
        ("a", "c"), ("b", "d"), ("c", "e"),
        ("a", "d"), ("b", "e"),
    }
    assert got3 == expect3
    got4 = _pairs(match_property_path(kg, ("plus", "p"), max_depth=4))
    assert got4 == expect3 | {("a", "e")}


def test_set_semantics_ignores_duplicate_mentions(spark):
    kg = _kg(spark, CHAIN + CHAIN)  # every edge asserted twice
    assert _pairs(match_property_path(kg, ("seq", "q", "p"))) == {("a", "y")}


def test_unknown_op_raises(spark):
    with pytest.raises(ValueError):
        match_property_path(_kg(spark), ("star", "p"))


def test_align_entities_best_match_and_tiebreak(spark):
    # A's "ada" shares 2 facts with B's "ada l" and 2 with B's "ada x":
    # equal score -> lexicographically smaller entity_b wins.
    kg_a = _kg(
        spark,
        [
            ("ada", "wrote", "notes"),
            ("ada", "knew", "babbage"),
            ("ada", "born in", "london"),
        ],
    )
    kg_b = _kg(
        spark,
        [
            ("ada l", "wrote", "notes"),
            ("ada l", "knew", "babbage"),
            ("ada x", "wrote", "notes"),
            ("ada x", "knew", "babbage"),
        ],
    )
    out = {r["entity_a"]: r for r in align_entities(kg_a, kg_b).collect()}
    assert out["ada"]["entity_b"] == "ada l"  # tie -> min name
    assert out["ada"]["n_shared"] == 2
    # score = 2 shared / 3 outgoing contexts (ppm, integer division)
    assert out["ada"]["score_ppm"] == 2 * 1_000_000 // 3


def test_align_entities_incoming_context_counts(spark):
    # entities sharing only INCOMING facts still align
    kg_a = _kg(spark, [("x", "cites", "paper one")])
    kg_b = _kg(spark, [("x", "cites", "paper uno")])
    out = {r["entity_a"]: r for r in align_entities(kg_a, kg_b, min_score=1).collect()}
    # "paper one" and "paper uno" share the incoming (x, cites) fact
    assert out["paper one"]["entity_b"] == "paper uno"
    assert out["paper one"]["n_shared"] == 1


def test_validate_shapes_min_and_max(spark):
    from ai_knowledge_graph_spark.graph.kgops import validate_shapes

    kg = _kg(
        spark,
        [
            ("a", "works at", "acme"),     # target; has 0 "knows" -> min viol
            ("b", "works at", "acme"),     # target; has 2 "knows" -> max viol
            ("b", "knows", "a"),
            ("b", "knows", "c"),
            ("c", "knows", "a"),           # not a target: no row
            ("d", "works at", "x"),
            ("d", "knows", "a"),           # target; exactly 1 -> clean
            ("b", "knows", "a"),           # duplicate mention: must not count
        ],
    )
    shapes = [
        (1, "works at", "min_count", "knows", 1),
        (2, "works at", "max_count", "knows", 1),
    ]
    rows = {
        (r["shape_id"], r["entity"]): (r["check_kind"], r["have"], r["want"])
        for r in validate_shapes(kg, shapes).collect()
    }
    assert rows == {
        (1, "a"): ("min_count", 0, 1),
        (2, "b"): ("max_count", 2, 1),
    }


def test_validate_shapes_rejects_bad_kind(spark):
    from ai_knowledge_graph_spark.graph.kgops import validate_shapes

    with pytest.raises(ValueError):
        validate_shapes(_kg(spark), [(1, "p", "exactly", "q", 1)])
    with pytest.raises(ValueError):
        validate_shapes(_kg(spark), [])
