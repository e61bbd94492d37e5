"""P6 prompt assembly as aggregation expressions."""

from __future__ import annotations

from ai_knowledge_graph_spark.functions import prompts


def test_entity_resolution_prompt(spark):
    triples = spark.createDataFrame(
        [("Apple", "is", "fruit"), ("apple", "grows on", "tree"), ("Tree", "is", "plant")],
        "subject string, predicate string, object string",
    )
    row = prompts.entity_resolution_prompt(triples, cap=3).collect()[0]
    # raw-case counts like the reference: all six raw-case entities appear
    # once; top-3 = the lexicographically-first ties (uppercase sorts first).
    assert row["n_entities"] == 3
    body = row["user_prompt"]
    # sorted, newline-joined raw-case entity list ("\n".join(sorted(...)))
    assert "Apple\nTree\napple" in body
    assert body.startswith("Below is a list")


def test_community_inference_prompts(spark):
    reps = spark.createDataFrame(
        [(1, 1, "b"), (1, 1, "a"), (1, 2, "x"), (2, 1, "m"), (2, 2, "n")],
        "pair_id long, side int, entity string",
    )
    ctx = spark.createDataFrame(
        [(1, "a", "uses", "x")], "pair_id long, subject string, predicate string, object string"
    )
    out = {r["pair_id"]: r["user_prompt"] for r in
           prompts.community_inference_prompts(reps, ctx).collect()}
    assert "Community 1 entities: a, b" in out[1]  # sorted, comma-joined
    assert "a uses x" in out[1]
    assert "Community 1 entities: m" in out[2]  # no context -> empty section
    assert len(out) == 2


def test_within_community_prompts(spark):
    pairs = spark.createDataFrame(
        [(7, "a", "b"), (7, "c", "d")], "component_id long, a string, b string"
    )
    ctx = spark.createDataFrame(
        [(7, "a", "near", "c")],
        "component_id long, subject string, predicate string, object string",
    )
    row = prompts.within_community_prompts(pairs, ctx).collect()[0]
    assert "a and b\nc and d" in row["user_prompt"]
    assert "a near c" in row["user_prompt"]
