"""incremental_entity_mapping: stability, adoption, new-group election.

The KG twin of the incremental ExactSubstr path: extend a persisted
(variant -> standard) mapping with a new triple batch in O(batch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.standardize import (
    build_entity_mapping,
    incremental_entity_mapping,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, "relates to", o, 0, "d0", i) for i, (s, o) in enumerate(rows)],
        "subject string, predicate string, object string, chunk int, url string, t_idx int",
    )


@pytest.fixture(scope="module")
def existing(spark):
    # corpus 1: "Apache Spark" group (variants differ by case) + "catalyst"
    rows = [
        ("Apache Spark", "catalyst"),
        ("apache spark", "catalyst"),
        ("Apache Spark", "tungsten"),
    ]
    return build_entity_mapping(
        _triples(spark, rows), tie_order="lexicographic"
    ).localCheckpoint(eager=True)


def test_existing_variants_never_churn(spark, existing):
    batch = _triples(spark, [("apache spark", "brand new thing")] * 5)
    out = incremental_entity_mapping(batch, existing)
    old = {r["variant"]: r["standard"] for r in existing.collect()}
    got = {
        r["variant"]: r["standard"]
        for r in out.filter(F.col("src") == "existing").collect()
    }
    assert got == old
    # the known batch variant produced no duplicate row
    assert (
        out.filter((F.col("variant") == "apache spark") & (F.col("src") != "existing")).count()
        == 0
    )


def test_new_variant_adopts_existing_group(spark, existing):
    # variants are lowercased by entity_counts, so an unseen variant must
    # differ in its lowered form while normalizing into the existing group:
    # "the apache spark" drops the stopword -> group "apache spark"
    batch = _triples(spark, [("The Apache Spark", "new gadget")])
    out = {
        (r["variant"], r["src"]): r["standard"]
        for r in incremental_entity_mapping(batch, existing).collect()
    }
    existing_std = {
        r["variant"]: r["standard"] for r in existing.collect()
    }["apache spark"]
    assert out[("the apache spark", "adopted")] == existing_std


def test_new_group_elects_first_pass_winner(spark, existing):
    # batch-only group: most frequent (lowered) variant wins (count desc,
    # len asc, lex); "the quantum widget" normalizes into the same group
    rows = [("the quantum widget", "x")] * 3 + [("quantum widget", "x")] * 5
    out = {
        (r["variant"], r["src"]): r["standard"]
        for r in incremental_entity_mapping(_triples(spark, rows), existing).collect()
    }
    assert out[("quantum widget", "new")] == "quantum widget"
    assert out[("the quantum widget", "new")] == "quantum widget"


def test_incremental_is_idempotent(spark, existing):
    batch = _triples(spark, [("APACHE SPARK", "new gadget"), ("fresh thing", "x")])
    once = incremental_entity_mapping(batch, existing).localCheckpoint(eager=True)
    twice = incremental_entity_mapping(batch, once.drop("src"))
    assert twice.filter(F.col("src") != "existing").count() == 0
    assert sorted(
        (r["variant"], r["standard"]) for r in twice.collect()
    ) == sorted((r["variant"], r["standard"]) for r in once.collect())
