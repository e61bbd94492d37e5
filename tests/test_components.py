"""Connected components vs a union-find oracle."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.components import (
    components_for_triples,
    connected_components,
)
from ai_knowledge_graph_spark.operators.standardize import standardize_triples
from ai_knowledge_graph_spark.oracle.refimpl import connected_component_sets


def _partition_from_df(df):
    groups = {}
    for r in df.collect():
        groups.setdefault(r["component_id"], set()).add(r["entity"])
    return {frozenset(g) for g in groups.values()}


def test_components_match_union_find(spark, std_triples):
    std = std_triples
    engine = _partition_from_df(components_for_triples(std))
    rows = [r.asDict() for r in std.collect()]
    oracle = {frozenset(g) for g in connected_component_sets(rows)}
    assert engine == oracle


def test_components_chain_and_islands(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("p", "q"), ("q", "p")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    comps = _partition_from_df(
        connected_components(df).withColumnRenamed("node", "node_id")
    )
    assert comps == {
        frozenset({"a", "b", "c", "d"}), frozenset({"x", "y"}), frozenset({"p", "q"})
    }


def test_components_long_path_converges(spark):
    # 200-node chain: pointer jumping must converge well under the iteration cap
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(200)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, max_iterations=30)
    assert out.select("component_id").distinct().count() == 1
