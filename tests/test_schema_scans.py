"""S4 parity: schema_scans loaders vs the reference ICTGraphStore loaders
(graph_store.py:152-388) on synthetic fixture files."""

from __future__ import annotations

import json
import sys
import textwrap

import pytest

sys.path.insert(0, "/root/reference")

from ai_knowledge_graph_spark.sources import schema_scans  # noqa: E402

CONCEPT_RELS_YAML = textwrap.dedent(
    """
    causal_chains:
      breakout_chain:
        steps:
          "1": {concept: Liquidity Sweep}
          "2": {concept: Displacement}
          "3": {phase: Entry Phase}
      reversal_chain:
        steps:
          "10": {concept: equal-highs}
          "2": {concept: Judas Swing}

    concept_requirements:
      silver_bullet:
        requires:
          - {concept: displacement, why: "impulse leg needed"}
          - {concept: fair value gap}
        enhanced_by:
          - {concept: htf bias, bonus: 2, why: "alignment"}
        invalidated_by:
          - {condition: no displacement, why: "chop"}
        targets:
          - {concept: buy side liquidity}

    models:
      silver_bullet:
        required:
          - "Displacement through liquidity"
          - "A clean FVG after the sweep"
          - "totally novel requirement text"
        time_windows:
          - {name: ny_am, start: "10:00", end: "11:00", timezone: "EST"}
      unicorn:
        required:
          - "A clean FVG after the sweep"

    confluence_weights:
      primary:
        displacement: 3.0
        liquidity_sweep: 2.5
      secondary:
        smt_divergence: 1.0
      thresholds:
        go: 5.0

    anti_patterns:
      fomo_entry:
        description: "Chasing displacement without a pullback"
        why_fails: "late entry"
        fix: "wait for the fvg retrace"

    time_rules:
      killzones:
        london_open:
          time: "02:00-05:00"
          behavior: "manipulation"
          best_setups: [Judas Swing, turtle soup]
    """
)

ONTOLOGY_YAML = textwrap.dedent(
    """
    structures:
      bos:
        definition: "break of structure"
        bullish: true
        sub_kind:
          meaning: "a sub structure"
      choch: "change of character"
    liquidity_concepts:
      buy_side_liquidity:
        description: "resting buy stops"
    not_a_dict: 42
    """
)

CONCEPT_GRAPH_JSON = {
    "nodes": {
        "fvg": {"id": "Fair Value Gap", "category": "pd_array", "description": "gap"},
        "ob": {"type": "concept"},
    },
    "edges": [
        {"source": "Fair Value Gap", "target": "OB", "relation": "RELATES"},
        {"from": "ob", "to": "fvg", "label": "MITIGATES"},
        {"source": "", "target": "fvg"},
    ],
}


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("schemas")
    (d / "concept_relationships.yaml").write_text(CONCEPT_RELS_YAML)
    (d / "ict_ontology.yaml").write_text(ONTOLOGY_YAML)
    (d / "concept_graph.json").write_text(json.dumps(CONCEPT_GRAPH_JSON))
    return d


def _ref_store():
    from src.graph_rag.graph_store import ICTGraphStore

    return ICTGraphStore()


def _edge_multiset(G):
    return sorted((s, t, d.get("relation")) for s, t, d in G.edges(data=True))


def test_concept_relationships_parity(spark, fixture_files):
    from pathlib import Path

    store = _ref_store()
    store.load_concept_relationships(Path(fixture_files / "concept_relationships.yaml"))

    nodes_df, edges_df = schema_scans.load_concept_relationships(
        spark, str(fixture_files / "concept_relationships.yaml")
    )
    got = sorted(
        (r["src"], r["dst"], r["relation"]) for r in edges_df.collect()
    )
    assert got == _edge_multiset(store.G)

    # weights preserved on contributes_to edges
    w = {
        (r["src"], r["weight"])
        for r in edges_df.filter("relation = 'contributes_to'").collect()
    }
    assert w == {("displacement", 3.0), ("liquidity_sweep", 2.5), ("smt_divergence", 1.0)}

    # node types match for nodes both sides materialize explicitly
    ref_types = {n: d.get("type") for n, d in store.G.nodes(data=True) if d.get("type")}
    got_types = {r["entity"]: r["node_type"] for r in nodes_df.collect()}
    for entity, node_type in got_types.items():
        assert ref_types.get(entity) == node_type, entity


def test_ontology_parity(spark, fixture_files):
    from pathlib import Path

    store = _ref_store()
    store.load_ontology(Path(fixture_files / "ict_ontology.yaml"))

    nodes_df, edges_df = schema_scans.load_ontology(
        spark, str(fixture_files / "ict_ontology.yaml")
    )
    got = sorted((r["src"], r["dst"], r["relation"]) for r in edges_df.collect())
    assert got == _edge_multiset(store.G)

    defs = {r["entity"]: r["definition"] for r in nodes_df.collect()}
    assert defs["bos"] == "break of structure"
    assert defs["choch"] == "change of character"
    assert defs["sub_kind"] == "a sub structure"  # meaning fallback
    assert defs["buy_side_liquidity"] == "resting buy stops"


def test_concept_graph_parity(spark, fixture_files):
    from pathlib import Path

    store = _ref_store()
    store.load_concept_graph(Path(fixture_files / "concept_graph.json"))

    nodes_df, edges_df = schema_scans.load_concept_graph(
        spark, str(fixture_files / "concept_graph.json")
    )
    got = sorted((r["src"], r["dst"], r["relation"]) for r in edges_df.collect())
    assert got == _edge_multiset(store.G)
    assert ("fair_value_gap", "ob", "relates") in got
    assert ("ob", "fvg", "mitigates") in got
    assert len(got) == 2  # empty-src edge dropped both sides


def test_union_graph_sources(spark, fixture_files):
    parts = [
        schema_scans.load_concept_relationships(
            spark, str(fixture_files / "concept_relationships.yaml")
        ),
        schema_scans.load_ontology(spark, str(fixture_files / "ict_ontology.yaml")),
        schema_scans.load_concept_graph(
            spark, str(fixture_files / "concept_graph.json")
        ),
    ]
    nodes, edges = schema_scans.union_graph_sources(parts)
    assert nodes.groupBy("entity").count().filter("count > 1").count() == 0
    assert edges.count() == sum(p[1].count() for p in parts)
