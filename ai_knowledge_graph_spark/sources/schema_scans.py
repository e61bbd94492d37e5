"""YAML/JSON schema scans → typed graph edges (SURVEY §2.1 S4).

Rebuilds the three small-dimension loaders of ICTGraphStore
(graph_store.py:152-285 load_concept_relationships, :287-339 load_ontology,
:341-388 load_concept_graph). These files are config-sized (KBs), so the
parse is driver-side — the resulting nodes/edges DataFrames are the
broadcast-joinable dimension tables of the query layer; the 100 TB side is
always the triples/edges fact table, never these.

Name normalization matches graph_store._normalize (:52-59): strip, lower,
spaces and hyphens → underscores.

Output schemas (align with graph.materialize):
  nodes(entity STRING, node_type STRING, definition STRING)
  edges(src STRING, dst STRING, relation STRING, source STRING,
        weight DOUBLE, detail STRING)
"""

from __future__ import annotations

import json
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:
    import yaml
except ImportError:  # pragma: no cover - yaml is present in this image
    yaml = None

NODES_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("node_type", T.StringType()),
        T.StructField("definition", T.StringType()),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("relation", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("detail", T.StringType()),
    ]
)


def _normalize(name: str) -> str:
    """graph_store._normalize (:52-59)."""
    if not isinstance(name, str):
        return ""
    return name.strip().lower().replace(" ", "_").replace("-", "_")


# graph_store._extract_concepts_from_text's hard-coded vocabulary (:646-658).
KNOWN_CONCEPTS = [
    "fvg", "fair_value_gap", "order_block", "ob", "liquidity",
    "displacement", "bos", "break_of_structure", "choch",
    "market_structure_shift", "mss", "ote", "optimal_trade_entry",
    "htf_bias", "htf", "ltf", "smt", "smt_divergence",
    "accumulation", "manipulation", "distribution",
    "killzone", "asian_range", "cbdr", "judas_swing",
    "swing_high", "swing_low", "equal_highs", "equal_lows",
    "buy_side_liquidity", "sell_side_liquidity", "bsl", "ssl",
    "premium", "discount", "equilibrium",
    "silver_bullet", "turtle_soup", "unicorn",
    "pd_array", "imbalance", "mitigation",
]


def _concepts_in_text(text: str, vocabulary: Iterable[str]) -> list[str]:
    """graph_store._extract_concepts_from_text (:643-664): match vocabulary
    names (underscore or space form) inside free text, vocabulary order
    preserved; fall back to the normalized 60-char text prefix when nothing
    matches (:664)."""
    low = text.lower()
    out: list[str] = []
    for name in vocabulary:
        if name in out:
            continue
        if name in low or name.replace("_", " ") in low:
            out.append(_normalize(name))
    return out if out else [_normalize(text[:60])]


def _to_dfs(
    spark: SparkSession,
    nodes: dict[str, tuple[str, str]],
    edges: list[tuple[str, str, str, str, float | None, str]],
) -> tuple[DataFrame, DataFrame]:
    nodes_df = spark.createDataFrame(
        [(k, t, d) for k, (t, d) in sorted(nodes.items())], NODES_SCHEMA
    )
    edges_df = spark.createDataFrame(edges, EDGES_SCHEMA)
    return nodes_df, edges_df


def load_concept_relationships(
    spark: SparkSession, path: str, vocabulary: Iterable[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """S4a (graph_store.py:152-285): causal chains → ``precedes`` edges;
    concept requirements → ``requires``/``enhances``/``invalidates``/
    ``targets``; model blueprints → ``requires`` (via text concept match) +
    ``active_during`` time windows; confluence weights → ``contributes_to``
    with weight; anti-patterns → ``violates``; killzones → ``best_for``.

    ``vocabulary`` overrides the free-text concept matcher's name universe
    (defaults to the reference's hard-coded KNOWN_CONCEPTS, :646-658).
    """
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required for load_concept_relationships")
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}

    nodes: dict[str, tuple[str, str]] = {}
    edges: list[tuple[str, str, str, str, float | None, str]] = []
    vocab = KNOWN_CONCEPTS if vocabulary is None else list(vocabulary)

    def node(name: str, node_type: str, definition: str = "") -> None:
        # networkx add_node overwrites attrs on re-add — last writer wins.
        nodes[name] = (node_type, definition)

    # Causal chains (:169-181): consecutive numeric steps → precedes.
    for chain_name, chain in (data.get("causal_chains") or {}).items():
        steps = sorted(
            ((chain or {}).get("steps") or {}).items(), key=lambda x: int(x[0])
        )
        for i in range(len(steps) - 1):
            curr = _normalize(
                steps[i][1].get("concept", steps[i][1].get("phase", f"step_{i}"))
            )
            nxt = _normalize(
                steps[i + 1][1].get(
                    "concept", steps[i + 1][1].get("phase", f"step_{i + 1}")
                )
            )
            node(curr, "concept")
            node(nxt, "concept")
            edges.append((curr, nxt, "precedes", "concept_rels", None, chain_name))

    # Concept requirements (:184-218).
    for concept, reqs in (data.get("concept_requirements") or {}).items():
        cnode = _normalize(concept)
        node(cnode, "concept")
        for req in (reqs or {}).get("requires") or []:
            rnode = _normalize(req["concept"])
            node(rnode, "concept")
            edges.append(
                (cnode, rnode, "requires", "concept_rels", None, req.get("why", ""))
            )
        for enh in (reqs or {}).get("enhanced_by") or []:
            enode = _normalize(enh["concept"])
            node(enode, "concept")
            edges.append(
                (
                    enode, cnode, "enhances", "concept_rels",
                    float(enh.get("bonus", 0)), enh.get("why", ""),
                )
            )
        for inv in (reqs or {}).get("invalidated_by") or []:
            cond = _normalize(inv.get("condition", inv.get("concept", "unknown")))
            node(cond, "condition")
            edges.append(
                (cond, cnode, "invalidates", "concept_rels", None, inv.get("why", ""))
            )
        for tgt in (reqs or {}).get("targets") or []:
            tnode = _normalize(tgt["concept"])
            node(tnode, "concept")
            edges.append(
                (cnode, tnode, "targets", "concept_rels", None, tgt.get("why", ""))
            )

    # Model blueprints (:221-244).
    for model_name, model in (data.get("models") or {}).items():
        mnode = _normalize(model_name)
        node(mnode, "model")
        for req_str in (model or {}).get("required") or []:
            for concept in _concepts_in_text(req_str, vocab):
                edges.append(
                    (mnode, concept, "requires", "concept_rels", None, req_str)
                )
        for tw in (model or {}).get("time_windows") or []:
            tw_node = _normalize(tw.get("name", f"{model_name}_window"))
            node(tw_node, "time_window")
            edges.append((mnode, tw_node, "active_during", "concept_rels", None, ""))

    # Confluence weights (:247-261).
    for tier, items in (data.get("confluence_weights") or {}).items():
        if tier == "thresholds" or not isinstance(items, dict):
            continue
        for factor, weight in items.items():
            fnode = _normalize(factor)
            node(fnode, "confluence_factor")
            node("confluence_scoring", "system")
            edges.append(
                (
                    fnode, "confluence_scoring", "contributes_to", "concept_rels",
                    float(weight), tier,
                )
            )

    # Anti-patterns (:264-275).
    for ap_name, ap in (data.get("anti_patterns") or {}).items():
        anode = _normalize(ap_name)
        node(anode, "anti_pattern", (ap or {}).get("description", ""))
        text = f"{(ap or {}).get('description', '')} {(ap or {}).get('fix', '')}"
        for concept in _concepts_in_text(text, vocab):
            edges.append((anode, concept, "violates", "concept_rels", None, ""))

    # Killzones (:278-288).
    for kz_name, kz in ((data.get("time_rules") or {}).get("killzones") or {}).items():
        kznode = _normalize(f"killzone_{kz_name}")
        node(kznode, "killzone", (kz or {}).get("behavior", ""))
        for setup in (kz or {}).get("best_setups") or []:
            edges.append(
                (kznode, _normalize(setup), "best_for", "concept_rels", None, "")
            )

    return _to_dfs(spark, nodes, edges)


def load_ontology(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S4b (graph_store.py:287-339): category → concept ``belongs_to``
    edges, with ``is_type_of`` for definition-bearing sub-items."""
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required for load_ontology")
    with open(path, "r") as f:
        data = yaml.safe_load(f) or {}

    nodes: dict[str, tuple[str, str]] = {}
    edges: list[tuple[str, str, str, str, float | None, str]] = []

    for category, items in data.items():
        if not isinstance(items, dict):
            continue
        cat_node = _normalize(category)
        nodes[cat_node] = ("category", "")
        for item_name, item_data in items.items():
            inode = _normalize(item_name)
            if isinstance(item_data, dict):
                definition = item_data.get(
                    "definition", item_data.get("description", "")
                )
                nodes[inode] = ("concept", definition)
                edges.append((inode, cat_node, "belongs_to", "ontology", None, ""))
                # Sub-items carrying their own definitions (:320-330).
                for sub_name, sub_data in item_data.items():
                    if isinstance(sub_data, dict) and any(
                        k in sub_data
                        for k in ("definition", "meaning", "description", "full_name")
                    ):
                        snode = _normalize(sub_name)
                        nodes[snode] = (
                            "concept",
                            sub_data.get("definition", sub_data.get("meaning", "")),
                        )
                        edges.append(
                            (snode, inode, "is_type_of", "ontology", None, "")
                        )
            elif isinstance(item_data, str):
                nodes[inode] = ("concept", item_data)
                edges.append((inode, cat_node, "belongs_to", "ontology", None, ""))

    return _to_dfs(spark, nodes, edges)


def load_concept_graph(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """S4c (graph_store.py:341-388): {nodes, edges|links} JSON; nodes may be
    a dict keyed by id or a list; edges accept source/from, target/to, and
    relation/relationship/label aliases (default ``related_to``)."""
    with open(path, "r") as f:
        data = json.load(f)

    nodes: dict[str, tuple[str, str]] = {}
    edges: list[tuple[str, str, str, str, float | None, str]] = []

    if isinstance(data, dict):
        nodes_data = data.get("nodes", [])
        if isinstance(nodes_data, dict):
            for key, nd in nodes_data.items():
                attrs = nd if isinstance(nd, dict) else {}
                nid = _normalize(attrs.get("id", key)) if attrs else _normalize(key)
                if nid:
                    nodes[nid] = (
                        attrs.get("category", attrs.get("type", "concept")),
                        attrs.get("description", ""),
                    )
        else:
            for nd in nodes_data:
                nid = _normalize(nd.get("id", nd.get("name", "")))
                if nid:
                    nodes[nid] = (nd.get("type", "concept"), "")

        for edge in data.get("edges", data.get("links", [])):
            src = _normalize(edge.get("source", edge.get("from", "")))
            tgt = _normalize(edge.get("target", edge.get("to", "")))
            rel = edge.get(
                "relation", edge.get("relationship", edge.get("label", "related_to"))
            )
            rel = rel.lower() if isinstance(rel, str) else "related_to"
            if src and tgt:
                edges.append(
                    (src, tgt, rel, "concept_graph", None, edge.get("description", ""))
                )

    return _to_dfs(spark, nodes, edges)


def union_graph_sources(
    parts: list[tuple[DataFrame, DataFrame]],
) -> tuple[DataFrame, DataFrame]:
    """load_all (graph_store.py:61-80): union every source into one graph.
    Node attrs: first writer wins per entity (the reference's repeated
    add_node calls keep existing attrs for dup adds of the same name)."""
    nodes = parts[0][0]
    edges = parts[0][1]
    for n, e in parts[1:]:
        nodes = nodes.unionByName(n)
        edges = edges.unionByName(e)
    dedup_nodes = (
        nodes.groupBy("entity")
        .agg(
            F.first("node_type", ignorenulls=True).alias("node_type"),
            F.first("definition", ignorenulls=True).alias("definition"),
        )
    )
    return dedup_nodes, edges
