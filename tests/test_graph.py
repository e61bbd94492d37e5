"""Graph layer: materialization + queries vs small hand-checked oracles."""

from __future__ import annotations

from collections import deque

import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.graph.materialize import graph_stats, materialize_graph
from ai_knowledge_graph_spark.graph.queries import (
    k_hop_neighborhood,
    neighbors,
    path_with_relations,
    relation_histogram,
    search,
    shortest_path,
)

TRIPLES = [
    # a -> b -> c -> d chain + side edges + separate island x -> y
    ("a", "r1", "b", False),
    ("b", "r2", "c", False),
    ("c", "r3", "d", False),
    ("a", "r4", "c", True),
    ("d", "r5", "a", False),
    ("x", "r1", "y", False),
    ("b", "r9", "c", True),  # multi-edge on (b, c)
]


@pytest.fixture(scope="module")
def graph(spark):
    df = spark.createDataFrame(
        [
            {"subject": s, "predicate": p, "object": o, "inferred": i,
             "url": None, "chunk": 1}
            for s, p, o, i in TRIPLES
        ],
        schema="subject string, predicate string, object string, inferred boolean, url string, chunk int",
    )
    nodes, edges = materialize_graph(df)
    return nodes.localCheckpoint(eager=True), edges.localCheckpoint(eager=True)


def test_materialize_nodes_degree_components(graph):
    nodes, edges = graph
    rows = {r["entity"]: r for r in nodes.collect()}
    assert set(rows) == {"a", "b", "c", "d", "x", "y"}
    assert rows["a"]["degree"] == 3  # a->b, a->c, d->a
    assert rows["c"]["degree"] == 4  # b->c (x2), a->c, c->d
    comp = {e: rows[e]["component_id"] for e in rows}
    assert comp["a"] == comp["b"] == comp["c"] == comp["d"]
    assert comp["x"] == comp["y"] != comp["a"]
    # multi-edge preserved
    assert edges.filter((F.col("src") == "b") & (F.col("dst") == "c")).count() == 2


def test_neighbors_directions_and_relation_filter(graph):
    _, edges = graph
    out = {(r["node"], r["direction"]) for r in neighbors(edges, "a").collect()}
    assert out == {("b", "out"), ("c", "out"), ("d", "in")}
    only_r1 = neighbors(edges, "a", relation="r1").collect()
    assert [(r["node"], r["direction"]) for r in only_r1] == [("b", "out")]


def test_k_hop(graph):
    _, edges = graph
    got = {r["entity"]: r["hop"] for r in k_hop_neighborhood(edges, "a", 2).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 1, }  # d via d->a undirected hop 1


def test_shortest_path_directed_and_fallback(graph):
    _, edges = graph
    assert shortest_path(edges, "a", "d") == ["a", "c", "d"]
    # y -> x has no directed path; undirected fallback finds it
    assert shortest_path(edges, "y", "x") == ["y", "x"]
    assert shortest_path(edges, "a", "y") == []


def test_path_with_relations_marks_reversed(graph):
    _, edges = graph
    steps = path_with_relations(edges, "y", "x").collect()
    assert len(steps) == 1
    assert steps[0]["reversed"] is True
    assert steps[0]["relation"] == "r1"
    fwd = path_with_relations(edges, "a", "d").collect()
    assert [(s["from"], s["to"], s["relation"], s["reversed"]) for s in fwd] == [
        ("a", "c", "r4", False),
        ("c", "d", "r3", False),
    ]


def test_search_scoring(spark, graph):
    nodes, _ = graph
    res = search(nodes, "a").collect()
    assert res[0]["entity"] == "a" and res[0]["score"] == 60
    res2 = search(nodes, "z").collect()
    assert res2 == []


def test_relation_histogram_and_stats(graph):
    nodes, edges = graph
    hist = {r["relation"]: r["cnt"] for r in relation_histogram(edges).collect()}
    assert hist["r1"] == 2 and hist["r9"] == 1
    stats = graph_stats(nodes, edges).collect()[0]
    assert stats["nodes"] == 6
    assert stats["edges"] == 7
    assert stats["inferred_edges"] == 2
    assert stats["connected_components"] == 2


def _bfs_oracle(adj, src, dst):
    q, seen = deque([[src]]), {src}
    while q:
        path = q.popleft()
        if path[-1] == dst:
            return path
        for n in sorted(adj.get(path[-1], ())):
            if n not in seen:
                seen.add(n)
                q.append(path + [n])
    return []


def test_shortest_path_matches_bfs_oracle_on_random_graph(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    edges_list = [
        (f"n{rng.randint(30)}", "r", f"n{rng.randint(30)}") for _ in range(60)
    ]
    df = spark.createDataFrame(
        [
            {"subject": s, "predicate": p, "object": o, "inferred": False,
             "url": None, "chunk": 1}
            for s, p, o in edges_list
        ],
        schema="subject string, predicate string, object string, inferred boolean, url string, chunk int",
    )
    _, edges = materialize_graph(df)
    edges = edges.localCheckpoint(eager=True)
    adj: dict[str, set] = {}
    for s, _, o in edges_list:
        adj.setdefault(s, set()).add(o)
    for src, dst in [("n0", "n5"), ("n3", "n17"), ("n9", "n2")]:
        expect = _bfs_oracle(adj, src, dst)
        got = shortest_path(edges, src, dst, max_hops=12)
        if expect:
            # same length (both shortest); engine picks lexicographic tie
            assert len(got) == len(expect), (src, dst, got, expect)
        else:
            # directed unreachable; engine may still find an undirected path
            und: dict[str, set] = {}
            for s, _, o in edges_list:
                und.setdefault(s, set()).add(o)
                und.setdefault(o, set()).add(s)
            expect_und = _bfs_oracle(und, src, dst)
            assert (len(got) == len(expect_und)) or (got == [] and expect_und == [])


def test_models_for_pattern(spark):
    from ai_knowledge_graph_spark.graph.queries import models_for_pattern

    nodes = spark.createDataFrame(
        [("silver_bullet", "model"), ("fvg", "concept"), ("unicorn", "model")],
        "entity string, node_type string",
    )
    edges = spark.createDataFrame(
        [
            ("silver_bullet", "fvg", "requires"),
            ("fvg", "unicorn", "enables"),
            ("fvg", "other", "relates"),
        ],
        "src string, dst string, relation string",
    )
    got = {(r["model"], r["relation"]) for r in models_for_pattern(edges, nodes, "fvg").collect()}
    assert got == {("silver_bullet", "requires"), ("unicorn", "enables")}


def test_write_graph_tables_bucketed(spark, tmp_path):
    from ai_knowledge_graph_spark.graph.materialize import (
        iceberg_available,
        materialize_graph,
        write_graph_tables,
    )

    triples = spark.createDataFrame(
        [("a", "uses", "b", "u1", 1, False), ("b", "uses", "c", "u1", 1, True)],
        "subject string, predicate string, object string, url string, chunk int, inferred boolean",
    )
    nodes, edges = materialize_graph(triples)
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_nodes", "t_edges"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    fmt = write_graph_tables(
        nodes, edges, "t_nodes", "t_edges", buckets=4, table_format="parquet"
    )
    assert fmt == "parquet"
    assert spark.table("t_nodes").count() == 3
    assert spark.table("t_edges").count() == 2
    ddl = spark.sql("SHOW CREATE TABLE t_nodes").collect()[0][0]
    assert "CLUSTERED BY" in ddl and "canonical_id" in ddl  # bucket spec kept
    # 'auto' resolves to parquet exactly when no Iceberg catalog is present
    # (this image ships no jar; on a cluster the iceberg test below runs)
    if not iceberg_available(spark):
        fmt_auto = write_graph_tables(nodes, edges, "t_nodes", "t_edges", buckets=4)
        assert fmt_auto == "parquet"


def test_write_graph_tables_iceberg_gated(spark):
    """Validates the writeTo(...).partitionedBy(bucket(N, col)) Iceberg
    branch (the north_rule's table layout). Auto-skips in this sandbox (no
    iceberg-spark-runtime jar); the first suite run on a real cluster with
    an Iceberg catalog configured (spark.sql.catalog.<name> set and e.g.
    spark.sql.defaultCatalog pointing at it) exercises it for free."""
    from ai_knowledge_graph_spark.graph.materialize import (
        iceberg_available,
        materialize_graph,
        write_graph_tables,
    )

    if not iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar/catalog in this environment")

    triples = spark.createDataFrame(
        [("a", "uses", "b", "u1", 1, False), ("b", "uses", "c", "u1", 1, True)],
        "subject string, predicate string, object string, url string, chunk int, inferred boolean",
    )
    nodes, edges = materialize_graph(triples)
    spark.sql("DROP TABLE IF EXISTS t_ice_nodes")
    spark.sql("DROP TABLE IF EXISTS t_ice_edges")
    fmt = write_graph_tables(
        nodes, edges, "t_ice_nodes", "t_ice_edges", buckets=4, table_format="iceberg"
    )
    assert fmt == "iceberg"
    assert spark.table("t_ice_nodes").count() == 3
    assert spark.table("t_ice_edges").count() == 2
    parts = spark.sql("SELECT partition FROM t_ice_nodes.files").collect()
    assert len(parts) >= 1  # hidden bucket partitioning materialized


def test_related_concepts_parity_vs_reference(spark):
    import sys

    sys.path.insert(0, "/root/reference")
    from src.graph_rag.graph_store import ICTGraphStore

    from ai_knowledge_graph_spark.graph.queries import related_concepts

    edge_rows = [
        ("fvg", "displacement", "requires"),
        ("liquidity", "fvg", "enhances"),
        ("displacement", "entry", "precedes"),
        ("fvg", "entry", "targets"),
        ("other", "unrelated", "relates"),
    ]
    store = ICTGraphStore()
    for s, t, r in edge_rows:
        store.G.add_edge(s, t, relation=r)
    ref = store.get_related_concepts("fvg", max_hops=2)
    ref_pairs = {(k, n) for k, nodes in ref.items() for n in nodes}

    edges = spark.createDataFrame(edge_rows, "src string, dst string, relation string")
    got = {
        (r["relation_path"], r["node"])
        for r in related_concepts(edges, "fvg", max_hops=2).collect()
    }
    assert got == ref_pairs


def test_concept_definition_and_nodes_by_type(spark):
    from ai_knowledge_graph_spark.graph.queries import concept_definition, nodes_by_type

    nodes = spark.createDataFrame(
        [("fvg", "concept", "a gap"), ("sb", "model", None)],
        "entity string, node_type string, definition string",
    )
    assert concept_definition(nodes, "fvg").collect()[0]["definition"] == "a gap"
    assert [r["entity"] for r in nodes_by_type(nodes, "model").collect()] == ["sb"]


def test_graph_expand_caps_and_orientation(spark):
    from ai_knowledge_graph_spark.graph.retrieve import format_context, graph_expand

    edges = spark.createDataFrame(
        [
            ("fvg", "requires", "displacement"),
            ("liquidity", "enhances", "fvg"),
            ("fvg", "targets", "entry"),
            ("noise", "relates", "stuff"),
        ],
        "src string, relation string, dst string",
    )
    nodes = spark.createDataFrame(
        [("fvg", "a price gap"), ("displacement", None)],
        "entity string, definition string",
    )
    concepts = spark.createDataFrame(
        [("fvg", 0), ("displacement", 1)], "concept string, priority int"
    )
    got = graph_expand(edges, nodes, concepts, graph_top_k=5, max_total=50)
    rows = [(r["subject"], r["predicate"], r["object"]) for r in got.orderBy("rank").collect()]
    # in-edge keeps original orientation (liquidity -> fvg); defs appended per concept
    assert ("liquidity", "enhances", "fvg") in rows
    assert ("fvg", "defined_as", "a price gap") in rows
    assert ("noise", "relates", "stuff") not in rows
    # fvg (priority 0) neighbors come before displacement's
    assert rows[0][0] == "fvg" or rows[0][2] == "fvg"

    # hard cap
    capped = graph_expand(edges, nodes, concepts, graph_top_k=5, max_total=2)
    assert capped.count() == 2

    ctx = format_context(got, chunks=[{"source": "doc1", "text": "hello"}])
    assert "## Graph-Derived Relationships" in ctx
    assert "liquidity enhances fvg" in ctx and "[Source: doc1]" in ctx

    tiny = format_context(got, max_context_chars=40)
    assert tiny.endswith("[context truncated]")


def test_retrieve_end_to_end_hybrid(spark):
    """Full hybrid retrieve (graph_retriever.retrieve :219-326): vector
    search -> concept extraction -> graph expansion -> combined context."""
    from ai_knowledge_graph_spark.graph.retrieve import retrieve

    # 2-d embeddings with unambiguous cosine ordering vs query [1, 0]
    chunks = spark.createDataFrame(
        [
            (0, "doc_a", "the fvg drives displacement", [1.0, 0.1]),
            (1, "doc_b", "liquidity pools matter", [0.9, 0.4]),
            (2, "doc_c", "unrelated cooking recipe", [-1.0, 0.2]),
        ],
        "chunk_id long, source string, text string, embedding array<double>",
    )
    edges = spark.createDataFrame(
        [
            ("fvg", "requires", "displacement"),
            ("liquidity", "enhances", "fvg"),
            ("recipe", "needs", "salt"),
        ],
        "src string, relation string, dst string",
    )
    nodes = spark.createDataFrame(
        [("fvg", "a price gap"), ("displacement", None), ("liquidity", None),
         ("recipe", None), ("salt", None)],
        "entity string, definition string",
    )
    out = retrieve(
        "what does the fvg require?",
        [1.0, 0.0],
        chunks,
        edges,
        nodes,
        vector_top_k=2,
    )
    # top-2 chunks by cosine: doc_a then doc_b; the recipe chunk is excluded
    assert [c["source"] for c in out["chunks"]] == ["doc_a", "doc_b"]
    assert out["chunks"][0]["score"] >= out["chunks"][1]["score"]
    # query concept fvg found; chunk concepts displacement/liquidity found;
    # 'recipe'/'salt' never retrieved so never expanded
    assert "fvg" in out["graph_entities"]
    assert "recipe" not in out["graph_entities"]
    spo = {
        (r["subject"], r["predicate"], r["object"])
        for r in out["graph_triples"].collect()
    }
    assert ("fvg", "requires", "displacement") in spo
    assert ("liquidity", "enhances", "fvg") in spo
    assert ("recipe", "needs", "salt") not in spo
    assert ("fvg", "defined_as", "a price gap") in spo
    # query concepts (priority 0) expand before chunk-only concepts
    first = out["graph_triples"].orderBy("rank").first()
    assert first["concept"] == "fvg"
    assert "## Retrieved Knowledge Base Content" in out["combined_context"]
    assert "[Source: doc_a]" in out["combined_context"]
    assert "fvg requires displacement" in out["graph_context"]


def test_retrieve_ann_modes_and_bounded_entities(spark):
    """Round-2 verdict fixes: (a) ann='srp' is selectable and returns the
    exact-mode top-k on a fixture where every chunk is near the query (all
    land in the query's SRP bucket); (b) graph_entities is capped at
    max_expand — never an unbounded driver collect."""
    from ai_knowledge_graph_spark.graph.retrieve import retrieve, vector_search_chunks

    chunks = spark.createDataFrame(
        [
            (i, f"doc_{i}", f"alpha{i} beta{i} text", [1.0, 0.01 * i, 0.0])
            for i in range(6)
        ],
        "chunk_id long, source string, text string, embedding array<double>",
    )
    q = [1.0, 0.05, 0.0]
    exact = [
        (r["chunk_id"], r["rk"])
        for r in vector_search_chunks(chunks, q, k=3).orderBy("rk").collect()
    ]
    srp = [
        (r["chunk_id"], r["rk"])
        for r in vector_search_chunks(chunks, q, k=3, ann="srp", tables=4)
        .orderBy("rk")
        .collect()
    ]
    assert srp == exact

    with pytest.raises(ValueError, match="ann must be one of"):
        vector_search_chunks(chunks, q, k=3, ann="bogus")

    # Node vocabulary dense in the chunk text -> many concepts extracted;
    # the returned entity set must still be <= max_expand.
    nodes = spark.createDataFrame(
        [(f"alpha{i}", None) for i in range(6)]
        + [(f"beta{i}", None) for i in range(6)],
        "entity string, definition string",
    )
    edges = spark.createDataFrame(
        [(f"alpha{i}", "rel", f"beta{i}") for i in range(6)],
        "src string, relation string, dst string",
    )
    out = retrieve("alpha0 query", q, chunks, edges, nodes, max_expand=4)
    assert len(out["graph_entities"]) <= 4
    assert "alpha0" in out["graph_entities"]  # query concept (priority 0) kept


def test_materialize_128bit_ids_and_bucketed_write(spark, tmp_path):
    """id_bits=128 threads the struct ids through nodes/edges and the
    bucketed write flattens the high half into a primitive bucket key."""
    from ai_knowledge_graph_spark.graph.materialize import (
        materialize_graph,
        write_graph_tables,
    )

    triples = spark.createDataFrame(
        [("a", "uses", "b", False), ("b", "uses", "c", False)],
        "subject string, predicate string, object string, inferred boolean",
    )
    nodes, edges = materialize_graph(triples, id_bits=128)
    assert nodes.schema["canonical_id"].dataType.typeName() == "struct"
    assert edges.schema["src_id"].dataType.typeName() == "struct"
    # component ids are structs too and consistent per component
    comp_ids = {tuple(r["component_id"]) for r in nodes.collect()}
    assert len(comp_ids) == 1
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("kg_nodes128", "kg_edges128"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    fmt = write_graph_tables(
        nodes, edges, nodes_table="kg_nodes128", edges_table="kg_edges128"
    )
    assert fmt == "parquet"
    ddl = spark.sql("SHOW CREATE TABLE kg_nodes128").collect()[0][0]
    assert "canonical_id_h" in ddl and "CLUSTERED BY" in ddl
    assert spark.table("kg_nodes128").count() == 3
