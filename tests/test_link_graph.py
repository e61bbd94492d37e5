"""extract_links / resolve_url / host_graph: unit branches + composition.

The reference has no crawl layer (main.py:283-284 reads local .txt files);
link extraction is beyond-reference web-graph ingest surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.webcrawl import (
    extract_links,
    host_graph,
    resolve_url,
)

BASE = "https://www.example.com/a/b/page.html?x=1#top"

RESOLVE_CASES = [
    # absolute passes through (fragment dropped)
    ("https://other.org/p?q=2#frag", "https://other.org/p?q=2"),
    # protocol-relative inherits the base scheme
    ("//cdn.example.com/lib.js", "https://cdn.example.com/lib.js"),
    # root-relative replaces the whole path
    ("/root/doc.html", "https://www.example.com/root/doc.html"),
    # path-relative joins onto the base directory
    ("sibling.html", "https://www.example.com/a/b/sibling.html"),
    # single and double dot segments
    ("./same.html", "https://www.example.com/a/b/same.html"),
    ("../up.html", "https://www.example.com/a/up.html"),
    ("../../top.html", "https://www.example.com/top.html"),
    # fragment-only resolves to the base sans fragment
    ("#section", "https://www.example.com/a/b/page.html?x=1"),
    # non-hierarchical schemes resolve to NULL
    ("mailto:user@example.com", None),
    ("javascript:void(0)", None),
]


def test_resolve_url_branches(spark):
    df = spark.createDataFrame(
        [(BASE, h) for h, _ in RESOLVE_CASES], "base string, href string"
    )
    got = {
        r["href"]: r["resolved"]
        for r in df.select(
            "href", resolve_url("base", "href").alias("resolved")
        ).collect()
    }
    for href, want in RESOLVE_CASES:
        assert got[href] == want, f"{href}: {got[href]!r} != {want!r}"


HTML = (
    "<html><body>"
    '<a href="https://b.org/one.html">one</a>'
    "<p>noise <a>no href</a></p>"
    '<a class="x" href="/two.html" rel="nofollow">two</a>'
    '<a href="../three.html">three</a>'
    '<a href="mailto:x@y.z">mail</a>'
    '<a href="/self/p.html">self</a>'
    "</body></html>"
)


@pytest.fixture(scope="module")
def links(spark):
    pages = spark.createDataFrame(
        [("https://a.com/self/p.html", bytearray(HTML.encode()))],
        "url string, html binary",
    )
    return extract_links(pages)


def test_extract_links_rows_and_order(links):
    rows = sorted(links.collect(), key=lambda r: r["pos"])
    assert [r["anchor_text"] for r in rows] == ["one", "two", "three", "mail", "self"]
    assert [r["dst_url"] for r in rows] == [
        "https://b.org/one.html",
        "https://a.com/two.html",
        "https://a.com/three.html",
        None,
        "https://a.com/self/p.html",
    ]


def test_extract_links_drop_self(spark):
    pages = spark.createDataFrame(
        [("https://a.com/self/p.html", bytearray(HTML.encode()))],
        "url string, html binary",
    )
    kept = extract_links(pages, drop_self=True)
    texts = {r["anchor_text"] for r in kept.collect()}
    assert "self" not in texts
    assert "mail" in texts  # NULL dst is kept for the caller to inspect


def test_host_graph_counts(links):
    hg = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_graph(links).collect()
    }
    assert hg == {("a.com", "b.org"): 1, ("a.com", "a.com"): 3}


def test_host_graph_feeds_pagerank(spark, links):
    # composition: real extracted edges drive the iterative graph ops
    from ai_knowledge_graph_spark.graph.centrality import pagerank

    edges = host_graph(links).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    pr = pagerank(edges, iterations=3)
    scores = {r[0]: r[1] for r in pr.collect()}
    assert set(scores) == {"a.com", "b.org"}
    assert scores["b.org"] > 0


def test_extract_links_is_jvm_only(links):
    # scan-shaped: no Python workers, no shuffle in the link-extraction plan
    plan = links._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_anchor_entity_mentions(spark):
    from ai_knowledge_graph_spark.operators.webcrawl import anchor_entity_mentions

    links = spark.createDataFrame(
        [
            ("u1", 0, "/a", "  Spark Engine ", "https://a.com/x"),
            ("u1", 1, "/b", "spark engine", "https://a.com/x"),
            ("u1", 2, "/c", "unknown thing", "https://a.com/y"),
            ("u2", 0, "mailto:z", "spark engine", None),
            ("u2", 1, "/d", "catalyst", "https://b.org/z"),
        ],
        "url string, pos int, href_raw string, anchor_text string, dst_url string",
    )
    mapping = spark.createDataFrame(
        [("spark engine", "Spark Engine"), ("catalyst", "Catalyst")],
        "variant string, standard string",
    )
    out = anchor_entity_mentions(links, mapping)
    got = {(r["entity"], r["dst_url"]): r["n_mentions"] for r in out.collect()}
    # case/whitespace-normalized variants merge; NULL dst and unmatched drop
    assert got == {
        ("Spark Engine", "https://a.com/x"): 2,
        ("Catalyst", "https://b.org/z"): 1,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_frontier_schedule_bounded_rank_matches_plain_window(spark):
    """The lossless two-phase budget rank == the plain-window reference,
    including on a giant hub host; rounds respect k_per_host."""
    import hashlib

    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.operators.webcrawl import frontier_schedule

    rows = [(f"https://hub.example.com/p{i}", i % 13) for i in range(2000)]
    rows += [(f"https://tiny{j}.example.com/p{j}", j) for j in range(20)]
    urls = spark.createDataFrame(rows, "url string, priority long")

    out = frontier_schedule(
        urls, k_per_host=4, max_per_host=10, priority_col="priority", n_buckets=8
    ).collect()

    # plain-window reference in python
    by_host: dict = {}
    for u, p in rows:
        host = u.split("//")[1].split("/")[0]
        by_host.setdefault(host, []).append((-p, u))
    exp = {}
    for host, lst in by_host.items():
        for rank, (_, u) in enumerate(sorted(lst), start=1):
            if rank <= 10:
                exp[u] = (host, rank, (rank - 1) // 4)
    got = {r["url"]: (r["host"], r["fetch_rank"], r["fetch_round"]) for r in out}
    assert got == exp
    # hub host budget enforced: exactly 10 survivors, 3 rounds (4/4/2)
    hub = [v for v in got.values() if v[0] == "hub.example.com"]
    assert len(hub) == 10
    assert sorted(v[2] for v in hub) == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]


def test_frontier_schedule_unbudgeted(spark):
    from ai_knowledge_graph_spark.operators.webcrawl import frontier_schedule

    urls = spark.createDataFrame(
        [(f"https://h.example.com/p{i}",) for i in range(7)], "url string"
    )
    out = frontier_schedule(urls, k_per_host=3).collect()
    assert sorted(r["fetch_rank"] for r in out) == list(range(1, 8))
    assert sorted(r["fetch_round"] for r in out) == [0, 0, 0, 1, 1, 1, 2]
