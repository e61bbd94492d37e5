"""Web-crawl ingest operators (webcrawl.py) + PageRank (centrality.py).

The oracle-parity side of these operators is covered by test_entry.py's
parametrized driver-contract check; here we pin the semantics the oracle
can't see: byte parity of the JVM html wrapper vs the Python fixture wrapper,
roundtrips on adversarial text, tie-breaking, hand-computed repetition
numbers, and PageRank vs an independent numpy power iteration.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_spark.functions.text import html_to_text, wrap_text_as_html
from ai_knowledge_graph_spark.graph.centrality import pagerank
from ai_knowledge_graph_spark.operators.webcrawl import (
    canonical_url_dedup,
    domain_stats,
    extract_html_text,
    html_roundtrip_check,
    latest_snapshot,
    normalize_url,
    repetition_stats,
    snapshot_diff,
    wrap_html_expr,
)

TRICKY_TEXTS = [
    "plain words only",
    "amp & lt < gt > quote \" apos ' mixed",
    "looks like <b>markup</b> & entities &amp; already",
    "unicode: café — naïve 漢字",
    "",
    "  leading and   trailing  ",
    "nested '&amp;lt;' double-escape trap",
]


def test_wrap_expr_byte_parity_with_python_wrapper(spark):
    """JVM wrap_html_expr must produce byte-identical html to the Python
    fixture wrapper for every adversarial text."""
    df = spark.createDataFrame([(t,) for t in TRICKY_TEXTS], "text string")
    got = {r["text"]: bytes(r["html"]) for r in
           df.select("text", wrap_html_expr("text").alias("html")).collect()}
    for t in TRICKY_TEXTS:
        assert got[t] == wrap_text_as_html(t), t


def test_html_roundtrip_on_tricky_texts(spark):
    df = spark.createDataFrame([(t,) for t in TRICKY_TEXTS], "text string")
    pages = df.select("text", wrap_html_expr("text").alias("html"))
    out = html_roundtrip_check(pages)
    rows = out.collect()
    assert all(r["roundtrip_ok"] for r in rows), [
        r["text"] for r in rows if not r["roundtrip_ok"]
    ]


def test_extract_matches_python_extractor(spark):
    """The pandas-UDF path equals single-node html_to_text on real payloads."""
    payloads = [wrap_text_as_html(t) for t in TRICKY_TEXTS]
    # also a page with script/style blocks and a null payload
    payloads.append(
        b"<html><head><style>p{color:red}</style></head>"
        b"<body><script>var x=1<2;</script><p>kept text</p></body></html>"
    )
    df = spark.createDataFrame([(p,) for p in payloads], "html binary")
    got = [r["t"] for r in
           extract_html_text(df, out_col="t").select("t").collect()]
    assert got == [html_to_text(p) for p in payloads]
    assert got[-1] == "kept text"


def test_latest_snapshot_picks_newest_and_breaks_ties(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [
        ("u1", base + dt.timedelta(minutes=1), 1, "old"),
        ("u1", base + dt.timedelta(minutes=9), 2, "new"),
        ("u1", base + dt.timedelta(minutes=5), 3, "mid"),
        ("u2", base, 4, "only"),
        # exact ts tie on u3: doc_id tie-break must pick 6
        ("u3", base, 5, "tie-a"),
        ("u3", base, 6, "tie-b"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, doc_id long, text string"
    )
    out = {r["url"]: r for r in
           latest_snapshot(df, tie_cols=("doc_id",)).collect()}
    assert out["u1"]["doc_id"] == 2 and out["u1"]["n_crawls"] == 3
    assert out["u2"]["doc_id"] == 4 and out["u2"]["n_crawls"] == 1
    assert out["u3"]["doc_id"] == 6 and out["u3"]["text"] == "tie-b"


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a"),      # bigrams: ab ba ab ba -> 4 total, 2 distinct
            (1, "x y z"),          # xy yz -> no repeats
            (2, "w w w w"),        # ww ww ww -> top = 1.0
            (3, ""),               # no grams -> zeros
            (4, "solo"),           # single word -> zeros
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[0]["n_grams"] == 4 and out[0]["distinct_grams"] == 2
    assert out[0]["dup_gram_frac"] == 0.5 and out[0]["top_gram_frac"] == 0.5
    assert out[1]["n_grams"] == 2 and out[1]["dup_gram_frac"] == 0.0
    assert out[1]["top_gram_frac"] == 0.5
    assert out[2]["n_grams"] == 3 and out[2]["distinct_grams"] == 1
    assert out[2]["top_gram_frac"] == 1.0
    for d in (3, 4):
        assert out[d]["n_grams"] == 0 and out[d]["dup_gram_frac"] == 0.0


def test_domain_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (0, "one two three four", "en", "a.com"),
            (1, "five six", "de", "a.com"),
            (2, "seven", "en", "b.com"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["source"]: r for r in domain_stats(df).collect()}
    assert out["a.com"]["n_docs"] == 2 and out["a.com"]["total_words"] == 6
    assert out["a.com"]["n_langs"] == 2
    assert out["b.com"]["n_docs"] == 1 and out["b.com"]["n_langs"] == 1


def _numpy_pagerank(edges, damping=0.85, iters=5):
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1.0 - damping) / n)
        dangling = pr[out == 0].sum()
        new += damping * dangling / n
        for s, d in edges:
            new[idx[d]] += damping * pr[idx[s]] / out[idx[s]]
        pr = new
    return dict(zip(nodes, pr))


def test_pagerank_matches_numpy_power_iteration(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),            # d has no in-edges
        ("c", "e"),            # e is dangling (no out-edges)
        ("a", "c"),            # parallel edge: counts twice
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["entity"]: r["pagerank"] for r in pagerank(df, iterations=5).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k
    # mass conservation: dangling redistribution keeps the total at 1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df).count() == 0


NORMALIZE_CASES = [
    # (raw, canonical)
    ("https://Example.ORG/Path", "https://example.org/Path"),
    ("HTTPS://EXAMPLE.org/p#frag", "https://example.org/p"),
    ("https://example.org:443/p", "https://example.org/p"),
    ("http://example.org:80/p", "http://example.org/p"),
    ("http://example.org:8080/p", "http://example.org:8080/p"),
    ("https://example.org", "https://example.org/"),
    ("https://example.org/p?b=2&a=1", "https://example.org/p?a=1&b=2"),
    (
        "https://example.org/p?utm_source=x&a=1&fbclid=z",
        "https://example.org/p?a=1",
    ),
    ("https://example.org/p?utm_campaign=only", "https://example.org/p"),
    ("https://example.org/p?a=1#frag", "https://example.org/p?a=1"),
    # no scheme://authority -> passthrough, untouched
    ("not a url at all", "not a url at all"),
    ("mailto:x@example.org", "mailto:x@example.org"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(r,) for r, _ in NORMALIZE_CASES], "url string")
    got = [
        r["c"]
        for r in df.select(normalize_url("url").alias("c")).collect()
    ]
    for (raw, want), have in zip(NORMALIZE_CASES, got):
        assert have == want, f"{raw!r}: {have!r} != {want!r}"


def test_canonical_url_dedup_collapses_variants(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [
        # three spellings of one identity; newest is the :443 variant
        ("https://A.org/p?b=2&a=1", base + dt.timedelta(minutes=1), 1),
        ("https://a.org/p?a=1&b=2&utm_source=t", base + dt.timedelta(minutes=2), 2),
        ("https://a.org:443/p?a=1&b=2", base + dt.timedelta(minutes=3), 3),
        # a distinct identity (different param value)
        ("https://a.org/p?a=1&b=3", base, 4),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, doc_id long"
    )
    out = {
        r["canonical_url"]: r
        for r in canonical_url_dedup(df, tie_cols=("doc_id",)).collect()
    }
    assert set(out) == {
        "https://a.org/p?a=1&b=2",
        "https://a.org/p?a=1&b=3",
    }
    winner = out["https://a.org/p?a=1&b=2"]
    assert winner["doc_id"] == 3 and winner["n_crawls"] == 3
    # surviving row keeps its RAW url alongside the canonical key
    assert winner["url"] == "https://a.org:443/p?a=1&b=2"
    assert out["https://a.org/p?a=1&b=3"]["n_crawls"] == 1


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "s1"), ("u2", "s2"), ("u3", "s3")],
        "url string, content_sha string",
    )
    new = spark.createDataFrame(
        [("u2", "s2"), ("u3", "s3x"), ("u4", "s4")],
        "url string, content_sha string",
    )
    got = {r["url"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        "u1": "removed",
        "u2": "unchanged",
        "u3": "changed",
        "u4": "added",
    }


def test_resolve_redirects_chains_and_cycle(spark):
    from pyspark.sql import Row

    from ai_knowledge_graph_spark.operators.webcrawl import resolve_redirects

    edges = spark.createDataFrame([
        Row(src="a", dst="b"), Row(src="b", dst="c"), Row(src="c", dst="d"),
        Row(src="e", dst="d"),
        Row(src="x", dst="y"), Row(src="y", dst="x"),  # 2-cycle
    ])
    out = {r.url: r for r in resolve_redirects(edges, max_hops=32).collect()}
    assert (out["a"].final_url, out["a"].hops, out["a"].resolved) == ("d", 3, True)
    assert (out["b"].final_url, out["b"].hops) == ("d", 2)
    assert (out["e"].final_url, out["e"].hops) == ("d", 1)
    assert (out["d"].final_url, out["d"].hops, out["d"].resolved) == ("d", 0, True)
    assert not out["x"].resolved and not out["y"].resolved


def test_resolve_redirects_long_chain_exact_hops(spark):
    from pyspark.sql import Row

    from ai_knowledge_graph_spark.operators.webcrawl import resolve_redirects

    n = 20  # chain u0 <- u1 <- ... <- u20
    edges = spark.createDataFrame(
        [Row(src=f"u{i}", dst=f"u{i-1}") for i in range(1, n + 1)]
    )
    out = {r.url: r for r in resolve_redirects(edges, max_hops=32).collect()}
    for i in range(n + 1):
        assert (out[f"u{i}"].final_url, out[f"u{i}"].hops, out[f"u{i}"].resolved) == (
            "u0", i, True), i


def test_parse_sitemaps_fields_and_defaults(spark):
    from pyspark.sql import Row

    from ai_knowledge_graph_spark.operators.webcrawl import parse_sitemaps

    xml = (
        "<urlset>"
        "<url><loc>https://a/1</loc><lastmod>2024-02-03</lastmod>"
        "<priority>0.9</priority></url>"
        "<url><loc> https://a/2 </loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # no loc -> dropped
        "</urlset>"
    )
    out = parse_sitemaps(
        spark.createDataFrame([Row(host="a", sitemap_xml=xml)])
    ).collect()
    got = {r.url: r for r in out}
    assert set(got) == {"https://a/1", "https://a/2"}
    assert got["https://a/1"].lastmod == "2024-02-03"
    assert got["https://a/1"].priority == 0.9
    assert got["https://a/2"].lastmod is None  # absent
    assert got["https://a/2"].priority == 0.5  # protocol default
