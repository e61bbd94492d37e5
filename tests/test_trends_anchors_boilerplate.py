"""Tests for entity_trends, anchor_corpus, host_boilerplate."""

from __future__ import annotations

from ai_knowledge_graph_spark.graph.kgops import entity_trends
from ai_knowledge_graph_spark.operators.curation import host_boilerplate
from ai_knowledge_graph_spark.operators.webcrawl import anchor_corpus


def _spo(spark, rows):
    return spark.createDataFrame(rows, ["subject", "predicate", "object"])


def test_entity_trends_counts_and_burst(spark):
    s0 = _spo(spark, [("a", "p", "b"), ("a", "p", "c")])     # a:2 b:1 c:1
    s1 = _spo(spark, [("a", "p", "b")])                        # a:1 b:1
    s2 = _spo(spark, [("d", "p", "a")] * 6)                    # d:6 a:6
    got = {
        (r["entity"], r["snap"]): (r["mentions"], r["total"], r["burst"])
        for r in entity_trends([s0, s1, s2]).collect()
    }
    # a: totals 2+1+6=9; snap2 has 6 -> 6*3=18 > 2*9=18? strict: no
    assert got[("a", 2)] == (6, 9, False)
    assert got[("a", 0)] == (2, 9, False)
    # d only in snap2: 6*3 > 2*6 -> burst
    assert got[("d", 2)] == (6, 6, True)
    # b present in 0 and 1 equally: never bursts
    assert got[("b", 0)] == (1, 2, False)
    assert ("d", 0) not in got  # absent snapshots yield no row


def test_entity_trends_burst_strict_inequality(spark):
    # entity only in one of two snapshots: m*2 > 2*m is FALSE (strict)
    s0 = _spo(spark, [("x", "p", "y")])
    s1 = _spo(spark, [("z", "p", "w")])
    got = {
        (r["entity"], r["snap"]): r["burst"]
        for r in entity_trends([s0, s1]).collect()
    }
    assert got[("x", 0)] is False
    # 3 snapshots: m*3 > 2*m holds -> burst
    s2 = _spo(spark, [("q", "p", "r")])
    got3 = {
        (r["entity"], r["snap"]): r["burst"]
        for r in entity_trends([s0, s1, s2]).collect()
    }
    assert got3[("x", 0)] is True


def test_anchor_corpus(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", 0, "/x", "Widget Co", "https://t.com/w"),
            ("https://a.com/2", 0, "/x", "Widget Co", "https://t.com/w"),
            ("https://b.com/1", 0, "/x", "Widget Co", "https://t.com/w"),
            ("https://b.com/2", 0, "/x", "widgets", "https://t.com/w"),
            ("https://a.com/3", 0, "m", "write us", None),  # dropped: no dst
            ("https://a.com/4", 0, "#", "  ", "https://t.com/w"),  # empty anchor
        ],
        ["url", "pos", "href_raw", "anchor_text", "dst_url"],
    )
    got = {
        (r["dst_url"], r["anchor_text"]): (r["n_mentions"], r["n_src_hosts"])
        for r in anchor_corpus(links).collect()
    }
    assert got == {
        ("https://t.com/w", "Widget Co"): (3, 2),
        ("https://t.com/w", "widgets"): (1, 1),
    }


def test_host_boilerplate(spark):
    pages = spark.createDataFrame(
        [
            ("h1", 1, "NAV\nbody one\nFOOT"),
            ("h1", 2, "NAV\nbody two"),
            ("h1", 3, "NAV\nbody three\nFOOT"),
            ("h1", 4, "body four"),
            ("h2", 5, "NAV\nonly page"),
        ],
        ["host", "doc_id", "text"],
    )
    got = {
        (r["host"], r["line"]): (r["n_pages"], r["host_pages"])
        for r in host_boilerplate(pages).collect()
    }
    # h1: NAV on 3/4 pages (>=50%), FOOT on 2/4 (==50%), bodies 1/4 (<50%)
    assert got == {
        ("h1", "NAV"): (3, 4),
        ("h1", "FOOT"): (2, 4),
        ("h2", "NAV"): (1, 1),
        ("h2", "only page"): (1, 1),
    }


def test_host_boilerplate_counts_line_once_per_page(spark):
    pages = spark.createDataFrame(
        [("h", 1, "L\nL\nL"), ("h", 2, "other\nwords")],
        ["host", "doc_id", "text"],
    )
    got = {r["line"]: r["n_pages"] for r in host_boilerplate(pages).collect()}
    assert got == {"L": 1, "other": 1, "words": 1}
