"""robots_filter: documented-grammar replay — longest match, allow wins
ties, star-group selection, missing-robots default-allow."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.webcrawl import robots_filter

ROBOTS = {
    "a.com": (
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
    ),
    "b.org": (
        "User-agent: badbot\n"
        "Disallow: /\n"
        "\n"
        "User-Agent: *\n"
        "Disallow: /\n"
        "Allow: /pub\n"
    ),
    "c.net": "User-agent: *\nDisallow:\n",  # empty Disallow = no rule
}

CASES = [
    # (url, expected_allowed)
    ("https://a.com/", True),
    ("https://a.com/private", False),
    ("https://a.com/private/x", False),
    ("https://a.com/private/ok/y", True),  # longer Allow wins
    ("https://a.com/public", True),
    ("https://b.org/", False),  # Disallow: / hits everything...
    ("https://b.org/pub/page", True),  # ...except the Allow carve-out
    ("https://b.org/else", False),
    ("https://c.net/anything", True),
    ("https://nodata.io/x", True),  # no robots row -> allowed
    ("https://a.com", True),  # bare domain -> path "/"
]


def test_grammar_cases(spark):
    urls = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    robots = spark.createDataFrame(
        [(d, t) for d, t in ROBOTS.items()], "domain string, robots_txt string"
    )
    out = {
        r["url"]: r["robots_allowed"]
        for r in robots_filter(urls, robots).collect()
    }
    for url, exp in CASES:
        assert out[url] is exp, url


def test_badbot_group_is_ignored(spark):
    # only the star group applies: a.com's badbot Disallow:/ must not leak
    urls = spark.createDataFrame([("https://a.com/welcome",)], "url string")
    robots = spark.createDataFrame(
        [("a.com", ROBOTS["a.com"])], "domain string, robots_txt string"
    )
    assert robots_filter(urls, robots).collect()[0]["robots_allowed"] is True
