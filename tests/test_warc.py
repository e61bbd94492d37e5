"""WARC source: synthesized-file roundtrip (plain + gzip), record grammar
edge cases, response->pages handoff."""

from __future__ import annotations

import gzip
import os
import tempfile

import pytest

from ai_knowledge_graph_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_responses_to_pages,
)


def _record(warc_type: str, uri: str, body: bytes, rid: str) -> bytes:
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-18T00:00:00Z\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return hdr + body + b"\r\n\r\n"


def _http_body(html: str) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
    )


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", "", b"robots: classic\r\n", "info1")
        + _record(
            "response",
            "http://example.com/a",
            _http_body("<html><body>alpha page text</body></html>"),
            "r1",
        )
        + _record("request", "http://example.com/a", b"GET /a HTTP/1.1", "q1")
        + _record(
            "response",
            "http://example.com/b",
            _http_body("<html><body>beta WARC/1.0 inside body</body></html>"),
            "r2",
        )
    )


def test_parse_warc_bytes_grammar():
    recs = parse_warc_bytes(_warc_bytes())
    assert [r["warc_type"] for r in recs] == [
        "warcinfo",
        "response",
        "request",
        "response",
    ]
    # the "WARC/1.0" inside record r2's BODY must not split a record
    # (Content-Length delimits, not the magic)
    assert b"WARC/1.0 inside body" in recs[3]["body"]
    assert recs[1]["target_uri"] == "http://example.com/a"
    assert all(r["content_length"] == len(r["body"]) for r in recs)


def test_missing_content_length_raises():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_bytes(bad)


def test_read_warc_plain_and_gzip(spark):
    d = tempfile.mkdtemp(prefix="warc_src_")
    with open(os.path.join(d, "a.warc"), "wb") as f:
        f.write(_warc_bytes())
    with open(os.path.join(d, "b.warc.gz"), "wb") as f:
        f.write(gzip.compress(_warc_bytes()))
    out = read_warc(spark, d).collect()
    assert len(out) == 8  # 4 records x 2 files
    by_type = {}
    for r in out:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["response"]) == 4
    assert all(r["content_length"] == len(r["body"]) for r in out)

    pages = {
        (r["url"], r["text"])
        for r in warc_responses_to_pages(read_warc(spark, d)).collect()
    }
    assert (
        "http://example.com/a",
        "<html><body>alpha page text</body></html>",
    ) in pages
    assert len(pages) == 2  # same two urls from both files
