"""scd2_versions: collapse runs, interval chaining, current-row flag."""

from __future__ import annotations

from datetime import datetime

from ai_knowledge_graph_spark.operators.webcrawl import scd2_versions


def _ts(m):
    return datetime(2026, 1, 1, 0, m)


ROWS = [
    # url, warc_ts, doc_id, digest
    ("u1", _ts(0), 1, "A"),
    ("u1", _ts(1), 2, "A"),   # unchanged -> collapsed
    ("u1", _ts(2), 3, "B"),   # change
    ("u1", _ts(3), 4, "B"),   # unchanged
    ("u1", _ts(4), 5, "A"),   # change BACK to A -> new version
    ("u2", _ts(0), 6, "X"),   # single capture
]


def test_versions_and_intervals(spark):
    df = spark.createDataFrame(
        ROWS, "url string, warc_ts timestamp, doc_id long, digest string"
    )
    out = {
        (r["url"], r["version"]): r
        for r in scd2_versions(df).collect()
    }
    assert len(out) == 4  # u1: A,B,A ; u2: X
    a1 = out[("u1", 1)]
    assert a1["digest"] == "A" and a1["valid_from"] == _ts(0)
    assert a1["valid_to"] == _ts(2) and a1["is_current"] is False
    b = out[("u1", 2)]
    assert b["digest"] == "B" and b["valid_from"] == _ts(2)
    assert b["valid_to"] == _ts(4)
    a2 = out[("u1", 3)]
    assert a2["digest"] == "A" and a2["valid_to"] is None
    assert a2["is_current"] is True
    x = out[("u2", 1)]
    assert x["is_current"] is True and x["valid_from"] == _ts(0)
    # intervals chain with no gaps: valid_to(v) == valid_from(v+1)
    assert a1["valid_to"] == b["valid_from"]
    assert b["valid_to"] == a2["valid_from"]


def test_same_ts_tiebreak_is_deterministic(spark):
    rows = [
        ("u", _ts(0), 2, "B"),
        ("u", _ts(0), 1, "A"),  # same ts: doc_id orders A before B
        ("u", _ts(1), 3, "B"),  # unchanged vs version 2 -> collapsed
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, doc_id long, digest string"
    )
    out = sorted(
        (r["version"], r["digest"]) for r in scd2_versions(df).collect()
    )
    assert out == [(1, "A"), (2, "B")]
