"""corpus_cube: cell/subtotal/grand-total consistency + exact percentiles."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_spark.operators.webcrawl import corpus_cube

ROWS = [
    (1, "a.com", "en", 100),
    (2, "a.com", "en", 200),
    (3, "a.com", "de", 300),
    (4, "b.org", "en", 400),
    (5, "b.org", None, 500),  # genuine NULL dim value
]


def _pct(vals, p):
    vals = sorted(vals)
    idx = p * (len(vals) - 1)
    lo, hi = int(idx), min(int(idx) + 1, len(vals) - 1)
    return round(vals[lo] + (idx - lo) * (vals[hi] - vals[lo]), 6)


def test_cube_cells_and_totals(spark):
    df = spark.createDataFrame(
        ROWS, "doc_id long, source string, lang string, n_chars long"
    )
    out = {
        (r["source"], r["lang"], r["gid"]): r
        for r in corpus_cube(df).collect()
    }
    # grand total: gid 3, both dims NULLed out
    gt = out[(None, None, 3)]
    assert gt["n_docs"] == 5 and gt["total_size"] == 1500
    assert gt["p50_size"] == _pct([100, 200, 300, 400, 500], 0.5)
    assert gt["p95_size"] == _pct([100, 200, 300, 400, 500], 0.95)
    # per-source subtotal: gid 1 (lang grouped out)
    assert out[("a.com", None, 1)]["n_docs"] == 3
    # gid separates the genuine NULL lang cell (gid 0) from the subtotal
    assert out[("b.org", None, 0)]["n_docs"] == 1
    assert out[("b.org", None, 1)]["n_docs"] == 2
    # base cell
    cell = out[("a.com", "en", 0)]
    assert cell["n_docs"] == 2 and cell["p50_size"] == pytest.approx(150.0)
    # 4 grouping sets over the distinct key space
    assert len(out) == 4 + 2 + 3 + 1  # cells + src + lang(en,de,NULL) + total
