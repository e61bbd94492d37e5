"""curate_corpus: the composed training-data curation funnel."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.curation import curate_corpus

GOOD = (
    "the railway network enables trade and the factory system drives "
    "industry while coal mining supports steel production and urban "
    "population grows with mass production of textile goods in every "
    "region of the country through modern commerce and shipping lanes"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curation_funnel_gates(spark):
    rows = [
        (0, GOOD, "en"),                          # survives
        (1, GOOD, "de"),                          # lang gate
        (2, "short", "en"),                       # quality gate (5 words -> 0.05)
        (3, "spam spam " * 40, "en"),             # repetition gate
        (4, GOOD, "en"),                          # exact dup of 0 -> dropped
        (5, GOOD + " extra tail words here now", "en"),  # near-dup of 0 -> dropped
        (6, GOOD.replace("railway", "canal").replace("factory", "mill")
            .replace("coal", "ore").replace("urban", "rural")
            .replace("textile", "ceramic").replace("trade", "barter")
            .replace("industry", "craft").replace("steel", "iron"), "en"),  # distinct enough
    ]
    out = {r["doc_id"]: r for r in curate_corpus(_docs(spark, rows)).collect()}
    assert 0 in out and 6 in out
    for dropped in (1, 2, 3, 4, 5):
        assert dropped not in out, dropped
    assert out[0]["split"] in ("train", "val", "test")
    assert out[0]["lang"] == "en"
    assert out[0]["quality"] >= 0.3
    assert out[0]["dup_gram_frac"] <= 0.06


def test_curation_survivor_is_min_id(spark):
    rows = [(7, GOOD, "en"), (3, GOOD, "en"), (9, GOOD, "en")]
    ids = {r["doc_id"] for r in curate_corpus(_docs(spark, rows)).collect()}
    assert ids == {3}


def test_curation_lang_filter_reaches_scan(spark, tmp_path):
    # the cheapest gate must push into the parquet scan (the 100 TB funnel
    # property: later stages only read survivors)
    p = str(tmp_path / "docs.parquet")
    _docs(spark, [(0, GOOD, "en"), (1, GOOD, "de")]).write.parquet(p)
    docs = spark.read.parquet(p)
    q = docs.filter(F.col("lang").isin("en"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "EqualTo(lang,en)" in pushed[0], plan


def test_line_dedup_drops_corpus_boilerplate(spark):
    from ai_knowledge_graph_spark.operators.curation import line_dedup

    hdr = "HOME | ABOUT"
    rows = [
        (0, hdr + "\nunique zero\nshared body"),
        (1, hdr + "\nunique one\nshared body"),
        (2, hdr + "\nunique two"),
        (3, "only unique three"),
        (4, hdr),  # all lines dropped -> empty text survives as a row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # hdr appears 4x (> 2) -> dropped; "shared body" 2x (<= 2) -> kept
    out = {r["doc_id"]: r for r in line_dedup(df, max_occurrences=2).collect()}
    assert out[0]["text"] == "unique zero\nshared body"
    assert out[0]["n_lines"] == 3 and out[0]["n_dropped"] == 1
    assert out[1]["text"] == "unique one\nshared body"
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "only unique three" and out[3]["n_dropped"] == 0
    assert out[4]["text"] == "" and out[4]["n_dropped"] == 1
    assert len(out) == 5


def test_line_dedup_counts_within_doc_repeats(spark):
    from ai_knowledge_graph_spark.operators.curation import line_dedup

    # "x" appears twice in ONE doc: total occurrences 2 > 1 -> dropped
    df = spark.createDataFrame(
        [(0, "x\nmid\nx"), (1, "solo")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in line_dedup(df, max_occurrences=1).collect()}
    assert out[0]["text"] == "mid" and out[0]["n_dropped"] == 2
    assert out[1]["text"] == "solo"


def test_decontaminate_flags_overlapping_docs(spark):
    from ai_knowledge_graph_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),  # contains bench 3-gram
            (1, "beta gamma delta zeta eta"),       # contains bench 3-gram
            (2, "one two three four five"),         # clean
            (3, "too short"),                        # < k words: 0 grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "xx beta gamma delta yy")], "bench_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, k=3, min_hits=1).collect()
    }
    assert len(out) == 4
    assert out[0]["contaminated"] and out[0]["n_hits"] == 1
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]
    assert out[0]["n_grams"] == 3 and out[2]["n_grams"] == 3


def test_decontaminate_min_hits_threshold(spark):
    from ai_knowledge_graph_spark.operators.curation import decontaminate

    docs = spark.createDataFrame(
        [(0, "a b c d e f"), (1, "a b c x y z")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(0, "a b c d e f")], "bench_id long, text string"
    )
    # doc 0 shares 4 trigrams, doc 1 only 1
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, k=3, min_hits=2).collect()
    }
    assert out[0]["n_hits"] == 4 and out[0]["contaminated"]
    assert out[1]["n_hits"] == 1 and not out[1]["contaminated"]


def test_redact_pii(spark):
    from ai_knowledge_graph_spark.operators.curation import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.com now"),
            (1, "server at 10.0.42.7 port 80"),
            (2, "call +1-555-0100-321 today"),
            (3, "clean text, nothing here"),
            (4, "a@b.io and 1.2.3.4 and +12-3456-7890"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert out[0]["text"] == "mail <EMAIL> now" and out[0]["n_email"] == 1
    assert out[1]["text"] == "server at <IPV4> port 80" and out[1]["n_ipv4"] == 1
    assert out[2]["text"] == "call <PHONE> today" and out[2]["n_phone"] == 1
    assert out[3]["text"] == "clean text, nothing here"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[4]["text"] == "<EMAIL> and <IPV4> and <PHONE>"
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
