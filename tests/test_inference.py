"""Phase-3 inference: Spark == single-node refimpl EXACTLY, plus unit rules."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.inference import (
    infer_relationships,
    lexical_inference,
    transitive_inference,
)
from ai_knowledge_graph_spark.operators.standardize import standardize_triples
from ai_knowledge_graph_spark.oracle import refimpl


def _spo(df):
    return sorted({(r["subject"], r["predicate"], r["object"]) for r in df.collect()})


TRIPLES_DDL = (
    "subject string, predicate string, object string, "
    "url string, chunk int, t_idx int, inferred boolean"
)


def _row(s, p, o, chunk=1, t_idx=0, url=None):
    return {
        "subject": s, "predicate": p, "object": o,
        "url": url, "chunk": chunk, "t_idx": t_idx, "inferred": False,
    }


def _df(spark, rows, ddl=TRIPLES_DDL):
    return spark.createDataFrame(rows, schema=ddl)


def test_infer_exact_vs_refimpl(spark, std_triples):
    std = std_triples
    engine = _spo(infer_relationships(std, pair_order="lexicographic"))

    rows = [r.asDict() for r in std.collect()]
    rows.sort(
        key=lambda r: (
            r["url"] or "",
            -1 if r["chunk"] is None else r["chunk"],
            -1 if r["t_idx"] is None else r["t_idx"],
        )
    )
    oracle = sorted({(t["subject"], t["predicate"], t["object"]) for t in refimpl.infer(rows)})
    assert engine == oracle
    assert len(engine) > 100


def test_transitive_composition_rules(spark):
    rows = [
        _row("a", "leads to", "b", t_idx=0),
        _row("b", "causes", "c", t_idx=1),
        _row("x", "p", "y", t_idx=2),
        _row("y", "p", "z", t_idx=3),
        _row("q", "p1", "r", t_idx=4),
        _row("r", "p2", "s", t_idx=5),
        _row("q", "existing", "s", t_idx=6),  # blocks q->s inference
    ]
    out = _spo(transitive_inference(_df(spark, rows)))
    assert ("a", "leads to via", "c") in out  # "leads to via b" truncated -> 3 words
    assert ("x", "indirectly p", "z") in out  # p == p
    assert all(s != "q" for s, _, _ in out)  # anti-join on existing pair


def test_transitive_last_predicate_wins(spark):
    rows = [
        _row("a", "first", "b", t_idx=0),
        _row("a", "second", "b", t_idx=1),  # later -> wins the (a, b) slot
        _row("b", "goes", "c", t_idx=2),
    ]
    out = _spo(transitive_inference(_df(spark, rows)))
    assert out == [("a", "second via b", "c")]


def test_lexical_rules(spark):
    rows = [
        _row("solar power", "p", "wind turbine", t_idx=0),
        _row("power grid", "p", "coal", t_idx=1),
        _row("micro coal", "p", "wind", t_idx=2),
    ]
    out = _spo(lexical_inference(_df(spark, rows), pair_order="lexicographic"))
    # "solar power" & "power grid" share "power" (>=4 chars), neither starts
    # with it -> wait: "power grid" DOES start with "power" -> directed rule:
    # (solar power, relates to, power grid)? No — the non-starter becomes the
    # subject: e_starts -> other is subject.
    assert ("solar power", "relates to", "power grid") in out
    # "coal" is a substring of "micro coal" with no shared... they share the
    # word "coal" (4 chars) -> startswith rule: coal starts with coal, micro
    # coal doesn't -> (micro coal, relates to, coal)
    assert ("micro coal", "relates to", "coal") in out
    # "wind" vs "wind turbine": share "wind" (4 chars), both start with it ->
    # symmetric "related to" with lexicographic direction
    assert ("wind", "related to", "wind turbine") in out


def test_lexical_short_shared_word_suppresses_containment(spark):
    # share "ab" (<4 chars) -> nothing emitted, even though one contains the other
    rows = [
        _row("ab", "p", "zzz", t_idx=0),
        _row("ab cd", "p", "zzz", t_idx=1),
    ]
    out = _spo(lexical_inference(_df(spark, rows), pair_order="lexicographic"))
    assert ("ab cd", "is type of", "ab") not in out
    assert ("ab", "is type of", "ab cd") not in out


def test_lexical_containment_no_shared_word(spark):
    rows = [
        _row("superhighway", "p", "zz1", t_idx=0),
        _row("highway", "p", "zz2", t_idx=1),
    ]
    out = _spo(lexical_inference(_df(spark, rows), pair_order="lexicographic"))
    # no shared word ("superhighway" is one token), containment ->
    # subject is the container-side per reference orientation
    assert ("superhighway", "is type of", "highway") in out


def test_dedup_keeps_original_over_inferred(spark):
    from ai_knowledge_graph_spark.operators.inference import deduplicate_triples
    import pyspark.sql.functions as F

    rows = [
        dict(_row("a", "p", "b", chunk=3, t_idx=0), stage="extract"),
        dict(_row("a", "p", "b", chunk=7, t_idx=1), stage="extract"),  # last original wins
        {
            "subject": "a", "predicate": "p", "object": "b",
            "url": None, "chunk": None, "t_idx": None, "inferred": True, "stage": "lexical",
        },
    ]
    out = deduplicate_triples(spark.createDataFrame(rows, schema=TRIPLES_DDL + ", stage string")).collect()
    assert len(out) == 1
    assert out[0]["inferred"] is False
    assert out[0]["chunk"] == 7


def test_lexical_hot_token_guard_drops_only_hot_blocks(spark):
    """max_block_size: a blocking token whose document frequency exceeds
    the cap is dropped from the blocking key space (its O(df^2) candidate
    block never forms); cold tokens are untouched. The web-scale guard for
    Zipf vocabularies — measured at bench scale by BENCH/skew_probe.py."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.operators.inference import lexical_inference

    hot = [f"{w} corp" for w in ("alpha", "beta", "delta", "epsi", "zeta")]
    cold = ["gamma one", "gamma two"]
    ents = hot + cold
    triples = spark.createDataFrame(
        [(e, "linked to", f"dummy{i}x") for i, e in enumerate(ents)],
        ["subject", "predicate", "object"],
    )

    def corp_pairs(df):
        rows = df.filter(
            F.col("subject").contains("corp") & F.col("object").contains("corp")
        )
        return rows.count()

    off = lexical_inference(triples, max_block_size=0, pair_order="lexicographic")
    off_rows = off.localCheckpoint(eager=True)
    assert corp_pairs(off_rows) == 10  # all 5-choose-2 hot pairs blocked in

    on = lexical_inference(triples, max_block_size=3, pair_order="lexicographic")
    on_rows = on.localCheckpoint(eager=True)
    # corp df=5 > 3 -> dropped; gamma df=2 <= 3 -> kept
    assert corp_pairs(on_rows) == 0
    gamma = on_rows.filter(
        F.col("subject").startswith("gamma") & F.col("object").startswith("gamma")
    )
    assert gamma.count() == 1
    # guard removes edges, never adds: on-output is a subset of off-output
    assert on_rows.exceptAll(off_rows).count() == 0
