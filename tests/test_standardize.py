"""Phase-2 standardization: Spark == single-node refimpl EXACTLY."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_knowledge_graph_spark.operators.standardize import (
    build_entity_mapping,
    limit_predicate_col,
    standardize_triples,
)
from ai_knowledge_graph_spark.oracle import refimpl


def _collect_sorted(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_standardize_exact_vs_refimpl(spark, raw_triples):
    rows = [r.asDict() for r in raw_triples.collect()]
    rows.sort(key=lambda r: (r["url"], r["chunk"], r["t_idx"]))

    engine = _collect_sorted(
        standardize_triples(raw_triples, tie_order="lexicographic"),
        ["subject", "predicate", "object", "chunk"],
    )
    oracle = sorted(
        (t["subject"], t["predicate"], t["object"], t["chunk"])
        for t in refimpl.standardize(rows)
    )
    assert engine == oracle
    assert len(engine) > 100


def test_mapping_covers_all_lowered_entities(spark, raw_triples):
    mapping = build_entity_mapping(raw_triples)
    ents = (
        raw_triples.select(F.lower("subject").alias("e"))
        .union(raw_triples.select(F.lower("object").alias("e")))
        .distinct()
    )
    # every entity with a non-empty normalized form must have a mapping row
    from ai_knowledge_graph_spark.operators.standardize import normalize_entity_udf

    grouped = ents.withColumn("n", normalize_entity_udf(F.col("e"))).filter(F.col("n") != "")
    missing = grouped.join(mapping, grouped.e == mapping.variant, "left_anti").count()
    assert missing == 0


def test_second_pass_apply_once_no_chaining(spark):
    # "factory" <- "factory system" (subset), and "factory" itself is the
    # standard of its group: variants that pointed at "factory system" keep
    # pointing there ONLY if their key isn't the remapped form itself
    # (reference entity_standardization.py:153-155 applies the override to
    # the exact key, not the group).
    rows = [
        {"subject": "Factory System", "predicate": "p", "object": "x1", "url": None, "chunk": 1, "t_idx": 0, "inferred": False},
        {"subject": "factory system", "predicate": "p", "object": "x2", "url": None, "chunk": 1, "t_idx": 1, "inferred": False},
        {"subject": "factory", "predicate": "p", "object": "x3", "url": None, "chunk": 1, "t_idx": 2, "inferred": False},
    ]
    df = spark.createDataFrame(rows, schema="subject string, predicate string, object string, url string, chunk int, t_idx int, inferred boolean")
    engine = _collect_sorted(
        standardize_triples(df, tie_order="lexicographic"), ["subject", "predicate", "object"]
    )
    oracle = sorted(
        (t["subject"], t["predicate"], t["object"]) for t in refimpl.standardize(rows)
    )
    assert engine == oracle
    # both lower-case variants of "factory system" end up at "factory"
    assert all(s == "factory" for s, _, _ in engine)


def test_canonical_tiebreak_count_len_lex(spark):
    # "The Engine" vs "engine": same normalized form "engine"; "engine"
    # appears more often -> wins on count.
    rows = [
        {"subject": "The Engine", "predicate": "p", "object": "o1", "url": None, "chunk": 1, "t_idx": 0, "inferred": False},
        {"subject": "engine", "predicate": "p", "object": "o2", "url": None, "chunk": 1, "t_idx": 1, "inferred": False},
        {"subject": "engine", "predicate": "p", "object": "o3", "url": None, "chunk": 1, "t_idx": 2, "inferred": False},
    ]
    df = spark.createDataFrame(rows, schema="subject string, predicate string, object string, url string, chunk int, t_idx int, inferred boolean")
    out = {r["subject"] for r in standardize_triples(df).collect()}
    assert out == {"engine"}


def test_limit_predicate_col_matches_python(spark):
    from ai_knowledge_graph_spark.functions.text import limit_predicate_length

    preds = [
        "led to the creation of",
        "is",
        "one two three four",
        "one two OF four",
        "a  b   c  d",  # whitespace runs
        "tab\tseparated words here",
        "",
        "one two three",
    ]
    df = spark.createDataFrame([(p,) for p in preds], ["p"])
    got = [r["out"] for r in df.select(limit_predicate_col("p").alias("out")).collect()]
    assert got == [limit_predicate_length(p) for p in preds]


def test_empty_normalized_entities_keep_original_case(spark):
    # entity made only of stopwords -> no mapping row -> original case kept
    rows = [
        {"subject": "The Of", "predicate": "p", "object": "engine", "url": None, "chunk": 1, "t_idx": 0, "inferred": False},
    ]
    df = spark.createDataFrame(rows, schema="subject string, predicate string, object string, url string, chunk int, t_idx int, inferred boolean")
    out = standardize_triples(df).collect()
    assert out[0]["subject"] == "The Of"


def test_distributed_rank_matches_global_window(spark):
    """distributed_rank == row_number over a global sort, without the
    single-task window (VERDICT r1: the 100x-vocabulary straggler)."""
    from pyspark.sql import Window

    from ai_knowledge_graph_spark.operators.standardize import distributed_rank

    rows = [(f"form {i:04d}", (i * 37) % 91 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "form string, clen int").repartition(16)
    got = distributed_rank(df, [F.col("clen").asc(), F.col("form").asc()])
    w = Window.orderBy(F.col("clen").asc(), F.col("form").asc())
    want = df.withColumn("rank", F.row_number().over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_lexicographic_rank_has_no_single_partition_exchange(spark):
    import io
    from contextlib import redirect_stdout

    from ai_knowledge_graph_spark.operators.standardize import distributed_rank

    df = spark.createDataFrame(
        [(f"f{i}", i % 7) for i in range(100)], "form string, clen int"
    )
    out = distributed_rank(df, [F.col("clen").asc(), F.col("form").asc()])
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert "SinglePartition" not in buf.getvalue()


def test_resolve_order_auto_switches_on_vocabulary(spark):
    from ai_knowledge_graph_spark.pipeline import resolve_order

    t = spark.createDataFrame(
        [(f"e{i}", "rel", f"e{i+1}") for i in range(50)],
        "subject string, predicate string, object string",
    )
    assert resolve_order("auto", t, threshold=1000) == "reference"
    assert resolve_order("auto", t, threshold=10) == "lexicographic"
    assert resolve_order("reference", t, threshold=0) == "reference"
    assert resolve_order("lexicographic", t, threshold=10**9) == "lexicographic"


def test_lsh_blocking_scorer_agrees_on_candidates(spark, raw_triples):
    """blocking='minhash-lsh' (north_star letter): the applyInPandas scorer
    must agree with the column-expression evaluator on every pair BOTH
    blockings surface; LSH recall vs the lossless pair set is measured and
    recorded in COVERAGE.md."""
    from ai_knowledge_graph_spark.operators.standardize import (
        build_entity_mapping,
        entity_counts,
        first_pass_mapping,
        second_pass_assignments,
        valid_triples,
    )

    first = first_pass_mapping(
        entity_counts(valid_triples(raw_triples))
    ).localCheckpoint(eager=True)
    lossless = {
        (r["key"], r["value"])
        for r in second_pass_assignments(first, tie_order="lexicographic").collect()
    }
    lsh = {
        (r["key"], r["value"])
        for r in second_pass_assignments(
            first, tie_order="lexicographic", blocking="minhash-lsh"
        ).collect()
    }
    # Every LSH assignment evaluates the exact same rule chain, so any
    # difference from the lossless set comes from missed candidates only
    # (which can also flip a key's dict-overwrite winner to an earlier
    # pair). Recall floor on the artifact corpus (measured r2, COVERAGE.md).
    assert lossless, "fixture produced no second-pass assignments"
    keys_lossless = {k for k, _ in lossless}
    keys_lsh = {k for k, _ in lsh}
    key_recall = len(keys_lsh & keys_lossless) / len(keys_lossless)
    assert key_recall >= 0.5, key_recall
    exact_recall = len(lsh & lossless) / len(lossless)
    assert exact_recall >= 0.4, exact_recall

    # end-to-end: the lossy mode still produces a usable mapping
    m = build_entity_mapping(
        raw_triples, tie_order="lexicographic", blocking="minhash-lsh"
    )
    assert m.count() > 0
