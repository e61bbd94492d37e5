"""Hearst-pattern hypernym mining over web text.

The classic lexico-syntactic taxonomy-induction pass (Hearst, COLING 1992):
surface patterns like "X such as A, B and C" assert ``is_a(A, X)``. The
reference pipeline extracts open-domain SPO triples from chunk text
(src/knowledge_graph/main.py extraction loop) but has no taxonomy stage;
a web-scale KG build runs this as a cheap high-precision complement to the
LLM extractor — it is pure regex over sentences, no model in the loop.

Patterns mined (single-token NPs; the multiword-NP upgrade is a chunker
swap, not a plan change):

* ``H such as a, b and c``      → (a,H) (b,H) (c,H)   pattern = such_as
* ``H including a and b``       → (a,H) (b,H)         pattern = including
* ``H especially a``            → (a,H)               pattern = especially
* ``a and b and other H``       → (a,H) (b,H)         pattern = other

Plan shape: sentence explode → four independent ``rlike`` scans with
``regexp_extract`` + list-split explode → one union → one hash aggregation
on (hyponym, hypernym, pattern). Everything is JVM-side regex inside
whole-stage codegen; one shuffle total (the final groupBy). At 100 TB the
scan is embarrassingly parallel over documents and the aggregate's key
space is vocabulary-sized, so it map-side combines to almost nothing.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import spread

# list items separate on commas / "and" / "or"
_LIST_SEP = r",\s*|\s+and\s+|\s+or\s+"

# (pattern name, sentence regex, hypernym group, list group)
_PATTERNS = [
    ("such_as", r"^(\w+) such as (.+)$", 1, 2),
    ("including", r"^(\w+) including (.+)$", 1, 2),
    ("especially", r"^(\w+) especially (.+)$", 1, 2),
    ("other", r"^(.+?) and other (\w+)$", 2, 1),
]


def hearst_hypernyms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(hyponym, hypernym, pattern, support, n_docs) from Hearst patterns.

    ``support`` counts extracted instances (a pair asserted twice in one
    document counts twice — mention frequency is the confidence signal);
    ``n_docs`` counts distinct supporting documents. Self-pairs
    (hyponym == hypernym) are dropped.
    """
    sent = (
        spread(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), r"[.!?]+")).alias("s"),
        )
        .select("doc_id", F.trim(F.col("s")).alias("s"))
        .filter(F.col("s") != "")
    )
    parts = []
    for name, rx, hg, lg in _PATTERNS:
        m = sent.filter(F.col("s").rlike(rx))
        items = F.split(F.regexp_extract(F.col("s"), rx, lg), _LIST_SEP)
        parts.append(
            m.select(
                "doc_id",
                F.explode(items).alias("hyponym"),
                F.regexp_extract(F.col("s"), rx, hg).alias("hypernym"),
                F.lit(name).alias("pattern"),
            )
        )
    rows = reduce(lambda a, b: a.unionByName(b), parts)
    rows = rows.filter(
        F.col("hyponym").rlike(r"^\w+$")
        & (F.col("hyponym") != F.col("hypernym"))
    )
    return rows.groupBy("hyponym", "hypernym", "pattern").agg(
        F.count(F.lit(1)).alias("support"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def taxonomy_closure(pairs: DataFrame, depth: int = 2) -> DataFrame:
    """(hyponym, hypernym, depth, support): bounded transitive closure of
    the mined is_a pairs — ``is_a(a,b) ∧ is_a(b,c) ⇒ is_a(a,c)`` up to
    ``depth`` hops, the taxonomy-induction step after Hearst mining
    (Snow et al., NeurIPS 2004 learn those compositions; here they are
    materialized exactly).

    Input: the :func:`hearst_hypernyms` output (pattern granularity is
    collapsed by summing support per pair). ``depth`` is the MINIMAL
    derivation length: a pair reachable directly never reappears as a
    2-hop row (anti-join per level, the operators/inference.py J3 shape).
    Composed support = min of the parts; across multiple derivations of
    the same pair, the max such support wins (widest-bottleneck path).
    Self-pairs arising from cycles are dropped.

    Plan shape per level: one hash equi-join on the shared entity, one
    map-side-combinable max aggregation, one anti-join against the
    accumulated closure. Entity-keyed shuffles only — the 100 TB shape,
    same as transitive_inference.
    """
    base = pairs.groupBy("hyponym", "hypernym").agg(
        F.sum("support").alias("support")
    )
    base = base.localCheckpoint(eager=True)
    out = base.withColumn("depth", F.lit(1))
    frontier = base
    for d in range(2, depth + 1):
        step = (
            frontier.alias("l")
            .join(
                base.alias("r"),
                F.col("l.hypernym") == F.col("r.hyponym"),
            )
            .select(
                F.col("l.hyponym").alias("hyponym"),
                F.col("r.hypernym").alias("hypernym"),
                F.least(F.col("l.support"), F.col("r.support")).alias("support"),
            )
            .filter(F.col("hyponym") != F.col("hypernym"))
            .groupBy("hyponym", "hypernym")
            .agg(F.max("support").alias("support"))
            .join(out, ["hyponym", "hypernym"], "left_anti")
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(step.withColumn("depth", F.lit(d)))
        frontier = step
    return out
