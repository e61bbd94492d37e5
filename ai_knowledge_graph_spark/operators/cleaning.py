"""Data-hygiene cleaning stage (scripts/clean_graph.py re-expressed in Spark).

Steps mirrored (clean_graph.py:92-187; step numbers theirs):
  2. drop null/empty fields, normalize whitespace + strip quotes,
     lowercase+underscore predicates
  3. drop short subjects/objects (< 3 chars)
  4. drop noise entities (pronoun/article/number/punct regex blocklist)
  5. merge generic predicates through an 18-rule map
  6. case-insensitive (s, p, o) dedup keeping the FIRST occurrence in
     document order
  7. drop triples whose predicate occurs fewer than ``min_pred_count`` times
     (computed AFTER dedup, like the reference)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PREDICATE_MERGES = {
    "is": "is_a",
    "are": "is_a",
    "be": "is_a",
    "was": "is_a",
    "were": "is_a",
    "has": "has_component",
    "have": "has_component",
    "include": "includes",
    "includes": "includes",
    "value": "has_value",
    "set": "belongs_to_set",
    "exists": "exists_in",
    "use": "uses",
    "used": "uses",
    "do": "performs",
    "does": "performs",
    "make": "produces",
    "makes": "produces",
    "called": "is_named",
    "known": "is_known_as",
}

NOISE_RE = (
    "^(i|we|they|it|he|she|you|this|that|these|those|there|here)$"
    "|^(the|a|an|of|in|on|at|to|for|with|and|or|but|not)$"
    r"|^\d+$"
    r"|^[.\-_/\\]+$"
    "|^(file|page|line|section|chapter|part|item|example|note)$"
)


def _norm(c):
    """normalize_text (clean_graph.py:73-79): strip ws, strip quotes, strip
    ws again, collapse whitespace runs."""
    c = F.trim(c)
    c = F.regexp_replace(c, '^"+|"+$', "")
    c = F.regexp_replace(c, "^'+|'+$", "")
    c = F.trim(c)
    return F.regexp_replace(c, r"\s+", " ")


def clean_triples(triples: DataFrame, min_pred_count: int = 2) -> DataFrame:
    # step 2: null/empty filter on RAW values, then normalize
    kept = triples.filter(
        F.col("subject").isNotNull()
        & (F.col("subject") != "")
        & F.col("predicate").isNotNull()
        & (F.col("predicate") != "")
        & F.col("object").isNotNull()
        & (F.trim(F.col("object")) != "")
    )
    normed = kept.select(
        _norm(F.col("subject")).alias("subject"),
        F.replace(F.lower(_norm(F.col("predicate"))), F.lit(" "), F.lit("_")).alias(
            "predicate"
        ),
        _norm(F.col("object")).alias("object"),
        "url",
        "chunk",
        "t_idx",
    )

    # step 3: short entities
    longf = normed.filter((F.length("subject") >= 3) & (F.length("object") >= 3))

    # step 4: noise entities (patterns are lowercase; reference matches
    # case-insensitively on the stripped value)
    noisef = longf.filter(
        ~F.lower(F.trim(F.col("subject"))).rlike(NOISE_RE)
        & ~F.lower(F.trim(F.col("object"))).rlike(NOISE_RE)
    )

    # step 5: predicate merge map — tiny broadcast-join against a literal dim
    merge_map = F.create_map(
        *[F.lit(x) for kv in PREDICATE_MERGES.items() for x in kv]
    )
    mergedp = noisef.withColumn(
        "predicate", F.coalesce(merge_map[F.col("predicate")], F.col("predicate"))
    )

    # step 6: case-insensitive dedup, first occurrence in document order wins
    w = Window.partitionBy(
        F.lower("subject"), F.lower("predicate"), F.lower("object")
    ).orderBy(
        F.col("url").asc_nulls_last(),
        F.col("chunk").asc_nulls_last(),
        F.col("t_idx").asc_nulls_last(),
    )
    deduped = (
        mergedp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )

    # step 7: singleton-predicate filter = agg + left-semi join back (A10)
    counts = deduped.groupBy("predicate").agg(F.count(F.lit(1)).alias("pc"))
    keepers = counts.filter(F.col("pc") >= min_pred_count).select("predicate")
    return deduped.join(F.broadcast(keepers), "predicate", "left_semi").select(
        "subject", "predicate", "object", "url", "chunk", "t_idx"
    )
