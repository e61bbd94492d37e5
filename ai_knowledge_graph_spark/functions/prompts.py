"""Prompt assembly as aggregation expressions (SURVEY §2.11 P6).

The reference builds LLM prompt strings driver-side from Python lists:
entity resolution takes the top-100 entities newline-joined
(entity_standardization.py:398-409 → prompts/entity_prompts.py:9-26);
between-community inference takes 5 representatives per community
comma-joined plus ≤20 context triples newline-joined (:480-510 →
inference_prompts.py:9-40); within-community takes candidate pairs plus
context (:591-615 → :69-107).

Here the same strings are produced as DataFrame aggregations —
``collect_list`` + ``sort_array`` + ``concat_ws`` + ``format_string`` — so
prompt construction for millions of communities is itself a distributed
stage feeding the batched ``mapInPandas`` LLM scorer (P2), not a driver
loop. The LLM stages are config-gated off in parity runs (SURVEY §7 D3);
the templates capture the reference's output contract (JSON shape, ≤3-word
predicates, no self-references).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENTITY_RESOLUTION_TEMPLATE = (
    "Below is a list of entity names extracted from a knowledge graph.\n"
    "Group names that refer to the same concept and give each group one "
    "standardized name.\n"
    "Return valid JSON: {standardized name: [variant, ...], ...}; only "
    "include groups with multiple variants.\n\nEntity list:\n%s"
)

BETWEEN_COMMUNITY_TEMPLATE = (
    "Two disconnected communities of entities.\n"
    "Community 1 entities: %s\nCommunity 2 entities: %s\n"
    "Existing relationships:\n%s\n"
    "Infer 2-3 plausible relationships between the communities as a JSON "
    "array of {subject, predicate, object}. Predicates at most 3 words; "
    "subject and object must differ."
)

WITHIN_COMMUNITY_TEMPLATE = (
    "Pairs of entities that appear related but are not connected:\n%s\n"
    "Existing relationships:\n%s\n"
    "Infer plausible relationships for these pairs as a JSON array of "
    "{subject, predicate, object}. Predicates at most 3 words; subject and "
    "object must differ."
)


def entity_resolution_prompt(triples: DataFrame, cap: int = 100) -> DataFrame:
    """One-row DataFrame (n_entities, user_prompt): top-``cap`` entities by
    frequency, sorted, newline-joined into the resolution template
    (entity_standardization.py:393-409: count as subject or object, top-100,
    ``"\\n".join(sorted(...))``). Entities keep their raw case — the reference
    counts and emits raw-case names, and apply_llm_resolution matches the
    returned variants exact-case, so lowercasing here would make mixed-case
    entities unmatchable."""
    counts = (
        triples.select(F.explode(F.array(F.col("subject"), F.col("object"))).alias("e"))
        .groupBy("e")
        .count()
        .orderBy(F.desc("count"), F.asc("e"))
        .limit(cap)
    )
    return counts.agg(
        F.count(F.lit(1)).alias("n_entities"),
        F.format_string(
            ENTITY_RESOLUTION_TEMPLATE,
            F.concat_ws("\n", F.sort_array(F.collect_list("e"))),
        ).alias("user_prompt"),
    )


def community_inference_prompts(
    reps: DataFrame,
    context: DataFrame,
) -> DataFrame:
    """Per-pair between-community prompts (P6 over J6 context).

    reps: (pair_id, side INT ∈ {1,2}, entity) — ≤5 representatives per side
    (entity_standardization.py:479-481).
    context: (pair_id, subject, predicate, object) — ≤20 context triples per
    pair (J6; :490-492).
    Returns (pair_id, user_prompt); the join/agg shape scales to millions of
    community pairs.
    """
    sides = (
        reps.groupBy("pair_id", "side")
        .agg(F.concat_ws(", ", F.sort_array(F.collect_list("entity"))).alias("ents"))
        .groupBy("pair_id")
        .agg(
            F.max(F.when(F.col("side") == 1, F.col("ents"))).alias("e1"),
            F.max(F.when(F.col("side") == 2, F.col("ents"))).alias("e2"),
        )
    )
    ctx = context.groupBy("pair_id").agg(
        F.concat_ws(
            "\n",
            F.sort_array(
                F.collect_list(F.format_string("%s %s %s", "subject", "predicate", "object"))
            ),
        ).alias("triples_text")
    )
    return sides.join(ctx, "pair_id", "left").select(
        "pair_id",
        F.format_string(
            BETWEEN_COMMUNITY_TEMPLATE,
            "e1",
            "e2",
            F.coalesce("triples_text", F.lit("")),
        ).alias("user_prompt"),
    )


def within_community_prompts(
    pairs: DataFrame,
    context: DataFrame,
) -> DataFrame:
    """Per-community within-community prompts.

    pairs: (component_id, a, b) — ≤10 candidate pairs (J5, :591).
    context: (component_id, subject, predicate, object) — ≤20 triples.
    Returns (component_id, user_prompt).
    """
    ptext = pairs.groupBy("component_id").agg(
        F.concat_ws(
            "\n",
            F.sort_array(F.collect_list(F.format_string("%s and %s", "a", "b"))),
        ).alias("pairs_text")
    )
    ctx = context.groupBy("component_id").agg(
        F.concat_ws(
            "\n",
            F.sort_array(
                F.collect_list(F.format_string("%s %s %s", "subject", "predicate", "object"))
            ),
        ).alias("triples_text")
    )
    return ptext.join(ctx, "component_id", "left").select(
        "component_id",
        F.format_string(
            WITHIN_COMMUNITY_TEMPLATE,
            "pairs_text",
            F.coalesce("triples_text", F.lit("")),
        ).alias("user_prompt"),
    )
