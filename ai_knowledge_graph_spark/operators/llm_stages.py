"""Batched LLM-assisted sub-stages (config-gated; SURVEY §7 D3).

The reference has three LLM call sites beyond extraction, each a sequential
driver-side HTTP call:

  * entity resolution over the top-100 entities — 1 call
    (entity_standardization.py:377-449)
  * between-community relationship inference — ≤10 calls over the pairwise
    top-5 communities (:451-543)
  * within-community inference — ≤3 calls (:545-659)

Here each becomes: distributed prompt assembly (functions/prompts, P6) →
``mapInPandas`` over the prompt rows calling a pluggable batched
``llm_fn: pd.Series[str] -> pd.Series[str]`` → distributed JSON-repair parse
(functions/jsonrepair, X10) → the reference's validation/apply rules as
column expressions. With millions of communities the prompt table is just
another DataFrame and LLM scoring is executor-side batch work, not a driver
loop.

Parity runs keep these OFF (``use_llm_for_entities`` /
``use_llm_for_inference`` default false, mirroring the reference flags).
The deterministic fakes below exercise the full plumbing in tests without a
model endpoint; a real endpoint drops in as an ``llm_fn`` that POSTs the
batch (llm.py:6-61 semantics, batched).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.prompts import (
    community_inference_prompts,
    entity_resolution_prompt,
    within_community_prompts,
)
from .components import components_for_triples
from .concepts import candidate_pairs_in_community
from .standardize import limit_predicate_col

LlmFn = Callable[[pd.Series], pd.Series]


# --- deterministic fakes (no endpoint in this image) -----------------------


def fake_resolution_llm(prompts: pd.Series) -> pd.Series:
    """Groups entities sharing their first word; standard = shortest variant
    (lexicographic tie). Returns the JSON dict shape the reference parses
    (entity_standardization.py:426-435)."""
    out = []
    for p in prompts:
        ents = []
        if "Entity list:" in p:
            ents = [e for e in p.split("Entity list:", 1)[1].strip().splitlines() if e]
        groups: dict[str, list[str]] = {}
        for e in ents:
            words = e.split()
            groups.setdefault(words[0] if words else e, []).append(e)
        mapping = {
            min(v, key=lambda x: (len(x), x)): sorted(v)
            for v in groups.values()
            if len(v) > 1
        }
        out.append(json.dumps(mapping))
    return pd.Series(out, index=prompts.index)


def fake_inference_llm(prompts: pd.Series) -> pd.Series:
    """Emits up to 3 'related to' triples pairing the listed entities —
    the JSON array shape of inference_prompts.py responses."""
    out = []
    for p in prompts:
        triples = []
        if "Community 1 entities:" in p and "Community 2 entities:" in p:
            e1 = p.split("Community 1 entities:", 1)[1].splitlines()[0]
            e2 = p.split("Community 2 entities:", 1)[1].splitlines()[0]
            l1 = [x.strip() for x in e1.split(",") if x.strip()]
            l2 = [x.strip() for x in e2.split(",") if x.strip()]
            for a, b in list(zip(l1, l2))[:3]:
                triples.append({"subject": a, "predicate": "related to", "object": b})
        elif "not connected:" in p:
            pairs_block = p.split("not connected:", 1)[1].split("Existing relationships")[0]
            for line in pairs_block.strip().splitlines()[:3]:
                if " and " in line:
                    a, b = line.split(" and ", 1)
                    triples.append(
                        {"subject": a.strip(), "predicate": "related to", "object": b.strip()}
                    )
        out.append(json.dumps(triples))
    return pd.Series(out, index=prompts.index)


# --- batched LLM execution + response parsing ------------------------------


def batched_llm_responses(
    prompts: DataFrame, llm_fn: LlmFn, prompt_col: str = "user_prompt"
) -> DataFrame:
    """Append a ``response`` column: one Arrow batch of prompts in, one batch
    of responses out (the batched replacement for the per-call HTTP loop)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in prompts.schema.fields
    ) + ", response string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["response"] = llm_fn(pdf[prompt_col]).astype(str)
            yield pdf

    return prompts.mapInPandas(run, out_schema)


def _parse_triple_arrays(responses: DataFrame) -> DataFrame:
    """JSON-array responses -> (subject, predicate, object) rows with the
    reference's validation (:525-535): key check, self-loop skip; predicate
    truncation applied as a column after."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.jsonrepair import extract_json_from_text

        for pdf in batches:
            rows = []
            for resp in pdf["response"]:
                arr = extract_json_from_text(resp)
                if isinstance(arr, list):
                    for t in arr:
                        if (
                            isinstance(t, dict)
                            and all(k in t for k in ("subject", "predicate", "object"))
                            and t["subject"] != t["object"]
                        ):
                            rows.append(
                                (str(t["subject"]), str(t["predicate"]), str(t["object"]))
                            )
            yield pd.DataFrame(rows, columns=["subject", "predicate", "object"])

    parsed = responses.mapInPandas(
        parse, "subject string, predicate string, object string"
    )
    return parsed.select(
        "subject",
        limit_predicate_col(F.col("predicate")).alias("predicate"),
        "object",
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("int").alias("chunk"),
        F.lit(None).cast("int").alias("t_idx"),
        F.lit(True).alias("inferred"),
        F.lit("llm_inference").alias("stage"),
    )


# --- stage 1: LLM entity resolution ----------------------------------------


def llm_entity_resolution(
    triples: DataFrame, llm_fn: LlmFn = fake_resolution_llm, cap: int = 100
) -> DataFrame:
    """Top-``cap``-entity resolution mapping (variant, standard), exact-case
    keys like the reference apply (:428-441: dict keyed on raw strings, plus
    standard -> itself)."""
    prompts = entity_resolution_prompt(triples, cap=cap)
    responses = batched_llm_responses(prompts, llm_fn)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.jsonrepair import extract_json_from_text

        for pdf in batches:
            rows = []
            for resp in pdf["response"]:
                m = extract_json_from_text(resp)
                if isinstance(m, dict):
                    for standard, variants in m.items():
                        if isinstance(variants, list):
                            for v in variants:
                                rows.append((str(v), str(standard)))
                            rows.append((str(standard), str(standard)))
            yield pd.DataFrame(rows, columns=["variant", "standard"])

    return responses.mapInPandas(parse, "variant string, standard string")


def apply_llm_resolution(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Exact-case variant replacement on subject and object (:437-441)."""
    sub = F.broadcast(mapping.select(F.col("variant").alias("s_v"), F.col("standard").alias("s_std")))
    obj = F.broadcast(mapping.select(F.col("variant").alias("o_v"), F.col("standard").alias("o_std")))
    return (
        triples.join(sub, triples["subject"] == sub["s_v"], "left")
        .join(obj, triples["object"] == obj["o_v"], "left")
        .withColumn("subject", F.coalesce("s_std", "subject"))
        .withColumn("object", F.coalesce("o_std", "object"))
        .drop("s_v", "s_std", "o_v", "o_std")
    )


# --- stages 3-4: community relationship inference --------------------------


def _grouped_context(
    std_triples: DataFrame, group_entities: DataFrame, ctx_cap: int
) -> DataFrame:
    """Per-group context triples: rows touching any of the group's entities,
    first ``ctx_cap`` per group in list (positional) order — the reference's
    context loops (:484-492, :597-609). group_entities: (gid, entity)."""
    hits = std_triples.join(
        F.broadcast(group_entities),
        (F.col("subject") == F.col("entity")) | (F.col("object") == F.col("entity")),
    ).select("gid", "subject", "predicate", "object", "url", "chunk", "t_idx").distinct()
    wctx = Window.partitionBy("gid").orderBy(
        F.col("url").asc_nulls_first(),
        F.col("chunk").asc_nulls_first(),
        F.col("t_idx").asc_nulls_first(),
        "subject", "predicate", "object",
    )
    return (
        hits.withColumn("rn", F.row_number().over(wctx))
        .filter(F.col("rn") <= ctx_cap)
        .select("gid", "subject", "predicate", "object")
    )


def _top_communities(comps: DataFrame, k: int) -> DataFrame:
    """k largest communities (entity_standardization.py:469,561), ties by
    min entity. comps: (entity, component_id) -> (community_rank, component_id)."""
    sizes = comps.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("entity").alias("rep")
    )
    w = Window.orderBy(F.desc("n"), F.asc("rep"))
    return (
        sizes.withColumn("community_rank", F.row_number().over(w))
        .filter(F.col("community_rank") <= k)
        .select("community_rank", "component_id")
    )


def llm_between_community_triples(
    std_triples: DataFrame,
    llm_fn: LlmFn = fake_inference_llm,
    top_k: int = 5,
    reps_per: int = 5,
    ctx_cap: int = 20,
) -> DataFrame:
    """≤ C(top_k,2) prompts over community pairs -> inferred triples
    (:451-543). Representatives: first ``reps_per`` entities per community
    (deterministic replacement for ``list(comm)[:5]``, :479-481)."""
    comps = components_for_triples(std_triples).localCheckpoint(eager=True)
    top = _top_communities(comps, top_k)
    reps = (
        comps.join(F.broadcast(top), "component_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("component_id").orderBy("entity")
            ),
        )
        .filter(F.col("rk") <= reps_per)
        .select("community_rank", "entity")
    )
    r1 = reps.select(F.col("community_rank").alias("c1"), F.col("entity").alias("e1"))
    r2 = reps.select(F.col("community_rank").alias("c2"), F.col("entity").alias("e2"))
    # pairwise communities i < j -> pair_id = i * 1000 + j
    pair_members = (
        r1.crossJoin(r2)
        .filter(F.col("c1") < F.col("c2"))
        .select(
            (F.col("c1") * 1000 + F.col("c2")).alias("pair_id"),
            F.col("e1"), F.col("e2"),
        )
    )
    rep_rows = pair_members.select(
        "pair_id", F.lit(1).alias("side"), F.col("e1").alias("entity")
    ).unionByName(
        pair_members.select("pair_id", F.lit(2).alias("side"), F.col("e2").alias("entity"))
    ).distinct()

    # per-pair context: triples touching any rep of the pair, capped in list
    # order (:484-492; the reference does not dedup context triples)
    ctx = _grouped_context(std_triples, rep_rows.select(
        F.col("pair_id").alias("gid"), "entity"
    ), ctx_cap).withColumnRenamed("gid", "pair_id")
    prompts = community_inference_prompts(rep_rows, ctx)
    return _parse_triple_arrays(batched_llm_responses(prompts, llm_fn))


def llm_within_community_triples(
    std_triples: DataFrame,
    llm_fn: LlmFn = fake_inference_llm,
    top_k: int = 3,
    pair_cap: int = 10,
    ctx_cap: int = 20,
) -> DataFrame:
    """≤ top_k prompts over within-community candidate pairs (:545-659)."""
    comps = components_for_triples(std_triples).localCheckpoint(eager=True)
    top = _top_communities(comps, top_k)
    comp_reps = comps.withColumn(
        "component_rep",
        F.min("entity").over(Window.partitionBy("component_id")),
    )
    scoped = comp_reps.join(F.broadcast(top), "component_id").select(
        "entity", "component_rep", "component_id"
    )
    pairs = candidate_pairs_in_community(
        std_triples, scoped.select("entity", "component_rep"), cap=pair_cap
    ).join(
        scoped.select(
            F.col("component_rep"), F.col("component_id")
        ).distinct(),
        "component_rep",
    ).select("component_id", "a", "b")

    ents = pairs.select(
        F.col("component_id").alias("gid"), F.col("a").alias("entity")
    ).unionByName(
        pairs.select(F.col("component_id").alias("gid"), F.col("b").alias("entity"))
    ).distinct()
    ctx = _grouped_context(std_triples, ents, ctx_cap).withColumnRenamed(
        "gid", "component_id"
    )
    prompts = within_community_prompts(pairs, ctx)
    return _parse_triple_arrays(batched_llm_responses(prompts, llm_fn))
