"""End-to-end KG-construction pipeline: pages -> triples -> graph tables.

Stage layout mirrors the reference lifecycle (main.py:90-218; SURVEY.md §3.1)
with explicit repartition barriers between extract, canonicalize and
materialize (north_rule) and a parquet checkpoint + lineage table per stage:

    pages --(repartition by url)--> extract   -> triples_raw
          --(repartition by subject)--> standardize -> triples_std
          -->                        infer     -> triples_final
          --(repartition by entity hash)--> materialize -> nodes / edges
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import load_config
from .lineage import checkpoint_stage, stage_is_complete
from .operators.extraction import pages_to_raw_triples
from .operators.inference import infer_relationships
from .operators.standardize import standardize_triples


def resolve_order(mode: str, triples: DataFrame, threshold: int = 200_000) -> str:
    """Resolve an 'auto' ordering mode by vocabulary size.

    Below ``threshold`` distinct (lowered) entities the exact
    reference-replay order is cheap (its set-order replay stages are
    single-task but only vocabulary-sized); above it the web-scale
    'lexicographic' order runs fully distributed with no one-task stage.
    One approx_count_distinct pass over the (checkpointed) input.
    """
    if mode != "auto":
        return mode
    n_vocab = (
        triples.select(
            F.explode(F.array(F.lower("subject"), F.lower("object"))).alias("e")
        )
        .agg(F.approx_count_distinct("e").alias("n"))
        .first()["n"]
    )
    return "reference" if n_vocab <= threshold else "lexicographic"


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    config: dict[str, Any] | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run phases 1-3 and return the final triples DataFrame.

    ``checkpoint_dir`` enables per-stage committed outputs: a re-run skips
    every committed stage (idempotent resume). Config keys mirror the
    reference's config.toml.
    """
    cfg = config or load_config()
    chunking = cfg.get("chunking", {})
    engine = cfg.get("engine", {})
    stage_parts = int(engine.get("stage_partitions", 32))
    ckpt = checkpoint_dir or engine.get("checkpoint_dir")

    def _stage(stage: str, build) -> DataFrame:
        """Resume-aware stage: a committed stage is read back without even
        *constructing* its plan (operators contain eager sub-materializations
        that would otherwise recompute on resume). Without a checkpoint dir,
        an eager local checkpoint still cuts the logical plan so multi-branch
        downstream stages don't re-derive the whole upstream DAG per branch.
        """
        if ckpt is not None:
            if stage_is_complete(ckpt, stage):
                return spark.read.parquet(f"{ckpt}/{stage}")
            return checkpoint_stage(spark, build(), ckpt, stage)
        return build().localCheckpoint(eager=True)

    def _resolve_order(mode: str, df: DataFrame) -> str:
        return resolve_order(
            mode, df, int(engine.get("auto_order_threshold", 200_000))
        )

    raw = _stage(
        "triples_raw",
        lambda: pages_to_raw_triples(
            pages,
            chunk_size=int(chunking.get("chunk_size", 500)),
            overlap=int(chunking.get("overlap", 50)),
            lang_filter=engine.get("lang_filter", "en"),
            stage_partitions=stage_parts,
        ),
    )

    result = raw
    std_cfg = cfg.get("standardization", {})
    if std_cfg.get("enabled", True):
        # Canonicalize-stage boundary: co-locate rows by subject before the
        # mapping joins so the big side shuffles once.
        prev = result

        def _build_std() -> DataFrame:
            std = standardize_triples(
                prev.repartition(stage_parts, "subject"),
                # "reference" replays the reference's second-pass tie order
                # exactly (parity); "lexicographic" is the web-scale order;
                # the "auto" default switches on vocabulary size so the
                # shipped pipeline never runs a one-task stage at scale.
                tie_order=_resolve_order(std_cfg.get("tie_order", "auto"), prev),
            )
            if std_cfg.get("use_llm_for_entities", False):
                # Step 7 (entity_standardization.py:171-173,377-449), batched:
                # prompt assembly + llm_fn + parse all run executor-side.
                from .operators.llm_stages import (
                    apply_llm_resolution,
                    llm_entity_resolution,
                )

                llm_fn = std_cfg.get("entity_llm_fn")
                if llm_fn is None:
                    # The deterministic test fakes must be injected explicitly
                    # (entity_llm_fn=fake_resolution_llm); silently running
                    # them on a real corpus would corrupt entity names.
                    raise ValueError(
                        "standardization.use_llm_for_entities is enabled but no "
                        "entity_llm_fn callable was injected into the config"
                    )
                mapping = llm_entity_resolution(std, llm_fn).localCheckpoint(
                    eager=True
                )
                std = apply_llm_resolution(std, mapping).filter(
                    F.col("subject") != F.col("object")  # :175-178
                )
            return std

        result = _stage("triples_std", _build_std)

    inf_cfg = cfg.get("inference", {})
    if inf_cfg.get("enabled", True):
        prev2 = result

        def _build_final() -> DataFrame:
            extra = None
            if inf_cfg.get("use_llm_for_inference", False):
                # Steps 3-4 (:232-242), batched community inference; the
                # triples join the same union+dedup as rule-based inference.
                from .operators.llm_stages import (
                    llm_between_community_triples,
                    llm_within_community_triples,
                )

                llm_fn = inf_cfg.get("inference_llm_fn")
                if llm_fn is None:
                    raise ValueError(
                        "inference.use_llm_for_inference is enabled but no "
                        "inference_llm_fn callable was injected into the config"
                    )
                extra = llm_between_community_triples(prev2, llm_fn).unionByName(
                    llm_within_community_triples(prev2, llm_fn)
                )
            return infer_relationships(
                prev2,
                apply_transitive=inf_cfg.get("apply_transitive", True),
                max_block_size=int(engine.get("max_block_size", 0)),
                # "reference" replays the reference's pair iteration order for
                # exact parity (single-task set-order replay); "lexicographic"
                # is fully distributed (only the direction of symmetric
                # `related to` edges differs); "auto" switches on vocabulary.
                pair_order=_resolve_order(inf_cfg.get("pair_order", "auto"), prev2),
                extra_inferred=extra,
            )

        result = _stage("triples_final", _build_final)

    return result


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """Adapt the driver-provided ``documents`` table to the pages shape.

    Deterministic: url derives from doc_id; html wraps text. Lets every
    pipeline query run off /root/testdata without synthesizing data.
    """
    return documents.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
