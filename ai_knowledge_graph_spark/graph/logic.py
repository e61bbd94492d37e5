"""Requirement-match scoring — the logic engine's join+window core (SURVEY
§2.3 J11; logic_engine.py:359-498).

The reference's TradeReasoner.evaluate loops models × requirements ×
detected concepts in Python. The relational shape:

  1. requirement sharing frequency (logic_engine.py:372-377): how many
     models list each (lowercased) requirement → specificity = 1/sharing
     (:424-428) — a groupBy + broadcast-back.
  2. satisfaction (:390-401): a requirement is met when any detected
     concept (underscores → spaces, or raw form) is a substring of the
     lowercased requirement text — a broadcast theta-join on `contains`.
     The detected set is signal-sized (tens of rows), so the join is a
     broadcast nested loop over it; the requirements fact side scales.
  3. blended score (:434-446): base = satisfied/total * 7, spec =
     Σ specificity(met) / Σ specificity(all) * 3, +1.5 perfect-fit bonus.
  4. ranking (:475-498): max score wins; go/no-go thresholding is a
     predicate on the score.

The 1-hop-neighbor fallback match (:403-419) is `expand_detected`:
a semi-join of the edge table against the detected set, unioned in before
scoring — same broadcast shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_detected(detected: DataFrame, edges: DataFrame) -> DataFrame:
    """Add 1-hop neighbors of detected concepts (logic_engine.py:403-419 uses
    get_neighbors both directions). Returns distinct `concept` rows."""
    d = detected.select("concept").distinct()
    out_n = edges.join(
        F.broadcast(d), edges["src"] == d["concept"], "inner"
    ).select(F.col("dst").alias("concept"))
    in_n = edges.join(
        F.broadcast(d), edges["dst"] == d["concept"], "inner"
    ).select(F.col("src").alias("concept"))
    return d.unionByName(out_n).unionByName(in_n).distinct()


def score_models(
    requirements: DataFrame,
    detected: DataFrame,
    perfect_fit_bonus: float = 1.5,
) -> DataFrame:
    """Score each model against detected concepts.

    Inputs:
      requirements(model STRING, requirement STRING) — one row per model
        requirement (the blueprint `required` lists, logic_engine.py:383-388).
      detected(concept STRING) — normalized detected pattern names.

    Output: (model, total_reqs, satisfied, weighted_spec, max_spec, score),
    score per logic_engine.py:434-446.
    """
    req = requirements.select(
        "model", F.lower(F.col("requirement")).alias("req_lower")
    )

    # The reference counts len(required) INCLUDING duplicate requirement
    # texts within one model (:388,:434) — carry the multiplicity through
    # the grouped pipeline instead of collapsing duplicates.
    req = req.groupBy("model", "req_lower").agg(F.count(F.lit(1)).alias("mult"))

    # Specificity pre-pass (:372-377): distinct models per requirement text.
    sharing = req.groupBy("req_lower").agg(
        F.countDistinct("model").alias("sharing")
    )
    req = req.join(F.broadcast(sharing), "req_lower").withColumn(
        "specificity", F.lit(1.0) / F.col("sharing")
    )

    # Substring satisfaction (:394-401): detected label (underscore→space)
    # or raw form contained in the lowercased requirement.
    det = detected.select(
        F.lower(F.col("concept")).alias("det_raw"),
        F.replace(F.lower(F.col("concept")), F.lit("_"), F.lit(" ")).alias(
            "det_label"
        ),
    ).distinct()
    matched = req.join(
        F.broadcast(det),
        F.col("req_lower").contains(F.col("det_label"))
        | F.col("req_lower").contains(F.col("det_raw")),
        "left",
    )
    per_req = matched.groupBy("model", "req_lower", "specificity", "mult").agg(
        F.max(F.col("det_raw").isNotNull()).alias("is_met")
    )

    scored = per_req.groupBy("model").agg(
        F.sum("mult").alias("total_reqs"),
        F.sum(F.when(F.col("is_met"), F.col("mult")).otherwise(F.lit(0))).alias(
            "satisfied"
        ),
        F.sum(
            F.when(F.col("is_met"), F.col("specificity") * F.col("mult")).otherwise(0.0)
        ).alias("weighted_spec"),
        F.sum(F.col("specificity") * F.col("mult")).alias("max_spec"),
    )
    # Blended score (:434-446).
    return scored.withColumn(
        "score",
        (F.col("satisfied") / F.col("total_reqs")) * 7.0
        + (F.col("weighted_spec") / F.greatest(F.col("max_spec"), F.lit(0.01))) * 3.0
        + F.when(
            F.col("satisfied") == F.col("total_reqs"), F.lit(perfect_fit_bonus)
        ).otherwise(0.0),
    )


def recommend(scored: DataFrame, min_score: float = 5.0) -> DataFrame:
    """Pick the max-score model (:475-483) with go/no-go thresholding
    (:485-494). Deterministic tie-break on model name."""
    return (
        scored.orderBy(F.desc("score"), F.asc("model"))
        .limit(1)
        .withColumn("go_no_go", F.col("score") >= F.lit(min_score))
    )
