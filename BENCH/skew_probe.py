"""Skew-adversarial robustness probe (round-3 verdict ask #5).

The salting and hot-token guards are pinned by synthetic-fixture pytests;
this probe MEASURES them at bench scale under the two adversaries the
100 TB story cares about:

* **hot blocking token** — 10% of all entities share one blocking word, so
  the lexical-inference shared-word self-join has one block of size H
  (H^2/2 candidate pairs). Arms: ``max_block_size=0`` (guard off — exact
  reference semantics) vs ``max_block_size=64`` (guard on — the hot token
  is dropped from the blocking key space).
* **giant near-dup cluster** — one page duplicated into 10% of the corpus;
  the verified-pair star makes one node's key carry the whole cluster in
  the components label lookup. Arms: ``hot_threshold`` huge (salting never
  triggers) vs ``hot_threshold=5000`` (hot keys scattered over
  ``num_salts=32`` reducers).

Per arm, the Spark REST API yields the heaviest new stage's max-task
duration and its **reducer share** (max task shuffle-read bytes / stage
total) — the quantity the salting bound ~|key|/num_salts is about.

Usage: PYTHONHASHSEED=0 python BENCH/skew_probe.py [cores]
Prints one JSON line per arm + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ENTITIES = int(os.environ.get("SKEW_ENTITIES", "20000"))
N_STAR = int(os.environ.get("SKEW_STAR", "100000"))


def _stage_ids(spark) -> set[int]:
    url = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    ids = set()
    for status in ("complete", "active", "failed"):
        data = json.load(
            urllib.request.urlopen(
                f"{url}/api/v1/applications/{appid}/stages?status={status}"
            )
        )
        ids |= {(s["stageId"], s["attemptId"], s["shuffleReadBytes"]) for s in data}
    return ids


def _probe_new_stages(spark, before: set) -> dict:
    """Max-task stats of the heaviest (by shuffle read) stage not in
    ``before``."""
    url = spark.sparkContext.uiWebUrl
    appid = spark.sparkContext.applicationId
    new = [s for s in _stage_ids(spark) - before if s[2] > 0]
    if not new:
        return {"stage": None}
    sid, att, total_read = max(new, key=lambda s: s[2])
    q = json.load(
        urllib.request.urlopen(
            f"{url}/api/v1/applications/{appid}/stages/{sid}/{att}/"
            "taskSummary?quantiles=0.5,1.0"
        )
    )
    max_read = q["shuffleReadMetrics"]["readBytes"][-1]
    return {
        "stage": sid,
        "stage_shuffle_read_mb": round(total_read / 1e6, 1),
        "task_run_s_p50": round(q["executorRunTime"][0] / 1e3, 2),
        "task_run_s_max": round(q["executorRunTime"][-1] / 1e3, 2),
        "reducer_share": round(max_read / total_read, 4) if total_read else None,
    }


def main(cores: int) -> None:
    os.environ["SPARK_GRAFT_CODEGEN"] = "on"
    os.environ["SPARK_GRAFT_UI"] = "on"
    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.operators.components import (
        components_from_pairs,
    )
    from ai_knowledge_graph_spark.operators.inference import lexical_inference
    from ai_knowledge_graph_spark.session import get_spark

    spark = get_spark(f"skew{cores}", master=f"local[{cores}]")
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit("UI off — SPARK_GRAFT_UI had no effect")

    # --- fixture A: entity vocabulary with one hot blocking word --------
    # first words are hex-spread (16 entities per 4-char prefix) so the
    # containment 4-gram blocking stays cold and the probe isolates the
    # ONE hot word-blocking key it is about
    n_hot = N_ENTITIES // 10
    hexw = F.concat(F.lpad(F.conv(F.col("id").cast("string"), 10, 16), 5, "0"), F.lit("v"))
    ents = spark.range(N_ENTITIES).select(
        F.when(F.col("id") < n_hot, F.concat(hexw, F.lit(" corp")))
        .otherwise(F.concat(hexw, F.lit(" uniq"), F.col("id").cast("string")))
        .alias("entity"),
        F.col("id"),
    )
    triples = (
        ents.alias("l")
        .join(ents.alias("r"), F.col("l.id") + 1 == F.col("r.id"))
        .select(
            F.col("l.entity").alias("subject"),
            F.lit("linked to").alias("predicate"),
            F.col("r.entity").alias("object"),
        )
        .localCheckpoint(eager=True)
    )

    results = {}
    for arm, cap in (("lexical_guard_off", 0), ("lexical_guard_on", 64)):
        before = _stage_ids(spark)
        t = time.time()
        n = lexical_inference(
            triples, max_block_size=cap, pair_order="lexicographic"
        ).count()
        wall = round(time.time() - t, 2)
        results[arm] = {"wall_s": wall, "rows": n, **_probe_new_stages(spark, before)}
        print(json.dumps({arm: results[arm]}), flush=True)

    # --- fixture B: giant near-dup cluster star -------------------------
    star = spark.range(1, N_STAR).select(
        F.lit(0).cast("long").alias("a"), F.col("id").alias("b")
    )
    # cold background: disjoint 2-node islands (a long chain would measure
    # contraction DEPTH — log n rounds — not skew)
    islands = (
        spark.range(N_STAR, 2 * N_STAR)
        .filter(F.col("id") % 2 == 0)
        .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    )
    pairs = star.unionByName(islands).localCheckpoint(eager=True)

    for arm, thresh in (
        ("components_salting_off", 1 << 60),
        ("components_salting_on", 5000),
    ):
        before = _stage_ids(spark)
        t = time.time()
        n = components_from_pairs(pairs, hot_threshold=thresh, num_salts=32).count()
        wall = round(time.time() - t, 2)
        results[arm] = {"wall_s": wall, "rows": n, **_probe_new_stages(spark, before)}
        print(json.dumps({arm: results[arm]}), flush=True)

    print(
        json.dumps(
            {
                "metric": "skew_probe",
                "cores": cores,
                "entities": N_ENTITIES,
                "hot_token_df": n_hot,
                "star_size": N_STAR,
                "arms": results,
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
