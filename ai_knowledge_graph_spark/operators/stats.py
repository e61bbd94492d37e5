"""Distributed exact order statistics.

Spark ships ``approx_percentile`` (Greenwald-Khanna); a data-quality gate
over a 100 TB corpus often needs the EXACT percentile — "drop everything
above the true p99 length" must not wobble with sketch error between runs,
or the curation funnel's output becomes nondeterministic. Exact quantiles
are cheap when computed over the VALUE HISTOGRAM instead of the rows: for
the integer-ish columns quality pipelines rank on (lengths, token counts,
micro-unit scores), distinct values ≪ rows, so the sort space collapses by
orders of magnitude before any ordering happens.

Plan shape (100 TB bar):

1. one map-side-combined ``groupBy(value).count()`` — the only pass over
   the full data;
2. cumulative counts via range-repartition on the value + per-partition
   running sum + a ≤ shuffle-partitions-sized driver offset table (the
   ``distributed_rank`` pattern from operators/standardize.py — NO
   single-task global window anywhere);
3. each requested probability resolves to a target rank
   ``r = max(1, ceil(p·n))`` (inverse empirical CDF, left-continuous) and
   picks the unique histogram row with ``cum−cnt < r ≤ cum`` via a
   broadcast join of the |probs|-row target table.

The grouped variant windows within (group) over distinct values only —
per-reducer state is the group's distinct-value count, not its row count.

Reference repo has no statistics layer (beyond-reference, same family as
operators/textstats.py quality gates that would consume these cutoffs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
) -> DataFrame:
    """Exact global quantiles of ``value_col`` (nulls ignored).

    Output: ``p, value, rank`` — one row per probability; ``value`` is the
    smallest data value whose cumulative count reaches ``rank``
    = ``max(1, ceil(p·n))``. Deterministic, sketch-free.
    """
    spark = df.sparkSession
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        hist.repartitionByRange(n_part, F.col("value"))
        .withColumn("_pid", F.spark_partition_id())
        # pin placement: feeds the running sum AND the offset table
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lcum", F.sum("_cnt").over(w))
    # per-partition totals: metadata-sized (≤ shuffle partitions rows)
    totals = {
        r["_pid"]: r["_c"]
        for r in ranged.groupBy("_pid").agg(F.sum("_cnt").alias("_c")).collect()
    }
    running = 0
    offsets = []
    for pid in sorted(totals):
        offsets.append((pid, running))
        running += totals[pid]
    n = running
    odf = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    cum = local.join(F.broadcast(odf), "_pid").select(
        "value", "_cnt", (F.col("_lcum") + F.col("_off")).alias("_cum")
    )
    targets = spark.createDataFrame(
        [(float(p), max(1, math.ceil(p * n))) for p in probs], "p double, rank long"
    )
    return (
        cum.join(
            F.broadcast(targets),
            (F.col("_cum") >= F.col("rank"))
            & (F.col("_cum") - F.col("_cnt") < F.col("rank")),
        )
        .select("p", "value", "rank")
    )


def exact_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: list[float],
) -> DataFrame:
    """Exact per-group quantiles: ``*group_cols, p, value, rank``.

    Windows run within (group) over the DISTINCT-VALUE histogram, so a
    reducer holds a group's distinct values, not its rows — the histogram
    compression is what makes per-group exactness affordable.
    """
    gcols = [F.col(c) for c in group_cols]
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w))
    totals = hist.groupBy(*group_cols).agg(F.sum("_cnt").alias("_n"))
    pdf = df.sparkSession.createDataFrame(
        [(float(p),) for p in probs], "p double"
    )
    targets = totals.crossJoin(F.broadcast(pdf)).select(
        *group_cols,
        "p",
        F.greatest(F.ceil(F.col("p") * F.col("_n")).cast("long"), F.lit(1).cast("long")).alias(
            "rank"
        ),
    )
    cond = (F.col("_cum") >= F.col("rank")) & (
        F.col("_cum") - F.col("_cnt") < F.col("rank")
    )
    return (
        cum.join(targets, group_cols).filter(cond).select(*group_cols, "p", "value", "rank")
    )


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str): one-pass
    column profiler — the dataset-statistics primitive every ingest
    pipeline runs before trusting a new source (null density, key
    cardinality, range sanity). One aggregation per requested column
    (each a single map-side-combinable pass over its own projection),
    unioned into long format; min/max are computed on the NATIVE type
    (numeric order for numerics) and cast to string only for the
    uniform output schema.
    """
    out = None
    for c in columns:
        prof = df.select(F.col(c).alias("_v")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_v").isNull().cast("long")).alias("n_nulls"),
            F.countDistinct("_v").alias("n_distinct"),
            F.min("_v").cast("string").alias("min_str"),
            F.max("_v").cast("string").alias("max_str"),
        ).select(
            F.lit(c).alias("column"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.coalesce("n_nulls", F.lit(0)).cast("long").alias("n_nulls"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "min_str", "max_str",
        )
        out = prof if out is None else out.unionByName(prof)
    return out


# the 3-sigma test as ONE shared SQL expression (engine F.expr == oracle):
# |x - mean| > k*sigma  <=>  (n*x - sx)^2 > k^2 * (n*sxx - sx^2). Every
# moment is widened to DOUBLE BEFORE any product: at web scale (n ~ 1e6+
# rows of multi-KB values) sx*sx exceeds 2^63 and int64 arithmetic would
# wrap (or throw under ANSI mode). Both engines IEEE-evaluate the
# identical expression tree, so the comparison stays deterministic.
_OUTLIER_SQL = (
    "(CAST(n AS DOUBLE) * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE))"
    " * (CAST(n AS DOUBLE) * CAST(x AS DOUBLE) - CAST(sx AS DOUBLE))"
    " > {k2} * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)


def length_outliers(
    df: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    k_sigma: int = 3,
) -> DataFrame:
    """(group, doc_id, value): rows whose ``value_col`` sits more than
    ``k_sigma`` population standard deviations from their group's mean —
    the per-source length-anomaly gate (a 2 MB "document" in a tweet
    source is a scraper bug, not data). The z-test is evaluated on exact
    int64 moments via the algebraic identity above, so there is no
    mean/stddev rounding anywhere and results are hash-reproducible.

    Shape: one map-side-combinable moment agg per group + a broadcast
    join back (groups are few); a group with n < 2 or zero variance
    flags nothing (rhs >= lhs = 0 edge handled by the strict >).
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        F.col(value_col).cast("long").alias("x"),
    )
    mom = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return (
        base.join(F.broadcast(mom), "grp")
        .filter(F.expr(_OUTLIER_SQL.format(k2=k_sigma * k_sigma)))
        .select(
            F.col("grp").alias(group_col),
            "doc_id",
            F.col("x").alias(value_col),
        )
    )
