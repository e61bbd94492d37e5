"""Connected components vs a union-find oracle."""

from __future__ import annotations

from ai_knowledge_graph_spark.operators.components import (
    components_for_triples,
    connected_components,
)
from ai_knowledge_graph_spark.operators.standardize import standardize_triples
from ai_knowledge_graph_spark.oracle.refimpl import connected_component_sets


def _partition_from_df(df):
    groups = {}
    for r in df.collect():
        groups.setdefault(r["component_id"], set()).add(r["entity"])
    return {frozenset(g) for g in groups.values()}


def test_components_match_union_find(spark, std_triples):
    std = std_triples
    engine = _partition_from_df(components_for_triples(std))
    rows = [r.asDict() for r in std.collect()]
    oracle = {frozenset(g) for g in connected_component_sets(rows)}
    assert engine == oracle


def test_components_chain_and_islands(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("p", "q"), ("q", "p")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    comps = _partition_from_df(
        connected_components(df).withColumnRenamed("node", "node_id")
    )
    assert comps == {
        frozenset({"a", "b", "c", "d"}), frozenset({"x", "y"}), frozenset({"p", "q"})
    }


def test_components_long_path_converges(spark):
    # 200-node chain: pointer jumping must converge well under the iteration cap
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(200)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, max_iterations=30)
    assert out.select("component_id").distinct().count() == 1


def _star_edges(n_leaves=3000, islands=5):
    """One giant star (hub + n_leaves) ≫ a few 2-node islands."""
    edges = [("hub", f"leaf{i:05d}") for i in range(n_leaves)]
    edges += [(f"isl{i}a", f"isl{i}b") for i in range(islands)]
    return edges


def test_components_salted_path_matches_oracle(spark):
    """Giant-component fixture with salting FORCED ON (tiny hot_threshold):
    the salted label/contraction joins must produce exactly the unsalted
    partition."""
    from ai_knowledge_graph_spark.oracle.refimpl import connected_component_sets

    edges = _star_edges()
    df = spark.createDataFrame(edges, ["src", "dst"])
    salted = _partition_from_df(
        connected_components(df, num_salts=8, hot_threshold=50)
    )
    rows = [{"subject": s, "object": o} for s, o in edges]
    oracle = {frozenset(g) for g in connected_component_sets(rows)}
    assert salted == oracle
    # and identical to the effectively-unsalted run
    unsalted = _partition_from_df(
        connected_components(df, hot_threshold=10_000_000)
    )
    assert salted == unsalted


def test_components_salting_detects_and_spreads_hot_keys(spark):
    """The giant component's key IS detected as hot, and the salted join
    spreads its rows over many reducers instead of one."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.operators.components import (
        _hot_keys,
        _salted_left_lookup,
        node_id,
    )

    n = 4000
    # assign-shaped skew: every row carries the same comp key
    assign = spark.createDataFrame(
        [(f"leaf{i:05d}",) for i in range(n)], ["name"]
    ).select(node_id(F.col("name")).alias("node"), F.lit(7).cast("long").alias("comp"))
    label = spark.createDataFrame([(7, 1)], "lnode long, label long")

    hot = _hot_keys(assign, "comp", 100)
    assert hot.count() == 1  # the giant key is detected

    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = _salted_left_lookup(
            assign,
            key="comp",
            salt_src="node",
            labels=label,
            lkey="lnode",
            lval="label",
            out_cols=["node", F.coalesce("label", "comp").alias("comp")],
            num_salts=8,
            hot_threshold=100,
        )
        per_part = (
            out.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    assert sum(r["count"] for r in per_part) == n
    biggest = max(r["count"] for r in per_part)
    # unsalted, all n rows of key 7 land on ONE reducer; salted across 8
    # buckets no reducer should see much more than n/8
    assert biggest < n / 2, f"hot key not spread: max partition {biggest}/{n}"
    assert len(per_part) >= 4  # several reducers actually engaged
    # every row still got its label applied
    assert out.filter(F.col("comp") != 1).count() == 0


def test_components_128bit_ids(spark):
    """id_bits=128: same partition as 64-bit, struct ids with two
    independently-seeded halves."""
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    p64 = _partition_from_df(connected_components(df))
    p128 = _partition_from_df(connected_components(df, id_bits=128))
    assert p64 == p128
    out = connected_components(df, id_bits=128)
    row = out.first()
    assert set(row["node"].asDict()) == {"h", "l"}
    # the two halves are independently seeded (h != l for real strings)
    assert all(r["node"]["h"] != r["node"]["l"] for r in out.collect())


def test_salted_reducer_share_is_bounded(spark):
    """Quantitative skew bound (round 4): with num_salts=S, no reducer's
    share of one hot key's rows exceeds ~1/S (2.5x binomial slack at
    n=20000). Unit-level twin of BENCH/skew_probe.py's REST-measured
    reducer share at bench scale."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_spark.operators.components import (
        _salted_left_lookup,
        node_id,
    )

    n, num_salts = 20000, 16
    assign = (
        spark.range(n)
        .select(F.concat(F.lit("leaf"), F.col("id")).alias("name"))
        .select(node_id(F.col("name")).alias("node"), F.lit(7).cast("long").alias("comp"))
    )
    label = spark.createDataFrame([(7, 1)], "lnode long, label long")
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    parts_was = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # partitions >> num_salts so distinct salts land on distinct reducers
    # (the probe's operating regime: reducers >= salts); with too few
    # partitions the measurement conflates salt scatter with partition
    # collisions
    spark.conf.set("spark.sql.shuffle.partitions", "128")
    try:
        out = _salted_left_lookup(
            assign,
            key="comp",
            salt_src="node",
            labels=label,
            lkey="lnode",
            lval="label",
            out_cols=["node", F.coalesce("label", "comp").alias("comp")],
            num_salts=num_salts,
            hot_threshold=100,
        )
        per_part = (
            out.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        spark.conf.set("spark.sql.shuffle.partitions", parts_was)
    assert sum(r["count"] for r in per_part) == n
    biggest = max(r["count"] for r in per_part)
    bound = 2.5 * n / num_salts
    assert biggest <= bound, (
        f"reducer share {biggest / n:.3f} exceeds ~{2.5 / num_salts:.3f} "
        f"({biggest}/{n} rows on one reducer)"
    )
