"""Training-data generation + JSONL export (SURVEY §2.1 K5).

Distributed counterpart of training_generator.py: relationship Q&A from
graph edges (:172-230 — relation-keyed instruction/answer templates), JSONL
export in alpaca/chatml/sharegpt shapes (:1038-1092), and a seeded
train/test split (:1099-1127, reference shuffles with `self.rng` then
slices; here `randomSplit(seed)`).

The reference loops `self.store.G.edges(data=True)` in one process and
cycles templates per relation; the rebuild broadcast-joins a template dim
table on `relation` and picks the template deterministically from the edge
content (`(length(src)+length(dst)) % n_templates`) so re-runs are
idempotent — encounter-order template cycling is not reproducible under
partitioning.

Label rendering matches the reference's `_label` (underscores → spaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SYSTEM_PROMPT = "You are an expert assistant answering questions about a knowledge graph."

# relation → list of (instruction_template, output_template); {src}/{tgt} are
# space-form labels. Subset of training_generator.py:183-230 plus a generic
# fallback (the reference's expanded map covers cleaned-graph predicates).
RELATION_TEMPLATES: dict[str, list[tuple[str, str]]] = {
    "requires": [
        ("What does {src} require?", "{src} requires {tgt}."),
        ("What are the prerequisites for {src}?", "A key prerequisite for {src} is {tgt}."),
    ],
    "enhances": [
        ("What enhances {tgt}?", "{src} enhances {tgt}."),
        ("How can {tgt} be strengthened?", "{tgt} is strengthened when {src} is present."),
    ],
    "invalidates": [
        ("What invalidates {tgt}?", "{src} invalidates {tgt}."),
    ],
    "precedes": [
        ("What must happen before {tgt}?", "{src} must precede {tgt} in the sequence."),
        ("What comes after {src} in the sequence?", "After {src}, the next step is {tgt}."),
    ],
    "is_type_of": [
        ("What type of concept is {src}?", "{src} is a type of {tgt}."),
    ],
    "belongs_to": [
        ("What category does {src} belong to?", "{src} belongs to the {tgt} category."),
    ],
    # Cleaned-graph predicates (F9 merge-map targets; training_generator.py:217-240)
    "is_a": [
        ("What is {src}?", "{src} is a {tgt}."),
        ("How would you classify {src}?", "{src} is classified as a {tgt}."),
    ],
    "has_component": [
        ("What are the components of {src}?", "{src} has {tgt} as a component."),
        ("What makes up {src}?", "{tgt} is a component of {src}."),
    ],
    "uses": [
        ("What does {src} use?", "{src} uses {tgt}."),
    ],
    "contains": [
        ("What does {src} contain?", "{src} contains {tgt}."),
    ],
    "related_to": [
        ("What is {src} related to?", "{src} is related to {tgt}."),
    ],
}
GENERIC_TEMPLATES = [
    ("What is the relationship between {src} and {tgt}?", "{src} {rel} {tgt}."),
    ("How does {src} relate to {tgt}?", "{src} {rel} {tgt}."),
]


def relationship_qa(edges: DataFrame) -> DataFrame:
    """Edges (src, dst, relation) → (instruction, output, category) examples
    (training_generator.generate_relationship_qa, :172-230)."""
    spark = edges.sparkSession
    rows = []
    for rel, templates in RELATION_TEMPLATES.items():
        for idx, (instr, out) in enumerate(templates):
            rows.append((rel, idx, len(templates), instr, out))
    tdf = spark.createDataFrame(
        rows, "relation string, t_idx int, n_templates int, instr string, answer string"
    )

    src_label = F.replace(F.col("src"), F.lit("_"), F.lit(" "))
    dst_label = F.replace(F.col("dst"), F.lit("_"), F.lit(" "))
    rel_label = F.replace(F.col("relation"), F.lit("_"), F.lit(" "))

    def render(template_col):
        rendered = F.replace(template_col, F.lit("{src}"), src_label)
        rendered = F.replace(rendered, F.lit("{tgt}"), dst_label)
        return F.replace(rendered, F.lit("{rel}"), rel_label)

    known = (
        edges.join(F.broadcast(tdf), "relation")
        .filter(
            F.pmod(F.length("src") + F.length("dst"), F.col("n_templates"))
            == F.col("t_idx")
        )
        .select(
            render(F.col("instr")).alias("instruction"),
            render(F.col("answer")).alias("output"),
            F.lit("relationship_qa").alias("category"),
        )
    )

    gen_rows = [
        (idx, len(GENERIC_TEMPLATES), instr, out)
        for idx, (instr, out) in enumerate(GENERIC_TEMPLATES)
    ]
    gdf = spark.createDataFrame(
        gen_rows, "t_idx int, n_templates int, instr string, answer string"
    )
    generic = (
        edges.join(
            F.broadcast(tdf.select("relation").distinct()), "relation", "left_anti"
        )
        .crossJoin(F.broadcast(gdf))
        .filter(
            F.pmod(F.length("src") + F.length("dst"), F.col("n_templates"))
            == F.col("t_idx")
        )
        .select(
            render(F.col("instr")).alias("instruction"),
            render(F.col("answer")).alias("output"),
            F.lit("relationship_qa_generic").alias("category"),
        )
    )
    return known.unionByName(generic)


# ── v3 QA families (training_generator_v3.py) ─────────────────────────────
# The reference v3 generator (3,809 LoC) renders domain prose from YAML
# ontology/concept-rels files plus trade journals. The graph-derivable
# families are rebuilt here as DataFrame ops over the engine's own
# nodes/edges tables: definition QA (gen_core_concepts :173-510), multi-hop
# chain QA (gen_causal_chains :960-1087 — the k-hop path-join exemplar),
# cross-reference QA (gen_concept_cross_refs :2227-2455), category
# balancing + the MIN_RESPONSE_LEN filter (generate_all :120-172). The
# trade-scenario / session / chart families depend on external journals and
# hand-written domain templates — out of engine scope (see SURVEY §2.1 K5).

from pyspark.sql import Window


def _label(col):
    return F.replace(col, F.lit("_"), F.lit(" "))


def definition_qa(nodes: DataFrame) -> DataFrame:
    """Definition QA from nodes carrying a definition
    (training_generator_v3.gen_core_concepts :173-233: 'What is X?' +
    definition-grounded answer)."""
    return nodes.filter(
        F.col("definition").isNotNull() & (F.length("definition") > 0)
    ).select(
        F.format_string("What is %s?", _label(F.col("entity"))).alias("instruction"),
        F.format_string(
            "%s: %s", _label(F.col("entity")), F.col("definition")
        ).alias("output"),
        F.lit("definition_qa").alias("category"),
    )


def _capped_edges(edges: DataFrame, max_fanout: int) -> DataFrame:
    """Deterministic per-source fanout cap — a hub node would otherwise make
    the path join quadratic in its degree (the 100 TB guard; the reference
    walks hand-curated chains so it never hits this)."""
    if max_fanout <= 0:
        return edges
    w = Window.partitionBy("src").orderBy("dst", "relation")
    return (
        edges.withColumn("_fr", F.row_number().over(w))
        .filter(F.col("_fr") <= max_fanout)
        .drop("_fr")
    )


def multi_hop_qa(edges: DataFrame, max_fanout: int = 8) -> DataFrame:
    """2-hop chain QA (gen_causal_chains :960-1087): for each path
    a -r1-> b -r2-> c (a ≠ c), a walkthrough example and a what's-next
    example. The path set is a self equi-join on the middle node — the same
    shape as k-hop traversal (J8) — with a per-source fanout cap so hubs
    don't explode the pair set."""
    e = _capped_edges(edges.select("src", "relation", "dst").distinct(), max_fanout)
    lhs = e.select(
        F.col("src").alias("a"), F.col("relation").alias("r1"), F.col("dst").alias("b")
    )
    rhs = e.select(
        F.col("src").alias("b"), F.col("relation").alias("r2"), F.col("dst").alias("c")
    )
    paths = lhs.join(rhs, "b").filter(F.col("a") != F.col("c"))
    la, lb, lc = _label(F.col("a")), _label(F.col("b")), _label(F.col("c"))
    lr1, lr2 = _label(F.col("r1")), _label(F.col("r2"))
    walkthrough = paths.select(
        F.format_string("Walk me through the chain from %s to %s.", la, lc).alias(
            "instruction"
        ),
        F.format_string(
            "The chain runs in two steps. Step 1: %s %s %s. Step 2: %s %s %s. "
            "Each step must complete before the next — without %s the link "
            "from %s to %s does not hold.",
            la, lr1, lb, lb, lr2, lc, lb, la, lc,
        ).alias("output"),
        F.lit("multi_hop_walkthrough").alias("category"),
    )
    next_step = paths.select(
        F.format_string("I have confirmed %s %s %s. What comes next?", la, lr1, lb).alias(
            "instruction"
        ),
        F.format_string(
            "Good — that is the first link. Next: %s %s %s. Only once both "
            "links hold does the full chain from %s to %s apply.",
            lb, lr2, lc, la, lc,
        ).alias("output"),
        F.lit("multi_hop_next_step").alias("category"),
    )
    return walkthrough.unionByName(next_step)


def cross_ref_qa(edges: DataFrame, max_per_anchor: int = 8) -> DataFrame:
    """Cross-reference QA (gen_concept_cross_refs :2227-2455): two concepts
    sharing a neighbor get a compare/contrast example. Blocked on the shared
    neighbor (equi-join, never a cross product) with a per-anchor cap on both
    sides so a hub anchor stays bounded."""
    e = edges.select("src", "relation", "dst").distinct()
    w = Window.partitionBy("dst").orderBy("src", "relation")
    capped = (
        e.withColumn("_ar", F.row_number().over(w))
        .filter(F.col("_ar") <= max_per_anchor)
        .drop("_ar")
    )
    lhs = capped.select(
        F.col("src").alias("a"), F.col("relation").alias("r1"), F.col("dst").alias("x")
    )
    rhs = capped.select(
        F.col("src").alias("b"), F.col("relation").alias("r2"), F.col("dst").alias("x")
    )
    pairs = lhs.join(rhs, "x").filter(F.col("a") < F.col("b"))
    la, lb, lx = _label(F.col("a")), _label(F.col("b")), _label(F.col("x"))
    return pairs.select(
        F.format_string("How do %s and %s both relate to %s?", la, lb, lx).alias(
            "instruction"
        ),
        F.format_string(
            "Both connect to %s, from different angles: %s %s %s, while %s %s %s. "
            "Understanding both links clarifies how %s sits between them.",
            lx, la, _label(F.col("r1")), lx, lb, _label(F.col("r2")), lx, lx,
        ).alias("output"),
        F.lit("cross_ref_qa").alias("category"),
    )


def min_length_filter(examples: DataFrame, min_chars: int = 150) -> DataFrame:
    """Reject short answers (generate_all :166-171, MIN_RESPONSE_LEN)."""
    return examples.filter(F.length("output") >= min_chars)


def balance_categories(examples: DataFrame, cap: int, seed: int = 42) -> DataFrame:
    """Cap examples per category. The reference samples with its seeded rng
    (:120-172 family budgets); the distributed equivalent ranks by a seeded
    hash of the example content — deterministic under any partitioning and
    portable to SQL (md5-hex-prefix, same trick as the minhash family)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", "instruction", "output", F.lit(str(seed)))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("category").orderBy(h, "instruction")
    return (
        examples.withColumn("_br", F.row_number().over(w))
        .filter(F.col("_br") <= cap)
        .drop("_br")
    )


def to_alpaca(examples: DataFrame) -> DataFrame:
    """(instruction, output) → alpaca records (training_generator.py:1062-1067)."""
    return examples.select(
        "instruction", F.lit("").alias("input"), "output"
    )


def to_chatml(examples: DataFrame) -> DataFrame:
    """→ {messages: [...]} (training_generator.py:1068-1076)."""
    return examples.select(
        F.array(
            F.struct(F.lit("system").alias("role"), F.lit(SYSTEM_PROMPT).alias("content")),
            F.struct(F.lit("user").alias("role"), F.col("instruction").alias("content")),
            F.struct(F.lit("assistant").alias("role"), F.col("output").alias("content")),
        ).alias("messages")
    )


def to_sharegpt(examples: DataFrame) -> DataFrame:
    """→ {conversations: [...]} (training_generator.py:1077-1084)."""
    return examples.select(
        F.array(
            F.struct(F.lit("system").alias("from"), F.lit(SYSTEM_PROMPT).alias("value")),
            F.struct(F.lit("human").alias("from"), F.col("instruction").alias("value")),
            F.struct(F.lit("gpt").alias("from"), F.col("output").alias("value")),
        ).alias("conversations")
    )


_FORMATS = {"alpaca": to_alpaca, "chatml": to_chatml, "sharegpt": to_sharegpt}


def export_jsonl(examples: DataFrame, path: str, fmt: str = "chatml") -> None:
    """K5 sink: JSONL export (training_generator.export, :1038-1092)."""
    if fmt not in _FORMATS:
        raise ValueError(f"Unknown format: {fmt}")
    _FORMATS[fmt](examples).write.mode("overwrite").json(path)


def train_test_split(
    examples: DataFrame, test_ratio: float = 0.1, seed: int = 42
) -> tuple[DataFrame, DataFrame]:
    """Seeded split (export_train_test_split, :1099-1127)."""
    train, test = examples.randomSplit([1.0 - test_ratio, test_ratio], seed=seed)
    return train, test


def training_stats(examples: DataFrame) -> DataFrame:
    """A9 (audit_quality.py:74-96): per-category example counts + answer
    length distribution (mean / median / max in words)."""
    out_words = F.size(F.split(F.trim(F.col("output")), r"\s+"))
    return (
        examples.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_examples"),
            F.round(F.avg(out_words), 2).alias("avg_answer_words"),
            F.percentile_approx(out_words, 0.5).alias("median_answer_words"),
            F.max(out_words).alias("max_answer_words"),
        )
        .orderBy("category")
    )
