"""Corpus collection + content-level dedup (SURVEY §2.1 S5).

Distributed rebuild of scripts/prepare_data.py:10-177: walk source dirs,
drop noise paths (skip-dir / skip-filename / substring blocklists,
prepare_data.py:11-58,62-89), drop near-empty files (<50 chars stripped,
:156-159), and dedup by sha256 of whitespace-normalized content (:124-128,
:161-166). The reference is a sequential driver loop with a ``seen_hashes``
set; here path filtering is a pushed-down predicate on the file listing and
content dedup is a hash-groupBy — first-path-wins made deterministic with a
min-by-path window instead of encounter order.

At 100 TB the file listing itself is distributed (``spark.read`` handles
manifest parallelism); the dedup shuffle is on a 64-hex-char key with
near-uniform distribution, so no skew handling is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# prepare_data.py:11-30 — path components skipped entirely.
SKIP_DIRS = [
    "venv", ".venv", "env", ".env", "node_modules", "site-packages",
    "dist-info", "__pycache__", ".git", ".github", ".tox", ".mypy_cache",
    ".pytest_cache", "screenshots", ".agent",
]

# prepare_data.py:32-49 — exact basenames skipped (case-insensitive).
SKIP_FILENAMES = [
    "license.md", "licence.md", "authors.md", "changelog.md", "changes.md",
    "contributing.md", "code_of_conduct.md", "foundry.md", "package.json",
    "package-lock.json", "install.json", "metadata.json",
    "pyrightconfig.json", "tsconfig.json", "setuptools.schema.json",
    "distutils.schema.json", "_validators.json",
]

# prepare_data.py:51-55 — basename substrings that indicate noise.
SKIP_FILENAME_CONTAINS = ["schema", "lock.json"]

# prepare_data.py:57-58
MIN_CONTENT_LENGTH = 50

# The exact character set Python's str.split()/str.strip() treat as
# whitespace (the reference normalizes with " ".join(text.split()),
# prepare_data.py:124-128). Java's \s is only [ \t\n\x0B\f\r], so an explicit
# class is required for byte-parity on  ,  , 　 etc.
_PY_WHITESPACE = "".join(
    map(
        chr,
        [
            0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
            0x85, 0xA0, 0x1680, *range(0x2000, 0x200B),
            0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
        ],
    )
)
PY_WS_RUN = "[" + _PY_WHITESPACE + "]+"


def noise_path_filter(path_col: str = "path"):
    """Boolean column: True when the path survives every noise filter
    (prepare_data.should_skip_path, :62-89)."""
    p = F.lower(F.col(path_col))
    basename = F.element_at(F.split(p, "/"), -1)
    parts = F.split(p, "/")

    keep = ~F.array_contains(F.array(*[F.lit(s) for s in SKIP_FILENAMES]), basename)
    for pat in SKIP_FILENAME_CONTAINS:
        keep = keep & ~basename.contains(pat)
    for d in SKIP_DIRS:
        keep = keep & ~F.array_contains(parts, F.lit(d))
    return keep


def content_hash_col(text_col: str = "text"):
    """sha256 of whitespace-normalized text (prepare_data.content_hash,
    :124-128: ``" ".join(text.split())`` == collapse any whitespace run,
    strip ends)."""
    # Collapse any whitespace run first, THEN trim: Spark's trim strips only
    # spaces (not \n\t), so edge runs must be turned into plain spaces first.
    # PY_WS_RUN (not \s) so Unicode whitespace collapses exactly like
    # Python's str.split().
    normalized = F.trim(F.regexp_replace(F.col(text_col), PY_WS_RUN, " "))
    return F.sha2(normalized, 256)


def collect_corpus(
    spark: SparkSession,
    source_dir: str,
    pattern: str = "*.txt",
) -> DataFrame:
    """S5 scan: recursive file collection with path noise filtering.

    Returns ``(path, text)`` rows, path-sorted like collect_files
    (prepare_data.py:92-122). One file = one row (``wholetext``), matching
    the reference's whole-file reads (:146-148).
    """
    df = (
        spark.read.format("text")
        .option("wholetext", True)
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", pattern)
        .load(source_dir)
        .select(F.input_file_name().alias("path"), F.col("value").alias("text"))
    )
    return df.filter(noise_path_filter("path"))


def dedup_corpus(docs: DataFrame, path_col: str = "path", text_col: str = "text") -> DataFrame:
    """S5 dedup: drop near-empty docs, keep one doc per normalized-content
    hash (prepare_data.combine_files, :135-166).

    The reference keeps the *first encountered* path (its file list is
    sorted, :122); the deterministic distributed equivalent keeps the
    lexicographically smallest path per hash.
    """
    # len(content.strip()) in the reference strips all whitespace kinds —
    # including Unicode ones Java's \s misses.
    stripped_len = F.length(
        F.regexp_replace(F.col(text_col), f"^{PY_WS_RUN}|{PY_WS_RUN}$", "")
    )
    hashed = docs.filter(stripped_len >= MIN_CONTENT_LENGTH).withColumn(
        "content_sha", content_hash_col(text_col)
    )
    w = Window.partitionBy("content_sha").orderBy(F.col(path_col).asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
