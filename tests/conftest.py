"""Shared fixtures: one local SparkSession per test session, synthetic pages."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_knowledge_graph_spark.fixtures import generate_pages  # noqa: E402
from ai_knowledge_graph_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # local[8]: python-worker spawn cost dominates tiny test inputs; 8 workers
    # keep it bounded while still exercising real parallelism + shuffles.
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("ai_kg_spark_tests", master="local[8]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def pages_pdf():
    return generate_pages(40)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf).localCheckpoint(eager=True)


@pytest.fixture(scope="session")
def raw_triples(spark, pages_df):
    from ai_knowledge_graph_spark.operators.extraction import pages_to_raw_triples

    return pages_to_raw_triples(
        pages_df, chunk_size=100, overlap=20, stage_partitions=8
    ).localCheckpoint(eager=True)


@pytest.fixture(scope="session")
def std_triples(spark, raw_triples):
    from ai_knowledge_graph_spark.operators.standardize import standardize_triples

    return standardize_triples(raw_triples, tie_order="lexicographic").localCheckpoint(eager=True)
