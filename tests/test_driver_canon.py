"""Driver-canonicalization regression canary (VERDICT round-4 ask #4).

The driver's CORRECTNESS harness canonicalizes each query result with
pandas — `sort_values` over every column, then per-column `factorize` —
both of which require every cell to be HASHABLE and ORDERABLE. An
array-/struct-/map-valued output column crashes the harness ("unhashable
type: 'list'", the round-4 `embedding_pool` failure) even when the values
are correct, so a query with such a shape can never be driver-certified.

This test replays that exact canonicalization over ALL contract queries at
sf0.001, so a driver-incompatible output shape can never ship again. It is
a SHAPE gate, not a value gate — value parity vs the DuckDB oracle is
test_entry.py's job (sf0.001, every suite run) and scripts/sweep.py's
(sf0.01/sf0.1, per session).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def driver_canonicalize(pdf: pd.DataFrame) -> str:
    """The driver's canonicalization contract: column-name sort, full
    row sort over all columns, per-column factorize, stable hash. Raises
    (like the driver) when any cell is unhashable/unorderable."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    # list/ndarray/dict cells make sort_values raise TypeError and
    # factorize raise "unhashable type" — exactly the driver behavior.
    pdf = pdf.sort_values(by=cols, kind="mergesort", na_position="last")
    h = hashlib.sha256()
    for c in cols:
        codes, uniques = pd.factorize(pdf[c], use_na_sentinel=True)
        h.update(c.encode())
        h.update(codes.tobytes())
        h.update(repr(list(uniques)).encode())
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_is_driver_canonicalizable(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    # collect through the same pandas conversion path the driver uses;
    # Arrow maps array columns to ndarray cells, which must not appear
    pdf = sdf.toPandas()
    digest = driver_canonicalize(pdf)
    assert isinstance(digest, str) and len(digest) == 64
