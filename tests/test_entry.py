"""Driver-contract check: every queries() entry matches its oracle_sql()
through DuckDB on the same parquet (sf0.001 locally; the driver uses sf0.01).
Mirrors the driver's comparison: row counts, column names, and
order-insensitive values.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "nan"
            if isinstance(v, (bytes, bytearray)):
                v = bytes(v).hex()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sqls = entry_mod.oracle_sql()
    assert name in sqls, f"no oracle SQL for {name}"

    sdf = q(spark, SF_DIR)
    cols = sorted(sdf.columns)
    spark_rows = _normalize([r.asDict() for r in sdf.collect()], cols)

    res = ddb.sql(sqls[name])
    duck_cols = list(res.columns)
    assert sorted(duck_cols) == cols, (sorted(duck_cols), cols)
    duck_rows = _normalize(
        [dict(zip(duck_cols, row)) for row in res.fetchall()], cols
    )

    assert len(spark_rows) == len(duck_rows), (
        name,
        len(spark_rows),
        len(duck_rows),
        spark_rows[:3],
        duck_rows[:3],
    )
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
    ]
    assert not mismatches, (name, mismatches[:5])


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"subject", "predicate", "object"} <= set(df.columns)
