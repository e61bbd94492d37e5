#!/usr/bin/env python3
"""Driver-contract sweep: every (or a named subset of) `queries()` entry in
`__spark_entry__.py` vs its `oracle_sql()` twin through DuckDB on the same
parquet, compared the way the driver compares — row count, sorted column
names, and an order-insensitive sorted-row value hash (floats rounded to 6
places, bytes hexed, lists/arrays canonicalized recursively).

Usage:
    python scripts/sweep.py [sf_dir] [query ...]

Defaults: sf_dir=/root/testdata/sf0.01, all queries. Prints one line per
query and a final `TOTAL <n> BAD: [...]` — an empty BAD list is the gate.
Lives in scripts/ (not /tmp) so the harness survives environment resets.
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon_val(v):
    if isinstance(v, float):
        v = round(v, 6)
        if math.isnan(v):
            return "nan"
        if v == 0.0:  # -0.0 == 0.0 but repr differs
            return 0.0
        return v
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_val(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_val(x)) for k, x in v.items()))
    return v


def _normalize(rows, cols):
    out = []
    for row in rows:
        out.append(tuple(_canon_val(row[c]) for c in cols))
    return sorted(out, key=repr)


def main() -> int:
    import __spark_entry__ as entry_mod
    from ai_knowledge_graph_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        sf_dir = args[0]
        args = args[1:]

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    names = args if args else list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    spark = get_spark("sweep")
    bad = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = _normalize([r.asDict() for r in sdf.collect()], cols)

            if name not in sqls:
                print(f"{name}: NO-ORACLE rows={len(srows)} "
                      f"({time.time() - t0:.1f}s)")
                continue
            res = con.sql(sqls[name])
            dcols = list(res.columns)
            if sorted(dcols) != cols:
                bad.append(name)
                print(f"{name}: SCHEMA spark={cols} duck={sorted(dcols)}")
                continue
            drows = _normalize(
                [dict(zip(dcols, row)) for row in res.fetchall()], cols
            )
            if len(srows) != len(drows):
                bad.append(name)
                print(f"{name}: ROWS spark={len(srows)} duck={len(drows)}")
                continue
            mism = [(a, b) for a, b in zip(srows, drows) if a != b]
            if mism:
                bad.append(name)
                print(f"{name}: VALUES {len(mism)} mismatched "
                      f"e.g. {mism[0]}")
                continue
            print(f"{name}: OK rows={len(srows)} ({time.time() - t0:.1f}s)")
        except Exception:
            bad.append(name)
            print(f"{name}: ERROR")
            traceback.print_exc()
    print(f"TOTAL {len(names)} BAD: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
