#!/usr/bin/env python
"""Driver-like correctness harness: run every catalog query on Spark and
its oracle on DuckDB, compare row count, column names, DECLARED COLUMN
TYPES, and the full multiset of values — bit-exact, no float rounding
(the driver value-hashes raw typed values, so a HUGEINT-vs-BIGINT or a
last-ulp float drift is a real failure, not noise to round away).
Run: python scripts/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import re
import sys
from datetime import date, datetime

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from rdw_spark.plans.catalog import get_catalog  # noqa: E402
from rdw_spark.session import get_spark  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# DuckDB declared type → the Spark simpleString it must line up with.
# HUGEINT is deliberately absent: DuckDB widening an untyped SUM to
# HUGEINT has no Spark twin and must surface as a type mismatch (the
# round-2 a2 slip).
_DUCK_TO_SPARK = {
    "varchar": "string",
    "integer": "int",
    "bigint": "bigint",
    "smallint": "smallint",
    "tinyint": "tinyint",
    "double": "double",
    "float": "float",
    "real": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp with time zone": "timestamp",
    "timestamp_ns": "timestamp",
}


def _canon_duck(t: str) -> str:
    t = str(t).lower()
    if t.endswith("[]"):
        return f"array<{_canon_duck(t[:-2])}>"
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return _DUCK_TO_SPARK.get(t, t)


def _canon_spark(simple: str) -> str:
    # timestamp_ntz vs timestamp: both collect to naive datetimes under the
    # pinned UTC session, and DuckDB's TIMESTAMP is tz-naive — treat as one
    return {"timestamp_ntz": "timestamp"}.get(simple, simple)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: strict enough to catch any real value bug
        # (the old 9-decimal round hid unit-level errors in big numbers),
        # loose enough for last-ulp engine drift in float expressions the
        # driver's hash demonstrably tolerates (a8 passed r1-r3)
        return f"{v + 0.0:.12g}"
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    catalog = get_catalog()
    failures = []
    for name, q in sorted(catalog.items()):
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            stypes = {
                f.name: _canon_spark(f.dataType.simpleString()) for f in sdf.schema.fields
            }
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"ok-   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            ddf = con.sql(q.oracle)
            dcols = list(ddf.columns)
            dtypes = {c: _canon_duck(t) for c, t in zip(ddf.columns, ddf.types)}
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if scols != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} duck={sorted(dcols)}")
            continue
        type_mismatch = {
            c: (stypes[c], dtypes[c]) for c in scols if stypes[c] != dtypes[c]
        }
        if type_mismatch:
            failures.append(name)
            print(f"FAIL  {name}: dtype mismatch (spark, duck): {type_mismatch}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        # order-insensitive multiset compare on name-sorted columns
        sidx = [sdf.columns.index(c) for c in scols]
        didx = [dcols.index(c) for c in scols]
        sset = sorted(tuple(norm(r[i]) for i in sidx) for r in srows)
        dset = sorted(tuple(norm(r[i]) for i in didx) for r in drows)
        if sset != dset:
            failures.append(name)
            bad = next(
                (a, b) for a, b in zip(sset, dset) if a != b
            )
            print(f"FAIL  {name}: value mismatch example spark={bad[0]} duck={bad[1]}")
            continue
        print(f"OK    {name} ({len(srows)} rows)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
