#!/usr/bin/env python
"""Driver-like correctness harness: run every catalog query on Spark and
its oracle on DuckDB, compare row count, column names, and the full
multiset of values. Run: python scripts/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
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


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and fix float repr noise
        return repr(round(v, 9) + 0.0)
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
            drows = ddf.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if scols != sorted(dcols):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} duck={sorted(dcols)}")
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
