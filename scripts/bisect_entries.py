#!/usr/bin/env python
"""Generalized solo-vs-in-catalog bisect (the committed repro pattern from
scripts/bisect_text_regression.py, VERDICT r10 "Next round" #2).

Measures any set of catalog entries two ways in ONE process:

  solo    — fresh JVM, the target entries only (3 iters, median)
  after   — same JVM after one full in-order catalog pass (the bench
            condition: every other entry runs first, alphabetically)

If "after" medians are materially above "solo" the cause is in-JVM
degradation (codegen/GC/listener buildup) from the preceding entries; if
they match and both sit near the better of the r8/r9 numbers, the
round-over-round drift was environmental (box load during the bench run)
and the writeup records that.

Usage: python scripts/bisect_entries.py [sf_dir] name [name...] 2>/dev/null
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from rdw_spark.plans.catalog import get_catalog  # noqa: E402
from rdw_spark.session import get_spark  # noqa: E402


def run_once(spark, q, sf_dir: str) -> float:
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return dt


def medians(spark, catalog, family, sf_dir: str, iters: int = 3):
    out = {}
    for name in family:
        samples = [run_once(spark, catalog[name], sf_dir)
                   for _ in range(iters)]
        out[name] = round(statistics.median(samples), 3)
    return out


def main() -> None:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, family = args[0], args[1:]
    else:
        sf_dir, family = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), args
    if not family:
        raise SystemExit("usage: bisect_entries.py [sf_dir] name [name...]")
    spark = get_spark("rdw-bisect")
    catalog = get_catalog()
    missing = [n for n in family if n not in catalog]
    if missing:
        raise SystemExit(f"unknown catalog entries: {missing}")

    # warmup (same as bench.py) so codegen/JIT is settled for BOTH arms
    catalog["a7_aggregate_report"].fn(spark, sf_dir).write.format(
        "noop").mode("overwrite").save()

    load0 = os.getloadavg()[0]
    solo = medians(spark, catalog, family, sf_dir)
    load1 = os.getloadavg()[0]

    # one full in-order pass (1 iter) to reproduce the bench condition
    t0 = time.perf_counter()
    for name, q in sorted(catalog.items()):
        if name in family:
            continue
        try:
            run_once(spark, q, sf_dir)
        except Exception:  # noqa: BLE001 — the pass is ballast, not a gate
            pass
    pass_sec = round(time.perf_counter() - t0, 1)
    load2 = os.getloadavg()[0]

    after = medians(spark, catalog, family, sf_dir)
    load3 = os.getloadavg()[0]

    print(json.dumps({
        "solo": solo,
        "after_full_pass": after,
        "full_pass_sec": pass_sec,
        "ratio": {n: round(after[n] / solo[n], 2) for n in family},
        "load_avg": {"start": round(load0, 2), "post_solo": round(load1, 2),
                     "post_pass": round(load2, 2), "end": round(load3, 2)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
