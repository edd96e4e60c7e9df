#!/usr/bin/env python
"""Solo per-entry timing: warmup, then median of N noop-sink runs per
named entry in one fresh JVM (the bench methodology, subset-scoped).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/time_entries.py name [name...]
       env SPARK_GRAFT_TIME_ITERS=5 ... for more samples
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_TIME_ITERS", "3"))
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: time_entries.py name [name...]")
    catalog = get_catalog()
    missing = [n for n in names if n not in catalog]
    if missing:
        raise SystemExit(f"unknown catalog entries: {missing}")
    spark = get_spark("rdw-time-entries")
    catalog["a7_aggregate_report"].fn(spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        samples = [run_once(spark, catalog[name], sf_dir)
                   for _ in range(iters)]
        out[name] = {"median": round(statistics.median(samples), 3),
                     "samples": [round(s, 3) for s in samples]}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir,
                      "load_avg_1m": round(os.getloadavg()[0], 2),
                      "medians": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
