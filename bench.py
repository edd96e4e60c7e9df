#!/usr/bin/env python
"""Benchmark: run the full catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed via the noop sink (no driver collect cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from rdw_spark.plans.catalog import get_catalog  # noqa: E402
from rdw_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("rdw-bench")

    catalog = get_catalog()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footer caches with the flagship before timing
    catalog["a7_aggregate_report"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    total = 0.0
    for name, q in sorted(catalog.items()):
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
