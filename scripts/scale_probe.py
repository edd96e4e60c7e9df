#!/usr/bin/env python
"""Scale-shape probe (r13 verdict item 7): synthesize an sf0.5-like input
from sf0.1 (5 replicas, id-offset, documents prefixed with a per-replica
token so near-dup pair density scales ~linearly instead of quadratically),
then time the hot-tier entries on it at the current $SPARK_GRAFT_CPUS.

The scaled tables are written as MULTI-FILE parquet (32 files), so the
scan-parallelism floor that spread_scan patches at sf0.1 does not apply —
this also demonstrates spread_scan's short-circuit at real scale.

Usage:
  python scripts/scale_probe.py build [out_dir]     # one-time synth
  SPARK_GRAFT_CPUS=32 python scripts/scale_probe.py time [out_dir]
  SPARK_GRAFT_CPUS=8  python scripts/scale_probe.py time [out_dir]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from rdw_spark.io import load_table  # noqa: E402
from rdw_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 5
ENTRIES = [
    "zz_graph_triangles",
    "zz_sim_ivfpq_topk",
    "graph_wcc",
    "dedup_corpus_resolve",
    "zz_dedup_minhash_portable",
]


def build(out: str) -> None:
    spark = get_spark("scale-build")
    os.makedirs(out, exist_ok=True)

    docs = load_table(spark, SRC, "documents")
    doc_max = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = []
    for r in range(REPLICAS):
        p = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * doc_max))
        if r > 0:
            # shift every shingle so replicas are near-dup-disjoint:
            # pair count grows ~x5, not ~x25
            p = p.withColumn("text", F.concat(F.lit(f"r{r}copy "),
                                              F.col("text")))
        parts.append(p)
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))

    emb = load_table(spark, SRC, "embeddings")
    emb_max = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    bige = emb
    for r in range(1, REPLICAS):
        bige = bige.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * emb_max)))
    bige.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))

    for name, keys in (("orders", ["o_orderkey", "o_custkey"]),
                       ("lineitem", ["l_orderkey", "l_suppkey"])):
        t = load_table(spark, SRC, name)
        offs = {k: t.agg(F.max(k)).collect()[0][0] + 1 for k in keys}
        bigt = t
        for r in range(1, REPLICAS):
            p = t
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(r * offs[k]))
            bigt = bigt.unionByName(p)
        bigt.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet"))
    spark.stop()
    print(f"built {out}")


def time_entries(out: str) -> None:
    from rdw_spark.plans.catalog import get_catalog

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale-probe")
    cat = get_catalog()
    iters = int(os.environ.get("SPARK_GRAFT_TIME_ITERS", "3"))
    meds = {}
    for name in ENTRIES:
        spark.sparkContext.setJobDescription(f"scale: {name}")
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            cat[name].fn(spark, out).write.format("noop").mode(
                "overwrite").save()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        meds[name] = round(statistics.median(samples), 2)
        print(json.dumps({name: {"median": meds[name],
                                 "samples": [round(s, 2) for s in samples]}}),
              flush=True)
    print(json.dumps({"cpus": cpus, "dir": out,
                      "load_avg_1m": round(os.getloadavg()[0], 2),
                      "medians": meds}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rdw_scale_sf05"
    if mode == "build":
        build(out_dir)
    else:
        time_entries(out_dir)
