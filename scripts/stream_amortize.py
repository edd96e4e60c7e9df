#!/usr/bin/env python
"""Measure streaming-corpus throughput vs trigger batch size.

Drains the SAME landing directory (sf docs, 64 files) at several
``maxFilesPerTrigger`` settings, each from a fresh checkpoint + state
root, and prints docs/s per setting plus the batch-pipeline rate for
reference. This is the measurement behind the "per-trigger fixed cost
amortizes" claim (VERDICT r7 #1): if throughput does NOT rise with the
trigger size, the cost is per-row, not per-trigger, and the sink needs a
code fix rather than bigger batches.

Usage: python scripts/stream_amortize.py [sf_dir] [fpt ...]
       STAGE=summary|kmv|sequence python scripts/stream_amortize.py ...

STAGE selects the streaming sink under test (default: the corpus
build). summary maintains the unified sketch cube per micro-batch, kmv
the per-group KMV sketches, sequence the per-entity event arrays (reads
the events table instead of documents).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from rdw_spark.io import load_table  # noqa: E402
from rdw_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fpts = [int(a) for a in sys.argv[2:]] or [1, 8, 64]
    stage = os.environ.get("STAGE", "corpus")
    n_files = max(fpts)
    spark = get_spark("stream-amortize")
    from rdw_spark.plans.corpus import build_corpus
    from rdw_spark.streaming.corpus import stream_corpus_build

    table = "events" if stage == "sequence" else "documents"
    docs = load_table(spark, sf_dir, table)
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="rdw_amortize_")
    out: dict[str, object] = {"stage": stage, "n_docs": n_docs,
                              "n_files": n_files}
    try:
        landing = os.path.join(root, "landing")
        docs.repartition(n_files).write.parquet(landing)
        schema = spark.read.parquet(landing).schema

        def start(fpt: int):
            from rdw_spark.streaming.aggstate import (
                stream_kmv_state, stream_sequence_state,
                stream_summary_state,
            )

            state = os.path.join(root, f"state_{fpt}")
            ckpt = os.path.join(root, f"ckpt_{fpt}")
            if stage == "summary":
                spec = [("chars", "quantile", "n_chars", 100),
                        ("src", "topk", "source", 16),
                        ("docs", "kmv", "doc_id", 256)]
                return stream_summary_state(
                    spark, landing, schema, state, ckpt, ["lang"], spec,
                    max_files_per_trigger=fpt)
            if stage == "kmv":
                return stream_kmv_state(
                    spark, landing, schema, state, ckpt, ["lang"],
                    "doc_id", 1024, max_files_per_trigger=fpt)
            if stage == "sequence":
                symbols = {"view": "V", "click": "C", "purchase": "P"}
                return stream_sequence_state(
                    spark, landing, schema, state, ckpt, ["user_id"],
                    symbols, max_files_per_trigger=fpt)
            return stream_corpus_build(
                spark, landing, os.path.join(root, f"corpus_{fpt}"), ckpt,
                max_files_per_trigger=fpt, available_now=True)

        if stage == "corpus":
            t0 = time.perf_counter()
            build_corpus(docs, minhash_threshold=0.5)
            out["batch_docs_per_sec"] = round(
                n_docs / (time.perf_counter() - t0), 1)

        for fpt in fpts:
            t0 = time.perf_counter()
            q = start(fpt)
            q.awaitTermination()
            dt = time.perf_counter() - t0
            n_batches = (n_files + fpt - 1) // fpt
            out[f"fpt_{fpt}"] = {
                "docs_per_sec": round(n_docs / dt, 1),
                "sec": round(dt, 1),
                "n_batches": n_batches,
                "sec_per_batch": round(dt / n_batches, 2),
            }
            print(json.dumps({f"fpt_{fpt}": out[f"fpt_{fpt}"]}), file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
