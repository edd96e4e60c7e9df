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
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from rdw_spark.plans.catalog import get_catalog  # noqa: E402
from rdw_spark.session import get_spark  # noqa: E402


def _trt_doc(i: int) -> bytes:
    """Synthetic TRT exam document (same shape the ingest job parses)."""
    score = 2200 + (i * 7) % 800
    return f"""<TDSReport>
  <Test name="BENCH-ASMT-G6" subject="Math" grade="06" assessmentType="SUM"
        academicYear="2018" assessmentVersion="1"/>
  <Examinee key="{i}">
    <ExamineeAttribute context="FINAL" name="StudentIdentifier" value="B{i:06d}"/>
    <ExamineeAttribute context="FINAL" name="FirstName" value="F{i}"/>
    <ExamineeAttribute context="FINAL" name="LastOrSurname" value="L{i}"/>
    <ExamineeAttribute context="FINAL" name="Birthdate" value="2006-0{1 + i % 9}-15"/>
    <ExamineeAttribute context="FINAL" name="Sex" value="{'Female' if i % 2 else 'Male'}"/>
    <ExamineeAttribute context="FINAL" name="GradeLevelWhenAssessed" value="06"/>
    <ExamineeAttribute context="FINAL" name="IDEAIndicator" value="No"/>
    <ExamineeAttribute context="FINAL" name="EconomicDisadvantageStatus" value="{'Yes' if i % 3 else 'No'}"/>
    <ExamineeRelationship context="FINAL" name="SchoolId" value="BENCH-SCHOOL-1"/>
  </Examinee>
  <Opportunity oppId="BOPP-{i}" opportunity="1" sessionId="S{i % 7}"
               completeness="Complete" administrationCondition="Valid"
               dateCompleted="2018-04-{1 + i % 28:02d}T10:00:00">
    <Score measureOf="Overall" measureLabel="ScaleScore" value="{score}" standardError="20"/>
    <Score measureOf="C1" measureLabel="ScaleScore" value="{score - 20}" standardError="25"/>
    <Item position="1" bankKey="9" key="{100 + i % 50}" score="1" scoreStatus="SCORED">
      <Response>A</Response>
    </Item>
    <Item position="2" bankKey="9" key="{200 + i % 50}" score="0" scoreStatus="SCORED">
      <Response>B</Response>
    </Item>
  </Opportunity>
</TDSReport>""".encode()


def pipeline_bench(spark, n_exams: int = 2000, with_streaming: bool = True) -> dict:
    """Ingest + migrate throughput vs BASELINE.md (exam processing 20-30/s,
    migrate→reporting 140+/s, migrate→OLAP >1.5M/h ≈ 420/s, all per
    single-instance reference process)."""
    import shutil
    import tempfile

    from pyspark.sql import Row

    from rdw_spark.sources.exam_ingest import ingest_exams
    from rdw_spark.warehouse import ImportLog, MigrateEngine, TableStore

    root = tempfile.mkdtemp(prefix="rdw_bench_")
    try:
        wh = TableStore(os.path.join(root, "wh"), audit_enabled=True)
        log = ImportLog(wh, archive_root=None)
        wh.merge_upsert(spark, "district", spark.createDataFrame(
            [Row(natural_id="BENCH-D1", name="Bench District")]), 1)
        d_id = wh.read(spark, "district").collect()[0]["id"]
        wh.merge_upsert(spark, "school", spark.createDataFrame(
            [Row(natural_id="BENCH-SCHOOL-1", name="Bench School",
                 district_id=d_id)]), 1)
        wh.merge_upsert(spark, "asmt", spark.createDataFrame(
            [Row(natural_id="BENCH-ASMT-G6", name="Bench G6", label="B6",
                 version="1", type_code="sum", subject_code="Math",
                 grade_code="06", school_year=2018, min_score=2000.0,
                 max_score=3000.0, cut_point_1=2380.0, cut_point_2=2490.0,
                 cut_point_3=2600.0)]), 1)

        payloads = [_trt_doc(i) for i in range(n_exams)]
        t0 = time.perf_counter()
        ingest_exams(spark, wh, log, payloads, batch="bench")
        ingest_s = time.perf_counter() - t0

        eng = MigrateEngine(wh, os.path.join(root, "mart"),
                            batch_size=max(n_exams, 2000))
        t0 = time.perf_counter()
        eng.run_until_caught_up(spark, "reporting")
        rep_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.run_until_caught_up(spark, "olap")
        olap_s = time.perf_counter() - t0
        # training tier: the composed corpus build (quality -> exact dedup
        # -> MinHash-LSH + CC near-dup resolve -> split) over the sf docs
        from rdw_spark.io import load_table
        from rdw_spark.plans.corpus import build_corpus

        docs = load_table(
            spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            "documents",
        )
        n_docs = docs.count()
        t0 = time.perf_counter()
        build_corpus(docs, minhash_threshold=0.5)
        corpus_s = time.perf_counter() - t0

        # tokenizer training at vocabulary scale: 1k merges via the
        # collect-then-heap trainer (one Spark corpus pass + in-memory
        # merge loop) — the distributed per-round loop would need
        # hundreds of counting shuffles for the same list
        from rdw_spark.operators.text import train_bpe_heap

        t0 = time.perf_counter()
        bpe = train_bpe_heap(docs, num_merges=1000)
        bpe_s = time.perf_counter() - t0

        out = {
            "n_exams": n_exams,
            "ingest_sec": round(ingest_s, 2),
            "ingest_exams_per_sec": round(n_exams / ingest_s, 1),
            "migrate_reporting_per_sec": round(n_exams / rep_s, 1),
            "migrate_olap_per_sec": round(n_exams / olap_s, 1),
            "corpus_build_docs_per_sec": round(n_docs / corpus_s, 1),
            "bpe_train_1k_merges_sec": round(bpe_s, 2),
            "bpe_train_merges_done": len(bpe["merges"]),
        }

        # streaming twins (availableNow drain over the same inputs) — the
        # components whose r5 scale seams were fixed get throughput numbers
        # alongside their batch counterparts
        if not with_streaming:
            return out
        try:
            from rdw_spark.streaming.corpus import stream_corpus_build

            # trigger-size sweep over the SAME 32-file landing: per-batch
            # fixed cost (index probe + CC + state maintenance) amortizes
            # with trigger size, so the small setting reads as
            # "per-micro-batch overhead" and the large one approaches the
            # asymptotic stream rate (the batch corpus number is the
            # no-state upper bound)
            landing = os.path.join(root, "doc_landing")
            docs.repartition(32).write.parquet(landing)
            by_trigger: dict[str, float] = {}
            for fpt in (8, 32):
                t0 = time.perf_counter()
                q = stream_corpus_build(
                    spark, landing,
                    os.path.join(root, f"stream_corpus_{fpt}"),
                    os.path.join(root, f"ckpt_corpus_{fpt}"),
                    max_files_per_trigger=fpt, available_now=True,
                )
                q.awaitTermination()
                by_trigger[str(fpt)] = round(
                    n_docs / (time.perf_counter() - t0), 1)
            out["stream_corpus_by_trigger"] = by_trigger
            out["stream_corpus_docs_per_sec"] = by_trigger["32"]
        except Exception as e:  # noqa: BLE001 — batch numbers still count
            out["stream_corpus_err"] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"

        try:
            from rdw_spark.streaming.ingest import stream_exam_ingest

            exam_landing = os.path.join(root, "exam_landing")
            os.makedirs(exam_landing)
            # offset past the batch phase's ids so digests are fresh
            # (byte-identical payloads would digest-dedup to no-ops);
            # separate id ranges per trigger setting for the same reason.
            # 2000 gets a matching file count (one full-size trigger) so
            # the sweep shows where per-trigger fixed cost stops mattering
            ingest_by_trigger: dict[str, float] = {}
            for fpt, n_stream in ((100, 500), (500, 500), (2000, 2000)):
                for i in range(n_stream):
                    path = os.path.join(exam_landing, f"e{fpt}_{i}.xml")
                    with open(path, "wb") as fh:
                        fh.write(_trt_doc(1_000_000 + fpt * 10_000 + i))
                t0 = time.perf_counter()
                q = stream_exam_ingest(
                    spark, wh, log, exam_landing,
                    os.path.join(root, "ckpt_ingest"),  # shared: old files
                    max_files_per_trigger=fpt,          # stay consumed
                    available_now=True,
                )
                q.awaitTermination()
                ingest_by_trigger[str(fpt)] = round(
                    n_stream / (time.perf_counter() - t0), 1)
            out["stream_ingest_by_trigger"] = ingest_by_trigger
            # headline stays pinned to the ORIGINAL fpt=500/n=500 point so
            # the number is comparable round-over-round; the trigger-2000
            # amortization point lives in stream_ingest_by_trigger only
            out["stream_ingest_exams_per_sec"] = ingest_by_trigger["500"]
        except Exception as e:  # noqa: BLE001
            out["stream_ingest_err"] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"

        try:
            # continuously-maintained aggregate state (ivm streaming twin):
            # docs/s maintaining a per-(lang, source) char aggregate
            import shutil as _sh

            from rdw_spark.streaming.aggstate import stream_incremental_agg

            agg_ckpt = os.path.join(root, "ckpt_agg")
            agg_out = os.path.join(root, "agg_state")
            t0 = time.perf_counter()
            q = stream_incremental_agg(
                spark, landing, docs.schema, agg_out, agg_ckpt,
                ["lang", "source"], "n_chars", max_files_per_trigger=8,
            )
            q.awaitTermination()
            out["stream_agg_docs_per_sec"] = round(
                n_docs / (time.perf_counter() - t0), 1)
            _sh.rmtree(agg_ckpt, ignore_errors=True)
        except Exception as e:  # noqa: BLE001
            out["stream_agg_err"] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"

        try:
            # round-9 state families get the same fixed-cost-per-trigger
            # evidence as the ingest/corpus paths: the unified summary
            # cube maintained per micro-batch at two trigger sizes, plus
            # one KMV point (its delta build is all JVM expressions)
            from rdw_spark.streaming.aggstate import (
                stream_kmv_state, stream_summary_state,
            )

            spec = [("chars", "quantile", "n_chars", 100),
                    ("src", "topk", "source", 16),
                    ("docs", "kmv", "doc_id", 256)]
            by_trigger = {}
            for fpt in (8, 32):
                t0 = time.perf_counter()
                q = stream_summary_state(
                    spark, landing, docs.schema,
                    os.path.join(root, f"sumstate_{fpt}"),
                    os.path.join(root, f"ckpt_sum_{fpt}"),
                    ["lang"], spec, max_files_per_trigger=fpt,
                )
                q.awaitTermination()
                by_trigger[str(fpt)] = round(
                    n_docs / (time.perf_counter() - t0), 1)
            out["stream_summary_by_trigger"] = by_trigger
            t0 = time.perf_counter()
            q = stream_kmv_state(
                spark, landing, docs.schema, os.path.join(root, "kmvstate"),
                os.path.join(root, "ckpt_kmv"), ["lang"], "doc_id", 512,
                max_files_per_trigger=8,
            )
            q.awaitTermination()
            out["stream_kmv_docs_per_sec"] = round(
                n_docs / (time.perf_counter() - t0), 1)
        except Exception as e:  # noqa: BLE001
            out["stream_state_err"] = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"

        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _run_once(spark, q, sf_dir: str) -> float:
    t0 = time.perf_counter()
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    # operators that cache intermediates (LSH shingles, simhash sigs)
    # must not leak blocks into later timings
    spark.catalog.clearCache()
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("rdw-bench")

    # pipeline first, before the 55-query catalog loop degrades the JVM
    # (~4x slower ingest measured afterwards); a small untimed warmup pass
    # settles codegen/JIT so the reported number is steady-state throughput
    try:
        pipeline_bench(spark, n_exams=200, with_streaming=False)
        pipeline = pipeline_bench(spark)
    except Exception as e:  # noqa: BLE001 — catalog numbers still count
        pipeline = {"err": f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"}

    # solo mode (SPARK_GRAFT_BENCH_PIPELINE_ONLY=1): stop after the
    # pipeline/streaming phase — the drift-bisect arm (VERDICT r10 #4):
    # identical warmup + measurement code, no catalog loop, so a quiet-box
    # run isolates environmental load from code regression
    if os.environ.get("SPARK_GRAFT_BENCH_PIPELINE_ONLY"):
        print(json.dumps({
            "metric": "pipeline_only",
            "pipeline": pipeline,
            "sf": sf,
            "load_avg_1m": round(os.getloadavg()[0], 2),
        }))
        spark.stop()
        return

    catalog = get_catalog()
    timings: dict[str, object] = {}
    # warm the JVM + parquet footer caches with the flagship before timing
    try:
        catalog["a7_aggregate_report"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:  # noqa: BLE001
        print(f"warmup failed: {e}", file=sys.stderr)

    # median of `iters` runs per query: single-run timings swung up to 6x
    # on unchanged code in earlier rounds; one failing query must not take
    # the rest of the bench down with it.
    total = 0.0
    errors = 0
    for name, q in sorted(catalog.items()):
        samples: list[float] = []
        err: str | None = None
        for _ in range(iters):
            try:
                samples.append(_run_once(spark, q, sf_dir))
            except Exception as e:  # noqa: BLE001 — isolate per query
                err = f"{type(e).__name__}: {str(e).splitlines()[0][:200]}"
                break
        if samples and err is None:
            med = statistics.median(samples)
            timings[name] = round(med, 3)
            total += med
        else:
            timings[name] = {"err": err}
            errors += 1

    result = {
        "metric": "catalog_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "iterations": iters,
        "queries": timings,
        "query_errors": errors,
        "pipeline": pipeline,
        "sf": sf,
        # box load when the run started/ended: numbers swing ±20-50%
        # when other Spark jobs share the box, so record the context
        # the swing is attributable to
        "load_avg_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(result))
    # committed per-query artifact: the driver's BENCH_r<N> tail-capture
    # truncates the full line, so round-over-round per-query comparison
    # needs a file the judge can diff directly. Round number = one past
    # the last driver-recorded BENCH_r*.json.
    try:
        import glob

        rounds = [
            int(m.group(1))
            for f in glob.glob("/root/repo/BENCH_r*.json")
            if (m := re.search(r"BENCH_r(\d+)\.json$", f))
        ]
        rn = max(rounds, default=0) + 1
        with open(f"/root/repo/BENCHDETAIL_r{rn:02d}.json", "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
    except OSError as e:
        print(f"benchdetail write failed: {e}", file=sys.stderr)
    # compact second summary line: the driver tail-captures the last ~2000
    # characters of output and parses the final JSON line; the full per-query
    # line (202 entries + pipeline, ~12 KB) can never fit that window
    # (BENCH_r05 parsed:null — head cut; BENCH_r10..r12 parsed the compact
    # line but it lacked "queries", so PERF per_query stayed empty for two
    # rounds). Fix per VERDICT r12 item 1b: the FINAL line is minimal — no
    # pipeline dict — but carries the 50 driver-window query timings (the
    # non-zz_ names the driver verifies), which measure ~1.3 KB and fit the
    # window. Nothing is removed from the bench output: the full line above
    # and the committed BENCHDETAIL file keep all entries + pipeline detail.
    window_queries = {
        name: t for name, t in timings.items() if not name.startswith("zz_")
    }
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "iterations": iters,
                "n_queries": len(catalog),
                "query_errors": errors,
                "queries": window_queries,
                "sf": sf,
                "load_avg_1m": round(os.getloadavg()[0], 2),
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
