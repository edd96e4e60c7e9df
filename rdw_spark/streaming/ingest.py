"""Streaming exam ingestion: the reference's async ingest queue as a
Structured Streaming file source.

Reference shape (SURVEY §3.1; docs/Architecture.md): the exam processor
consumes TRT payloads from a queue and runs accept→parse→MERGE→status
per message. Spark-first mapping: a checkpointed file-source stream over
a landing directory — each dropped file is one TRT payload — feeding the
SAME ``ingest_exams`` path via ``foreachBatch``.

Exactly-once by composition, each layer idempotent under replay:
- the file-source checkpoint guarantees a file enters exactly one
  micro-batch (replayed batches re-present the same files);
- ``accept_batch``'s digest dedup makes a replayed payload a no-op
  (docs/API.md:263), so at-least-once delivery upgrades to effective
  exactly-once;
- the warehouse MERGE is replace-by-natural-key.

Pacing is ``maxFilesPerTrigger`` — the stream analog of the reference's
queue prefetch/batch sizing (X6). Payload bytes NEVER visit the driver:
digests are computed executor-side (one md5 column), only the O(rows)
digest strings are collected for the metadata accept
(``ImportLog.accept_digests``), archive writes run per-partition on the
executors, and the payload DataFrame is handed to ``process_accepted``
directly so the XML parse (mapInPandas) reads from executor memory. The
old shape (collect every payload, re-parallelize via createDataFrame)
made throughput driver-bound — pure executor→driver→executor overhead
and a driver-memory ceiling on fat payloads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdw_spark.sources.exam_ingest import process_accepted
from rdw_spark.warehouse.import_log import ImportContent, ImportLog
from rdw_spark.warehouse.store import TableStore


def _archive_distributed(accepted: DataFrame, archive_root: str, content: int) -> None:
    """Executor-side archive writes, same layout as ``ImportLog._archive``
    (content/digest-prefix pairs). Idempotent under micro-batch replay: an
    already-archived digest is skipped, and writes go through a tmp file +
    atomic rename so a killed executor never leaves a torn payload."""
    name = ImportContent.NAMES[content]

    def write_partition(rows):
        for r in rows:
            digest = r["digest"]
            d = os.path.join(archive_root, name, digest[0:2], digest[2:4])
            path = os.path.join(d, digest)
            if os.path.exists(path):
                continue
            os.makedirs(d, exist_ok=True)
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "wb") as fh:
                fh.write(r["payload"].encode("utf-8"))
            os.replace(tmp, path)

    accepted.select("digest", "payload").foreachPartition(write_partition)


def stream_exam_ingest(
    spark: SparkSession,
    wh: TableStore,
    log: ImportLog,
    landing_dir: str,
    checkpoint: str,
    max_files_per_trigger: int = 500,
    available_now: bool = True,
):
    """Start the ingest stream over ``landing_dir`` (one TRT XML per file).
    With ``available_now`` the stream drains the backlog and stops — the
    resubmit/catch-up mode; without it, it keeps watching. Returns the
    StreamingQuery."""
    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        # digest executor-side; in-batch byte-identical payloads collapse to
        # one row here (same dedup accept_batch's seen_new map performs)
        with_digest = batch_df.select(
            F.col("value").alias("payload"),
            F.upper(F.md5(F.col("value").cast("binary"))).alias("digest"),
        ).dropDuplicates(["digest"])
        digests = [r["digest"] for r in with_digest.select("digest").collect()]
        if not digests:
            return
        # metadata accept: O(rows) digest strings driver-side, nothing else
        recs = log.accept_digests(
            s, ImportContent.EXAM, digests, batch=f"stream-{batch_id}"
        )
        fresh = [(rec.id, d) for rec, d in zip(recs, digests) if not rec.existing]
        if not fresh:
            return  # every payload was a digest-dedup no-op (API.md:263)
        id_map = s.createDataFrame(fresh, "import_id long, digest string")
        accepted = with_digest.join(F.broadcast(id_map), "digest")
        if log.archive_root is not None:
            _archive_distributed(accepted, log.archive_root, ImportContent.EXAM)
        process_accepted(s, wh, log, accepted.select("import_id", "payload"))

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
