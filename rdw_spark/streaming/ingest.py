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
queue prefetch/batch sizing (X6). Payload *texts* ride through the
micro-batch DataFrame and are handed to the batch endpoint, whose XML
parse runs distributed (mapInPandas); archiving writes stay the
import-log's concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rdw_spark.sources.exam_ingest import ingest_exams
from rdw_spark.warehouse.import_log import ImportLog
from rdw_spark.warehouse.store import TableStore


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
        payloads = [r["value"].encode("utf-8") for r in batch_df.collect()]
        if payloads:
            ingest_exams(spark, wh, log, payloads, batch=f"stream-{batch_id}")

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
