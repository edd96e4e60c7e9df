"""Streaming corpus build: continuous ingestion + incremental dedup.

The 100 TB-tier shape: document batches land continuously; each
micro-batch is deduped against the corpus-so-far WITHOUT rescanning the
corpus (the maintained fingerprint index from
``operators.dedup.incremental_exact_dedup``), survivors append to a
partition-store corpus table, and the index grows by an append.

Exactly-once by composition, every layer idempotent under replay:
- the file-source checkpoint assigns each landed file to exactly one
  micro-batch;
- the corpus MERGE is replace-by-doc_id and the index MERGE is
  replace-by-fingerprint, so a replayed batch lands idempotently;
- manifest renames publish each table atomically (a crash mid-batch
  leaves the previous snapshot visible, and the replay redoes the batch).

State is two partition-store tables under ``out_root``:
  corpus/  — the deduped documents, partitioned by source
  fpindex/ — (digest, canonical_id), partitioned by digest prefix so the
             per-batch probe join reads only the touched buckets at scale
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdw_spark.operators.dedup import incremental_exact_dedup
from rdw_spark.warehouse.partstore import PartitionedTable

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

INDEX_SCHEMA = T.StructType([
    T.StructField("digest", T.StringType(), False),
    T.StructField("canonical_id", T.LongType(), False),
])


def corpus_tables(out_root: str) -> tuple[PartitionedTable, PartitionedTable]:
    corpus = PartitionedTable(
        out_root, "corpus", "source", keys=["doc_id"],
        schema=DOC_SCHEMA, sort_cols=("doc_id",),
    )
    index = PartitionedTable(
        out_root, "fpindex", "substring(digest, 1, 1)", keys=["digest"],
        schema=INDEX_SCHEMA, sort_cols=("digest",),
    )
    return corpus, index


def stream_corpus_build(
    spark: SparkSession,
    landing_dir: str,
    out_root: str,
    checkpoint: str,
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Watch ``landing_dir`` for parquet drops in the documents schema,
    dedup each micro-batch against the maintained index, and append the
    survivors. Returns the StreamingQuery."""
    corpus, index = corpus_tables(out_root)

    raw = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        try:
            idx = index.read(s)
        except FileNotFoundError:  # first batch: empty typed index
            idx = s.createDataFrame([], INDEX_SCHEMA)
        out = incremental_exact_dedup(batch_df, idx)
        survivors = out["unique"].select(*[f.name for f in DOC_SCHEMA.fields])
        if survivors.isEmpty():
            return
        # replace-by-key merges keep a replayed micro-batch idempotent
        corpus.merge_rows(s, survivors)
        index.merge_rows(s, out["index_delta"])

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
