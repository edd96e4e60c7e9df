"""Streaming ANN index maintenance: keep the cell-partitioned IVF index
fresh as embedding batches land, without refitting the quantizer.

The continuous-ingest shape: a checkpointed file-source stream watches a
landing directory for embedding shards (e.g. the output of an upstream
encode job); each micro-batch runs :func:`~rdw_spark.operators.similarity.
ivf_append` — one broadcast argmin against the (tiny) fixed centroid list,
an id anti-join that reads ONLY the touched cell partitions, one
partitioned append. Probes (:func:`ivf_topk`) see a landed vector as soon
as its batch commits; nothing ever rescans the index.

Exactly-once by composition, the same layering as ``streaming/corpus.py``:
the file-source checkpoint assigns each landed file to exactly one
micro-batch, and ``ivf_append``'s cell-pruned anti-join makes a replayed
batch a no-op (an id already present in its cell is skipped), so
at-least-once delivery upgrades to effective exactly-once.

Run :func:`~rdw_spark.operators.similarity.ivf_compact` on the maintenance
cadence (each batch adds a file per touched cell) and watch
:func:`cluster_stats` for quantizer drift — both documented on the batch
functions; the stream changes nothing about that contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from rdw_spark.operators.similarity import ivf_append

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), False),
])


def stream_ann_index(
    spark: SparkSession,
    landing_dir: str,
    index_path: str,
    checkpoint: str,
    schema: T.StructType | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Watch ``landing_dir`` for embedding parquet shards and append each
    micro-batch to the IVF index at ``index_path`` (which must already
    exist — build it once with :func:`ivf_index`; the stream maintains, it
    does not bootstrap, because a meaningful quantizer needs a
    representative corpus sample, not whichever shard happens to land
    first). ``schema`` defaults to ``(vec_id long, embedding
    array<float>)``; pass the index's own schema when it carries extra
    payload columns (they must be present on the landed shards —
    ``ivf_append`` selects the index's column set). Returns the
    StreamingQuery."""
    if not os.path.exists(os.path.join(index_path, "centroids.json")):
        raise ValueError(
            f"no IVF index at {index_path}; build one with ivf_index first "
            "(the stream maintains an index, it does not bootstrap one)"
        )
    raw = (
        spark.readStream.schema(schema or EMB_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf_append(
            batch_df.sparkSession, batch_df, index_path,
            id_col=id_col, vec_col=vec_col,
        )

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
