"""Continuously-maintained aggregate state: the streaming twin of
``operators.ivm`` (incremental view maintenance).

Each micro-batch appends its own O(groups) partial-aggregate delta to a
bucket-partitioned state table, keyed ``(group…, batch_id)`` and written
with ``append_rows(tag=batch_id)`` — so a replayed batch overwrites its
own version dirs byte-for-byte and the state is EXACTLY-ONCE BY
CONSTRUCTION, with no high-water-mark sidecar and no read-modify-write
of prior state on the hot path (per-batch cost is O(batch groups),
independent of history). Reading the live aggregate merges the deltas
per group (``merge_agg_state`` — a groupBy over O(groups·batches) STATE
rows, never the facts); periodic compaction folds all-but-the-newest
deltas into one base row per group so the read stays O(groups).

Because the ivm arithmetic is decimal-exact and merge-order-invariant,
the maintained answer is BIT-IDENTICAL to a one-shot GROUP BY over
everything ingested — pytest-locked across multi-batch drains, replays,
and compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdw_spark.operators.ivm import agg_delta, agg_readout, merge_agg_state
from rdw_spark.warehouse.partstore import PartitionedTable

_BASE_BATCH = -1  # batch_id of compacted base rows


def agg_state_table(
    out_root: str, group_cols: list[str], buckets: int = 64
) -> PartitionedTable:
    cols = ", ".join(group_cols)
    return PartitionedTable(
        out_root, "agg_state", f"pmod(xxhash64({cols}), {buckets})",
        keys=[*group_cols, "batch_id"], sort_cols=tuple(group_cols),
    )


def stream_incremental_agg(
    spark: SparkSession,
    landing_dir: str,
    read_schema,
    out_root: str,
    checkpoint: str,
    group_cols: list[str],
    value_col: str,
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Watch ``landing_dir`` (parquet drops in ``read_schema``) and
    maintain the aggregate state. Returns the StreamingQuery."""
    pt = agg_state_table(out_root, group_cols)
    raw = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = agg_delta(batch_df, group_cols, value_col).withColumn(
            "batch_id", F.lit(int(batch_id)))
        pt.append_rows(batch_df.sparkSession, delta, tag=batch_id)

    writer = raw.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_agg_state(
    spark: SparkSession, out_root: str, group_cols: list[str]
) -> DataFrame:
    """The live aggregate: merge every delta (and any compacted base) per
    group and expose the readout columns. Touches only state rows."""
    pt = agg_state_table(out_root, group_cols)
    return agg_readout(
        merge_agg_state(pt.read(spark).drop("batch_id"), group_cols=group_cols)
    )


def compact_agg_state(
    spark: SparkSession, out_root: str, group_cols: list[str]
) -> int:
    """Fold all deltas EXCEPT the newest batch's into one base row per
    group (batch_id = -1), so reads stay O(groups) as batches accumulate.
    The newest batch's delta dirs are kept verbatim: structured streaming
    only ever replays the last uncommitted batch, and its replayed append
    must land on its own tag dirs (idempotent) rather than double-count
    against a base that already absorbed it. Run from the maintenance
    window like ``maintain_corpus`` (single writer per table). Returns
    the new snapshot version."""
    pt = agg_state_table(out_root, group_cols)
    rows = pt.read(spark)
    top = rows.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    if top is None:
        return 0
    old = rows.filter(F.col("batch_id") != top)
    base = merge_agg_state(
        old.drop("batch_id"), group_cols=group_cols
    ).withColumn("batch_id", F.lit(_BASE_BATCH))
    newest = rows.filter(F.col("batch_id") == top)
    ver = pt.overwrite(spark, base.unionByName(newest))
    pt.gc(keep_manifests=1)
    return ver
