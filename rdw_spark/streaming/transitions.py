"""Streaming twin of ``operators.timeseries.event_transitions``: a
continuously-maintained first-order Markov transition matrix over
per-key event sequences, exactly-once by the same construction as the
generic mergeable state (``streaming.aggstate``).

Transition counts are NOT a per-batch-independent summary: the pair
(last event of batch N, first event of batch N+1) for the same user
crosses the batch boundary. So the twin maintains TWO mergeable states:

- ``pairs/``    — (from_state, to_state, batch_id) → n, the per-batch
  delta counts (within-batch pairs + boundary pairs);
- ``userlast/`` — (user, batch_id) → last, each batch's per-user
  final event as a ``struct(ts, tie, state)``. The merged view (max of
  the structs per user) is the boundary state; argmax-by-(ts, tie) is
  exactly a struct max, so this is an ordinary mergeable summary.

Boundary pairs for batch N are computed from userlast AS OF batch N-1
(``batch_id < N`` — the compacted base is ``batch_id = -1`` and always
qualifies). That filter is what makes a REPLAYED batch deterministic:
the crashed attempt's own ``a<N>`` rows are excluded, so the recomputed
delta is byte-identical and its ``append_rows(tag=N)`` self-overwrites.
Per-batch cost: O(batch) for the within pairs, one bucket-pruned read
of the touched userlast buckets for the boundary join (one row per user
after compaction), O(batch groups) appended.

Landing contract: file drops must be per-user event-time ordered across
batches (each drop covers a later time window than the last — the same
contract as the sessionize/corpus twins). Within a batch, order is
pinned by (ts, tiebreak); ACROSS batches an out-of-order drop would
count a backwards boundary transition rather than error.

Read path (``read_event_transitions``) merges O(groups·batches) state
rows — never the facts — and row-normalizes on the O(states²) frame.
``compact_event_transitions`` folds both tables' history into one base
row per group from the maintenance window (single writer), keeping the
newest batch's tag dirs referenced (``compact_mergeable_state``).

Parity contract (pytest-locked): after draining event-time-ordered
drops, the maintained matrix is IDENTICAL to the batch
``event_transitions`` over the union of all drops — counts exact,
probabilities one integer-exact division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .aggstate import agg_state_table, compact_mergeable_state

_PAIR_COLS = ["from_state", "to_state"]


def _tables(out_root: str, user_col: str):
    return (
        agg_state_table(f"{out_root}/pairs", _PAIR_COLS),
        agg_state_table(f"{out_root}/userlast", [user_col]),
    )


def _merge_pairs(df: DataFrame) -> DataFrame:
    return df.groupBy(*_PAIR_COLS).agg(F.sum("n").alias("n"))


def _merge_userlast(user_col):
    def merge(df: DataFrame) -> DataFrame:
        return df.groupBy(user_col).agg(F.max("last").alias("last"))
    return merge


def stream_event_transitions(
    spark: SparkSession,
    landing_dir: str,
    read_schema,
    out_root: str,
    checkpoint: str,
    user_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Watch ``landing_dir`` (parquet drops in ``read_schema``) and
    maintain the transition-count state under ``out_root``. Returns the
    StreamingQuery."""
    pairs_pt, last_pt = _tables(out_root, user_col)
    raw = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession
        ev = batch_df.select(
            F.col(user_col).alias("_u"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tie"),
                F.col(state_col).alias("state"),
            ).alias("_e"),
        )
        w = Window.partitionBy("_u").orderBy(F.col("_e"))
        within = (
            ev.select(
                F.col("_e")["state"].alias("from_state"),
                F.lead("_e").over(w)["state"].alias("to_state"),
            )
            .filter(F.col("to_state").isNotNull())
        )
        # per-user batch endpoints: struct min/max = argmin/argmax (ts, tie)
        ends = ev.groupBy("_u").agg(
            F.min("_e").alias("_first"), F.max("_e").alias("_last")
        )
        boundary = None
        if last_pt.latest()[0] > 0:
            prior = (
                last_pt.read(s, parts=last_pt.parts_of(
                    ends.select(F.col("_u").alias(user_col))))
                .filter(F.col("batch_id") < int(batch_id))
                .groupBy(user_col)
                .agg(F.max("last").alias("_prior"))
            )
            boundary = (
                ends.join(prior, ends["_u"] == prior[user_col])
                .select(
                    F.col("_prior")["state"].alias("from_state"),
                    F.col("_first")["state"].alias("to_state"),
                )
            )
        all_pairs = within if boundary is None else within.unionByName(boundary)
        delta = (
            all_pairs.groupBy(*_PAIR_COLS)
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        pairs_pt.append_rows(s, delta, tag=batch_id)
        last_delta = ends.select(
            F.col("_u").alias(user_col), F.col("_last").alias("last"),
            F.lit(int(batch_id)).alias("batch_id"),
        )
        last_pt.append_rows(s, last_delta, tag=batch_id)

    writer = raw.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_event_transitions(spark: SparkSession, out_root: str,
                           user_col: str) -> DataFrame:
    """The live matrix — identical schema and values to the batch
    ``event_transitions`` over everything ingested."""
    pairs_pt, _ = _tables(out_root, user_col)
    counts = _merge_pairs(pairs_pt.read(spark).drop("batch_id"))
    row_total = F.sum("n").over(Window.partitionBy("from_state"))
    return counts.select(
        "from_state", "to_state",
        F.col("n").alias("n_transitions"),
        (F.col("n").cast("double") / row_total).alias("prob"),
    )


def compact_event_transitions(spark: SparkSession, out_root: str,
                              user_col: str) -> dict:
    """Maintenance-window compaction of both states (single writer)."""
    return {
        "pairs": compact_mergeable_state(
            spark, f"{out_root}/pairs", _PAIR_COLS, _merge_pairs),
        "userlast": compact_mergeable_state(
            spark, f"{out_root}/userlast", [user_col],
            _merge_userlast(user_col)),
    }
