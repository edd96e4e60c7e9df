"""Continuously-maintained mergeable state: the streaming twin of the
summary operators (``operators.ivm`` aggregates, ``operators.quantiles``
t-digests, ``operators.freqitems`` top-k summaries — anything whose
per-batch DELTA rows merge associatively per group).

Each micro-batch appends its own O(groups) summary delta to a
bucket-partitioned state table, keyed ``(group…, batch_id)`` and written
with ``append_rows(tag=batch_id)`` — so a replayed batch overwrites its
own version dirs byte-for-byte and the state is EXACTLY-ONCE BY
CONSTRUCTION, with no high-water-mark sidecar and no read-modify-write
of prior state on the hot path (per-batch cost is O(batch groups),
independent of history). Reading the live answer merges the deltas per
group (a groupBy over O(groups·batches) STATE rows, never the facts);
periodic compaction folds all-but-the-newest deltas into one base row
per group so the read stays O(groups).

For the ivm aggregates the arithmetic is decimal-exact and
merge-order-invariant, so the maintained answer is BIT-IDENTICAL to a
one-shot GROUP BY over everything ingested — pytest-locked across
multi-batch drains, replays, and compaction. Sketch deltas (digest,
top-k) inherit their operators' contracts: deterministic merges, error
envelopes instead of bit equality.
"""

from __future__ import annotations

from typing import Callable

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


# ---------------------------------------------------------------------------
# generic mergeable-state core
# ---------------------------------------------------------------------------

def stream_mergeable_state(
    spark: SparkSession,
    landing_dir: str,
    read_schema,
    out_root: str,
    checkpoint: str,
    group_cols: list[str],
    delta_fn: Callable[[DataFrame], DataFrame],
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Watch ``landing_dir`` (parquet drops in ``read_schema``); per
    micro-batch append ``delta_fn(batch)`` (one summary row per group)
    tagged with the batch id. Returns the StreamingQuery."""
    pt = agg_state_table(out_root, group_cols)
    raw = (
        spark.readStream.schema(read_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = delta_fn(batch_df).withColumn("batch_id", F.lit(int(batch_id)))
        pt.append_rows(batch_df.sparkSession, delta, tag=batch_id)

    writer = raw.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_mergeable_state(
    spark: SparkSession,
    out_root: str,
    group_cols: list[str],
    merge_fn: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """The live answer: ``merge_fn`` over every delta (and any compacted
    base) — touches only state rows."""
    pt = agg_state_table(out_root, group_cols)
    return merge_fn(pt.read(spark).drop("batch_id"))


def compact_mergeable_state(
    spark: SparkSession,
    out_root: str,
    group_cols: list[str],
    merge_fn: Callable[[DataFrame], DataFrame],
) -> int:
    """Fold all deltas EXCEPT the newest batch's into one base row per
    group (batch_id = -1), so reads stay O(groups) as batches accumulate.
    The newest batch's delta DIRS are kept referenced verbatim
    (``rebase(keep_versions={a<top>})``) — structured streaming only ever
    replays the last uncommitted batch, and its replayed append must land
    on its own tag dirs as an idempotent self-overwrite rather than
    double-count against a base that already absorbed it (folding those
    rows into plain version dirs, as ``overwrite`` would, breaks exactly
    that). Run from the maintenance window like ``maintain_corpus``
    (single writer per table). Returns the new snapshot version."""
    pt = agg_state_table(out_root, group_cols)
    rows = pt.read(spark)
    top = rows.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    if top is None:
        return 0
    base = merge_fn(
        rows.filter(F.col("batch_id") != top).drop("batch_id")
    ).withColumn("batch_id", F.lit(_BASE_BATCH))
    ver = pt.rebase(spark, base, keep_versions={f"a{top}"})
    pt.gc(keep_manifests=1)
    return ver


# ---------------------------------------------------------------------------
# ivm aggregates (bit-exact contract)
# ---------------------------------------------------------------------------

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
    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint, group_cols,
        lambda b: agg_delta(b, group_cols, value_col),
        max_files_per_trigger, available_now,
    )


def read_agg_state(
    spark: SparkSession, out_root: str, group_cols: list[str]
) -> DataFrame:
    return agg_readout(read_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: merge_agg_state(rows, group_cols=group_cols),
    ))


def compact_agg_state(
    spark: SparkSession, out_root: str, group_cols: list[str]
) -> int:
    return compact_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: merge_agg_state(rows, group_cols=group_cols),
    )


# ---------------------------------------------------------------------------
# sketch twins (their operators' determinism/error contracts)
# ---------------------------------------------------------------------------

def stream_quantile_state(
    spark: SparkSession, landing_dir: str, read_schema, out_root: str,
    checkpoint: str, group_cols: list[str], value_col: str,
    delta: int = 200, max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    from rdw_spark.operators.quantiles import quantile_sketch_rollup

    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint, group_cols,
        lambda b: quantile_sketch_rollup(b, group_cols, value_col, delta),
        max_files_per_trigger, available_now,
    )


def read_quantile_state(
    spark: SparkSession, out_root: str, group_cols: list[str],
    delta: int = 200,
) -> DataFrame:
    from rdw_spark.operators.quantiles import merge_quantile_sketches

    return read_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: merge_quantile_sketches(rows, group_cols, delta),
    )


def stream_topk_state(
    spark: SparkSession, landing_dir: str, read_schema, out_root: str,
    checkpoint: str, group_cols: list[str], item_col: str, m: int = 64,
    max_files_per_trigger: int = 100, available_now: bool = True,
):
    from rdw_spark.operators.freqitems import topk_sketch_rollup

    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint, group_cols,
        lambda b: topk_sketch_rollup(b, group_cols, item_col, m),
        max_files_per_trigger, available_now,
    )


def read_topk_state(
    spark: SparkSession, out_root: str, group_cols: list[str], m: int = 64
) -> DataFrame:
    from rdw_spark.operators.freqitems import merge_topk_sketches

    return read_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: merge_topk_sketches(rows, group_cols, m),
    )


def stream_summary_state(
    spark: SparkSession, landing_dir: str, read_schema, out_root: str,
    checkpoint: str, group_cols: list[str], spec,
    max_files_per_trigger: int = 100, available_now: bool = True,
):
    """Continuously maintain a full :func:`operators.summary.summary_cube`
    (every sketch family in one pass per micro-batch) — the unified
    maintenance path for the per-sketch twins above: one state table,
    one delta append per trigger, one merge on read."""
    from rdw_spark.operators.summary import summary_cube

    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint, group_cols,
        lambda b: summary_cube(b, group_cols, spec),
        max_files_per_trigger, available_now,
    )


def read_summary_state(
    spark: SparkSession, out_root: str, group_cols: list[str], spec
) -> DataFrame:
    from rdw_spark.operators.summary import merge_summary_cubes

    return read_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: merge_summary_cubes(rows, group_cols, spec),
    )


def compact_summary_state(
    spark: SparkSession, out_root: str, group_cols: list[str], spec
) -> int:
    from rdw_spark.operators.summary import merge_summary_cubes

    return compact_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: merge_summary_cubes(rows, group_cols, spec),
    )


def stream_kmv_state(
    spark: SparkSession, landing_dir: str, read_schema, out_root: str,
    checkpoint: str, group_cols: list[str], value_col: str, k: int = 1024,
    max_files_per_trigger: int = 100, available_now: bool = True,
):
    """Continuously maintain per-group KMV sketches (``operators.kmv``):
    per-batch sketch deltas merge EXACTLY (k smallest of a union come
    from the k smallest of each part), so the maintained sketch is
    bit-identical to one built over everything ingested — the strongest
    contract in the sketch family."""
    from rdw_spark.operators.kmv import kmv_sketch

    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint, group_cols,
        lambda b: kmv_sketch(b, group_cols, value_col, k),
        max_files_per_trigger, available_now,
    )


def read_kmv_state(
    spark: SparkSession, out_root: str, group_cols: list[str], k: int = 1024
) -> DataFrame:
    from rdw_spark.operators.kmv import kmv_merge

    return read_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: kmv_merge(rows, group_cols, k),
    )


def stream_sequence_state(
    spark: SparkSession, landing_dir: str, read_schema, out_root: str,
    checkpoint: str, group_cols: list[str], symbols: dict,
    ts_col: str = "ts", event_col: str = "event_type",
    id_col: str = "event_id",
    max_files_per_trigger: int = 100, available_now: bool = True,
):
    """Continuously maintain per-entity event-sequence state
    (``operators.sequence``): per micro-batch one mergeable
    (group, sorted (ts,sym,id) array) delta — unmapped events drop
    map-side, so state is O(mapped events), and the merged array is
    bit-identical to the one-shot build (total struct order)."""
    from rdw_spark.operators.sequence import sequence_delta

    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint, group_cols,
        lambda b: sequence_delta(b, symbols, group_cols, ts_col, event_col,
                                 id_col),
        max_files_per_trigger, available_now,
    )


def read_sequence_state(
    spark: SparkSession, out_root: str, group_cols: list[str],
    pattern: str, max_events: int | None = None,
) -> DataFrame:
    """The live answer: merged per-entity arrays run through the SAME
    matching tail as the batch operator, so streaming and batch answers
    are identical by construction."""
    from rdw_spark.operators.sequence import (
        match_event_arrays, merge_sequence_deltas,
    )

    merged = read_mergeable_state(
        spark, out_root, group_cols,
        lambda rows: merge_sequence_deltas(rows, group_cols),
    )
    return match_event_arrays(merged, pattern, group_cols, max_events)


def stream_postings_state(
    spark: SparkSession,
    landing_dir: str,
    read_schema,
    out_root: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Continuously maintain the positional inverted index
    (``operators.text.inverted_index``'s posting rows) as documents
    land: each micro-batch appends its own (token, doc) postings —
    documents arrive whole, so a batch's postings are final within the
    batch and merge by union + a last-writer-wins dedupe on read: a
    doc_id re-ingested in a later micro-batch fully supersedes its
    earlier postings (``read_postings_state`` keeps only rows from the
    doc's newest batch, so tokens DROPPED by the new version disappear
    too). ``doc_freq`` is a per-token rollup of the merged state, so it
    is computed on READ (carrying it in the delta would go stale as
    later batches add documents).

    A doc_id landing TWICE within one micro-batch is collapsed to one
    version before indexing (both copies would share a batch_id, so the
    read-side last-writer-wins couldn't separate them and tf/doc_freq
    would inflate). Within a batch a file source has no row order, so
    the winner is the lexicographically greatest text — an arbitrary
    but TOTAL order, deterministic under checkpoint replay."""
    from rdw_spark.operators.text import inverted_index

    def delta(b: DataFrame) -> DataFrame:
        one = b.groupBy(id_col).agg(F.max(text_col).alias(text_col))
        return inverted_index(one, text_col, id_col).drop("doc_freq")

    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint,
        ["token", id_col], delta,
        max_files_per_trigger, available_now,
    )


def read_postings_state(
    spark: SparkSession, out_root: str, id_col: str = "doc_id"
) -> DataFrame:
    """The live index: merged postings + the doc_freq rollup — matches
    a batch ``inverted_index`` over the LATEST version of every
    ingested document exactly. Last-writer-wins per document: only
    postings from each doc's newest batch survive (partitioned max over
    ``batch_id``, one doc-keyed window over O(state) rows), so a
    re-ingest both revises changed tokens and retires dropped ones —
    no write-once precondition on the landing stream."""
    from pyspark.sql import Window

    pt = agg_state_table(out_root, ["token", id_col])
    rows = pt.read(spark)
    latest = Window.partitionBy(id_col)
    merged = (
        rows.withColumn("_mb", F.max("batch_id").over(latest))
        .filter(F.col("batch_id") == F.col("_mb"))
        .drop("_mb", "batch_id")
    )
    docfreq = merged.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("doc_freq"))
    return merged.join(docfreq, "token")


def stream_skipgram_state(
    spark: SparkSession,
    landing_dir: str,
    read_schema,
    out_root: str,
    checkpoint: str,
    window: int = 2,
    text_col: str = "text",
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Continuously maintain skip-gram context-pair counts
    (``operators.text.skipgram_counts``) as documents land: pair counts
    are PURELY ADDITIVE across documents, so each micro-batch's delta
    (min_count=1 — the floor applies at READ, a pair rare so far may
    cross it later) merges by plain summation at the
    (tok_a, tok_b, dist) grain. Restart-safe via the mergeable-state
    contract (replayed batch = self-overwrite on its tag dirs)."""
    from rdw_spark.operators.text import skipgram_counts

    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint,
        ["tok_a", "tok_b", "dist"],
        lambda b: skipgram_counts(b, window=window, min_count=1,
                                  text_col=text_col),
        max_files_per_trigger, available_now,
    )


def read_skipgram_state(
    spark: SparkSession, out_root: str, min_count: int = 2
) -> DataFrame:
    """The live co-occurrence table: summed deltas with the min_count
    floor applied AFTER the merge — identical to a batch
    ``skipgram_counts`` over everything ingested (documents are
    self-contained for pair generation, so additivity is exact)."""
    return read_mergeable_state(
        spark, out_root, ["tok_a", "tok_b", "dist"],
        lambda rows: rows.groupBy("tok_a", "tok_b", "dist")
        .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_count),
    )


def stream_confusion_state(
    spark: SparkSession,
    landing_dir: str,
    read_schema,
    out_root: str,
    checkpoint: str,
    truth_col: str,
    pred_col: str,
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Continuously maintain the (truth, pred) confusion counts behind
    ``operators.profiling.classification_report`` as labeled rows land
    — the live eval dashboard for a deployed labeler (language-ID,
    quality tiers): counts are purely additive, so each micro-batch's
    confusion-grain delta merges by summation. Restart-safe via the
    mergeable-state contract."""
    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint,
        ["_t", "_p"],
        lambda b: b.groupBy(
            F.col(truth_col).alias("_t"), F.col(pred_col).alias("_p"))
        .agg(F.count(F.lit(1)).alias("_n")),
        max_files_per_trigger, available_now,
    )


def read_confusion_report(
    spark: SparkSession, out_root: str
) -> DataFrame:
    """The live per-class precision/recall/F1: summed confusion deltas
    run through the SAME metric tail as the batch operator
    (``classification_report``'s rollup), so streaming and batch
    reports are identical by construction."""
    from rdw_spark.operators.profiling import confusion_to_report

    merged = read_mergeable_state(
        spark, out_root, ["_t", "_p"],
        lambda rows: rows.groupBy("_t", "_p").agg(
            F.sum("_n").cast("long").alias("_n")),
    )
    return confusion_to_report(merged)


def compact_postings_state(
    spark: SparkSession, out_root: str, id_col: str = "doc_id"
) -> int:
    """Postings-aware compaction: the generic
    :func:`compact_mergeable_state` would fold old deltas with an
    identity merge and ERASE the batch_id that last-writer-wins needs —
    a doc re-ingested across two old batches would keep both versions
    forever. This variant applies the per-document max-batch dedupe
    WHILE folding, so the base holds exactly each doc's newest pre-top
    postings; the newest batch's delta dirs stay referenced verbatim
    (the replay-idempotence contract of the generic compactor). Reads
    after compaction still equal a batch ``inverted_index`` over the
    latest document versions."""
    from pyspark.sql import Window

    pt = agg_state_table(out_root, ["token", id_col])
    rows = pt.read(spark)
    top = rows.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
    if top is None:
        return 0
    latest = Window.partitionBy(id_col)
    base = (
        rows.filter(F.col("batch_id") != top)
        .withColumn("_mb", F.max("batch_id").over(latest))
        .filter(F.col("batch_id") == F.col("_mb"))
        .drop("_mb", "batch_id")
        .withColumn("batch_id", F.lit(_BASE_BATCH))
    )
    ver = pt.rebase(spark, base, keep_versions={f"a{top}"})
    pt.gc(keep_manifests=1)
    return ver


def stream_value_counts_state(
    spark: SparkSession,
    landing_dir: str,
    read_schema,
    out_root: str,
    checkpoint: str,
    value_col: str,
    max_files_per_trigger: int = 100,
    available_now: bool = True,
):
    """Continuously maintain per-distinct-value counts of a feature as
    rows land — the live ECDF behind :func:`read_ks_drift`'s drift
    monitor (is today's ingest distributed like the blessed reference
    snapshot?). Counts are purely additive, so each micro-batch's
    value-grain delta merges by summation; state is O(distinct values),
    not O(rows). Restart-safe via the mergeable-state contract."""
    return stream_mergeable_state(
        spark, landing_dir, read_schema, out_root, checkpoint, ["_v"],
        lambda b: b.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_n")),
        max_files_per_trigger, available_now,
    )


def read_ks_drift(
    spark: SparkSession,
    out_root: str,
    reference: DataFrame,
    value_col: str,
) -> DataFrame:
    """The live drift answer: two-sample Kolmogorov–Smirnov statistic
    between everything the stream has ingested (group a) and a frozen
    ``reference`` frame (group b) — the SAME exact-integer ECDF core as
    batch ``profiling.ks_test`` (``ks_from_counts``), so streaming and
    batch agree bit-for-bit by construction. The reference aggregates
    once per read; the merged state is the only other input — neither
    side rescans history."""
    from rdw_spark.operators.profiling import ks_from_counts

    live = read_mergeable_state(
        spark, out_root, ["_v"],
        lambda rows: rows.groupBy("_v").agg(
            F.sum("_n").cast("long").alias("_ca")),
    )
    ref = (
        reference.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_cb"))
    )
    per_val = (
        live.join(ref, "_v", "full")
        .select("_v", F.coalesce("_ca", F.lit(0)).alias("_ca"),
                F.coalesce("_cb", F.lit(0)).alias("_cb"))
    )
    return ks_from_counts(per_val)
