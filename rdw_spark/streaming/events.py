"""Streaming ops over the events table: watermarked windows + sessionization.

These give the engine the Structured Streaming surface the reference lacks
(SURVEY.md §2.10 T7 — optional for parity, required for the 100 TB tier):
- ``read_events_stream``: file-source readStream with the explicit schema
  (never inferred — §1.2), ``maxFilesPerTrigger`` for ingestion pacing;
- ``windowed_event_counts``: tumbling event-time windows with a watermark so
  late events are merged until the watermark passes, then state is dropped —
  bounded state at any scale;
- ``sessionize``: gap-based sessions per user via applyInPandasWithState
  (processing-time timeout), the documented pattern for custom stateful
  operators.

The batch variants (same column contract, runnable on a static DataFrame)
back the DuckDB-checked catalog entries — one logic definition, two run
modes, which is exactly Spark's unified batch/stream model.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# canonical events schema — used when the stream is defined before any file
# has landed (schema-from-file needs at least one footer to read)
EVENTS_RAW_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source readStream over the events table. The schema is taken
    from the files themselves (one footer read — streams require an explicit
    schema, inference is disabled by design) and ``ts`` is normalized via the
    same helper batch reads use, so legacy nanos-as-long, TIMESTAMP_NTZ and
    TIMESTAMP data all stream identically."""
    from rdw_spark.io import _ensure_session_confs, normalize_ts

    # same defensive confs as batch loads: nanosAsLong so legacy
    # TIMESTAMP(NANOS) files are readable at all, UTC so the NTZ→LTZ
    # normalization is value-preserving on a driver-built session
    _ensure_session_confs(spark)
    try:
        raw_schema = spark.read.parquet(path).schema
    except Exception:
        # source dir empty or not yet created — fall back to the canonical
        # declared schema so a stream can start ahead of data arrival (the
        # file source also needs the dir to exist for its initial listing)
        raw_schema = EVENTS_RAW_SCHEMA
        if "://" not in path:
            os.makedirs(path, exist_ok=True)
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return normalize_ts(stream)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Works on both a stream
    (watermark bounds state; late rows merge until it passes) and a static
    frame (watermark is a no-op) — same plan, same results."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    # decimal-accumulated sum: exact + associative, so stream/batch/oracle
    # all land on the identical double regardless of partial-agg order
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
             .alias("total_value"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n_events", "total_value")
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → effectively-once: drop replayed events by key
    ACROSS micro-batches. ``dropDuplicatesWithinWatermark`` keeps one row
    per key and bounds the dedup state to the watermark horizon — the
    at-scale contract (an unwatermarked streaming dropDuplicates grows
    state forever; the ingest tier's digest-dedup, import_log.accept, is
    this same idea for payloads). A duplicate arriving later than the
    watermark past its original is NOT caught — that is the documented
    trade: state is O(events per horizon), not O(all history).

    Works on a static frame too (plain dropDuplicates — exact, no
    horizon), so batch backfills and the stream share one call site.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])
_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def sessionize(events: DataFrame, gap_minutes: int = 30,
               timeout_ms: int = 30_000) -> DataFrame:
    """Gap-based sessions per user (applyInPandasWithState). A session closes
    when a new event arrives more than ``gap_minutes`` after the last one, or
    when the processing-time timeout fires with state pending."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n, total = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "n_events": n, "total_value": total,
            }])
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = []
        if state.exists:
            start_us, end_us, n, total = state.get
        else:
            start_us = end_us = None
            n, total = 0, 0.0
        for r in rows.itertuples(index=False):
            t_us = int(pd.Timestamp(r.ts).value // 1000)
            if start_us is None:
                start_us, end_us, n, total = t_us, t_us, 1, float(r.value or 0)
            elif t_us - end_us > gap_us:
                out.append((start_us, end_us, n, total))
                start_us, end_us, n, total = t_us, t_us, 1, float(r.value or 0)
            else:
                end_us = max(end_us, t_us)
                n += 1
                total += float(r.value or 0)
        state.update((start_us, end_us, n, total))
        state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame([
                {"user_id": user_id,
                 "session_start": pd.Timestamp(s, unit="us"),
                 "session_end": pd.Timestamp(e, unit="us"),
                 "n_events": c, "total_value": v}
                for s, e, c, v in out
            ])

    return events.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch-mode sessionization with identical output semantics, pure
    DataFrame ops (window lag + cumulative session ids) — the oracle-checkable
    twin of :func:`sessionize`, and the faster choice when the input is
    already at rest."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # NTZ-safe epoch seconds: timestamp→double casts are illegal for
    # TIMESTAMP_NTZ, but NTZ→LTZ is value-preserving under the pinned UTC
    # session TZ and unix_micros is exact (µs-integer) on LTZ.
    sec = F.unix_micros(F.col("ts").cast("timestamp_ltz")) / F.lit(1_000_000.0)
    with_gap = events.withColumn(
        "_new_session",
        (sec - F.lag(sec).over(w) > gap_minutes * 60).cast("long"),
    ).withColumn(
        "_session_no",
        F.sum(F.coalesce("_new_session", F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_gap.groupBy("user_id", "_session_no")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
             .alias("total_value"))
        .drop("_session_no")
    )


def stream_events_to_mart(
    spark: SparkSession,
    events_path: str,
    mart_root: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Continuously maintain the windowed-count mart from the event stream:
    readStream → watermarked tumbling aggregation → ``foreachBatch`` merge
    into a ``PartitionedTable`` keyed by window.

    Exactly-once effective semantics by composition: Spark's checkpoint
    makes each micro-batch replayable, the merge is replace-by-key (so a
    replayed batch lands idempotently), and the manifest rename publishes
    atomically (a crash mid-write leaves the previous snapshot visible).
    The mart partitions by window date, so a micro-batch — whose updated
    windows cluster near the watermark — rewrites only the last day or
    two of partitions, never the history (the same O(touched partitions)
    contract as the migrate marts).

    Returns the StreamingQuery; with ``available_now`` the stream drains
    the source and stops (the migrate runbook's catch-up mode).
    """
    from rdw_spark.warehouse.partstore import PartitionedTable

    pt = PartitionedTable(
        mart_root, "event_counts", "CAST(window_start AS DATE)",
        keys=["window_start", "window_end", "event_type"],
        sort_cols=("window_start", "event_type"),
    )
    agg = windowed_event_counts(
        read_events_stream(spark, events_path), window, watermark
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        pt.merge_rows(batch_df.sparkSession, batch_df)

    writer = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def attribution_pairs(
    views: DataFrame, purchases: DataFrame, window_minutes: int = 60
) -> DataFrame:
    """All (view, purchase) attribution pairs: a purchase joins every view
    by the same user in the preceding ``window_minutes`` —
    ``view_ts <= purchase_ts < view_ts + window``. Works identically on
    batch and streaming inputs (pass watermarked streams and this is
    Spark's canonical stream-stream interval join: the time bounds in the
    join condition + both watermarks let the engine expire join state, so
    state is O(window), not O(stream)).

    One equi-shuffle on user_id; the interval bounds evaluate as a
    post-join filter on the matched pairs, never a cross product.
    """
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    bound = F.col("view_ts") + F.expr(f"INTERVAL {int(window_minutes)} MINUTES")
    return v.join(p, "user_id").filter(
        (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") < bound)
    )


def stream_attribution(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint: str,
    window_minutes: int = 60,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming view→purchase attribution: one event stream split into
    two watermarked branches, stream-stream interval join, append sink.

    Both sides carry a watermark and the join condition bounds
    ``purchase_ts`` within ``[view_ts, view_ts + window)``, so Spark
    retains view-side state only until the purchase watermark passes the
    window bound — bounded state regardless of stream length. Results
    append exactly-once under the checkpoint (the file sink records
    committed batches in its manifest log).
    """
    evs = read_events_stream(spark, events_path)
    views = evs.filter(F.col("event_type") == "view").withWatermark("ts", watermark)
    purchases = evs.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    joined = attribution_pairs(views, purchases, window_minutes)
    writer = (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def sessionize_windowed(events: DataFrame, gap_minutes: int = 30,
                        watermark_minutes: int | None = None) -> DataFrame:
    """Gap-based sessions via the JVM-NATIVE ``session_window`` — the
    scale path next to :func:`sessionize` (whose per-group Python loop
    pays an Arrow round-trip per micro-batch): merging session windows
    live in the JVM state store, stay whole-stage-friendly, and evict by
    watermark. Identical session semantics to
    :func:`sessionize`/:func:`sessionize_batch` — a new session starts
    when ``ts - prev > gap`` (an event at EXACTLY the gap merges; probed
    against the built-in), ``session_end`` is the last event's ts (the
    built-in's ``window.end`` would be last+gap).

    Works unchanged on batch frames (the parity pytest runs it both
    ways). Streaming callers must pass ``watermark_minutes`` (append
    mode emits a session only once the watermark passes its close — an
    open session flushes on the next watermark advance, where the
    Python sessionizer uses a processing-time timeout instead).
    """
    df = events
    if watermark_minutes is not None:
        df = df.withWatermark("ts", f"{watermark_minutes} minutes")
    return (
        df.groupBy(
            "user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
            .alias("total_value"),
        )
        .drop("session_window")
    )
