"""Event-sequence pattern matching (MATCH_RECOGNIZE-lite): detect
regex-shaped behavioral patterns — "views, then clicks, then a
purchase", "three errors with no recovery between" — per entity over an
ordered event stream.

The funnel operator answers "did stages happen in order"; this answers
the strictly richer class of questions with repetition, alternation,
and adjacency ("v+c+p", "e{3,}", "s(v|c)*p"): each entity's events
become a SYMBOL STRING (one char per mapped event, in a deterministic
total (ts, symbol, id) order) and the pattern is a plain regular
expression over it — the classic trick that makes sequence queries
engine-portable, since any SQL engine with ordered string_agg + regexp
evaluates the identical semantics (the catalog entry is oracle-exact
against DuckDB doing exactly that).

Scale shape: one filter+map projects events to (group, ts, sym, id) —
unmapped event types are dropped BEFORE the shuffle — then ONE groupBy
builds the per-entity ordered array (``array_sort(collect_list)``), and
matching is JVM ``regexp_count``/``regexp_extract`` on the concatenated
string. Per-entity state is O(events-per-entity); ``max_events`` caps
pathological entities deterministically (first N in sort order), the
same guard the sessionizer uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sequence_match(
    events: DataFrame,
    pattern: str,
    symbols: dict[str, str],
    group_cols: list[str],
    ts_col: str = "ts",
    event_col: str = "event_type",
    id_col: str = "event_id",
    max_events: int | None = None,
) -> DataFrame:
    """One row per entity: ``(group…, seq_len, n_matches, matched,
    first_match)``. ``symbols`` maps event values to single characters
    (unmapped events are ignored); ``pattern`` is a regular expression
    over those characters. ``n_matches`` counts non-overlapping matches
    left-to-right (regexp_count semantics in both Spark and DuckDB);
    ``first_match`` is the first matched substring ('' when none).
    Entities none of whose events are mapped do not appear."""
    # one grouped build + the shared matching tail — the streaming state
    # reader (streaming.aggstate.read_sequence_state) runs the SAME tail
    # over merged deltas, so batch and streaming answers are identical
    # by construction
    seqs = sequence_delta(events, symbols, group_cols, ts_col, event_col,
                          id_col)
    return match_event_arrays(seqs, pattern, group_cols, max_events)


def sequence_delta(
    events: DataFrame,
    symbols: dict[str, str],
    group_cols: list[str],
    ts_col: str = "ts",
    event_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """One MERGEABLE summary row per entity for a batch of events:
    ``(group…, events)`` where ``events`` is the sorted array of
    ``(ts, sym, id)`` structs for the batch's mapped events. Merging =
    concatenate arrays and re-sort — deterministic (total struct order),
    so per-batch deltas fold to exactly the one-shot array: the
    streaming-state delta for :func:`read`-time sequence matching.
    State is O(mapped events per entity) by nature — sequence questions
    need the history; bound it upstream (symbol filter drops unmapped
    events map-side) or with a retention horizon at compaction."""
    for ev, sym in symbols.items():
        if len(sym) != 1:
            raise ValueError(f"symbol for {ev!r} must be one char, got {sym!r}")
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(symbols.items()) for x in kv])
    return (
        events.filter(F.col(event_col).isin(list(symbols)))
        .select(
            *group_cols,
            F.struct(
                F.col(ts_col).alias("ts"),
                F.element_at(mapping, F.col(event_col)).alias("sym"),
                F.col(id_col).alias("id"),
            ).alias("_e"),
        )
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_e")).alias("events"))
    )


def merge_sequence_deltas(
    deltas: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold per-batch deltas to the one-shot array per entity."""
    return deltas.groupBy(*group_cols).agg(
        F.array_sort(F.flatten(F.collect_list("events"))).alias("events"))


def match_event_arrays(
    seqs: DataFrame,
    pattern: str,
    group_cols: list[str],
    max_events: int | None = None,
) -> DataFrame:
    """The matching tail of :func:`sequence_match` over pre-built
    ``(group…, events)`` arrays — shared by the batch operator and the
    streaming state reader, so both paths give identical answers."""
    arr = F.col("events")
    if max_events is not None:
        arr = F.slice(arr, 1, max_events)
    pat = F.lit(pattern)
    out = seqs.select(
        *group_cols,
        F.concat_ws("", F.transform(arr, lambda e: e["sym"])).alias("seq"))
    return out.select(
        *group_cols,
        F.length("seq").alias("seq_len"),
        F.regexp_count(F.col("seq"), pat).alias("n_matches"),
        (F.regexp_count(F.col("seq"), pat) > 0).alias("matched"),
        F.regexp_extract(F.col("seq"), pattern, 0).alias("first_match"),
    )


def top_sequences(
    events: DataFrame,
    symbols: dict[str, str],
    group_cols: list[str],
    n: int = 10,
    max_events: int | None = 8,
    ts_col: str = "ts",
    event_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top user journeys: the ``n`` most common symbol paths (each
    entity's first ``max_events`` mapped events in deterministic order)
    with entity counts — the product-analytics "what do users actually
    do" question. Returns ``(rank, path, n_entities, pct)``; ties break
    by path string, so the ranking is total and engine-exact.

    Scale shape: the per-entity build is :func:`sequence_delta` (one
    shuffle); paths are O(max_events) strings, so the path count is a
    partial-agg shuffle over at most Σ|alphabet|^max_events distinct
    keys, and only n heads survive the bounded top-k."""
    from pyspark.sql import Window

    seqs = sequence_delta(events, symbols, group_cols, ts_col, event_col,
                          id_col)
    arr = F.col("events")
    if max_events is not None:
        arr = F.slice(arr, 1, max_events)
    paths = seqs.select(
        F.concat_ws("", F.transform(arr, lambda e: e["sym"])).alias("path"))
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_entities"))
    total = counts.agg(F.sum("n_entities").alias("_t"))
    w = Window.orderBy(F.col("n_entities").desc(), F.col("path").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .crossJoin(F.broadcast(total))
        .select(
            "rank", "path", "n_entities",
            (F.col("n_entities").cast("double") / F.col("_t")).alias("pct"),
        )
        .orderBy("rank")
    )
