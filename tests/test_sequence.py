"""Event-sequence pattern matching: hand-checked symbol strings,
non-overlapping match counts, deterministic tie order, max_events cap,
and validation."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import types as T

from rdw_spark.operators.sequence import sequence_match

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
])


def _drain(q, timeout: int = 600) -> None:
    """Block until an availableNow query finishes (awaitTermination(t)
    returns False SILENTLY when t expires — the r10 shard flake)."""
    assert q.awaitTermination(timeout), f"stream drain exceeded {timeout}s"


def _ts(s):
    return datetime(2024, 1, 1, 0, 0, s)


def test_symbol_string_and_match_semantics(spark):
    rows = [
        # user 1: v v c p x v c p  -> 'vvcpvcp' (x unmapped), 2 matches
        (1, _ts(1), 1, "view"), (2, _ts(2), 1, "view"),
        (3, _ts(3), 1, "click"), (4, _ts(4), 1, "purchase"),
        (5, _ts(5), 1, "other"), (6, _ts(6), 1, "view"),
        (7, _ts(7), 1, "click"), (8, _ts(8), 1, "purchase"),
        # user 2: p c v (wrong order) -> no match
        (9, _ts(1), 2, "purchase"), (10, _ts(2), 2, "click"),
        (11, _ts(3), 2, "view"),
        # user 3: only unmapped events -> absent from output
        (12, _ts(1), 3, "other"),
    ]
    got = {r["user_id"]: r for r in sequence_match(
        spark.createDataFrame(rows, SCHEMA), "v+c+p",
        {"view": "v", "click": "c", "purchase": "p"}, ["user_id"],
    ).collect()}
    assert set(got) == {1, 2}
    assert got[1]["seq_len"] == 7
    assert got[1]["n_matches"] == 2 and got[1]["matched"]
    assert got[1]["first_match"] == "vvcp"
    assert got[2]["n_matches"] == 0 and not got[2]["matched"]
    assert got[2]["first_match"] == ""


def test_tie_order_and_max_events(spark):
    # same timestamp: order falls back to (symbol, id) — deterministic
    rows = [
        (2, _ts(1), 1, "click"), (1, _ts(1), 1, "view"),
        (3, _ts(1), 1, "purchase"),
    ]
    r = sequence_match(
        spark.createDataFrame(rows, SCHEMA), "vcp|cpv",
        {"view": "v", "click": "c", "purchase": "p"}, ["user_id"],
    ).collect()[0]
    # sort by (ts, sym, id): c(2) < p(3) < v(1) alphabetically -> 'cpv'
    assert r["first_match"] == "cpv"

    capped = sequence_match(
        spark.createDataFrame(rows, SCHEMA), "c",
        {"view": "v", "click": "c", "purchase": "p"}, ["user_id"],
        max_events=2,
    ).collect()[0]
    assert capped["seq_len"] == 2  # first two in sort order only


def test_repetition_pattern(spark):
    rows = [(i, _ts(i), 1, "error") for i in range(5)]
    r = sequence_match(
        spark.createDataFrame(rows, SCHEMA), "e{3}",
        {"error": "e"}, ["user_id"],
    ).collect()[0]
    assert r["seq_len"] == 5
    assert r["n_matches"] == 1  # non-overlapping: eee|ee -> one full match
    assert r["first_match"] == "eee"


def test_symbol_validation(spark):
    import pytest

    df = spark.createDataFrame([(1, _ts(1), 1, "view")], SCHEMA)
    with pytest.raises(ValueError, match="one char"):
        sequence_match(df, "v", {"view": "vw"}, ["user_id"])


def test_stream_sequence_state_equals_batch(spark, tmp_path):
    """Drained sequence state answers identically to the batch operator
    over the union of all drops — including a pattern that only matches
    ACROSS batch boundaries (the case per-batch matching cannot see)."""
    from rdw_spark.streaming.aggstate import (
        read_sequence_state, stream_sequence_state,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    syms = {"view": "v", "click": "c", "purchase": "p"}
    batches = [
        [(1, _ts(1), 1, "view"), (2, _ts(2), 1, "view")],
        [(3, _ts(3), 1, "click"), (4, _ts(4), 2, "view")],
        [(5, _ts(5), 1, "purchase"), (6, _ts(6), 2, "other")],
    ]
    all_rows = []
    for rows in batches:
        all_rows += rows
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(str(landing))

    q = stream_sequence_state(
        spark, str(landing), SCHEMA, str(tmp_path / "state"),
        str(tmp_path / "ckpt"), ["user_id"], syms, max_files_per_trigger=1)
    _drain(q)

    streamed = {r["user_id"]: r for r in read_sequence_state(
        spark, str(tmp_path / "state"), ["user_id"], "v+c+p").collect()}
    batch = {r["user_id"]: r for r in sequence_match(
        spark.createDataFrame(all_rows, SCHEMA), "v+c+p", syms,
        ["user_id"]).collect()}
    assert set(streamed) == set(batch) == {1, 2}
    for u in batch:
        for col in ("seq_len", "n_matches", "matched", "first_match"):
            assert streamed[u][col] == batch[u][col], (u, col)
    # the v+c+p match spans all three drops — only cross-batch state sees it
    assert streamed[1]["matched"] and streamed[1]["first_match"] == "vvcp"


def test_top_sequences_ranking_and_cap(spark):
    from rdw_spark.operators.sequence import top_sequences

    rows = []
    eid = 0
    # 3 users do v,c ; 2 users do v,p ; 1 user does v,c,x(unmapped),p
    for u, seq in [(1, "vc"), (2, "vc"), (3, "vc"), (4, "vp"), (5, "vp"),
                   (6, "vcp")]:
        for i, ch in enumerate(seq):
            et = {"v": "view", "c": "click", "p": "purchase"}[ch]
            rows.append((eid, _ts(i + 1), u, et))
            eid += 1
    df = spark.createDataFrame(rows, SCHEMA)
    syms = {"view": "v", "click": "c", "purchase": "p"}
    got = [(r["rank"], r["path"], r["n_entities"], r["pct"]) for r in
           top_sequences(df, syms, ["user_id"], n=2).collect()]
    assert got == [(1, "vc", 3, 0.5), (2, "vp", 2, 2 / 6)]

    # max_events truncation changes the path identity
    capped = {r["path"]: r["n_entities"] for r in top_sequences(
        df, syms, ["user_id"], n=10, max_events=1).collect()}
    assert capped == {"v": 6}
