"""Streaming transition-matrix twin: batch parity across micro-batch
splits, boundary pairs across drops, replay idempotency, compaction."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import types as T

from rdw_spark.operators.timeseries import event_transitions
from rdw_spark.streaming.transitions import (
    compact_event_transitions,
    read_event_transitions,
    stream_event_transitions,
)

SCHEMA = T.StructType([
    T.StructField("user_id", T.IntegerType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("state", T.StringType()),
    T.StructField("event_id", T.IntegerType()),
])

T0 = dt.datetime(2024, 1, 1)


def _await_drain(q, timeout: int = 600) -> None:
    """Block until an availableNow query finishes (awaitTermination(t)
    returns False SILENTLY when t expires — the r10 shard flake)."""
    assert q.awaitTermination(timeout), f"stream drain exceeded {timeout}s"


def _rows():
    s = lambda sec: T0 + dt.timedelta(seconds=sec)
    # three event-time windows; u1 and u2 span windows (boundary pairs),
    # u3 lives in one, u4 appears only in the last
    return [
        # window 0
        [(1, s(0), "A", 1), (1, s(1), "B", 2), (2, s(2), "A", 3),
         (3, s(3), "A", 4), (3, s(4), "C", 5)],
        # window 1: u1 B->A boundary, u2 A->A boundary then A->B within
        [(1, s(10), "A", 6), (2, s(11), "A", 7), (2, s(12), "B", 8)],
        # window 2: u1 A->C boundary; u4 single event (no transitions yet)
        [(1, s(20), "C", 9), (4, s(21), "A", 10)],
    ]


def _drain(spark, tmp_path, name, drops, per_trigger=1):
    land = str(tmp_path / f"land_{name}")
    out = str(tmp_path / f"state_{name}")
    ckpt = str(tmp_path / f"ckpt_{name}")
    os.makedirs(land)
    for i, rows in enumerate(drops):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{land}/d{i}", mode="overwrite")
        # land files individually so maxFilesPerTrigger splits batches
        for f in os.listdir(f"{land}/d{i}"):
            if f.endswith(".parquet"):
                os.rename(f"{land}/d{i}/{f}", f"{land}/drop_{i}.parquet")
    q = stream_event_transitions(
        spark, land, SCHEMA, out, ckpt,
        "user_id", "ts", "state", "event_id",
        max_files_per_trigger=per_trigger,
    )
    _await_drain(q)
    return out


def _canon(df):
    return {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["prob"])
        for r in df.collect()
    }


def test_stream_matches_batch_across_splits(spark, tmp_path):
    drops = _rows()
    flat = [r for d in drops for r in d]
    batch = event_transitions(
        spark.createDataFrame(flat, SCHEMA),
        "user_id", "ts", "state", "event_id")
    expect = _canon(batch)
    # sanity: the fixture exercises boundary pairs (u1 B->A crosses
    # drops 0->1, A->C crosses 1->2; u2 A->A crosses 0->1)
    assert expect[("A", "A")][0] == 1 and ("A", "C") in expect

    # three drops, one per micro-batch
    out3 = _drain(spark, tmp_path, "split3", drops, per_trigger=1)
    got3 = _canon(read_event_transitions(spark, out3, "user_id"))
    assert got3 == expect

    # same events in a single batch
    out1 = _drain(spark, tmp_path, "split1", [flat], per_trigger=10)
    got1 = _canon(read_event_transitions(spark, out1, "user_id"))
    assert got1 == expect


def test_replay_and_compaction_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from rdw_spark.streaming.transitions import _tables

    out = _drain(spark, tmp_path, "replay", _rows(), per_trigger=1)
    expect = _canon(read_event_transitions(spark, out, "user_id"))

    pairs_pt, last_pt = _tables(out, "user_id")
    for pt in (pairs_pt, last_pt):
        rows = pt.read(spark)
        top = rows.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
        assert top >= 1  # multi-batch drain
        replayed = rows.filter(F.col("batch_id") == top)
        pt.append_rows(spark, replayed, tag=top)  # storage-level replay
    assert _canon(read_event_transitions(spark, out, "user_id")) == expect

    # compaction folds history but keeps the newest tag replayable
    vers = compact_event_transitions(spark, out, "user_id")
    assert set(vers) == {"pairs", "userlast"}
    assert _canon(read_event_transitions(spark, out, "user_id")) == expect
    rows = pairs_pt.read(spark)
    ids = {r["batch_id"] for r in rows.select("batch_id").collect()}
    assert -1 in ids and len(ids) == 2
    top = max(i for i in ids if i >= 0)
    pairs_pt.append_rows(
        spark, rows.filter(F.col("batch_id") == top), tag=top)
    assert _canon(read_event_transitions(spark, out, "user_id")) == expect
