"""Streaming incremental-aggregate state: multi-batch drain equals a
one-shot GROUP BY bit-exactly, restarts don't double-count, compaction
preserves the answer while shrinking state."""

from __future__ import annotations

from pyspark.sql import types as T

from rdw_spark.operators.ivm import agg_delta, agg_readout
from rdw_spark.streaming.aggstate import (
    agg_state_table, compact_agg_state, read_agg_state, stream_incremental_agg,
)

SCHEMA = T.StructType([
    T.StructField("g", T.StringType()),
    T.StructField("v", T.DoubleType()),
])


def _drop(spark, landing, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(str(landing))


def _canon(df):
    return {
        r["g"]: (r["n_rows"], r["n_values"], r["min_val"], r["max_val"],
                 r["sum_val"], r["avg_val"])
        for r in df.collect()
    }


def test_stream_agg_equals_one_shot_and_survives_restart(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    all_rows = []
    for b in range(3):
        rows = [(f"g{i % 3}", float(b * 10 + i)) for i in range(7)]
        rows.append(("g0", None))
        all_rows += rows
        _drop(spark, landing, f"b{b}", rows)

    q = stream_incremental_agg(
        spark, str(landing), SCHEMA, out, ckpt, ["g"], "v",
        max_files_per_trigger=1)
    q.awaitTermination(120)

    full = agg_readout(agg_delta(
        spark.createDataFrame(all_rows, SCHEMA), ["g"], "v"))
    assert _canon(read_agg_state(spark, out, ["g"])) == _canon(full)

    # restart over the same checkpoint: nothing new -> state unchanged
    q = stream_incremental_agg(
        spark, str(landing), SCHEMA, out, ckpt, ["g"], "v",
        max_files_per_trigger=1)
    q.awaitTermination(120)
    assert _canon(read_agg_state(spark, out, ["g"])) == _canon(full)

    # new drop after restart folds in
    _drop(spark, landing, "b3", [("g0", 1000.0), ("g3", 1.5)])
    all_rows += [("g0", 1000.0), ("g3", 1.5)]
    q = stream_incremental_agg(
        spark, str(landing), SCHEMA, out, ckpt, ["g"], "v",
        max_files_per_trigger=1)
    q.awaitTermination(120)
    full2 = agg_readout(agg_delta(
        spark.createDataFrame(all_rows, SCHEMA), ["g"], "v"))
    assert _canon(read_agg_state(spark, out, ["g"])) == _canon(full2)

    # compaction: same answer, state rows collapse toward O(groups)
    pt = agg_state_table(out, ["g"])
    before = pt.read(spark).count()
    compact_agg_state(spark, out, ["g"])
    after = pt.read(spark).count()
    assert after < before
    assert _canon(read_agg_state(spark, out, ["g"])) == _canon(full2)
    # batch-id layout: one base row per group (-1) + the newest batch's
    ids = {r["batch_id"] for r in pt.read(spark).select("batch_id").collect()}
    assert -1 in ids and len(ids) == 2
