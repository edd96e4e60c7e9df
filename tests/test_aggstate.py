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


def _drain(q, timeout: int = 600) -> None:
    """Block until an availableNow query finishes (awaitTermination(t)
    returns False SILENTLY when t expires — the r10 shard flake)."""
    assert q.awaitTermination(timeout), f"stream drain exceeded {timeout}s"


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
    _drain(q)

    full = agg_readout(agg_delta(
        spark.createDataFrame(all_rows, SCHEMA), ["g"], "v"))
    assert _canon(read_agg_state(spark, out, ["g"])) == _canon(full)

    # restart over the same checkpoint: nothing new -> state unchanged
    q = stream_incremental_agg(
        spark, str(landing), SCHEMA, out, ckpt, ["g"], "v",
        max_files_per_trigger=1)
    _drain(q)
    assert _canon(read_agg_state(spark, out, ["g"])) == _canon(full)

    # new drop after restart folds in
    _drop(spark, landing, "b3", [("g0", 1000.0), ("g3", 1.5)])
    all_rows += [("g0", 1000.0), ("g3", 1.5)]
    q = stream_incremental_agg(
        spark, str(landing), SCHEMA, out, ckpt, ["g"], "v",
        max_files_per_trigger=1)
    _drain(q)
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

    # crash-replay after compaction: structured streaming may replay the
    # newest batch; its append_rows(tag=top) must land as an idempotent
    # self-overwrite (the tag dirs survived the rebase), NOT double-count
    # against the compacted base
    top = max(i for i in ids if i >= 0)
    replayed = pt.read(spark).filter(f"batch_id = {top}")
    n_state = pt.read(spark).count()
    pt.append_rows(spark, replayed, tag=top)
    assert pt.read(spark).count() == n_state
    assert _canon(read_agg_state(spark, out, ["g"])) == _canon(full2)


def test_stream_sketch_states_quantile_and_topk(spark, tmp_path):
    """Sketch twins over the generic mergeable-state core: a multi-batch
    quantile-state drain answers within the digest's envelope of the
    exact quantile, and the top-k state is exact when capacity fits —
    both reading from state rows only."""
    import numpy as np

    from rdw_spark.operators.quantiles import sketch_quantiles
    from rdw_spark.operators.freqitems import sketch_topk
    from rdw_spark.streaming.aggstate import (
        read_quantile_state, read_topk_state,
        stream_quantile_state, stream_topk_state,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    vals: list[float] = []
    items: list[str] = []
    for b in range(3):
        rows = []
        for i in range(2000):
            v = float((i * 37 + b * 11) % 500)
            it = f"i{(i * 7 + b) % 9}"
            vals.append(v)
            items.append(it)
            rows.append(("g", v, it))
        _drop_any(spark, landing, rows)

    schema = "g string, v double, item string"
    sdf = spark.createDataFrame([], schema)

    q = stream_quantile_state(
        spark, str(landing), sdf.schema, str(tmp_path / "qs"),
        str(tmp_path / "qck"), ["g"], "v", max_files_per_trigger=1)
    _drain(q)
    est = sketch_quantiles(
        read_quantile_state(spark, str(tmp_path / "qs"), ["g"]),
        [0.5, 0.9]).collect()[0]
    assert est["n"] == len(vals)
    spread = max(vals) - min(vals)
    assert abs(est["q_5"] - float(np.quantile(vals, 0.5))) <= 0.02 * spread
    assert abs(est["q_9"] - float(np.quantile(vals, 0.9))) <= 0.02 * spread

    q = stream_topk_state(
        spark, str(landing), sdf.schema, str(tmp_path / "ts"),
        str(tmp_path / "tck"), ["g"], "item", m=32, max_files_per_trigger=1)
    _drain(q)
    from collections import Counter

    truth = Counter(items)
    top = sketch_topk(
        read_topk_state(spark, str(tmp_path / "ts"), ["g"], m=32), 9
    ).collect()
    assert {r["item"]: r["count_lo"] for r in top} == dict(truth)
    assert all(r["count_lo"] == r["count_hi"] for r in top)  # exact: 9 <= m


def _drop_any(spark, landing, rows):
    spark.createDataFrame(
        rows, "g string, v double, item string"
    ).coalesce(1).write.mode("append").parquet(str(landing))
