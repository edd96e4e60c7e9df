"""Unified sketch cube: one scan materializes every sketch family, the
per-sketch contracts hold through the unified API, distinct registers
are bit-identical across partitionings/merges, and the streaming twin
maintains the same state."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdw_spark.operators.summary import (
    hll_estimate, merge_summary_cubes, summary_cube, summary_readout,
)

SPEC = [
    ("val", "quantile", "v", 100),
    ("cat", "topk", "c", 16),
    ("uid", "distinct", "u", 10),
    ("uidk", "kmv", "u", 256),
]

SCHEMA = T.StructType([
    T.StructField("g", T.StringType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("c", T.StringType()),
    T.StructField("u", T.LongType()),
])


def _drain(q, timeout: int = 600) -> None:
    """Block until an availableNow query finishes (awaitTermination(t)
    returns False SILENTLY when t expires — the r10 shard flake)."""
    assert q.awaitTermination(timeout), f"stream drain exceeded {timeout}s"


def _rows(n, seed):
    rng = np.random.default_rng(seed)
    vals = rng.normal(100.0, 15.0, n)
    cats = rng.zipf(1.8, n) % 12
    uids = rng.integers(0, n // 2 or 1, n)
    return [
        (f"g{i % 3}", float(vals[i]), f"c{int(cats[i])}", int(uids[i]))
        for i in range(n)
    ]


def test_summary_cube_contracts_per_family(spark):
    rows = _rows(6000, 7)
    df = spark.createDataFrame(rows, SCHEMA).repartition(8)
    cube = summary_cube(df, ["g"], SPEC).cache()
    out = {r["g"]: r for r in summary_readout(
        cube, SPEC, quantiles=(0.5, 0.99), topk=3).collect()}
    assert set(out) == {"g0", "g1", "g2"}

    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["g", "v", "c", "u"])
    for g, sub in pdf.groupby("g"):
        r = out[g]
        # quantile: digest estimate within the k2 rank envelope
        for q, col in ((0.5, "val_q5"), (0.99, "val_q99")):
            est = r[col]
            lo, hi = sub["v"].quantile(max(q - 0.02, 0)), sub["v"].quantile(
                min(q + 0.02, 1))
            assert lo <= est <= hi, (g, q, est, lo, hi)
        # topk: 12 distinct cats fit the m=16 budget -> counts exact,
        # ranking == pandas value_counts with (count desc, item asc) ties
        vc = sub["c"].value_counts()
        truth = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        assert r["cat_top"] == [i for i, _ in truth]
        assert r["cat_ntotal"] == len(sub)
        # distinct: HLL within 5% of exact at lgk=10 (~3.2% rsd)
        exact = sub["u"].nunique()
        assert abs(r["uid_distinct"] - exact) / exact < 0.05, (
            g, r["uid_distinct"], exact)
        # kmv: within the 1/sqrt(k) envelope (k=256 -> ~6.25%; 4 sigma)
        assert abs(r["uidk_distinct"] - exact) / exact < 0.25, (
            g, r["uidk_distinct"], exact)
    cube.unpersist()


def test_summary_cube_single_exchange_plan(spark):
    df = spark.createDataFrame(_rows(500, 1), SCHEMA).repartition(4)
    cube = summary_cube(df, ["g"], SPEC)
    plan = cube._jdf.queryExecution().executedPlan().toString()
    # exactly one shuffle of cube data (the input repartition(4) above is
    # the test's own RoundRobin exchange, not the cube's)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # and the scan feeds ONE python stage pair (partial map + grouped merge)
    assert plan.count("MapInPandas") == 1
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_merge_equals_rebuild_and_registers_bit_identical(spark):
    rows = _rows(4000, 11)
    df = spark.createDataFrame(rows, SCHEMA)
    half1 = spark.createDataFrame(rows[:2000], SCHEMA).repartition(5)
    half2 = spark.createDataFrame(rows[2000:], SCHEMA).repartition(3)

    full = summary_cube(df.repartition(7), ["g"], SPEC)
    merged = merge_summary_cubes(
        summary_cube(half1, ["g"], SPEC).unionByName(
            summary_cube(half2, ["g"], SPEC)),
        ["g"], SPEC)

    fr = {r["g"]: r for r in full.collect()}
    mr = {r["g"]: r for r in merged.collect()}
    assert set(fr) == set(mr)
    for g in fr:
        # register max-merge is partitioning-invariant: BIT-identical
        assert bytes(fr[g]["uid__regs"]) == bytes(mr[g]["uid__regs"])
        # kmv merge is EXACT: the k smallest of the union, any split
        assert list(fr[g]["uidk__kmv"]) == list(mr[g]["uidk__kmv"])
        # exact counters agree exactly; digest totals agree exactly
        assert fr[g]["cat__ntotal"] == mr[g]["cat__ntotal"]
        assert fr[g]["val__n"] == mr[g]["val__n"]
        assert fr[g]["val__vmin"] == mr[g]["val__vmin"]
        assert fr[g]["val__vmax"] == mr[g]["val__vmax"]

    # rollup to the ALL grain answers from the cube alone
    allg = merge_summary_cubes(
        full.withColumn("_all", F.lit("ALL")), ["_all"], SPEC)
    r = summary_readout(allg, SPEC, quantiles=(0.5,), topk=5).collect()[0]
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["g", "v", "c", "u"])
    exact = pdf["u"].nunique()
    assert abs(r["uid_distinct"] - exact) / exact < 0.05
    assert r["cat_ntotal"] == len(pdf)


def test_null_values_keep_hashes_bit_exact(spark):
    """A batch containing NULLs must not corrupt the int64 hashes: a
    nullable long column turns float64 in pandas and round-trips every
    xxhash64 through a 53-bit mantissa. Build with NULLs interleaved and
    assert the sketches are BIT-identical to a NULL-free build, the KMV
    arrays interoperate with operators.kmv, and merge==rebuild holds."""
    rows = []
    for i in range(3000):
        # xxhash64 values are full-width 64-bit (low bits ~always set)
        rows.append(("g0" if i % 2 else "g1", None, None,
                     None if i % 5 == 0 else i % 700))
    schema = SCHEMA
    spec = [("uid", "distinct", "u", 10), ("uidk", "kmv", "u", 256)]
    df = spark.createDataFrame(rows, schema)
    with_nulls = {r["g"]: r for r in
                  summary_cube(df.repartition(6), ["g"], spec).collect()}
    no_nulls = {r["g"]: r for r in summary_cube(
        df.filter(F.col("u").isNotNull()).repartition(3), ["g"],
        spec).collect()}
    for g in ("g0", "g1"):
        assert bytes(with_nulls[g]["uid__regs"]) == bytes(
            no_nulls[g]["uid__regs"])
        assert list(with_nulls[g]["uidk__kmv"]) == list(
            no_nulls[g]["uidk__kmv"])

    # interop: the cube's kmv arrays ARE operators.kmv sketches
    from rdw_spark.operators.kmv import kmv_sketch

    ks = {r["g"]: list(r["kmv"])
          for r in kmv_sketch(df, ["g"], "u", k=256).collect()}
    for g in ("g0", "g1"):
        assert list(with_nulls[g]["uidk__kmv"]) == ks[g]

    # merge == rebuild with NULLs present in both halves
    h1 = spark.createDataFrame(rows[:1500], schema).repartition(5)
    h2 = spark.createDataFrame(rows[1500:], schema).repartition(2)
    merged = {r["g"]: r for r in merge_summary_cubes(
        summary_cube(h1, ["g"], spec).unionByName(
            summary_cube(h2, ["g"], spec)), ["g"], spec).collect()}
    for g in ("g0", "g1"):
        assert bytes(merged[g]["uid__regs"]) == bytes(
            with_nulls[g]["uid__regs"])
        assert list(merged[g]["uidk__kmv"]) == list(
            with_nulls[g]["uidk__kmv"])


def test_hll_estimate_ranges():
    # empty -> 0 via linear counting (m*ln(m/m) = 0)
    assert hll_estimate(np.zeros(1 << 10, dtype=np.uint8)) == 0.0
    # saturated registers -> finite, large
    assert hll_estimate(np.full(1 << 10, 40, dtype=np.uint8)) > 1e9


def test_summary_cube_validation(spark):
    import pytest

    df = spark.createDataFrame(_rows(10, 3), SCHEMA)
    with pytest.raises(ValueError, match="non-empty"):
        summary_cube(df, ["g"], [])
    with pytest.raises(ValueError, match="unknown sketch kind"):
        summary_cube(df, ["g"], [("x", "bloom", "v", 8)])
    with pytest.raises(ValueError, match="duplicate"):
        summary_cube(df, ["g"], [("x", "topk", "c", 8),
                                 ("x", "distinct", "u", 10)])
    with pytest.raises(ValueError, match="lgk"):
        summary_cube(df, ["g"], [("x", "distinct", "u", 25)])


def test_stream_summary_state_twin(spark, tmp_path):
    from rdw_spark.streaming.aggstate import (
        compact_summary_state, read_summary_state, stream_summary_state,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    out, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    all_rows = []
    for b in range(3):
        rows = _rows(400, 100 + b)
        all_rows += rows
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(str(landing))

    q = stream_summary_state(
        spark, str(landing), SCHEMA, out, ckpt, ["g"], SPEC,
        max_files_per_trigger=1)
    _drain(q)

    batch = {r["g"]: r for r in summary_cube(
        spark.createDataFrame(all_rows, SCHEMA), ["g"], SPEC).collect()}
    streamed = {r["g"]: r for r in read_summary_state(
        spark, out, ["g"], SPEC).collect()}
    assert set(batch) == set(streamed)
    for g in batch:
        assert bytes(batch[g]["uid__regs"]) == bytes(streamed[g]["uid__regs"])
        assert batch[g]["val__n"] == streamed[g]["val__n"]
        assert batch[g]["cat__ntotal"] == streamed[g]["cat__ntotal"]

    # compaction folds history without changing the answer
    compact_summary_state(spark, out, ["g"], SPEC)
    after = {r["g"]: r for r in read_summary_state(
        spark, out, ["g"], SPEC).collect()}
    for g in batch:
        assert bytes(after[g]["uid__regs"]) == bytes(streamed[g]["uid__regs"])
        assert after[g]["val__n"] == streamed[g]["val__n"]
