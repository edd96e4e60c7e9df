"""KMV set-operation sketches: bit-deterministic under any
partitioning, merge-equals-rebuild EXACTLY, estimates inside the
1/sqrt(k) envelope, overlap estimates track known ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdw_spark.operators.kmv import kmv_merge, kmv_overlap, kmv_sketch


def _drain(q, timeout: int = 600) -> None:
    """Block until an availableNow query finishes (awaitTermination(t)
    returns False SILENTLY when t expires — the r10 shard flake)."""
    assert q.awaitTermination(timeout), f"stream drain exceeded {timeout}s"


def _ids(spark, lo, hi, g="g0"):
    return spark.range(lo, hi).select(
        F.lit(g).alias("g"), F.col("id").alias("v"))


def test_exact_below_k_and_envelope_above(spark):
    small = kmv_sketch(_ids(spark, 0, 100), ["g"], "v", k=256).collect()[0]
    assert small["is_exact"] and small["n_distinct_est"] == 100.0
    assert len(small["kmv"]) == 100
    assert small["kmv"] == sorted(small["kmv"])

    big = kmv_sketch(_ids(spark, 0, 20_000), ["g"], "v", k=1024).collect()[0]
    assert not big["is_exact"] and len(big["kmv"]) == 1024
    # rsd ~ 1/sqrt(1024) ~ 3.1%; allow 4 sigma
    assert abs(big["n_distinct_est"] - 20_000) / 20_000 < 0.125


def test_partitioning_invariance_and_duplicates(spark):
    df = _ids(spark, 0, 5000).unionAll(_ids(spark, 0, 5000))  # every id twice
    s1 = kmv_sketch(df.repartition(13), ["g"], "v", k=512).collect()[0]
    s2 = kmv_sketch(df.repartition(2), ["g"], "v", k=512).collect()[0]
    assert s1["kmv"] == s2["kmv"]  # bit-identical
    # duplicates don't inflate: same sketch as the deduped set
    s3 = kmv_sketch(_ids(spark, 0, 5000), ["g"], "v", k=512).collect()[0]
    assert s1["kmv"] == s3["kmv"]


def test_merge_equals_rebuild_exactly(spark):
    whole = kmv_sketch(_ids(spark, 0, 10_000), ["g"], "v", k=512)
    halves = kmv_sketch(_ids(spark, 0, 6_000), ["g"], "v", k=512).unionByName(
        kmv_sketch(_ids(spark, 4_000, 10_000), ["g"], "v", k=512))
    merged = kmv_merge(halves, ["g"], k=512)
    w, m = whole.collect()[0], merged.collect()[0]
    assert w["kmv"] == m["kmv"]  # EXACT, not envelope
    assert w["n_distinct_est"] == m["n_distinct_est"]


def test_overlap_tracks_ground_truth(spark):
    # A = [0, 10000), B = [5000, 20000): |A|=10k, |B|=15k,
    # |A∩B|=5k, |A∪B|=20k, J=0.25, A-in-B containment=0.5
    a = kmv_sketch(_ids(spark, 0, 10_000, "x"), ["g"], "v", k=1024)
    b = kmv_sketch(_ids(spark, 5_000, 20_000, "x"), ["g"], "v", k=1024)
    r = kmv_overlap(a, b, ["g"], k=1024).collect()[0]
    assert abs(r["union_est"] - 20_000) / 20_000 < 0.125
    assert abs(r["jaccard_est"] - 0.25) < 0.06
    assert abs(r["intersect_est"] - 5_000) / 5_000 < 0.25
    assert abs(r["containment_a_in_b"] - 0.5) < 0.1
    assert abs(r["containment_b_in_a"] - 1 / 3) < 0.1


def test_disjoint_and_identical_sets(spark):
    a = kmv_sketch(_ids(spark, 0, 3_000, "x"), ["g"], "v", k=512)
    b = kmv_sketch(_ids(spark, 100_000, 103_000, "x"), ["g"], "v", k=512)
    r = kmv_overlap(a, b, ["g"], k=512).collect()[0]
    assert r["jaccard_est"] == 0.0 and r["intersect_est"] == 0.0

    r2 = kmv_overlap(a, a, ["g"], k=512).collect()[0]
    assert r2["jaccard_est"] == 1.0
    assert r2["containment_a_in_b"] == 1.0

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        kmv_sketch(_ids(spark, 0, 10), ["g"], "v", k=1)


def test_sketch_plan_shape(spark):
    """One distinct shuffle + one grouped collect; the rank-k window is a
    BOUNDED top-k — WindowGroupLimit for real group columns (map tasks
    keep only local top-k), or folded further to TakeOrderedAndProject
    when the group key is constant."""
    df = spark.range(0, 2000).select(
        F.concat(F.lit("g"), F.col("id") % 2).alias("g"),
        F.col("id").alias("v")).repartition(4)
    sk = kmv_sketch(df, ["g"], "v", k=64)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "pandas" not in plan.lower()  # all-JVM

    lit_g = kmv_sketch(_ids(spark, 0, 2000).repartition(4), ["g"], "v", k=64)
    lit_plan = lit_g._jdf.queryExecution().executedPlan().toString()
    assert ("WindowGroupLimit" in lit_plan
            or "TakeOrderedAndProject" in lit_plan), lit_plan


def test_stream_kmv_state_bit_identical_to_batch(spark, tmp_path):
    from pyspark.sql import types as T

    from rdw_spark.streaming.aggstate import read_kmv_state, stream_kmv_state

    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    landing = tmp_path / "landing"
    landing.mkdir()
    all_rows = []
    for b in range(3):
        rows = [("g0", (b * 700 + i) % 1500) for i in range(900)]
        all_rows += rows
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(str(landing))

    q = stream_kmv_state(
        spark, str(landing), schema, str(tmp_path / "state"),
        str(tmp_path / "ckpt"), ["g"], "v", k=256, max_files_per_trigger=1)
    _drain(q)

    batch = kmv_sketch(
        spark.createDataFrame(all_rows, schema), ["g"], "v", k=256
    ).collect()[0]
    streamed = read_kmv_state(
        spark, str(tmp_path / "state"), ["g"], k=256).collect()[0]
    assert batch["kmv"] == streamed["kmv"]  # bit-identical across drains
    assert batch["n_distinct_est"] == streamed["n_distinct_est"]
