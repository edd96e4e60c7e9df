"""Frequent-items sketch cube: exactness under capacity, the Misra-Gries
guarantee and bounds on truncating data, merge-vs-rebuild, determinism."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from rdw_spark.operators.freqitems import (
    merge_topk_sketches, sketch_topk, topk_sketch_rollup,
)


def test_exact_when_distinct_fits_capacity(spark):
    rows = [("g1", f"item{i % 7}") for i in range(700)] + [
        ("g2", "only"), ("g2", None)]
    df = spark.createDataFrame(rows, "g string, item string").repartition(8)
    sk = topk_sketch_rollup(df, ["g"], "item", m=16)
    got = {(r["g"], r["item"]): r for r in sketch_topk(sk, 16).collect()}
    # 7 distinct <= m: every count exact, zero dropped mass
    for i in range(7):
        r = got[("g1", f"item{i}")]
        assert r["count_lo"] == r["count_hi"] == 100
        assert r["n_total"] == 700
    assert got[("g2", "only")]["count_lo"] == 1
    assert got[("g2", "only")]["n_total"] == 1  # NULL ignored


def test_zipf_guarantee_bounds_and_merge(spark):
    """On a skewed stream with #distinct >> m: true counts sit inside
    [count_lo, count_hi], every item heavier than dropped_mass survives,
    and rolling up fine sketches agrees with rebuilding coarse."""
    rng = random.Random(11)
    items = [f"i{int(rng.paretovariate(1.1)) % 400}" for _ in range(20_000)]
    rows = [(f"g{j % 4}", it) for j, it in enumerate(items)]
    truth_fine: dict = {}
    truth_all = Counter()
    for g, it in rows:
        truth_fine.setdefault(g, Counter())[it] += 1
        truth_all[it] += 1
    df = spark.createDataFrame(rows, "g string, item string").repartition(16)

    fine = topk_sketch_rollup(df, ["g"], "item", m=32).cache()
    for r in fine.collect():
        truth = truth_fine[r["g"]]
        assert r["n_total"] == sum(truth.values())
        assert sum(r["counts"]) + r["dropped_mass"] == r["n_total"]
        for it, lo in zip(r["items"], r["counts"]):
            assert lo <= truth[it] <= lo + r["dropped_mass"]
        # Misra-Gries guarantee: anything heavier than the dropped mass
        # is present
        kept = set(r["items"])
        for it, n in truth.items():
            if n > r["dropped_mass"]:
                assert it in kept, (r["g"], it, n, r["dropped_mass"])

    merged = merge_topk_sketches(
        fine.withColumn("all", F.lit(1)), ["all"], m=32).collect()[0]
    assert merged["n_total"] == len(items)
    for it, lo in zip(merged["items"], merged["counts"]):
        assert lo <= truth_all[it] <= lo + merged["dropped_mass"]
    for it, n in truth_all.items():
        if n > merged["dropped_mass"]:
            assert it in set(merged["items"])

    # deterministic re-merge of the same partials
    a = merge_topk_sketches(fine, ["g"], m=8).collect()
    b = merge_topk_sketches(fine, ["g"], m=8).collect()
    assert {r["g"]: (r["items"], r["counts"]) for r in a} == {
        r["g"]: (r["items"], r["counts"]) for r in b}
    fine.unpersist()


def test_single_merge_shuffle_plan(spark):
    df = spark.createDataFrame([("a", "x")], "g string, item string")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        topk_sketch_rollup(df, ["g"], "item").explain("formatted")
    plan = buf.getvalue()
    assert plan.count("+- Exchange") == 1
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan
