"""Bloom-filter join pruning: no false negatives ever, the pruned join
is exactly the plain join, the filter bytes are partitioning-invariant,
and pruning actually removes most non-matching rows."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rdw_spark.operators.bloom import (
    bloom_build, bloom_might_contain, bloom_pruned_join,
)


def test_no_false_negatives_and_partitioning_invariance(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom1 = bloom_build(keys.repartition(7), "k", n_bits=1 << 16)
    bloom2 = bloom_build(keys.repartition(2), "k", n_bits=1 << 16)
    # OR-merge is order/partitioning-invariant: bit-identical bytes
    assert bloom1 == bloom2
    # every inserted key passes (Bloom guarantee: no false negatives)
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    assert bloom_might_contain(probe, "k", bloom1).count() == 1000


def test_false_positive_rate_within_budget(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", n_bits=1 << 16, n_hashes=5)
    # 64k bits / 1000 keys / 5 hashes -> fpp ~ 1e-5; give it 100x slack
    misses = spark.range(1_000_000, 1_100_000).select(F.col("id").alias("k"))
    fp = bloom_might_contain(misses, "k", bloom).count()
    assert fp < 100, fp


def test_pruned_join_equals_plain_join(spark, sf_dir):
    from rdw_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    got = bloom_pruned_join(
        orders, cust, "o_custkey", "c_custkey", n_bits=1 << 16,
    ).select("o_orderkey", "c_name")
    want = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "c_name")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_pruning_selectivity_and_null_handling(spark):
    import pandas as pd

    dim_keys = spark.range(0, 100).select(F.col("id").alias("k"))
    bloom = bloom_build(dim_keys, "k", n_bits=1 << 16)
    fact = spark.createDataFrame(
        pd.DataFrame({"k": [float(i) for i in range(50)]
                      + [float(i) for i in range(10_000, 11_000)]
                      + [None]}).astype({"k": "Int64"}),
    )
    kept = bloom_might_contain(fact, "k", bloom)
    n = kept.count()
    # all 50 matches kept, ~all 1000 non-matches dropped, NULL dropped
    assert 50 <= n < 60, n
    assert kept.filter(F.col("k").isNull()).count() == 0
    kept_nulls = bloom_might_contain(fact, "k", bloom, keep_nulls=True)
    assert kept_nulls.filter(F.col("k").isNull()).count() == 1

    import pytest

    with pytest.raises(ValueError, match="inner/semi"):
        bloom_pruned_join(fact, dim_keys, "k", "k", how="left")
    with pytest.raises(ValueError, match="multiple of 8"):
        bloom_build(dim_keys, "k", n_bits=1001)


def test_empty_build_side(spark):
    empty = spark.range(0).select(F.col("id").alias("k"))
    bloom = bloom_build(empty, "k", n_bits=1 << 10)
    assert bloom == bytes(128)
    probe = spark.range(100).select(F.col("id").alias("k"))
    assert bloom_might_contain(probe, "k", bloom).count() == 0


def test_probe_matches_numpy_model(spark):
    """The JVM-hash + numpy probe agrees with a pure-driver replication
    of the same double-hash scheme (guards the uint64 arithmetic)."""
    from rdw_spark.operators.bloom import _SEED2, _positions

    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    n_bits = 1 << 12
    bloom = bloom_build(keys, "k", n_bits=n_bits, n_hashes=3)
    hashed = keys.select(
        F.xxhash64("k").alias("h1"),
        F.xxhash64("k", F.lit(_SEED2)).alias("h2")).collect()
    bits = np.frombuffer(bloom, dtype=np.uint8)
    for r in hashed:
        for pos in _positions(np.array([r["h1"]]), np.array([r["h2"]]),
                              3, n_bits):
            p = int(pos[0])
            assert bits[p >> 3] >> (p & 7) & 1 == 1
