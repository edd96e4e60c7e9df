"""Bloom-filter join pruning — the pre-shuffle filter for joins whose
build side is too big to broadcast as ROWS but whose key SET fits in a
few megabytes of bits.

At 100 TB the expensive shape is ``fact JOIN dim`` where dim has, say,
10M keys: too big for a broadcast hash join, so both sides shuffle.
But a Bloom filter of those 10M keys at 1% fpp is ~12 MB — broadcast
THAT, drop the ~non-matching fact rows map-side, and the shuffle moves
only rows that (almost always) survive the join. False positives are
removed by the real join, so the result is EXACTLY the plain join —
which is why the catalog entry for this operator is oracle-exact
against the plain SQL join. (Spark's own InjectRuntimeFilter does this
for some shapes; this operator makes it explicit, tunable, and usable
where the optimizer can't see the opportunity — e.g. a pre-aggregated
or unioned build side.)

Implementation: Kirsch-Mitzenmacher double hashing — ``pos_i =
(h1 + i·h2) mod n_bits`` simulates ``n_hashes`` independent hashes from
two (Kirsch & Mitzenmacher 2006). Both hashes are JVM ``xxhash64``
(engine-stable, computed before any Python), the bit array builds as
per-partition numpy bitmaps OR-merged through one single-group reduce
(the summary-cube shape: partials → one Exchange → merge), and the
probe is one Arrow-batched pandas UDF doing vectorized bit tests — the
fact's columns never leave the JVM; only two int64 hash columns cross.

Deterministic by construction: same keys → bit-identical filter bytes
under any partitioning (OR is commutative/associative/idempotent).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEED1, _SEED2 = 42, 0x5BD1E995  # xxhash64 seeds for h1/h2


def _hash_cols(key: Column) -> list[Column]:
    # two independent 64-bit hashes; xxhash64's first arg is the seed
    # column set, so vary the seed by appending a literal discriminator
    return [
        F.xxhash64(key).alias("_h1"),
        F.xxhash64(key, F.lit(_SEED2)).alias("_h2"),
    ]


def _positions(h1: np.ndarray, h2: np.ndarray, n_hashes: int,
               n_bits: int) -> Iterator[np.ndarray]:
    u1 = h1.astype(np.int64).view(np.uint64)
    u2 = h2.astype(np.int64).view(np.uint64)
    for i in range(n_hashes):
        yield ((u1 + np.uint64(i) * u2) % np.uint64(n_bits)).astype(np.int64)


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> bytes:
    """Build the filter over the distinct non-NULL keys. Returns the
    packed bit array (``n_bits/8`` bytes) — small enough to close over
    in the probe UDF (Spark broadcasts task closures).

    fpp ≈ (1 − e^(−kn/m))^k: 8M bits / 5 hashes holds ~1M keys at <1%.
    Scale shape: per-partition bitmaps (map-side combine — key rows
    never shuffle), ONE single-group merge of O(partitions) bitmap rows.
    """
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    hashed = keys.filter(F.col(key_col).isNotNull()).select(
        *_hash_cols(F.col(key_col)))

    schema = T.StructType([T.StructField("bits", T.BinaryType())])

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bits >> 3, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            h1 = pdf["_h1"].to_numpy(dtype=np.int64)
            h2 = pdf["_h2"].to_numpy(dtype=np.int64)
            for pos in _positions(h1, h2, n_hashes, n_bits):
                np.bitwise_or.at(bits, pos >> 3,
                                 np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bytes(bits)]})

    partials = hashed.mapInPandas(build, schema)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bits >> 3, dtype=np.uint8)
        for b in pdf["bits"]:
            np.bitwise_or(bits, np.frombuffer(b, dtype=np.uint8), out=bits)
        return pd.DataFrame({"bits": [bytes(bits)]})

    merged = partials.withColumn("_g", F.lit(0)).groupBy("_g").applyInPandas(
        merge, T.StructType([T.StructField("bits", T.BinaryType())]))
    rows = merged.collect()  # bounded: exactly one row of n_bits/8 bytes
    return bytes(rows[0]["bits"]) if rows else bytes(n_bits >> 3)


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: bytes,
    n_hashes: int = 5,
    keep_nulls: bool = False,
) -> DataFrame:
    """Filter to rows whose key MIGHT be in the filter (no false
    negatives; false positives at the filter's fpp). NULL keys are
    dropped by default (they can never equi-join) — pass
    ``keep_nulls=True`` for outer-join shapes that must retain them.

    Map-only: hashes stay JVM-side, the probe is one vectorized numpy
    bit test per Arrow batch over two int64 columns."""
    n_bits = len(bloom) * 8
    bits = np.frombuffer(bloom, dtype=np.uint8)

    @F.pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        a1 = h1.to_numpy(dtype=np.int64)
        a2 = h2.to_numpy(dtype=np.int64)
        ok = np.ones(len(a1), dtype=bool)
        for pos in _positions(a1, a2, n_hashes, n_bits):
            ok &= ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).astype(bool)
        return pd.Series(ok)

    key = F.col(key_col)
    hit = probe(F.xxhash64(key), F.xxhash64(key, F.lit(_SEED2)))
    cond = key.isNull() | hit if keep_nulls else key.isNotNull() & hit
    return df.filter(cond)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
    how: str = "inner",
) -> DataFrame:
    """``fact JOIN dim`` with the fact pre-pruned by a Bloom filter of
    dim's keys: bit-exactly the plain join (false positives are removed
    by the join itself), but the shuffle moves only fact rows that pass
    the filter — the explicit runtime-filter pattern for build sides too
    big to broadcast as rows. Inner and left-semi shapes only (pruning
    the left side of an outer join would drop rows the join must keep).
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(f"bloom pruning only valid for inner/semi joins, got {how!r}")
    bloom = bloom_build(dim.select(dim_key), dim_key, n_bits, n_hashes)
    pruned = bloom_might_contain(fact, fact_key, bloom, n_hashes)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
