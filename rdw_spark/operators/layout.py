"""Data-layout clustering: Z-order (Morton) keys for multi-dimensional
min/max pruning.

A parquet/Delta scan prunes row groups by per-file column min/max stats.
Sorting by ONE column gives perfect pruning on that column and none on the
others; interleaving the bits of several columns (the Z-order curve) gives
good pruning on ALL of them — points close on the curve are close in every
dimension, so each file covers a small bounding box. This is the layout
tool behind `OPTIMIZE ... ZORDER BY` in lakehouse engines, expressed here
as plain integer column arithmetic (shift/mask/or — whole-stage codegen,
no UDF, engine-portable).

Usage at scale: ``cluster_by_zorder(df, ["a", "b"]).write...`` once per
partition rewrite window; every later query filtering on ``a`` AND/OR
``b`` reads a fraction of the files. The key is deterministic integer
math, so layouts are reproducible and the oracle can verify the key
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Z-order key: bit ``i`` of column ``j`` lands at
    position ``i * n_cols + j``. Values are clamped to ``[0, 2^bits)`` —
    callers normalize first (rank, bucket, or truncate) so the clamp only
    guards stragglers. With n columns the key needs ``n * bits`` bits;
    keep it <= 63 (it is a signed long)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    cap = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.least(F.greatest(c.cast("long"), F.lit(0)), F.lit(cap))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def file_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file min/max/count for ``cols`` — the data-skipping report: what
    a stats-based scan planner sees. Run it over a freshly clustered
    dataset to VERIFY the layout delivers tight ranges (narrow boxes ⇒
    most files prune for a selective predicate) instead of trusting that
    it should. One pass, one partial-agg shuffle on the file name."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file").agg(*aggs)
        .withColumnRenamed("_file", "file")
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "_zkey",
) -> DataFrame:
    """Physically cluster ``df`` along the Z-order curve of ``cols``:
    range-repartition on the Morton key (so each output file owns a curve
    segment = a small bounding box in every dimension) and sort within
    partitions (so row groups inside a file are tight too). Write the
    result and min/max pruning works for predicates on ANY of ``cols``.
    The helper key column is dropped from the output."""
    key = morton_key([F.col(c) for c in cols], bits)
    d = df.withColumn(key_col, key)
    rp = (
        d.repartitionByRange(num_partitions, key_col)
        if num_partitions is not None
        else d.repartitionByRange(key_col)
    )
    return rp.sortWithinPartitions(key_col).drop(key_col)
