"""Bucketed co-located joins — the no-shuffle join path for fact-fact joins.

At 100 TB the expensive joins are fact-to-fact on a shared key (exam ⋈
exam_score on exam_id, exam ⋈ exam history on student_id). Broadcasting is
out (both sides huge) and a shuffle moves the whole table. Spark's answer
is bucketing: write both tables ``bucketBy(N, key)`` once, and every
subsequent equi-join on that key is Exchange-free — each task reads bucket
i of both sides (SMJ with no shuffle; with ``sortBy`` the sort is free
too). The write-side shuffle is paid once, then amortized over every join.

This is the metastore-table analog of the ``PartitionedTable`` layout (and
composes with it: partition by ``school_year``, bucket by ``student_id``).
``rdw_reports``-style readers take DataFrames, so handing them
``spark.table(name)`` of a bucketed table upgrades their joins with no
code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ optionally sort-clustered) parquet
    table in the session catalog. ``n_buckets`` should be sized so one
    bucket of the larger table fits an executor's memory at target scale
    (more buckets = more parallelism, smaller buckets)."""
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed` on
    the same key and bucket count. The plan contains no shuffle Exchange —
    verify with ``tests/test_bucketing.py``'s plan gate."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
