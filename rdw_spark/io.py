"""Table loading for the driver-generated testdata star schema.

All reads go through an explicit-path ``spark.read.parquet`` so Catalyst
gets parquet pushdown + column pruning for free. ``register_views`` mirrors
the DuckDB oracle's pre-registered view names so ``spark.sql`` text matches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Settings the catalog queries rely on, applied defensively in case the
    caller (e.g. the driver) built the session without rdw_spark.session:
    UTC so timestamps collect identically to the DuckDB oracle, and the
    nanos-as-long legacy read for the events table's TIMESTAMP(NANOS)."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — non-runtime-settable in this build
            pass


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to one canonical type — TIMESTAMP (LTZ,
    µs) — regardless of how the parquet writer encoded it. Driver testdata
    has shipped both shapes across rounds:

    - ``TIMESTAMP(NANOS)`` → LongType nanos-since-epoch (under
      ``spark.sql.legacy.parquet.nanosAsLong``): integer floor-div to µs —
      a double division would lose precision above 2^53 ns;
    - ``timestamp[us]`` without tz → TIMESTAMP_NTZ: cast to LTZ, which is
      value-preserving because the session time zone is pinned to UTC;
    - TIMESTAMP (LTZ): already canonical.

    Everything downstream (windows, sessionization, oracle comparison)
    builds on this one type so a future testdata change lands here, once.
    """
    from pyspark.sql import functions as F, types as T

    for field in df.schema.fields:
        if field.name != col:
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(
                col, F.expr(f"timestamp_micros(CAST({col} DIV 1000 AS LONG))")
            )
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def spread_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW (scan-level) frame up to the
    session's default parallelism before CPU-heavy per-row work —
    hashing every n-gram, decoding media blobs, per-vector folds.

    A single-row-group parquet file scans as ONE task, so everything up
    to the first exchange runs serially no matter how many cores the
    session has (guide §6: scan-parallelism floor). This is a no-op
    whenever the plan already yields >= the target partition count —
    any real-scale input — so the added exchange only ever moves small
    inputs, and the multiset of rows is unchanged either way.

    Only call this on frames without upstream exchanges (scans +
    narrow projections): ``.rdd`` on a multi-stage plan would execute
    its query stages under AQE just to read the partition count."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_ts(df)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
