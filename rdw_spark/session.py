"""SparkSession builder tuned for this engine.

Local-mode testing uses ``local[N]``; the config block is written so the
same settings are correct on a real multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy) —
  at 100 TB the static planner's estimates are wrong often enough that AQE
  is the difference between a working plan and a spilled one.
- shuffle.partitions sized to cores locally; on a cluster this is the
  *initial* number only, AQE coalesces/splits from there.
- Arrow enabled for every pandas_udf / applyInPandas boundary.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "rdw_spark", cpus: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is BYTES-based; its minPartitionSize floor stays
        # at the Spark default (1m). A lower floor (16k) was A/B-tested:
        # it keeps CPU-dense few-MB stages parallel (rouge/dsir ~0.6 s
        # each) but multiplies task-launch overhead across EVERY round of
        # the iterative graph/CC tier (kcore 3.2->15.0 s, k-hop 6.8->14.5,
        # ppr 6.7->10.3, wcc 5.7->9.2 solo at sf0.1) — a net loss. Stages
        # that need parallelism despite tiny bytes get it explicitly
        # (io.spread_scan / keyed repartition at the operator), not via a
        # session-wide floor. Env-tunable for cluster ops.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "1m"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # driver testdata writes TIMESTAMP(NANOS) parquet; read as long + convert
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
