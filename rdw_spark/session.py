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
        # AQE coalescing is BYTES-based (parallelismFirst target, floored
        # at minPartitionSize=1m) — a CPU-dense stage over few megabytes
        # (n-gram explosion, per-vector folds, interpreted higher-order
        # exprs) gets coalesced onto 1-2 cores. A lower floor keeps such
        # stages parallel; stages whose bytes/parallelism exceed the floor
        # (any production-scale shuffle) are untouched because the
        # parallelism-first target dominates. Env-tunable; raise toward
        # the 1m default if task-launch overhead ever dominates profile.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "16k"))
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
