"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries are registered in ``rdw_spark.plans`` — one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from rdw_spark.plans.catalog import get_catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the RDW aggregate report shape (SURVEY §2.5 A7) —
    per-performance-level counts/percents sliced by segment × year."""
    return get_catalog()["a7_aggregate_report"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in sorted(get_catalog().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in sorted(get_catalog().items()) if q.oracle is not None
    }
