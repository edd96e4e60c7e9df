"""Row-level table diff — snapshot reconciliation.

Given two snapshots of a keyed table, classify every key as ``added``
(only in right), ``removed`` (only in left) or ``changed`` (present in
both with differing compare-column values), with per-column change
attribution. The row-level complement of the count-based K4
reconciliation report (docs/API.md:911-924): K4 tells you HOW MANY rows
drifted per day; this tells you WHICH rows and WHICH columns — the
migration-validation / CDC-audit primitive.

Plan shape: ONE full-outer equi-join on the key columns (single
co-partitioned shuffle of both sides — at 100 TB bucket both snapshots
by the key and the shuffle disappears), column comparison as codegen'd
null-safe equality, unchanged rows dropped before the result
materializes. No collect, no per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff ``right`` (new snapshot) against ``left`` (old): one row per
    key that was added / removed / changed, with ``changed_cols`` a
    comma-joined sorted list of differing columns (empty for
    added/removed). Unchanged keys are absent. NULL-vs-NULL compares
    equal (null-safe); NULL-vs-value is a change.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    compare_cols = compare_cols or [
        c for c in left.columns if c not in keys and c in right.columns
    ]
    missing = [c for c in keys + compare_cols if c not in left.columns or c not in right.columns]
    if missing:
        raise ValueError(f"columns absent from one side: {missing}")
    l = left.select(
        *[F.col(k).alias(f"_lk_{k}") for k in keys],
        *[F.col(c).alias(f"_l_{c}") for c in compare_cols],
        F.lit(True).alias("_in_l"),
    )
    r = right.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        *[F.col(c).alias(f"_r_{c}") for c in compare_cols],
        F.lit(True).alias("_in_r"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_lk_{k}") == F.col(f"_rk_{k}")
        cond = eq if cond is None else cond & eq
    j = l.join(r, cond, "full_outer")
    diffs = F.array_sort(
        F.filter(
            F.array(*[
                F.when(
                    ~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}")), F.lit(c)
                )
                for c in compare_cols
            ]),
            lambda x: x.isNotNull(),
        )
    )
    diff_type = (
        F.when(F.col("_in_l").isNull(), F.lit("added"))
        .when(F.col("_in_r").isNull(), F.lit("removed"))
        .when(F.size("_changed") > 0, F.lit("changed"))
    )
    return (
        j.withColumn("_changed", diffs)
        .withColumn("diff_type", diff_type)
        .filter(F.col("diff_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_lk_{k}"), F.col(f"_rk_{k}")).alias(k)
                for k in keys
            ],
            "diff_type",
            F.when(
                F.col("diff_type") == "changed",
                F.array_join("_changed", ","),
            ).otherwise(F.lit("")).alias("changed_cols"),
        )
    )
