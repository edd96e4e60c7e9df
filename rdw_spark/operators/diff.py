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


def population_stability_index(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    cuts: list[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a baseline ("expected" — the
    training/reference snapshot) and a current ("actual") distribution
    of ``value_col`` — the standard model/data drift gate
    (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

    ``cuts`` are EXPLICIT interior bin edges (derive them once from the
    baseline with ``approx_percentile`` and pin them — recomputing cuts
    per run hides drift in the bins themselves). Bins are
    ``(-inf, c1], (c1, c2], …, (ck, inf)``; NULLs are excluded (they are
    a schema-quality signal, not a distribution one — route them to
    ``expectations``). Shares are floored at ``eps`` so empty bins don't
    produce infinities (the standard PSI regularization).

    Returns one row per bin ``(bin, lo, hi, n_expected, n_actual,
    share_expected, share_actual, psi_term)`` plus the folded total on
    every row (``psi``) — terms folded in bin order, a deterministic
    sequential double sum (bins are few by construction).

    Scale shape: bin assignment is a map-side ``aggregate`` over the
    broadcast-tiny cut array (count of cuts below the value); each side
    pays ONE partial-agg shuffle at the bin grain; everything after is
    O(bins)."""
    if not cuts or sorted(cuts) != list(cuts):
        raise ValueError("cuts must be a non-empty ascending list")
    k = len(cuts)
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    v = F.col(value_col).cast("double")
    bin_of = F.aggregate(
        arr, F.lit(0),
        lambda acc, c: acc + F.when(v > c, F.lit(1)).otherwise(F.lit(0)))

    def side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.filter(v.isNotNull())
            .select(bin_of.alias("bin"))
            .groupBy("bin").agg(F.count(F.lit(1)).alias(f"n_{name}"))
        )

    spark = expected.sparkSession
    bins = spark.createDataFrame(
        [(i,
          float("-inf") if i == 0 else float(cuts[i - 1]),
          float("inf") if i == k else float(cuts[i]))
         for i in range(k + 1)],
        "bin int, lo double, hi double")
    j = (
        bins.join(side(expected, "expected"), "bin", "left")
        .join(side(actual, "actual"), "bin", "left")
        .na.fill({"n_expected": 0, "n_actual": 0})
    )
    tot = j.agg(F.sum("n_expected").alias("_te"),
                F.sum("n_actual").alias("_ta"))
    j = (
        j.crossJoin(F.broadcast(tot))
        .withColumn("share_expected", F.greatest(
            F.col("n_expected") / F.col("_te"), F.lit(float(eps))))
        .withColumn("share_actual", F.greatest(
            F.col("n_actual") / F.col("_ta"), F.lit(float(eps))))
        .withColumn(
            "psi_term",
            (F.col("share_actual") - F.col("share_expected"))
            * F.log(F.col("share_actual") / F.col("share_expected")))
    )
    total = j.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bin", "psi_term"))),
                lambda s: s["psi_term"],
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("psi"))
    return (
        j.crossJoin(F.broadcast(total))
        .select("bin", "lo", "hi", "n_expected", "n_actual",
                "share_expected", "share_actual", "psi_term", "psi")
        .orderBy("bin")
    )
