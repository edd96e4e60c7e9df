"""Incremental view maintenance for aggregate tables.

The 100 TB dashboard pattern: a GROUP BY over the full fact is a full
rescan per question, but the distributive aggregates (count / sum / min /
max, and everything algebraic over them — avg, later moments) maintain
under inserts from per-batch PARTIAL STATE alone: each micro-batch or
load contributes its own O(groups) delta, and merging deltas is a
groupBy over state rows, never over facts. This is the materialized-view
maintenance identity (merge(delta(A), delta(B)) == agg(A ∪ B)) that
Spark itself exploits inside partial aggregation — lifted to a USER
table that persists across jobs (store it in a ``PartitionedTable`` /
``TableStore`` and `merge_rows` by group key; composition is the
caller's choice).

Exactness contract: sums accumulate in decimal(27, 6) (exact, associative
— the ``_dsum`` pattern), so the merged state is BIT-IDENTICAL to a
single-pass aggregation in any batch order, any partitioning, any
engine: the catalog oracle proves merge(delta, delta) == one DuckDB
GROUP BY over the union. Deletes/updates are out of scope (distributive
min/max are not subtractable); the reference pipeline's fact loads are
insert-only per batch, matching this contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(27, 6)"

_STATE_COLS = ("n_rows", "n_values", "sum_dec", "min_val", "max_val")


def agg_delta(batch: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """One batch's partial aggregate state per group:
    ``(group…, n_rows, n_values, sum_dec, min_val, max_val)``.
    One partial-agg shuffle over the batch; NULL values count in
    ``n_rows`` but not ``n_values``/``sum``/bounds (SQL aggregate
    semantics)."""
    v = F.col(value_col)
    return batch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(v).alias("n_values"),
        F.sum(v.cast(_DEC)).alias("sum_dec"),
        F.min(v.cast("double")).alias("min_val"),
        F.max(v.cast("double")).alias("max_val"),
    )


def merge_agg_state(*states: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge any number of state frames (prior state + new deltas) into
    one: a union + groupBy over O(groups) STATE rows — the fact is never
    touched. Associative and commutative, so batches can merge in any
    order or tree shape."""
    if not states:
        raise ValueError("need at least one state frame")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*group_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_values").alias("n_values"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )


def agg_readout(state: DataFrame) -> DataFrame:
    """Presentation view over a state frame: the maintained aggregates
    plus the algebraic derivations (``sum_val``/``avg_val`` as raw
    doubles — exactly what a one-shot decimal-accumulated GROUP BY over
    all rows would produce)."""
    # divide AFTER the decimal→double cast: double/long division is
    # engine-identical, decimal division scale rules are not
    return state.select(
        *[c for c in state.columns if c not in ("sum_dec",)],
        F.col("sum_dec").cast("double").alias("sum_val"),
        (F.col("sum_dec").cast("double") / F.col("n_values")).alias("avg_val"),
    )


def join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental maintenance for an INNER equi-join view ``A ⋈ B``
    under insert-only deltas: the rows this batch ADDS to the view are

        ΔV = (ΔA ⋈ (B_old ∪ ΔB)) ∪ (A_old ⋈ ΔB)

    — the classic delta-join identity (ΔA pairs with all of new B; old A
    pairs with ΔB; ΔA⋈ΔB is inside the first term, and counted once).
    Append ΔV to the materialized view and it stays equal to the full
    join of everything loaded, bit-exactly, in any batch order.

    Scale shape: deltas are batch-sized, so BOTH joins broadcast the
    delta side — the big old tables are probed in place, never shuffled
    (plan-gated in tests). Maintaining a 100 TB join view costs
    O(|Δ| · match) per batch instead of a full re-join; at that scale
    keep the view partitioned by the join key so the appends co-locate.

    Inner equi-join, insert-only (the ivm contract — deletes need
    subtractable state that min/max-style views don't have). Pass the
    EMPTY frame (``a_old.limit(0)``) for a side with no prior rows."""
    new_from_a = F.broadcast(a_delta).join(
        b_old.unionByName(b_delta), on, "inner")
    new_from_b = a_old.join(F.broadcast(b_delta), on, "inner")
    return new_from_a.unionByName(new_from_b)
