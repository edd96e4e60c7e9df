"""KMV (k-minimum-values) distinct sketches with SET OPERATIONS — the
overlap estimator HLL can't be.

HLL registers union perfectly but cannot intersect, so "how much of the
eval set's content appears in the training corpus" (contamination
rate), "how many users do these two segments share", or "what fraction
of corpus A is inside corpus B" need a different summary. A KMV sketch
(Bar-Yossef et al. 2002; Beyer et al. 2007) keeps the k smallest
distinct hash values of a set; because the k smallest of A ∪ B can be
computed from the k smallest of A and of B, sketches union EXACTLY
(merge-then-sketch ≡ sketch-of-whole, bit-identical), and Jaccard /
intersection / containment estimate from the union sketch's members.

Estimates: with U the union sketch (k-th smallest normalized hash
``u_k``), ``|A ∪ B| ≈ (k−1)/u_k`` (exact when the union has < k
distinct values), ``J(A,B) ≈ |{v ∈ U : v ∈ A_kmv ∧ v ∈ B_kmv}| / |U|``,
``|A ∩ B| ≈ J · |A ∪ B|``. Relative error ~ 1/sqrt(k) on the distinct
count; Jaccard error is binomial in k.

Everything is JVM column expressions — ``xxhash64`` for the value hash
(sign-bit-flipped so SIGNED array order equals UNSIGNED hash order),
one ``distinct`` shuffle + a rank-k window (WindowGroupLimit pushes the
top-k map-side) to build, ``array_union``/``array_intersect``/``slice``
to operate. No UDF anywhere, and every byte is bit-deterministic under
any partitioning — stronger than the t-digest/Misra-Gries contracts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SIGN = -9223372036854775808  # Long.MIN_VALUE: XOR flips the sign bit


def _zhash(value: Column) -> Column:
    """xxhash64 with the sign bit flipped: ascending SIGNED order of the
    result equals ascending UNSIGNED order of the raw hash, so array
    sorts and k-smallest windows see the uniform-[0,1) order KMV needs."""
    return F.xxhash64(value).bitwiseXOR(F.lit(_SIGN))


def _norm(zhash: Column) -> Column:
    """Map a flipped hash back to (0,1): (h/2^64 + 0.5) in double — the
    normalized uniform position the estimator divides by."""
    return zhash.cast("double") / F.lit(float(2**64)) + F.lit(0.5)


def _estimate(kmv: Column, k: int) -> Column:
    """(k−1)/u_k when the sketch is full; exact |set| when it isn't."""
    return F.when(
        F.size(kmv) < k, F.size(kmv).cast("double")
    ).otherwise(F.lit(float(k - 1)) / _norm(F.element_at(kmv, k)))


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 1024,
) -> DataFrame:
    """One sketch row per group: ``(group…, kmv array<long> (ascending,
    ≤ k entries), n_distinct_est, is_exact)``. NULL values are ignored.

    Scale shape: project to (group, zhash) → ``distinct`` (the one
    shuffle) → rank ≤ k per group (WindowGroupLimit: each map task keeps
    only its local top-k, so the window state is bounded) → one
    ``collect_list`` per group over ≤ k rows. The raw values never
    shuffle — only 8-byte hashes."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, _zhash(F.col(value_col)).alias("_z"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_z"))
    kept = hashed.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= k)
    out = kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("_z")).alias("kmv"))
    return out.select(
        *group_cols, "kmv",
        _estimate(F.col("kmv"), k).alias("n_distinct_est"),
        (F.size("kmv") < k).alias("is_exact"),
    )


def kmv_merge(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 1024,
) -> DataFrame:
    """Roll sketches up to a coarser grain (or fold per-batch deltas):
    union the hash arrays, keep the k smallest. EXACT: the k smallest of
    a union are always among the k smallest of each input, so the rolled
    sketch is bit-identical to one built from the raw union — the
    merge-equals-rebuild contract the probabilistic sketches only meet
    within an envelope."""
    merged = sketches.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1, k,
        ).alias("kmv")
    )
    return merged.select(
        *group_cols, "kmv",
        _estimate(F.col("kmv"), k).alias("n_distinct_est"),
        (F.size("kmv") < k).alias("is_exact"),
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    join_cols: list[str],
    k: int = 1024,
    suffixes: tuple = ("_a", "_b"),
) -> DataFrame:
    """Pairwise set-overlap estimates between two sketch tables keyed
    the same way (one row per key present in BOTH): ``union_est``,
    ``jaccard_est``, ``intersect_est``, and the directional containments
    ``containment_a_in_b`` / ``containment_b_in_a`` (≈ |A∩B|/|A|, the
    contamination-rate shape). Pure array expressions over the sketch
    rows — the original data is long gone."""
    sa, sb = suffixes
    fa = a.select(*join_cols, F.col("kmv").alias(f"kmv{sa}"),
                  F.col("n_distinct_est").alias(f"n{sa}"))
    fb = b.select(*join_cols, F.col("kmv").alias(f"kmv{sb}"),
                  F.col("n_distinct_est").alias(f"n{sb}"))
    j = fa.join(fb, join_cols)
    u = F.slice(
        F.array_sort(F.array_union(F.col(f"kmv{sa}"), F.col(f"kmv{sb}"))),
        1, k,
    )
    j = j.withColumn("_u", u)
    in_both = F.size(
        F.array_intersect(F.array_intersect(F.col("_u"), F.col(f"kmv{sa}")),
                          F.col(f"kmv{sb}")))
    j = (
        j.withColumn("union_est", _estimate(F.col("_u"), k))
        .withColumn(
            "jaccard_est",
            F.when(F.size("_u") > 0,
                   in_both.cast("double") / F.size("_u")).otherwise(F.lit(0.0)))
        .withColumn("intersect_est", F.col("jaccard_est") * F.col("union_est"))
    )
    return j.select(
        *join_cols, f"n{sa}", f"n{sb}", "union_est", "jaccard_est",
        "intersect_est",
        F.when(F.col(f"n{sa}") > 0,
               F.least(F.col("intersect_est") / F.col(f"n{sa}"), F.lit(1.0)))
        .otherwise(F.lit(0.0)).alias(f"containment{sa}_in{sb}"),
        F.when(F.col(f"n{sb}") > 0,
               F.least(F.col("intersect_est") / F.col(f"n{sb}"), F.lit(1.0)))
        .otherwise(F.lit(0.0)).alias(f"containment{sb}_in{sa}"),
    )
