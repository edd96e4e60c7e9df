"""Norms CSV source (S4): percentile tables with identity-row + rank-row layout.

Reference format (docs/Norms.md:12-37): a percentile table is keyed by
``(assessment_id, start_date, end_date)``; the first row of each key group
(the *identity row*) carries count/mean/stddev/min/max, following *rank rows*
carry only (percentile_rank, score). Validation rules reproduced here:
- ≥3 rank rows per table;
- percentile_rank strictly increasing, score non-decreasing within a table;
- date ranges for the same assessment_id must not overlap (J8's interval
  integrity: overlapping tables would make percentile lookup ambiguous).

Spark shape: the identity/rank split is ``first(col, ignorenulls)`` over a
window partitioned by the table key — no driver loops; overlap detection is
a range self-join on (assessment_id) which stays tiny (norms are dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

NORMS_CSV_SCHEMA = T.StructType([
    T.StructField("assessment_id", T.StringType()),
    T.StructField("start_date", T.DateType()),
    T.StructField("end_date", T.DateType()),
    T.StructField("count", T.LongType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("standard_deviation", T.DoubleType()),
    T.StructField("min_score", T.DoubleType()),
    T.StructField("max_score", T.DoubleType()),
    T.StructField("percentile_rank", T.IntegerType()),
    T.StructField("score", T.DoubleType()),
])

_KEY = ["assessment_id", "start_date", "end_date"]


def read_norms_csv(spark: SparkSession, path_or_payload: str) -> DataFrame:
    """Accepts a path or the raw CSV text."""
    if "\n" in path_or_payload or "," in path_or_payload.splitlines()[0]:
        import pandas as pd
        from io import StringIO

        pdf = pd.read_csv(StringIO(path_or_payload), dtype=str)
        raw = spark.createDataFrame(pdf.where(pd.notnull(pdf), None))
        for f in NORMS_CSV_SCHEMA.fields:
            raw = raw.withColumn(f.name, F.col(f.name).cast(f.dataType))
        return raw
    return spark.read.csv(path_or_payload, header=True, schema=NORMS_CSV_SCHEMA)


def parse_norms(
    spark: SparkSession, csv_df: DataFrame,
    default_min_score: float | None = None, default_max_score: float | None = None,
) -> dict[str, DataFrame]:
    """→ {"percentile": identity rows, "percentile_score": rank rows,
    "errors": validation messages}. ``percentile`` carries a deterministic
    ``id`` (hash of the table key) that ``percentile_score`` references."""
    w_key = Window.partitionBy(*_KEY)
    w_seq = w_key.orderBy(F.col("percentile_rank").asc_nulls_last())

    with_id = csv_df.withColumn("percentile_id", F.xxhash64(*_KEY))

    # identity row = row carrying count/mean (W3: first-over-window);
    # min/max fall back to configured scale bounds (Norms.md:33)
    identity = (
        with_id.withColumn("_rn", F.row_number().over(w_seq))
        .withColumn("_has_meta", F.col("count").isNotNull() | F.col("mean").isNotNull())
        .filter(F.col("_has_meta") & (F.col("_rn") == 1))
        .select(
            F.col("percentile_id").alias("id"), *_KEY, "count", "mean",
            "standard_deviation",
            F.coalesce("min_score", F.lit(default_min_score)).alias("min_score"),
            F.coalesce("max_score", F.lit(default_max_score)).alias("max_score"),
        )
    )
    ranks = with_id.select(
        "percentile_id", "percentile_rank", "score", *_KEY
    ).filter(F.col("percentile_rank").isNotNull())

    # --- validation (Norms.md:27-37) ---
    errs = []
    counts = ranks.groupBy(*_KEY).agg(F.count("*").alias("n")).filter(F.col("n") < 3)
    errs.append(counts.select(
        F.concat(F.lit("fewer than 3 rank rows for "), F.col("assessment_id")).alias("error")
    ))
    w_order = w_key.orderBy("percentile_rank")
    bad_order = (
        ranks.withColumn("_prev_rank", F.lag("percentile_rank").over(w_order))
        .withColumn("_prev_score", F.lag("score").over(w_order))
        .filter(
            (F.col("_prev_rank").isNotNull() & (F.col("percentile_rank") <= F.col("_prev_rank")))
            | (F.col("_prev_score").isNotNull() & (F.col("score") < F.col("_prev_score")))
        )
    )
    errs.append(bad_order.select(F.concat(
        F.lit("rank/score ordering violated at rank "),
        F.col("percentile_rank").cast("string"), F.lit(" of "), F.col("assessment_id"),
    ).alias("error")))
    # overlapping date ranges per assessment (Norms.md Import Rules / Overlap)
    a = identity.select("assessment_id", F.col("start_date").alias("s1"),
                        F.col("end_date").alias("e1"))
    b = identity.select("assessment_id", F.col("start_date").alias("s2"),
                        F.col("end_date").alias("e2"))
    overlap = a.join(b, "assessment_id").filter(
        (F.col("s1") < F.col("s2")) & (F.col("e1") >= F.col("s2"))
    )
    errs.append(overlap.select(F.concat(
        F.lit("overlapping date ranges for "), F.col("assessment_id")
    ).alias("error")))

    errors = errs[0]
    for e in errs[1:]:
        errors = errors.unionByName(e)

    return {
        "percentile": identity,
        "percentile_score": ranks.select(
            "percentile_id", "percentile_rank", "score"
        ),
        "errors": errors,
    }
