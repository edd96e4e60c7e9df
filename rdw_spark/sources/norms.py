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


def percentile_lookup(
    exams: DataFrame,
    percentile: DataFrame,
    percentile_score: DataFrame,
    asmt_col: str = "assessment_id",
    date_col: str = "completed_date",
    score_col: str = "scale_score",
) -> DataFrame:
    """Runtime use of the norms tables: map each exam's scale score to its
    national percentile — find the percentile table whose
    ``[start_date, end_date]`` covers the exam's completed date (unique by
    the parse-time non-overlap validation) and return the HIGHEST
    ``percentile_rank`` whose ``score <= scale_score`` (the reference's
    rank-row semantics, docs/Norms.md:12-37: rank rows are the score
    floors of each percentile band). Scores below the lowest rank row get
    NULL percentile; exams with no covering table keep NULL too (both
    left-join semantics — the report renders them as "no norms").

    Scale shape: norms are dims — rank rows collapse to ONE sorted array
    per table key (tiny), the exam→table match is a BROADCAST equi-join
    on assessment_id with the date-range predicate as join filter, and
    the band pick is a map-side array fold over the broadcast array.
    The fact never shuffles.
    """
    bands = percentile_score.groupBy("percentile_id").agg(
        F.array_sort(
            F.collect_list(F.struct("score", "percentile_rank"))
        ).alias("_bands")
    )
    tables = percentile.select(
        F.col("id").alias("percentile_id"),
        "assessment_id", "start_date", "end_date",
    ).join(bands, "percentile_id")
    e = exams
    joined = e.join(
        F.broadcast(tables),
        (e[asmt_col] == tables.assessment_id)
        & (e[date_col] >= tables.start_date)
        & (e[date_col] <= tables.end_date),
        "left",
    )
    s = F.col(score_col).cast("double")
    band = F.filter(F.col("_bands"), lambda b: b["score"] <= s)
    pct = F.when(
        F.size(band) > 0, F.element_at(band, -1)["percentile_rank"]
    ).cast("int")
    return joined.select(
        *[e[c] for c in exams.columns],
        F.col("percentile_id"),
        pct.alias("national_percentile"),
    )


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
