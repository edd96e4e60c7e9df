"""Subject-config-driven scoring: performance levels from cut scores, and
percentile (norms) assignment.

The reference never hardcodes achievement levels — they come from the
subject XML (deploy/mini_subject_config.xml:10-54, performance levels with
``standardCutoff``) and the package's cut points (tools/TestPackage.csv
CutPoint1..4 / ScaledLow/High bands). SURVEY.md §7 hard part #4.

Both operators are pure DataFrame composition:
- performance level = 1 + (number of cut points ≤ score) — a ``CASE`` chain
  on broadcast-joined cut columns, fully codegen'd, no UDF;
- percentile rank = as-of/interval lookup (J8/A9): exam completed_at within
  the percentile table's [start_date, end_date], then the highest rank row
  whose min-inclusive score ≤ the exam's scale score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_performance_level(
    exam: DataFrame, asmt: DataFrame, score_col: str = "scale_score",
    out_col: str = "performance_level",
) -> DataFrame:
    """Attach the achievement level derived from the assessment's cut points.
    ``asmt`` needs (id, cut_point_1..4); broadcast — it is a dim."""
    cuts = F.broadcast(asmt.select(
        F.col("id").alias("asmt_id"),
        "cut_point_1", "cut_point_2", "cut_point_3", "cut_point_4",
    ))
    score = F.col(score_col)
    level = F.lit(1)
    for i in (1, 2, 3, 4):
        cut = F.col(f"cut_point_{i}")
        level = level + F.when(cut.isNotNull() & (score >= cut), 1).otherwise(0)
    joined = exam.join(cuts, "asmt_id", "left")
    return joined.withColumn(
        out_col, F.when(score.isNotNull(), level).otherwise(F.lit(None).cast("int"))
    ).drop("cut_point_1", "cut_point_2", "cut_point_3", "cut_point_4")


def met_standard(exam: DataFrame, subject_asmt_type: DataFrame) -> DataFrame:
    """Boolean met-standard flag from the subject config's standardCutoff
    (mini_subject_config.xml:12 ``standardCutoff="2"``)."""
    cfg = F.broadcast(subject_asmt_type.select(
        "subject_code", F.col("asmt_type_code").alias("type_code"), "standard_cutoff",
    ))
    return exam.join(cfg, ["subject_code", "type_code"], "left").withColumn(
        "met_standard",
        F.when(F.col("standard_cutoff").isNotNull(),
               F.col("performance_level") >= F.col("standard_cutoff")),
    ).drop("standard_cutoff")


def with_percentile_rank(
    exam: DataFrame, percentile: DataFrame, percentile_score: DataFrame,
    asmt: DataFrame | None = None,
) -> DataFrame:
    """A9/J8: percentile rank for each exam from the norms tables.

    Delegates to ``sources.norms.percentile_lookup`` — the canonical plan:
    rank rows collapse to ONE sorted array per table key (tiny), the
    exam→table match is a broadcast equi-join on assessment_id with the
    date-range predicate as join filter, and the band pick is a map-side
    array fold over the broadcast array. The fact never shuffles (the old
    shape here re-aggregated per exam id — a fact-sized shuffle).
    """
    from rdw_spark.sources.norms import percentile_lookup

    if asmt is not None:
        nat = asmt.select(F.col("id").alias("asmt_id"),
                          F.col("natural_id").alias("assessment_id"))
        exam = exam.join(F.broadcast(nat), "asmt_id", "left")
    with_date = exam.withColumn("_completed_date", F.to_date("completed_at"))
    out = percentile_lookup(
        with_date, percentile, percentile_score,
        asmt_col="assessment_id", date_col="_completed_date",
        score_col="scale_score",
    )
    return (
        out.withColumnRenamed("national_percentile", "percentile_rank")
        .drop("percentile_id", "_completed_date")
    )
