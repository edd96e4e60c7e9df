"""Tabulator package CSV source (S2): assessments + items incl. IRT params.

Reference format (docs/API.md:693-760; header in tools/TestPackage.csv — a
74-column tabulator export): one row per item, assessment metadata repeated
per row (AssessmentId/Name/Subject/Grade/Type/Version/AcademicYear), item
columns (FullItemKey, BankKey, ItemId, ItemType, DOK, MaxPoints, Claim,
Target, MathematicalPractice, CommonCore, IRT a/b0_b/b1_c), and overall cut
points (CutPoint1..4 with ScaledLow/High bands).

Spark shape: read CSV once; assessments = groupBy(AssessmentId).agg(first(...))
(one shuffle over a dim-sized input), items = per-row projection. Unknown
columns are simply ignored, so fuller tabulator exports parse unchanged.
"""

from __future__ import annotations

from io import StringIO

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_package_csv(spark: SparkSession, path_or_payload: str) -> DataFrame:
    if "\n" in path_or_payload:
        import pandas as pd

        pdf = pd.read_csv(StringIO(path_or_payload), dtype=str)
        return spark.createDataFrame(pdf.where(pd.notnull(pdf), None))
    return spark.read.csv(path_or_payload, header=True, inferSchema=False)


def parse_package(csv_df: DataFrame) -> dict[str, DataFrame]:
    """→ {"asmt": one row per assessment, "item": one row per item}."""
    grade2 = F.lpad(F.col("AssessmentGrade"), 2, "0")
    asmt = (
        csv_df.groupBy(F.col("AssessmentId").alias("natural_id"))
        .agg(
            F.first("AssessmentName", ignorenulls=True).alias("name"),
            F.first("AssessmentLabel", ignorenulls=True).alias("label"),
            F.first("AssessmentVersion", ignorenulls=True).alias("version"),
            F.lower(F.first("AssessmentType", ignorenulls=True)).alias("type_code"),
            F.first("AssessmentSubject", ignorenulls=True).alias("subject_code"),
            F.lpad(F.first("AssessmentGrade", ignorenulls=True), 2, "0").alias("grade_code"),
            F.first("AcademicYear", ignorenulls=True).cast("int").alias("school_year"),
            F.first("ScaledLow1", ignorenulls=True).cast("double").alias("min_score"),
            F.greatest(
                F.first("ScaledHigh1", ignorenulls=True).cast("double"),
                F.first("ScaledHigh2", ignorenulls=True).cast("double"),
                F.first("ScaledHigh3", ignorenulls=True).cast("double"),
                F.first("ScaledHigh4", ignorenulls=True).cast("double"),
            ).alias("max_score"),
            # cut point N = low edge of band N+1 (tabulator bands are
            # [ScaledLowN, ScaledHighN] per performance level)
            F.first("ScaledLow2", ignorenulls=True).cast("double").alias("cut_point_1"),
            F.first("ScaledLow3", ignorenulls=True).cast("double").alias("cut_point_2"),
            F.first("ScaledLow4", ignorenulls=True).cast("double").alias("cut_point_3"),
            F.lit(None).cast("double").alias("cut_point_4"),
        )
    )
    item = csv_df.select(
        F.col("AssessmentId").alias("asmt_natural_id"),
        F.col("FullItemKey").alias("key"),
        F.col("BankKey").alias("bank_key"),
        F.col("ItemPosition").cast("int").alias("position"),
        F.col("ItemType").alias("item_type"),
        F.col("DOK").cast("int").alias("dok_level"),
        F.col("MaxPoints").cast("int").alias("max_points"),
        F.col("Claim").alias("claim_code"),
        F.col("Target").alias("target_code"),
        F.col("MathematicalPractice").alias("math_practice"),
        F.col("CommonCore").alias("common_core_standard"),
        (F.col("PtWritingType") if "PtWritingType" in csv_df.columns
         else F.lit(None).cast("string")).alias("pt_writing_type"),
        F.col("a").cast("double").alias("irt_a"),
        F.col("b0_b").cast("double").alias("irt_b"),
        F.col("b1_c").cast("double").alias("irt_c"),
    ).filter(F.col("key").isNotNull())

    # item children (docs/Runbook.ImportMigrate.md:16): the standards
    # columns normalized one row per standard/target. Tabulator packs
    # multiple standards into one cell separated by ';' or '|';
    # SecondaryClaimContentTarget carries 'claim|target' pairs.
    def _opt(col: str):
        # simple-variant exports omit the standards columns entirely
        return F.col(col) if col in csv_df.columns else F.lit(None).cast("string")

    def _split_standards(col: str, secondary: bool) -> DataFrame:
        return (
            csv_df.select(
                F.col("AssessmentId").alias("asmt_natural_id"),
                F.col("FullItemKey").alias("item_key"),
                F.explode(F.split(_opt(col), r"[;|]")).alias("natural_id"),
                F.lit(secondary).alias("secondary"),
            )
            .withColumn("natural_id", F.trim("natural_id"))
            .filter(F.col("item_key").isNotNull() & (F.col("natural_id") != ""))
        )

    item_ccs = _split_standards("CommonCore", False).unionByName(
        _split_standards("SecondaryCommonCore", True)
    ).distinct()
    item_other_target = (
        csv_df.select(
            F.col("AssessmentId").alias("asmt_natural_id"),
            F.col("FullItemKey").alias("item_key"),
            F.trim(_opt("SecondaryClaimContentTarget")).alias("cct"),
        )
        .filter(F.col("item_key").isNotNull()
                & F.col("cct").isNotNull() & (F.col("cct") != ""))
        .select(
            "asmt_natural_id", "item_key",
            F.when(F.col("cct").contains("|"),
                   F.split(F.col("cct"), r"\|").getItem(0)).alias("claim_code"),
            F.when(F.col("cct").contains("|"),
                   F.split(F.col("cct"), r"\|").getItem(1))
            .otherwise(F.col("cct")).alias("target_code"),
        ).distinct()
    )
    # asmt_score child (docs/Runbook.ImportMigrate.md:16): the cut points
    # normalized one row per performance-level boundary — the same values
    # the flattened asmt.cut_point_1..4 carry for the scoring hot path
    cut_structs = [
        F.struct(F.lit(i + 1).alias("cut_point"),
                 F.col(f"cut_point_{i + 1}").alias("score"))
        for i in range(4)
    ]
    asmt_score = (
        asmt.select(
            F.col("natural_id").alias("asmt_natural_id"),
            F.explode(F.filter(
                F.array(*cut_structs), lambda s: s["score"].isNotNull()
            )).alias("cp"),
        )
        .select("asmt_natural_id",
                F.col("cp.cut_point").cast("int").alias("cut_point"),
                F.col("cp.score").alias("score"))
    )
    return {"asmt": asmt, "item": item,
            "item_common_core_standard": item_ccs,
            "item_other_target": item_other_target,
            "asmt_score": asmt_score}
