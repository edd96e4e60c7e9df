"""Student-group CSV source (S3): strict-header CSV → group/membership/user tables.

Reference format (docs/StudentGroups.md:220-258): header
``group_name,school_natural_id,school_year,subject_code,student_ssid,group_user_login``;
``(group_name, school_natural_id, school_year)`` identifies a group; a row
optionally adds a student (ssid) and/or a user (login) to it. Header
mismatch is a hard validation error (docs/Troubleshooting.md:533). The
reference also requires input sorted by school/group/year — an artifact of
its streaming row-by-row loader; Spark is set-based so the requirement is
dropped by design (SURVEY.md §2.7 O3, intentional divergence; the optional
check is still available for format parity).

The reverse direction — reconstructing the CSV from the tables — is the K6
groups export (docs/StudentGroups.md:260-292): members ∪ user-logins with a
deterministic ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

GROUPS_HEADER = [
    "group_name", "school_natural_id", "school_year",
    "subject_code", "student_ssid", "group_user_login",
]
GROUPS_CSV_SCHEMA = T.StructType([
    T.StructField("group_name", T.StringType()),
    T.StructField("school_natural_id", T.StringType()),
    T.StructField("school_year", T.IntegerType()),
    T.StructField("subject_code", T.StringType()),
    T.StructField("student_ssid", T.StringType()),
    T.StructField("group_user_login", T.StringType()),
])

_KEY = ["group_name", "school_natural_id", "school_year"]


def read_groups_csv(spark: SparkSession, payload: str | bytes) -> DataFrame:
    """Parse + header validation. Raises ValueError on a bad header (the
    reference rejects the whole file, docs/Troubleshooting.md:533)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    lines = [ln for ln in payload.splitlines() if ln.strip()]
    header = [h.strip() for h in lines[0].split(",")]
    if header != GROUPS_HEADER:
        raise ValueError(
            f"invalid group CSV header: expected {','.join(GROUPS_HEADER)}"
        )
    rows = [ln.split(",") for ln in lines[1:]]
    df = spark.createDataFrame(
        [[c.strip() or None for c in r] for r in rows],
        T.StructType([T.StructField(c, T.StringType()) for c in GROUPS_HEADER]),
    )
    for f in GROUPS_CSV_SCHEMA.fields:
        df = df.withColumn(f.name, F.col(f.name).cast(f.dataType))
    return df


def parse_groups(
    csv_df: DataFrame, school_tbl: DataFrame, student_tbl: DataFrame,
) -> dict[str, DataFrame]:
    """→ {"student_group", "student_group_membership", "user_student_group",
    "errors"}; group id is a deterministic hash of the natural key; unknown
    schools/students become row-level errors (the reference fails those rows,
    docs/StudentGroups.md:129-154)."""
    school = school_tbl.select(
        F.col("natural_id").alias("school_natural_id"),
        F.col("id").alias("school_id"),
    )
    resolved = csv_df.join(F.broadcast(school), "school_natural_id", "left")

    errors = resolved.filter(F.col("school_id").isNull()).select(
        F.concat(F.lit("unknown school "), F.col("school_natural_id")).alias("error")
    )
    ok = resolved.filter(F.col("school_id").isNotNull())

    # subject_code comes from the group-defining rows; first non-null per key
    groups = (
        ok.groupBy(*_KEY, "school_id")
        .agg(F.first("subject_code", ignorenulls=True).alias("subject_code"))
        .withColumn("id", F.xxhash64("group_name", "school_id", "school_year"))
        .withColumn("name", F.col("group_name"))
        .withColumn("active", F.lit(True))
        .select("id", "name", "school_id", "school_year", "subject_code", "active")
    )
    g_key = groups.select(
        F.col("name").alias("group_name"),
        "school_id", "school_year", F.col("id").alias("student_group_id"),
    )

    members_raw = ok.filter(F.col("student_ssid").isNotNull()).join(
        F.broadcast(g_key), ["group_name", "school_id", "school_year"]
    )
    student = student_tbl.select(
        F.col("ssid").alias("student_ssid"), F.col("id").alias("student_id")
    )
    members = members_raw.join(F.broadcast(student), "student_ssid", "left")
    errors = errors.unionByName(
        members.filter(F.col("student_id").isNull()).select(
            F.concat(F.lit("unknown student "), F.col("student_ssid")).alias("error")
        )
    )
    membership = (
        members.filter(F.col("student_id").isNotNull())
        .select("student_group_id", "student_id").distinct()
    )
    users = (
        ok.filter(F.col("group_user_login").isNotNull())
        .join(F.broadcast(g_key), ["group_name", "school_id", "school_year"])
        .select("student_group_id", F.col("group_user_login").alias("user_login"))
        .distinct()
    )
    return {
        "student_group": groups,
        "student_group_membership": membership,
        "user_student_group": users,
        "errors": errors,
    }


def export_groups_csv(
    student_group: DataFrame, school: DataFrame, student: DataFrame,
    membership: DataFrame, user_group: DataFrame,
) -> DataFrame:
    """K6 groups export — members ∪ users with the reference's deterministic
    ordering (docs/StudentGroups.md:260-292)."""
    sch = school.select(F.col("id").alias("school_id"),
                        F.col("natural_id").alias("school_natural_id"))
    base = student_group.select(
        F.col("id").alias("student_group_id"),
        F.col("name").alias("group_name"), "school_id", "school_year", "subject_code",
    ).join(F.broadcast(sch), "school_id")

    member_rows = (
        base.join(membership, "student_group_id")
        .join(student.select(F.col("id").alias("student_id"),
                             F.col("ssid").alias("student_ssid")), "student_id")
        .select("group_name", "school_natural_id", "school_year", "subject_code",
                "student_ssid", F.lit(None).cast("string").alias("group_user_login"))
    )
    user_rows = (
        base.join(user_group, "student_group_id")
        .select("group_name", "school_natural_id", "school_year", "subject_code",
                F.lit(None).cast("string").alias("student_ssid"),
                F.col("user_login").alias("group_user_login"))
    )
    return (
        member_rows.unionByName(user_rows).distinct()
        .orderBy("group_name", "subject_code", "student_ssid")
    )
