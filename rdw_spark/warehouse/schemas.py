"""Hand-declared StructTypes for every warehouse table.

The reference's schemas are fixed and explicitly migrated, never inferred
(reference docs/Runbook.ManualDataModifications.md:12 "never make structural
table changes"; SURVEY.md §1.2). Every main table carries the lineage
columns that drive incremental migrate (reference
docs/Runbook.ImportMigrate.md:25-31): ``import_id``, ``update_import_id``,
``created``, ``updated`` (microsecond timestamps) and a soft-delete flag
``deleted`` where the reference has one.

Spark-first notes:
- surrogate ``id`` columns are LongType; at 100 TB they are assigned by
  hashing the natural key (``xxhash64``) rather than a global sequence —
  no driver round-trip, deterministic across retries.
- timestamps are TimestampType (µs native, matches the reference's µs
  semantics, reference docs/Runbook.Audit.md:141-143).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Lineage columns present on every main warehouse table
# (reference docs/Runbook.ImportMigrate.md:25-31).
LINEAGE_FIELDS = [
    T.StructField("import_id", T.LongType(), False),
    T.StructField("update_import_id", T.LongType(), False),
    T.StructField("created", T.TimestampType(), False),
    T.StructField("updated", T.TimestampType(), False),
]
DELETED_FIELD = T.StructField("deleted", T.BooleanType(), False)


def _tbl(*fields: T.StructField, lineage: bool = True, soft_delete: bool = False) -> T.StructType:
    out = list(fields) + (LINEAGE_FIELDS if lineage else [])
    if soft_delete:
        out.append(DELETED_FIELD)
    return T.StructType(out)


# --- import log (reference docs/Runbook.ImportMigrate.md:22-33; API.md:279-300) ---
IMPORT = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("status", T.IntegerType(), False),
    T.StructField("content", T.IntegerType(), False),       # content-type code
    T.StructField("contentType", T.StringType(), True),     # MIME of payload
    T.StructField("digest", T.StringType(), False),         # MD5 of payload
    T.StructField("batch", T.StringType(), True),
    T.StructField("creator", T.StringType(), True),
    T.StructField("created", T.TimestampType(), False),
    T.StructField("updated", T.TimestampType(), False),
    T.StructField("message", T.StringType(), True),         # JSON error array
])

# --- organization (reference docs/Runbook.ImportMigrate.md:17; Troubleshooting.md:545-551, 618-625) ---
DISTRICT = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("natural_id", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
)
SCHOOL = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("district_id", T.LongType(), False),
    T.StructField("natural_id", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("external_id", T.StringType(), True),
)

# --- students (reference docs/Runbook.Audit.md:516-527) ---
STUDENT = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("ssid", T.StringType(), False),
    T.StructField("first_name", T.StringType(), True),
    T.StructField("middle_name", T.StringType(), True),
    T.StructField("last_or_surname", T.StringType(), True),
    T.StructField("gender", T.StringType(), True),
    T.StructField("birthday", T.DateType(), True),
    T.StructField("inferred_school_id", T.LongType(), True),  # latest-exam school (Audit.md:441)
)
STUDENT_ETHNICITY = T.StructType([  # child table, no own lineage (Audit.md:61)
    T.StructField("student_id", T.LongType(), False),
    T.StructField("ethnicity", T.StringType(), False),
])

# --- assessments (PACKAGE content, reference docs/Runbook.ImportMigrate.md:16) ---
ASMT = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("natural_id", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("label", T.StringType(), True),
    T.StructField("version", T.StringType(), True),
    T.StructField("type_code", T.StringType(), False),      # ica | iab | sum
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("grade_code", T.StringType(), False),
    T.StructField("school_year", T.IntegerType(), False),
    T.StructField("min_score", T.DoubleType(), True),
    T.StructField("max_score", T.DoubleType(), True),
    T.StructField("cut_point_1", T.DoubleType(), True),
    T.StructField("cut_point_2", T.DoubleType(), True),
    T.StructField("cut_point_3", T.DoubleType(), True),
    T.StructField("cut_point_4", T.DoubleType(), True),
)
ITEM = T.StructType([  # child of asmt (tools/TestPackage.csv header)
    T.StructField("asmt_id", T.LongType(), False),
    T.StructField("key", T.StringType(), False),
    T.StructField("bank_key", T.StringType(), True),
    T.StructField("position", T.IntegerType(), True),
    T.StructField("item_type", T.StringType(), True),
    T.StructField("dok_level", T.IntegerType(), True),
    T.StructField("max_points", T.IntegerType(), True),
    T.StructField("claim_code", T.StringType(), True),
    T.StructField("target_code", T.StringType(), True),
    T.StructField("math_practice", T.StringType(), True),
    T.StructField("common_core_standard", T.StringType(), True),
    T.StructField("irt_a", T.DoubleType(), True),           # IRT params (API.md:719-721)
    T.StructField("irt_b", T.DoubleType(), True),
    T.StructField("irt_c", T.DoubleType(), True),
])

# --- exams (EXAM content, reference docs/Runbook.Audit.md:233-263) ---
EXAM = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("opp_id", T.StringType(), False),         # Opportunity@oppId
    T.StructField("opportunity", T.IntegerType(), True),
    T.StructField("asmt_id", T.LongType(), False),
    T.StructField("asmt_version", T.StringType(), True),
    T.StructField("type_code", T.StringType(), False),
    T.StructField("school_year", T.IntegerType(), False),
    T.StructField("student_id", T.LongType(), False),
    T.StructField("school_id", T.LongType(), False),
    T.StructField("grade_code", T.StringType(), False),     # GradeLevelWhenAssessed
    T.StructField("completeness", T.StringType(), True),
    T.StructField("administration_condition", T.StringType(), True),
    T.StructField("session_id", T.StringType(), True),
    T.StructField("scale_score", T.DoubleType(), True),
    T.StructField("scale_score_std_err", T.DoubleType(), True),
    T.StructField("performance_level", T.IntegerType(), True),
    T.StructField("completed_at", T.TimestampType(), False),
    # demographic/program flags captured at exam time (Audit.md:253-259)
    T.StructField("iep", T.BooleanType(), True),
    T.StructField("lep", T.BooleanType(), True),
    T.StructField("section504", T.BooleanType(), True),
    T.StructField("economic_disadvantage", T.BooleanType(), True),
    T.StructField("migrant_status", T.BooleanType(), True),
    T.StructField("language_code", T.StringType(), True),
    T.StructField("military_connected", T.StringType(), True),
    soft_delete=True,
)
EXAM_ITEM = T.StructType([  # child of exam (BulkDeleteExams.md:24-30)
    T.StructField("exam_id", T.LongType(), False),
    T.StructField("item_key", T.StringType(), False),
    T.StructField("position", T.IntegerType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("score_status", T.StringType(), True),
    T.StructField("response", T.StringType(), True),
])
EXAM_SCORE = T.StructType([  # one row per claim score (Audit.md:58)
    T.StructField("exam_id", T.LongType(), False),
    T.StructField("claim_code", T.StringType(), False),
    T.StructField("scale_score", T.DoubleType(), True),
    T.StructField("scale_score_std_err", T.DoubleType(), True),
    T.StructField("performance_level", T.IntegerType(), True),
])
EXAM_AVAILABLE_ACCOMMODATION = T.StructType([
    T.StructField("exam_id", T.LongType(), False),
    T.StructField("accommodation_code", T.StringType(), False),
])

# --- groups (GROUPS content, reference docs/StudentGroups.md:220-258) ---
STUDENT_GROUP = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("school_id", T.LongType(), False),
    T.StructField("school_year", T.IntegerType(), False),
    T.StructField("subject_code", T.StringType(), True),
    T.StructField("active", T.BooleanType(), False),
    T.StructField("creator", T.StringType(), True),
    soft_delete=True,
)
STUDENT_GROUP_MEMBERSHIP = T.StructType([
    T.StructField("student_group_id", T.LongType(), False),
    T.StructField("student_id", T.LongType(), False),
])
USER_STUDENT_GROUP = T.StructType([
    T.StructField("student_group_id", T.LongType(), False),
    T.StructField("user_login", T.StringType(), False),
])

# --- norms (NORMS content, reference docs/Norms.md:14-37) ---
PERCENTILE = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("assessment_id", T.StringType(), False),
    T.StructField("start_date", T.DateType(), False),
    T.StructField("end_date", T.DateType(), False),
    T.StructField("count", T.LongType(), True),
    T.StructField("mean", T.DoubleType(), True),
    T.StructField("standard_deviation", T.DoubleType(), True),
    T.StructField("min_score", T.DoubleType(), True),
    T.StructField("max_score", T.DoubleType(), True),
)
PERCENTILE_SCORE = T.StructType([
    T.StructField("percentile_id", T.LongType(), False),
    T.StructField("percentile_rank", T.IntegerType(), False),
    T.StructField("score", T.DoubleType(), False),
])

# --- accommodations (reference docs/API.md:622-691) ---
ACCOMMODATION = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("code", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
)
ACCOMMODATION_TRANSLATION = T.StructType([
    T.StructField("accommodation_id", T.LongType(), False),
    T.StructField("language_code", T.StringType(), False),
    T.StructField("label", T.StringType(), False),
])

# --- subject scoring model (SUBJECT content, reference deploy/mini_subject_config.xml) ---
SUBJECT = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("code", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
)
SUBJECT_ASMT_TYPE = T.StructType([  # per (subject, asmt type) scoring config
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("asmt_type_code", T.StringType(), False),
    T.StructField("min_score", T.DoubleType(), True),
    T.StructField("max_score", T.DoubleType(), True),
    T.StructField("standard_cutoff", T.IntegerType(), True),
    T.StructField("performance_level_count", T.IntegerType(), False),
    T.StructField("target_report", T.BooleanType(), True),
])
SUBJECT_PERFORMANCE_LEVEL = T.StructType([
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("asmt_type_code", T.StringType(), False),
    T.StructField("scoring", T.StringType(), False),        # overall | claim
    T.StructField("level", T.IntegerType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("color", T.StringType(), True),
])
DEPTH_OF_KNOWLEDGE = T.StructType([
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("reference", T.StringType(), True),
])
ITEM_DIFFICULTY_CUTS = T.StructType([
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("grade_code", T.StringType(), False),
    T.StructField("moderate_low_end", T.DoubleType(), False),
    T.StructField("difficult_low_end", T.DoubleType(), False),
])

# --- embargo (EMBARGO content, reference docs/Runbook.ManualDataModifications.md:23-32) ---
STATE_EMBARGO = _tbl(
    T.StructField("school_year", T.IntegerType(), False),
    T.StructField("subject_code", T.StringType(), True),    # NULL → all subjects
    T.StructField("individual", T.IntegerType(), False),    # 0=Loading,1=Reviewing,2=Released
    T.StructField("aggregate", T.IntegerType(), False),
)
DISTRICT_EMBARGO = _tbl(
    T.StructField("district_id", T.LongType(), False),
    T.StructField("school_year", T.IntegerType(), False),
    T.StructField("subject_code", T.StringType(), True),
    T.StructField("individual", T.IntegerType(), False),
    T.StructField("aggregate", T.IntegerType(), False),
)

# --- user_report: saved report requests (reference reporting DB,
# docs/Troubleshooting.md:425-437 — support queries it by JSON fields
# embedded in report_request, e.g. LIKE '%schoolID":6470%') ---
USER_REPORT = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("user_login", T.StringType(), False),
    T.StructField("label", T.StringType(), True),
    T.StructField("report_request", T.StringType(), False),  # JSON document
    T.StructField("status", T.StringType(), False),  # PENDING|COMPLETED|FAILED
    T.StructField("created", T.TimestampType(), False),
    T.StructField("updated", T.TimestampType(), False),
])

# every table the TableStore knows how to MERGE, with its natural key
# (used for upsert matching; reference exam matching is (oppId, assessment),
# docs/API.md:369)
NATURAL_KEYS: dict[str, list[str]] = {
    "district": ["natural_id"],
    "school": ["natural_id"],
    "student": ["ssid"],
    "asmt": ["natural_id"],
    "exam": ["opp_id", "asmt_id"],
    "student_group": ["name", "school_id", "school_year"],
    "percentile": ["assessment_id", "start_date", "end_date"],
    "accommodation": ["code"],
    "subject": ["code"],
    "state_embargo": ["school_year", "subject_code"],
    "district_embargo": ["district_id", "school_year", "subject_code"],
}

SCHEMAS: dict[str, T.StructType] = {
    "import": IMPORT,
    "district": DISTRICT,
    "school": SCHOOL,
    "student": STUDENT,
    "student_ethnicity": STUDENT_ETHNICITY,
    "asmt": ASMT,
    "item": ITEM,
    "exam": EXAM,
    "exam_item": EXAM_ITEM,
    "exam_score": EXAM_SCORE,
    "exam_available_accommodation": EXAM_AVAILABLE_ACCOMMODATION,
    "student_group": STUDENT_GROUP,
    "student_group_membership": STUDENT_GROUP_MEMBERSHIP,
    "user_student_group": USER_STUDENT_GROUP,
    "percentile": PERCENTILE,
    "percentile_score": PERCENTILE_SCORE,
    "accommodation": ACCOMMODATION,
    "accommodation_translation": ACCOMMODATION_TRANSLATION,
    "subject": SUBJECT,
    "subject_asmt_type": SUBJECT_ASMT_TYPE,
    "subject_performance_level": SUBJECT_PERFORMANCE_LEVEL,
    "depth_of_knowledge": DEPTH_OF_KNOWLEDGE,
    "item_difficulty_cuts": ITEM_DIFFICULTY_CUTS,
    "state_embargo": STATE_EMBARGO,
    "district_embargo": DISTRICT_EMBARGO,
    "user_report": USER_REPORT,
}
