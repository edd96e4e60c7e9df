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
    T.StructField("district_group_id", T.LongType(), True), # GROUP_OF_DISTRICTS parent
)
SCHOOL = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("district_id", T.LongType(), False),
    T.StructField("natural_id", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("external_id", T.StringType(), True),
    T.StructField("school_group_id", T.LongType(), True),   # GROUP_OF_INSTITUTIONS parent
)
# org group entities (docs/Runbook.ImportMigrate.md:17; ART hierarchy
# STATE → group of districts → DISTRICT → group of institutions →
# INSTITUTION, docs/API.md:452-569)
DISTRICT_GROUP = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("natural_id", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
)
SCHOOL_GROUP = _tbl(
    T.StructField("id", T.LongType(), False),
    T.StructField("natural_id", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("district_id", T.LongType(), True),
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
    T.StructField("pt_writing_type", T.StringType(), True), # WER purpose (PtWritingType col)
    T.StructField("irt_a", T.DoubleType(), True),           # IRT params (API.md:719-721)
    T.StructField("irt_b", T.DoubleType(), True),
    T.StructField("irt_c", T.DoubleType(), True),
])
# PACKAGE item children (reference docs/Runbook.ImportMigrate.md:16): the
# tabulator CSV's CommonCore/SecondaryCommonCore and
# SecondaryClaimContentTarget columns, normalized one standard/target per row
ITEM_COMMON_CORE_STANDARD = T.StructType([
    T.StructField("asmt_id", T.LongType(), False),
    T.StructField("item_key", T.StringType(), False),
    T.StructField("natural_id", T.StringType(), False),     # e.g. 11-12.L.1
    T.StructField("secondary", T.BooleanType(), False),
])
# PACKAGE child listed alongside item in docs/Runbook.ImportMigrate.md:16
# and purged per-year in docs/Runbook.BulkDeleteExams.md:205: one row per
# performance-level cut point. The same values ride flattened on
# asmt.cut_point_1..4 for the scoring hot path; this child is the
# queryable normalized shape a reference user expects.
ASMT_SCORE = T.StructType([
    T.StructField("asmt_id", T.LongType(), False),
    T.StructField("cut_point", T.IntegerType(), False),  # rank 1..4
    T.StructField("score", T.DoubleType(), False),       # scaled-score cut
])
ITEM_OTHER_TARGET = T.StructType([
    T.StructField("asmt_id", T.LongType(), False),
    T.StructField("item_key", T.StringType(), False),
    T.StructField("claim_code", T.StringType(), True),
    T.StructField("target_code", T.StringType(), False),
])
# A8 target exclusions (docs/Runbook.SystemConfiguration.md:148-167):
# IT-maintained table; rows are added by the admin flow which also triggers
# migration via a PACKAGE import row (mirroring the documented SQL)
ASMT_TARGET_EXCLUSION = T.StructType([
    T.StructField("asmt_id", T.LongType(), False),
    T.StructField("target_id", T.LongType(), False),        # surrogate of the target dim
    T.StructField("claim_code", T.StringType(), False),
    T.StructField("target_code", T.StringType(), False),
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
# writing-trait sub-scores per WER item (TRT ScoreInfo/SubScoreList; trait
# definitions come from the subject XML <Traits> block,
# deploy/ELA_subject.xml:863-880; the item_trait_score CODES dim names the
# legal trait codes, docs/Runbook.ImportMigrate.md:12)
EXAM_ITEM_TRAIT_SCORE = T.StructType([
    T.StructField("exam_id", T.LongType(), False),
    T.StructField("item_key", T.StringType(), False),
    T.StructField("purpose", T.StringType(), True),         # writing purpose (ARGU/EXPL/…)
    T.StructField("category", T.StringType(), False),       # dimension (ORG/EVI/CON)
    T.StructField("score", T.DoubleType(), True),
    T.StructField("max_score", T.DoubleType(), True),
    T.StructField("condition_code", T.StringType(), True),  # e.g. blank/off-topic flags
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
# SUBJECT child dims (reference docs/Runbook.ImportMigrate.md:20; element
# shapes from deploy/ELA_subject.xml: <Claims> :881, <Standards> :2247,
# <Traits> :863-880, <Messages> :3)
CLAIM = T.StructType([
    T.StructField("id", T.LongType(), False),               # surrogate of (subject, code)
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("code", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("scorable", T.BooleanType(), False),
    T.StructField("organizational", T.BooleanType(), False),
    T.StructField("display_order", T.IntegerType(), True),
])
TARGET = T.StructType([
    T.StructField("id", T.LongType(), False),               # surrogate of (subject, claim, code)
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("claim_code", T.StringType(), False),
    T.StructField("natural_id", T.StringType(), False),     # Target@code
    T.StructField("name", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
])
COMMON_CORE_STANDARD = T.StructType([
    T.StructField("id", T.LongType(), False),               # surrogate of (subject, natural_id)
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("natural_id", T.StringType(), False),     # Standard@code
    T.StructField("description", T.StringType(), True),
])
SUBJECT_SCORE = T.StructType([  # writing-trait definitions (<Traits>)
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("code", T.StringType(), False),           # e.g. SOCK_ARGU_ORG
    T.StructField("purpose", T.StringType(), True),         # ARGU/EXPL/INFO/NARR/OPIN
    T.StructField("category", T.StringType(), True),        # ORG/EVI/CON
    T.StructField("max_score", T.IntegerType(), True),
])
SUBJECT_TRANSLATION = T.StructType([  # display strings (<Messages>)
    T.StructField("subject_code", T.StringType(), False),
    T.StructField("label_code", T.StringType(), False),     # Message@key
    T.StructField("language_code", T.StringType(), False),  # 'en' for the base document
    T.StructField("value", T.StringType(), True),
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

# --- setting: name/value control table (docs/Runbook.Audit.md:83-101 —
# the AUDIT_TRIGGER_ENABLE row gates exam/student audit capture at
# runtime; embargo auditing may not be disabled) ---
SETTING = T.StructType([
    T.StructField("name", T.StringType(), False),
    T.StructField("value", T.StringType(), False),
])

# CODES lookup dims (docs/Runbook.ImportMigrate.md:12-13) — landed as real
# warehouse tables so the documented manual-update flow (edit table +
# trigger CODES migration, docs/Runbook.SystemConfiguration.md:200-263)
# has something to edit. One shared shape: (code, name).
CODE_TABLES = (
    "administration_condition", "completeness", "grade", "gender",
    "ethnicity", "military_connected", "math_practice", "item_trait_score",
    "language",
)
CODE_SCHEMA = T.StructType([
    T.StructField("code", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
])
# registered school years (docs/Runbook.SystemConfiguration.md:31-46):
# "the system restricts reporting to the known school years"
SCHOOL_YEAR = T.StructType([T.StructField("year", T.IntegerType(), False)])

# instructional resource links (docs/Runbook.SystemConfiguration.md:121-127;
# docs/Runbook.md:275 — admin-managed links per assessment/performance level
# with org-specific overrides; the exact column set is not in the public
# docs, so this is the minimal shape the documented behavior needs)
INSTRUCTIONAL_RESOURCE = T.StructType([
    T.StructField("asmt_id", T.LongType(), False),
    T.StructField("performance_level", T.IntegerType(), True),  # NULL → all levels
    T.StructField("org_level", T.StringType(), False),  # System|State|District|School
    T.StructField("org_id", T.LongType(), True),        # NULL for System/State
    T.StructField("resource", T.StringType(), False),   # the link
])

# --- GROUPS staging (docs/Troubleshooting.md:459-468: a failed group
# import RETAINS its intermediate rows in upload_student_group for tier-3
# diagnosis; successful imports clean theirs up) ---
UPLOAD_STUDENT_GROUP = T.StructType([
    T.StructField("import_id", T.LongType(), False),
    T.StructField("group_name", T.StringType(), True),
    T.StructField("school_natural_id", T.StringType(), True),
    T.StructField("school_year", T.IntegerType(), True),
    T.StructField("subject_code", T.StringType(), True),
    T.StructField("student_ssid", T.StringType(), True),
    T.StructField("group_user_login", T.StringType(), True),
])

# --- pipeline config tables (docs/Runbook.Pipeline.md:119-145) ---
PIPELINE = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("code", T.StringType(), False),
    T.StructField("input_type", T.StringType(), False),     # 'xml' | 'csv'
    T.StructField("active_version", T.IntegerType(), True),  # NULL = none
])
PIPELINE_SCRIPT = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("pipeline_id", T.LongType(), False),
    T.StructField("body", T.StringType(), False),            # WIP user script
    T.StructField("created", T.TimestampType(), False),
    T.StructField("updated", T.TimestampType(), False),
    T.StructField("updated_by", T.StringType(), False),
])
PIPELINE_TEST = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("pipeline_id", T.LongType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("example_input", T.StringType(), False),
    T.StructField("expected_output", T.StringType(), False),
    T.StructField("created", T.TimestampType(), False),
    T.StructField("updated", T.TimestampType(), False),
    T.StructField("updated_by", T.StringType(), False),
])

# every table the TableStore knows how to MERGE, with its natural key
# (used for upsert matching; reference exam matching is (oppId, assessment),
# docs/API.md:369)
NATURAL_KEYS: dict[str, list[str]] = {
    "district": ["natural_id"],
    "school": ["natural_id"],
    "district_group": ["natural_id"],
    "school_group": ["natural_id"],
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
    "district_group": DISTRICT_GROUP,
    "school_group": SCHOOL_GROUP,
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
    "claim": CLAIM,
    "target": TARGET,
    "common_core_standard": COMMON_CORE_STANDARD,
    "subject_score": SUBJECT_SCORE,
    "subject_translation": SUBJECT_TRANSLATION,
    "item_common_core_standard": ITEM_COMMON_CORE_STANDARD,
    "item_other_target": ITEM_OTHER_TARGET,
    "asmt_score": ASMT_SCORE,
    "asmt_target_exclusion": ASMT_TARGET_EXCLUSION,
    "exam_item_trait_score": EXAM_ITEM_TRAIT_SCORE,
    "state_embargo": STATE_EMBARGO,
    "district_embargo": DISTRICT_EMBARGO,
    "user_report": USER_REPORT,
    "setting": SETTING,
    **{name: CODE_SCHEMA for name in CODE_TABLES},
    "school_year": SCHOOL_YEAR,
    "instructional_resource": INSTRUCTIONAL_RESOURCE,
    "upload_student_group": UPLOAD_STUDENT_GROUP,
    "pipeline": PIPELINE,
    "pipeline_script": PIPELINE_SCRIPT,
    "pipeline_test": PIPELINE_TEST,
}
NATURAL_KEYS["pipeline"] = ["code"]
NATURAL_KEYS["pipeline_script"] = ["pipeline_id"]   # one WIP script per pipeline
NATURAL_KEYS["pipeline_test"] = ["pipeline_id", "name"]
NATURAL_KEYS.update({name: ["code"] for name in CODE_TABLES})
NATURAL_KEYS["school_year"] = ["year"]
NATURAL_KEYS["setting"] = ["name"]
