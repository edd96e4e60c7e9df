"""RDW-domain report queries over the warehouse/mart tables — the query
layer a reference user actually calls (SURVEY.md §3.2/§3.3), parameterized
Python functions with the same semantics as the reference's REST services.

Each function takes DataFrames (mart or warehouse tables) so it runs
identically over `MigrateEngine.read_mart` output, test fixtures, or a
100 TB lake. Permission/embargo scoping composes as row-filter *view
builders* (P9/P10): every query can be wrapped so it is scoped by
construction — the reference does this in its query builder
(docs/Troubleshooting.md:685-768).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# --------------------------------------------------------------------------
# P9: embargo + permission row-filter view builders
# --------------------------------------------------------------------------

RELEASED = 2  # embargo statuses 0=Loading,1=Reviewing,2=Released
# (docs/Runbook.ManualDataModifications.md:23-32)


def embargo_filter(
    exam: DataFrame,
    state_embargo: DataFrame | None,
    district_embargo: DataFrame | None,
    kind: str = "individual",
    district_col: str = "district_id",
) -> DataFrame:
    """Hide summative results still under embargo (docs/Runbook.md:305-331).
    Non-summative rows pass through; a summative row is visible iff no
    state- or district-level embargo row for (school_year [, subject]) is
    un-released for the requested report kind."""
    def drop_blocked(df: DataFrame, blocked: DataFrame, keys: list[str]) -> DataFrame:
        marked = blocked.distinct().withColumn("_blocked", F.lit(True))
        return (
            df.join(F.broadcast(marked), keys, "left")
            .filter((F.col("type_code") != "sum") | F.col("_blocked").isNull())
            .drop("_blocked")
        )

    out = exam
    if state_embargo is not None:
        out = drop_blocked(
            out,
            state_embargo.filter(F.col(kind) != RELEASED).select("school_year"),
            ["school_year"],
        )
    if district_embargo is not None and district_col in out.columns:
        out = drop_blocked(
            out,
            district_embargo.filter(F.col(kind) != RELEASED).select(
                F.col("district_id").alias(district_col), "school_year"
            ),
            [district_col, "school_year"],
        )
    return out


def permission_scope(exam: DataFrame, allowed_schools: DataFrame,
                     transfer_enabled: bool = False,
                     student: DataFrame | None = None) -> DataFrame:
    """Org-scoped permissions: rows restricted to the user's school set via
    semi-join (docs/Troubleshooting.md:720-768).

    ``transfer_enabled`` is the optional ``transfer-access-enabled`` feature
    (docs/Runbook.SystemConfiguration.md:169-177, default off): users also
    see results "administered at another institution" for students whose
    *current* (inferred) school is in their scope — pass the ``student``
    dim to resolve it."""
    allowed = F.broadcast(allowed_schools.select("school_id").distinct())
    scoped = exam.join(allowed, "school_id", "left_semi")
    if not transfer_enabled:
        return scoped
    if student is None:
        raise ValueError("transfer_enabled requires the student dim")
    transfer_students = (
        student.join(allowed.withColumnRenamed("school_id", "inferred_school_id"),
                     "inferred_school_id", "left_semi")
        .select(F.col("id").alias("student_id"))
    )
    transferred = exam.join(F.broadcast(transfer_students), "student_id", "left_semi")
    return scoped.unionByName(transferred).dropDuplicates(
        ["id"] if "id" in exam.columns else exam.columns
    )


# --------------------------------------------------------------------------
# §3.2 individual reporting queries (reporting mart)
# --------------------------------------------------------------------------


def student_exam_results(reporting_exam: DataFrame, ssid: str,
                         school_year: int | None = None) -> DataFrame:
    """Exams for a student by ssid (docs/Runbook.Audit.md:128-134 shape),
    soft-deletes excluded (P1)."""
    out = reporting_exam.filter((F.col("ssid") == ssid) & (~F.col("deleted")))
    if school_year is not None:
        out = out.filter(F.col("school_year") == school_year)
    return out.orderBy(F.desc("completed_at"))


def school_grade_counts(reporting_exam: DataFrame, school_id: int,
                        school_year: int, grade_code: str) -> DataFrame:
    """The worked troubleshooting query (docs/Troubleshooting.md:434-450):
    exam count for (school, year, grade)."""
    return (
        reporting_exam.filter(
            (F.col("school_id") == school_id)
            & (F.col("school_year") == school_year)
            & (F.col("grade_code") == grade_code) & (~F.col("deleted"))
        ).agg(F.count("*").alias("n_exams"))
    )


# --------------------------------------------------------------------------
# §3.3 aggregate reporting (OLAP facts)
# --------------------------------------------------------------------------

SUBGROUP_COLS = [  # demographic fan-out set (config/application.yml:25-42)
    "iep", "lep", "section504", "economic_disadvantage", "migrant_status",
]


def aggregate_report(
    olap_exam: DataFrame,
    group_cols: list[str] = ("school_id",),
    school_year: int | None = None,
    subject_code: str | None = None,
    asmt_types: tuple[str, ...] = ("sum",),
    subgroup: str | None = None,
    include_state_rollup: bool = False,
) -> DataFrame:
    """A7: counts & percents of students per performance level sliced by
    org × year × subject × grade × optional demographic subgroup
    (config/rdw-reporting-aggregate-service.yml:4-27). One groupBy+pivot —
    Spark parallelizes internally, no org-chunking needed (the reference
    chunks orgs 10 per query and pools 6 queries as a Redshift workaround).
    ``include_state_rollup=True`` adds the all-orgs rollup rows the
    reference offers for summative (grouping-sets under the hood)."""
    base = olap_exam.filter(
        (~F.col("deleted")) & F.col("type_code").isin(*asmt_types)
    )
    if school_year is not None:
        base = base.filter(F.col("school_year") == school_year)
    if subject_code is not None:
        base = base.filter(F.col("subject_code") == subject_code)
    dims = list(group_cols) + ([subgroup] if subgroup else [])

    counts = base.groupBy(*dims, "performance_level").agg(F.count("*").alias("n"))
    if include_state_rollup:
        # grouping-sets semantics: detail rows ∪ state-level rows (dims NULL)
        state = base.groupBy("performance_level").agg(F.count("*").alias("n"))
        for d in dims:
            state = state.withColumn(d, F.lit(None).cast(dict(counts.dtypes)[d]))
        counts = counts.unionByName(state.select(*counts.columns))
    total = Window.partitionBy(*dims)
    return counts.withColumn(
        "pct", F.round(100.0 * F.col("n") / F.sum("n").over(total), 2)
    )


def target_report(
    exam_item: DataFrame, item: DataFrame, exam: DataFrame,
    min_students: int = 10, std_err_max: float = 0.2,
    target_exclusions: DataFrame | None = None,
    approx: bool = False,
) -> DataFrame:
    """A8: per-target aggregate with standard error; 'Insufficient Data' when
    the std-err exceeds the cutoff or too few students; summative only;
    excluded targets dropped (config/application.yml:44-53,
    docs/Runbook.SystemConfiguration.md:148-167).

    ``approx=True`` swaps the exact student COUNT(DISTINCT) for
    ``approx_count_distinct`` (HLL++, rsd=0.02 passed explicitly — Spark's
    default would be 0.05) — the SURVEY §7 scale-tier
    option: the distinct count only gates the min-student threshold and the
    std-err denominator, where 2% error is immaterial, and the exact
    distinct forces a per-group dedup shuffle the sketch avoids."""
    sum_exams = exam.filter((F.col("type_code") == "sum") & (~F.col("deleted"))).select(
        F.col("id").alias("exam_id"), "student_id", "asmt_id",
    )
    it = item.select(F.col("key").alias("item_key"), "asmt_id", "claim_code",
                     "target_code", "max_points")
    joined = (
        exam_item.join(sum_exams, "exam_id")
        .join(F.broadcast(it), ["item_key", "asmt_id"])
        .withColumn("pct_score", F.col("score") / F.col("max_points"))
    )
    if target_exclusions is not None:
        # the target's claim is part of the exclusion identity ("the
        # target's claim must be included for uniqueness",
        # docs/Runbook.SystemConfiguration.md:153)
        ex_keys = (["asmt_id", "claim_code", "target_code"]
                   if "claim_code" in target_exclusions.columns
                   else ["asmt_id", "target_code"])
        joined = joined.join(
            F.broadcast(target_exclusions.select(*ex_keys)), ex_keys, "left_anti",
        )
    ndistinct = (F.approx_count_distinct("student_id", rsd=0.02) if approx
                 else F.countDistinct("student_id"))
    agg = joined.groupBy("asmt_id", "target_code").agg(
        ndistinct.alias("n_students"),
        F.round(F.avg("pct_score"), 4).alias("avg_pct_score"),
        F.round(F.stddev_samp("pct_score") / F.sqrt(ndistinct), 4)
        .alias("std_err"),
    )
    return agg.withColumn(
        "insufficient_data",
        (F.col("n_students") < min_students)
        | F.col("std_err").isNull() | (F.col("std_err") > std_err_max),
    )


def org_hierarchy(school: DataFrame, district: DataFrame,
                  school_group: DataFrame | None = None,
                  district_group: DataFrame | None = None) -> DataFrame:
    """J3: flattened org snowflake — school → (school group) → district →
    (district group) — over the warehouse org tables including the group
    entities (docs/Runbook.ImportMigrate.md:17; hierarchy docs/API.md:452-569).
    All four inputs are dims; every join broadcasts."""
    out = school.select(
        F.col("id").alias("school_id"),
        F.col("natural_id").alias("school_natural_id"),
        F.col("name").alias("school_name"),
        "district_id",
        *(["school_group_id"] if "school_group_id" in school.columns else []),
    )
    d = district.select(
        F.col("id").alias("district_id"),
        F.col("natural_id").alias("district_natural_id"),
        F.col("name").alias("district_name"),
        *(["district_group_id"] if "district_group_id" in district.columns else []),
    )
    out = out.join(F.broadcast(d), "district_id", "left")
    if school_group is not None:
        sg = school_group.select(
            F.col("id").alias("school_group_id"),
            F.col("natural_id").alias("school_group_natural_id"),
            F.col("name").alias("school_group_name"),
        )
        out = out.join(F.broadcast(sg), "school_group_id", "left")
    if district_group is not None:
        dg = district_group.select(
            F.col("id").alias("district_group_id"),
            F.col("natural_id").alias("district_group_natural_id"),
            F.col("name").alias("district_group_name"),
        )
        out = out.join(F.broadcast(dg), "district_group_id", "left")
    return out


def target_report_from_warehouse(
    spark, wh, min_students: int = 10, std_err_max: float = 0.2,
) -> DataFrame:
    """A8 against warehouse tables, applying the ``asmt_target_exclusion``
    table (docs/Runbook.SystemConfiguration.md:148-167) — rows land there
    via ``admin_flows.add_target_exclusions``."""
    exclusions = wh.read(spark, "asmt_target_exclusion")
    return target_report(
        wh.read(spark, "exam_item"), wh.read(spark, "item"),
        wh.read(spark, "exam"), min_students=min_students,
        std_err_max=std_err_max,
        target_exclusions=None if exclusions.isEmpty() else exclusions,
    )


def longitudinal_trend(olap_exam_longitudinal: DataFrame) -> DataFrame:
    """A10/W4: per-student summative score trajectory with year-over-year
    delta (docs/Runbook.BulkDeleteExams.md:116)."""
    w = Window.partitionBy("student_id", "subject_code").orderBy("school_year")
    return olap_exam_longitudinal.select(
        "student_id", "subject_code", "school_year", "scale_score",
        (F.col("scale_score") - F.lag("scale_score").over(w)).alias("yoy_delta"),
        F.lag("school_year").over(w).alias("prev_year"),
    )


def claim_score_report(exam_score: DataFrame, exam: DataFrame,
                       claim: DataFrame | None = None) -> DataFrame:
    """A11: per-claim score distribution for completed exams
    (docs/Runbook.Audit.md:58, exam_score child fact). Pass the ``claim``
    SUBJECT dim (docs/Runbook.ImportMigrate.md:20) to resolve display
    names; without it the report falls back to the raw claim code."""
    ex = exam.filter(~F.col("deleted")).select(
        F.col("id").alias("exam_id"), "school_year", "type_code",
    )
    agg = (
        exam_score.join(ex, "exam_id")
        .groupBy("school_year", "type_code", "claim_code")
        .agg(F.count("*").alias("n"),
             F.round(F.avg("scale_score"), 2).alias("avg_scale_score"))
    )
    if claim is None:
        return agg.withColumn("claim_name", F.col("claim_code"))
    names = claim.select(F.col("code").alias("claim_code"),
                         F.col("name").alias("claim_name"))
    return agg.join(F.broadcast(names), "claim_code", "left").withColumn(
        "claim_name", F.coalesce("claim_name", "claim_code")
    )


# --------------------------------------------------------------------------
# Audit / monitoring / reconciliation (U1/J11, A1-A6, K4)
# --------------------------------------------------------------------------


def exam_audit_history(exam: DataFrame, audit_exam: DataFrame,
                       exam_id: int | None = None) -> DataFrame:
    """U1/J11/W2: current ∪ audit rows per exam, newest first, with the
    prior scale score for before/after diffing (docs/Runbook.Audit.md:232-309)."""
    cur = exam.withColumn("source", F.lit("current"))
    aud = audit_exam.select(*exam.columns).withColumn("source", F.lit("audit"))
    hist = cur.unionByName(aud)
    if exam_id is not None:
        hist = hist.filter(F.col("id") == exam_id)
    w = Window.partitionBy("id").orderBy(F.desc("updated"))
    return hist.select(
        "id", "opp_id", "source", "updated", "scale_score", "performance_level",
        F.lead("scale_score").over(w).alias("prev_scale_score"),
    ).orderBy("id", F.desc("updated"))


def imports_by_status(import_log: DataFrame) -> DataFrame:
    """Monitoring A1 (docs/Monitoring.md:41-51): failure counts by status."""
    return (
        import_log.filter(F.col("status") < 0)
        .groupBy("status").agg(F.count("*").alias("count"))
        .orderBy("status")
    )


def ingest_latency_histogram(import_log: DataFrame) -> DataFrame:
    """Monitoring A6 (docs/Monitoring.md:109-121): minutes-to-process buckets."""
    minutes = F.floor(
        (F.col("updated").cast("double") - F.col("created").cast("double")) / 60
    )
    return (
        import_log.filter(F.col("status") == 1)
        .groupBy(minutes.alias("minutes")).agg(F.count("*").alias("count"))
        .orderBy("minutes")
    )


def instructional_resources_for(
    resources: DataFrame, asmt_id: int, performance_level: int,
    school_id: int | None = None, district_id: int | None = None,
) -> DataFrame:
    """Resolve instructional-resource links for an (assessment,
    performance level) with most-specific-org-wins override semantics
    (docs/Runbook.SystemConfiguration.md:121-127: SmarterBalanced 'system'
    resources, with organization-specific resources configured on top by
    administrative users)."""
    rank = (
        F.when(F.col("org_level") == "School", 4)
        .when(F.col("org_level") == "District", 3)
        .when(F.col("org_level") == "State", 2)
        .otherwise(1)  # System
    )
    scoped = resources.filter(
        (F.col("asmt_id") == asmt_id)
        & (F.col("performance_level").isNull()
           | (F.col("performance_level") == performance_level))
        & (
            (F.col("org_level").isin("System", "State"))
            | ((F.col("org_level") == "District") & (F.col("org_id") == district_id))
            | ((F.col("org_level") == "School") & (F.col("org_id") == school_id))
        )
    ).withColumn("_rank", rank)
    best = scoped.agg(F.max("_rank").alias("_best"))
    return (
        scoped.join(F.broadcast(best), F.col("_rank") == F.col("_best"))
        .select("org_level", "resource")
    )


def slowest_migrates(migrate_control: DataFrame, k: int = 5) -> DataFrame:
    """O1 ops query: top-k slowest completed migrate runs
    (docs/Monitoring.md:211-220)."""
    return (
        migrate_control.filter(F.col("status") == 20)  # COMPLETED
        .withColumn(
            "runtime_sec",
            F.unix_timestamp("updated") - F.unix_timestamp("created"),
        )
        .select("id", "job", "first_import_id", "last_import_id", "runtime_sec")
        .orderBy(F.desc("runtime_sec")).limit(k)
    )


def exams_by_type_and_condition(exam: DataFrame) -> DataFrame:
    """A1 ops query: exam counts by assessment type × administration
    condition (docs/Monitoring.md:283-299)."""
    return (
        exam.filter(~F.col("deleted"))
        .groupBy("type_code", "administration_condition")
        .agg(F.count("*").alias("n"))
        .orderBy("type_code", "administration_condition")
    )


def reconciliation_report(import_log: DataFrame, exam: DataFrame) -> DataFrame:
    """K4 (docs/API.md:911-924): per-day exam import counts vs landed exam
    rows — the daily reconciliation feed."""
    imp = (
        import_log.filter(F.col("content") == 1)
        .groupBy(F.to_date("created").alias("day"))
        .agg(F.count("*").alias("n_imports"),
             F.sum(F.when(F.col("status") == 1, 1).otherwise(0)).alias("n_processed"))
    )
    landed = exam.groupBy(F.to_date("created").alias("day")).agg(
        F.count("*").alias("n_exams")
    )
    return imp.join(landed, "day", "full_outer").orderBy("day")


def missing_data_report(exam: DataFrame,
                        optional_cols: tuple[str, ...] = (
                            "session_id", "completeness",
                            "administration_condition", "scale_score_std_err",
                            "language_code", "military_connected",
                        )) -> DataFrame:
    """A12 (docs/Runbook.DataSpecifications.md:95-132): % of results with
    each optional field populated, per year."""
    aggs = [
        F.round(100 * F.avg(F.when(F.col(c).isNotNull(), 1).otherwise(0)), 2)
        .alias(f"pct_{c}")
        for c in optional_cols
    ]
    return exam.filter(~F.col("deleted")).groupBy("school_year").agg(
        F.count("*").alias("n_exams"), *aggs
    ).orderBy("school_year")


# --------------------------------------------------------------------------
# user_report: saved report requests (docs/Troubleshooting.md:425-437)
# --------------------------------------------------------------------------


def save_user_report(
    spark, store, user_login: str, report_request: dict | str,
    label: str | None = None, status: str = "PENDING",
) -> int:
    """Persist a report request (the reference stores the request object as
    a JSON document in ``user_report.report_request``). Returns the id.

    The id is content-derived (digest of user+request+label) so retries
    are idempotent — no sequence bottleneck, same property as the
    warehouse surrogate ids."""
    import hashlib
    import json as _json

    from pyspark.sql import Row

    req = report_request if isinstance(report_request, str) else _json.dumps(
        report_request, sort_keys=True
    )
    digest = hashlib.md5(
        f"{user_login}\x00{req}\x00{label}".encode()
    ).digest()
    rid = int.from_bytes(digest[:8], "big", signed=True)
    now = F.current_timestamp()
    row = spark.createDataFrame(
        [Row(id=rid, user_login=user_login, label=label,
             report_request=req, status=status)],
        "id long, user_login string, label string, report_request string, status string",
    ).withColumns({"created": now, "updated": now})
    store.merge_rows(spark, "user_report", row, ["id"])
    return rid


def find_user_reports(user_report: DataFrame, **request_fields) -> DataFrame:
    """Support query: locate report requests by fields embedded in the JSON
    ``report_request`` document — the Spark-native form of the runbook's
    ``report_request LIKE '%schoolID":6470%'`` (docs/Troubleshooting.md:427),
    using ``get_json_object`` so 6470 matches as a value, not a substring.

    ``find_user_reports(ur, schoolId=6470, schoolYear=2018)``
    """
    out = user_report
    for field, value in request_fields.items():
        out = out.filter(
            F.get_json_object(F.col("report_request"), f"$.{field}")
            == F.lit(str(value))
        )
    return out.orderBy(F.desc("updated"))
