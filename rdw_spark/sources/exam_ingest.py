"""Exam ingest job: TRT payloads → validated warehouse rows (SURVEY.md §3.1).

Reproduces the reference exam-processor pipeline (docs/Runbook.md:132-143):
parse TRT → validate (mandatory elements + dim existence; failures become
negative import statuses with element-level JSON messages,
docs/Troubleshooting.md:326-337, docs/API.md:288) → upsert student
(docs/Runbook.BulkDeleteExams.md:26) → match exam by (oppId, assessment):
insert / update / soft-delete on reset (docs/API.md:369) → rewrite children
(exam_item, exam_score, exam_available_accommodation, student_ethnicity) →
mark imports PROCESSED → refresh student.inferred_school_id from the most
recent completed exam (W1, docs/Runbook.Audit.md:441).

Plan shape at scale: parse is map-only (mapInPandas); dim validation joins
broadcast (school/asmt are dims); the student and exam MERGEs shuffle on the
natural key once each; children fan out by explode with exam ids computed
deterministically (xxhash64 of the natural key) so no read-back join is
needed between parent and child writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from rdw_spark.functions.scoring import with_performance_level
from rdw_spark.sources.trt import parse_trt
from rdw_spark.warehouse.import_log import ImportContent, ImportLog, ImportStatus
from rdw_spark.warehouse.store import TableStore, surrogate_id


def ingest_exams(
    spark: SparkSession,
    wh: TableStore,
    log: ImportLog,
    payloads: list[bytes],
    batch: str | None = None,
) -> dict[str, int]:
    """Accept + process a batch of TRT documents. Returns counters."""
    # 1. accept: archive, digest-dedup, import rows (T5). One log write for
    # the whole batch.
    recs = log.accept_batch(spark, ImportContent.EXAM, payloads, batch=batch)
    accepted = [
        (rec.id, p.decode("utf-8"))
        for rec, p in zip(recs, payloads)
        if not rec.existing  # duplicate payload safely no-ops (API.md:263)
    ]
    if not accepted:
        return {"accepted": 0, "processed": 0, "failed": 0}
    return {"accepted": len(accepted), **process_accepted(spark, wh, log, accepted)}


def process_accepted(
    spark: SparkSession,
    wh: TableStore,
    log: ImportLog,
    accepted: list[tuple[int, str]] | DataFrame,
) -> dict[str, int]:
    """Parse→validate→upsert for already-accepted (import_id, payload) pairs.
    Shared by first-pass ingest, resubmit replay (which re-reads payloads
    from the archive and keeps the original import ids), and the streaming
    sink — which passes a DataFrame with (import_id, payload) columns so
    payload bytes never round-trip through the driver."""
    if isinstance(accepted, DataFrame):
        payload_df = accepted.select("import_id", "payload")
    else:
        payload_df = spark.createDataFrame(accepted, "import_id long, payload string")
    parsed = parse_trt(payload_df).cache()

    # 2. validation fan-out (set-based, one pass per dim)
    school = wh.read(spark, "school").select(
        F.col("natural_id").alias("school_natural_id"),
        F.col("id").alias("school_id"),
    )
    asmt_tbl = wh.read(spark, "asmt")
    asmt = asmt_tbl.select(
        F.col("natural_id").alias("asmt_natural_id"),
        F.col("id").alias("asmt_id"),
    )
    resolved = (
        parsed
        .join(F.broadcast(school), "school_natural_id", "left")
        .join(F.broadcast(asmt), "asmt_natural_id", "left")
        .cache()
    )
    bad_data = resolved.filter(F.col("errors").isNotNull())
    unknown_school = resolved.filter(
        F.col("errors").isNull() & F.col("school_id").isNull()
    )
    unknown_asmt = resolved.filter(
        F.col("errors").isNull() & F.col("school_id").isNotNull()
        & F.col("asmt_id").isNull()
    )
    good = resolved.filter(
        F.col("errors").isNull() & F.col("school_id").isNotNull()
        & F.col("asmt_id").isNotNull()
    ).cache()

    status_updates = (
        bad_data.select("import_id", F.lit(ImportStatus.BAD_DATA).alias("status"),
                        F.to_json("errors").alias("message"))
        .unionByName(unknown_school.select(
            "import_id", F.lit(ImportStatus.UNKNOWN_SCHOOL).alias("status"),
            F.to_json(F.struct(F.col("school_natural_id"))).alias("message")))
        .unionByName(unknown_asmt.select(
            "import_id", F.lit(ImportStatus.UNKNOWN_ASMT).alias("status"),
            F.to_json(F.struct(F.col("asmt_natural_id"))).alias("message")))
    )

    # 3. student upsert: latest attributes win (by completed_at)
    latest_per_ssid = Window.partitionBy("ssid").orderBy(
        F.desc_nulls_last("completed_at"), F.desc("import_id")
    )
    students = (
        good.withColumn("_rn", F.row_number().over(latest_per_ssid))
        .filter(F.col("_rn") == 1)
        .select("ssid", "first_name", "middle_name", "last_or_surname",
                "gender", "birthday", "import_id")
    )
    max_import = int(good.agg(F.max("import_id")).collect()[0][0] or 0)
    n_students = 0
    if max_import:
        stats = wh.merge_upsert(spark, "student", students, max_import)
        n_students = stats["inserted"] + stats["updated"]

    # 4. exam MERGE keyed (opp_id, asmt_id); resets soft-delete (API.md:369)
    student_ids = wh.read(spark, "student").select(
        "ssid", F.col("id").alias("student_id")
    )
    # student is fact-sized (millions of rows at state scale) — no broadcast
    # hint; AQE picks broadcast only when the table is actually small
    exam_rows = (
        good.filter(~F.coalesce(F.col("reset"), F.lit(False)))
        .join(student_ids, "ssid")
    )
    # derive performance level from cut scores when the TRT omitted it
    exam_rows = with_performance_level(
        exam_rows.withColumnRenamed("performance_level", "_given_level"),
        asmt_tbl, out_col="_derived_level",
    ).withColumn(
        "performance_level", F.coalesce("_given_level", "_derived_level")
    ).cache()
    # cached: the exam MERGE, all four child-table writes, and the
    # inferred-school scope each consume this join chain — without the
    # cache every consumer re-runs the student join + level derivation
    exam_updates = exam_rows.select(
        "opp_id", "asmt_id", "opportunity", "asmt_version", "type_code",
        "school_year", "student_id", "school_id", "grade_code", "completeness",
        "administration_condition", "session_id", "scale_score",
        "scale_score_std_err", "performance_level", "completed_at",
        "iep", "lep", "section504", "economic_disadvantage", "migrant_status",
        "language_code", "military_connected", "import_id",
    )
    n_exams = 0
    if max_import:
        # per-row import ids: each exam is stamped with the import that
        # carried it (reference lineage, Runbook.ImportMigrate.md:25-31)
        stats = wh.merge_upsert(spark, "exam", exam_updates, max_import)
        n_exams = stats["inserted"] + stats["updated"]

    resets = good.filter(F.coalesce(F.col("reset"), F.lit(False))).select(
        "opp_id", "asmt_id"
    )
    if resets.limit(1).count():
        wh.soft_delete(spark, "exam", resets, max_import)

    # 5. children — exam_id is the deterministic surrogate of (opp_id, asmt_id)
    with_exam_id = exam_rows.withColumn("exam_id", surrogate_id("opp_id", "asmt_id"))
    items = (
        with_exam_id.select("exam_id", F.explode_outer("items").alias("it"))
        # full item key = bankKey-itemId, the package CSV's FullItemKey form
        .select("exam_id",
                F.when(F.col("it.bank_key").isNotNull(),
                       F.concat_ws("-", "it.bank_key", "it.key"))
                .otherwise(F.col("it.key")).alias("item_key"),
                F.col("it.position").alias("position"), F.col("it.score").alias("score"),
                F.col("it.score_status").alias("score_status"),
                F.col("it.response").alias("response"))
        .filter(F.col("item_key").isNotNull())
    )
    wh.replace_children(spark, "exam_item", "exam_id", items)
    # A11 writing-trait sub-scores → exam_item_trait_score; the writing
    # purpose comes from the package item's PtWritingType, the category
    # (dimension) from the TRT sub-score itself
    trait_rows = (
        with_exam_id.select("exam_id", "asmt_id", F.explode_outer("items").alias("it"))
        .select("exam_id", "asmt_id",
                F.when(F.col("it.bank_key").isNotNull(),
                       F.concat_ws("-", "it.bank_key", "it.key"))
                .otherwise(F.col("it.key")).alias("item_key"),
                F.explode_outer("it.trait_scores").alias("ts"))
        .filter(F.col("ts.category").isNotNull())
    )
    if not trait_rows.isEmpty():
        purpose_map = wh.read(spark, "item").select(
            "asmt_id", F.col("key").alias("item_key"),
            F.col("pt_writing_type").alias("purpose"),
        )
        trait_scores = (
            trait_rows.join(F.broadcast(purpose_map), ["asmt_id", "item_key"], "left")
            .select("exam_id", "item_key", "purpose",
                    F.col("ts.category").alias("category"),
                    F.col("ts.score").alias("score"),
                    F.col("ts.max_score").alias("max_score"),
                    F.col("ts.condition_code").alias("condition_code"))
        )
        wh.replace_children(spark, "exam_item_trait_score", "exam_id", trait_scores)
    scores = (
        with_exam_id.select("exam_id", F.explode_outer("claim_scores").alias("cs"))
        .select("exam_id", F.col("cs.claim_code").alias("claim_code"),
                F.col("cs.scale_score").alias("scale_score"),
                F.col("cs.scale_score_std_err").alias("scale_score_std_err"),
                F.col("cs.performance_level").alias("performance_level"))
        .filter(F.col("claim_code").isNotNull())
    )
    wh.replace_children(spark, "exam_score", "exam_id", scores)
    accommodations = (
        with_exam_id.select(
            "exam_id", F.explode_outer("accommodations").alias("accommodation_code")
        ).filter(F.col("accommodation_code").isNotNull())
    )
    wh.replace_children(
        spark, "exam_available_accommodation", "exam_id", accommodations
    )
    ethnicities = (
        with_exam_id
        .select("student_id", F.explode_outer("ethnicities").alias("ethnicity"))
        .filter(F.col("ethnicity").isNotNull()).distinct()
    )
    if ethnicities.limit(1).count():
        wh.replace_children(spark, "student_ethnicity", "student_id", ethnicities)

    # 6. inferred_school_id: most recent completed exam per student (W1) —
    # scoped to the students this batch touched, not the whole student
    # table. Scope from `good` (NOT exam_rows, which excludes resets): a
    # reset soft-deletes the student's exam, which can change their
    # latest-completed school and must re-trigger the window for them.
    touched_students = (
        good.join(student_ids, "ssid").select("student_id").distinct()
    )
    _refresh_inferred_school(spark, wh, max_import, student_ids=touched_students)

    # 7. statuses: failures with messages; successes PROCESSED (bulk, one write)
    processed = good.select(
        "import_id", F.lit(ImportStatus.PROCESSED).alias("status"),
        F.lit(None).cast("string").alias("message"),
    )
    _bulk_status(spark, wh, status_updates.unionByName(processed))

    counts = {
        "processed": good.count(),
        "failed": int(status_updates.count()),
        "students_upserted": n_students,
        "exams_upserted": n_exams,
    }
    parsed.unpersist()
    resolved.unpersist()
    good.unpersist()
    exam_rows.unpersist()
    return counts


def _refresh_inferred_school(
    spark: SparkSession, wh: TableStore, import_id: int,
    student_ids: DataFrame | None = None,
) -> None:
    """W1 refresh. With ``student_ids`` the latest-exam window runs over
    only the touched students' exam history (a semi-join the scan can use)
    instead of windowing the entire fact table per micro-batch."""
    if not import_id:
        return
    exam = wh.read(spark, "exam").filter(~F.col("deleted"))
    if student_ids is not None:
        exam = exam.join(student_ids, "student_id", "left_semi")
    w = Window.partitionBy("student_id").orderBy(F.desc("completed_at"))
    latest = (
        exam.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        .select(F.col("student_id").alias("id"),
                F.col("school_id").alias("_new_school"))
    )
    student = wh.read(spark, "student")
    # only the students whose school actually changed are written back —
    # merge_rows on the merge-on-read student table appends them as an
    # O(changed) delta (replayed/duplicate batches append nothing)
    changed = (
        student.join(latest, "id")
        .filter(~F.col("_new_school").eqNullSafe(F.col("inferred_school_id")))
        .withColumn("inferred_school_id", F.col("_new_school"))
        .drop("_new_school")
    )
    if changed.isEmpty():
        return
    wh.merge_rows(spark, "student", changed.select(*student.columns), ["ssid"])


def _bulk_status(spark: SparkSession, wh: TableStore, updates: DataFrame) -> None:
    """One partition-scoped merge for the whole batch's status transitions:
    only the id buckets the batch's imports live in are read and rewritten
    (O(batch) I/O, not O(log))."""
    from rdw_spark.warehouse.store import IMPORT_ID_BUCKET

    upd = updates.select(
        F.col("import_id").alias("id"), F.col("status").alias("_new_status"),
        F.col("message").alias("_new_message"),
    )
    # the bucket MUST be computed with the exact storage partition expression
    # (`id DIV n`, integer semantics) — float division can round differently
    # for very large ids and miss the row's bucket
    buckets = [
        str(r[0]) for r in
        upd.select(F.expr(f"id DIV {IMPORT_ID_BUCKET}")).distinct().collect()
    ]
    if not buckets:
        return
    log = wh.read_partitions(spark, "import", buckets)
    merged = (
        log.join(F.broadcast(upd), "id")  # batch-sized: broadcast is safe
        .withColumn("status", F.coalesce("_new_status", "status"))
        .withColumn("message", F.coalesce("_new_message", "message"))
        .withColumn("updated", F.current_timestamp())
        .drop("_new_status", "_new_message")
    )
    wh.merge_rows(spark, "import", merged.select(*log.columns), ["id"])
