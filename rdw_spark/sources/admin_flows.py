"""Admin write-flows: resubmit-by-status replay, bulk exam delete, groups
ingest (SURVEY.md §7 step 6 — completes the write surface).

- **Resubmit** (docs/API.md:422-449; docs/Troubleshooting.md:310-357): after
  reference data arrives (e.g. the missing school), failed exam imports are
  replayed *from the archive* in import-id order. The import row keeps its
  id — replay is a status transition, not a new import.
- **Bulk delete** (docs/Runbook.BulkDeleteExams.md): soft-delete exams by
  criteria; children live with the exam id so mart queries exclude them via
  the parent's ``deleted`` flag; the next migrate propagates the flag
  (the reference stages ids and deletes partition-at-a-time — X7; our
  snapshot-partition rewrite is the same move).
- **Groups ingest** (docs/StudentGroups.md): GROUPS content always
  reprocesses (no digest no-op, docs/API.md:263); group membership is
  replace-per-group semantics via the upload staging shape.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from rdw_spark.sources.groups import parse_groups, read_groups_csv
from rdw_spark.warehouse.import_log import ImportContent, ImportLog, ImportStatus
from rdw_spark.warehouse.store import TableStore


def resubmit_exams_by_status(
    spark: SparkSession, wh: TableStore, log: ImportLog, status: int,
    limit: int | None = None, page_size: int = 10_000,
) -> dict[str, int]:
    """Replay failed exam imports from the archive (resubmit endpoint).
    ``limit`` mirrors the endpoint's batching param (docs/API.md:434).
    The unlimited path pages the backlog in import-id order,
    ``page_size`` metadata rows (id + digest, never payload bytes) per
    driver round-trip — an unbounded negative-status backlog at 100×
    never materializes as one driver list."""
    backlog = log.by_status(spark, status).filter(
        F.col("content") == ImportContent.EXAM
    )
    # replay keeps the original import ids; only their status advances
    from rdw_spark.sources.exam_ingest import process_accepted

    if limit:
        # endpoint-batched replay (docs/API.md:434, default <= 100/call):
        # bounded driver-side reads are fine
        rows = backlog.limit(limit).select("id", "digest").collect()
        if not rows:
            return {"resubmitted": 0, "processed": 0, "failed": 0}
        accepted: list[tuple[int, str]] = [
            (r["id"],
             log.read_archived_payload(
                 ImportContent.EXAM, r["digest"]).decode("utf-8"))
            for r in rows
        ]
        res = process_accepted(spark, wh, log, accepted)
        return {"resubmitted": len(rows), **res}

    # mass replay (no limit): payload XML must never funnel through the
    # driver, and neither must the backlog's metadata — page by id range
    # (the log is id-ordered), one distributed replay per page.
    totals: dict[str, int] = {"resubmitted": 0, "payload_mismatches": 0}
    last_id = -1
    while True:
        rows = (
            backlog.filter(F.col("id") > last_id)
            .orderBy("id").limit(page_size)
            .select("id", "digest").collect()
        )
        if not rows:
            break
        last_id = int(rows[-1]["id"])
        res = _replay_page_distributed(spark, wh, log, rows,
                                       process_accepted)
        n_mismatched = res.pop("payload_mismatches_page")
        totals["resubmitted"] += len(rows) - n_mismatched
        totals["payload_mismatches"] += n_mismatched
        for k, v in res.items():
            totals[k] = totals.get(k, 0) + int(v)
    if "processed" not in totals:
        totals.update({"processed": 0, "failed": 0})
    return totals


def _replay_page_distributed(
    spark: SparkSession, wh: TableStore, log: ImportLog, rows,
    process_accepted,
) -> dict[str, int]:
    """One page of mass replay: read the page's archive files distributed
    (wholetext), then recover the import-id mapping by recomputing the
    digest from the bytes — the streaming-ingest shape
    (streaming/ingest.py)."""
    paths = [
        log.archived_payload_path(ImportContent.EXAM, r["digest"])
        for r in rows
    ]
    id_map = spark.createDataFrame(
        [(r["id"], r["digest"]) for r in rows],
        "import_id long, digest string",
    )
    # Join by FILE NAME — the archive basename IS the logged digest
    # (digest-pair layout above), so every scanned file matches its
    # log row unconditionally (a missing file fails the load itself).
    # Then compare the RECOMPUTED digest against the logged one: an
    # archived file whose bytes no longer re-digest to the logged
    # value (corruption, non-UTF-8 mangling by the text reader)
    # SURFACES with its import id instead of silently dropping out of
    # the replay while still being counted. Name keys keep the id_map
    # broadcastable (a left-outer preserving the small side cannot).
    joined = (
        spark.read.format("text").option("wholetext", "true")
        .load(paths)
        .select(
            F.col("value").alias("payload"),
            F.upper(F.md5(F.col("value").cast("binary")))
            .alias("replay_digest"),
            F.col("_metadata.file_name").alias("digest"),
        )
        .join(F.broadcast(id_map), "digest")
    )
    # O(page) metadata: ids only, never payload bytes
    mismatched_ids = sorted(
        r["import_id"]
        for r in joined.filter(F.col("replay_digest") != F.col("digest"))
        .select("import_id").collect()
    )
    payloads = (
        joined.filter(F.col("replay_digest") == F.col("digest"))
        .select("import_id", "payload")
    )
    res = process_accepted(spark, wh, log, payloads)
    for iid in mismatched_ids:
        log.set_status(
            spark, int(iid), ImportStatus.BAD_FORMAT,
            message="resubmit: archived payload digest mismatch on replay",
        )
    res["payload_mismatches_page"] = len(mismatched_ids)
    return res


def bulk_delete_exams(
    spark: SparkSession, wh: TableStore, import_id: int,
    school_year: int | None = None, asmt_natural_id: str | None = None,
    school_natural_id: str | None = None,
) -> int:
    """Soft-delete all exams matching the criteria (the runbook's staged
    bulk delete, docs/Runbook.BulkDeleteExams.md:24-42). Returns count."""
    exam = wh.read(spark, "exam")
    cond = ~exam["deleted"]
    if school_year is not None:
        cond &= exam["school_year"] == school_year
    if asmt_natural_id is not None:
        asmt = wh.read(spark, "asmt").filter(
            F.col("natural_id") == asmt_natural_id).select("id")
        ids = [r["id"] for r in asmt.collect()]
        cond &= exam["asmt_id"].isin(ids) if ids else F.lit(False)
    if school_natural_id is not None:
        school = wh.read(spark, "school").filter(
            F.col("natural_id") == school_natural_id).select("id")
        ids = [r["id"] for r in school.collect()]
        cond &= exam["school_id"].isin(ids) if ids else F.lit(False)
    keys = exam.filter(cond).select("opp_id", "asmt_id")
    return wh.soft_delete(spark, "exam", keys, import_id)


def ingest_groups(
    spark: SparkSession, wh: TableStore, log: ImportLog, payload: bytes,
    creator: str | None = None,
) -> dict[str, int]:
    """Accept + process one student-group CSV (S3 → K1). GROUPS content
    always reprocesses; membership/user rows are replaced per group."""
    rec = log.accept(spark, ImportContent.GROUPS, payload,
                     content_type="text/csv", creator=creator)
    try:
        csv_df = read_groups_csv(spark, payload)
    except ValueError as exc:  # bad header → whole file rejected
        log.set_status(spark, rec.id, ImportStatus.BAD_FORMAT, message=str(exc))
        return {"import_id": rec.id, "groups": 0, "errors": 1}

    # stage the intermediate rows under this import id BEFORE processing
    # (docs/Troubleshooting.md:459-468): a failed import retains them for
    # tier-3 diagnosis; a clean one deletes its own staging rows below
    staged = csv_df.withColumn("import_id", F.lit(rec.id)).select(
        *[f.name for f in wh.schemas["upload_student_group"].fields]
    )
    wh.write_snapshot(
        wh.read(spark, "upload_student_group").unionByName(staged),
        "upload_student_group",
    )

    out = parse_groups(csv_df, wh.read(spark, "school"), wh.read(spark, "student"))
    n_errors = out["errors"].count()
    groups = out["student_group"].withColumn("creator", F.lit(creator))
    wh.merge_upsert(spark, "student_group", groups, rec.id)
    wh.replace_children(
        spark, "student_group_membership", "student_group_id",
        out["student_group_membership"],
    )
    wh.replace_children(
        spark, "user_student_group", "student_group_id", out["user_student_group"],
    )
    n_groups = groups.count()
    if n_errors:
        log.set_status(spark, rec.id, ImportStatus.BAD_DATA,
                       message=[r["error"] for r in out["errors"].collect()])
    else:
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)
        cleanup_upload_student_group(spark, wh, import_id=rec.id)
    return {"import_id": rec.id, "groups": int(n_groups), "errors": int(n_errors)}


def cleanup_upload_student_group(
    spark: SparkSession, wh: TableStore, import_id: int | None = None,
    older_than_days: int | None = None, log: ImportLog | None = None,
) -> int:
    """The two documented staging cleanups (docs/Troubleshooting.md:459-468):
    by failed import id, or every entry whose import row is older than N
    days (needs ``log`` for the import timestamps). The staging table only
    ever holds failed-import leftovers, so the snapshot rewrite is O(tiny).
    Returns rows deleted."""
    cur = wh.read(spark, "upload_student_group")
    if import_id is not None:
        keep = cur.filter(F.col("import_id") != F.lit(import_id))
    elif older_than_days is not None:
        if log is None:
            raise ValueError("older_than_days cleanup needs the import log")
        cutoff = F.expr(f"current_timestamp() - INTERVAL {int(older_than_days)} DAYS")
        old = (
            log.read(spark).filter(F.col("updated") < cutoff)
            .select(F.col("id").alias("import_id"))
        )
        keep = cur.join(old, "import_id", "left_anti")
    else:
        raise ValueError("pass import_id or older_than_days")
    n_before = cur.count()
    n_keep = keep.count()
    if n_keep != n_before:
        wh.write_snapshot(keep, "upload_student_group")
    return n_before - n_keep


def snapshot_warehouse(spark: SparkSession, wh: TableStore, dest_root: str,
                       include_audit: bool = True) -> dict[str, int]:
    """The engine analog of the archive runbook (docs/Runbook.Archive.md:
    snapshot the database, store it in an archival location, restore and
    query it later): export every table's CURRENT resolved state as plain
    parquet under ``dest_root`` — independent of the internal storage
    layouts (versioned snapshots, partition manifests, merge-on-read
    deltas), so the archive is queryable directly with any parquet reader.
    Run while the writers are quiescent (the runbook's own requirement)."""
    import os

    counts: dict[str, int] = {}
    for name in wh.schemas:
        df = wh.read(spark, name)
        n = df.count()
        if n == 0:
            continue
        df.write.mode("overwrite").parquet(os.path.join(dest_root, name))
        counts[name] = n
        if include_audit:
            audit = wh.read_audit(spark, name)
            na = audit.count()
            if na:
                audit.write.mode("overwrite").parquet(
                    os.path.join(dest_root, f"audit_{name}"))
                counts[f"audit_{name}"] = na
    return counts


def restore_warehouse(spark: SparkSession, src_root: str, wh: TableStore) -> dict[str, int]:
    """Restore an archive produced by :func:`snapshot_warehouse` into a
    (fresh) TableStore — each table lands through write_snapshot, so the
    target store's own layout rules (partitioning, merge-on-read) apply."""
    import os

    counts: dict[str, int] = {}
    for name in wh.schemas:
        path = os.path.join(src_root, name)
        if not os.path.isdir(path):
            continue
        df = spark.read.schema(wh.schemas[name]).parquet(path)
        wh.write_snapshot(df, name)
        counts[name] = df.count()
    return counts


def add_target_exclusions(
    spark: SparkSession, wh: TableStore, log: ImportLog,
    asmt_natural_id: str, exclusions: list[tuple[str, str]],
) -> dict[str, int]:
    """A8 target exclusions — the runbook's IT flow
    (docs/Runbook.SystemConfiguration.md:148-167): insert
    ``asmt_target_exclusion`` rows for (claim code, target natural id)
    pairs, then trigger migration by creating a PACKAGE import row and
    bumping the assessment's ``update_import_id`` so the next migrate batch
    re-materializes its reports."""
    asmt = wh.read(spark, "asmt").filter(F.col("natural_id") == asmt_natural_id)
    rows = asmt.collect()
    if not rows:
        raise ValueError(f"unknown assessment: {asmt_natural_id}")
    asmt_id = int(rows[0]["id"])

    target = wh.read(spark, "target")
    pairs = spark.createDataFrame(
        list(exclusions), "claim_code string, target_code string")
    excl = (
        pairs.join(
            target.select("claim_code",
                          F.col("natural_id").alias("target_code"),
                          F.col("id").alias("target_id")),
            ["claim_code", "target_code"], "left",
        )
        # a target absent from the subject config still excludes by code;
        # its surrogate id is computed the same way the dim's would be
        .withColumn("target_id", F.coalesce(
            "target_id", F.xxhash64(F.lit(None).cast("string"),
                                    "claim_code", "target_code")))
        .withColumn("asmt_id", F.lit(asmt_id).cast("long"))
        .select("asmt_id", "target_id", "claim_code", "target_code")
    )
    n = excl.count()
    cur = wh.read(spark, "asmt_target_exclusion")
    wh.write_snapshot(
        cur.unionByName(excl).dropDuplicates(["asmt_id", "claim_code", "target_code"]),
        "asmt_target_exclusion",
    )

    # trigger migration exactly as the documented SQL does: a PACKAGE
    # import row ('target exclusions' payload) that the asmt's
    # update_import_id points at, marked PROCESSED for the migrate tail
    rec = log.accept(
        spark, ImportContent.PACKAGE,
        f"target exclusions {asmt_natural_id}:{sorted(exclusions)}".encode(),
        content_type="target exclusions",
    )
    if not rec.existing:
        touched = asmt.withColumns({
            "update_import_id": F.lit(rec.id).cast("long"),
            "updated": F.current_timestamp(),
        })
        wh.merge_rows(spark, "asmt", touched.select(*asmt.columns), ["natural_id"])
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    return {"exclusions_added": n, "import_id": rec.id}


def update_item_standards(
    spark: SparkSession, wh: TableStore, log: ImportLog,
    asmt_natural_id: str,
    add: list[tuple[str, str]] = (),
    remove: list[tuple[str, str]] = (),
    subject_code: str | None = None,
) -> dict[str, int]:
    """The runbook's "update assessment item common core standards" IT flow
    (docs/Runbook.ManualDataModifications.md:57-113): create a manual
    PACKAGE import row, add/delete ``item_common_core_standard``
    associations, bump the assessment's ``update_import_id``, and finalize
    the import so the next migrate batch picks the assessment up.

    ``add``/``remove`` are ``(item natural id, standard natural id)`` pairs
    where the item natural id is ``bankKey-key`` (e.g. ``200-62023``,
    docs/Runbook.ManualDataModifications.md:61; Tabulator's FullItemKey is
    the same composite) and the standard natural id must exist in
    ``common_core_standard`` — the documented prerequisite ("Common core
    standards are loaded into warehouse and do not require modifications").
    ``subject_code`` scopes the standard lookup like the doc's "replace X
    with the subject id"; None resolves across all subjects."""
    asmt = wh.read(spark, "asmt").filter(F.col("natural_id") == asmt_natural_id)
    arow = asmt.collect()
    if not arow:
        raise ValueError(f"unknown assessment: {asmt_natural_id}")
    asmt_id = int(arow[0]["id"])

    # resolve item natural ids (bankKey-key) against the asmt's items —
    # the doc resolves @itemId per assessment, unknown ids are operator
    # error. FullItemKey already carries the composite, so match the key
    # itself first and bank_key-key for packages keyed by bare item id.
    items = (
        wh.read(spark, "item")
        .filter(F.col("asmt_id") == asmt_id)
        .select(F.col("key").alias("item_key"), "bank_key")
        .withColumn(
            "item_natural_id",
            F.when(F.col("item_key").contains("-"), F.col("item_key"))
            .otherwise(F.concat_ws("-", "bank_key", "item_key")),
        )
        .select("item_natural_id", "item_key")
    )
    changes = spark.createDataFrame(
        [(i, s, True) for i, s in add] + [(i, s, False) for i, s in remove],
        "item_natural_id string, natural_id string, _add boolean",
    )
    resolved = changes.join(F.broadcast(items), "item_natural_id", "left").cache()
    missing_items = [
        r["item_natural_id"]
        for r in resolved.filter(F.col("item_key").isNull())
        .select("item_natural_id").distinct().collect()
    ]
    if missing_items:
        resolved.unpersist()
        raise ValueError(
            f"unknown items for {asmt_natural_id}: {sorted(missing_items)}")

    # documented prerequisite: the standard must already exist in the dim
    ccs = wh.read(spark, "common_core_standard")
    if subject_code is not None:
        ccs = ccs.filter(F.col("subject_code") == subject_code)
    missing_std = [
        r["natural_id"]
        for r in resolved.select("natural_id").distinct()
        .join(F.broadcast(ccs.select("natural_id").distinct()),
              "natural_id", "left_anti").collect()
    ]
    if missing_std:
        resolved.unpersist()
        raise ValueError(
            f"standards not loaded in common_core_standard: {sorted(missing_std)}")

    key3 = ["asmt_id", "item_key", "natural_id"]
    cur = wh.read(spark, "item_common_core_standard")
    adds = (
        resolved.filter(F.col("_add"))
        .select(F.lit(asmt_id).cast("long").alias("asmt_id"),
                "item_key", "natural_id",
                # manual associations never displace the package's primary
                # standard (item.common_core_standard stays authoritative)
                F.lit(True).alias("secondary"))
        .dropDuplicates(key3)
    )
    drops = (
        resolved.filter(~F.col("_add"))
        .select(F.lit(asmt_id).cast("long").alias("asmt_id"),
                "item_key", "natural_id")
    )
    survivors = cur.join(F.broadcast(drops), key3, "left_anti")
    # adds that already exist keep their current row (an existing primary
    # association's secondary=False flag must never flip to True)
    new_adds = adds.join(survivors.select(*key3), key3, "left_anti")
    out = survivors.unionByName(new_adds)
    # report NET rows changed, not requested pairs: re-adding an existing
    # association or removing an absent one is a no-op and counts as 0
    n_add = new_adds.count()
    n_drop = cur.join(F.broadcast(drops), key3, "left_semi").count()

    # finalize exactly as the documented SQL: a manual PACKAGE import row
    # the asmt's update_import_id points at, set PROCESSED to trigger
    # migrate. The documented digest deliberately appends NOW() "to make it
    # unique by adding time" (docs/Runbook.ManualDataModifications.md:99):
    # a content-only digest would make an apply->revert->re-apply sequence
    # dedup the third call, leaving the table change unmigrated.
    stamp = datetime.now(timezone.utc).isoformat()
    rec = log.accept(
        spark, ImportContent.PACKAGE,
        f"item cc upd {asmt_natural_id}:{sorted(add)}:{sorted(remove)}:{stamp}".encode(),
        content_type="manual item cc update",
    )
    # snapshot AFTER the accept: a failed accept leaves no untracked data
    # change (the import row is what migrate keys off)
    wh.write_snapshot(out.select(*cur.columns), "item_common_core_standard")
    resolved.unpersist()
    touched = asmt.withColumns({
        "update_import_id": F.lit(rec.id).cast("long"),
        "updated": F.current_timestamp(),
    })
    wh.merge_rows(spark, "asmt", touched.select(*asmt.columns), ["natural_id"])
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    return {"standards_added": n_add, "standards_removed": n_drop,
            "import_id": rec.id}


def purge_deleted_exams(
    spark: SparkSession, wh: TableStore, school_year: int | None = None,
) -> dict[str, int]:
    """Hard purge: physically remove soft-deleted exams and their child
    rows (the runbook's two-stage delete — soft-delete first via
    :func:`bulk_delete_exams`, then this purge pass, reference
    docs/Runbook.BulkDeleteExams.md:158-218: DELETE exam_item/
    exam_available_accommodation/exam_score WHERE e.deleted = 1, then the
    exams). Child deletes anti-join on the staged id set exactly like the
    runbook's staging-table partitioned deletes. Returns per-table counts."""
    exam = wh.read(spark, "exam")
    doomed = exam.filter(F.col("deleted"))
    if school_year is not None:
        doomed = doomed.filter(F.col("school_year") == school_year)
    ids = doomed.select(F.col("id").alias("exam_id"))
    counts: dict[str, int] = {"exam": doomed.count()}
    if counts["exam"] == 0:
        return counts
    for child in ("exam_item", "exam_score", "exam_available_accommodation",
                  "exam_item_trait_score"):
        cur = wh.read(spark, child)
        kept = cur.join(ids, "exam_id", "left_anti")
        counts[child] = cur.count() - kept.count()
        wh.write_snapshot(kept, child)
    kept_exams = exam.join(ids.withColumnRenamed("exam_id", "id"), "id", "left_anti")
    wh.write_snapshot(kept_exams.select(*exam.columns), "exam")
    return counts


def purge_school_year(
    spark: SparkSession, wh: TableStore, school_year: int,
) -> dict[str, int]:
    """Purge every record referencing a school year — the runbook's
    "Delete School Year" flow (docs/Runbook.BulkDeleteExams.md:219-252:
    exams first, then assessments and their items, accommodation
    translations, and student groups with their membership/user rows).
    Exams for the year must already be soft-deleted (bulk_delete_exams);
    this hard-purges them and the year-scoped reference data."""
    counts = purge_deleted_exams(spark, wh, school_year=school_year)

    asmt = wh.read(spark, "asmt")
    doomed_asmt = asmt.filter(F.col("school_year") == school_year)
    asmt_ids = doomed_asmt.select(F.col("id").alias("asmt_id"))
    counts["asmt"] = doomed_asmt.count()
    if counts["asmt"]:
        items = wh.read(spark, "item")
        kept_items = items.join(asmt_ids, "asmt_id", "left_anti")
        counts["item"] = items.count() - kept_items.count()
        wh.write_snapshot(kept_items, "item")
        wh.write_snapshot(asmt.join(asmt_ids.withColumnRenamed("asmt_id", "id"),
                                    "id", "left_anti").select(*asmt.columns), "asmt")

    at = wh.read(spark, "accommodation_translation")
    if "school_year" in at.columns:
        kept_at = at.filter(F.col("school_year") != school_year)
        counts["accommodation_translation"] = at.count() - kept_at.count()
        if counts["accommodation_translation"]:
            wh.write_snapshot(kept_at, "accommodation_translation")

    sg = wh.read(spark, "student_group")
    doomed_sg = sg.filter(F.col("school_year") == school_year)
    counts["student_group"] = doomed_sg.count()
    if counts["student_group"]:
        sg_ids = doomed_sg.select(F.col("id").alias("student_group_id"))
        for child in ("student_group_membership", "user_student_group"):
            cur = wh.read(spark, child)
            kept = cur.join(sg_ids, "student_group_id", "left_anti")
            counts[child] = cur.count() - kept.count()
            wh.write_snapshot(kept, child)
        wh.write_snapshot(
            sg.join(sg_ids.withColumnRenamed("student_group_id", "id"),
                    "id", "left_anti").select(*sg.columns), "student_group")
    return counts
