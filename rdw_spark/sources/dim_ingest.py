"""Dim-content ingest jobs: one public entry point per reference import
endpoint (ORGANIZATION, PACKAGE, NORMS, SUBJECT, ACCOMMODATIONS, EMBARGO).

Each follows the same lifecycle as exams (§3.1): accept (archive +
digest-dedup) → parse → validate → MERGE into the warehouse under the
import id → status PROCESSED / BAD_DATA-with-messages. Together with
``exam_ingest.ingest_exams``, ``admin_flows.ingest_groups`` and the
resubmit/bulk-delete flows, this is the full write surface of the
reference's import API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from rdw_spark.sources.accommodations import parse_accommodations_xml
from rdw_spark.sources.codes_embargo import parse_embargo_json
from rdw_spark.sources.norms import parse_norms, read_norms_csv
from rdw_spark.sources.org import (
    parse_org_calpads, parse_org_json, resolve_school_district_ids,
)
from rdw_spark.sources.package import parse_package, read_package_csv
from rdw_spark.sources.subject_xml import parse_subject_xml
from rdw_spark.warehouse.import_log import ImportContent, ImportLog, ImportStatus
from rdw_spark.warehouse.store import TableStore


def _finish(spark, log, rec, errors=None) -> dict:
    if errors:
        log.set_status(spark, rec.id, ImportStatus.BAD_DATA, message=errors)
        return {"import_id": rec.id, "status": "BAD_DATA", "errors": errors}
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    return {"import_id": rec.id, "status": "PROCESSED", "errors": []}


def ingest_organizations(spark: SparkSession, wh: TableStore, log: ImportLog,
                         payload: bytes, fmt: str = "json") -> dict:
    """S5/S6 → district + school MERGE (json = ART shape, csv = CALPADS)."""
    rec = log.accept(spark, ImportContent.ORGANIZATION, payload,
                     content_type="application/json" if fmt == "json" else "text/csv")
    if rec.existing:
        return {"import_id": rec.id, "status": "DUPLICATE", "errors": []}
    parse = parse_org_json if fmt == "json" else parse_org_calpads
    try:
        out = parse(spark, payload)
    except Exception as exc:  # noqa: BLE001 — malformed payload → BAD_FORMAT
        log.set_status(spark, rec.id, ImportStatus.BAD_FORMAT, message=str(exc))
        return {"import_id": rec.id, "status": "BAD_FORMAT", "errors": [str(exc)]}
    # parents land before children so fk resolution sees this payload's rows
    if "district_group" in out and not out["district_group"].isEmpty():
        wh.merge_upsert(spark, "district_group", out["district_group"], rec.id)
    district = out["district"]
    if "district_group_natural_id" in district.columns:
        dg = wh.read(spark, "district_group").select(
            F.col("natural_id").alias("district_group_natural_id"),
            F.col("id").alias("district_group_id"))
        district = district.join(F.broadcast(dg), "district_group_natural_id",
                                 "left").drop("district_group_natural_id")
    wh.merge_upsert(spark, "district", district, rec.id)

    district_ids = wh.read(spark, "district").select(
        F.col("natural_id").alias("district_natural_id"),
        F.col("id").alias("district_id"))
    if "school_group" in out and not out["school_group"].isEmpty():
        sg = out["school_group"].join(
            F.broadcast(district_ids), "district_natural_id", "left"
        ).drop("district_natural_id")
        wh.merge_upsert(spark, "school_group", sg, rec.id)

    schools = resolve_school_district_ids(out["school"], wh.read(spark, "district"))
    if "school_group_natural_id" in schools.columns:
        sg_ids = wh.read(spark, "school_group").select(
            F.col("natural_id").alias("school_group_natural_id"),
            F.col("id").alias("school_group_id"))
        schools = schools.join(F.broadcast(sg_ids), "school_group_natural_id",
                               "left").drop("school_group_natural_id")
    orphans = [r["natural_id"] for r in
               schools.filter(F.col("district_id").isNull()).collect()]
    wh.merge_upsert(spark, "school",
                    schools.filter(F.col("district_id").isNotNull()), rec.id)
    return _finish(spark, log, rec,
                   [f"school {n}: unresolvable district" for n in orphans])


def ingest_package(spark: SparkSession, wh: TableStore, log: ImportLog,
                   payload: bytes) -> dict:
    """S2 → asmt MERGE + item replace-per-assessment."""
    rec = log.accept(spark, ImportContent.PACKAGE, payload, content_type="text/csv")
    if rec.existing:
        return {"import_id": rec.id, "status": "DUPLICATE", "errors": []}
    out = parse_package(read_package_csv(spark, payload.decode("utf-8")))
    wh.merge_upsert(spark, "asmt", out["asmt"], rec.id)
    ids = wh.read(spark, "asmt").select(
        F.col("natural_id").alias("asmt_natural_id"), F.col("id").alias("asmt_id"))
    items = out["item"].join(F.broadcast(ids), "asmt_natural_id").drop("asmt_natural_id")
    wh.replace_children(spark, "item", "asmt_id", items)
    # asmt/item children (docs/Runbook.ImportMigrate.md:16)
    for child in ("item_common_core_standard", "item_other_target", "asmt_score"):
        rows = out[child].join(F.broadcast(ids), "asmt_natural_id").drop("asmt_natural_id")
        if not rows.isEmpty():
            wh.replace_children(spark, child, "asmt_id", rows)
    return _finish(spark, log, rec)


def ingest_norms(spark: SparkSession, wh: TableStore, log: ImportLog,
                 payload: bytes, default_min_score: float | None = None,
                 default_max_score: float | None = None) -> dict:
    """S4 → percentile + percentile_score. All-or-nothing: any validation
    error (including overlap against ALREADY-LOADED tables) loads nothing
    (reference: 'No percentile tables are loaded if there are any errors',
    docs/Norms.md Import Rules)."""
    rec = log.accept(spark, ImportContent.NORMS, payload, content_type="text/csv")
    if rec.existing:
        return {"import_id": rec.id, "status": "DUPLICATE", "errors": []}
    out = parse_norms(spark, read_norms_csv(spark, payload.decode("utf-8")),
                      default_min_score, default_max_score)
    errors = [r["error"] for r in out["errors"].collect()]
    # cross-file overlap: new windows vs existing tables for the same asmt
    existing = wh.read(spark, "percentile").select(
        "assessment_id", F.col("start_date").alias("s1"), F.col("end_date").alias("e1"),
        F.col("id").alias("existing_id"),
    )
    new = out["percentile"].select(
        "id", "assessment_id", F.col("start_date").alias("s2"),
        F.col("end_date").alias("e2"))
    clash = (
        new.join(existing, "assessment_id")
        .filter((F.col("existing_id") != F.col("id"))
                & (F.col("s1") <= F.col("e2")) & (F.col("s2") <= F.col("e1")))
    )
    errors += [f"overlaps existing percentile table for {r['assessment_id']}"
               for r in clash.collect()]
    if errors:
        return _finish(spark, log, rec, errors)
    wh.merge_upsert(spark, "percentile", out["percentile"].drop("id"), rec.id)
    wh.replace_children(spark, "percentile_score", "percentile_id",
                        out["percentile_score"])
    return _finish(spark, log, rec)


def ingest_subject(spark: SparkSession, wh: TableStore, log: ImportLog,
                   payload: bytes) -> dict:
    """S8 → subject dims (scoring model)."""
    rec = log.accept(spark, ImportContent.SUBJECT, payload)
    if rec.existing:
        return {"import_id": rec.id, "status": "DUPLICATE", "errors": []}
    out = parse_subject_xml(spark, payload)
    wh.merge_upsert(spark, "subject", out["subject"], rec.id)
    for child in ("subject_asmt_type", "subject_performance_level",
                  "depth_of_knowledge", "item_difficulty_cuts",
                  "claim", "target", "common_core_standard",
                  "subject_score", "subject_translation"):
        if out[child].columns:
            wh.replace_children(spark, child, "subject_code", out[child])
    return _finish(spark, log, rec)


def ingest_accommodations(spark: SparkSession, wh: TableStore, log: ImportLog,
                          payload: bytes) -> dict:
    """S7 → accommodation + translations."""
    rec = log.accept(spark, ImportContent.ACCOMMODATIONS, payload)
    if rec.existing:
        return {"import_id": rec.id, "status": "DUPLICATE", "errors": []}
    out = parse_accommodations_xml(spark, payload)
    wh.merge_upsert(spark, "accommodation", out["accommodation"], rec.id)
    ids = wh.read(spark, "accommodation").select(
        "code", F.col("id").alias("accommodation_id"))
    tr = out["accommodation_translation"].join(F.broadcast(ids), "code").drop("code")
    if tr.columns:
        wh.replace_children(spark, "accommodation_translation",
                            "accommodation_id", tr)
    return _finish(spark, log, rec)


def ingest_embargo(spark: SparkSession, wh: TableStore, log: ImportLog,
                   payload: bytes) -> dict:
    """EMBARGO content → state/district embargo MERGE."""
    rec = log.accept(spark, ImportContent.EMBARGO, payload,
                     content_type="application/json")
    if rec.existing:
        return {"import_id": rec.id, "status": "DUPLICATE", "errors": []}
    out = parse_embargo_json(spark, payload)
    wh.merge_upsert(spark, "state_embargo", out["state_embargo"], rec.id)
    wh.merge_upsert(spark, "district_embargo", out["district_embargo"], rec.id)
    return _finish(spark, log, rec)
