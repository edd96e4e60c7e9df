"""SURVEY.md §7 minimum end-to-end slice: subject config + package + orgs
loaded, TRT exams ingested (with one failure path), migrate runs, then the
two flagship query shapes answer correctly:
- aggregate: count & % of students per performance level by school
  (docs/Troubleshooting.md:434-450, config/rdw-reporting-aggregate-service.yml:4-27)
- individual: exams for a student by ssid (docs/Runbook.Audit.md:128-134)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdw_spark.sources.exam_ingest import ingest_exams
from rdw_spark.sources.org import parse_org_json, resolve_school_district_ids
from rdw_spark.sources.package import parse_package, read_package_csv
from rdw_spark.sources.subject_xml import parse_subject_xml
from rdw_spark.warehouse import ImportLog, ImportStatus, MigrateEngine, TableStore
from rdw_spark.warehouse.import_log import ImportContent

from tests.test_sources import ORG_JSON, PACKAGE_CSV, SUBJECT_XML, make_trt


@pytest.fixture()
def env(spark, tmp_path):
    wh = TableStore(str(tmp_path / "warehouse"))
    log = ImportLog(wh, archive_root=str(tmp_path / "archive"))

    # dims: orgs (S5), package (S2), subject (S8) — each through the import log
    rec = log.accept(spark, ImportContent.ORGANIZATION, ORG_JSON.encode())
    org = parse_org_json(spark, ORG_JSON)
    wh.merge_upsert(spark, "district", org["district"], rec.id)
    schools = resolve_school_district_ids(org["school"], wh.read(spark, "district"))
    wh.merge_upsert(spark, "school", schools, rec.id)
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)

    rec = log.accept(spark, ImportContent.PACKAGE, PACKAGE_CSV.encode(),
                     content_type="text/csv")
    pkg = parse_package(read_package_csv(spark, PACKAGE_CSV))
    wh.merge_upsert(spark, "asmt", pkg["asmt"], rec.id)
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)

    rec = log.accept(spark, ImportContent.SUBJECT, SUBJECT_XML.encode())
    sub = parse_subject_xml(spark, SUBJECT_XML)
    wh.merge_upsert(spark, "subject", sub["subject"], rec.id)
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)

    return wh, log


def test_minimum_slice(spark, env, tmp_path):
    wh, log = env

    # scores straddle the package cut points 2380/2490/2600 → levels 1..4
    payloads = [
        make_trt(opp_id="OPP-1", ssid="STU001", score=2300.0),  # level 1
        make_trt(opp_id="OPP-2", ssid="STU002", score=2400.0),  # level 2
        make_trt(opp_id="OPP-3", ssid="STU003", score=2550.0),  # level 3
        make_trt(opp_id="OPP-4", ssid="STU004", score=2650.0),  # level 4
        make_trt(opp_id="OPP-5", ssid="STU005", score=2500.0,
                 school="00000000000000"),                      # unknown school
    ]
    res = ingest_exams(spark, wh, log, payloads, batch="e2e-1")
    assert res["accepted"] == 5
    assert res["processed"] == 4 and res["failed"] == 1
    assert res["students_upserted"] == 4 and res["exams_upserted"] == 4

    # failure path: import marked UNKNOWN_SCHOOL with the school id in message
    bad = log.by_status(spark, ImportStatus.UNKNOWN_SCHOOL).collect()
    assert len(bad) == 1 and "00000000000000" in bad[0]["message"]

    # duplicate resubmission no-ops (digest dedup, T5)
    res2 = ingest_exams(spark, wh, log, [payloads[0]])
    assert res2["accepted"] == 0

    # performance level was derived from package cut points (no level in TRT)
    exams = {r["opp_id"]: r for r in wh.read(spark, "exam").collect()}
    assert [exams[f"OPP-{i}"]["performance_level"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    # per-row lineage: each exam carries its own import id, not the batch max
    assert len({exams[f"OPP-{i}"]["import_id"] for i in (1, 2, 3, 4)}) == 4

    # children landed with the right fan-out
    assert wh.read(spark, "exam_item").count() == 8
    assert wh.read(spark, "exam_score").count() == 8
    assert wh.read(spark, "exam_available_accommodation").count() == 4
    assert wh.read(spark, "student_ethnicity").count() == 8

    # inferred school = school of the latest exam (W1)
    stu = wh.read(spark, "student").filter("ssid = 'STU001'").collect()[0]
    school_id = wh.read(spark, "school").filter(
        "natural_id = '55500010001001'").collect()[0]["id"]
    assert stu["inferred_school_id"] == school_id

    # migrate both marts (T1-T4) and answer the flagship queries
    eng = MigrateEngine(wh, str(tmp_path / "mart"))
    assert eng.run_until_caught_up(spark, "reporting") == 4
    assert eng.run_until_caught_up(spark, "olap") > 0

    # A7 aggregate: per-performance-level counts & percents by school
    olap = eng.read_mart(spark, "olap_exam").filter(~F.col("deleted"))
    agg = (
        olap.filter((F.col("school_year") == 2018) & (F.col("type_code") == "sum"))
        .groupBy("school_id", "performance_level")
        .agg(F.count("*").alias("n"))
        .withColumn("pct", F.round(
            100.0 * F.col("n") / F.sum("n").over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("school_id")), 1))
    ).collect()
    assert len(agg) == 4 and all(r["pct"] == 25.0 for r in agg)

    # individual: exams for student by ssid over the reporting mart
    rep = eng.read_mart(spark, "reporting_exam")
    mine = rep.filter(F.col("ssid") == "STU002").collect()
    assert len(mine) == 1
    assert mine[0]["school_name"] == "Cedar Elementary"
    assert mine[0]["district_name"] == "Northlake District"
    assert mine[0]["performance_level"] == 2

    # exam update path: resubmit OPP-2 with a new score → same exam id,
    # update lineage advances, audit before-image captured
    exam_before = wh.read(spark, "exam").filter("opp_id = 'OPP-2'").collect()[0]
    res3 = ingest_exams(
        spark, wh, log, [make_trt(opp_id="OPP-2", ssid="STU002", score=2610.0)]
    )
    assert res3["processed"] == 1
    exam_after = wh.read(spark, "exam").filter("opp_id = 'OPP-2'").collect()[0]
    assert exam_after["id"] == exam_before["id"]
    assert exam_after["scale_score"] == 2610.0
    assert exam_after["performance_level"] == 4
    assert exam_after["update_import_id"] > exam_before["update_import_id"]
    audit = wh.read_audit(spark, "exam")
    assert audit.filter("opp_id = 'OPP-2' AND action = 'update'").count() == 1

    # incremental migrate picks up only the delta
    assert eng.run_until_caught_up(spark, "reporting") == 1
    assert eng.read_mart(spark, "reporting_exam").filter(
        "opp_id = 'OPP-2'").collect()[0]["scale_score"] == 2610.0
