"""Admin write-flows: resubmit-by-status replay after reference data
arrives, bulk exam delete with mart propagation, groups ingest lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdw_spark.sources.admin_flows import (
    bulk_delete_exams, ingest_groups, resubmit_exams_by_status,
)
from rdw_spark.sources.exam_ingest import ingest_exams
from rdw_spark.sources.org import parse_org_json, resolve_school_district_ids
from rdw_spark.sources.package import parse_package, read_package_csv
from rdw_spark.warehouse import ImportLog, ImportStatus, MigrateEngine, TableStore
from rdw_spark.warehouse.import_log import ImportContent

from tests.test_sources import GROUPS_CSV, ORG_JSON, PACKAGE_CSV, make_trt


@pytest.fixture()
def env(spark, tmp_path):
    wh = TableStore(str(tmp_path / "warehouse"))
    log = ImportLog(wh, archive_root=str(tmp_path / "archive"))
    rec = log.accept(spark, ImportContent.PACKAGE, PACKAGE_CSV.encode())
    pkg = parse_package(read_package_csv(spark, PACKAGE_CSV))
    wh.merge_upsert(spark, "asmt", pkg["asmt"], rec.id)
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    return wh, log


def _load_orgs(spark, wh, log):
    rec = log.accept(spark, ImportContent.ORGANIZATION, ORG_JSON.encode())
    org = parse_org_json(spark, ORG_JSON)
    wh.merge_upsert(spark, "district", org["district"], rec.id)
    wh.merge_upsert(
        spark, "school",
        resolve_school_district_ids(org["school"], wh.read(spark, "district")),
        rec.id)
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)


def test_resubmit_after_reference_data_arrives(spark, env):
    wh, log = env
    # orgs NOT loaded yet → exam fails with UNKNOWN_SCHOOL (-6)
    res = ingest_exams(spark, wh, log, [make_trt(opp_id="R-1", ssid="STU001")])
    assert res["processed"] == 0 and res["failed"] == 1
    failed = log.by_status(spark, ImportStatus.UNKNOWN_SCHOOL).collect()
    assert len(failed) == 1
    orig_id = failed[0]["id"]

    # the missing school arrives; replay from the archive (same import id)
    _load_orgs(spark, wh, log)
    res = resubmit_exams_by_status(spark, wh, log, ImportStatus.UNKNOWN_SCHOOL)
    assert res["resubmitted"] == 1 and res["processed"] == 1
    assert log.by_status(spark, ImportStatus.UNKNOWN_SCHOOL).count() == 0
    replayed = log.read(spark).filter(F.col("id") == orig_id).collect()[0]
    assert replayed["status"] == ImportStatus.PROCESSED
    assert wh.read(spark, "exam").filter("opp_id = 'R-1'").count() == 1


def test_resubmit_unbounded_backlog_payloads_stay_distributed(
    spark, env, monkeypatch
):
    """Mass replay (no limit): a >100-doc backlog must reach
    process_accepted as a DataFrame built from a distributed archive read —
    payload XML never funnels through the driver (the streaming-ingest
    shape). Only O(rows) id/digest metadata is collected."""
    from pyspark.sql import DataFrame as SparkDataFrame

    wh, log = env
    # orgs NOT loaded → all fail UNKNOWN_SCHOOL; distinct ssids keep every
    # payload byte-distinct so nothing collapses on digest dedup
    payloads = [
        make_trt(opp_id=f"M-{i}", ssid=f"STU{i:03d}") for i in range(110)
    ]
    res = ingest_exams(spark, wh, log, payloads)
    assert res["failed"] == 110

    seen_types = []
    from rdw_spark.sources import exam_ingest as EI

    real = EI.process_accepted

    def spy(s, w, lg, accepted):
        seen_types.append(type(accepted))
        return real(s, w, lg, accepted)

    monkeypatch.setattr(EI, "process_accepted", spy)

    _load_orgs(spark, wh, log)
    res = resubmit_exams_by_status(spark, wh, log, ImportStatus.UNKNOWN_SCHOOL)
    assert res["resubmitted"] == 110 and res["processed"] == 110
    assert seen_types and all(
        issubclass(t, SparkDataFrame) for t in seen_types
    )
    assert wh.read(spark, "exam").filter("NOT deleted").count() == 110


@pytest.mark.exhaustive
def test_resubmit_unlimited_pages_backlog_by_id(spark, env, monkeypatch):
    """Mass replay pages the backlog in import-id order: with
    page_size=10 a 23-import backlog collects at most 10 metadata rows
    per driver round-trip across 3 pages, every page reaches
    process_accepted as a DataFrame, and the aggregate result equals the
    one-shot replay (all processed, statuses advanced)."""
    from pyspark.sql import DataFrame as SparkDataFrame

    wh, log = env
    payloads = [
        make_trt(opp_id=f"P-{i}", ssid=f"STU{i:03d}") for i in range(23)
    ]
    res = ingest_exams(spark, wh, log, payloads)
    assert res["failed"] == 23

    calls = []
    from rdw_spark.sources import exam_ingest as EI

    real = EI.process_accepted

    def spy(s, w, lg, accepted):
        calls.append(type(accepted))
        return real(s, w, lg, accepted)

    monkeypatch.setattr(EI, "process_accepted", spy)

    _load_orgs(spark, wh, log)
    res = resubmit_exams_by_status(
        spark, wh, log, ImportStatus.UNKNOWN_SCHOOL, page_size=10)
    assert res["resubmitted"] == 23 and res["processed"] == 23
    assert res["payload_mismatches"] == 0
    assert len(calls) == 3  # 10 + 10 + 3
    assert all(issubclass(t, SparkDataFrame) for t in calls)
    assert log.by_status(spark, ImportStatus.UNKNOWN_SCHOOL).count() == 0
    assert wh.read(spark, "exam").filter("NOT deleted").count() == 23


@pytest.mark.exhaustive
def test_resubmit_corrupt_archive_payload_surfaces(spark, env):
    """Mass replay: an archived file whose bytes no longer re-digest to
    the logged value must SURFACE (counted in payload_mismatches, import
    marked BAD_FORMAT) instead of silently vanishing while 'resubmitted'
    still counts it (round-8 advisor fix)."""
    wh, log = env
    payloads = [make_trt(opp_id=f"C-{i}", ssid=f"STU{i:03d}") for i in range(3)]
    res = ingest_exams(spark, wh, log, payloads)
    assert res["failed"] == 3

    # corrupt one archived payload on disk
    victim = log.by_status(spark, ImportStatus.UNKNOWN_SCHOOL).collect()[0]
    path = log.archived_payload_path(ImportContent.EXAM, victim["digest"])
    with open(path, "ab") as fh:
        fh.write(b"<!-- bitrot -->")

    _load_orgs(spark, wh, log)
    res = resubmit_exams_by_status(spark, wh, log, ImportStatus.UNKNOWN_SCHOOL)
    assert res["payload_mismatches"] == 1
    assert res["resubmitted"] == 2 and res["processed"] == 2
    bad = log.read(spark).filter(F.col("id") == victim["id"]).collect()[0]
    assert bad["status"] == ImportStatus.BAD_FORMAT


def test_resubmit_bounded_limit_uses_driver_reads(spark, env, monkeypatch):
    """Endpoint-batched replay (limit set, docs/API.md:434): the bounded
    path reads payloads driver-side (list form) — and respects the limit."""
    from rdw_spark.sources import exam_ingest as EI

    wh, log = env
    payloads = [make_trt(opp_id=f"L-{i}", ssid=f"STU{i:03d}") for i in range(5)]
    ingest_exams(spark, wh, log, payloads)

    seen_types = []
    real = EI.process_accepted

    def spy(s, w, lg, accepted):
        seen_types.append(type(accepted))
        return real(s, w, lg, accepted)

    monkeypatch.setattr(EI, "process_accepted", spy)

    _load_orgs(spark, wh, log)
    res = resubmit_exams_by_status(
        spark, wh, log, ImportStatus.UNKNOWN_SCHOOL, limit=3
    )
    assert res["resubmitted"] == 3
    assert seen_types == [list]
    # the remaining two replay on the next call
    res = resubmit_exams_by_status(
        spark, wh, log, ImportStatus.UNKNOWN_SCHOOL, limit=100
    )
    assert res["resubmitted"] == 2


def test_bulk_delete_propagates_to_marts(spark, env, tmp_path):
    wh, log = env
    _load_orgs(spark, wh, log)
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="B-1", ssid="STU001", score=2400.0),
        make_trt(opp_id="B-2", ssid="STU002", score=2500.0),
    ])
    eng = MigrateEngine(wh, str(tmp_path / "mart"))
    eng.run_until_caught_up(spark, "reporting")

    # the delete runs under its own import record (lineage preserved)
    rec = log.accept(spark, ImportContent.EXAM, b"bulk-delete-2018")
    n = bulk_delete_exams(spark, wh, rec.id, school_year=2018,
                          asmt_natural_id="TESTASMT-G6-2018")
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    assert n == 2
    assert wh.read(spark, "exam").filter("NOT deleted").count() == 0
    assert wh.read_audit(spark, "exam").filter("action = 'delete'").count() == 2

    # next migrate physically deletes the rows from the mart ("the system
    # has already deleted the records in the data mart",
    # docs/Runbook.BulkDeleteExams.md:104-111)
    eng.run_until_caught_up(spark, "reporting")
    assert eng.read_mart(spark, "reporting_exam").count() == 0


def test_groups_ingest_lifecycle(spark, env):
    wh, log = env
    _load_orgs(spark, wh, log)
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="G-1", ssid="STU001"),
        make_trt(opp_id="G-2", ssid="STU002"),
    ])

    res = ingest_groups(spark, wh, log, GROUPS_CSV.encode(), creator="admin@x")
    assert res["groups"] == 2 and res["errors"] == 0
    groups = wh.read(spark, "student_group")
    assert groups.count() == 2
    assert groups.filter("creator = 'admin@x'").count() == 2
    assert wh.read(spark, "student_group_membership").count() == 3
    assert wh.read(spark, "user_student_group").count() == 1

    # bad header → whole file BAD_FORMAT
    res = ingest_groups(spark, wh, log, b"not,the,right,header\n1,2,3,4\n")
    assert res["errors"] == 1
    bad = log.read(spark).filter(F.col("id") == res["import_id"]).collect()[0]
    assert bad["status"] == ImportStatus.BAD_FORMAT

    # unknown student → BAD_DATA with row-level message
    csv = GROUPS_CSV + "Grade6Math,55500010001001,2018,,STU404,\n"
    res = ingest_groups(spark, wh, log, csv.encode())
    bad = log.read(spark).filter(F.col("id") == res["import_id"]).collect()[0]
    assert bad["status"] == ImportStatus.BAD_DATA
    assert "STU404" in bad["message"]

    # GROUPS always reprocess: same payload accepted again (no digest no-op)
    res2 = ingest_groups(spark, wh, log, GROUPS_CSV.encode())
    assert res2["import_id"] != res["import_id"]
    assert res2["errors"] == 0


@pytest.mark.exhaustive
def test_purge_deleted_exams_hard_removes_rows(spark, env):
    from rdw_spark.sources.admin_flows import purge_deleted_exams

    wh, log = env
    _load_orgs(spark, wh, log)
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="P-1", ssid="STU001"),
        make_trt(opp_id="P-2", ssid="STU002"),
        make_trt(opp_id="P-3", ssid="STU003"),
    ])
    assert wh.read(spark, "exam").count() == 3
    items_before = wh.read(spark, "exam_item").count()
    assert items_before > 0

    bulk_delete_exams(spark, wh, import_id=999, school_year=2018)
    # soft-deleted rows still physically present
    assert wh.read(spark, "exam").count() == 3

    counts = purge_deleted_exams(spark, wh)
    assert counts["exam"] == 3 and counts["exam_item"] == items_before
    # physically gone now (runbook post-validation: counts match)
    assert wh.read(spark, "exam").count() == 0
    assert wh.read(spark, "exam_item").count() == 0
    assert wh.read(spark, "exam_score").count() == 0
    # idempotent
    assert purge_deleted_exams(spark, wh)["exam"] == 0


def test_user_report_save_and_json_query(spark, tmp_path):
    from rdw_spark.plans.rdw_reports import find_user_reports, save_user_report

    wh = TableStore(str(tmp_path / "wh"))
    r1 = save_user_report(spark, wh, "teacher@x", {
        "@class": "SchoolGradeExamReportRequest", "schoolYear": 2018,
        "schoolId": 6470, "gradeId": 11, "name": "Awesome Academy 2018",
    }, label="aa-2018")
    r2 = save_user_report(spark, wh, "teacher@x", {
        "@class": "SchoolGradeExamReportRequest", "schoolYear": 2018,
        "schoolId": 9999, "gradeId": 11,
    })
    # idempotent retry: same request → same id, no duplicate row
    assert save_user_report(spark, wh, "teacher@x", {
        "@class": "SchoolGradeExamReportRequest", "schoolYear": 2018,
        "schoolId": 6470, "gradeId": 11, "name": "Awesome Academy 2018",
    }, label="aa-2018") == r1
    ur = wh.read(spark, "user_report")
    assert ur.count() == 2

    # the Troubleshooting.md:427 support query, by JSON value not substring
    hits = find_user_reports(ur, schoolId=6470).collect()
    assert [h["id"] for h in hits] == [r1]
    assert find_user_reports(ur, schoolId=9999, gradeId=11).collect()[0]["id"] == r2
    assert find_user_reports(ur, schoolId=647).count() == 0  # no substring match


@pytest.mark.exhaustive
def test_purge_school_year_sweeps_reference_data(spark, env):
    from pyspark.sql import Row

    from rdw_spark.sources.admin_flows import purge_school_year

    wh, log = env
    _load_orgs(spark, wh, log)
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="Y-1", ssid="STU001"),
        make_trt(opp_id="Y-2", ssid="STU002"),
    ])
    ingest_groups(spark, wh, log, GROUPS_CSV.encode())
    assert wh.read(spark, "student_group").filter("school_year = 2018").count() > 0
    n_asmt_2018 = wh.read(spark, "asmt").filter("school_year = 2018").count()
    assert n_asmt_2018 > 0

    bulk_delete_exams(spark, wh, import_id=999, school_year=2018)
    counts = purge_school_year(spark, wh, 2018)

    assert counts["exam"] == 2 and counts["asmt"] == n_asmt_2018
    assert counts["student_group"] > 0
    assert wh.read(spark, "exam").count() == 0
    assert wh.read(spark, "asmt").filter("school_year = 2018").count() == 0
    assert wh.read(spark, "student_group").count() == 0
    assert wh.read(spark, "student_group_membership").count() == 0


def test_reset_only_batch_refreshes_inferred_school(spark, env):
    """Review regression: a batch containing ONLY resets must still
    re-run the inferred-school window for the affected students (the
    reset soft-deletes an exam, which can change the latest school)."""
    wh, log = env
    _load_orgs(spark, wh, log)
    # two schools, two completed exams: the later one at school 2002
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="R-1", ssid="STU001", school="55500010001001",
                 completed="2018-03-01T10:00:00"),
        make_trt(opp_id="R-2", ssid="STU001", school="55500010001002",
                 completed="2018-04-01T10:00:00"),
    ])
    schools = {r["natural_id"]: r["id"]
               for r in wh.read(spark, "school").collect()}
    stu = wh.read(spark, "student").collect()[0]
    assert stu["inferred_school_id"] == schools["55500010001002"]

    # reset-only batch: soft-deletes the later exam -> school must revert
    reset_trt = make_trt(
        opp_id="R-2", ssid="STU001", school="55500010001002",
        completed="2018-04-01T10:00:00",
    ).replace(b"<Opportunity", b"<Opportunity status=\"reset\"", 1)
    ingest_exams(spark, wh, log, [reset_trt])
    stu = wh.read(spark, "student").collect()[0]
    assert stu["inferred_school_id"] == schools["55500010001001"]


@pytest.mark.exhaustive
def test_snapshot_and_restore_warehouse(spark, env, tmp_path):
    """docs/Runbook.Archive.md analog: the archive is layout-independent
    parquet; restoring into a fresh store preserves every table's resolved
    content (incl. merge-on-read and partitioned tables)."""
    from rdw_spark.sources.admin_flows import (
        restore_warehouse, snapshot_warehouse,
    )

    wh, log = env
    _load_orgs(spark, wh, log)
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="A-1", ssid="STU001", score=2400.0),
        make_trt(opp_id="A-2", ssid="STU002", score=2500.0),
    ])
    counts = snapshot_warehouse(spark, wh, str(tmp_path / "archive"))
    assert counts["exam"] == 2 and counts["student"] == 2
    # the archive is plain parquet, queryable directly
    direct = spark.read.parquet(str(tmp_path / "archive" / "exam"))
    assert direct.count() == 2

    fresh = TableStore(str(tmp_path / "restored"), audit_enabled=False)
    restored = restore_warehouse(spark, str(tmp_path / "archive"), fresh)
    assert restored["exam"] == 2
    for name in ("exam", "student", "exam_item", "school", "import"):
        want = {tuple(r) for r in wh.read(spark, name).collect()}
        got = {tuple(r) for r in fresh.read(spark, name).collect()}
        assert got == want, name


@pytest.mark.exhaustive
def test_upload_student_group_staging_retention(spark, env):
    """docs/Troubleshooting.md:459-468 — a failed import RETAINS its
    intermediate upload_student_group rows; a clean one removes its own;
    the two documented cleanups delete by import id / by age."""
    from rdw_spark.sources.admin_flows import cleanup_upload_student_group

    wh, log = env
    _load_orgs(spark, wh, log)
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="U-1", ssid="STU001"),
        make_trt(opp_id="U-2", ssid="STU002"),
    ])

    # clean import: staging rows written then cleaned up
    res = ingest_groups(spark, wh, log, GROUPS_CSV.encode())
    assert res["errors"] == 0
    staged = wh.read(spark, "upload_student_group")
    assert staged.filter(F.col("import_id") == res["import_id"]).count() == 0

    # failing import: rows retained under its import id
    csv = GROUPS_CSV + "Grade6Math,55500010001001,2018,,STU404,\n"
    bad = ingest_groups(spark, wh, log, csv.encode())
    assert bad["errors"] == 1
    retained = wh.read(spark, "upload_student_group")
    n_rows = retained.filter(F.col("import_id") == bad["import_id"]).count()
    assert n_rows == 7  # all CSV body rows staged, not just the bad one

    # targeted cleanup (DELETE FROM upload_student_group WHERE import_id=…)
    deleted = cleanup_upload_student_group(spark, wh, import_id=bad["import_id"])
    assert deleted == n_rows
    assert wh.read(spark, "upload_student_group").count() == 0

    # age-based cleanup: nothing young enough to delete → 0
    bad2 = ingest_groups(spark, wh, log, csv.encode())
    assert cleanup_upload_student_group(
        spark, wh, older_than_days=3, log=log) == 0
    assert wh.read(spark, "upload_student_group").filter(
        F.col("import_id") == bad2["import_id"]).count() == 7


def test_pipeline_repository_lifecycle(spark, tmp_path):
    """Runbook.Pipeline.md:104-145 — WIP script + tests in warehouse
    tables, publish gated on golden tests, immutable archive versions,
    rollback by re-activating an older version."""
    import pytest as _pytest

    from rdw_spark.functions.pipeline import PipelineRepository

    wh = TableStore(str(tmp_path / "warehouse"))
    repo = PipelineRepository(wh, str(tmp_path / "archive"))

    body_v1 = '[{"kind": "regex_replace", "pattern": "foo", "replacement": "bar"}]'
    repo.save_script(spark, "exam", body_v1, user="dev@x")
    assert wh.read(spark, "pipeline").collect()[0]["active_version"] is None
    assert wh.read(spark, "pipeline_script").count() == 1

    # publish blocked without tests (F4 gate)
    with _pytest.raises(ValueError, match="at least one test"):
        repo.publish(spark, "exam")

    repo.save_test(spark, "exam", "t1", "say foo", "say bar")
    v1 = repo.publish(spark, "exam", user="dev@x")
    assert v1 == 1
    assert wh.read(spark, "pipeline").collect()[0]["active_version"] == 1
    active = repo.active_pipeline(spark, "exam")
    assert active.compile()("foo x foo") == "bar x bar"

    # new WIP version; failing golden test blocks publish
    body_v2 = '[{"kind": "regex_replace", "pattern": "foo", "replacement": "baz"}]'
    repo.save_script(spark, "exam", body_v2)
    with _pytest.raises(ValueError, match="failing"):
        repo.publish(spark, "exam")
    # fix the expectation and publish v2
    repo.save_test(spark, "exam", "t1", "say foo", "say baz")
    assert repo.publish(spark, "exam") == 2
    assert repo.active_pipeline(spark, "exam").compile()("foo") == "baz"

    # both archive versions kept; rollback re-activates v1
    repo.set_active_version(spark, "exam", 1)
    assert repo.active_pipeline(spark, "exam").compile()("foo") == "bar"
    with _pytest.raises(ValueError, match="not published"):
        repo.set_active_version(spark, "exam", 9)

    # non-declarative bodies are rejected at save (sandbox boundary)
    with _pytest.raises(ValueError, match="not a sandboxed step"):
        repo.save_script(spark, "exam", '[{"kind": "callable"}]')
