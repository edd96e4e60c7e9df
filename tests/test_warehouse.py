"""Warehouse layer: import-log lifecycle (T1/T5/T6), MERGE upsert with
lineage + audit (K1/X12), soft delete (J10), checkpointed incremental
migrate with the status machine and halt-on-failure (T2-T4, K2/K3)."""

from __future__ import annotations

import pytest
from datetime import datetime
from pyspark.sql import Row, functions as F

from rdw_spark.warehouse import ImportLog, ImportStatus, MigrateEngine, MigrateStatus, TableStore
from rdw_spark.warehouse.import_log import ImportContent
from rdw_spark.warehouse.migrate import MigrateStatus as MS


@pytest.fixture()
def wh(tmp_path):
    return TableStore(str(tmp_path / "warehouse"))


@pytest.fixture()
def log(wh, tmp_path):
    return ImportLog(wh, archive_root=str(tmp_path / "archive"))


def _seed_org(spark, wh, import_id):
    districts = spark.createDataFrame(
        [Row(natural_id="88800120000000", name="Igen District")]
    )
    wh.merge_upsert(spark, "district", districts, import_id)
    d_id = wh.read(spark, "district").collect()[0]["id"]
    schools = spark.createDataFrame([
        Row(natural_id="88800120012001", name="Big Bay", district_id=d_id),
        Row(natural_id="88800120012002", name="Igen Hold", district_id=d_id),
    ])
    wh.merge_upsert(spark, "school", schools, import_id)
    return d_id


class TestImportLog:
    def test_accept_digest_dedup_and_archive(self, spark, log):
        rec1 = log.accept(spark, ImportContent.ORGANIZATION, b"<org/>")
        assert rec1.id == 1 and rec1.status == ImportStatus.ACCEPTED and not rec1.existing
        # same payload again → safely no-ops, returns the prior import (API.md:263)
        rec2 = log.accept(spark, ImportContent.ORGANIZATION, b"<org/>")
        assert rec2.existing and rec2.id == 1
        # GROUPS content always reprocesses
        g1 = log.accept(spark, ImportContent.GROUPS, b"csv")
        g2 = log.accept(spark, ImportContent.GROUPS, b"csv")
        assert not g2.existing and g2.id == g1.id + 1
        # archive round-trip keyed by content + digest prefix
        assert log.read_archived_payload(ImportContent.ORGANIZATION, rec1.digest) == b"<org/>"

    def test_status_lifecycle_and_backlog(self, spark, log):
        rec = log.accept(spark, ImportContent.EXAM, b"<TDSReport/>")
        log.set_status(spark, rec.id, ImportStatus.UNKNOWN_SCHOOL,
                       message=[{"elem": "SchoolId", "error": "unknown"}])
        backlog = log.by_status(spark, ImportStatus.UNKNOWN_SCHOOL).collect()
        assert len(backlog) == 1 and backlog[0]["id"] == rec.id
        assert "SchoolId" in backlog[0]["message"]
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)
        assert log.by_status(spark, ImportStatus.UNKNOWN_SCHOOL).count() == 0


class TestMergeUpsert:
    def test_insert_update_unchanged_with_lineage_and_audit(self, spark, wh):
        stats = wh.merge_upsert(
            spark, "student",
            spark.createDataFrame([
                Row(ssid="SSID001", first_name="Ann", last_or_surname="Lee"),
                Row(ssid="SSID002", first_name="Bob", last_or_surname="Ray"),
            ]),
            import_id=10,
        )
        assert stats == {"inserted": 2, "updated": 0, "unchanged": 0}
        rows = {r["ssid"]: r for r in wh.read(spark, "student").collect()}
        assert rows["SSID001"]["import_id"] == 10
        assert rows["SSID001"]["update_import_id"] == 10
        assert rows["SSID001"]["id"] is not None

        # second import: one changed, one identical
        stats = wh.merge_upsert(
            spark, "student",
            spark.createDataFrame([
                Row(ssid="SSID001", first_name="Anne", last_or_surname="Lee"),
                Row(ssid="SSID002", first_name="Bob", last_or_surname="Ray"),
            ]),
            import_id=11,
        )
        assert stats == {"inserted": 0, "updated": 1, "unchanged": 1}
        rows2 = {r["ssid"]: r for r in wh.read(spark, "student").collect()}
        # changed row: create lineage kept, update lineage advanced
        assert rows2["SSID001"]["import_id"] == 10
        assert rows2["SSID001"]["update_import_id"] == 11
        assert rows2["SSID001"]["first_name"] == "Anne"
        assert rows2["SSID001"]["id"] == rows["SSID001"]["id"]  # stable surrogate
        # unchanged row untouched
        assert rows2["SSID002"]["update_import_id"] == 10
        assert rows2["SSID002"]["updated"] == rows["SSID002"]["updated"]
        # audit shadow holds the before-image (Runbook.Audit.md:68-76)
        audit = wh.read_audit(spark, "student").collect()
        assert len(audit) == 1
        assert audit[0]["first_name"] == "Ann" and audit[0]["action"] == "update"

    def test_soft_delete_marks_and_audits(self, spark, wh):
        _seed_org(spark, wh, import_id=1)
        exams = spark.createDataFrame([
            Row(opp_id="OPP1", asmt_id=5, type_code="sum", school_year=2018,
                student_id=1, school_id=1, grade_code="06",
                completed_at="2018-04-01 10:00:00", scale_score=2500.0),
        ]).withColumn("completed_at", F.to_timestamp("completed_at"))
        wh.merge_upsert(spark, "exam", exams, import_id=2)
        n = wh.soft_delete(
            spark, "exam",
            spark.createDataFrame([Row(opp_id="OPP1", asmt_id=5)]), import_id=3,
        )
        assert n == 1
        row = wh.read(spark, "exam").collect()[0]
        assert row["deleted"] is True and row["update_import_id"] == 3
        audit = wh.read_audit(spark, "exam").filter(F.col("action") == "delete")
        assert audit.count() == 1

    def test_replace_children(self, spark, wh):
        items = spark.createDataFrame([
            Row(exam_id=1, item_key="I1", position=1, score=1.0,
                score_status="SCORED", response="A"),
            Row(exam_id=2, item_key="I1", position=1, score=0.0,
                score_status="SCORED", response="B"),
        ])
        wh.replace_children(spark, "exam_item", "exam_id", items)
        repl = spark.createDataFrame([
            Row(exam_id=1, item_key="I1", position=1, score=0.5,
                score_status="SCORED", response="C"),
            Row(exam_id=1, item_key="I2", position=2, score=1.0,
                score_status="SCORED", response="D"),
        ])
        wh.replace_children(spark, "exam_item", "exam_id", repl)
        out = wh.read(spark, "exam_item")
        assert out.filter(F.col("exam_id") == 1).count() == 2  # replaced
        assert out.filter(F.col("exam_id") == 2).count() == 1  # untouched


class TestMigrate:
    def _seed_warehouse(self, spark, wh, log):
        rec = log.accept(spark, ImportContent.ORGANIZATION, b"orgs")
        d_id = _seed_org(spark, wh, rec.id)
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)

        rec2 = log.accept(spark, ImportContent.PACKAGE, b"pkg")
        wh.merge_upsert(spark, "asmt", spark.createDataFrame([
            Row(natural_id="ASMT-G6-SUM", name="G6 Summative", label="G6",
                version="1", type_code="sum", subject_code="Math",
                grade_code="06", school_year=2018),
            Row(natural_id="ASMT-G6-IAB", name="G6 Interim Block", label="G6I",
                version="1", type_code="iab", subject_code="Math",
                grade_code="06", school_year=2018),
        ]), rec2.id)
        log.set_status(spark, rec2.id, ImportStatus.PROCESSED)

        rec3 = log.accept(spark, ImportContent.EXAM, b"exam-batch-1")
        wh.merge_upsert(spark, "student", spark.createDataFrame([
            Row(ssid="SSID001", first_name="Ann", last_or_surname="Lee"),
        ]), rec3.id)
        ids = {
            "asmt_sum": wh.read(spark, "asmt").filter("type_code='sum'").collect()[0]["id"],
            "asmt_iab": wh.read(spark, "asmt").filter("type_code='iab'").collect()[0]["id"],
            "student": wh.read(spark, "student").collect()[0]["id"],
            "school": wh.read(spark, "school").collect()[0]["id"],
        }
        exams = spark.createDataFrame([
            Row(opp_id="OPP1", asmt_id=ids["asmt_sum"], type_code="sum",
                school_year=2018, student_id=ids["student"],
                school_id=ids["school"], grade_code="06",
                completed_at="2018-04-01 10:00:00", scale_score=2500.0,
                performance_level=3),
            Row(opp_id="OPP2", asmt_id=ids["asmt_iab"], type_code="iab",
                school_year=2018, student_id=ids["student"],
                school_id=ids["school"], grade_code="06",
                completed_at="2018-02-01 10:00:00", scale_score=2400.0,
                performance_level=2),
        ]).withColumn("completed_at", F.to_timestamp("completed_at"))
        wh.merge_upsert(spark, "exam", exams, rec3.id)
        log.set_status(spark, rec3.id, ImportStatus.PROCESSED)
        return ids

    def test_incremental_migrate_reporting_and_olap(self, spark, wh, log, tmp_path):
        self._seed_warehouse(spark, wh, log)
        eng = MigrateEngine(wh, str(tmp_path / "mart"), batch_size=2000)

        res = eng.run_once(spark, "reporting")
        assert res["state"] == "completed" and res["migrated"] == 2
        rep = eng.read_mart(spark, "reporting_exam")
        assert rep.count() == 2
        row = rep.filter(F.col("opp_id") == "OPP1").collect()[0]
        assert row["school_name"] == "Big Bay" or row["school_name"] == "Igen Hold"
        assert row["district_name"] == "Igen District"
        assert row["ssid"] == "SSID001"

        # second run: nothing new → noop (checkpoint advanced)
        assert eng.run_once(spark, "reporting")["state"] == "noop"

        res = eng.run_once(spark, "olap")
        assert res["state"] == "completed"
        assert eng.read_mart(spark, "olap_exam").count() == 1        # sum only
        assert eng.read_mart(spark, "olap_iab_exam").count() == 1    # iab fan-out
        assert eng.read_mart(spark, "olap_exam_longitudinal").count() == 1

        # incremental: a new exam import only migrates the delta
        rec4 = log.accept(spark, ImportContent.EXAM, b"exam-batch-2")
        asmt_id = wh.read(spark, "asmt").filter("type_code='sum'").collect()[0]["id"]
        sk = wh.read(spark, "school").collect()[0]["id"]
        st = wh.read(spark, "student").collect()[0]["id"]
        wh.merge_upsert(spark, "exam", spark.createDataFrame([
            Row(opp_id="OPP3", asmt_id=asmt_id, type_code="sum", school_year=2019,
                student_id=st, school_id=sk, grade_code="07",
                completed_at="2019-04-01 10:00:00", scale_score=2550.0,
                performance_level=3),
        ]).withColumn("completed_at", F.to_timestamp("completed_at")), rec4.id)
        log.set_status(spark, rec4.id, ImportStatus.PROCESSED)
        res = eng.run_once(spark, "reporting")
        assert res["state"] == "completed" and res["migrated"] == 1
        assert eng.read_mart(spark, "reporting_exam").count() == 3
        # control table recorded the runs with the id ranges (T4)
        ctl = eng.control(spark).filter(F.col("status") == MS.COMPLETED)
        assert ctl.filter(F.col("job") == "reporting").count() == 2

    def test_halt_on_failure_and_manual_enable(self, spark, wh, log, tmp_path, monkeypatch):
        self._seed_warehouse(spark, wh, log)
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        monkeypatch.setattr(
            eng, "_migrate_batch",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
        )
        res = eng.run_once(spark, "reporting")
        assert res["state"] == "failed"
        # job now disabled until manual enable (Troubleshooting.md:241-253)
        assert eng.run_once(spark, "reporting")["state"] == "disabled"
        # the documented failure check resolves the migrate_status name
        failed = eng.failed_runs(spark).collect()
        assert len(failed) == 1 and failed[0]["status_name"] == "FAILED"
        monkeypatch.undo()
        eng.enable(spark, "reporting")
        res = eng.run_once(spark, "reporting")
        assert res["state"] == "completed" and res["migrated"] == 2
        statuses = [r["status"] for r in eng.control(spark).orderBy("id", "updated").collect()]
        assert MigrateStatus.FAILED in statuses or MigrateStatus.ABANDONED in statuses


class TestMigrateGate:
    """Data-quality admission gate composed into the migrate path: a
    violating batch halts the job with the report persisted (the T4
    halt-on-failure protocol extended to quality); a clean batch
    migrates and still leaves its passing report."""

    def test_violating_batch_halts_with_report(self, spark, wh, log, tmp_path):
        TestMigrate()._seed_warehouse(spark, wh, log)
        rules = [
            ("r_score_range", "between", "scale_score", (0, 2450)),  # OPP1=2500 violates
            ("r_grade_set", "in_set", "grade_code", ["06", "07", "08"]),
        ]
        eng = MigrateEngine(wh, str(tmp_path / "mart"), expectations=rules)
        res = eng.run_once(spark, "reporting")
        assert res["state"] == "failed"
        assert eng.run_once(spark, "reporting")["state"] == "disabled"
        failed = eng.failed_runs(spark).collect()
        assert len(failed) == 1
        assert "r_score_range" in failed[0]["message"]
        # report persisted: one row per rule, tagged with the run
        rep = {r["rule"]: r for r in eng.gate_reports(spark).collect()}
        assert rep["r_score_range"]["passed"] is False
        assert rep["r_score_range"]["n_violations"] == 1
        assert rep["r_grade_set"]["passed"] is True
        assert rep["r_score_range"]["job"] == "reporting"
        # nothing migrated — the mart never published a snapshot
        import pytest

        with pytest.raises(FileNotFoundError, match="no published snapshot"):
            eng.read_mart(spark, "reporting_exam")

    def test_psi_drift_gate_halts_shifted_batch(self, spark, wh, log, tmp_path):
        ids = TestMigrate()._seed_warehouse(spark, wh, log)
        eng = MigrateEngine(
            wh, str(tmp_path / "mart"),
            psi_gate=("scale_score", [2300.0, 2450.0, 2600.0], 0.25))
        # first batch: no baseline below it -> vacuous pass, migrates
        res = eng.run_once(spark, "reporting")
        assert res["state"] == "completed" and res["migrated"] == 2

        # second batch: scores shifted way out of the baseline bins
        rec = log.accept(spark, ImportContent.EXAM, b"exam-batch-drift")
        wh.merge_upsert(spark, "exam", spark.createDataFrame([
            Row(opp_id=f"DRIFT{i}", asmt_id=ids["asmt_sum"], type_code="sum",
                school_year=2018, student_id=ids["student"],
                school_id=ids["school"], grade_code="06",
                completed_at="2018-05-01 10:00:00", scale_score=9000.0 + i,
                performance_level=4)
            for i in range(3)
        ]).withColumn("completed_at", F.to_timestamp("completed_at")), rec.id)
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)

        res = eng.run_once(spark, "reporting")
        assert res["state"] == "failed"
        assert eng.run_once(spark, "reporting")["state"] == "disabled"
        rep = {(r["rule"], r["run_id"]): r
               for r in eng.gate_reports(spark).collect()}
        runs = sorted(rid for rule, rid in rep if rule == "psi_drift")
        assert len(runs) == 1  # first batch had no baseline -> no PSI row
        drift = rep[("psi_drift", runs[0])]
        assert drift["passed"] is False
        assert drift["n_violations"] > 250_000  # PSI > 0.25 in micro-units
        # the shifted rows never reached the mart
        assert eng.read_mart(spark, "reporting_exam").count() == 2

    def test_clean_batch_migrates_with_passing_report(self, spark, wh, log, tmp_path):
        TestMigrate()._seed_warehouse(spark, wh, log)
        rules = [
            ("r_score_range", "between", "scale_score", (0, 9999)),
            ("r_opp_not_null", "not_null", "opp_id", None),
        ]
        eng = MigrateEngine(wh, str(tmp_path / "mart"), expectations=rules)
        res = eng.run_once(spark, "reporting")
        assert res["state"] == "completed" and res["migrated"] == 2
        rep = eng.gate_reports(spark).collect()
        assert len(rep) == 2 and all(r["passed"] for r in rep)
        # no gate configured -> no reports, plain migrate
        eng2 = MigrateEngine(wh, str(tmp_path / "mart2"))
        assert eng2.run_once(spark, "olap")["state"] == "completed"
        assert eng2.gate_reports(spark).count() == 0


class TestAuditSetting:
    """Runtime audit toggle via the ``setting`` table
    (docs/Runbook.Audit.md:83-101): only value TRUE writes audit rows;
    embargo auditing may not be disabled."""

    def _upsert_twice(self, spark, wh, table, rows_v1, rows_v2, keys=None):
        wh.merge_upsert(spark, table, spark.createDataFrame(rows_v1), 1, keys)
        wh.merge_upsert(spark, table, spark.createDataFrame(rows_v2), 2, keys)

    def test_setting_gates_student_audit(self, spark, wh):
        wh.set_setting(spark, "AUDIT_TRIGGER_ENABLE", "FALSE")
        assert wh.setting(spark, "AUDIT_TRIGGER_ENABLE") == "FALSE"
        self._upsert_twice(
            spark, wh, "student",
            [Row(ssid="S1", first_name="Ann", last_or_surname="Lee")],
            [Row(ssid="S1", first_name="Anne", last_or_surname="Lee")],
        )
        assert wh.read_audit(spark, "student").count() == 0

        # flip back on: the next change is audited again
        wh.set_setting(spark, "AUDIT_TRIGGER_ENABLE", "TRUE")
        wh.merge_upsert(spark, "student", spark.createDataFrame(
            [Row(ssid="S1", first_name="Annette", last_or_surname="Lee")]), 3)
        audit = wh.read_audit(spark, "student").collect()
        assert len(audit) == 1 and audit[0]["first_name"] == "Anne"

    def test_embargo_audit_cannot_be_disabled(self, spark, wh):
        wh.set_setting(spark, "AUDIT_TRIGGER_ENABLE", "FALSE")
        self._upsert_twice(
            spark, wh, "state_embargo",
            [Row(school_year=2018, individual=0, aggregate=0)],
            [Row(school_year=2018, individual=1, aggregate=2)],
            keys=["school_year"],
        )
        audit = wh.read_audit(spark, "state_embargo").collect()
        assert len(audit) == 1 and audit[0]["action"] == "update"


class TestNoOpSkipSemantics:
    def test_identical_reimport_resurrects_soft_deleted_row(self, spark, wh):
        """API.md:369: re-importing identical content must clear a
        soft-delete even though the payload fingerprint is unchanged (the
        skip-identical-batch shortcut must not drop the resurrection)."""
        rows = spark.createDataFrame([Row(
            opp_id="OPP-1", asmt_id=7, opportunity=1, asmt_version="1",
            type_code="sum", school_year=2018, student_id=1, school_id=2,
            grade_code="06", completeness="Complete",
            administration_condition="Valid", session_id="s",
            scale_score=2400.0, scale_score_std_err=20.0, performance_level=2,
            completed_at=datetime(2018, 4, 1), iep=False, lep=False, section504=False,
            economic_disadvantage=False, migrant_status=False,
            language_code="eng", military_connected="No",
        )])
        wh.merge_upsert(spark, "exam", rows, 10)
        wh.soft_delete(spark, "exam", rows.select("opp_id", "asmt_id"), 11)
        assert wh.read(spark, "exam").collect()[0]["deleted"] is True

        # byte-identical re-import: 0 inserted, 0 updated — but undeleted
        wh.merge_upsert(spark, "exam", rows, 12)
        assert wh.read(spark, "exam").collect()[0]["deleted"] is False

    def test_identical_batch_without_deletes_skips_write(self, spark, wh):
        rows = spark.createDataFrame(
            [Row(ssid="S1", first_name="A", last_or_surname="B")])
        wh.merge_upsert(spark, "student", rows, 1)
        v1 = wh.mor_table("student").current_seq()
        wh.merge_upsert(spark, "student", rows, 2)  # no change, no delete
        assert wh.mor_table("student").current_seq() == v1  # write skipped


class TestChildAudit:
    def test_replaced_children_get_delete_before_images(self, spark, tmp_path):
        """The reference audits child DELETEs (exam_item Update/Delete,
        exam_score Update, accommodation/ethnicity Delete —
        docs/Runbook.Audit.md:54-64); our replace-per-parent write records
        the replaced rows as 'delete' before-images."""
        wh = TableStore(str(tmp_path / "wh"))  # audit on
        items = spark.createDataFrame(
            [(1, "k1", 1, 1.0, "SCORED", "a"), (1, "k2", 2, 0.0, "SCORED", "b")],
            "exam_id long, item_key string, position int, score double, "
            "score_status string, response string",
        )
        wh.replace_children(spark, "exam_item", "exam_id", items)
        # first write replaces nothing — no audit rows
        assert wh.read_audit(spark, "exam_item").count() == 0

        update = spark.createDataFrame(
            [(1, "k1", 1, 2.0, "SCORED", "a2")],
            "exam_id long, item_key string, position int, score double, "
            "score_status string, response string",
        )
        wh.replace_children(spark, "exam_item", "exam_id", update)
        audit = wh.read_audit(spark, "exam_item").collect()
        assert len(audit) == 2  # both replaced rows captured
        assert {r["item_key"] for r in audit} == {"k1", "k2"}
        assert all(r["action"] == "delete" for r in audit)
        # live content is the new set only
        assert wh.read(spark, "exam_item").count() == 1
