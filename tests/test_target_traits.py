"""Target-score fact, target exclusions, and writing-trait scores — the
round-5 entity-inventory additions:

- ``olap_exam_target_score`` is the 5th OLAP fan-out fact ("scored target
  data for Summative exams", reference docs/Runbook.BulkDeleteExams.md:117)
- ``asmt_target_exclusion`` is the IT-maintained exclusion table whose
  insert flow also triggers migration
  (docs/Runbook.SystemConfiguration.md:148-167)
- ``exam_item_trait_score`` lands WER sub-scores from the TRT, typed by the
  subject XML trait definitions (deploy/ELA_subject.xml:863-880)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdw_spark.plans import rdw_reports as R
from rdw_spark.sources.admin_flows import (
    add_target_exclusions, update_item_standards,
)
from rdw_spark.sources.dim_ingest import (
    ingest_organizations, ingest_package, ingest_subject,
)
from rdw_spark.sources.exam_ingest import ingest_exams
from rdw_spark.warehouse import ImportLog, MigrateEngine, TableStore

from tests.test_sources import ORG_JSON, PACKAGE_CSV, SUBJECT_XML, make_trt


@pytest.fixture(scope="module")
def _env_template(spark, tmp_path_factory):
    """Build the warehouse ONCE per module; tests get an isolated COPY.
    TableStore/ImportLog are purely path-based (versioned parquet dirs),
    so a directory copy reconstructs identical state — this fixture was
    ~24s of Spark ingest per test (14 tests) when function-scoped."""
    root = tmp_path_factory.mktemp("tt_template") / "warehouse"
    wh = TableStore(str(root), audit_enabled=False)
    log = ImportLog(wh, archive_root=None)
    assert ingest_organizations(spark, wh, log, ORG_JSON.encode())["status"] == "PROCESSED"
    assert ingest_package(spark, wh, log, PACKAGE_CSV.encode())["status"] == "PROCESSED"
    assert ingest_subject(spark, wh, log, SUBJECT_XML.encode())["status"] == "PROCESSED"
    payloads = [
        make_trt(opp_id=f"OPP-{i}", ssid=f"STU00{i}", score=2400.0 + 50 * i)
        for i in range(1, 4)
    ]
    res = ingest_exams(spark, wh, log, payloads, batch="tt")
    assert res["processed"] == 3
    return root


@pytest.fixture()
def env(spark, tmp_path, _env_template):
    import shutil

    dst = tmp_path / "warehouse"
    shutil.copytree(_env_template, dst)
    wh = TableStore(str(dst), audit_enabled=False)
    log = ImportLog(wh, archive_root=None)
    return wh, log


class TestTargetScoreFact:
    def test_olap_fanout_includes_target_scores(self, spark, env, tmp_path):
        wh, log = env
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        eng.run_until_caught_up(spark, "olap")
        fact = eng.read_mart(spark, "olap_exam_target_score").collect()
        # 3 exams × 2 items, one item per (claim, target) → 2 rows per exam
        assert len(fact) == 6
        by_key = {(r["exam_id"], r["target_code"]): r for r in fact}
        for r in fact:
            assert r["school_year"] == 2018
            assert r["subject_code"] == "Math"
            assert r["num_items"] == 1
        t1 = [r for r in fact if r["target_code"] == "T1"]
        assert {r["claim_code"] for r in t1} == {"C1"}
        assert all(r["points_earned"] == 1.0 and r["points_possible"] == 1.0
                   for r in t1)
        t2 = [r for r in fact if r["target_code"] == "T2"]
        assert all(r["points_earned"] == 0.5 and r["points_possible"] == 2.0
                   for r in t2)

    def test_exclusion_flow_and_report(self, spark, env, tmp_path):
        wh, log = env
        # baseline target report sees both targets
        base = R.target_report_from_warehouse(spark, wh, min_students=1)
        assert {r["target_code"] for r in base.collect()} == {"T1", "T2"}

        res = add_target_exclusions(spark, wh, log, "TESTASMT-G6-2018",
                                    [("C1", "T1")])
        assert res["exclusions_added"] == 1
        excl = wh.read(spark, "asmt_target_exclusion").collect()
        assert len(excl) == 1
        assert (excl[0]["claim_code"], excl[0]["target_code"]) == ("C1", "T1")
        # the exclusion resolved the target dim's surrogate id
        tgt = wh.read(spark, "target").filter("natural_id = 'T1'").collect()[0]
        assert excl[0]["target_id"] == tgt["id"]

        # the report now drops the excluded target
        rep = R.target_report_from_warehouse(spark, wh, min_students=1)
        assert {r["target_code"] for r in rep.collect()} == {"T2"}

        # the documented trigger: a PROCESSED PACKAGE import the asmt's
        # update_import_id points at, so migrate re-materializes it
        asmt = wh.read(spark, "asmt").collect()[0]
        assert asmt["update_import_id"] == res["import_id"]
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        assert eng.run_until_caught_up(spark, "olap") > 0

    def test_duplicate_exclusion_noop(self, spark, env, tmp_path):
        wh, log = env
        add_target_exclusions(spark, wh, log, "TESTASMT-G6-2018", [("C1", "T1")])
        add_target_exclusions(spark, wh, log, "TESTASMT-G6-2018", [("C1", "T1")])
        assert wh.read(spark, "asmt_target_exclusion").count() == 1


class TestTraitScores:
    def test_wer_traits_land_with_purpose(self, spark, env):
        wh, log = env
        res = ingest_exams(
            spark, wh, log,
            [make_trt(opp_id="OPP-W", ssid="STU009", include_items=False,
                      wer_item=True)],
        )
        assert res["processed"] == 1
        rows = wh.read(spark, "exam_item_trait_score").collect()
        assert len(rows) == 2
        by_cat = {r["category"]: r for r in rows}
        assert by_cat["ORG"]["score"] == 3.0 and by_cat["ORG"]["max_score"] == 4.0
        assert by_cat["CON"]["score"] == 1.0
        # purpose resolved from the package item's PtWritingType
        assert by_cat["ORG"]["purpose"] == "EXPL"
        assert by_cat["ORG"]["item_key"] == "100-1002"

    def test_claim_report_resolves_names(self, spark, env):
        wh, log = env
        rep = R.claim_score_report(
            wh.read(spark, "exam_score"), wh.read(spark, "exam"),
            claim=wh.read(spark, "claim"),
        ).collect()
        names = {r["claim_code"]: r["claim_name"] for r in rep}
        assert names["C1"] == "Concepts"
        assert names["C2"] == "Problem Solving"


class TestItemStandardsFlow:
    """The runbook's manual "update assessment item common core standards"
    flow (docs/Runbook.ManualDataModifications.md:57-113)."""

    def test_add_remove_and_trigger(self, spark, env, tmp_path):
        wh, log = env
        before = {(r["item_key"], r["natural_id"], r["secondary"])
                  for r in wh.read(spark, "item_common_core_standard").collect()}
        assert ("100-1001", "6.NS.1", False) in before

        res = update_item_standards(
            spark, wh, log, "TESTASMT-G6-2018",
            add=[("100-1002", "6.NS.1")], remove=[("100-1001", "6.NS.1")],
            subject_code="tsub",
        )
        assert res["standards_added"] == 1
        assert res["standards_removed"] == 1

        after = {(r["item_key"], r["natural_id"], r["secondary"])
                 for r in wh.read(spark, "item_common_core_standard").collect()}
        # manual adds are secondary associations; the package's primary
        # standard column on item stays authoritative
        assert ("100-1002", "6.NS.1", True) in after
        assert not any(k == "100-1001" and s == "6.NS.1" for k, s, _ in after)
        # untouched associations survive
        assert ("100-1001", "6.NS.2", False) in after

        # the documented finalize: a PROCESSED manual PACKAGE import the
        # asmt's update_import_id points at, so the next migrate runs
        asmt = wh.read(spark, "asmt").collect()[0]
        assert asmt["update_import_id"] == res["import_id"]
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        assert eng.run_until_caught_up(spark, "olap") > 0

    def test_reapply_after_revert_gets_fresh_import(self, spark, env):
        """The documented digest appends NOW() 'to make it unique by adding
        time': apply -> revert -> re-apply must produce THREE imports, so
        the third call's table change migrates instead of being
        digest-deduped into the first call's already-migrated import."""
        wh, log = env
        ids = []
        for add, remove in [
            ([("100-1001", "6.RP.2")], []),
            ([], [("100-1001", "6.RP.2")]),
            ([("100-1001", "6.RP.2")], []),
        ]:
            res = update_item_standards(
                spark, wh, log, "TESTASMT-G6-2018", add=add, remove=remove,
                subject_code="tsub",
            )
            ids.append(res["import_id"])
        assert len(set(ids)) == 3
        # the re-applied association is present and the asmt points at the
        # LAST import, so the next migrate picks the change up
        after = {(r["item_key"], r["natural_id"])
                 for r in wh.read(spark, "item_common_core_standard").collect()}
        assert ("100-1001", "6.RP.2") in after
        asmt = wh.read(spark, "asmt").collect()[0]
        assert asmt["update_import_id"] == ids[-1]

    def test_readd_existing_primary_keeps_flag_and_counts_zero(self, spark, env):
        """Re-adding the package's primary association is a no-op: the
        existing secondary=False row survives untouched (never flips to
        True) and the net counts report 0 / 0."""
        wh, log = env
        res = update_item_standards(
            spark, wh, log, "TESTASMT-G6-2018",
            add=[("100-1001", "6.NS.1")], remove=[("100-1002", "6.NS.1")],
            subject_code="tsub",
        )
        assert res["standards_added"] == 0
        assert res["standards_removed"] == 0
        after = {(r["item_key"], r["natural_id"], r["secondary"])
                 for r in wh.read(spark, "item_common_core_standard").collect()}
        assert ("100-1001", "6.NS.1", False) in after
        assert ("100-1001", "6.NS.1", True) not in after

    def test_unknown_item_or_standard_raises(self, spark, env):
        wh, log = env
        with pytest.raises(ValueError, match="unknown items"):
            update_item_standards(spark, wh, log, "TESTASMT-G6-2018",
                                  add=[("999-9", "6.NS.1")])
        with pytest.raises(ValueError, match="not loaded"):
            update_item_standards(spark, wh, log, "TESTASMT-G6-2018",
                                  add=[("100-1001", "9.XX.9")])


class TestValidateIntegrity:
    """The RDW_Schema validation-folder analog: key-level reconciliation of
    warehouse vs marts (docs/Monitoring.md:161-162)."""

    def test_caught_up_shows_zero_discrepancies(self, spark, env, tmp_path):
        wh, log = env
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        eng.run_until_caught_up(spark, "reporting")
        eng.run_until_caught_up(spark, "olap")
        rows = eng.validate_integrity(spark).collect()
        by_table = {r["table"]: r for r in rows}
        assert by_table["reporting_exam"]["expected_rows"] == 3
        assert by_table["olap_exam"]["expected_rows"] == 3
        assert by_table["olap_exam_score"]["expected_rows"] == 6
        assert by_table["olap_exam_target_score"]["expected_rows"] == 6
        for r in rows:
            assert r["missing_in_mart"] == 0, r
            assert r["orphaned_in_mart"] == 0, r
            assert r["mart_rows"] == r["expected_rows"], r
        # plan gate: the key-level reconciliation must stay equi-joined
        # (no cartesian) with the item-dim grain join broadcast
        import contextlib, io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            eng.validate_integrity(spark).explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_detects_missing_and_orphaned_rows(self, spark, env, tmp_path):
        wh, log = env
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        eng.run_until_caught_up(spark, "reporting")
        eng.run_until_caught_up(spark, "olap")

        # tamper: drop one mart row (simulated partial migrate loss) and
        # inject one row whose id the warehouse never issued
        mart = eng.read_mart(spark, "reporting_exam")
        victim = mart.limit(1)
        eng._mart_tables["reporting_exam"].delete_rows(
            spark, victim.select("id", "school_year"), ["id"])
        bogus = mart.limit(1).withColumn("id", F.lit(-987654321).cast("long"))
        eng._mart_tables["reporting_exam"].merge_rows(spark, bogus, ["id"])

        rows = {r["table"]: r for r in eng.validate_integrity(spark).collect()}
        rep = rows["reporting_exam"]
        assert rep["missing_in_mart"] == 1
        assert rep["orphaned_in_mart"] == 1
        # the olap side is untouched and stays clean
        assert rows["olap_exam"]["missing_in_mart"] == 0
        assert rows["olap_exam"]["orphaned_in_mart"] == 0

    def test_pending_batches_are_excused(self, spark, env, tmp_path):
        wh, log = env
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        eng.run_until_caught_up(spark, "reporting")
        eng.run_until_caught_up(spark, "olap")
        # new exam accepted but not yet migrated: inside the warehouse,
        # beyond both checkpoints — not a discrepancy
        res = ingest_exams(spark, wh, log, [
            make_trt(opp_id="OPP-PEND", ssid="STU777", score=2500.0)])
        assert res["processed"] == 1
        rows = eng.validate_integrity(spark).collect()
        for r in rows:
            assert r["missing_in_mart"] == 0, r
            assert r["orphaned_in_mart"] == 0, r


class TestMartDeletes:
    def test_soft_delete_migrate_removes_all_fact_rows(self, spark, env, tmp_path):
        """The reference deletes migrated soft-deletes from every OLAP fact
        ("the system automatically deletes the records in the OLAP data
        mart during migration", docs/Runbook.BulkDeleteExams.md:111) — no
        stale rows may remain in the score/target/longitudinal facts."""
        from rdw_spark.sources.admin_flows import bulk_delete_exams
        from rdw_spark.warehouse.import_log import ImportContent, ImportStatus

        wh, log = env
        eng = MigrateEngine(wh, str(tmp_path / "mart"))
        eng.run_until_caught_up(spark, "olap")
        eng.run_until_caught_up(spark, "reporting")
        assert eng.read_mart(spark, "olap_exam").count() == 3
        assert eng.read_mart(spark, "olap_exam_score").count() == 6
        assert eng.read_mart(spark, "olap_exam_target_score").count() == 6
        assert eng.read_mart(spark, "olap_exam_longitudinal").count() == 3

        rec = log.accept(spark, ImportContent.EXAM, b"delete-all-tt")
        assert bulk_delete_exams(spark, wh, rec.id, school_year=2018) == 3
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)
        eng.run_until_caught_up(spark, "olap")
        eng.run_until_caught_up(spark, "reporting")

        for mart in ("olap_exam", "olap_exam_score", "olap_exam_target_score",
                     "olap_exam_longitudinal", "reporting_exam"):
            assert eng.read_mart(spark, mart).count() == 0, mart

        # resurrection: re-importing the exam (fresh payload — a
        # byte-identical one would digest-no-op, T5) un-deletes it and the
        # next migrate restores the fact rows (docs/API.md:369)
        res = ingest_exams(spark, wh, log, [
            make_trt(opp_id="OPP-1", ssid="STU001", score=2460.0)])
        assert res["processed"] == 1
        eng.run_until_caught_up(spark, "olap")
        assert eng.read_mart(spark, "olap_exam").count() == 1
        assert eng.read_mart(spark, "olap_exam_target_score").count() == 2
