"""RDW-domain report queries (§3.2/§3.3) over an ingested + migrated
warehouse: aggregate/target/longitudinal/claim reports, embargo and
permission scoping, audit history, monitoring and reconciliation."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from rdw_spark.plans import rdw_reports as R
from rdw_spark.sources.exam_ingest import ingest_exams
from rdw_spark.sources.org import parse_org_json, resolve_school_district_ids
from rdw_spark.sources.package import parse_package, read_package_csv
from rdw_spark.warehouse import ImportLog, ImportStatus, MigrateEngine, TableStore
from rdw_spark.warehouse.import_log import ImportContent

from tests.test_sources import ORG_JSON, PACKAGE_CSV, make_trt


@pytest.fixture(scope="module")
def mart_env(spark, tmp_path_factory):
    """Ingested + migrated environment shared by the report tests."""
    root = tmp_path_factory.mktemp("rdw_reports")
    wh = TableStore(str(root / "warehouse"))
    log = ImportLog(wh, archive_root=str(root / "archive"))

    rec = log.accept(spark, ImportContent.ORGANIZATION, ORG_JSON.encode())
    org = parse_org_json(spark, ORG_JSON)
    wh.merge_upsert(spark, "district", org["district"], rec.id)
    wh.merge_upsert(
        spark, "school",
        resolve_school_district_ids(org["school"], wh.read(spark, "district")),
        rec.id,
    )
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)

    rec = log.accept(spark, ImportContent.PACKAGE, PACKAGE_CSV.encode())
    pkg = parse_package(read_package_csv(spark, PACKAGE_CSV))
    wh.merge_upsert(spark, "asmt", pkg["asmt"], rec.id)
    wh.replace_children(
        spark, "item", "asmt_id",
        pkg["item"].join(
            wh.read(spark, "asmt").select(
                F.col("natural_id").alias("asmt_natural_id"),
                F.col("id").alias("asmt_id")),
            "asmt_natural_id",
        ).drop("asmt_natural_id"),
    )
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)

    # two students × two years (longitudinal), four students in 2018
    payloads = [
        make_trt(opp_id="OPP-1", ssid="STU001", score=2300.0),
        make_trt(opp_id="OPP-2", ssid="STU002", score=2400.0),
        make_trt(opp_id="OPP-3", ssid="STU003", score=2550.0,
                 school="55500010001002"),
        make_trt(opp_id="OPP-4", ssid="STU004", score=2650.0,
                 school="55500010001002"),
    ]
    ingest_exams(spark, wh, log, payloads, batch="r1")
    # resubmit OPP-1 with a higher score → audit row + update lineage
    ingest_exams(spark, wh, log, [make_trt(opp_id="OPP-1", ssid="STU001",
                                           score=2520.0)])

    eng = MigrateEngine(wh, str(root / "mart"))
    eng.run_until_caught_up(spark, "reporting")
    eng.run_until_caught_up(spark, "olap")
    return wh, log, eng


def test_individual_queries(spark, mart_env):
    wh, log, eng = mart_env
    rep = eng.read_mart(spark, "reporting_exam")
    mine = R.student_exam_results(rep, "STU001").collect()
    assert len(mine) == 1 and mine[0]["scale_score"] == 2520.0

    school_id = wh.read(spark, "school").filter(
        "natural_id = '55500010001001'").collect()[0]["id"]
    n = R.school_grade_counts(rep, school_id, 2018, "06").collect()[0]["n_exams"]
    assert n == 2


def test_aggregate_report_with_rollup_and_subgroup(spark, mart_env):
    wh, log, eng = mart_env
    olap = eng.read_mart(spark, "olap_exam")
    agg = R.aggregate_report(olap, group_cols=["school_id"], school_year=2018)
    rows = agg.collect()
    assert sum(r["n"] for r in rows) == 4
    assert all(r["pct"] == 50.0 for r in rows)  # 2 schools × 2 levels each

    rolled = R.aggregate_report(olap, group_cols=["school_id"],
                                include_state_rollup=True)
    state_rows = [r for r in rolled.collect() if r["school_id"] is None]
    assert sum(r["n"] for r in state_rows) == 4  # state-level rollup present

    sub = R.aggregate_report(olap, group_cols=["school_id"],
                             subgroup="economic_disadvantage")
    assert all(r["economic_disadvantage"] is True for r in sub.collect())


def test_embargo_and_permission_scope(spark, mart_env):
    wh, log, eng = mart_env
    olap = eng.read_mart(spark, "olap_exam")
    emb = spark.createDataFrame(
        [(2018, None, 2, 1)],
        "school_year int, subject_code string, individual int, aggregate int",
    )
    # aggregate report kind still embargoed (status 1=Reviewing) → rows hidden
    assert R.embargo_filter(olap, emb, None, kind="aggregate").count() == 0
    # individual released (status 2) → all visible
    assert R.embargo_filter(olap, emb, None, kind="individual").count() == 4

    school_id = wh.read(spark, "school").filter(
        "natural_id = '55500010001002'").collect()[0]["id"]
    allowed = spark.createDataFrame([Row(school_id=school_id)])
    assert R.permission_scope(olap, allowed).count() == 2


def test_target_and_claim_and_longitudinal(spark, mart_env):
    wh, log, eng = mart_env
    tgt = R.target_report(
        wh.read(spark, "exam_item"), wh.read(spark, "item"),
        wh.read(spark, "exam"), min_students=2,
    ).collect()
    by_target = {r["target_code"]: r for r in tgt}
    assert set(by_target) == {"T1", "T2"}
    assert by_target["T1"]["n_students"] == 4
    # tiny cohort → std-err above cutoff or computed; flag must be boolean
    assert all(r["insufficient_data"] is not None for r in tgt)

    # scale-tier option: HLL++ distinct (SURVEY §7 step 7) — exact at this
    # cardinality, so the whole report is identical
    tgt_approx = R.target_report(
        wh.read(spark, "exam_item"), wh.read(spark, "item"),
        wh.read(spark, "exam"), min_students=2, approx=True,
    ).collect()
    assert {r["target_code"]: r["n_students"] for r in tgt_approx} == {
        r["target_code"]: r["n_students"] for r in tgt}

    claims = R.claim_score_report(
        wh.read(spark, "exam_score"), wh.read(spark, "exam")).collect()
    assert {r["claim_code"] for r in claims} == {"C1", "C2"}
    assert all(r["n"] == 4 for r in claims)

    lon = R.longitudinal_trend(
        eng.read_mart(spark, "olap_exam_longitudinal"))
    assert lon.filter(F.col("yoy_delta").isNotNull()).count() == 0  # single year


def test_audit_monitoring_reconciliation(spark, mart_env):
    wh, log, eng = mart_env
    hist = R.exam_audit_history(
        wh.read(spark, "exam"), wh.read_audit(spark, "exam"))
    opp1 = hist.filter(F.col("opp_id") == "OPP-1").collect()
    assert len(opp1) == 2  # current + 1 audit row
    assert opp1[0]["source"] == "current" and opp1[0]["scale_score"] == 2520.0
    assert opp1[0]["prev_scale_score"] == 2300.0  # before-image diff (W2)

    monitoring = R.imports_by_status(log.read(spark))
    assert monitoring.count() == 0  # no failures in this env

    recon = R.reconciliation_report(log.read(spark), wh.read(spark, "exam")).collect()
    assert len(recon) == 1 and recon[0]["n_exams"] == 4
    assert recon[0]["n_imports"] == 5  # 4 + 1 resubmit accepted separately

    missing = R.missing_data_report(wh.read(spark, "exam")).collect()[0]
    assert missing["n_exams"] == 4
    assert missing["pct_session_id"] == 100.0
    assert missing["pct_military_connected"] == 0.0


def test_ops_queries_and_aggregate_cache(spark, mart_env, tmp_path):
    wh, log, eng = mart_env
    rows = R.exams_by_type_and_condition(wh.read(spark, "exam")).collect()
    assert rows and all(r["n"] > 0 for r in rows)
    assert {r["type_code"] for r in rows} == {"sum"}

    slow = R.slowest_migrates(eng.control(spark), k=3).collect()
    assert slow and all(r["runtime_sec"] >= 0 for r in slow)

    n = eng.refresh_aggregate_cache(spark)
    assert n > 0
    cached = eng.read_aggregate_cache(spark, school_years=[2018])
    assert cached.count() == n
    assert {r["performance_level"] for r in cached.collect()} <= {1, 2, 3, 4}
    # pruned read opens only the requested year's files
    assert all("part=2018" in f for f in cached.inputFiles())


def test_transfer_enabled_permission_scope(spark, mart_env):
    """transfer-access-enabled (docs/Runbook.SystemConfiguration.md:169-177,
    default off): with the flag, a user also sees results administered
    elsewhere for students whose current school is in their scope."""
    wh, log, eng = mart_env
    exam = wh.read(spark, "exam")
    student = wh.read(spark, "student")
    schools = {r["natural_id"]: r["id"]
               for r in wh.read(spark, "school").collect()}
    allowed = spark.createDataFrame(
        [Row(school_id=schools["55500010001001"])])

    base = R.permission_scope(exam, allowed)
    # students whose inferred school is allowed, including exams taken at
    # the other school
    wide = R.permission_scope(exam, allowed, transfer_enabled=True,
                              student=student)
    assert wide.count() >= base.count()
    extra = wide.join(base.select("id"), "id", "left_anti")
    if extra.count():
        # every extra row belongs to a student currently at an allowed school
        cur = {r["id"]: r["inferred_school_id"] for r in student.collect()}
        for r in extra.collect():
            assert cur[r["student_id"]] == schools["55500010001001"]


def test_instructional_resources_most_specific_wins(spark):
    res = spark.createDataFrame(
        [(1, 2, "System", None, "sys-link"),
         (1, 2, "State", None, "state-link"),
         (1, 2, "District", 77, "district-link"),
         (1, 2, "School", 901, "school-link"),
         (1, None, "System", None, "all-levels-link"),
         (2, 2, "System", None, "other-asmt")],
        "asmt_id long, performance_level int, org_level string, org_id long, "
        "resource string",
    )
    got = R.instructional_resources_for(res, asmt_id=1, performance_level=2,
                                        school_id=901, district_id=77).collect()
    assert {r["resource"] for r in got} == {"school-link"}
    # no school/district overrides in scope → state wins over system
    got = R.instructional_resources_for(res, asmt_id=1, performance_level=2,
                                        school_id=999, district_id=888).collect()
    assert {r["resource"] for r in got} == {"state-link"}
