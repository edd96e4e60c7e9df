"""spark.sql surface parity: the reference's documented SQL query shapes run
against the per-tenant views, and match the DataFrame-API results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdw_spark.sources.admin_flows import ingest_groups
from rdw_spark.sources.dim_ingest import ingest_organizations, ingest_package
from rdw_spark.sources.exam_ingest import ingest_exams
from rdw_spark.warehouse.tenancy import Tenant

from tests.test_sources import GROUPS_CSV, ORG_JSON, PACKAGE_CSV, make_trt


@pytest.fixture(scope="module")
def tenant(spark, tmp_path_factory):
    t = Tenant(str(tmp_path_factory.mktemp("sql_parity")), "ca")
    ingest_organizations(spark, t.warehouse, t.import_log, ORG_JSON.encode())
    ingest_package(spark, t.warehouse, t.import_log, PACKAGE_CSV.encode())
    ingest_exams(spark, t.warehouse, t.import_log, [
        make_trt(opp_id="Q-1", ssid="STU001", score=2300.0),
        make_trt(opp_id="Q-2", ssid="STU002", score=2450.0),
        make_trt(opp_id="Q-3", ssid="STU003", score=2650.0,
                 school="55500010001002"),
    ])
    ingest_groups(spark, t.warehouse, t.import_log, GROUPS_CSV.encode())
    t.migrate.run_until_caught_up(spark, "reporting")
    t.migrate.run_until_caught_up(spark, "olap")
    t.register_views(spark, tables=("import", "district", "school", "student",
                                    "asmt", "exam", "student_group"))
    for child in ("student_group_membership", "user_student_group"):
        t.warehouse.read(spark, child).createOrReplaceTempView(f"ca_{child}")
    return t


def test_school_year_grade_count(spark, tenant):
    """docs/Troubleshooting.md:434-450 — the worked per-school count."""
    school_id = spark.sql(
        "SELECT id FROM ca_school WHERE natural_id = '55500010001001'"
    ).collect()[0]["id"]
    n = spark.sql(f"""
        SELECT count(*) AS n FROM ca_exam
        WHERE school_id = {school_id} AND school_year = 2018
          AND grade_code = '06' AND NOT deleted
    """).collect()[0]["n"]
    assert n == 2


def test_canonical_display_join_set(spark, tenant):
    """docs/Runbook.Audit.md:302-308 — exam joined to its display dims."""
    rows = spark.sql("""
        SELECT e.opp_id,
               concat(st.last_or_surname, ', ', st.first_name) AS student_name,
               sc.name AS school_name, d.name AS district_name,
               a.natural_id AS asmt_natural_id, e.scale_score
        FROM ca_exam e
          JOIN ca_student st ON e.student_id = st.id
          JOIN ca_school sc ON e.school_id = sc.id
          JOIN ca_district d ON sc.district_id = d.id
          JOIN ca_asmt a ON e.asmt_id = a.id
        WHERE NOT e.deleted
        ORDER BY e.opp_id
    """).collect()
    assert len(rows) == 3
    assert rows[0]["student_name"] == "Kim, Jordan"
    assert rows[0]["district_name"] == "Northlake District"
    assert rows[2]["school_name"] == "Maple Middle"


def test_imports_by_status_shape(spark, tenant):
    """docs/Monitoring.md:41-51 — failure counts by status name (dim join
    synthesized from the engine's status codes)."""
    from rdw_spark.warehouse.import_log import ImportStatus

    status_dim = spark.createDataFrame(
        list(ImportStatus.NAMES.items()), "id int, name string")
    status_dim.createOrReplaceTempView("import_status")
    rows = spark.sql("""
        SELECT s.name AS status, i.cnt AS count
        FROM (SELECT status, count(*) AS cnt FROM ca_import
              WHERE content = 1 AND status < 0 GROUP BY status) i
          JOIN import_status s ON s.id = i.status
    """).collect()
    assert rows == []  # clean ingest: no failures

    total = spark.sql(
        "SELECT count(*) AS n FROM ca_import WHERE status = 1").collect()[0]["n"]
    assert total >= 4  # orgs, package, exams, groups all PROCESSED


def test_groups_export_sql(spark, tenant):
    """docs/StudentGroups.md:260-292 — the UNION export reconstructing the
    CSV, run as actual SQL."""
    rows = spark.sql("""
        SELECT * FROM (
          SELECT sg.name AS group_name, sch.natural_id AS school_natural_id,
                 sg.school_year, sg.subject_code, stu.ssid AS student_ssid,
                 NULL AS group_user_login
          FROM ca_student_group sg
            JOIN ca_school sch ON sg.school_id = sch.id
            JOIN ca_student_group_membership sgm ON sg.id = sgm.student_group_id
            JOIN ca_student stu ON sgm.student_id = stu.id
          UNION
          SELECT sg.name, sch.natural_id, sg.school_year, sg.subject_code,
                 NULL, usg.user_login
          FROM ca_student_group sg
            JOIN ca_school sch ON sg.school_id = sch.id
            JOIN ca_user_student_group usg ON sg.id = usg.student_group_id
        ) data
        ORDER BY group_name, subject_code, student_ssid
    """).collect()
    # GROUPS_CSV defines 2 groups; members resolve only for ingested students
    assert len(rows) >= 3
    assert rows[0]["group_name"] == "Grade6Math"
    member_rows = [r for r in rows if r["student_ssid"] is not None]
    assert {r["student_ssid"] for r in member_rows} <= {"STU001", "STU002"}


def test_aggregate_report_sql(spark, tenant):
    """config/rdw-reporting-aggregate-service.yml shape: per-performance-level
    counts/percents by school over the OLAP fact, as SQL."""
    rows = spark.sql("""
        SELECT school_id, performance_level, count(*) AS n,
               round(100.0 * count(*) / sum(count(*)) OVER (PARTITION BY school_id), 2) AS pct
        FROM ca_olap_exam
        WHERE school_year = 2018 AND type_code = 'sum' AND NOT deleted
        GROUP BY school_id, performance_level
        ORDER BY school_id, performance_level
    """).collect()
    assert sum(r["n"] for r in rows) == 3
    assert any(r["pct"] == 50.0 for r in rows)
