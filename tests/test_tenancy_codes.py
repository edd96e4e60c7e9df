"""Multi-tenancy path namespaces (§1.5), CODES seeds, EMBARGO ingest, and
the spark.sql view surface per tenant."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from rdw_spark.sources.codes_embargo import parse_embargo_json, school_years, seed_codes
from rdw_spark.warehouse.tenancy import Tenant, list_tenants
from rdw_spark.warehouse.import_log import ImportContent
from rdw_spark.warehouse import ImportStatus


EMBARGO_JSON = """
{"state": [{"school_year": 2018, "individual": 2, "aggregate": 1}],
 "district": [{"district_id": 42, "school_year": 2018, "subject_code": "Math",
               "individual": 0, "aggregate": 0}]}
"""


def test_tenant_isolation_and_views(spark, tmp_path):
    base = str(tmp_path / "tenants")
    t1 = Tenant(base, "blue")
    t2 = Tenant(base, "green")

    t1.warehouse.merge_upsert(
        spark, "district",
        spark.createDataFrame([Row(natural_id="D1", name="Blue District")]), 1)
    t2.warehouse.merge_upsert(
        spark, "district",
        spark.createDataFrame([Row(natural_id="D1", name="Green District")]), 1)

    # same natural id, fully isolated state per tenant
    assert t1.warehouse.read(spark, "district").collect()[0]["name"] == "Blue District"
    assert t2.warehouse.read(spark, "district").collect()[0]["name"] == "Green District"
    assert list_tenants(base) == ["blue", "green"]

    # digest dedup is per-tenant: same payload accepted independently
    r1 = t1.import_log.accept(spark, ImportContent.EXAM, b"<x/>")
    r2 = t2.import_log.accept(spark, ImportContent.EXAM, b"<x/>")
    assert not r1.existing and not r2.existing

    t1.register_views(spark)
    t2.register_views(spark)
    assert spark.sql(
        "SELECT name FROM blue_district"
    ).collect()[0]["name"] == "Blue District"
    assert spark.sql("SELECT COUNT(*) AS n FROM green_import").collect()[0]["n"] == 1

    with pytest.raises(ValueError, match="invalid tenant id"):
        Tenant(base, "Bad Tenant!")


def test_codes_and_school_years(spark):
    codes = seed_codes(spark)
    assert codes["grade"].count() == 15
    assert codes["completeness"].count() == 2
    # validation-set usage: reject unknown administration condition
    exams = spark.createDataFrame(
        [("Valid",), ("BOGUS",)], "administration_condition string")
    known = codes["administration_condition"]
    bad = exams.join(F.broadcast(known), "administration_condition", "left_anti")
    assert [r[0] for r in bad.collect()] == ["BOGUS"]

    years = school_years(spark, [2017, 2018, 2019])
    assert years.count() == 3


def test_embargo_ingest_feeds_filter(spark, tmp_path):
    t = Tenant(str(tmp_path / "tenants"), "blue")
    rec = t.import_log.accept(spark, ImportContent.EMBARGO, EMBARGO_JSON.encode(),
                              content_type="application/json")
    emb = parse_embargo_json(spark, EMBARGO_JSON)
    t.warehouse.merge_upsert(spark, "state_embargo", emb["state_embargo"], rec.id)
    t.warehouse.merge_upsert(spark, "district_embargo", emb["district_embargo"], rec.id)
    t.import_log.set_status(spark, rec.id, ImportStatus.PROCESSED)

    state = t.warehouse.read(spark, "state_embargo").collect()[0]
    assert state["individual"] == 2 and state["aggregate"] == 1
    district = t.warehouse.read(spark, "district_embargo").collect()[0]
    assert district["district_id"] == 42 and district["subject_code"] == "Math"

    # feeds the P9 view builder: aggregate reports for 2018 stay hidden
    from rdw_spark.plans.rdw_reports import embargo_filter

    fact = spark.createDataFrame(
        [(2018, "sum", False), (2018, "iab", False), (2017, "sum", False)],
        "school_year int, type_code string, deleted boolean",
    )
    visible = embargo_filter(
        fact, t.warehouse.read(spark, "state_embargo"), None, kind="aggregate")
    assert {(r["school_year"], r["type_code"]) for r in visible.collect()} == {
        (2018, "iab"), (2017, "sum")  # embargoed 2018 summative hidden
    }


class TestCoreDims:
    def test_seed_core_dims(self, spark):
        """Pre-loaded immutable core tables
        (docs/Runbook.ImportMigrate.md:11)."""
        from rdw_spark.sources.codes_embargo import seed_core_dims

        dims = seed_core_dims(spark)
        types = {r["code"]: r["name"] for r in dims["asmt_type"].collect()}
        assert types == {"ica": "Interim Comprehensive Assessment",
                         "iab": "Interim Assessment Block",
                         "sum": "Summative"}
        statuses = {r["id"]: r["name"] for r in dims["import_status"].collect()}
        assert statuses[1] == "PROCESSED" and statuses[-6] == "UNKNOWN_SCHOOL"
        contents = {r["name"]: r["id"] for r in dims["import_content"].collect()}
        assert contents["EXAM"] == 1 and contents["PACKAGE"] == 3
        langs = dict(dims["language"].collect())
        assert langs["eng"] == "English" and langs["spa"] == "Spanish"


class TestCodesTables:
    def test_load_update_and_validate(self, spark, tmp_path):
        """CODES as warehouse tables with the documented manual-update flow
        (edit table + trigger CODES migration import,
        docs/Runbook.SystemConfiguration.md:200-263) and a set-based
        unknown-code reconciliation report."""
        from rdw_spark.sources.codes_embargo import (
            load_default_codes, unknown_code_report, update_codes,
        )
        from rdw_spark.warehouse import ImportLog, TableStore

        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh, archive_root=None)
        res = load_default_codes(spark, wh, log)
        assert res["status"] == "PROCESSED"
        assert wh.read(spark, "grade").count() == 15
        assert wh.read(spark, "language").filter("code = 'spa'").count() == 1

        # the documented language example: add Norse, drop a code
        res = update_codes(spark, wh, log, "language",
                           add=[("non", "Norse")], remove=["som"])
        langs = {r["code"] for r in wh.read(spark, "language").collect()}
        assert "non" in langs and "som" not in langs
        # the trigger import row exists and is PROCESSED
        imp = log.read(spark).filter(f"id = {res['import_id']}").collect()[0]
        assert imp["status"] == 1 and imp["contentType"] == "update language"

        # unknown-code report: clean warehouse → empty
        assert unknown_code_report(spark, wh).count() == 0
        with pytest.raises(ValueError, match="not a CODES table"):
            update_codes(spark, wh, log, "exam", add=[("x", "x")])

    def test_unknown_code_report_flags_bad_values(self, spark, tmp_path):
        from datetime import datetime

        from rdw_spark.sources.codes_embargo import (
            load_default_codes, unknown_code_report,
        )
        from rdw_spark.warehouse import ImportLog, TableStore

        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh, archive_root=None)
        load_default_codes(spark, wh, log)
        wh.merge_upsert(spark, "exam", spark.createDataFrame(
            [("o1", 1, 2018, 1, 1, "06", "sum", datetime(2018, 4, 1), "zz", "Valid", "Complete"),
             ("o2", 1, 2018, 1, 1, "99", "sum", datetime(2018, 4, 1), "eng", "Valid", "Complete")],
            "opp_id string, asmt_id long, school_year int, student_id long, "
            "school_id long, grade_code string, type_code string, "
            "completed_at timestamp, language_code string, "
            "administration_condition string, completeness string",
        ), 1)
        bad = {(r["code_table"], r["code"]): r["n"]
               for r in unknown_code_report(spark, wh).collect()}
        assert bad == {("language", "zz"): 1, ("grade", "99"): 1}


class TestSchoolYearRegistration:
    def test_register_and_restrict(self, spark, tmp_path):
        from rdw_spark.sources.codes_embargo import (
            register_school_year, restrict_to_known_years,
        )
        from rdw_spark.warehouse import ImportLog, TableStore

        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh, archive_root=None)
        register_school_year(spark, wh, log, 2018)
        res = register_school_year(spark, wh, log, 2019)
        assert res["years"] == [2018, 2019]
        imp = log.read(spark).filter(f"id = {res['import_id']}").collect()[0]
        assert imp["contentType"] == "add school year 2019"

        facts = spark.createDataFrame(
            [(1, 2017), (2, 2018), (3, 2019)], "id long, school_year int")
        kept = restrict_to_known_years(facts, wh.read(spark, "school_year"))
        assert {r["school_year"] for r in kept.collect()} == {2018, 2019}


@pytest.mark.exhaustive
def test_sandbox_dataset_publish_and_create(spark, tmp_path):
    """Runbook.MultiTenancy.md sandbox flow: prepare a warehouse, publish
    it as a named dataset (manifest + label), create a sandbox tenant from
    it — warehouse seeded, marts migrated on creation, fully isolated."""
    from rdw_spark.sources.exam_ingest import ingest_exams
    from rdw_spark.sources.org import parse_org_json, resolve_school_district_ids
    from rdw_spark.sources.package import parse_package, read_package_csv
    from rdw_spark.warehouse.tenancy import create_sandbox, list_datasets, publish_dataset

    from tests.test_sources import ORG_JSON, PACKAGE_CSV, make_trt

    base = str(tmp_path / "tenants")
    template = Tenant(base, "ts")
    wh, log = template.warehouse, template.import_log
    rec = log.accept(spark, ImportContent.PACKAGE, PACKAGE_CSV.encode())
    wh.merge_upsert(spark, "asmt",
                    parse_package(read_package_csv(spark, PACKAGE_CSV))["asmt"], rec.id)
    org_rec = log.accept(spark, ImportContent.ORGANIZATION, ORG_JSON.encode())
    org = parse_org_json(spark, ORG_JSON)
    wh.merge_upsert(spark, "district", org["district"], org_rec.id)
    wh.merge_upsert(
        spark, "school",
        resolve_school_district_ids(org["school"], wh.read(spark, "district")),
        org_rec.id)
    ingest_exams(spark, wh, log, [
        make_trt(opp_id="SB-1", ssid="STU001"),
        make_trt(opp_id="SB-2", ssid="STU002"),
    ])
    # dataset is built from an UNMIGRATED warehouse (the runbook's rule)

    datasets = str(tmp_path / "sandbox-datasets")
    counts = publish_dataset(spark, wh, datasets, "sb-dataset",
                             label="SB Dataset (Math)")
    assert counts["exam"] == 2 and counts["import"] >= 3
    listed = list_datasets(datasets)
    assert [d["label"] for d in listed] == ["SB Dataset (Math)"]

    sb = create_sandbox(spark, base, "ts_s001", datasets, "sb-dataset")
    assert sb.warehouse.read(spark, "exam").count() == 2
    # migration ran on creation: reporting + OLAP marts are populated
    assert sb.migrate.read_mart(spark, "reporting_exam").count() == 2
    assert sb.migrate.read_mart(spark, "olap_exam").count() == 2

    # isolation: sandbox writes don't touch the template warehouse
    sb.warehouse.soft_delete(
        spark, "exam",
        sb.warehouse.read(spark, "exam").select("opp_id", "asmt_id"), 999)
    assert template.warehouse.read(spark, "exam").filter("deleted").count() == 0

    # unknown dataset id is an explicit error listing what exists
    with pytest.raises(ValueError, match="sb-dataset"):
        create_sandbox(spark, base, "ts_s002", datasets, "nope")


def test_diagnostic_status_levels(spark, tmp_path):
    """docs/API.md:1006-1028 — leveled health summary; migrate failure
    degrades the rating, levels add backlog and table counts."""
    from rdw_spark.warehouse.tenancy import diagnostic_status

    t = Tenant(str(tmp_path / "tenants"), "blue")
    s0 = diagnostic_status(spark, t)
    assert s0["statusText"] == "Ideal" and s0["statusRating"] == 4
    assert "imports_by_status" not in s0

    t.import_log.accept(spark, ImportContent.EXAM, b"<x/>")
    s1 = diagnostic_status(spark, t, level=1)
    assert sum(s1["imports_by_status"].values()) == 1
    assert set(s1["migrate"]) == {"reporting", "olap"}

    s2 = diagnostic_status(spark, t, level=2)
    assert s2["warehouse_rows"]["import"] == 1
