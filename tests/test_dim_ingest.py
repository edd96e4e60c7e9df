"""Dim-content ingest jobs: full accept→parse→MERGE→status lifecycle for
every reference import endpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdw_spark.sources import dim_ingest as DI
from rdw_spark.warehouse import ImportLog, ImportStatus, TableStore

from tests.test_sources import (
    ACCOMMODATIONS_XML, CALPADS, NORMS_CSV, ORG_JSON, PACKAGE_CSV, SUBJECT_XML,
)
from tests.test_tenancy_codes import EMBARGO_JSON


@pytest.fixture()
def env(spark, tmp_path):
    wh = TableStore(str(tmp_path / "warehouse"))
    return wh, ImportLog(wh, archive_root=str(tmp_path / "archive"))


def test_all_dim_endpoints(spark, env):
    wh, log = env
    r = DI.ingest_organizations(spark, wh, log, ORG_JSON.encode())
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "school").count() == 2
    # duplicate payload no-ops
    assert DI.ingest_organizations(spark, wh, log, ORG_JSON.encode())["status"] == "DUPLICATE"
    # CALPADS form adds nothing new (same schools by natural id)
    r = DI.ingest_organizations(spark, wh, log, CALPADS.encode(), fmt="csv")
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "school").count() == 2

    r = DI.ingest_package(spark, wh, log, PACKAGE_CSV.encode())
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "asmt").count() == 1
    assert wh.read(spark, "item").count() == 2
    # asmt_score child landed with the resolved surrogate asmt id
    asmt_id = wh.read(spark, "asmt").collect()[0]["id"]
    scores = wh.read(spark, "asmt_score").collect()
    assert {(r["asmt_id"], r["cut_point"], r["score"]) for r in scores} == {
        (asmt_id, 1, 2380.0), (asmt_id, 2, 2490.0), (asmt_id, 3, 2600.0),
    }

    r = DI.ingest_subject(spark, wh, log, SUBJECT_XML.encode())
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "subject_performance_level").count() == 6

    r = DI.ingest_accommodations(spark, wh, log, ACCOMMODATIONS_XML.encode())
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "accommodation").count() == 3
    assert wh.read(spark, "accommodation_translation").count() == 2

    r = DI.ingest_embargo(spark, wh, log, EMBARGO_JSON.encode())
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "state_embargo").count() == 1

    # every import landed with PROCESSED status + archive copy
    imports = log.read(spark)
    assert imports.filter(F.col("status") == ImportStatus.PROCESSED).count() == 6


def test_norms_all_or_nothing_and_cross_file_overlap(spark, env):
    wh, log = env
    r = DI.ingest_norms(spark, wh, log, NORMS_CSV.encode(),
                        default_min_score=2000, default_max_score=3000)
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "percentile").count() == 2
    assert wh.read(spark, "percentile_score").count() == 6

    # second file with a window overlapping a LOADED table → nothing loads
    clash = NORMS_CSV.replace("2017-08-01", "2018-03-01").replace(
        "2018-01-31", "2018-09-30").replace("2018-02-01", "2019-02-01").replace(
        "2018-07-31", "2019-07-31")
    r = DI.ingest_norms(spark, wh, log, clash.encode())
    assert r["status"] == "BAD_DATA"
    assert any("overlaps existing" in e for e in r["errors"])
    assert wh.read(spark, "percentile").count() == 2  # unchanged

    # reloading the SAME identifier replaces the table (Update rule)
    updated = NORMS_CSV.replace(",25,2365", ",25,2360")
    r = DI.ingest_norms(spark, wh, log, updated.encode())
    assert r["status"] == "PROCESSED"
    assert wh.read(spark, "percentile").count() == 2
    low = wh.read(spark, "percentile_score").filter("percentile_rank = 25")
    assert {x["score"] for x in low.collect()} == {2360.0, 2370.0}

    r = DI.ingest_organizations(spark, wh, log, b"{not json")
    assert r["status"] == "BAD_FORMAT"
