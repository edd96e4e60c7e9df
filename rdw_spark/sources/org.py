"""Organization sources: ART-style JSON (S5) and CALPADS ^-delimited CSV (S6).

Reference format (docs/API.md:452-582): JSON payload with entity objects
carrying ``entityType`` / ``entityId`` / ``entityName`` / ``parentEntityId``;
"the exact structure doesn't matter a lot: the system will parse the payload
looking for the required fields". Hierarchy: STATE → GROUPOFDISTRICTS →
DISTRICT → GROUPOFINSTITUTIONS → INSTITUTION. CALPADS CSV is ^-delimited
with County-District Code / School Code / Auth CDS Code / names
(docs/API.md:570-582).

Spark shape: ``spark.read.json`` / ``spark.read.csv(sep='^')`` on the payload,
flatten all entity arrays, resolve school→district by parent id. Fully
declarative — no UDFs; the entity lists are dims (thousands of rows at most,
reference production is 13,529 schools, docs/Troubleshooting.md:633-645), so
every downstream join against them broadcasts.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_ENTITY = T.StructType([
    T.StructField("entityId", T.StringType()),
    T.StructField("entityType", T.StringType()),
    T.StructField("entityName", T.StringType()),
    T.StructField("parentEntityId", T.StringType()),
    T.StructField("parentEntityType", T.StringType()),
])


def parse_org_json(spark: SparkSession, payload: str | bytes) -> dict[str, DataFrame]:
    """→ {"district": df(natural_id,name), "school": df(natural_id,name,
    district_natural_id)}; structure-agnostic: any top-level array of objects
    with the four required fields is consumed."""
    doc = json.loads(payload)
    entities: list[dict] = []
    stack = [doc]
    while stack:  # driver-side walk of the (small) JSON skeleton only
        node = stack.pop()
        if isinstance(node, dict):
            if "entityId" in node and "entityType" in node:
                entities.append({
                    "entityId": str(node.get("entityId")),
                    "entityType": str(node.get("entityType", "")).upper(),
                    "entityName": node.get("entityName"),
                    "parentEntityId": (
                        None if node.get("parentEntityId") is None
                        else str(node.get("parentEntityId"))
                    ),
                    "parentEntityType": node.get("parentEntityType"),
                })
            else:
                stack.extend(node.values())
        elif isinstance(node, list):
            stack.extend(node)
    ent = spark.createDataFrame(entities, _ENTITY) if entities else (
        spark.createDataFrame([], _ENTITY)
    )

    # group entities (docs/Runbook.ImportMigrate.md:17): the ART hierarchy
    # is STATE → GROUPOFDISTRICTS → DISTRICT → GROUPOFINSTITUTIONS →
    # INSTITUTION, and a school "in a group under a district" arrives with
    # all three present (docs/API.md:459) — so a school's parent may be the
    # group, and its district resolves through the group's parent
    _GOD = ("GROUPOFDISTRICTS", "GROUP_OF_DISTRICTS", "DISTRICT_GROUP")
    _GOI = ("GROUPOFINSTITUTIONS", "GROUP_OF_INSTITUTIONS",
            "INSTITUTION_GROUP", "SCHOOL_GROUP")
    district_group = (
        ent.filter(F.col("entityType").isin(*_GOD))
        .select(F.col("entityId").alias("natural_id"), F.col("entityName").alias("name"))
    )
    gods = ent.filter(F.col("entityType").isin(*_GOD)).select(
        F.col("entityId").alias("_god_id"))
    district = (
        ent.filter(F.col("entityType") == "DISTRICT")
        .join(F.broadcast(gods),
              F.col("parentEntityId") == F.col("_god_id"), "left")
        .select(F.col("entityId").alias("natural_id"),
                F.col("entityName").alias("name"),
                F.col("_god_id").alias("district_group_natural_id"))
    )
    gois = ent.filter(F.col("entityType").isin(*_GOI)).select(
        F.col("entityId").alias("_goi_id"),
        F.col("entityName").alias("_goi_name"),
        F.col("parentEntityId").alias("_goi_parent"),
    )
    school_group = gois.select(
        F.col("_goi_id").alias("natural_id"),
        F.col("_goi_name").alias("name"),
        F.col("_goi_parent").alias("district_natural_id"),
    )
    school = (
        ent.filter(F.col("entityType") == "INSTITUTION")
        .join(F.broadcast(gois),
              F.col("parentEntityId") == F.col("_goi_id"), "left")
        .select(
            F.col("entityId").alias("natural_id"),
            F.col("entityName").alias("name"),
            # parent is either the district itself or a school group whose
            # own parent is the district
            F.coalesce(F.col("_goi_parent"), F.col("parentEntityId"))
            .alias("district_natural_id"),
            F.col("_goi_id").alias("school_group_natural_id"),
        )
    )
    return {"district": district, "school": school,
            "district_group": district_group, "school_group": school_group}


CALPADS_COLUMNS = [
    "county_district_code", "school_code", "auth_cds_code", "county_name",
    "district_name", "school_name", "charter_school", "charter_status",
    "nps_school",
]


def parse_org_calpads(spark: SparkSession, payload: str | bytes) -> dict[str, DataFrame]:
    """CALPADS ^-delimited CSV (docs/API.md:570-582) → same output shape as
    :func:`parse_org_json`. District natural id = 14-char CDS-style id padded
    from the county-district code (matches the reference's CDS id scheme,
    docs/Troubleshooting.md:369-381)."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    lines = [ln for ln in payload.splitlines() if ln.strip()]
    rows = spark.createDataFrame(
        [ln.split("^") for ln in lines[1:]],  # header row skipped
        T.StructType([T.StructField(c, T.StringType()) for c in CALPADS_COLUMNS]),
    )
    school = rows.select(
        F.col("auth_cds_code").alias("natural_id"),
        F.col("school_name").alias("name"),
        F.rpad(F.col("county_district_code"), 14, "0").alias("district_natural_id"),
    )
    district = rows.select(
        F.rpad(F.col("county_district_code"), 14, "0").alias("natural_id"),
        F.col("district_name").alias("name"),
    ).distinct()
    return {"district": district, "school": school}


def resolve_school_district_ids(school: DataFrame, district_tbl: DataFrame) -> DataFrame:
    """Attach warehouse district ids to parsed schools (broadcast: dims are
    tiny next to facts)."""
    dist = district_tbl.select(
        F.col("natural_id").alias("district_natural_id"),
        F.col("id").alias("district_id"),
    )
    return school.join(F.broadcast(dist), "district_natural_id", "left").drop(
        "district_natural_id"
    )
