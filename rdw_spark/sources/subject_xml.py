"""Subject-definition XML source (S8): the data-driven scoring model.

Reference format (deploy/mini_subject_config.xml:1-241;
docs/Runbook.SystemConfiguration.md:48-101): a ``<Subject>`` document defines,
per assessment type, the overall min/max score, the performance levels with
names/colors and the ``standardCutoff`` (the "met standard" level), claim
scoring levels, depths of knowledge, and per-grade item-difficulty cuts.
This is what makes scoring *configuration*, not hardcoded rules — our
performance-level assignment reads these dims (SURVEY.md §7 hard part #4).

Parsed driver-side with ElementTree (subject configs are KB-scale dims) into
DataFrames that broadcast into every scoring join.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from rdw_spark.warehouse import schemas as S


def parse_subject_xml(spark: SparkSession, payload: str | bytes) -> dict[str, DataFrame]:
    root = ET.fromstring(payload)
    code = root.get("code")
    name = root.get("name", code)

    subject_rows = [{"code": code, "name": name}]
    sat_rows, perf_rows, dok_rows, idc_rows = [], [], [], []

    for at in root.findall("./AssessmentTypes/AssessmentType"):
        at_code = at.get("code")
        overall = at.find("OverallScoring")
        levels = overall.findall("PerformanceLevels/PerformanceLevel") if overall is not None else []
        pl_parent = overall.find("PerformanceLevels") if overall is not None else None
        sat_rows.append({
            "subject_code": code,
            "asmt_type_code": at_code,
            "min_score": float(overall.get("minScore")) if overall is not None and overall.get("minScore") else None,
            "max_score": float(overall.get("maxScore")) if overall is not None and overall.get("maxScore") else None,
            "standard_cutoff": (
                int(pl_parent.get("standardCutoff"))
                if pl_parent is not None and pl_parent.get("standardCutoff") else None
            ),
            "performance_level_count": len(levels),
            "target_report": at.get("targetReport") == "true",
        })
        for lvl in levels:
            perf_rows.append({
                "subject_code": code, "asmt_type_code": at_code, "scoring": "overall",
                "level": int(lvl.get("level")), "name": lvl.get("name"),
                "color": lvl.get("color"),
            })
        claim = at.find("ClaimScoring")
        if claim is not None:
            for lvl in claim.findall("PerformanceLevels/PerformanceLevel"):
                perf_rows.append({
                    "subject_code": code, "asmt_type_code": at_code, "scoring": "claim",
                    "level": int(lvl.get("level")), "name": lvl.get("name"),
                    "color": lvl.get("color"),
                })

    # SUBJECT child dims (docs/Runbook.ImportMigrate.md:20):
    # <Claims>/<Claim>/<Targets>/<Target> (deploy/ELA_subject.xml:881+),
    # <Standards>/<Standard> (:2247+), <Traits>/<Trait> (:863-880),
    # <Messages>/<Message> → subject_translation display strings (:3+)
    claim_rows, target_rows, std_rows, trait_rows, msg_rows = [], [], [], [], []
    for cl in root.findall("./Claims/Claim"):
        cl_code = cl.get("code")
        desc = cl.find("Description")
        claim_rows.append({
            "subject_code": code, "code": cl_code, "name": cl.get("name"),
            "description": desc.text if desc is not None else None,
            "scorable": cl.get("scorable") != "false",
            "organizational": cl.get("organizational") == "true",
            "display_order": int(cl.get("displayOrder")) if cl.get("displayOrder") else None,
        })
        for tg in cl.findall("./Targets/Target"):
            tdesc = tg.find("Description")
            target_rows.append({
                "subject_code": code, "claim_code": cl_code,
                "natural_id": tg.get("code"), "name": tg.get("name"),
                "description": tdesc.text if tdesc is not None else None,
            })
    for std in root.findall("./Standards/Standard"):
        sdesc = std.find("Description")
        std_rows.append({
            "subject_code": code, "natural_id": std.get("code"),
            "description": sdesc.text if sdesc is not None else None,
        })
    for tr in root.findall("./Traits/Trait"):
        trait_rows.append({
            "subject_code": code, "code": tr.get("code"),
            "purpose": tr.get("purpose"), "category": tr.get("category"),
            "max_score": int(tr.get("maxScore")) if tr.get("maxScore") else None,
        })
    for msg in root.findall("./Messages/Message"):
        msg_rows.append({
            "subject_code": code, "label_code": msg.get("key"),
            "language_code": msg.get("language", "en"),
            "value": (msg.text or "").strip() or None,
        })

    for dok in root.findall("./DepthsOfKnowledge/DepthOfKnowledge"):
        ref = dok.find("Reference")
        dok_rows.append({
            "subject_code": code, "level": int(dok.get("level")),
            "name": dok.get("name"),
            "reference": ref.text if ref is not None else None,
        })
    for idc in root.findall("./ItemDifficulties/ItemDifficulty"):
        idc_rows.append({
            "subject_code": code, "grade_code": idc.get("gradeCode"),
            "moderate_low_end": float(idc.get("moderateLowEnd")),
            "difficult_low_end": float(idc.get("difficultLowEnd")),
        })

    def df(rows: list[dict], schema) -> DataFrame:
        # subject dims have no lineage of their own here; the caller MERGEs
        # them with the import id
        cols = [f.name for f in schema.fields if f.name in (rows[0] if rows else {})]
        if not rows:
            import pyspark.sql.types as T

            return spark.createDataFrame([], T.StructType(
                [f for f in schema.fields if f.name in cols]
            ))
        return spark.createDataFrame(rows)

    def typed(rows: list[dict], schema, surrogate: list[str] | None = None) -> DataFrame:
        """Declared-schema frame (inference would break on all-None columns);
        ``surrogate`` names the key columns hashed into the ``id`` field."""
        import pyspark.sql.functions as F
        import pyspark.sql.types as T

        body = T.StructType([f for f in schema.fields if f.name != "id"])
        out = spark.createDataFrame(rows, body)
        if surrogate:
            out = out.withColumn("id", F.xxhash64(*surrogate))
        return out.select(*[f.name for f in schema.fields])

    return {
        "subject": spark.createDataFrame(subject_rows),
        "subject_asmt_type": df(sat_rows, S.SUBJECT_ASMT_TYPE),
        "subject_performance_level": df(perf_rows, S.SUBJECT_PERFORMANCE_LEVEL),
        "depth_of_knowledge": df(dok_rows, S.DEPTH_OF_KNOWLEDGE),
        "item_difficulty_cuts": df(idc_rows, S.ITEM_DIFFICULTY_CUTS),
        "claim": typed(claim_rows, S.CLAIM, ["subject_code", "code"]),
        "target": typed(target_rows, S.TARGET,
                        ["subject_code", "claim_code", "natural_id"]),
        "common_core_standard": typed(std_rows, S.COMMON_CORE_STANDARD,
                                      ["subject_code", "natural_id"]),
        "subject_score": typed(trait_rows, S.SUBJECT_SCORE),
        "subject_translation": typed(msg_rows, S.SUBJECT_TRANSLATION),
    }
