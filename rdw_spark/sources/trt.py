"""TRT (Test Results Transmission) XML exam source — S1, the heart of ingest.

Reference semantics (docs/API.md:363-420; mandatory/optional field lists in
docs/Runbook.DataSpecifications.md:9-53): one TRT document = one exam:
``<TDSReport>`` with ``<Test>`` attributes (name/subject/grade/assessmentType/
academicYear), an ``<Examinee>`` carrying ``ExamineeAttribute`` /
``ExamineeRelationship`` name-value pairs (StudentIdentifier, names,
Birthdate, demographics, SchoolId), and an ``<Opportunity>`` (oppId,
dateCompleted, sessionId, completeness, administrationCondition) with
``<Score>`` children (overall + per-claim scale scores) and ``<Item>``
children with responses, plus ``<Accommodation>`` codes.

Spark shape: the payload column is parsed ONCE per document inside
``mapInPandas`` (Arrow-batched; stdlib ElementTree — parse is genuinely
imperative, the one place SURVEY.md §2 licenses a Python-side operator) into
a single wide row per exam with ``array<struct>`` children. Downstream
normalization to ``exam_item``/``exam_score``/``exam_available_accommodation``
is a declarative ``explode`` — so the expensive XML walk happens exactly once
and everything after stays JVM-side. At 100 TB the input is a distributed
read of archived payloads (binaryFile/text), partition = batch of documents;
there is no shuffle in the parse stage at all.

Validation is config-driven (F5, config/rdw-ingest-exam-processor.yml:5-16):
missing mandatory fields produce row-level errors, never exceptions; dim
checks (school exists → UNKNOWN_SCHOOL) happen set-based in the ingest job.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

TRAIT_SCORE_STRUCT = T.StructType([  # WER writing-trait sub-scores
    T.StructField("category", T.StringType()),   # ScoreInfo@scoreDimension
    T.StructField("score", T.DoubleType()),
    T.StructField("max_score", T.DoubleType()),
    T.StructField("condition_code", T.StringType()),
])
ITEM_STRUCT = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("bank_key", T.StringType()),
    T.StructField("position", T.IntegerType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("score_status", T.StringType()),
    T.StructField("response", T.StringType()),
    T.StructField("trait_scores", T.ArrayType(TRAIT_SCORE_STRUCT)),
])
CLAIM_SCORE_STRUCT = T.StructType([
    T.StructField("claim_code", T.StringType()),
    T.StructField("scale_score", T.DoubleType()),
    T.StructField("scale_score_std_err", T.DoubleType()),
    T.StructField("performance_level", T.IntegerType()),
])

TRT_SCHEMA = T.StructType([
    T.StructField("import_id", T.LongType()),
    # Test
    T.StructField("asmt_natural_id", T.StringType()),
    T.StructField("subject_code", T.StringType()),
    T.StructField("asmt_grade", T.StringType()),
    T.StructField("type_code", T.StringType()),
    T.StructField("school_year", T.IntegerType()),
    T.StructField("asmt_version", T.StringType()),
    # Examinee
    T.StructField("ssid", T.StringType()),
    T.StructField("first_name", T.StringType()),
    T.StructField("middle_name", T.StringType()),
    T.StructField("last_or_surname", T.StringType()),
    T.StructField("birthday", T.DateType()),
    T.StructField("gender", T.StringType()),
    T.StructField("school_natural_id", T.StringType()),
    T.StructField("grade_code", T.StringType()),          # GradeLevelWhenAssessed
    T.StructField("iep", T.BooleanType()),
    T.StructField("lep", T.BooleanType()),
    T.StructField("section504", T.BooleanType()),
    T.StructField("economic_disadvantage", T.BooleanType()),
    T.StructField("migrant_status", T.BooleanType()),
    T.StructField("language_code", T.StringType()),
    T.StructField("military_connected", T.StringType()),
    T.StructField("ethnicities", T.ArrayType(T.StringType())),
    # Opportunity
    T.StructField("opp_id", T.StringType()),
    T.StructField("opportunity", T.IntegerType()),
    T.StructField("session_id", T.StringType()),
    T.StructField("completeness", T.StringType()),
    T.StructField("administration_condition", T.StringType()),
    T.StructField("completed_at", T.TimestampType()),
    T.StructField("reset", T.BooleanType()),
    # scores
    T.StructField("scale_score", T.DoubleType()),
    T.StructField("scale_score_std_err", T.DoubleType()),
    T.StructField("performance_level", T.IntegerType()),
    T.StructField("claim_scores", T.ArrayType(CLAIM_SCORE_STRUCT)),
    # children
    T.StructField("items", T.ArrayType(ITEM_STRUCT)),
    T.StructField("accommodations", T.ArrayType(T.StringType())),
    # validation
    T.StructField("errors", T.ArrayType(T.StringType())),
])

# mandatory TRT elements (docs/Runbook.DataSpecifications.md:11-22) plus the
# default-required optional ones (:26-53); overridable per deployment (F5)
DEFAULT_REQUIRED = [
    "asmt_natural_id", "subject_code", "asmt_grade", "type_code", "school_year",
    "ssid", "school_natural_id", "grade_code", "opp_id", "completed_at",
    # default-Required optional fields
    "first_name", "last_or_surname", "birthday", "gender",
    "economic_disadvantage", "session_id", "completeness",
    "administration_condition",
]

_BOOL = {"yes": True, "y": True, "true": True, "1": True,
         "no": False, "n": False, "false": False, "0": False}


def _parse_bool(v: str | None) -> bool | None:
    return None if v is None else _BOOL.get(v.strip().lower())


def _parse_one(import_id: int, payload: str, required: list[str]) -> dict:
    row: dict = {f.name: None for f in TRT_SCHEMA.fields}
    row["import_id"] = import_id
    errors: list[str] = []
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as exc:
        row["errors"] = [f"malformed XML: {exc}"]
        return row

    test = root.find("Test")
    if test is not None:
        row["asmt_natural_id"] = test.get("name")
        row["subject_code"] = test.get("subject")
        row["asmt_grade"] = test.get("grade")
        tc = test.get("assessmentType")
        row["type_code"] = tc.lower() if tc else None
        year = test.get("academicYear")
        row["school_year"] = int(year) if year and year.isdigit() else None
        row["asmt_version"] = test.get("assessmentVersion")

    attrs: dict[str, str] = {}
    rels: dict[str, str] = {}
    examinee = root.find("Examinee")
    ethnicities: list[str] = []
    if examinee is not None:
        for el in examinee:
            name, value = el.get("name"), el.get("value")
            if name is None:
                continue
            # FINAL context wins over INITIAL when both present
            is_final = (el.get("context") or "FINAL").upper() == "FINAL"
            target = attrs if el.tag == "ExamineeAttribute" else rels
            if name == "Ethnicity":
                if is_final and value:
                    ethnicities.append(value)
                continue
            if is_final or name not in target:
                target[name] = value
    row["ssid"] = attrs.get("StudentIdentifier")
    row["first_name"] = attrs.get("FirstName")
    row["middle_name"] = attrs.get("MiddleName")
    row["last_or_surname"] = attrs.get("LastOrSurname")
    bd = attrs.get("Birthdate")
    try:
        row["birthday"] = pd.Timestamp(bd).date() if bd else None
    except ValueError:
        errors.append(f"bad Birthdate: {bd}")
    row["gender"] = attrs.get("Sex")
    row["grade_code"] = attrs.get("GradeLevelWhenAssessed")
    row["iep"] = _parse_bool(attrs.get("IDEAIndicator"))
    row["lep"] = _parse_bool(attrs.get("LEPStatus"))
    row["section504"] = _parse_bool(attrs.get("Section504Status"))
    row["economic_disadvantage"] = _parse_bool(attrs.get("EconomicDisadvantageStatus"))
    row["migrant_status"] = _parse_bool(attrs.get("MigrantStatus"))
    row["language_code"] = attrs.get("LanguageCode")
    row["military_connected"] = attrs.get("MilitaryConnectedStudentIndicator")
    row["ethnicities"] = ethnicities or None
    row["school_natural_id"] = rels.get("SchoolId")

    opp = root.find("Opportunity")
    if opp is not None:
        row["opp_id"] = opp.get("oppId")
        o = opp.get("opportunity")
        row["opportunity"] = int(o) if o and o.isdigit() else None
        row["session_id"] = opp.get("sessionId")
        row["completeness"] = opp.get("completeness")
        row["administration_condition"] = opp.get("administrationCondition")
        dc = opp.get("dateCompleted")
        try:
            row["completed_at"] = pd.Timestamp(dc).tz_localize(None) if dc else None
        except ValueError:
            errors.append(f"bad dateCompleted: {dc}")
        # reset opportunity → delete semantics (docs/API.md:369)
        row["reset"] = (opp.get("status") or "").lower() == "reset"

        claim_scores = []
        for score in opp.findall("Score"):
            measure = score.get("measureOf") or ""
            label = (score.get("measureLabel") or "ScaleScore").lower()
            val, err = score.get("value"), score.get("standardError")
            if measure.lower() == "overall":
                if label == "scalescore":
                    row["scale_score"] = float(val) if val else None
                    row["scale_score_std_err"] = float(err) if err else None
                elif label in ("performancelevel", "scalescoreachievementlevel"):
                    row["performance_level"] = int(float(val)) if val else None
            else:
                claim_scores.append({
                    "claim_code": measure,
                    "scale_score": float(val) if val else None,
                    "scale_score_std_err": float(err) if err else None,
                    "performance_level": None,
                })
        row["claim_scores"] = claim_scores or None

        items = []
        for it in opp.findall("Item"):
            resp = it.find("Response")
            pos = it.get("position")
            sc = it.get("score")
            if sc in (None, ""):  # some TRTs carry it on ScoreInfo instead
                si_overall = it.find("ScoreInfo")
                if si_overall is not None:
                    sc = si_overall.get("scorePoint")
            # writing-trait sub-scores: <ScoreInfo><SubScoreList><ScoreInfo
            # scoreDimension scorePoint maxScore conditionCode/>… — the TRT
            # carry for the subject XML's <Traits> definitions (A11,
            # deploy/ELA_subject.xml:863-880)
            traits = []
            for si in it.findall("./ScoreInfo/SubScoreList/ScoreInfo"):
                sp, mx = si.get("scorePoint"), si.get("maxScore")
                traits.append({
                    "category": si.get("scoreDimension"),
                    "score": float(sp) if sp not in (None, "") else None,
                    "max_score": float(mx) if mx not in (None, "") else None,
                    "condition_code": si.get("conditionCode") or None,
                })
            items.append({
                "key": it.get("key"),
                "bank_key": it.get("bankKey"),
                "position": int(pos) if pos and pos.isdigit() else None,
                "score": float(sc) if sc else None,
                "score_status": it.get("scoreStatus"),
                "response": resp.text if resp is not None else None,
                "trait_scores": traits or None,
            })
        row["items"] = items or None
        row["accommodations"] = [
            a.get("code") for a in opp.findall("Accommodation") if a.get("code")
        ] or None

    for field in required:
        if row.get(field) is None:
            errors.append(f"missing required element: {field}")
    row["errors"] = errors or None
    return row


def parse_trt(payloads: DataFrame, required: list[str] | None = None) -> DataFrame:
    """``payloads(import_id long, payload string)`` → one parsed row per TRT
    document (TRT_SCHEMA). Arrow-batched mapInPandas; no shuffle."""
    req = required if required is not None else DEFAULT_REQUIRED

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _parse_one(int(r.import_id), r.payload, req)
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out, columns=[f.name for f in TRT_SCHEMA.fields])

    return payloads.mapInPandas(run, TRT_SCHEMA)


def normalize_children(parsed: DataFrame) -> dict[str, DataFrame]:
    """Declarative fan-out of the nested arrays into warehouse child shapes
    (exam id attachment happens in the ingest job once exams have ids)."""
    ok = parsed.filter(F.col("errors").isNull())
    items = (
        ok.select("opp_id", "asmt_natural_id", F.explode("items").alias("it"))
        .select("opp_id", "asmt_natural_id", "it.*")
    )
    claim_scores = (
        ok.select("opp_id", "asmt_natural_id", F.explode("claim_scores").alias("cs"))
        .select("opp_id", "asmt_natural_id", "cs.*")
    )
    accommodations = (
        ok.select("opp_id", "asmt_natural_id",
                  F.explode("accommodations").alias("accommodation_code"))
    )
    ethnicities = (
        ok.select("ssid", F.explode("ethnicities").alias("ethnicity")).distinct()
    )
    return {
        "exam_item": items,
        "exam_score": claim_scores,
        "exam_available_accommodation": accommodations,
        "student_ethnicity": ethnicities,
    }
