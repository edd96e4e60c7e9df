"""CODES seed dims and EMBARGO ingest (reference content types 2 and 8).

CODES (docs/Runbook.ImportMigrate.md:12-13): lookup dims pre-loaded before
any other content — administration conditions, completeness, grades,
ethnicities, genders, plus school-year registration
(docs/Runbook.SystemConfiguration.md:31-46) and military-connected codes
(:245-263). Values below are the ones enumerated in the reference docs.

EMBARGO (docs/Runbook.ImportMigrate.md:15): state/district embargo rows with
``individual`` / ``aggregate`` statuses 0=Loading, 1=Reviewing, 2=Released
(docs/Runbook.ManualDataModifications.md:23-38). Accepted here as a JSON
payload listing embargo settings — the engine-side analog of the reference's
admin endpoint.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

CODES = {
    # docs/Runbook.ImportMigrate.md:12; values from deploy/ and API docs
    "administration_condition": ["Valid", "SD", "NS", "IN"],
    "completeness": ["Complete", "Partial"],
    "grade": ["KG", "01", "02", "03", "04", "05", "06", "07", "08",
              "09", "10", "11", "12", "13", "UG"],
    "gender": ["Female", "Male", "Nonbinary"],
    "ethnicity": [
        "AmericanIndianOrAlaskaNative", "Asian", "BlackOrAfricanAmerican",
        "DemographicRaceTwoOrMoreRaces", "HispanicOrLatinoEthnicity",
        "NativeHawaiianOrOtherPacificIslander", "White", "Filipino",
    ],
    # docs/Runbook.SystemConfiguration.md:245-263
    "military_connected": ["NotMilitaryConnected", "ActiveDuty", "NationalGuardOrReserve"],
    # docs/Runbook.ImportMigrate.md:12 lists math_practice and
    # item_trait_score among the pre-loaded CODES dims; the math practices
    # are the 8 SBAC practices, the trait-score codes are the writing
    # purpose×category codes enumerated in deploy/ELA_subject.xml:863-880
    "math_practice": ["1", "2", "3", "4", "5", "6", "7", "8"],
    "item_trait_score": [
        f"SOCK_{purpose}_{category}"
        for purpose in ("ARGU", "EXPL", "INFO", "NARR", "OPIN")
        for category in ("ORG", "CON", "EVI")
    ],
}


def seed_codes(spark: SparkSession) -> dict[str, DataFrame]:
    """One single-column DataFrame per code dim, ready to broadcast-join as
    validation sets."""
    return {
        name: spark.createDataFrame([(v,) for v in values], f"{name} string")
        for name, values in CODES.items()
    }


def seed_core_dims(spark: SparkSession) -> dict[str, DataFrame]:
    """The reference's pre-loaded immutable core tables
    (docs/Runbook.ImportMigrate.md:11: asmt_type, import_content,
    import_status, language — 'must be pre-loaded as part of the initial
    schema set, cannot be modified later'). Exposed as (code, name) dims so
    warehouse queries can resolve the integer codes the engine uses."""
    from rdw_spark.warehouse.import_log import ImportContent, ImportStatus

    asmt_type = spark.createDataFrame(
        [(1, "ica", "Interim Comprehensive Assessment"),
         (2, "iab", "Interim Assessment Block"),
         (3, "sum", "Summative")],
        "id int, code string, name string",
    )
    import_status = spark.createDataFrame(
        sorted(ImportStatus.NAMES.items()), "id int, name string",
    )
    import_content = spark.createDataFrame(
        sorted(
            (getattr(ImportContent, n), n)
            for n in vars(ImportContent)
            if n.isupper() and isinstance(getattr(ImportContent, n), int)
        ),
        "id int, name string",
    )
    # ISO-639 codes observed in the reference docs/samples (TRT
    # LanguageCode, accommodation translations)
    language = spark.createDataFrame(
        [("eng", "English"), ("spa", "Spanish"), ("vie", "Vietnamese"),
         ("cmn", "Mandarin"), ("yue", "Cantonese"), ("fil", "Filipino"),
         ("kor", "Korean"), ("pan", "Punjabi"), ("rus", "Russian"),
         ("ukr", "Ukrainian"), ("ara", "Arabic"), ("som", "Somali")],
        "code string, name string",
    )
    return {"asmt_type": asmt_type, "import_status": import_status,
            "import_content": import_content, "language": language}


def load_default_codes(spark: SparkSession, wh, log) -> dict:
    """Pre-load the CODES warehouse tables ("pre-loaded from SBAC
    blueprints and specifications. Allows for manual updates.",
    docs/Runbook.ImportMigrate.md:12) under a CODES import record."""
    from rdw_spark.warehouse.import_log import ImportContent, ImportStatus

    rec = log.accept(spark, ImportContent.CODES, b"default CODES seed",
                     content_type="codes seed")
    if rec.existing:
        return {"import_id": rec.id, "status": "DUPLICATE"}
    for name, values in CODES.items():
        wh.write_snapshot(
            spark.createDataFrame([(v, v) for v in values], "code string, name string"),
            name,
        )
    from rdw_spark.sources.codes_embargo import seed_core_dims

    lang = seed_core_dims(spark)["language"]
    wh.write_snapshot(lang.select("code", "name"), "language")
    log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    return {"import_id": rec.id, "status": "PROCESSED"}


def update_codes(spark: SparkSession, wh, log, table: str,
                 add: list[tuple[str, str]] = (), remove: list[str] = ()) -> dict:
    """The documented manual code-change flow
    (docs/Runbook.SystemConfiguration.md:200-263): edit the code table,
    then trigger a CODES migration by inserting an import row — e.g.
    ``INSERT INTO language ...; INSERT INTO import (status, content,
    contentType, digest) VALUES (1, 3, 'update language', ...)``."""
    from rdw_spark.warehouse import schemas as S
    from rdw_spark.warehouse.import_log import ImportContent, ImportStatus

    if table not in S.CODE_TABLES:
        raise ValueError(f"not a CODES table: {table}")
    cur = wh.read(spark, table)
    if remove:
        cur = cur.filter(~F.col("code").isin(*remove))
    if add:
        cur = cur.filter(~F.col("code").isin(*[c for c, _ in add])).unionByName(
            spark.createDataFrame(list(add), "code string, name string")
        )
    wh.write_snapshot(cur, table)
    rec = log.accept(
        spark, ImportContent.CODES,
        f"update {table}: +{sorted(c for c, _ in add)} -{sorted(remove)}".encode(),
        content_type=f"update {table}",
    )
    if not rec.existing:
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    return {"import_id": rec.id, "table": table,
            "codes": wh.read(spark, table).count()}


def unknown_code_report(spark: SparkSession, wh) -> DataFrame:
    """Reconciliation-style check (SURVEY §5.6): values on warehouse rows
    that are missing from their CODES dim — the set-based analog of the
    reference's per-row ingest code validation. Empty = clean."""
    exam = wh.read(spark, "exam").filter(~F.col("deleted"))
    checks = [
        ("language", exam.select(F.col("language_code").alias("code"))),
        ("military_connected", exam.select(F.col("military_connected").alias("code"))),
        ("grade", exam.select(F.col("grade_code").alias("code"))),
        ("administration_condition",
         exam.select(F.col("administration_condition").alias("code"))),
        ("completeness", exam.select(F.col("completeness").alias("code"))),
        ("ethnicity",
         wh.read(spark, "student_ethnicity").select(F.col("ethnicity").alias("code"))),
    ]
    out = None
    for table, vals in checks:
        dim = wh.read(spark, table).select("code")
        if dim.isEmpty():
            continue  # codes not loaded for this deployment — nothing to check
        bad = (
            vals.filter(F.col("code").isNotNull())
            .join(F.broadcast(dim), "code", "left_anti")
            .groupBy("code").agg(F.count("*").alias("n"))
            .withColumn("code_table", F.lit(table))
            .select("code_table", "code", "n")
        )
        out = bad if out is None else out.unionByName(bad)
    if out is None:
        return spark.createDataFrame([], "code_table string, code string, n long")
    return out


def school_years(spark: SparkSession, years: list[int]) -> DataFrame:
    """Registered school years (docs/Runbook.SystemConfiguration.md:31-46):
    exams for unregistered years are rejected at ingest."""
    return spark.createDataFrame([(y,) for y in years], "school_year int")


def register_school_year(spark: SparkSession, wh, log, year: int) -> dict:
    """The new-school-year flow (docs/Runbook.SystemConfiguration.md:31-46):
    ``INSERT INTO school_year (year) VALUES (...)`` plus a CODES import row
    ('add school year N') so migration picks it up."""
    from rdw_spark.warehouse.import_log import ImportContent, ImportStatus

    cur = wh.read(spark, "school_year")
    wh.write_snapshot(
        cur.unionByName(spark.createDataFrame([(year,)], "year int")).distinct(),
        "school_year",
    )
    rec = log.accept(spark, ImportContent.CODES,
                     f"add school year {year}".encode(),
                     content_type=f"add school year {year}")
    if not rec.existing:
        log.set_status(spark, rec.id, ImportStatus.PROCESSED)
    return {"import_id": rec.id,
            "years": sorted(r["year"] for r in wh.read(spark, "school_year").collect())}


def restrict_to_known_years(df: DataFrame, school_year_tbl: DataFrame,
                            col: str = "school_year") -> DataFrame:
    """Reporting restriction to registered years ("the system restricts
    reporting to the 'known' school years") — a broadcast semi-join any
    mart query can wrap itself in."""
    years = school_year_tbl.select(F.col("year").alias(col)).distinct()
    return df.join(F.broadcast(years), col, "left_semi")


def parse_embargo_json(spark: SparkSession, payload: str | bytes) -> dict[str, DataFrame]:
    """JSON → {"state_embargo", "district_embargo"} warehouse frames.

    Payload shape (engine-defined; field semantics from the reference's
    embargo tables):
        {"state": [{"school_year": 2018, "subject_code": null,
                    "individual": 2, "aggregate": 1}],
         "district": [{"district_id": 123, "school_year": 2018,
                       "subject_code": "Math", "individual": 0, "aggregate": 0}]}
    """
    doc = json.loads(payload)
    state_schema = ("school_year int, subject_code string, "
                    "individual int, aggregate int")
    district_schema = ("district_id long, school_year int, subject_code string, "
                       "individual int, aggregate int")

    def rows(items: list[dict], cols: list[str]) -> list[tuple]:
        return [tuple(i.get(c) for c in cols) for i in items]

    state = spark.createDataFrame(
        rows(doc.get("state", []),
             ["school_year", "subject_code", "individual", "aggregate"]),
        state_schema,
    )
    district = spark.createDataFrame(
        rows(doc.get("district", []),
             ["district_id", "school_year", "subject_code", "individual", "aggregate"]),
        district_schema,
    )
    return {"state_embargo": state, "district_embargo": district}
