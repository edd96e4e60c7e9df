"""Input validators for subject XML and tabulator package CSV.

The reference ships a standalone CLI validator for exactly these two
formats (tools/README.md:55-68: ``-s subject file``, ``-t test package
(tabulator) file``, repeatable) so administrators can check files BEFORE
submitting them to the ingest API. This is the engine's equivalent:
pure-Python checks (no Spark session — a validator must start fast),
returning row/element-level error strings, with ``scripts/validate.py``
as the command-line entry point.

The rules mirror what the loaders require: the same attributes
``subject_xml.parse_subject_xml`` reads and the same columns
``package.parse_package`` aggregates — so "validator clean" implies "load
will not reject"."""

from __future__ import annotations

import csv
import io
import xml.etree.ElementTree as ET

# every column parse_package references UNCONDITIONALLY (reference
# tabulator header, tools/TestPackage.csv) — missing any of these breaks
# the load. Standards/PT columns (SecondaryCommonCore,
# SecondaryClaimContentTarget, PtWritingType) are optional in the loader
# and therefore not required here.
PACKAGE_REQUIRED_COLUMNS = [
    "AssessmentId", "AssessmentName", "AssessmentSubject", "AssessmentGrade",
    "AssessmentType", "AssessmentLabel", "AssessmentVersion", "AcademicYear",
    "FullItemKey", "BankKey", "ItemId", "ItemType", "Claim", "Target", "DOK",
    "MaxPoints", "MathematicalPractice", "CommonCore", "ItemPosition",
    "a", "b0_b", "b1_c",
    "ScaledLow1", "ScaledHigh1", "ScaledLow2", "ScaledHigh2",
    "ScaledLow3", "ScaledHigh3", "ScaledLow4", "ScaledHigh4",
]
PACKAGE_ASMT_TYPES = {"interim", "iab", "ica", "summative", "sum"}


def validate_subject_xml(payload: str | bytes) -> list[str]:
    """Element-level errors for a SUBJECT config XML; empty list = valid."""
    errors: list[str] = []
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as exc:
        return [f"not well-formed XML: {exc}"]
    if not root.get("code"):
        errors.append("root element is missing the 'code' attribute")

    ats = root.findall("./AssessmentTypes/AssessmentType")
    if not ats:
        errors.append("no AssessmentTypes/AssessmentType elements")
    for i, at in enumerate(ats):
        where = f"AssessmentType[{i}]"
        if not at.get("code"):
            errors.append(f"{where}: missing 'code' attribute")
        overall = at.find("OverallScoring")
        if overall is not None:
            for attr in ("minScore", "maxScore"):
                v = overall.get(attr)
                if v is not None and not _is_float(v):
                    errors.append(f"{where}/OverallScoring: {attr}={v!r} is not numeric")
            pls = overall.find("PerformanceLevels")
            if pls is not None:
                cutoff = pls.get("standardCutoff")
                if cutoff is not None and not cutoff.isdigit():
                    errors.append(
                        f"{where}/PerformanceLevels: standardCutoff={cutoff!r} is not an integer"
                    )
        for scoring in ("OverallScoring", "ClaimScoring"):
            node = at.find(scoring)
            if node is None:
                continue
            for j, lvl in enumerate(node.findall("PerformanceLevels/PerformanceLevel")):
                lw = f"{where}/{scoring}/PerformanceLevel[{j}]"
                level = lvl.get("level")
                if level is None or not level.lstrip("-").isdigit():
                    errors.append(f"{lw}: level={level!r} is not an integer")
                if not lvl.get("name"):
                    errors.append(f"{lw}: missing 'name'")
    for j, cut in enumerate(root.findall("./ItemDifficulties/ItemDifficulty")):
        # the loader float()s both attributes unconditionally
        # (subject_xml.py parse of ItemDifficulties/ItemDifficulty)
        for attr in ("moderateLowEnd", "difficultLowEnd"):
            v = cut.get(attr)
            if v is None:
                errors.append(f"ItemDifficulty[{j}]: missing {attr!r}")
            elif not _is_float(v):
                errors.append(f"ItemDifficulty[{j}]: {attr}={v!r} is not numeric")
    for j, dok in enumerate(root.findall("./DepthsOfKnowledge/DepthOfKnowledge")):
        level = dok.get("level")
        if level is None or not level.lstrip("-").isdigit():
            errors.append(f"DepthOfKnowledge[{j}]: level={level!r} is not an integer")
    return errors


def validate_package_csv(text: str) -> list[str]:
    """Row-level errors for a tabulator package CSV; empty list = valid."""
    errors: list[str] = []
    reader = csv.DictReader(io.StringIO(text))
    header = reader.fieldnames or []
    missing = [c for c in PACKAGE_REQUIRED_COLUMNS if c not in header]
    if missing:
        # a wrong header invalidates the whole file, like the groups CSV
        return [f"missing required column(s): {', '.join(missing)}"]

    seen_any = False
    for n, row in enumerate(reader, start=2):  # 1-based, after the header
        seen_any = True
        if not (row.get("AssessmentId") or "").strip():
            errors.append(f"line {n}: empty AssessmentId")
        year = (row.get("AcademicYear") or "").strip()
        if year and not year.isdigit():
            errors.append(f"line {n}: AcademicYear={year!r} is not a year")
        at = (row.get("AssessmentType") or "").strip().lower()
        if at and at not in PACKAGE_ASMT_TYPES:
            errors.append(f"line {n}: unknown AssessmentType {at!r}")
        for col in ("MaxPoints", "ItemPosition"):
            v = (row.get(col) or "").strip()
            if v and not v.lstrip("-").isdigit():
                errors.append(f"line {n}: {col}={v!r} is not an integer")
    if not seen_any:
        errors.append("no data rows")
    return errors


def _is_float(v: str) -> bool:
    try:
        float(v)
        return True
    except ValueError:
        return False
