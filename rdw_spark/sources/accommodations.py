"""Accessibility/accommodations XML source (S7).

Reference format (docs/API.md:622-691; deploy/accommodations.xml): an
``<Accessibility>`` document of resource families; each ``*Resource`` has a
``<Code>``, typed ``<ResourceType>``, a ``<Text>`` block per language with
``<Label>``/``<Description>``, and ``<Selection>`` children with their own
codes and per-language labels. We load every code (resource and selection)
as an ``accommodation`` row and every non-English ``<Text>`` as an
``accommodation_translation`` row.

Driver-side ElementTree parse (the file is a dim, ~100s of KB), DataFrames out.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession, types as T

_ACC = T.StructType([
    T.StructField("code", T.StringType()),
    T.StructField("name", T.StringType()),
])
_TR = T.StructType([
    T.StructField("code", T.StringType()),
    T.StructField("language_code", T.StringType()),
    T.StructField("label", T.StringType()),
])


def parse_accommodations_xml(spark: SparkSession, payload: str | bytes) -> dict[str, DataFrame]:
    root = ET.fromstring(payload)
    acc_rows: list[dict] = []
    tr_rows: list[dict] = []

    def texts(node) -> list[tuple[str, str]]:
        out = []
        for t in node.findall("Text"):
            lang = t.findtext("Language")
            label = t.findtext("Label")
            if lang and label:
                out.append((lang, label))
        return out

    for res in root.iter():
        if not res.tag.endswith("Resource"):
            continue
        code = res.findtext("Code")
        if code:
            eng = [lb for lg, lb in texts(res) if lg == "eng"]
            acc_rows.append({"code": code, "name": eng[0] if eng else code})
            for lang, label in texts(res):
                if lang != "eng":
                    tr_rows.append({"code": code, "language_code": lang, "label": label})
        for sel in res.findall("Selection"):
            s_code = sel.findtext("Code")
            if not s_code:
                continue
            eng = [lb for lg, lb in texts(sel) if lg == "eng"]
            acc_rows.append({"code": s_code, "name": eng[0] if eng else s_code})
            for lang, label in texts(sel):
                if lang != "eng":
                    tr_rows.append({"code": s_code, "language_code": lang, "label": label})

    acc = spark.createDataFrame(acc_rows, _ACC).dropDuplicates(["code"])
    tr = spark.createDataFrame(tr_rows, _TR)
    return {"accommodation": acc, "accommodation_translation": tr}
