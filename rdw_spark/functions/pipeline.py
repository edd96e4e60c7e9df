"""Ingest pipeline: user document-transforms + golden tests (F1-F4).

Reference semantics (docs/Runbook.Pipeline.md):
- *user scripts* transform each incoming XML/CSV document before parsing;
  they are sandboxed — no filesystem writes, network, DB, or threads
  (Runbook.Pipeline.md:34-68). The published ETS example (:333-411) does
  regex replaceAll on attribute values, conditional matches, and re-emits
  XML.
- *golden tests*: each pipeline stores (example_input, expected_output)
  rows; publishing is blocked unless ≥1 test exists and all pass
  (Runbook.Pipeline.md:137-145, 176-211).
- the legacy *XSLT* transform path (docs/Runbook.DataSpecifications.md:55-93)
  is expressed as just another step kind; full XSLT uses lxml when
  installed, else ``xslt_lite`` executes the documented identity+rewrite
  subset on the stdlib parser (NotImplementedError beyond the subset).

Spark shape: a pipeline is a *data* description (list of steps), compiled to
one Python function applied per document inside ``mapInPandas`` —
Arrow-batched, map-only, no shuffle; sandboxing holds by construction
because steps are declarative (regex / element edits), not arbitrary code.
Arbitrary callables are accepted but flagged ``trusted`` (F2 system-script
analog, which the reference leaves unsandboxed).
"""

from __future__ import annotations

import difflib
import re
import xml.etree.ElementTree as ET
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T


@dataclass(frozen=True)
class Step:
    kind: str                      # regex_replace | xml_edit | xslt | callable
    pattern: str | None = None
    replacement: str | None = None
    tag: str | None = None         # xml_edit: element tag to visit ('*' = all)
    edit: Callable | None = None   # xml_edit: fn(element) -> None (mutates)
    fn: Callable[[str], str] | None = None  # callable (trusted/system)
    xslt: str | None = None


def regex_replace(pattern: str, replacement: str) -> Step:
    """Groovy ``replaceAll(~/re/, 'x')`` analog (Runbook.Pipeline.md:343-407)."""
    return Step(kind="regex_replace", pattern=pattern, replacement=replacement)


def xml_edit(tag: str, edit: Callable) -> Step:
    """``transform '//Item' by { ... }`` analog: visit each element with the
    given tag and mutate it (attributes/text) in place."""
    return Step(kind="xml_edit", tag=tag, edit=edit)


def system_script(fn: Callable[[str], str]) -> Step:
    """F2 pre/post system script — unsandboxed, deploy-trusted code."""
    return Step(kind="callable", fn=fn)


def xslt_step(stylesheet: str) -> Step:
    return Step(kind="xslt", xslt=stylesheet)


@dataclass
class Pipeline:
    """Named, versioned document pipeline with its golden tests."""

    name: str
    steps: list[Step] = field(default_factory=list)
    tests: list[tuple[str, str]] = field(default_factory=list)  # (input, expected)

    def compile(self) -> Callable[[str], str]:
        steps = list(self.steps)

        def run(doc: str) -> str:
            for s in steps:
                if s.kind == "regex_replace":
                    doc = re.sub(s.pattern, s.replacement, doc)
                elif s.kind == "xml_edit":
                    root = ET.fromstring(doc)
                    nodes = root.iter() if s.tag == "*" else root.iter(s.tag)
                    for el in nodes:
                        s.edit(el)
                    doc = ET.tostring(root, encoding="unicode")
                elif s.kind == "callable":
                    doc = s.fn(doc)
                elif s.kind == "xslt":
                    try:
                        from lxml import etree  # noqa: PLC0415 — optional dep
                        transform = etree.XSLT(etree.fromstring(s.xslt.encode()))
                        doc = str(transform(etree.fromstring(doc.encode())))
                    except ImportError:
                        # F3 fallback: the stdlib subset interpreter covers
                        # the documented identity+rewrite shape; anything
                        # beyond it raises NotImplementedError honestly
                        from rdw_spark.functions import xslt_lite  # noqa: PLC0415

                        doc = xslt_lite.transform(s.xslt, doc)
                else:
                    raise ValueError(f"unknown step kind {s.kind}")
            return doc

        return run

    # ---------- distributed application (F1) ----------

    def apply(self, payloads: DataFrame, column: str = "payload") -> DataFrame:
        """Transform ``column`` of every row; schema preserved. Map-only."""
        run = self.compile()
        schema = payloads.schema

        def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf[column] = pdf[column].map(run)
                yield pdf

        return payloads.mapInPandas(go, schema)

    # ---------- golden tests (F4) ----------

    def run_tests(self, spark: SparkSession) -> DataFrame:
        """(test_id, passed, diff) per golden test — diffed like the
        reference's run/compare UI (Runbook.Pipeline.md:176-211)."""
        run = self.compile()
        rows = []
        for i, (example_input, expected) in enumerate(self.tests):
            actual = run(example_input)
            passed = actual == expected
            diff = "" if passed else "\n".join(
                difflib.unified_diff(
                    expected.splitlines(), actual.splitlines(),
                    "expected", "actual", lineterm="",
                )
            )
            rows.append((i, passed, diff))
        return spark.createDataFrame(
            rows, T.StructType([
                T.StructField("test_id", T.IntegerType()),
                T.StructField("passed", T.BooleanType()),
                T.StructField("diff", T.StringType()),
            ]),
        )

    def publish_gate(self, spark: SparkSession) -> None:
        """Raise unless ≥1 golden test exists and all pass — the reference's
        publish precondition (Runbook.Pipeline.md:137-145)."""
        if not self.tests:
            raise ValueError(
                f"pipeline {self.name!r}: publishing requires at least one test"
            )
        failed = self.run_tests(spark).filter("NOT passed").count()
        if failed:
            raise ValueError(
                f"pipeline {self.name!r}: {failed} golden test(s) failing"
            )


# --------------------------------------------------------------------------
# Warehouse-backed pipeline configuration (docs/Runbook.Pipeline.md:119-145)
# --------------------------------------------------------------------------

# the persistable script dialect: a JSON array of DECLARATIVE steps only
# (regex_replace / xslt). Arbitrary-callable steps (F2) are system scripts
# loaded from code, exactly like the reference's classpath pre/post-process
# scripts — they are not publishable through the repository.
_DECLARATIVE_KINDS = {"regex_replace", "xslt"}


def compile_body(body: str, name: str = "pipeline") -> Pipeline:
    """Parse a persisted user-script body (JSON step list) into a Pipeline.
    Raises ValueError on non-declarative or unknown step kinds — the
    sandbox boundary (Runbook.Pipeline.md:34-68) enforced at load time."""
    import json

    try:
        spec = json.loads(body)
    except json.JSONDecodeError as exc:
        raise ValueError(f"pipeline body is not valid JSON: {exc}") from exc
    if not isinstance(spec, list):
        raise ValueError("pipeline body must be a JSON array of steps")
    steps: list[Step] = []
    for i, s in enumerate(spec):
        kind = s.get("kind")
        if kind not in _DECLARATIVE_KINDS:
            raise ValueError(f"step {i}: kind {kind!r} is not a sandboxed step")
        if kind == "regex_replace":
            steps.append(regex_replace(s["pattern"], s["replacement"]))
        else:
            steps.append(xslt_step(s["stylesheet"]))
    return Pipeline(name=name, steps=steps)


class PipelineRepository:
    """The reference's pipeline persistence, re-expressed on the engine's
    stores: config rows in the warehouse (``pipeline`` /
    ``pipeline_script`` WIP / ``pipeline_test`` tables,
    Runbook.Pipeline.md:119-145), published immutable script versions in
    the archive zone at ``pipelines/<code>/user.<version>.json``
    (Runbook.Pipeline.md:104-112 — every version kept, enabling rollback;
    publish is gated on the golden tests, :137-145)."""

    def __init__(self, wh, archive_root: str):
        import os

        self.wh = wh
        self.archive_root = archive_root
        os.makedirs(archive_root, exist_ok=True)

    # ---------- ids ----------

    @staticmethod
    def _pid(code: str) -> int:
        import hashlib

        return int.from_bytes(
            hashlib.md5(f"pipeline|{code}".encode()).digest()[:8], "big"
        ) // 2  # keep positive in a signed long

    # ---------- authoring ----------

    def save_script(self, spark: SparkSession, code: str, body: str,
                    input_type: str = "xml", user: str = "rdw_spark") -> None:
        """Upsert the pipeline row + its single WIP script row. The body is
        validated (parseable, declarative-only) on save, like the UI."""
        compile_body(body, code)  # reject garbage before it lands
        from pyspark.sql import functions as F

        pid = self._pid(code)
        cur = self.wh.read(spark, "pipeline").filter(F.col("code") == code).collect()
        active = cur[0]["active_version"] if cur else None
        prow = spark.createDataFrame(
            [(pid, code, input_type, active)], self.wh.schemas["pipeline"]
        )
        self.wh.merge_rows(spark, "pipeline", prow, ["code"])
        prev = (
            self.wh.read(spark, "pipeline_script")
            .filter(F.col("pipeline_id") == pid).collect()
        )
        created = prev[0]["created"] if prev else None
        srow = spark.createDataFrame(
            [(pid, pid, body, created, user)],
            "id long, pipeline_id long, body string, created timestamp, updated_by string",
        ).withColumn("updated", F.current_timestamp()).withColumn(
            "created", F.coalesce(F.col("created"), F.current_timestamp())
        ).select(*[f.name for f in self.wh.schemas["pipeline_script"].fields])
        self.wh.merge_rows(spark, "pipeline_script", srow, ["pipeline_id"])

    def save_test(self, spark: SparkSession, code: str, name: str,
                  example_input: str, expected_output: str,
                  user: str = "rdw_spark") -> None:
        from pyspark.sql import functions as F

        pid = self._pid(code)
        tid = self._pid(f"{code}|test|{name}")
        prev = (
            self.wh.read(spark, "pipeline_test")
            .filter((F.col("pipeline_id") == pid) & (F.col("name") == name))
            .collect()
        )
        created = prev[0]["created"] if prev else None
        trow = spark.createDataFrame(
            [(tid, pid, name, example_input, expected_output, created, user)],
            "id long, pipeline_id long, name string, example_input string, "
            "expected_output string, created timestamp, updated_by string",
        ).withColumn("updated", F.current_timestamp()).withColumn(
            "created", F.coalesce(F.col("created"), F.current_timestamp())
        ).select(*[f.name for f in self.wh.schemas["pipeline_test"].fields])
        self.wh.merge_rows(spark, "pipeline_test", trow, ["pipeline_id", "name"])

    # ---------- loading ----------

    def _wip_pipeline(self, spark: SparkSession, code: str) -> Pipeline:
        from pyspark.sql import functions as F

        pid = self._pid(code)
        rows = (
            self.wh.read(spark, "pipeline_script")
            .filter(F.col("pipeline_id") == pid).collect()
        )
        if not rows:
            raise ValueError(f"pipeline {code!r}: no saved script")
        p = compile_body(rows[0]["body"], code)
        tests = (
            self.wh.read(spark, "pipeline_test")
            .filter(F.col("pipeline_id") == pid).orderBy("name").collect()
        )
        p.tests.extend((t["example_input"], t["expected_output"]) for t in tests)
        return p

    # ---------- publish / rollback / activate ----------

    def _version_path(self, code: str, version: int) -> str:
        import os

        return os.path.join(self.archive_root, "pipelines", code,
                            f"user.{version}.json")

    def publish(self, spark: SparkSession, code: str,
                user: str = "rdw_spark") -> int:
        """Golden-test gate, then write the next immutable script version to
        the archive and point active_version at it. Returns the version."""
        import glob
        import os
        import re as _re

        from pyspark.sql import functions as F

        p = self._wip_pipeline(spark, code)
        p.publish_gate(spark)  # >=1 test, all passing (F4)
        existing = glob.glob(self._version_path(code, 0).replace("user.0.", "user.*."))
        versions = [
            int(m.group(1)) for f in existing
            if (m := _re.search(r"user\.(\d+)\.json$", f))
        ]
        v = max(versions, default=0) + 1
        path = self._version_path(code, v)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        body = (
            self.wh.read(spark, "pipeline_script")
            .filter(F.col("pipeline_id") == self._pid(code)).collect()[0]["body"]
        )
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(body)
        self.set_active_version(spark, code, v)
        return v

    def set_active_version(self, spark: SparkSession, code: str,
                           version: int | None) -> None:
        """Activate a published version (rollback = activate an older one);
        None deactivates user-script processing for the pipeline."""
        import os

        from pyspark.sql import functions as F

        if version is not None and not os.path.exists(self._version_path(code, version)):
            raise ValueError(f"pipeline {code!r}: version {version} not published")
        row = (
            self.wh.read(spark, "pipeline")
            .filter(F.col("code") == code)
            .withColumn("active_version", F.lit(version).cast("int"))
        )
        if not row.collect():
            raise ValueError(f"pipeline {code!r}: not saved")
        self.wh.merge_rows(spark, "pipeline", row, ["code"])

    def active_pipeline(self, spark: SparkSession, code: str) -> Pipeline | None:
        """The published pipeline the ingest process would run, or None if
        no version is active (Runbook.Pipeline.md: null active_version
        means no user script runs)."""
        from pyspark.sql import functions as F

        rows = (
            self.wh.read(spark, "pipeline").filter(F.col("code") == code).collect()
        )
        if not rows or rows[0]["active_version"] is None:
            return None
        with open(self._version_path(code, rows[0]["active_version"]),
                  encoding="utf-8") as fh:
            return compile_body(fh.read(), code)
