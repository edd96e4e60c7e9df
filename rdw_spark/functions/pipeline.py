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
