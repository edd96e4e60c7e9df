"""Pipeline user-script surface F1-F4 + scalar gap-fillers (§2.9)."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from rdw_spark.functions.pipeline import (
    Pipeline, regex_replace, system_script, xml_edit,
)
from rdw_spark.functions.scalars import after_expr, html_unescape, parse_iso_duration


def _strip_leading_zeros(el):
    # the published ETS example normalizes numeric attribute values
    # (Runbook.Pipeline.md:343-407) — ours: strip zero-padding on value=
    v = el.get("value")
    if v and v.isdigit():
        el.set("value", str(int(v)))


@pytest.fixture()
def pipe():
    return Pipeline(
        name="normalize-trt",
        steps=[
            regex_replace(r'subject="MATHEMATICS"', 'subject="Math"'),
            xml_edit("ExamineeAttribute", _strip_leading_zeros),
        ],
        tests=[(
            '<TDSReport><Test subject="MATHEMATICS"/>'
            '<ExamineeAttribute name="X" value="007"/></TDSReport>',
            '<TDSReport><Test subject="Math" />'
            '<ExamineeAttribute name="X" value="7" /></TDSReport>',
        )],
    )


class TestPipeline:
    def test_compile_and_apply_distributed(self, spark, pipe):
        df = spark.createDataFrame(
            [(1, '<TDSReport><Test subject="MATHEMATICS"/>'
                 '<ExamineeAttribute name="X" value="042"/></TDSReport>')],
            "import_id long, payload string",
        )
        out = pipe.apply(df).collect()[0]["payload"]
        assert 'subject="Math"' in out and 'value="42"' in out

    def test_golden_tests_and_publish_gate(self, spark, pipe):
        results = pipe.run_tests(spark).collect()
        assert len(results) == 1 and results[0]["passed"]
        pipe.publish_gate(spark)  # all green → no raise

        bad = Pipeline(name="broken", steps=[regex_replace("a", "b")],
                       tests=[("aaa", "zzz")])
        res = bad.run_tests(spark).collect()[0]
        assert not res["passed"] and "-zzz" in res["diff"] and "+bbb" in res["diff"]
        with pytest.raises(ValueError, match="1 golden test"):
            bad.publish_gate(spark)
        with pytest.raises(ValueError, match="at least one test"):
            Pipeline(name="untested", steps=[]).publish_gate(spark)

    def test_system_script_step(self, spark):
        p = Pipeline(name="sys", steps=[system_script(lambda d: d.upper())])
        df = spark.createDataFrame([(1, "abc")], "import_id long, payload string")
        assert p.apply(df).collect()[0]["payload"] == "ABC"


class TestScalars:
    def test_html_unescape(self, spark):
        df = spark.createDataFrame([("Tom &amp; Jerry &lt;3",), (None,)], ["s"])
        out = [r["u"] for r in df.select(html_unescape("s").alias("u")).collect()]
        assert out == ["Tom & Jerry <3", None]

    def test_iso_duration(self):
        assert parse_iso_duration("-PT1H") == timedelta(hours=-1)
        assert parse_iso_duration("P2DT3H4M5S") == timedelta(
            days=2, hours=3, minutes=4, seconds=5)
        with pytest.raises(ValueError):
            parse_iso_duration("1 hour")

    def test_after_expr(self, spark):
        df = spark.range(1).select(
            F.current_timestamp().alias("updated")
        )
        assert df.filter(after_expr("-PT1H")).count() == 1
        old = spark.sql("SELECT timestamp'2000-01-01 00:00:00' AS updated")
        assert old.filter(after_expr("-PT1H")).count() == 0
