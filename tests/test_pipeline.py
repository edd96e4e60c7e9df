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


SAMPLE_XSLT = """<xsl:stylesheet version="2.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
  <xsl:output method="xml" omit-xml-declaration="yes" indent="yes"/>
  <xsl:template match="@*|node()">
    <xsl:copy>
      <xsl:apply-templates select="@*|node()"/>
    </xsl:copy>
  </xsl:template>
  <xsl:template match="Item/@bankKey['10200']">
    <xsl:attribute name="bankKey">
      <xsl:value-of select="'200'"/>
    </xsl:attribute>
  </xsl:template>
</xsl:stylesheet>"""


class TestXsltLite:
    """F3: the docs/Runbook.DataSpecifications.md:70-93 sample transform,
    runnable without lxml via the stdlib subset interpreter."""

    def test_doc_sample_bankkey_rewrite(self):
        from rdw_spark.functions.xslt_lite import transform

        doc = ('<TDSReport><Opportunity>'
               '<Item position="1" bankKey="10200" key="77"/>'
               '<Item position="2" bankKey="9" key="78"/>'
               '</Opportunity></TDSReport>')
        out = transform(SAMPLE_XSLT, doc)
        import xml.etree.ElementTree as ET
        items = ET.fromstring(out).findall(".//Item")
        assert items[0].get("bankKey") == "200"      # matched + rewritten
        assert items[0].get("key") == "77"           # untouched attrs survive
        assert items[1].get("bankKey") == "9"        # predicate filtered

    def test_element_text_rewrite_and_delete(self):
        from rdw_spark.functions.xslt_lite import transform

        xslt = """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="@*|node()"><xsl:copy><xsl:apply-templates select="@*|node()"/></xsl:copy></xsl:template>
          <xsl:template match="Grade">06</xsl:template>
          <xsl:template match="Debug"/>
        </xsl:stylesheet>"""
        out = transform(xslt, "<R><Grade>6</Grade><Debug>x</Debug><Keep/></R>")
        assert "<Grade>06</Grade>" in out
        assert "Debug" not in out and "<Keep />" in out or "<Keep/>" in out

    def test_unsupported_constructs_raise(self):
        import pytest as _pytest

        from rdw_spark.functions.xslt_lite import transform

        no_identity = """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="A">b</xsl:template>
        </xsl:stylesheet>"""
        with _pytest.raises(NotImplementedError):
            transform(no_identity, "<A/>")
        for_each = """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="@*|node()"><xsl:copy><xsl:apply-templates select="@*|node()"/></xsl:copy></xsl:template>
          <xsl:template match="A"><xsl:for-each select="B"/></xsl:template>
        </xsl:stylesheet>"""
        with _pytest.raises(NotImplementedError):
            transform(for_each, "<A/>")

    def test_xslt_step_in_pipeline(self, spark):
        from rdw_spark.functions.pipeline import Pipeline, xslt_step

        pipe = Pipeline(name="bankkey-fix", steps=[xslt_step(SAMPLE_XSLT)])
        df = spark.createDataFrame(
            [('<TDSReport><Item bankKey="10200"/></TDSReport>',)], "payload string"
        )
        out = pipe.apply(df).collect()[0]["payload"]
        assert 'bankKey="200"' in out

    def test_copy_only_body_is_identity_not_delete(self):
        """An explicit keep-as-is override (body = xsl:copy + apply) must
        copy the node through, and rewrites nested inside xsl:copy apply."""
        from rdw_spark.functions.xslt_lite import transform

        xslt = """<xsl:stylesheet version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform">
          <xsl:template match="@*|node()"><xsl:copy><xsl:apply-templates select="@*|node()"/></xsl:copy></xsl:template>
          <xsl:template match="Keep"><xsl:copy><xsl:apply-templates select="@*|node()"/></xsl:copy></xsl:template>
          <xsl:template match="Item"><xsl:copy><xsl:attribute name="bankKey"><xsl:value-of select="'200'"/></xsl:attribute></xsl:copy></xsl:template>
        </xsl:stylesheet>"""
        out = transform(xslt, '<R><Keep a="1">x</Keep><Item bankKey="9"/></R>')
        assert 'a="1"' in out and ">x<" in out          # Keep survived intact
        assert 'bankKey="200"' in out                   # nested rewrite applied
