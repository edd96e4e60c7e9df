"""Source parsers S1-S8: format parsing, validation errors, warehouse shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from rdw_spark.sources.accommodations import parse_accommodations_xml
from rdw_spark.sources.groups import export_groups_csv, parse_groups, read_groups_csv
from rdw_spark.sources.norms import parse_norms, read_norms_csv
from rdw_spark.sources.org import parse_org_calpads, parse_org_json
from rdw_spark.sources.package import parse_package, read_package_csv
from rdw_spark.sources.subject_xml import parse_subject_xml
from rdw_spark.sources.trt import DEFAULT_REQUIRED, normalize_children, parse_trt

ORG_JSON = """
{
  "districts": [
    {"entityId": "55500010000000", "entityType": "DISTRICT",
     "entityName": "Northlake District", "parentEntityId": "WA",
     "parentEntityType": "STATE"}
  ],
  "institutions": [
    {"entityId": "55500010001001", "entityType": "INSTITUTION",
     "entityName": "Cedar Elementary", "parentEntityId": "55500010000000",
     "parentEntityType": "DISTRICT"},
    {"entityId": "55500010001002", "entityType": "INSTITUTION",
     "entityName": "Maple Middle", "parentEntityId": "55500010000000",
     "parentEntityType": "DISTRICT"}
  ]
}
"""

CALPADS = """County-District Code^School Code^Auth CDS Code^County Name^District Name^School Name^Charter School^Charter Status^NPS School
5550001^0001001^55500010001001^Lake^Northlake District^Cedar Elementary^N^^N
5550001^0001002^55500010001002^Lake^Northlake District^Maple Middle^N^^N
"""

NORMS_CSV = """assessment_id,start_date,end_date,count,mean,standard_deviation,min_score,max_score,percentile_rank,score
TESTASMT-G6-2018,2017-08-01,2018-01-31,50000,2425.5,88.9,,,25,2365
TESTASMT-G6-2018,2017-08-01,2018-01-31,,,,,,50,2425
TESTASMT-G6-2018,2017-08-01,2018-01-31,,,,,,75,2495
TESTASMT-G6-2018,2018-02-01,2018-07-31,50000,2430.5,88.9,,,25,2370
TESTASMT-G6-2018,2018-02-01,2018-07-31,,,,,,50,2430
TESTASMT-G6-2018,2018-02-01,2018-07-31,,,,,,75,2500
"""

GROUPS_CSV = """group_name,school_natural_id,school_year,subject_code,student_ssid,group_user_login
Grade6Math,55500010001001,2018,Math,,
Grade6Math,55500010001001,2018,,,teacher1@northlake.example
Grade6Math,55500010001001,2018,,STU001,
Grade6Math,55500010001001,2018,,STU002,
Homeroom6A,55500010001001,2018,All,,
Homeroom6A,55500010001001,2018,,STU001,
"""

PACKAGE_CSV = """AssessmentId,AssessmentName,AssessmentSubject,AssessmentGrade,AssessmentType,AssessmentLabel,AssessmentVersion,AcademicYear,FullItemKey,BankKey,ItemId,ItemType,Grade,Claim,Target,DOK,MaxPoints,MathematicalPractice,CommonCore,SecondaryCommonCore,SecondaryClaimContentTarget,PtWritingType,ItemPosition,a,b0_b,b1_c,CutPoint1,ScaledLow1,ScaledHigh1,CutPoint2,ScaledLow2,ScaledHigh2,CutPoint3,ScaledLow3,ScaledHigh3,CutPoint4,ScaledLow4,ScaledHigh4
TESTASMT-G6-2018,Grade 6 Test,Math,6,SUM,G6,2.0,2018,100-1001,100,1001,MC,6,C1,T1,2,1,MP1,6.NS.1;6.NS.2,6.RP.1,C2|T9,,1,0.8,-0.5,0.1,1,2000,2379,2,2380,2489,3,2490,2599,4,2600,3000
TESTASMT-G6-2018,Grade 6 Test,Math,6,SUM,G6,2.0,2018,100-1002,100,1002,WER,6,C2,T2,3,2,MP2,6.RP.2,,,EXPL,2,1.1,0.3,0.0,1,2000,2379,2,2380,2489,3,2490,2599,4,2600,3000
"""

SUBJECT_XML = """<?xml version="1.0" encoding="UTF-8"?>
<Subject code="tsub" name="Test Subject">
  <AssessmentTypes>
    <AssessmentType code="sum" name="Summative" targetReport="true">
      <OverallScoring name="Overall" minScore="2000" maxScore="3000">
        <PerformanceLevels standardCutoff="3">
          <PerformanceLevel level="1" name="Low" color="red"/>
          <PerformanceLevel level="2" name="Near" color="orange"/>
          <PerformanceLevel level="3" name="Met" color="green"/>
          <PerformanceLevel level="4" name="Exceeded" color="blue"/>
        </PerformanceLevels>
      </OverallScoring>
      <ClaimScoring name="Claim">
        <PerformanceLevels>
          <PerformanceLevel level="1" name="Below" color="red"/>
          <PerformanceLevel level="2" name="NearAbove" color="green"/>
        </PerformanceLevels>
      </ClaimScoring>
    </AssessmentType>
  </AssessmentTypes>
  <DepthsOfKnowledge>
    <DepthOfKnowledge level="1" name="Recall"><Reference>http://example.org/dok#1</Reference></DepthOfKnowledge>
    <DepthOfKnowledge level="2" name="Skill"><Reference>http://example.org/dok#2</Reference></DepthOfKnowledge>
  </DepthsOfKnowledge>
  <ItemDifficulties>
    <ItemDifficulty gradeCode="06" moderateLowEnd="-0.5" difficultLowEnd="0.9"/>
  </ItemDifficulties>
  <Messages>
    <Message key="standard-description">Standards column help text</Message>
    <Message key="trait.category.ORG.name">Organization / Purpose</Message>
  </Messages>
  <Traits>
    <Trait code="TSUB_EXPL_ORG" purpose="EXPL" category="ORG" maxScore="4"/>
    <Trait code="TSUB_EXPL_CON" purpose="EXPL" category="CON" maxScore="2"/>
  </Traits>
  <Claims>
    <Claim code="C1" name="Concepts" scorable="true" displayOrder="1">
      <Description>Concepts and Procedures</Description>
      <Targets>
        <Target code="T1" name="A">
          <Description>Apply concepts</Description>
        </Target>
        <Target code="T9" name="B"/>
      </Targets>
    </Claim>
    <Claim code="C2" name="Problem Solving" scorable="false">
      <Targets>
        <Target code="T2" name="C"/>
      </Targets>
    </Claim>
  </Claims>
  <Standards>
    <Standard code="6.NS.1">
      <Description>Interpret and compute quotients of fractions</Description>
    </Standard>
    <Standard code="6.RP.2"/>
  </Standards>
</Subject>
"""

ACCOMMODATIONS_XML = """<?xml version="1.0" encoding="utf-8"?>
<Accessibility>
  <MasterResourceFamily>
    <SingleSelectResource>
      <Code>ColorContrast</Code>
      <ResourceType>Accommodation</ResourceType>
      <Text><Language>eng</Language><Label>Color Contrast</Label></Text>
      <Text><Language>spa</Language><Label>Contraste de color</Label></Text>
      <Selection>
        <Code>TDS_CC0</Code>
        <Text><Language>eng</Language><Label>Black on White</Label></Text>
      </Selection>
      <Selection>
        <Code>TDS_CCInvert</Code>
        <Text><Language>eng</Language><Label>Reverse Contrast</Label></Text>
        <Text><Language>spa</Language><Label>Contraste inverso</Label></Text>
      </Selection>
    </SingleSelectResource>
  </MasterResourceFamily>
</Accessibility>
"""


def make_trt(
    opp_id="OPP-1", ssid="STU001", school="55500010001001",
    asmt="TESTASMT-G6-2018", score=2500.0, completed="2018-04-12T10:30:00",
    include_items=True, drop_school=False, perf_level=None, wer_item=False,
) -> bytes:
    school_rel = (
        "" if drop_school else
        f'<ExamineeRelationship context="FINAL" name="SchoolId" value="{school}"/>'
    )
    perf = (
        f'<Score measureOf="Overall" measureLabel="PerformanceLevel" value="{perf_level}"/>'
        if perf_level else ""
    )
    items = (
        """
        <Item position="1" bankKey="100" key="1001" score="1" scoreStatus="SCORED" format="MC">
          <Response>B</Response>
        </Item>
        <Item position="2" bankKey="100" key="1002" score="0.5" scoreStatus="SCORED" format="SA">
          <Response>partial answer</Response>
        </Item>
        """ if include_items else ""
    )
    if wer_item:
        # a WER (writing extended-response) item whose ScoreInfo carries
        # per-trait sub-scores (A11; trait defs deploy/ELA_subject.xml:863-880)
        items += """
        <Item position="3" bankKey="100" key="1002" scoreStatus="SCORED" format="WER">
          <ScoreInfo maxScore="6" scorePoint="4" scoreDimension="overall" scoreStatus="Scored">
            <SubScoreList>
              <ScoreInfo scoreDimension="ORG" scorePoint="3" maxScore="4" scoreStatus="Scored"/>
              <ScoreInfo scoreDimension="CON" scorePoint="1" maxScore="2" scoreStatus="Scored" conditionCode=""/>
            </SubScoreList>
          </ScoreInfo>
          <Response>essay text</Response>
        </Item>
        """
    return f"""<TDSReport>
  <Test name="{asmt}" subject="Math" grade="06" assessmentType="SUM"
        academicYear="2018" assessmentVersion="2.0"/>
  <Examinee key="9001">
    <ExamineeAttribute context="FINAL" name="StudentIdentifier" value="{ssid}"/>
    <ExamineeAttribute context="FINAL" name="FirstName" value="Jordan"/>
    <ExamineeAttribute context="FINAL" name="LastOrSurname" value="Kim"/>
    <ExamineeAttribute context="FINAL" name="Birthdate" value="2006-03-14"/>
    <ExamineeAttribute context="FINAL" name="Sex" value="Female"/>
    <ExamineeAttribute context="FINAL" name="GradeLevelWhenAssessed" value="06"/>
    <ExamineeAttribute context="FINAL" name="IDEAIndicator" value="No"/>
    <ExamineeAttribute context="FINAL" name="EconomicDisadvantageStatus" value="Yes"/>
    <ExamineeAttribute context="FINAL" name="Ethnicity" value="Asian"/>
    <ExamineeAttribute context="FINAL" name="Ethnicity" value="White"/>
    {school_rel}
  </Examinee>
  <Opportunity oppId="{opp_id}" opportunity="1" sessionId="SES-9"
               completeness="Complete" administrationCondition="Valid"
               dateCompleted="{completed}">
    <Score measureOf="Overall" measureLabel="ScaleScore" value="{score}" standardError="21.5"/>
    {perf}
    <Score measureOf="C1" measureLabel="ScaleScore" value="{score - 30}" standardError="30.0"/>
    <Score measureOf="C2" measureLabel="ScaleScore" value="{score + 10}" standardError="28.0"/>
    {items}
    <Accommodation type="ColorContrast" code="TDS_CCInvert" segment="0"/>
  </Opportunity>
</TDSReport>""".encode()


class TestOrgSources:
    def test_org_json(self, spark):
        out = parse_org_json(spark, ORG_JSON)
        d = out["district"].collect()
        assert len(d) == 1 and d[0]["name"] == "Northlake District"
        s = {r["natural_id"]: r for r in out["school"].collect()}
        assert len(s) == 2
        assert s["55500010001001"]["district_natural_id"] == "55500010000000"

    def test_org_calpads(self, spark):
        out = parse_org_calpads(spark, CALPADS)
        assert out["district"].count() == 1
        schools = {r["natural_id"] for r in out["school"].collect()}
        assert schools == {"55500010001001", "55500010001002"}


class TestNorms:
    def test_identity_rank_split(self, spark):
        out = parse_norms(spark, read_norms_csv(spark, NORMS_CSV),
                          default_min_score=2000, default_max_score=3000)
        ident = out["percentile"].orderBy("start_date").collect()
        assert len(ident) == 2
        assert ident[0]["count"] == 50000 and ident[0]["mean"] == 2425.5
        assert ident[0]["min_score"] == 2000.0  # config default applied
        assert out["percentile_score"].count() == 6
        assert out["errors"].count() == 0

    def test_validation_errors(self, spark):
        bad = NORMS_CSV.strip().splitlines()
        too_few = "\n".join(bad[:3])  # only 2 rank rows for table 1
        out = parse_norms(spark, read_norms_csv(spark, too_few))
        errs = [r["error"] for r in out["errors"].collect()]
        assert any("fewer than 3 rank rows" in e for e in errs)
        # overlapping windows for the same assessment
        overlap = NORMS_CSV.replace("2018-02-01", "2018-01-15")
        out = parse_norms(spark, read_norms_csv(spark, overlap))
        errs = [r["error"] for r in out["errors"].collect()]
        assert any("overlapping" in e for e in errs)


class TestGroups:
    def _dims(self, spark):
        school = spark.createDataFrame(
            [Row(id=11, natural_id="55500010001001")])
        student = spark.createDataFrame(
            [Row(id=21, ssid="STU001"), Row(id=22, ssid="STU002")])
        return school, student

    def test_header_validation(self, spark):
        with pytest.raises(ValueError, match="invalid group CSV header"):
            read_groups_csv(spark, "wrong,header\n1,2\n")

    def test_parse_and_export_roundtrip(self, spark):
        school, student = self._dims(spark)
        out = parse_groups(read_groups_csv(spark, GROUPS_CSV), school, student)
        groups = {r["name"]: r for r in out["student_group"].collect()}
        assert set(groups) == {"Grade6Math", "Homeroom6A"}
        assert groups["Grade6Math"]["subject_code"] == "Math"
        assert out["student_group_membership"].count() == 3
        assert out["user_student_group"].count() == 1
        assert out["errors"].count() == 0

        csv_back = export_groups_csv(
            out["student_group"], school.withColumn("name", F.lit("x")),
            student, out["student_group_membership"], out["user_student_group"],
        ).collect()
        assert len(csv_back) == 4  # 3 members + 1 user
        assert csv_back[0]["group_name"] == "Grade6Math"  # deterministic order

    def test_unknown_school_and_student(self, spark):
        school, student = self._dims(spark)
        csv = GROUPS_CSV + "Ghost,99999999999999,2018,,,u@example.com\n"
        csv = csv + "Grade6Math,55500010001001,2018,,STU404,\n"
        out = parse_groups(read_groups_csv(spark, csv), school, student)
        errs = " ".join(r["error"] for r in out["errors"].collect())
        assert "unknown school 99999999999999" in errs
        assert "unknown student STU404" in errs


class TestPackage:
    def test_parse(self, spark):
        out = parse_package(read_package_csv(spark, PACKAGE_CSV))
        asmt = out["asmt"].collect()
        assert len(asmt) == 1
        a = asmt[0]
        assert a["natural_id"] == "TESTASMT-G6-2018"
        assert a["type_code"] == "sum" and a["school_year"] == 2018
        assert a["cut_point_1"] == 2380.0 and a["cut_point_3"] == 2600.0
        assert a["min_score"] == 2000.0 and a["max_score"] == 3000.0
        items = out["item"].orderBy("position").collect()
        assert len(items) == 2
        assert items[0]["key"] == "100-1001" and items[0]["dok_level"] == 2
        assert items[1]["irt_a"] == 1.1
        assert items[1]["pt_writing_type"] == "EXPL"

    def test_item_children(self, spark):
        """item_common_core_standard / item_other_target
        (docs/Runbook.ImportMigrate.md:16): multi-standard cells split,
        secondary standards flagged, claim|target pairs parsed."""
        out = parse_package(read_package_csv(spark, PACKAGE_CSV))
        ccs = {(r["item_key"], r["natural_id"]): r["secondary"]
               for r in out["item_common_core_standard"].collect()}
        assert ccs[("100-1001", "6.NS.1")] is False
        assert ccs[("100-1001", "6.NS.2")] is False   # split from the same cell
        assert ccs[("100-1001", "6.RP.1")] is True    # SecondaryCommonCore
        assert ccs[("100-1002", "6.RP.2")] is False
        ot = out["item_other_target"].collect()
        assert len(ot) == 1
        assert (ot[0]["item_key"], ot[0]["claim_code"], ot[0]["target_code"]) == (
            "100-1001", "C2", "T9")

    def test_asmt_score_child(self, spark):
        """asmt_score (docs/Runbook.ImportMigrate.md:16): the cut points as
        a normalized child — one row per performance-level boundary with
        (cut_point rank, score), matching the flattened cut_point_1..3
        (cut 4 is absent in TestPackage-shaped exports)."""
        out = parse_package(read_package_csv(spark, PACKAGE_CSV))
        rows = {r["cut_point"]: r["score"]
                for r in out["asmt_score"].collect()}
        assert rows == {1: 2380.0, 2: 2490.0, 3: 2600.0}

    def test_simple_variant_without_standards_columns(self, spark):
        """Simple tabulator exports omit the standards columns entirely
        (tools/TestPackage.Simple.csv) — children parse as empty, not error."""
        cols = [c for c in PACKAGE_CSV.splitlines()[0].split(",")
                if c not in ("SecondaryCommonCore", "SecondaryClaimContentTarget",
                             "PtWritingType")]
        keep = [PACKAGE_CSV.splitlines()[0].split(",").index(c) for c in cols]
        lines = [",".join(ln.split(",")[i] for i in keep)
                 for ln in PACKAGE_CSV.strip().splitlines()]
        out = parse_package(read_package_csv(spark, "\n".join(lines) + "\n"))
        assert out["item"].count() == 2
        assert out["item_other_target"].count() == 0


class TestSubjectXml:
    def test_parse(self, spark):
        out = parse_subject_xml(spark, SUBJECT_XML)
        assert out["subject"].collect()[0]["code"] == "tsub"
        sat = out["subject_asmt_type"].collect()[0]
        assert sat["standard_cutoff"] == 3 and sat["performance_level_count"] == 4
        assert sat["min_score"] == 2000.0 and sat["target_report"] is True
        levels = out["subject_performance_level"]
        assert levels.filter("scoring = 'overall'").count() == 4
        assert levels.filter("scoring = 'claim'").count() == 2
        assert out["depth_of_knowledge"].count() == 2
        idc = out["item_difficulty_cuts"].collect()[0]
        assert idc["grade_code"] == "06" and idc["difficult_low_end"] == 0.9

    def test_child_dims(self, spark):
        """SUBJECT child dims (docs/Runbook.ImportMigrate.md:20): claim,
        target, common_core_standard, subject_score traits, translations."""
        out = parse_subject_xml(spark, SUBJECT_XML)
        claims = {r["code"]: r for r in out["claim"].collect()}
        assert set(claims) == {"C1", "C2"}
        assert claims["C1"]["name"] == "Concepts"
        assert claims["C1"]["description"].startswith("Concepts and")
        assert claims["C1"]["scorable"] is True and claims["C1"]["display_order"] == 1
        assert claims["C2"]["scorable"] is False
        targets = {r["natural_id"]: r for r in out["target"].collect()}
        assert set(targets) == {"T1", "T9", "T2"}
        assert targets["T1"]["claim_code"] == "C1"
        assert targets["T1"]["description"] == "Apply concepts"
        assert targets["T2"]["claim_code"] == "C2"
        stds = {r["natural_id"]: r["description"]
                for r in out["common_core_standard"].collect()}
        assert stds["6.NS.1"].startswith("Interpret")
        assert stds["6.RP.2"] is None
        traits = {r["code"]: r for r in out["subject_score"].collect()}
        assert traits["TSUB_EXPL_ORG"]["category"] == "ORG"
        assert traits["TSUB_EXPL_ORG"]["max_score"] == 4
        msgs = {r["label_code"]: r for r in out["subject_translation"].collect()}
        assert msgs["trait.category.ORG.name"]["value"] == "Organization / Purpose"
        assert msgs["standard-description"]["language_code"] == "en"


class TestAccommodations:
    def test_parse(self, spark):
        out = parse_accommodations_xml(spark, ACCOMMODATIONS_XML)
        codes = {r["code"]: r["name"] for r in out["accommodation"].collect()}
        assert codes["ColorContrast"] == "Color Contrast"
        assert codes["TDS_CCInvert"] == "Reverse Contrast"
        tr = {(r["code"], r["language_code"]): r["label"]
              for r in out["accommodation_translation"].collect()}
        assert tr[("ColorContrast", "spa")] == "Contraste de color"
        assert tr[("TDS_CCInvert", "spa")] == "Contraste inverso"


class TestTrt:
    def _parse(self, spark, *payloads, required=None):
        df = spark.createDataFrame(
            [(i + 1, p.decode()) for i, p in enumerate(payloads)],
            "import_id long, payload string",
        )
        return parse_trt(df, required=required)

    def test_full_document(self, spark):
        row = self._parse(spark, make_trt()).collect()[0]
        assert row["asmt_natural_id"] == "TESTASMT-G6-2018"
        assert row["type_code"] == "sum" and row["school_year"] == 2018
        assert row["ssid"] == "STU001" and row["gender"] == "Female"
        assert row["school_natural_id"] == "55500010001001"
        assert row["iep"] is False and row["economic_disadvantage"] is True
        assert sorted(row["ethnicities"]) == ["Asian", "White"]
        assert row["opp_id"] == "OPP-1" and row["completeness"] == "Complete"
        assert row["scale_score"] == 2500.0 and row["scale_score_std_err"] == 21.5
        assert len(row["claim_scores"]) == 2
        assert row["claim_scores"][0]["claim_code"] == "C1"
        assert len(row["items"]) == 2 and row["items"][1]["score"] == 0.5
        assert row["accommodations"] == ["TDS_CCInvert"]
        assert row["errors"] is None

    def test_missing_required_and_malformed(self, spark):
        rows = self._parse(
            spark, make_trt(drop_school=True), b"<TDSReport><unclosed>",
        ).orderBy("import_id").collect()
        assert any("school_natural_id" in e for e in rows[0]["errors"])
        assert any("malformed XML" in e for e in rows[1]["errors"])

    def test_configurable_required(self, spark):
        # F5: with SchoolId removed from the required list the same doc parses clean
        req = [f for f in DEFAULT_REQUIRED if f != "school_natural_id"]
        row = self._parse(spark, make_trt(drop_school=True), required=req).collect()[0]
        assert row["errors"] is None

    def test_normalize_children(self, spark):
        parsed = self._parse(spark, make_trt(), make_trt(opp_id="OPP-2", ssid="STU002"))
        out = normalize_children(parsed)
        assert out["exam_item"].count() == 4
        assert out["exam_score"].count() == 4
        assert out["exam_available_accommodation"].count() == 2
        assert out["student_ethnicity"].count() == 4


ORG_JSON_GROUPS = """
[
  {"entityId": "GOD-1", "entityType": "GROUPOFDISTRICTS",
   "entityName": "North Region", "parentEntityId": "WA",
   "parentEntityType": "STATE"},
  {"entityId": "55500010000000", "entityType": "DISTRICT",
   "entityName": "Northlake District", "parentEntityId": "GOD-1",
   "parentEntityType": "GROUPOFDISTRICTS"},
  {"entityId": "GOI-1", "entityType": "GROUPOFINSTITUTIONS",
   "entityName": "Lakeside Schools", "parentEntityId": "55500010000000",
   "parentEntityType": "DISTRICT"},
  {"entityId": "55500010001001", "entityType": "INSTITUTION",
   "entityName": "Cedar Elementary", "parentEntityId": "GOI-1",
   "parentEntityType": "GROUPOFINSTITUTIONS"},
  {"entityId": "55500010001002", "entityType": "INSTITUTION",
   "entityName": "Maple Middle", "parentEntityId": "55500010000000",
   "parentEntityType": "DISTRICT"}
]
"""


class TestOrgGroups:
    def test_hierarchy_with_groups(self, spark):
        """The full ART hierarchy (docs/API.md:452-569): state → district
        group → district → school group → school; a school parented by a
        group resolves its district THROUGH the group."""
        out = parse_org_json(spark, ORG_JSON_GROUPS)
        dg = out["district_group"].collect()
        assert len(dg) == 1 and dg[0]["natural_id"] == "GOD-1"
        d = out["district"].collect()
        assert len(d) == 1
        assert d[0]["district_group_natural_id"] == "GOD-1"
        sg = out["school_group"].collect()
        assert len(sg) == 1
        assert (sg[0]["natural_id"], sg[0]["district_natural_id"]) == (
            "GOI-1", "55500010000000")
        schools = {r["natural_id"]: r for r in out["school"].collect()}
        assert schools["55500010001001"]["district_natural_id"] == "55500010000000"
        assert schools["55500010001001"]["school_group_natural_id"] == "GOI-1"
        assert schools["55500010001002"]["school_group_natural_id"] is None

    def test_ingest_lands_all_four_tables(self, spark, tmp_path):
        from rdw_spark.sources.dim_ingest import ingest_organizations
        from rdw_spark.warehouse import ImportLog, TableStore

        wh = TableStore(str(tmp_path / "wh"), audit_enabled=False)
        log = ImportLog(wh, archive_root=None)
        res = ingest_organizations(spark, wh, log, ORG_JSON_GROUPS.encode())
        assert res["status"] == "PROCESSED"
        assert wh.read(spark, "district_group").count() == 1
        assert wh.read(spark, "school_group").count() == 1
        d = wh.read(spark, "district").collect()[0]
        dg = wh.read(spark, "district_group").collect()[0]
        assert d["district_group_id"] == dg["id"]
        sg = wh.read(spark, "school_group").collect()[0]
        assert sg["district_id"] == d["id"]
        schools = {r["natural_id"]: r for r in wh.read(spark, "school").collect()}
        assert schools["55500010001001"]["district_id"] == d["id"]
        assert schools["55500010001001"]["school_group_id"] == sg["id"]
        assert schools["55500010001002"]["school_group_id"] is None

        from rdw_spark.plans.rdw_reports import org_hierarchy
        flat = org_hierarchy(
            wh.read(spark, "school"), wh.read(spark, "district"),
            wh.read(spark, "school_group"), wh.read(spark, "district_group"),
        )
        rows = {r["school_natural_id"]: r for r in flat.collect()}
        assert rows["55500010001001"]["school_group_name"] == "Lakeside Schools"
        assert rows["55500010001001"]["district_group_name"] == "North Region"
        assert rows["55500010001002"]["school_group_name"] is None


class TestTrtTraitScores:
    def test_wer_subscores_parse(self, spark):
        from rdw_spark.sources.trt import parse_trt

        payload = make_trt(include_items=False, wer_item=True).decode("utf-8")
        df = spark.createDataFrame([(1, payload)], "import_id long, payload string")
        row = parse_trt(df).collect()[0]
        items = row["items"]
        assert len(items) == 1
        it = items[0]
        assert it["score"] == 4.0  # falls back to ScoreInfo@scorePoint
        traits = {t["category"]: t for t in it["trait_scores"]}
        assert traits["ORG"]["score"] == 3.0 and traits["ORG"]["max_score"] == 4.0
        assert traits["CON"]["score"] == 1.0


class TestValidatorCli:
    """The standalone validator (tools/README.md:55-68 analog): same rules
    the loaders enforce, pure Python, row/element-level messages."""

    def test_subject_xml_valid_and_invalid(self):
        from rdw_spark.sources.validator import validate_subject_xml

        assert validate_subject_xml(SUBJECT_XML) == []
        # parse error reported as a finding, not raised
        parse_errs = validate_subject_xml(b"<oops")
        assert len(parse_errs) == 1 and parse_errs[0].startswith("not well-formed")
        bad = SUBJECT_XML.replace(
            'minScore="2000"', 'minScore="abc"'
        ).replace('level="1"', 'level="x"', 1)
        errs = validate_subject_xml(bad)
        assert any("minScore" in e for e in errs)
        assert any("level" in e for e in errs)
        # the loader float()s ItemDifficulty attrs unconditionally — the
        # validator must catch both bad values and missing attributes
        bad2 = SUBJECT_XML.replace('moderateLowEnd="', 'moderateLowEnd="x', 1)
        assert any("moderateLowEnd" in e for e in validate_subject_xml(bad2))
        bad3 = SUBJECT_XML.replace(' difficultLowEnd="0.9"', "", 1)
        assert any("difficultLowEnd" in e for e in validate_subject_xml(bad3))

    def test_package_csv_valid_and_invalid(self):
        from rdw_spark.sources.validator import validate_package_csv

        assert validate_package_csv(PACKAGE_CSV) == []
        # header damage fails the whole file
        errs = validate_package_csv(PACKAGE_CSV.replace("AssessmentId", "AsmtId", 1))
        assert errs and "missing required column" in errs[0]
        # row damage is reported per line
        bad = PACKAGE_CSV.replace("2018", "20x8")
        errs = validate_package_csv(bad)
        assert any("AcademicYear" in e for e in errs)

    def test_reference_sample_package_header_compatible(self):
        # tools/TestPackage.csv is a header-only sample: every required
        # column must resolve (the only finding is the absence of rows)
        from rdw_spark.sources.validator import validate_package_csv

        with open("/root/reference/tools/TestPackage.csv", encoding="utf-8") as fh:
            assert validate_package_csv(fh.read()) == ["no data rows"]

    def test_cli_exit_codes(self, tmp_path):
        import subprocess
        import sys

        good = tmp_path / "good.csv"
        good.write_text(PACKAGE_CSV)
        bad = tmp_path / "bad.csv"
        bad.write_text(PACKAGE_CSV.replace("AssessmentId", "X", 1))
        r = subprocess.run(
            [sys.executable, "scripts/validate.py", "-t", str(good)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0 and "OK" in r.stdout
        r = subprocess.run(
            [sys.executable, "scripts/validate.py", "-t", str(good), "-t", str(bad)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 1 and "INVALID" in r.stdout


class TestDocSource:
    def _write(self, tmp_path, name, lines):
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_jsonl_accept_reject_split(self, spark, tmp_path):
        from rdw_spark.sources import docsource as DS

        path = self._write(tmp_path, "docs.jsonl", [
            '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
            '{"doc_id": 2, "text": "", "lang": "en", "source": "web"}',
            '{"doc_id": null, "text": "orphan text"}',
            'this is not json at all {',
            '{"doc_id": 5, "text": "second good row"}',
        ])
        out = DS.read_documents_jsonl(spark, path)
        docs = {r["doc_id"]: r for r in out["docs"].collect()}
        assert set(docs) == {1, 5}
        assert docs[1]["lang"] == "en"
        rejects = {r["reject_reason"] for r in out["rejects"].collect()}
        assert rejects == {"malformed", "empty_text", "null_id"}
        # the raw malformed line is preserved for replay
        raw = [r["_corrupt_record"] for r in out["rejects"].collect()
               if r["reject_reason"] == "malformed"]
        assert raw == ["this is not json at all {"]

    def test_jsonl_gz_and_derived_ids(self, spark, tmp_path):
        import gzip

        from rdw_spark.sources import docsource as DS

        p = tmp_path / "shard-00000.jsonl.gz"
        with gzip.open(p, "wt") as f:
            f.write('{"text": "alpha beta"}\n{"text": "gamma delta"}\n'
                    '{"text": "alpha beta"}\n')
        out = DS.read_documents_jsonl(spark, str(p), derive_ids=True)
        rows = out["docs"].select("doc_id", "text").collect()
        # fully-identical rows collapse to one document at read time
        assert sorted(r["text"] for r in rows) == ["alpha beta", "gamma delta"]
        assert len({r["doc_id"] for r in rows}) == 2
        assert out["rejects"].count() == 0

    def test_csv_accept_reject_split(self, spark, tmp_path):
        from rdw_spark.sources import docsource as DS

        path = self._write(tmp_path, "docs.csv", [
            "doc_id,text,lang,source",
            "1,first doc,en,web",
            "2,,en,web",
            "not_a_number,bad id row,en,web",
        ])
        out = DS.read_documents_csv(spark, path)
        assert [r["doc_id"] for r in out["docs"].collect()] == [1]
        reasons = sorted(r["reject_reason"] for r in out["rejects"].collect())
        assert reasons == ["empty_text", "malformed"]

    def test_jsonl_feeds_the_corpus_pipeline(self, spark, tmp_path):
        from rdw_spark.operators import dedup as D
        from rdw_spark.sources import docsource as DS

        path = self._write(tmp_path, "pipe.jsonl", [
            '{"text": "one two three four"}',
            '{"text": "one two three four"}',
            '{"text": "five six seven eight"}',
        ])
        docs = DS.read_documents_jsonl(spark, path, derive_ids=True)["docs"]
        assert D.dedup_exact(docs).count() == 2


def test_write_documents_jsonl_roundtrip_and_shard_layout(spark, tmp_path):
    """The JSONL write twin: n_shards mode produces exactly N files that
    read back losslessly through read_documents_jsonl (zero rejects);
    shard_col mode writes shard=K/ directories with one file each,
    matching the deterministic training-shard layout."""
    import glob
    import os

    from pyspark.sql import functions as F

    from rdw_spark.sources.docsource import (
        read_documents_jsonl, write_documents_jsonl,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} body text", "en", f"s{i % 2}")
         for i in range(40)],
        "doc_id long, text string, lang string, source string",
    )
    out = str(tmp_path / "export")
    write_documents_jsonl(docs, out, n_shards=4)
    files = glob.glob(os.path.join(out, "part-*.json"))
    assert len(files) == 4
    back = read_documents_jsonl(spark, out + "/*.json")
    assert back["rejects"].count() == 0
    assert back["docs"].count() == 40
    assert ({r["doc_id"] for r in back["docs"].collect()}
            == {i for i in range(40)})

    # shard_col mode: the assign_shards layout carries into the export
    sharded = docs.withColumn("shard", F.col("doc_id") % 3)
    out2 = str(tmp_path / "export2")
    write_documents_jsonl(sharded, out2, shard_col="shard")
    dirs = sorted(os.path.basename(d)
                  for d in glob.glob(os.path.join(out2, "shard=*")))
    assert dirs == ["shard=0", "shard=1", "shard=2"]
    for d in glob.glob(os.path.join(out2, "shard=*")):
        assert len(glob.glob(os.path.join(d, "part-*.json"))) == 1

    # gzip export: codec picked up, suffix advertises unsplittability
    out3 = str(tmp_path / "export3")
    write_documents_jsonl(docs, out3, n_shards=2, compression="gzip")
    assert len(glob.glob(os.path.join(out3, "part-*.json.gz"))) == 2

    import pytest

    with pytest.raises(ValueError):
        write_documents_jsonl(sharded, out2, n_shards=2, shard_col="shard")


def test_stagestore_gc_keeps_current_and_latest(spark, tmp_path):
    """StageStore.gc removes stale config namespaces but never the
    current one, and keep_latest retains the N-1 freshest others."""
    import os
    import time

    from rdw_spark.plans.stagestore import StageStore

    root = str(tmp_path / "ck")
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    old1 = StageStore(spark, root, {"v": 1})
    old1.save("s", {"kept": df})
    time.sleep(0.05)
    old2 = StageStore(spark, root, {"v": 2})
    old2.save("s", {"kept": df})
    time.sleep(0.05)
    cur = StageStore(spark, root, {"v": 3})
    cur.save("s", {"kept": df})

    removed = cur.gc(keep_latest=2)  # keep current + freshest other
    assert removed == [old1.fingerprint]
    assert sorted(os.listdir(root)) == sorted(
        [old2.fingerprint, cur.fingerprint])
    assert cur.has("s") and cur.load("s", ["kept"])["kept"].count() == 1

    assert cur.gc(keep_latest=1) == [old2.fingerprint]
    assert os.listdir(root) == [cur.fingerprint]


class TestPercentileLookup:
    def test_lookup_picks_covering_table_and_band(self, spark):
        """Exams map to the norms table covering their completed date and
        to the highest rank row with score <= scale score; below-floor
        scores and uncovered dates stay NULL (docs/Norms.md:12-37)."""
        import datetime as dt

        from rdw_spark.sources.norms import (
            parse_norms, percentile_lookup, read_norms_csv,
        )

        out = parse_norms(spark, read_norms_csv(spark, NORMS_CSV),
                          default_min_score=2000.0, default_max_score=3000.0)
        d = dt.date
        exams = spark.createDataFrame(
            [
                (1, "TESTASMT-G6-2018", d(2017, 9, 15), 2425.0),  # T1: ==50-floor
                (2, "TESTASMT-G6-2018", d(2017, 9, 15), 2424.0),  # T1: band 25
                (3, "TESTASMT-G6-2018", d(2018, 4, 1), 2600.0),   # T2: band 75
                (4, "TESTASMT-G6-2018", d(2018, 4, 1), 2300.0),   # below floor
                (5, "TESTASMT-G6-2018", d(2019, 1, 1), 2500.0),   # no table
                (6, "OTHER-ASMT", d(2017, 9, 15), 2500.0),        # unknown asmt
            ],
            "exam_id long, assessment_id string, completed_date date, scale_score double",
        )
        got = {r.exam_id: r.national_percentile
               for r in percentile_lookup(
                   exams, out["percentile"], out["percentile_score"]).collect()}
        assert got == {1: 50, 2: 25, 3: 75, 4: None, 5: None, 6: None}

    def test_lookup_is_broadcast_no_fact_shuffle(self, spark):
        """Scale gate: norms broadcast; the exam side never shuffles."""
        import contextlib
        import datetime as dt
        import io

        from rdw_spark.sources.norms import (
            parse_norms, percentile_lookup, read_norms_csv,
        )

        out = parse_norms(spark, read_norms_csv(spark, NORMS_CSV))
        exams = spark.createDataFrame(
            [(1, "TESTASMT-G6-2018", dt.date(2017, 9, 15), 2425.0)],
            "exam_id long, assessment_id string, completed_date date, scale_score double",
        )
        df = percentile_lookup(exams, out["percentile"], out["percentile_score"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_with_percentile_rank_delegates_to_lookup(self, spark):
        """functions.scoring.with_percentile_rank is the reporting-surface
        wrapper over the canonical array-fold plan: same band semantics
        (highest rank-row floor <= score), natural-id resolution via the
        asmt dim, timestamps coerced to dates, and the never-shuffle-the-
        fact plan shape (broadcast only, no SortMergeJoin)."""
        import contextlib
        import datetime as dt
        import io

        from rdw_spark.functions.scoring import with_percentile_rank
        from rdw_spark.sources.norms import parse_norms, read_norms_csv

        out = parse_norms(spark, read_norms_csv(spark, NORMS_CSV),
                          default_min_score=2000.0, default_max_score=3000.0)
        ts = dt.datetime
        exam = spark.createDataFrame(
            [
                (1, 10, ts(2017, 9, 15, 11, 30), 2425.0),  # ==50-floor
                (2, 10, ts(2018, 4, 1, 8, 0), 2300.0),     # below floor
                (3, 10, ts(2019, 1, 1, 0, 0), 2500.0),     # no covering table
                (4, 99, ts(2017, 9, 15, 0, 0), 2500.0),    # unknown asmt
            ],
            "id long, asmt_id long, completed_at timestamp, scale_score double",
        )
        asmt = spark.createDataFrame(
            [(10, "TESTASMT-G6-2018"), (99, "OTHER-ASMT")],
            "id long, natural_id string",
        )
        df = with_percentile_rank(
            exam, out["percentile"], out["percentile_score"], asmt=asmt)
        got = {r.id: r.percentile_rank for r in df.collect()}
        assert got == {1: 50, 2: None, 3: None, 4: None}
        # delegation keeps the exam columns and adds exactly percentile_rank
        assert set(df.columns) == {
            "id", "asmt_id", "completed_at", "scale_score",
            "assessment_id", "percentile_rank"}
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
