"""Bucketed co-located joins: correctness vs a plain join, and the plan
gate that justifies their existence — the bucket-to-bucket join must
contain NO shuffle Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from rdw_spark.warehouse.bucketing import colocated_join, write_bucketed


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{tmp_path}/buck'")
    yield "buck"
    spark.sql("DROP DATABASE IF EXISTS buck CASCADE")


def test_colocated_join_no_shuffle_and_correct(spark, bucket_db):
    exams = spark.createDataFrame(
        [Row(exam_id=i, school_year=2015 + i % 3, scale_score=2400.0 + i)
         for i in range(200)]
    )
    scores = spark.createDataFrame(
        [Row(exam_id=i % 150, claim_code=f"C{j}", scale_score=2300.0 + i)
         for i in range(150) for j in range(2)]
    )
    write_bucketed(exams, "buck.exam_b", "exam_id", n_buckets=8,
                   sort_cols=("exam_id",))
    write_bucketed(scores, "buck.score_b", "exam_id", n_buckets=8,
                   sort_cols=("exam_id",))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "buck.exam_b", "buck.score_b", "exam_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point: same-bucket join, zero shuffle on either side
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        got = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    expect = exams.join(scores, "exam_id").count()
    assert got == expect == 300
