"""fuzzy_join (FastSS symmetric-delete edit-distance join) must equal the
brute-force cross join exactly — the blocking is guaranteed-complete, so
this is an equivalence test, not a recall test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdw_spark.operators.joins import fuzzy_join

ROWS = [
    (1, "martha"),
    (2, "marhta"),      # dist 2 from martha (transposition = 2 edits)
    (3, "marta"),       # dist 1 from martha, 2 from marhta
    (4, "smith"),
    (5, "smyth"),       # dist 1 from smith
    (6, "smithe"),      # dist 1 from smith, 2 from smyth
    (7, "x"),
    (8, ""),            # empty string edge case: dist 1 from "x"
    (9, "completely-different"),
    (10, "smith"),      # exact duplicate of 4
]


def _brute(spark, max_dist, self_mode=True):
    df = spark.createDataFrame(ROWS, "id long, name string")
    a = df.select(F.col("id").alias("la"), F.col("name").alias("va"))
    b = df.select(F.col("id").alias("lb"), F.col("name").alias("vb"))
    out = (
        a.crossJoin(b)
        .filter(F.col("la") < F.col("lb") if self_mode else F.lit(True))
        .withColumn("d", F.levenshtein("va", "vb"))
        .filter(F.col("d") <= max_dist)
    )
    return {(r.la, r.lb, r.d) for r in out.collect()}


@pytest.mark.parametrize("k", [1, 2])
def test_self_mode_matches_brute_force(spark, k):
    df = spark.createDataFrame(ROWS, "id long, name string")
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in fuzzy_join(df, None, "name", left_id_col="id", max_dist=k).collect()
    }
    assert got == _brute(spark, k)


def test_two_table_mode_matches_brute_force(spark):
    df = spark.createDataFrame(ROWS, "id long, name string")
    probes = spark.createDataFrame(
        [(100, "smith"), (101, "mart"), (102, "zzz")], "qid long, qname string"
    )
    got = {
        (r.left_id, r.right_id, r.dist)
        for r in fuzzy_join(
            probes, df, "qname", "name",
            left_id_col="qid", right_id_col="id", max_dist=1,
        ).collect()
    }
    exp = {
        (q.qid, r.id, lev)
        for q in probes.collect()
        for r in spark.createDataFrame(ROWS, "id long, name string").collect()
        for lev in [_py_lev(q.qname, r.name)]
        if lev <= 1
    }
    assert got == exp


def test_max_dist_cap():
    with pytest.raises(ValueError):
        fuzzy_join(None, None, "x", max_dist=3)


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
