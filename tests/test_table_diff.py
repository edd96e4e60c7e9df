"""table_diff: classification, null-safety, multi-key, validation."""

from __future__ import annotations

import pytest

from rdw_spark.operators.diff import table_diff


def test_diff_classification_and_attribution(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),        # unchanged → absent
         (2, "B", 21.0),        # both cols changed
         (3, "c", None),        # null == null → unchanged
         (5, "e", 50.0)],       # added; 4 removed
        "k long, s string, v double",
    )
    got = {r.k: (r.diff_type, r.changed_cols)
           for r in table_diff(old, new, ["k"]).collect()}
    assert got == {
        2: ("changed", "s,v"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_diff_null_vs_value_is_change(spark):
    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, 5.0)], "k long, v double")
    rows = table_diff(old, new, ["k"]).collect()
    assert rows[0].diff_type == "changed" and rows[0].changed_cols == "v"


def test_diff_compound_key_and_subset_cols(spark):
    old = spark.createDataFrame(
        [(1, 1, "x", "p"), (1, 2, "y", "q")], "a long, b long, s string, t string"
    )
    new = spark.createDataFrame(
        [(1, 1, "x", "CHANGED-BUT-EXCLUDED"), (1, 2, "z", "q")],
        "a long, b long, s string, t string",
    )
    got = {(r.a, r.b): r.diff_type
           for r in table_diff(old, new, ["a", "b"], ["s"]).collect()}
    assert got == {(1, 2): "changed"}


def test_diff_validates_inputs(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(ValueError):
        table_diff(df, df, [])
    with pytest.raises(ValueError):
        table_diff(df, df.drop("s"), ["k"], ["s"])
