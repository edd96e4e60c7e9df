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


def test_psi_known_distributions(spark):
    """PSI against a hand-computed model: identical distributions give
    ~0, a hard shift gives a large value, empty bins hit the eps floor,
    and the folded total equals the sum of terms."""
    import math

    from rdw_spark.operators.diff import population_stability_index

    base = spark.createDataFrame(
        [(float(v),) for v in ([5.0] * 50 + [15.0] * 30 + [25.0] * 20)],
        "v double")
    cuts = [10.0, 20.0]

    same = population_stability_index(base, base, "v", cuts).collect()
    assert all(abs(r["psi"]) < 1e-12 for r in same)

    shifted = spark.createDataFrame(
        [(float(v),) for v in ([5.0] * 10 + [15.0] * 30 + [25.0] * 60)],
        "v double")
    rows = {r["bin"]: r for r in
            population_stability_index(base, shifted, "v", cuts).collect()}
    # hand model
    pe, pa = [0.5, 0.3, 0.2], [0.1, 0.3, 0.6]
    want = sum((a - e) * math.log(a / e) for e, a in zip(pe, pa))
    assert abs(rows[0]["psi"] - want) < 1e-12
    assert rows[0]["n_expected"] == 50 and rows[0]["n_actual"] == 10
    assert abs(sum(r["psi_term"] for r in rows.values()) - want) < 1e-12
    assert rows[0]["lo"] == float("-inf") and rows[2]["hi"] == float("inf")

    # a bin empty on one side floors at eps instead of blowing up
    empty_side = spark.createDataFrame(
        [(5.0,)] * 10, "v double")
    r2 = population_stability_index(base, empty_side, "v", cuts).collect()
    assert all(math.isfinite(r["psi"]) for r in r2)
    assert {r["bin"] for r in r2} == {0, 1, 2}

    import pytest

    with pytest.raises(ValueError, match="ascending"):
        population_stability_index(base, base, "v", [20.0, 10.0])
