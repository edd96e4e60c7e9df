"""Unit tests for the as-of / interval join operator (SURVEY J8/A9,
reference docs/Norms.md:17-36 percentile assignment semantics)."""

from __future__ import annotations

from rdw_spark.operators.joins import asof_join, interval_join


def _frames(spark):
    left = spark.createDataFrame(
        [("a", 5), ("a", 15), ("a", 25), ("b", 10), ("b", 1)],
        "grp STRING, x INT",
    )
    right = spark.createDataFrame(
        [("a", 0, "a-low"), ("a", 10, "a-mid"), ("a", 20, "a-high"), ("b", 5, "b-only")],
        "grp STRING, bound INT, label STRING",
    )
    return left, right


def test_asof_union_strategy(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="x", right_on="bound", by=["grp"],
        value_cols=["label"], strategy="union",
    )
    got = {(r.grp, r.x): r.label for r in out.collect()}
    assert got == {
        ("a", 5): "a-low",
        ("a", 15): "a-mid",
        ("a", 25): "a-high",
        ("b", 10): "b-only",
        ("b", 1): None,  # no band at or below 1
    }


def test_asof_broadcast_strategy(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="x", right_on="bound", by=["grp"],
        value_cols=["label"], strategy="broadcast",
    )
    got = {(r.grp, r.x): r.label for r in out.collect()}
    assert got[("a", 15)] == "a-mid"
    assert got[("b", 1)] is None


def test_asof_inclusive_boundary(spark):
    left = spark.createDataFrame([("a", 10)], "grp STRING, x INT")
    right = spark.createDataFrame([("a", 10, "exact")], "grp STRING, bound INT, label STRING")
    out = asof_join(left, right, on="x", right_on="bound", by=["grp"],
                    value_cols=["label"], strategy="union")
    assert out.collect()[0].label == "exact"  # bound <= x is inclusive


def test_interval_join(spark):
    import datetime as dt

    exams = spark.createDataFrame(
        [(1, dt.date(2018, 3, 1)), (2, dt.date(2018, 9, 1))],
        "exam_id INT, completed DATE",
    )
    norms = spark.createDataFrame(
        [(dt.date(2018, 1, 1), dt.date(2018, 6, 30), 100)],
        "start_date DATE, end_date DATE, norm_id INT",
    )
    out = interval_join(exams, norms, "completed", "start_date", "end_date")
    got = {r.exam_id: r.norm_id for r in out.collect()}
    assert got == {1: 100, 2: None}


def test_salted_join_matches_plain_join(spark):
    from rdw_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ([1] * 4 + [2, 3])],  # key 1 hot
        "k INT, payload INT",
    )
    right = spark.createDataFrame(
        [(1, "one"), (2, "two"), (4, "four")], "k INT, name STRING"
    )
    plain = sorted(left.join(right, "k").collect())
    # full salting
    assert sorted(salted_join(left, right, "k", salt=8).collect()) == plain
    # split salting: only the hot key replicated
    assert sorted(
        salted_join(left, right, "k", salt=8, hot_keys=[1]).collect()
    ) == plain
    # left join keeps unmatched left rows exactly once
    plain_left = sorted(left.join(right, "k", "left").collect())
    assert sorted(
        salted_join(left, right, "k", how="left", salt=8, hot_keys=[1]).collect()
    ) == plain_left


def test_hot_keys_exact_heavy_hitters(spark):
    """hot_keys: exact counts/share for the top-k keys, deterministic
    rank with count-then-key ordering, stable under repartitioning."""
    from rdw_spark.operators.joins import hot_keys

    rows = ([("a",)] * 50 + [("b",)] * 30 + [("c",)] * 30 + [("d",)] * 5
            + [(k,) for k in "efghij"])
    df = spark.createDataFrame(rows, "k string")
    out = hot_keys(df, ["k"], k=3).collect()
    assert [(r["k"], r["n"], r["rank"]) for r in out] == [
        ("a", 50, 1), ("b", 30, 2), ("c", 30, 3)]  # tie b/c broken by key
    total = len(rows)
    for r in out:
        assert abs(r["share"] - r["n"] / total) < 1e-15

    again = hot_keys(df.repartition(7), ["k"], k=3).collect()
    assert [(r["k"], r["n"], r["rank"]) for r in again] == \
        [(r["k"], r["n"], r["rank"]) for r in out]


class TestBandJoin:
    def test_matches_naive_range_join_exactly(self, spark):
        from rdw_spark.operators.joins import band_join

        import numpy as np
        rng = np.random.default_rng(5)
        a = spark.createDataFrame(
            [(int(i), float(v)) for i, v in
             enumerate(rng.uniform(0, 100, 300))], "aid int, av double")
        b = spark.createDataFrame(
            [(int(i), float(v)) for i, v in
             enumerate(rng.uniform(0, 100, 300))], "bid int, bv double")
        got = sorted(map(tuple, band_join(a, b, "av", "bv", 2.5)
                         .select("aid", "bid").collect()))
        want = sorted(map(tuple, a.crossJoin(b).filter(
            "abs(av - bv) <= 2.5").select("aid", "bid").collect()))
        assert got == want  # exact, each pair once, boundary inclusive

    def test_boundary_negatives_and_nulls(self, spark):
        from rdw_spark.operators.joins import band_join

        a = spark.createDataFrame(
            [(1, -5.0), (2, 0.0), (3, None)], "aid int, av double")
        b = spark.createDataFrame(
            [(10, -7.0), (11, 2.0), (12, None)], "bid int, bv double")
        got = sorted(map(tuple, band_join(a, b, "av", "bv", 2.0)
                         .select("aid", "bid").collect()))
        # |-5 - -7| = 2 (boundary, kept), |0 - 2| = 2 (kept); NULLs never pair
        assert got == [(1, 10), (2, 11)]

        semi = band_join(a, b, "av", "bv", 2.0, how="semi")
        assert sorted(r["aid"] for r in semi.collect()) == [1, 2]

        import pytest

        with pytest.raises(ValueError, match="eps must be"):
            band_join(a, b, "av", "bv", 0)

    def test_equi_key_and_plan_shape(self, spark):
        from rdw_spark.operators.joins import band_join

        a = spark.createDataFrame(
            [(1, "u1", 10.0), (2, "u2", 10.0)], "aid int, u string, av double")
        b = spark.createDataFrame(
            [(10, "u1", 11.0), (11, "u2", 50.0)], "bid int, u string, bv double")
        j = band_join(a, b, "av", "bv", 5.0, on=["u"])
        rows = sorted(map(tuple, j.select("aid", "bid").collect()))
        assert rows == [(1, 10)]  # u2's values are 40 apart
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
