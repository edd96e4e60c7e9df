"""Declarative expectations: per-kind violation semantics (NULL rules),
single-pass report, quarantine tagging, validation errors."""

from __future__ import annotations

from rdw_spark.operators.expectations import check_expectations, violating_rows

RULES = [
    ("r_age_range", "between", "age", (0, 120)),
    ("r_email_shape", "matches", "email", r"^[^@]+@[^@]+$"),
    ("r_id_not_null", "not_null", "id", None),
    ("r_id_unique", "unique", "id", None),
    ("r_pos_balance", "expr", None, "balance >= 0"),
    ("r_status_set", "in_set", "status", ["a", "b"]),
]


def _df(spark):
    rows = [
        (1, 30, "x@y.z", "a", 10.0),      # clean
        (2, 130, "bad", "c", -5.0),       # age, email, status, balance
        (None, 30, "u@v.w", "b", 1.0),    # null id
        (3, None, None, None, None),      # NULLs pass between/matches/in_set;
                                          # NULL balance violates expr
        (3, 25, "p@q.r", "a", 2.0),       # duplicate id
    ]
    return spark.createDataFrame(
        rows, "id int, age int, email string, status string, balance double")


def test_report_counts_per_kind(spark):
    rep = {r["rule"]: r for r in check_expectations(_df(spark), RULES).collect()}
    assert rep["r_age_range"]["n_violations"] == 1       # 130 only; NULL passes
    assert rep["r_email_shape"]["n_violations"] == 1     # 'bad'; NULL passes
    assert rep["r_id_not_null"]["n_violations"] == 1
    assert rep["r_id_unique"]["n_violations"] == 1       # one extra 3; NULL exempt
    assert rep["r_pos_balance"]["n_violations"] == 2     # -5 and NULL (must prove)
    assert rep["r_status_set"]["n_violations"] == 1      # 'c'; NULL passes
    assert not any(r["passed"] for r in rep.values())
    clean = check_expectations(
        _df(spark).filter("id = 1"), RULES).collect()
    assert all(r["passed"] for r in clean)


def test_single_pass_plan(spark):
    """All non-unique rules ride ONE aggregate over the fact — no
    per-rule scans."""
    row_rules = [r for r in RULES if r[1] != "unique"]
    rep = check_expectations(_df(spark), row_rules)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # exactly one scan of the FACT (the second scan is the 3-column
    # broadcast rule-metadata frame) and one partial aggregate
    assert plan.count("Scan ExistingRDD[id#") == 1, plan
    assert plan.count("HashAggregate(keys=[], functions=[partial_sum") == 1, plan


def test_violating_rows_quarantine(spark):
    bad = {r["id"]: r["_violated"] for r in
           violating_rows(_df(spark), RULES).collect()}
    assert bad[2] == ["r_age_range", "r_email_shape", "r_pos_balance",
                      "r_status_set"]
    assert bad[None] == ["r_id_not_null"]
    assert bad[3] == ["r_pos_balance"]  # the all-NULL row
    assert 1 not in bad


def test_empty_frame_passes_cleanly(spark):
    """An empty table has zero violations for every rule — NULL sums
    must not fail the gate."""
    df = _df(spark).limit(0)
    rep = {r["rule"]: r for r in check_expectations(df, RULES).collect()}
    assert set(rep) == {name for name, *_ in RULES}
    for r in rep.values():
        assert r["n_violations"] == 0, r
        assert r["passed"] is True, r


def test_validation_errors(spark):
    import pytest

    df = _df(spark)
    with pytest.raises(ValueError, match="non-empty"):
        check_expectations(df, [])
    with pytest.raises(ValueError, match="unknown expectation kind"):
        check_expectations(df, [("x", "positive", "age", None)])
    with pytest.raises(ValueError, match="duplicate"):
        check_expectations(df, [("x", "not_null", "id", None),
                                ("x", "not_null", "age", None)])
    with pytest.raises(ValueError, match="row-level"):
        violating_rows(df, [("u", "unique", "id", None)])
