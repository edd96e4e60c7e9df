"""profile_columns: one-pass stats vs hand-computed values."""

from __future__ import annotations

import pytest

from rdw_spark.operators.profiling import profile_columns


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 10.0, "aa"),
        (2, None, "bbbb"),
        (3, 30.0, None),
        (4, 10.0, "c"),
        (None, 5.0, "aa"),
    ]
    return spark.createDataFrame(rows, "k long, v double, s string")


def test_profile_values(df):
    p = {r.column_name: r for r in profile_columns(df).collect()}
    k, v, s = p["k"], p["v"], p["s"]
    assert k.n_rows == 5 and k.n_null == 1 and k.n_distinct == 4
    assert (k.min_num, k.max_num) == (1.0, 4.0)
    assert k.avg_num == pytest.approx(2.5)
    assert k.min_len is None and k.max_len is None
    assert v.n_null == 1 and v.n_distinct == 3
    assert v.avg_num == pytest.approx((10 + 30 + 10 + 5) / 4)
    assert s.n_null == 1 and s.n_distinct == 3
    assert (s.min_len, s.max_len) == (1, 4)
    assert s.min_num is None and s.avg_num is None


def test_profile_subset_and_approx(df):
    rows = profile_columns(df, ["k"], approx=True).collect()
    assert len(rows) == 1
    # HLL++ on 4 values is exact in practice
    assert rows[0].n_distinct == 4


def test_profile_unknown_column(df):
    with pytest.raises(ValueError):
        profile_columns(df, ["nope"])


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from rdw_spark.operators.profiling import correlation_matrix

    rng = np.random.default_rng(7)
    x = rng.normal(size=200)
    y = 2 * x + rng.normal(size=200) * 0.1
    z = rng.normal(size=200)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r.col_a, r.col_b): r.corr
           for r in correlation_matrix(df, ["x", "y", "z"]).collect()}
    exp = np.corrcoef(np.vstack([x, y, z]))
    assert got[("x", "y")] == pytest.approx(exp[0, 1], abs=1e-9)
    assert got[("x", "z")] == pytest.approx(exp[0, 2], abs=1e-9)
    assert got[("y", "z")] == pytest.approx(exp[1, 2], abs=1e-9)


def test_correlation_constant_column_is_null(spark):
    from rdw_spark.operators.profiling import correlation_matrix

    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, c double"
    )
    rows = correlation_matrix(df, ["x", "c"]).collect()
    assert rows[0].corr is None


def test_correlation_requires_two_columns(spark):
    from rdw_spark.operators.profiling import correlation_matrix

    with pytest.raises(ValueError):
        correlation_matrix(None, ["x"])


def test_profile_small_magnitude_avg(spark):
    # decimal(38,12) accumulator: sub-1e-6 values must not average to 0
    df = spark.createDataFrame(
        [(2e-9,), (4e-9,), (6e-9,)], "v double"
    )
    row = profile_columns(df, ["v"]).collect()[0]
    assert row.avg_num == pytest.approx(4e-9, rel=1e-6)


# --------------------------------------------------------------------------
# equi_depth_histogram
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hist_df(spark):
    # 1000 distinct values, deterministic pseudo-random order
    from rdw_spark.operators.profiling import equi_depth_histogram  # noqa

    return spark.range(1000).selectExpr(
        "id AS k", "CAST((id * 2654435761) % 100000 AS DOUBLE) / 7.0 AS v"
    )


def test_equidepth_exact_buckets_equal(hist_df):
    from rdw_spark.operators.profiling import equi_depth_histogram

    rows = equi_depth_histogram(
        hist_df, "v", buckets=10, exact=True, order_cols=["k"]
    ).collect()
    assert len(rows) == 10
    assert all(r.n == 100 for r in rows)
    by_bucket = sorted(rows, key=lambda r: r.bucket)
    # non-overlapping ordered ranges
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi <= b.lo


def test_equidepth_approx_matches_exact_shape(hist_df):
    from rdw_spark.operators.profiling import equi_depth_histogram

    rows = equi_depth_histogram(hist_df, "v", buckets=10, exact=False).collect()
    total_n = sum(r.n for r in rows)
    assert total_n == 1000
    # approx_percentile with accuracy 10k on 1k distinct values is exact
    # at the cut points, so populations are within one rank of equal
    assert all(abs(r.n - 100) <= 1 for r in rows)
    by_bucket = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(by_bucket, by_bucket[1:]):
        assert a.hi <= b.lo
    # total is conserved
    exact_total = sum(
        r.total
        for r in equi_depth_histogram(
            hist_df, "v", buckets=10, exact=True, order_cols=["k"]
        ).collect()
    )
    assert sum(r.total for r in rows) == pytest.approx(exact_total)


def test_equidepth_approx_plan_has_no_window(hist_df):
    # the 100 TB gate: the approx path must contain NO window operator
    # (no single-task global sort) — cut computation is one aggregate,
    # bucket assignment is map-side over the broadcast cut array
    import contextlib
    import io

    from rdw_spark.operators.profiling import equi_depth_histogram

    df = equi_depth_histogram(hist_df, "v", buckets=10, exact=False)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "windowspecdefinition" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_equidepth_rejects_one_bucket(hist_df):
    from rdw_spark.operators.profiling import equi_depth_histogram

    with pytest.raises(ValueError):
        equi_depth_histogram(hist_df, "v", buckets=1)
