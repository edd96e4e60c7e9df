"""profile_columns: one-pass stats vs hand-computed values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


# --------------------------------------------------------------------------
# distinct_sketch_rollup: mergeable HLL distinct-count cubes
# --------------------------------------------------------------------------


def test_sketch_rollup_estimates_and_lossless_merge(spark):
    from rdw_spark.operators.profiling import (
        distinct_sketch_rollup, merge_distinct_sketches,
    )

    df = spark.range(20000).selectExpr(
        "CAST(id % 4 AS INT) AS g1",
        "CAST(id % 2 AS INT) AS g2",
        "CAST(id % 3777 AS STRING) AS v",   # 3777 distinct values overall
    )
    fine = distinct_sketch_rollup(df, ["g1", "g2"], "v", lgk=14).cache()
    exact_fine = {
        (r.g1, r.g2): r.cnt
        for r in df.groupBy("g1", "g2")
        .agg(F.countDistinct("v").alias("cnt")).collect()
    }
    for r in fine.collect():
        assert r.estimate == pytest.approx(exact_fine[(r.g1, r.g2)], rel=0.05)

    # lossless merge: rolling the FINE sketches up to g1 grain estimates
    # exactly what building at g1 grain directly estimates
    merged = {r.g1: r.estimate
              for r in merge_distinct_sketches(fine, ["g1"]).collect()}
    direct = {r.g1: r.estimate
              for r in distinct_sketch_rollup(df, ["g1"], "v", lgk=14).collect()}
    assert merged == direct

    # grand total from sketches tracks the true overall distinct count
    total = merge_distinct_sketches(fine.withColumn("all", F.lit(1)), ["all"])
    assert total.collect()[0].estimate == pytest.approx(3777, rel=0.05)
    fine.unpersist()


def test_sketch_rollup_incremental_tracks_rebuild(spark):
    """Per-batch sketches unioned across batches answer what a full
    rebuild answers to within the sketch rsd (merge is deterministic but
    the union gadget's representation differs from a fresh sketch, so
    bit-equality is NOT the contract) — the incremental-maintenance
    contract, locked against the EXACT distinct counts."""
    from rdw_spark.operators.profiling import (
        distinct_sketch_rollup, merge_distinct_sketches,
    )

    b1 = spark.range(0, 6000).selectExpr(
        "CAST(id % 3 AS INT) AS g", "CAST(id % 911 AS STRING) AS v")
    b2 = spark.range(3000, 12000).selectExpr(
        "CAST(id % 3 AS INT) AS g", "CAST(id % 911 AS STRING) AS v")
    per_batch = distinct_sketch_rollup(b1, ["g"], "v").unionByName(
        distinct_sketch_rollup(b2, ["g"], "v"))
    incr = {r.g: r.estimate
            for r in merge_distinct_sketches(per_batch, ["g"]).collect()}
    full = {r.g: r.estimate
            for r in distinct_sketch_rollup(
                b1.unionByName(b2), ["g"], "v").collect()}
    both = b1.unionByName(b2)
    exact = {r.g: r.cnt for r in both.groupBy("g").agg(
        F.countDistinct("v").alias("cnt")).collect()}
    for g, cnt in exact.items():
        assert incr[g] == pytest.approx(cnt, rel=0.05)
        assert full[g] == pytest.approx(cnt, rel=0.05)
    # merging is deterministic: re-merge gives identical estimates
    again = {r.g: r.estimate
             for r in merge_distinct_sketches(per_batch, ["g"]).collect()}
    assert again == incr


# --------------------------------------------------------------------------
# rank_statistics: value-level percent_rank / cume_dist
# --------------------------------------------------------------------------


def test_rank_statistics_match_row_level_windows(spark):
    from pyspark.sql import Window

    from rdw_spark.operators.profiling import rank_statistics

    df = spark.range(500).selectExpr(
        "CAST(id % 3 AS INT) AS g",
        "CAST((id * 37) % 50 AS DOUBLE) AS v",   # heavy ties
        "id AS k",
    )
    got = {(r.g, r.k): (r.percent_rank, r.cume_dist)
           for r in rank_statistics(df, ["g"], "v", keep_cols=["k"]).collect()}
    w = Window.partitionBy("g").orderBy("v")
    want = {(r.g, r.k): (r.pr, r.cd)
            for r in df.select(
                "g", "k",
                F.percent_rank().over(w).alias("pr"),
                F.cume_dist().over(w).alias("cd")).collect()}
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == pytest.approx(want[key][0], abs=1e-15)
        assert got[key][1] == pytest.approx(want[key][1], abs=1e-15)


def test_rank_statistics_null_values_and_keys_kept(spark):
    """NULL values / NULL partition keys rank like the SQL window fns
    (they sort as a tie group) instead of being dropped by the join-back
    (round-8 advisor fix: eqNullSafe join)."""
    from pyspark.sql import Window

    from rdw_spark.operators.profiling import rank_statistics

    df = spark.createDataFrame(
        [("a", None), ("a", 1.0), ("a", 2.0), ("a", None),
         (None, 3.0), (None, None), (None, 3.0)],
        "g string, v double",
    )
    out = rank_statistics(df, ["g"], "v")
    assert out.count() == 7          # nothing dropped
    got = {(r.g, r.v): (r.percent_rank, r.cume_dist) for r in out.collect()}
    w = Window.partitionBy("g").orderBy("v")
    want = {(r.g, r.v): (r.pr, r.cd)
            for r in df.select(
                "g", "v",
                F.percent_rank().over(w).alias("pr"),
                F.cume_dist().over(w).alias("cd")).collect()}
    assert got == want


def test_rank_statistics_single_row_partition(spark):
    from rdw_spark.operators.profiling import rank_statistics

    df = spark.createDataFrame([("a", 5.0), ("b", 1.0), ("b", 2.0)],
                               "g string, v double")
    rows = {(r.g, r.v): r for r in rank_statistics(df, ["g"], "v").collect()}
    assert rows[("a", 5.0)].percent_rank == 0.0      # n=1: no 0/0
    assert rows[("a", 5.0)].cume_dist == 1.0
    assert rows[("b", 2.0)].percent_rank == 1.0


# ---------------------------------------------------------------------------
# quantile_sketch_rollup: mergeable t-digest quantile cubes (HLL twin)
# ---------------------------------------------------------------------------

def _exact_q(vals, q):
    import numpy as np

    return float(np.quantile(np.asarray(vals, float), q))


def test_quantile_sketch_accuracy_and_rollup(spark):
    """Digest estimates track exact quantiles within the delta error
    envelope at fine AND merged grains, and merging the fine digests
    agrees with rebuilding from the fact at the coarse grain."""
    import random

    import numpy as np

    from rdw_spark.operators.quantiles import (
        merge_quantile_sketches, quantile_sketch_rollup, sketch_quantiles,
    )

    rng = random.Random(7)
    rows = [
        (g1, g2, rng.lognormvariate(0.0, 1.0))
        for g1 in ("a", "b") for g2 in (1, 2, 3) for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 int, v double").repartition(16)
    by_fine: dict = {}
    by_coarse: dict = {}
    for g1, g2, v in rows:
        by_fine.setdefault((g1, g2), []).append(v)
        by_coarse.setdefault(g1, []).append(v)

    fine = quantile_sketch_rollup(df, ["g1", "g2"], "v", delta=200).cache()
    est = {
        (r["g1"], r["g2"]): r
        for r in sketch_quantiles(fine, [0.1, 0.5, 0.9, 0.99]).collect()
    }
    assert set(est) == set(by_fine)
    for k, vals in by_fine.items():
        r = est[k]
        assert r["n"] == len(vals)
        assert r["vmin"] == min(vals) and r["vmax"] == max(vals)
        spread = max(vals) - min(vals)
        for q, col in ((0.1, "q_1"), (0.5, "q_5"), (0.9, "q_9"), (0.99, "q_99")):
            # rank-error bound ~1/delta translated through the local density;
            # 2% of spread is a loose envelope for delta=200 on lognormal
            assert abs(r[col] - _exact_q(vals, q)) <= 0.02 * spread, (k, q)

    # centroid state is bounded by the compression (k2 scale:
    # O(delta*log n) with singleton tails), not by the data size
    for r in fine.collect():
        assert len(r["means"]) <= 6 * 200
        assert abs(sum(r["weights"]) - r["n"]) < 1e-6

    # coarse answers from the DIGEST table vs rebuilt from the fact
    merged = sketch_quantiles(
        merge_quantile_sketches(fine, ["g1"]), [0.5, 0.9])
    rebuilt = sketch_quantiles(
        quantile_sketch_rollup(df, ["g1"], "v", delta=200), [0.5, 0.9])
    m = {r["g1"]: r for r in merged.collect()}
    b = {r["g1"]: r for r in rebuilt.collect()}
    for g1, vals in by_coarse.items():
        spread = max(vals) - min(vals)
        assert m[g1]["n"] == b[g1]["n"] == len(vals)
        for col, q in (("q_5", 0.5), ("q_9", 0.9)):
            assert abs(m[g1][col] - _exact_q(vals, q)) <= 0.02 * spread
            assert abs(m[g1][col] - b[g1][col]) <= 0.02 * spread

    fine.unpersist()


def test_quantile_sketch_deterministic_merge_and_nulls(spark):
    """Same partials merged twice → bit-identical digests (the HLL
    determinism contract); NULL values are ignored and an all-NULL group
    yields n=0 with NULL estimates; the fact's values never shuffle
    (exactly ONE exchange, from the partial-digest merge)."""
    import contextlib
    import io

    from rdw_spark.operators.quantiles import (
        merge_quantile_sketches, quantile_sketch_rollup, sketch_quantiles,
    )

    rows = [("a", float(i % 97)) for i in range(3000)] + [
        ("a", None), ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    fine = quantile_sketch_rollup(df, ["g"], "v", delta=50).cache()
    one = {r["g"]: r for r in merge_quantile_sketches(fine, ["g"]).collect()}
    two = {r["g"]: r for r in merge_quantile_sketches(fine, ["g"]).collect()}
    for g in one:
        assert one[g]["means"] == two[g]["means"]
        assert one[g]["weights"] == two[g]["weights"]

    est = {r["g"]: r for r in sketch_quantiles(fine, [0.5]).collect()}
    assert est["a"]["n"] == 3000 and est["b"]["n"] == 0
    assert est["b"]["q_5"] is None and est["b"]["vmin"] is None
    assert abs(est["a"]["q_5"] - 48.0) <= 2.0

    plain = spark.createDataFrame(rows, "g string, v double")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        quantile_sketch_rollup(plain, ["g"], "v").explain("formatted")
    plan = buf.getvalue()
    # tree section lists each node once as '+- <Node>' (details repeat
    # them); the one exchange is the partial-digest merge — the fact's
    # values never shuffle
    assert plan.count("+- Exchange") == 1
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan


def test_chi_square_independence_matches_model(spark):
    """chi2/dof/n/cramers_v bit-match a hand-computed python model (same
    sorted-fold order); NULL categories are excluded; an independent
    2x2 table gives chi2 == 0."""
    import math
    from collections import Counter

    from rdw_spark.operators.profiling import chi_square_independence

    rows = ([("x", "p")] * 30 + [("x", "q")] * 10 + [("y", "p")] * 15
            + [("y", "q")] * 25 + [("z", "p")] * 5
            + [(None, "p")] * 3 + [("x", None)] * 2)
    df = spark.createDataFrame(rows, "a string, b string").repartition(8)
    out = chi_square_independence(df, "a", "b").collect()[0]

    obs = Counter((a, b) for a, b in rows if a is not None and b is not None)
    n = sum(obs.values())
    ra: Counter = Counter()
    cb: Counter = Counter()
    for (a, b), o in obs.items():
        ra[a] += o
        cb[b] += o
    chi2 = 0.0
    for a, b in sorted((a, b) for a in ra for b in cb):
        e = (float(ra[a]) * float(cb[b])) / float(n)
        d = float(obs.get((a, b), 0)) - e
        chi2 += d * d / e
    assert out["chi2"] == chi2
    assert out["dof"] == (len(ra) - 1) * (len(cb) - 1)
    assert out["n"] == n
    assert out["cramers_v"] == math.sqrt(
        chi2 / (n * min(len(ra) - 1, len(cb) - 1)))

    indep = spark.createDataFrame(
        [("u", "l")] * 8 + [("u", "m")] * 8 + [("v", "l")] * 4 + [("v", "m")] * 4,
        "a string, b string")
    r = chi_square_independence(indep, "a", "b").collect()[0]
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_winsorize_clamps_null_safe(spark):
    """winsorize: exact percentile clamp per group, NULL group treated as
    its own stratum, NULL values pass through unclipped."""
    from rdw_spark.operators.profiling import winsorize

    rows = (
        [("a", i, float(i)) for i in range(1, 12)]        # 1..11
        + [("a", 99, 1000.0), ("a", 98, -1000.0)]          # outliers
        + [(None, 1, 5.0), (None, 2, 50.0), (None, 3, 500.0)]
        + [("b", 7, None)]                                 # NULL value
    )
    df = spark.createDataFrame(rows, "g string, id int, v double")
    got = {(r["g"], r["id"]): r for r in
           winsorize(df, ["g"], "v", lower=0.1, upper=0.9,
                     keep_cols=["id"]).collect()}
    assert len(got) == len(rows)
    # group a: 13 values; p10/p90 interpolated cuts clamp ONLY outliers
    assert got[("a", 99)]["clipped"] and got[("a", 99)]["winsorized"] < 1000
    assert got[("a", 98)]["clipped"] and got[("a", 98)]["winsorized"] > -1000
    assert not got[("a", 5)]["clipped"]
    assert got[("a", 5)]["winsorized"] == 5.0
    # NULL group is a real stratum (p10/p90 of [5,50,500] clamp the ends)
    assert got[(None, 1)]["clipped"] and got[(None, 3)]["clipped"]
    assert not got[(None, 2)]["clipped"]
    # NULL value: stays NULL, not pinned to the lower cut
    assert got[("b", 7)]["winsorized"] is None
    assert not got[("b", 7)]["clipped"]

    with pytest.raises(ValueError, match="lower"):
        winsorize(df, ["g"], "v", lower=0.9, upper=0.1)


def test_target_encode_loo_excludes_own_row(spark):
    """target_encode_loo: each row encoded by the OTHERS' mean; singleton
    category falls back to the global mean; NULL category is a stratum."""
    from rdw_spark.operators.profiling import target_encode_loo

    rows = [
        ("x", 1, 10.0), ("x", 2, 20.0), ("x", 3, 30.0),
        ("y", 4, 100.0), ("y", 5, 200.0),
        ("solo", 6, 7.0),
        (None, 7, 1.0), (None, 8, 3.0),
    ]
    df = spark.createDataFrame(rows, "c string, id int, y double")
    got = {r["id"]: r["encoded"] for r in
           target_encode_loo(df, ["c"], "y", keep_cols=["id"]).collect()}
    assert got[1] == 25.0          # (20+30)/2
    assert got[2] == 20.0          # (10+30)/2
    assert got[4] == 200.0
    assert got[7] == 3.0 and got[8] == 1.0   # NULL category LOO
    gm = sum(r[2] for r in rows) / len(rows)
    assert abs(got[6] - gm) < 1e-12          # singleton -> global mean


def test_target_encode_loo_null_targets(spark):
    """NULL-target rows leak nothing: encoded as the category's plain
    mean over non-null targets; all-null category -> global mean."""
    from rdw_spark.operators.profiling import target_encode_loo

    rows = [
        ("x", 1, 10.0), ("x", 2, 20.0), ("x", 3, None),
        ("z", 4, None), ("z", 5, None),
        ("y", 6, 100.0), ("y", 7, 200.0),
    ]
    df = spark.createDataFrame(rows, "c string, id int, y double")
    got = {r["id"]: r["encoded"] for r in
           target_encode_loo(df, ["c"], "y", keep_cols=["id"]).collect()}
    assert got[3] == 15.0                     # plain mean of the others
    gm = (10 + 20 + 100 + 200) / 4
    assert got[4] == gm and got[5] == gm      # all-null category
    assert got[1] == 20.0 and got[2] == 10.0  # LOO unaffected by the null


def test_concentration_stats_known_distributions(spark):
    """Gini/HHI against hand-computed distributions: perfectly balanced
    -> gini 0, hhi 1/k; fully concentrated -> gini (k-1)/k, hhi ~1;
    weighted variant respects the weight column."""
    from rdw_spark.operators.profiling import concentration_stats

    balanced = spark.createDataFrame(
        [(s, i) for s in "abcd" for i in range(25)], "src string, x int")
    r = concentration_stats(balanced, ["src"]).collect()[0]
    assert r["n_groups"] == 4 and r["total_weight"] == 100
    assert r["gini"] == 0.0 and r["hhi"] == 0.25
    assert r["top1_share"] == 0.25

    skewed = spark.createDataFrame(
        [("big", i) for i in range(97)] + [("s1", 0), ("s2", 0), ("s3", 0)],
        "src string, x int")
    r = concentration_stats(skewed, ["src"]).collect()[0]
    # exact: counts [1,1,1,97] -> gini = (2*(1+2+3+4*97)-5*100)/(4*100)
    assert r["gini"] == (2 * (1 + 2 + 3 + 4 * 97) - 5 * 100) / 400
    assert r["hhi"] == (1 + 1 + 1 + 97 * 97) / 10000
    assert r["top1_share"] == 0.97

    weighted = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 70)], "src string, tok int")
    r = concentration_stats(weighted, ["src"], weight_col="tok").collect()[0]
    assert r["total_weight"] == 100
    assert r["top1_share"] == 0.7
    assert r["hhi"] == (30 * 30 + 70 * 70) / 10000


def test_k_anonymity_report_and_suppression(spark):
    from rdw_spark.operators.profiling import (
        k_anonymity_report, suppress_small_classes,
    )

    rows = ([("1980", "10001", i) for i in range(5)]     # big class
            + [("1990", "10002", 100)]                   # singleton
            + [(None, "10003", 200), (None, "10003", 201)])  # NULL QI class
    df = spark.createDataFrame(rows, "yob string, zip string, id int")
    rep = {(r["yob"], r["zip"]): r for r in
           k_anonymity_report(df, ["yob", "zip"], k=2).collect()}
    assert rep[("1980", "10001")]["n"] == 5
    assert rep[("1980", "10001")]["is_k_anonymous"]
    assert not rep[("1990", "10002")]["is_k_anonymous"]
    # NULL QI values form their own (linkable) class
    assert rep[(None, "10003")]["n"] == 2 and rep[(None, "10003")]["is_k_anonymous"]

    kept = suppress_small_classes(df, ["yob", "zip"], k=2)
    ids = sorted(r["id"] for r in kept.collect())
    assert ids == [0, 1, 2, 3, 4, 200, 201]  # singleton suppressed

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_report(df, ["yob"], k=0)


def test_sketch_percentile_of_inverse_and_envelope(spark):
    """Inverse quantile lookup: scoring values against the stored digest
    tracks exact per-group percentiles within the rank envelope, is the
    inverse of sketch_quantiles on the same curve, clamps outside
    [min, max], and NULLs out for unknown groups."""
    import numpy as np

    from rdw_spark.operators.quantiles import (
        quantile_sketch_rollup, sketch_percentile_of, sketch_quantiles,
    )

    rng = np.random.default_rng(3)
    vals = {"a": rng.normal(50, 10, 4000), "b": rng.uniform(0, 1, 3000)}
    rows = [(g, float(v)) for g, arr in vals.items() for v in arr]
    df = spark.createDataFrame(rows, "g string, v double").repartition(8)
    cube = quantile_sketch_rollup(df, ["g"], "v", delta=200).cache()

    probes = spark.createDataFrame(
        [("a", 50.0), ("a", 70.0), ("b", 0.25), ("b", 2.0), ("b", -1.0),
         ("missing", 5.0)],
        "g string, v double")
    got = {(r["g"], r["v"]): r["pct_est"] for r in
           sketch_percentile_of(cube, probes, ["g"], "v").collect()}
    for g, x in (("a", 50.0), ("a", 70.0), ("b", 0.25)):
        exact = float((vals[g] <= x).mean())
        assert abs(got[(g, x)] - exact) < 0.02, (g, x, got[(g, x)], exact)
    assert got[("b", 2.0)] == 1.0 and got[("b", -1.0)] == 0.0  # clamped
    assert got[("missing", 5.0)] is None

    # inverse-map property: percentile_of(quantile(q)) ~= q on the SAME
    # digest curve (both use midpoint interpolation with exact endpoints)
    q = {r["g"]: r["q_5"] for r in sketch_quantiles(cube, [0.5]).collect()}
    back = spark.createDataFrame(
        [(g, float(v)) for g, v in q.items()], "g string, v double")
    rt = {r["g"]: r["pct_est"] for r in
          sketch_percentile_of(cube, back, ["g"], "v").collect()}
    for g in q:
        assert abs(rt[g] - 0.5) < 1e-9, (g, rt[g])
    cube.unpersist()
