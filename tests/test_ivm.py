"""Incremental aggregate maintenance: the merge identity, order/tree
invariance, and SQL NULL semantics."""

from __future__ import annotations

from pyspark.sql import Row

from rdw_spark.operators.ivm import agg_delta, agg_readout, merge_agg_state


def _rows(df):
    return {
        tuple(r[k] for k in ("g", "n_rows", "n_values", "min_val", "max_val",
                             "sum_val", "avg_val"))
        for r in df.collect()
    }


def test_merge_equals_full_any_order(spark):
    data = [
        Row(g="a", v=float(i)) for i in range(50)
    ] + [Row(g="b", v=2.5), Row(g="b", v=None), Row(g="c", v=None)]
    df = spark.createDataFrame(data, "g string, v double")
    full = agg_readout(agg_delta(df, ["g"], "v"))

    b0 = df.filter("v is null or v < 10")
    b1 = df.filter("v >= 10 and v < 30")
    b2 = df.filter("v >= 30")
    d0, d1, d2 = (agg_delta(b, ["g"], "v") for b in (b0, b1, b2))

    merged = agg_readout(merge_agg_state(d0, d1, d2, group_cols=["g"]))
    # tree shape + order must not matter (associative/commutative)
    tree = agg_readout(merge_agg_state(
        merge_agg_state(d2, d0, group_cols=["g"]), d1, group_cols=["g"]))
    assert _rows(merged) == _rows(full) == _rows(tree)

    got = {r["g"]: r for r in merged.collect()}
    # all-NULL group: counted rows, no values, NULL bounds/sum/avg
    assert got["c"]["n_rows"] == 1 and got["c"]["n_values"] == 0
    assert got["c"]["min_val"] is None and got["c"]["avg_val"] is None
    # mixed group: NULL ignored by value aggregates
    assert got["b"]["n_rows"] == 2 and got["b"]["n_values"] == 1
    assert got["b"]["sum_val"] == 2.5 and got["b"]["avg_val"] == 2.5
    assert got["a"]["n_values"] == 50 and got["a"]["sum_val"] == float(sum(range(50)))


def test_join_delta_maintains_exact_view(spark):
    """Accumulating join_delta per batch equals the full join of the
    final tables, in any batch order, and composes with agg_delta for
    incremental star-schema aggregates."""
    from rdw_spark.operators.ivm import join_delta

    a_full = spark.createDataFrame(
        [(i, f"a{i}", i % 4) for i in range(40)], "k int, av string, seg int")
    b_full = spark.createDataFrame(
        [(i, i * 10.0) for i in range(0, 40, 2)], "k int, bv double")
    # three loads of A, two loads of B, interleaved
    a_batches = [a_full.filter(f"k % 3 = {i}") for i in range(3)]
    b_batches = [b_full.filter(f"k % 20 < 10"), b_full.filter("k % 20 >= 10")]

    empty_a, empty_b = a_full.limit(0), b_full.limit(0)
    view = None
    a_old, b_old = empty_a, empty_b
    loads = [("a", a_batches[0]), ("b", b_batches[0]), ("a", a_batches[1]),
             ("b", b_batches[1]), ("a", a_batches[2])]
    for side, batch in loads:
        if side == "a":
            dv = join_delta(a_old, batch, b_old, empty_b, ["k"])
            a_old = a_old.unionByName(batch)
        else:
            dv = join_delta(a_old, empty_a, b_old, batch, ["k"])
            b_old = b_old.unionByName(batch)
        view = dv if view is None else view.unionByName(dv)

    want = sorted(map(tuple, a_full.join(b_full, ["k"]).collect()))
    got = sorted(map(tuple, view.collect()))
    assert got == want  # exact, no dupes, no misses

    # compose: incremental aggregate over the maintained join view
    from rdw_spark.operators.ivm import agg_delta, agg_readout, merge_agg_state

    inc = agg_readout(merge_agg_state(
        agg_delta(view, ["seg"], "bv"), group_cols=["seg"]))
    full = agg_readout(agg_delta(
        a_full.join(b_full, ["k"]), ["seg"], "bv"))
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))


def test_join_delta_plan_broadcasts_delta_sides(spark):
    """The big old sides are probed via broadcast joins of the deltas —
    no shuffle of old-table rows."""
    from rdw_spark.operators.ivm import join_delta

    a_old = spark.range(0, 100_000).selectExpr("id as k", "id as av")
    b_old = spark.range(0, 100_000).selectExpr("id as k", "id as bv")
    a_d = spark.range(0, 10).selectExpr("id as k", "id as av")
    b_d = spark.range(0, 10).selectExpr("id as k", "id as bv")
    dv = join_delta(a_old, a_d, b_old, b_d, ["k"])
    plan = dv._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan, plan
