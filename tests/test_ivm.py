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
