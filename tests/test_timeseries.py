"""gap_fill_interpolate: hand-built gap series vs expected values."""

from __future__ import annotations

import datetime as dt

import pytest

from rdw_spark.operators.timeseries import gap_fill_interpolate


def test_interpolation_values_and_flags(spark):
    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 4), 40.0),   # gap of 2 days -> 20, 30
        ("a", d(2024, 1, 5), 0.0),
        ("b", d(2024, 3, 1), 7.0),    # single point: no gaps
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    got = {(r.k, r.day): r for r in
           gap_fill_interpolate(df, ["k"], "day", "v").collect()}
    assert len(got) == 6  # a: 5 days, b: 1 day
    assert got[("a", d(2024, 1, 1))].v == 10.0
    assert not got[("a", d(2024, 1, 1))].interpolated
    assert got[("a", d(2024, 1, 2))].v == pytest.approx(20.0)
    assert got[("a", d(2024, 1, 2))].interpolated
    assert got[("a", d(2024, 1, 3))].v == pytest.approx(30.0)
    assert got[("a", d(2024, 1, 4))].v == 40.0
    assert got[("a", d(2024, 1, 5))].v == 0.0
    assert got[("b", d(2024, 3, 1))].v == 7.0
    assert not got[("b", d(2024, 3, 1))].interpolated


def test_interpolation_windows_are_partitioned(spark):
    """Scale gate: every window in the plan is partitioned by the key —
    no unpartitioned (single-task) window anywhere."""
    import contextlib
    import io
    import re

    df = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), 1.0), ("a", dt.date(2024, 1, 9), 9.0)],
        "k string, day date, v double",
    )
    out = gap_fill_interpolate(df, ["k"], "day", "v")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    specs = re.findall(r"windowspecdefinition\(([^)]*)", plan)
    assert specs
    for s in specs:
        first = s.split(",")[0].strip()
        assert " ASC" not in first and " DESC" not in first, (
            f"unpartitioned window: {s!r}"
        )
    assert out.count() == 9
