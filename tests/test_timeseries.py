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


def test_ewma_matches_sequential_model(spark):
    """ewma vs the pure-Python recursion (pandas ewm(adjust=False)
    semantics, seeded with the first observation), repartition-invariant."""
    import random

    rng = random.Random(7)
    rows = []
    series = {}
    for k in ("a", "b"):
        for i in range(rng.randint(5, 40)):
            v = round(rng.uniform(-100, 100), 3)
            rows.append((k, dt.date(2024, 1, 1) + dt.timedelta(days=i), v))
            series.setdefault(k, []).append(v)
    expect = {}
    for k, xs in series.items():
        acc = xs[0]
        for x in xs[1:]:
            acc = 0.3 * x + (1 - 0.3) * acc
        expect[k] = acc

    from rdw_spark.operators.timeseries import ewma

    df = spark.createDataFrame(rows, "k string, day date, v double")
    for frame in (df, df.repartition(13)):
        got = {r["k"]: r for r in
               ewma(frame, ["k"], "day", "v", alpha=0.3).collect()}
        assert set(got) == {"a", "b"}
        for k in got:
            assert got[k]["ewma"] == expect[k]  # bit-exact, not approx
            assert got[k]["n_points"] == len(series[k])
            assert got[k]["last_day"] == dt.date(2024, 1, 1) + dt.timedelta(
                days=len(series[k]) - 1)

    # single-point series: ewma == the observation (fold over empty slice)
    one = spark.createDataFrame(
        [("z", dt.date(2024, 1, 1), 42.5)], "k string, day date, v double")
    assert ewma(one, ["k"], "day", "v").collect()[0]["ewma"] == 42.5

    with pytest.raises(ValueError, match="alpha"):
        ewma(df, ["k"], "day", "v", alpha=0.0)


def test_funnel_strict_ordering_and_averages(spark):
    """funnel: strict-after semantics (same-timestamp pair is NOT a
    conversion), per-stage user counts, exact second averages."""
    from rdw_spark.operators.timeseries import funnel

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1 full funnel: view@0 -> click@10 -> buy@40 (gaps 10, 30)
        (1, s(0), "view"), (1, s(10), "click"), (1, s(40), "buy"),
        # u1 noise: later view, click BEFORE the first view (ignored for
        # stage timing: first view at 0 still anchors), buy before click
        (1, s(100), "view"),
        # u2: view and click at the SAME instant -> not a conversion,
        # then a later click@20 converts; no buy
        (2, s(5), "view"), (2, s(5), "click"), (2, s(25), "click"),
        # u3: click without any view -> never enters the funnel
        (3, s(1), "click"), (3, s(2), "buy"),
        # u4: view only
        (4, s(3), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, stage string")
    got = {r["stage"]: r for r in
           funnel(df, "user_id", "ts", "stage",
                  ["view", "click", "buy"]).collect()}
    assert got["view"]["n_users"] == 3          # u1, u2, u4
    assert got["view"]["avg_step_seconds"] == 0.0
    assert got["click"]["n_users"] == 2         # u1 (10s), u2 (20s)
    assert got["click"]["avg_step_seconds"] == 15.0
    assert got["buy"]["n_users"] == 1           # u1 only (30s after click)
    assert got["buy"]["avg_step_seconds"] == 30.0
    assert [got[k]["stage_idx"] for k in ("view", "click", "buy")] == [0, 1, 2]

    # a stage with zero survivors still emits its row (count 0)
    got2 = {r["stage"]: r for r in
            funnel(df, "user_id", "ts", "stage",
                   ["view", "buy", "click"]).collect()}
    assert got2["buy"]["n_users"] == 1           # u1: buy@40 after view@0
    assert got2["click"]["n_users"] == 0         # u1 has no click after @40
    assert got2["click"]["avg_step_seconds"] is None
