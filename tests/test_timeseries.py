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


def test_rolling_zscore_self_excluded_baseline(spark):
    """rolling_zscore vs a pure-Python model: strictly-prior window,
    z withheld until the baseline is full, spike flagged, constant
    baseline (zero variance) never scores; window stays partitioned."""
    import statistics

    base = [10, 12, 11, 9, 10, 12, 11]          # 7-point baseline
    series = base + [50, 10]                     # spike, then normal
    rows = [("a", dt.date(2024, 1, 1) + dt.timedelta(days=i), v)
            for i, v in enumerate(series)]
    # second key: constant series — variance 0, never scored
    rows += [("c", dt.date(2024, 1, 1) + dt.timedelta(days=i), 5)
             for i in range(9)]

    from rdw_spark.operators.timeseries import rolling_zscore

    df = spark.createDataFrame(rows, "k string, day date, v long")
    out = rolling_zscore(df, ["k"], "day", "v", lookback=7, z_threshold=3.0)
    got = {(r["k"], r["day"]): r for r in out.collect()}
    assert len(got) == len(rows)

    spike = got[("a", dt.date(2024, 1, 1) + dt.timedelta(days=7))]
    mean = sum(base) / 7
    var = statistics.variance(base)              # sample variance
    assert spike["baseline_n"] == 7
    assert abs(spike["zscore"] - (50 - mean) / var ** 0.5) < 1e-9
    assert spike["is_anomaly"]
    # the day AFTER the spike: baseline now CONTAINS the spike (windows
    # roll), but the point itself (10) is near the pre-spike level
    after = got[("a", dt.date(2024, 1, 1) + dt.timedelta(days=8))]
    assert after["baseline_n"] == 7 and not after["is_anomaly"]
    # partial baselines: no score for the first `lookback` points
    for i in range(7):
        r = got[("a", dt.date(2024, 1, 1) + dt.timedelta(days=i))]
        assert r["zscore"] is None and not r["is_anomaly"]
        assert r["baseline_n"] == i
    # constant series: full window but var == 0 -> withheld, not NaN
    r = got[("c", dt.date(2024, 1, 1) + dt.timedelta(days=8))]
    assert r["baseline_n"] == 7 and r["zscore"] is None
    assert not r["is_anomaly"]

    # scale gate: the rolling window is partitioned by the key
    import contextlib
    import io
    import re
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    for s in re.findall(r"windowspecdefinition\(([^)]*)", buf.getvalue()):
        first = s.split(",")[0].strip()
        assert " ASC" not in first and " DESC" not in first, (
            f"unpartitioned window: {s!r}")

    with pytest.raises(ValueError, match="lookback"):
        rolling_zscore(df, ["k"], "day", "v", lookback=1)


def test_holt_matches_sequential_model(spark):
    """holt_smoothing vs the pure-Python two-state recursion, bit-exact
    and repartition-invariant; single point keeps level=x, trend=0."""
    import random

    rng = random.Random(11)
    a, b = 0.4, 0.25
    rows, series = [], {}
    for k in ("a", "b"):
        for i in range(rng.randint(4, 30)):
            v = round(rng.uniform(-50, 150), 3)
            rows.append((k, dt.date(2024, 1, 1) + dt.timedelta(days=i), v))
            series.setdefault(k, []).append(v)
    expect = {}
    for k, xs in series.items():
        l, t = xs[0], 0.0
        for x in xs[1:]:
            nl = a * x + (1 - a) * (l + t)
            t = b * (nl - l) + (1 - b) * t
            l = nl
        expect[k] = (l, t)

    from rdw_spark.operators.timeseries import holt_smoothing

    df = spark.createDataFrame(rows, "k string, day date, v double")
    for frame in (df, df.repartition(9)):
        got = {r["k"]: r for r in
               holt_smoothing(frame, ["k"], "day", "v",
                              alpha=a, beta=b).collect()}
        for k in got:
            assert got[k]["level"] == expect[k][0]
            assert got[k]["trend"] == expect[k][1]
            assert got[k]["forecast_1"] == expect[k][0] + expect[k][1]

    one = spark.createDataFrame(
        [("z", dt.date(2024, 1, 1), 7.0)], "k string, day date, v double")
    r = holt_smoothing(one, ["k"], "day", "v").collect()[0]
    assert r["level"] == 7.0 and r["trend"] == 0.0

    with pytest.raises(ValueError, match="beta"):
        holt_smoothing(df, ["k"], "day", "v", beta=1.5)


def test_event_transitions_counts_and_tiebreak(spark):
    """event_transitions: exact pair counts, row-normalized probs, and
    the tiebreak column pinning same-timestamp order."""
    from rdw_spark.operators.timeseries import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # u1: A -> B -> A -> C
        (1, s(0), "A", 1), (1, s(1), "B", 2), (1, s(2), "A", 3),
        (1, s(3), "C", 4),
        # u2: two SAME-timestamp events, order pinned by event_id:
        # A(5) -> B(6) -> B(7)
        (2, s(9), "A", 5), (2, s(9), "B", 6), (2, s(10), "B", 7),
        # u3: single event -> no transitions
        (3, s(0), "A", 8),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, state string, event_id int")
    got = {(r["from_state"], r["to_state"]): r for r in
           event_transitions(df, "user_id", "ts", "state",
                             "event_id").collect()}
    # from A: A->B twice (u1, u2), A->C once
    assert got[("A", "B")]["n_transitions"] == 2
    assert got[("A", "C")]["n_transitions"] == 1
    assert got[("A", "B")]["prob"] == 2 / 3
    assert got[("A", "C")]["prob"] == 1 / 3
    # from B: B->A (u1), B->B (u2, the tiebroken pair)
    assert got[("B", "A")]["n_transitions"] == 1
    assert got[("B", "B")]["n_transitions"] == 1
    assert got[("B", "A")]["prob"] == 0.5
    # C is terminal: no outgoing row
    assert not any(k[0] == "C" for k in got)
    assert len(got) == 4


def test_ewma_and_holt_skip_null_values(spark):
    """A NULL reading must not poison the fold: it is excluded, counts
    reflect kept observations, and an all-NULL key emits no row."""
    from rdw_spark.operators.timeseries import ewma, holt_smoothing

    rows = [
        ("a", dt.date(2024, 1, 1), 10.0),
        ("a", dt.date(2024, 1, 2), None),
        ("a", dt.date(2024, 1, 3), 20.0),
        ("n", dt.date(2024, 1, 1), None),
    ]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    e = {r["k"]: r for r in ewma(df, ["k"], "day", "v", alpha=0.5).collect()}
    assert set(e) == {"a"}
    assert e["a"]["ewma"] == 15.0             # fold over [10, 20] only
    assert e["a"]["n_points"] == 2
    assert e["a"]["last_day"] == dt.date(2024, 1, 3)
    h = {r["k"]: r for r in
         holt_smoothing(df, ["k"], "day", "v", alpha=0.5).collect()}
    assert set(h) == {"a"} and h[("a")]["n_points"] == 2


def test_peak_concurrency_sweep_line(spark):
    """Hand-built intervals: overlapping triple, back-to-back pair that
    must NOT double-count, NULL end = still active, per-group isolation."""
    from rdw_spark.operators.timeseries import peak_concurrency

    rows = [
        # group a: [0,10) [5,15) [8,12) -> 3 concurrent first at t=8
        ("a", 0, 10), ("a", 5, 15), ("a", 8, 12),
        # b: back-to-back [0,5) [5,10): -1 sorts before +1 -> peak 1 at 0
        ("b", 0, 5), ("b", 5, 10),
        # c: open-ended (NULL end) stacks forever -> 2 at t=3
        ("c", 1, None), ("c", 3, None),
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = {r["g"]: (r["peak_concurrent"], r["peak_at"]) for r in
           peak_concurrency(df, "s", "e", ["g"]).collect()}
    assert got["a"] == (3, 8)
    assert got["b"] == (1, 0)
    assert got["c"] == (2, 3)


def test_cusum_alarms_hand_model(spark):
    """CUSUM vs a pure-Python fold: alarm counts, first-alarm position,
    reset-after-alarm, two-sided detection, NULL exclusion."""
    from rdw_spark.operators.timeseries import cusum_alarms

    # target 10, slack 1, threshold 5: upward drift fires at the 3rd
    # high point, then resets; a low dip fires the lo side
    vals = [10.0, 13.0, 13.0, 13.0, 10.0, 4.0, 4.0, 10.0, None]
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, o int, v double")

    def model(xs, tgt, sl, h):
        hi = lo = mx = 0.0
        na = 0
        fi = None
        for i, x in enumerate(xs, start=1):
            hi = max(0.0, hi + x - tgt - sl)
            lo = max(0.0, lo + tgt - x - sl)
            mx = max(mx, hi, lo)
            if hi > h or lo > h:
                na += 1
                fi = fi or i
                if hi > h:
                    hi = 0.0
                if lo > h:
                    lo = 0.0
        return na, fi, mx

    xs = [v for v in vals if v is not None]
    na, fi, mx = model(xs, 10.0, 1.0, 5.0)
    r = cusum_alarms(df, ["g"], "o", "v", 10.0, 1.0, 5.0).collect()[0]
    assert r["n_points"] == len(xs)
    assert r["n_alarms"] == na and na >= 2      # both sides fired
    assert r["first_alarm_o"] == fi - 1          # order values are 0-based
    assert r["max_cusum"] == mx

    import pytest

    with pytest.raises(ValueError, match="slack"):
        cusum_alarms(df, ["g"], "o", "v", 10.0, -1.0, 5.0)


def test_holt_winters_matches_python_model(spark):
    """Triple smoothing vs a pure-Python fold (exact float parity), the
    seasonal profile is actually used (forecast picks the right slot),
    short series emit nothing, and param validation."""
    import math

    from rdw_spark.operators.timeseries import holt_winters_additive

    def model(xs, m, a, b, g, h):
        l = sum(xs[:m]) / m
        t = 0.0
        s = [x - l for x in xs[:m]]
        pos = 0
        for x in xs[m:]:
            sm = s[pos]
            l_new = a * (x - sm) + (1 - a) * (l + t)
            t = b * (l_new - l) + (1 - b) * t
            s[pos] = g * (x - l_new) + (1 - g) * sm
            l = l_new
            pos = (pos + 1) % m
        fc = l + h * t + s[(pos + (h - 1) % m) % m]
        return l, t, s, fc

    # seasonal + trend signal, period 4
    xs = [10 + 0.5 * i + [3, -1, -2, 0][i % 4] for i in range(20)]
    rows = [("a", i, float(v)) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, o int, v double").repartition(4)
    r = holt_winters_additive(df, ["g"], "o", "v", period=4).collect()[0]
    l, t, s, fc = model(xs, 4, 0.5, 0.3, 0.3, 1)
    assert r["n_points"] == 20
    assert math.isclose(r["level"], l, rel_tol=0, abs_tol=0)
    assert math.isclose(r["trend"], t, rel_tol=0, abs_tol=0)
    assert list(r["seasonal"]) == s
    assert r["forecast_h"] == fc
    # the forecast tracks the next point decently on this clean signal
    nxt = 10 + 0.5 * 20 + 3  # i=20 -> slot 0
    assert abs(r["forecast_h"] - nxt) < 1.5

    # horizon 3 uses the right seasonal slot
    r3 = holt_winters_additive(df, ["g"], "o", "v", period=4,
                               horizon=3).collect()[0]
    _, _, _, fc3 = model(xs, 4, 0.5, 0.3, 0.3, 3)
    assert r3["forecast_h"] == fc3

    # too-short series: no row
    short = spark.createDataFrame(
        [("b", i, 1.0) for i in range(4)], "g string, o int, v double")
    assert holt_winters_additive(short, ["g"], "o", "v", period=4).count() == 0

    import pytest

    with pytest.raises(ValueError, match="period"):
        holt_winters_additive(df, ["g"], "o", "v", period=1)
    with pytest.raises(ValueError, match="alpha"):
        holt_winters_additive(df, ["g"], "o", "v", period=4, alpha=0.0)
