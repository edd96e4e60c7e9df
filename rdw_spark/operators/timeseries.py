"""Time-series gap fill + linear interpolation — the hypertable/continuous-
aggregate companion to U3's date densification (reference analog:
docs/Monitoring.md:229-233 synthesizes a date dimension to densify counts;
this extends that to VALUE interpolation across the synthesized gaps, the
`interpolate()` shape time-series stores ship).

Scale shape: one partial-aggregated groupBy to the (key, bucket) grain,
one per-key bounds aggregate + map-only ``sequence`` explode for the
calendar (each key's calendar is generated where the key lives — no
driver-side date loop, no cross join against a global calendar), a
left join back, then two PARTITIONED window passes (per key, ordered by
bucket) for the bracketing non-null neighbors. Window state is O(rows
per key), which is the honest cost of neighbor lookup; keys parallelize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_interpolate(
    df: DataFrame,
    key_cols: list[str],
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Densify each key's daily series between its own min and max day and
    linearly interpolate missing values: for a gap day ``t`` between the
    bracketing observed days ``(pt, pv)`` and ``(nt, nv)``,

        value(t) = pv + (nv - pv) * (t - pt) / (nt - pt)

    Output: ``(key…, day, value, interpolated)`` — observed rows carry
    their value with ``interpolated = false``; synthesized rows carry the
    interpolation with ``true``. Fixed-order double arithmetic (exact
    integer day differences promoted once) so the result is reproducible
    across engines/partitionings. Endpoints are always observed by
    construction (the calendar spans min..max of the key's own data), so
    no extrapolation case exists.
    """
    k = list(key_cols)
    observed = df.select(*k, F.col(day_col).alias("_d"),
                         F.col(value_col).alias("_v"))
    bounds = observed.groupBy(*k).agg(
        F.min("_d").alias("_lo"), F.max("_d").alias("_hi")
    )
    calendar = bounds.select(
        *k,
        F.explode(F.sequence("_lo", "_hi", F.expr("INTERVAL 1 DAY")))
        .alias("_d"),
    )
    dense = calendar.join(observed, [*k, "_d"], "left")

    w_back = (
        Window.partitionBy(*k).orderBy("_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*k).orderBy("_d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last("_v", ignorenulls=True).over(w_back)
    pt = F.last(F.when(F.col("_v").isNotNull(), F.col("_d")),
                ignorenulls=True).over(w_back)
    nv = F.first("_v", ignorenulls=True).over(w_fwd)
    nt = F.first(F.when(F.col("_v").isNotNull(), F.col("_d")),
                 ignorenulls=True).over(w_fwd)
    frac = (
        F.datediff(F.col("_d"), F.col("_pt")).cast("double")
        / F.datediff(F.col("_nt"), F.col("_pt")).cast("double")
    )
    return (
        dense
        .withColumn("_pv", pv).withColumn("_pt", pt)
        .withColumn("_nv", nv).withColumn("_nt", nt)
        .select(
            *k,
            F.col("_d").alias(day_col),
            F.when(F.col("_v").isNotNull(), F.col("_v"))
            .otherwise(
                F.col("_pv")
                + (F.col("_nv") - F.col("_pv")) * frac
            ).alias(value_col),
            F.col("_v").isNull().alias("interpolated"),
        )
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.2,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the classic
    smoothing recursion ``s_t = alpha*x_t + (1-alpha)*s_{t-1}`` seeded
    with ``s_1 = x_1`` — returning one row per key:
    ``(key…, n_points, last_<order_col>, ewma)``.

    Engine-parity contract: the fold is a sequential left-to-right pass
    over the key's series in ``order_col`` order, each step exactly
    ``alpha*x + (1-alpha)*acc`` in double arithmetic — the SAME operation
    sequence any engine's fold runs (DuckDB ``list_reduce``, pandas
    ``ewm(adjust=False)``), so results are bit-exact across engines, runs
    and partitionings. A window-function formulation
    (``sum(x*(1-a)^-i)`` tricks) overflows for long series; this one
    never leaves [min(x), max(x)].

    Scale shape: ONE shuffle (groupBy key); each key's series is
    assembled with ``sort_array∘collect_list`` and folded by a codegen'd
    ``aggregate`` expression where the key lives — O(rows-per-key) memory
    in one task, the honest cost of an order-dependent recursion (same
    cost class as the interpolation windows above). Keys parallelize;
    a single key's history must fit in an executor, which holds for any
    bounded-retention series (cap with a time filter upstream if not).

    ``order_col`` must be unique per key (aggregate to the series grain
    first) — with duplicates the within-tie fold order would be
    partitioning-dependent, exactly the nondeterminism this contract
    exists to exclude. NULL values are excluded from the series before
    folding (an unguarded NULL would poison every later step to NULL);
    ``n_points``/``last_<order_col>`` count only the kept observations,
    and an all-NULL key emits no row.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    k = list(key_cols)
    a = float(alpha)
    series = (
        df.select(*k, F.col(order_col).alias("_o"),
                  F.col(value_col).cast("double").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy(*k)
        .agg(
            F.sort_array(F.collect_list(F.struct("_o", "_v"))).alias("_s"),
            F.count("_v").alias("n_points"),
            F.max("_o").alias(f"last_{order_col}"),
        )
    )
    vals = F.transform("_s", lambda s: s["_v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
    )
    return series.select(
        *k, "n_points", f"last_{order_col}", folded.alias("ewma")
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: how many users reach each stage IN ORDER
    (stage ``i+1`` counted only from events strictly after the user's
    earliest qualifying stage-``i`` event — the product-analytics funnel
    every event store ships). Returns one row per stage:
    ``(stage_idx, stage, n_users, avg_step_seconds)`` where
    ``avg_step_seconds`` is the mean gap from the previous stage's
    qualifying timestamp (0.0 for stage 0 — there is no previous stage;
    a non-NULL sentinel keeps the column totally ordered for canonical
    row comparison).

    Semantics: per user, ``t_0 = min ts of stage 0``; ``t_{i+1} = min ts
    of a stage-``i+1`` event with ts > t_i``. Strict inequality — a
    same-timestamp pair is NOT a conversion (deterministic; no
    tie-break dependence).

    Scale shape: one co-partitioned equi-join on the user key per stage
    (stage frames are per-user aggregates — orders of magnitude smaller
    than the fact; AQE picks broadcast when they fit), each followed by
    a partial-aggregated min. No windows, no per-user event arrays: the
    fact is scanned once per stage with the stage filter pushed to the
    scan. Averages are exact-integer epoch sums divided once, so output
    is engine-parity exact.
    """
    frames = funnel_stage_frames(df, user_col, ts_col, stage_col, stages)
    out_rows = [frames[0].agg(
        F.lit(0).alias("stage_idx"),
        F.lit(stages[0]).alias("stage"),
        F.count("*").cast("long").alias("n_users"),
        F.lit(0.0).alias("avg_step_seconds"),
    )]
    for i, stage in enumerate(stages[1:], start=1):
        out_rows.append(frames[i].agg(
            F.lit(i).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count("*").cast("long").alias("n_users"),
            (
                # exact integer microsecond sum, divided once — engine-
                # parity safe (a float epoch() sum would be order-dependent)
                F.sum(F.unix_micros("_t") - F.unix_micros("_pt"))
                .cast("double") / F.count("*") / F.lit(1000000.0)
            ).alias("avg_step_seconds"),
        ))
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out


def funnel_stage_frames(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
    within_seconds: int | None = None,
) -> list[DataFrame]:
    """The funnel engine under ``funnel`` (and the catalog's
    conversion-rate funnel): per stage ``i`` a DataFrame of the users who
    reached it IN ORDER, with the qualifying timestamps —
    ``(_u, _t, _pt)`` where ``_t`` is the user's earliest qualifying
    stage-``i`` event and ``_pt`` the previous stage's (``_pt`` is NULL
    for stage 0). ``within_seconds`` additionally bounds each step:
    stage ``i+1`` must land in ``(t_i, t_i + within_seconds]`` — the
    bounded-window funnel product analytics defaults to.

    One implementation for every funnel variant (the percentile-rank
    lesson: two copies of the same multi-pass skeleton drift apart).
    Scale shape per stage: stage filter pushed to the scan, one
    co-partitioned equi-join on the user key against the previous
    stage's per-user mins (tiny; AQE broadcasts when it fits), one
    partial-aggregated min — deliberately multi-pass conditional-min,
    never a per-user ``collect_list`` fold, so a 10^8-event user costs
    nothing extra.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(stage_col).alias("_g"),
    )
    prev = (
        ev.filter(F.col("_g") == stages[0])
        .groupBy("_u").agg(F.min("_ts").alias("_t"))
    )
    frames = [prev.select(
        "_u", "_t", F.lit(None).cast("timestamp").alias("_pt"))]
    for stage in stages[1:]:
        cond = F.col("_ts") > F.col("_pt")
        if within_seconds is not None:
            cond &= (
                F.col("_ts")
                <= F.col("_pt") + F.expr(f"INTERVAL {within_seconds} SECOND")
            )
        nxt = (
            ev.filter(F.col("_g") == stage)
            .join(prev.select("_u", F.col("_t").alias("_pt")), "_u")
            .filter(cond)
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"), F.min("_pt").alias("_pt"))
        )
        frames.append(nxt)
        prev = nxt.select("_u", "_t")
    return frames


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    lookback: int = 7,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rolling-window anomaly scores: each point against the mean/std of
    the ``lookback`` points STRICTLY BEFORE it (its own value never
    contaminates its baseline — the self-exclusion that makes a level
    shift actually trip the alarm). Output:
    ``(key…, <order_col>, <value_col>, baseline_n, zscore, is_anomaly)``
    with ``zscore`` NULL (and ``is_anomaly`` false) until ``lookback``
    prior points exist — a partial baseline alarms on noise.

    Engine-parity contract: the window mean is an exact decimal(27,6)
    sum divided once; the variance is assembled from exact decimal
    Σx/Σx² moments in a fixed expression order
    (``(sumsq - sum²/n)/(n-1)``, sample variance), so the score is
    reproducible across engines and partitionings — the same
    decimal-moment pattern as profile_columns/group_regression, in a
    window instead of a groupBy.

    Scale shape: two decimal sums over ONE partitioned bounded window
    (per key, ordered by ``order_col``, ``lookback`` rows) — no
    unpartitioned window, no self-join, state O(lookback) per key.
    ``order_col`` must be unique per key (aggregate to the series grain
    first), as in ``ewma``.
    """
    if lookback < 2:
        raise ValueError(f"lookback must be >= 2, got {lookback}")
    k = list(key_cols)
    w = (
        Window.partitionBy(*k).orderBy(order_col)
        .rowsBetween(-lookback, -1)
    )
    v = F.col(value_col).cast("decimal(27,6)")
    n = F.count(value_col).over(w)
    s = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    mean = s.cast("double") / n
    # sample variance from exact moments, one fixed assembly order
    var = (
        (s2.cast("double") - s.cast("double") * s.cast("double") / n)
        / (n - F.lit(1))
    )
    z = (F.col(value_col).cast("double") - mean) / F.sqrt(var)
    # var > 0 guard: a constant baseline's variance can round to a tiny
    # negative when the exact decimal moments are assembled in doubles —
    # sqrt would NaN; a zero-variance baseline has no meaningful z either
    scored = (n >= F.lit(lookback)) & (var > F.lit(0.0))
    return df.select(
        *k,
        order_col,
        value_col,
        n.cast("long").alias("baseline_n"),
        F.when(scored, z).alias("zscore"),
        F.coalesce(
            scored & (F.abs(z) > F.lit(float(z_threshold))), F.lit(False)
        ).alias("is_anomaly"),
    )


def holt_smoothing(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + linear trend):

        level_t = alpha*x_t + (1-alpha)*(level_{t-1} + trend_{t-1})
        trend_t = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}

    seeded ``level_1 = x_1, trend_1 = 0`` (the zero-trend seed — simple
    and engine-neutral; the x_2-x_1 seed needs lookahead a first-element
    fold seed can't express). Returns one row per key:
    ``(key…, n_points, last_<order_col>, level, trend, forecast_1)``
    where ``forecast_1 = level + trend`` is the one-step-ahead forecast.

    Same engine-parity and scale contract as ``ewma`` (this is the
    two-state extension of that fold): a sequential left-to-right double
    fold over the ``order_col``-ordered series with a STRUCT accumulator
    — identical operation sequence as a DuckDB ``list_reduce`` with a
    struct state, so bit-exact across engines and partitionings. ONE
    shuffle to the key grain; O(rows-per-key) in one task; ``order_col``
    unique per key; NULL values excluded before folding (see ``ewma``).
    """
    for name, p in (("alpha", alpha), ("beta", beta)):
        if not 0.0 < p <= 1.0:
            raise ValueError(f"{name} must be in (0, 1], got {p}")
    k = list(key_cols)
    a, bt = float(alpha), float(beta)
    series = (
        df.select(*k, F.col(order_col).alias("_o"),
                  F.col(value_col).cast("double").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy(*k)
        .agg(
            F.sort_array(F.collect_list(F.struct("_o", "_v"))).alias("_s"),
            F.count("_v").alias("n_points"),
            F.max("_o").alias(f"last_{order_col}"),
        )
    )
    vals = F.transform("_s", lambda s: s["_v"])

    def step(acc, x):
        # level_t appears in both updates; the recomputed expression is
        # value-identical (same double ops) on both engines
        lvl = F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["t"])
        return F.struct(
            lvl.alias("l"),
            (F.lit(bt) * (lvl - acc["l"]) + F.lit(1.0 - bt) * acc["t"])
            .alias("t"),
        )

    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.struct(F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("t")),
        step,
    )
    return series.select(
        *k, "n_points", f"last_{order_col}",
        folded["l"].alias("level"),
        folded["t"].alias("trend"),
        (folded["l"] + folded["t"]).alias("forecast_1"),
    )


def event_transitions(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences
    → ``(from_state, to_state, n_transitions, prob)`` where ``prob`` is
    the row-normalized transition probability. The behavioral-modeling /
    synthetic-sequence primitive: what follows what, how often.

    ``tiebreak_col`` is REQUIRED (any per-key-unique column, e.g. the
    event id): same-timestamp events would otherwise make the sequence —
    and therefore the counts — partitioning-dependent. Counts are exact
    integers; ``prob`` is one integer-exact division, so output is
    engine-parity exact.

    Scale shape: one lead() over a window PARTITIONED by the key
    (O(events-per-key) state, keys parallelize), one partial-agg shuffle
    to the O(states²) pair grain, then row normalization as a window sum
    over that tiny frame. The fact is scanned once.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    counts = (
        pairs.groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    row_total = F.sum("n_transitions").over(
        Window.partitionBy("from_state")
    )
    return counts.select(
        "from_state", "to_state", "n_transitions",
        (F.col("n_transitions").cast("double") / row_total).alias("prob"),
    )


def peak_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Sweep-line maximum overlap: given per-row [start, end) intervals
    (sessions, rentals, connections), the peak number simultaneously
    active per group and when it is first reached — capacity planning's
    "how many concurrent at worst".

    The classic rewrite: explode each interval into a +1 event at start
    and a −1 at end, order by (ts, delta) within the group — the −1
    sorts FIRST on ties, so back-to-back intervals (one ends exactly
    when the next starts) do NOT double-count — take the running sum,
    and the peak is its max (earliest timestamp wins ties,
    deterministic). NULL-started rows are dropped; a NULL end means
    still-active (sorts after every real timestamp).

    Scale shape: one map-side explode (2 rows per interval), ONE shuffle
    to the group grain, one ordered window per group — O(intervals per
    group) window state, the honest cost of an inherently ordered
    question (same contract as the sessionizer)."""
    from pyspark.sql import Window

    s, e = F.col(start_col), F.col(end_col)
    ev = intervals.filter(s.isNotNull()).select(
        *group_cols,
        F.explode(F.array(
            F.struct(s.alias("ts"), F.lit(1).alias("delta")),
            F.struct(F.coalesce(e, F.lit(None)).alias("ts"),
                     F.lit(-1).alias("delta")),
        )).alias("_e"),
    ).select(*group_cols, F.col("_e.ts").alias("ts"),
             F.col("_e.delta").alias("delta"))
    # NULL end = still active: drop its -1 (never decrements)
    ev = ev.filter(~((F.col("delta") == -1) & F.col("ts").isNull()))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("ts").asc(), F.col("delta").asc())
    running = ev.withColumn(
        "concurrent",
        F.sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    pick = Window.partitionBy(*group_cols).orderBy(
        F.col("concurrent").desc(), F.col("ts").asc())
    return (
        running.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(*group_cols, F.col("concurrent").alias("peak_concurrent"),
                F.col("ts").alias("peak_at"))
    )


def cusum_alarms(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """Two-sided CUSUM change detection (Page 1954) per key — the
    classic drift alarm the EWMA/zscore pair doesn't give: cumulative
    deviations from a ``target`` mean,

        s_hi_t = max(0, s_hi_{t-1} + x_t − target − slack)
        s_lo_t = max(0, s_lo_{t-1} + target − x_t − slack)

    with an alarm whenever either side exceeds ``threshold`` (the side
    resets to 0 after alarming — restart monitoring). Returns one row
    per key: ``(key…, n_points, n_alarms, first_alarm_<order_col>,
    max_cusum)``.

    Engine-parity contract (the EWMA pattern): the recursion folds
    left-to-right over the key's series in ``order_col`` order with a
    STRUCT accumulator — identical operation sequence in any engine's
    fold, so results are bit-exact across runs, partitionings, and
    engines. One shuffle (groupBy key); O(rows-per-key) in one task is
    the honest cost of a sequential recursion; ``order_col`` must be
    unique per key (aggregate to the series grain first). NULL values
    are excluded before folding."""
    if slack < 0 or threshold <= 0:
        raise ValueError("need slack >= 0 and threshold > 0")
    k = list(key_cols)
    series = (
        df.select(*k, F.col(order_col).alias("_o"),
                  F.col(value_col).cast("double").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy(*k)
        .agg(
            F.sort_array(F.collect_list(F.struct("_o", "_v"))).alias("_s"),
            F.count("_v").alias("n_points"),
        )
    )
    tgt, sl, h = F.lit(float(target)), F.lit(float(slack)), F.lit(float(threshold))
    zero = F.lit(0.0)
    init = F.struct(
        zero.alias("hi"), zero.alias("lo"),
        F.lit(0).cast("long").alias("n_alarms"),
        F.lit(None).cast("long").alias("first_idx"),
        zero.alias("mx"),
    )

    def step(acc, e):
        x = e["_v"]
        hi = F.greatest(zero, acc["hi"] + x - tgt - sl)
        lo = F.greatest(zero, acc["lo"] + tgt - x - sl)
        fired = (hi > h) | (lo > h)
        idx = e["_i"]
        return F.struct(
            F.when(hi > h, zero).otherwise(hi).alias("hi"),
            F.when(lo > h, zero).otherwise(lo).alias("lo"),
            (acc["n_alarms"] + fired.cast("long")).alias("n_alarms"),
            F.coalesce(acc["first_idx"],
                       F.when(fired, idx)).alias("first_idx"),
            F.greatest(acc["mx"], hi, lo).alias("mx"),
        )

    # zip each element with its 1-based index so the alarm position is
    # part of the fold state
    indexed = F.zip_with(
        F.col("_s"),
        F.sequence(F.lit(1), F.size("_s")),
        lambda s, i: F.struct(s["_v"].alias("_v"), i.cast("long").alias("_i")),
    )
    folded = F.aggregate(indexed, init, step)
    orders = F.transform("_s", lambda s: s["_o"])
    return series.select(
        *k, "n_points",
        folded["n_alarms"].alias("n_alarms"),
        F.element_at(orders, folded["first_idx"].cast("int"))
        .alias(f"first_alarm_{order_col}"),
        folded["mx"].alias("max_cusum"),
    )


def holt_winters_additive(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    period: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int = 1,
) -> DataFrame:
    """Additive Holt-Winters triple exponential smoothing per key —
    level + trend + a ``period``-length seasonal profile:

        l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}

    seeded the standard way from the first season: ``l_m = mean(x_1..m)``,
    ``b_m = 0``, ``s_i = x_i − l_m``; smoothing starts at t = m+1. Keys
    with fewer than ``period + 1`` points emit no row (no season to
    seed). Returns ``(key…, n_points, level, trend, seasonal,
    forecast_h)`` where ``forecast_h = l + h·b + s_{t−m+((h−1) mod m)}``.

    Engine-parity contract (the ewma/holt/cusum pattern): one shuffle to
    the key grain, the recursion folds left-to-right via a struct
    accumulator carrying (level, trend, seasonal array, position) —
    fixed operation order, bit-reproducible across runs and
    partitionings (cross-engine parity is pinned by the pure-Python
    model test rather than a SQL oracle — the seasonal-array state is
    beyond a sane recursive CTE)."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{nm} must be in (0, 1], got {v}")
    k = list(key_cols)
    m = int(period)
    a, b, g = float(alpha), float(beta), float(gamma)
    series = (
        df.select(*k, F.col(order_col).alias("_o"),
                  F.col(value_col).cast("double").alias("_v"))
        .filter(F.col("_v").isNotNull())
        .groupBy(*k)
        .agg(
            F.sort_array(F.collect_list(F.struct("_o", "_v"))).alias("_s"),
            F.count("_v").alias("n_points"),
        )
        .filter(F.col("n_points") > m)
    )
    vals = F.transform("_s", lambda s: s["_v"])
    first = F.slice(vals, 1, m)
    # seed: l = mean of the first season (sequential fold / m), b = 0,
    # seasonal = deviations of the first season from l
    l0 = F.aggregate(first, F.lit(0.0), lambda acc, x: acc + x) / F.lit(float(m))
    init = F.struct(
        l0.alias("l"), F.lit(0.0).alias("b"),
        F.transform(first, lambda x: x - l0).alias("s"),
        F.lit(0).alias("pos"),  # next seasonal slot to consume (0-based)
    )

    def step(acc, x):
        sm = F.element_at(acc["s"], acc["pos"] + 1)  # s_{t-m}
        l_new = F.lit(a) * (x - sm) + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        b_new = F.lit(b) * (l_new - acc["l"]) + F.lit(1.0 - b) * acc["b"]
        s_new = F.lit(g) * (x - l_new) + F.lit(1.0 - g) * sm
        upd = F.concat(
            F.slice(acc["s"], 1, acc["pos"]),
            F.array(s_new),
            F.slice(acc["s"], acc["pos"] + 2, F.lit(m) - acc["pos"] - 1),
        )
        return F.struct(
            l_new.alias("l"), b_new.alias("b"), upd.alias("s"),
            (F.pmod(acc["pos"] + 1, F.lit(m))).alias("pos"),
        )

    rest = F.slice(vals, m + 1, F.greatest(F.size(vals) - m, F.lit(0)))
    st = F.aggregate(rest, init, step)
    h = int(horizon)
    fc_idx = F.pmod(st["pos"] + F.lit((h - 1) % m), F.lit(m)) + 1
    return series.select(
        *k, "n_points",
        st["l"].alias("level"),
        st["b"].alias("trend"),
        st["s"].alias("seasonal"),
        (st["l"] + F.lit(float(h)) * st["b"]
         + F.element_at(st["s"], fc_idx.cast("int"))).alias("forecast_h"),
    )


def forecast_backtest(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    season: int = 7,
) -> DataFrame:
    """Forecast-baseline backtest per series: one-step errors of the
    naive forecast (``v̂_t = v_{t−1}``) and the seasonal-naive forecast
    (``v̂_t = v_{t−m}``), reported as MAEs plus their ratio — the MASE
    denominator pair (Hyndman & Koehler 2006). Any model's MAE divided
    by ``mae_naive`` is its MASE; the shipped ratio
    ``mae_snaive / mae_naive`` < 1 is itself the classic "is there
    seasonality worth modeling" screen.

    Determinism: each |error| is one exact IEEE subtraction; the MAE
    accumulates in DECIMAL (order-invariant) with a single final
    double division — bit-identical across engines/partitionings.

    Scale shape: two lags over one window partitioned by the series
    key, one partial-agg groupBy. The series frame is already
    aggregated (points per key per tick), tiny next to the fact."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    d = (
        df.withColumn("_l1", F.lag(value_col, 1).over(w))
        .withColumn("_lm", F.lag(value_col, season).over(w))
    )
    e1 = F.abs(F.col(value_col) - F.col("_l1"))
    em = F.abs(F.col(value_col) - F.col("_lm"))
    dec = "decimal(27,10)"
    agg = d.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.count("_l1").cast("long").alias("n_eval_naive"),
        F.count("_lm").cast("long").alias("n_eval_snaive"),
        (F.sum(e1.cast(dec)).cast("double") / F.count("_l1"))
        .alias("mae_naive"),
        (F.sum(em.cast(dec)).cast("double") / F.count("_lm"))
        .alias("mae_snaive"),
    )
    return agg.withColumn(
        "snaive_vs_naive",
        F.when(F.col("mae_naive") > 0,
               F.col("mae_snaive") / F.col("mae_naive")),
    )


def classical_decompose(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    period: int,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method STL refines; Hyndman & Athanasopoulos FPP §3.4): per series
    ``value = trend + seasonal + remainder`` with
    trend = centered moving average over ``period`` points (defined only
    where the full window exists), seasonal = per-phase mean of the
    detrended values re-centered to sum to zero over one cycle, and
    remainder the leftover. ``period`` must be odd (the even case needs
    the 2×m double smoothing — out of scope by design, documented).

    Determinism: decimal-sum doubles can't round-trip BACK to decimal
    (shortest-repr vs exact-binary rounding diverges in the last digit
    across engines), so no messy double is ever re-cast: the phase mean
    is computed from the EXACT decimal numerator
    ``Σ(period·value − window_sum)`` divided once, and the re-centering
    mean is a pinned-order fold of the (few) phase means. Every output
    is then a fixed-order chain of double ops on bit-identical inputs —
    bit-exact across engines and partitionings.

    Scale shape: one key-partitioned ROWS window (state bounded by
    ``period``), one phase-grain partial-agg shuffle (O(keys·period)
    rows), broadcast joins back. The series frame is pre-aggregated —
    tiny next to the fact."""
    from pyspark.sql import Window

    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd >= 3, got {period}")
    half = period // 2
    dec = "decimal(27,6)"
    wo = Window.partitionBy(*key_cols).orderBy(ts_col)
    ww = wo.rowsBetween(-half, half)
    vdec = F.col(value_col).cast(dec)
    d = (
        df.withColumn("_i", F.row_number().over(wo))
        .withColumn("_phase", (F.col("_i") - 1) % period)
        .withColumn("_wn", F.count(F.lit(1)).over(ww))
        .withColumn("_wsum", F.sum(vdec).over(ww))
        .withColumn(
            "trend",
            F.when(F.col("_wn") == period,
                   F.col("_wsum").cast("double") / period))
    )
    phase = d.filter(F.col("trend").isNotNull()).groupBy(
        *key_cols, "_phase"
    ).agg(
        # EXACT decimal numerator of Σ(v − wsum/P): Σ(P·v − wsum)
        F.sum(vdec * period - F.col("_wsum")).alias("_num"),
        F.count(F.lit(1)).alias("_nj"),
    ).withColumn(
        "_praw",
        F.col("_num").cast("double") / (F.col("_nj") * period))
    center = phase.groupBy(*key_cols).agg(
        (F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_phase", "_praw"))),
                lambda x: x["_praw"]),
            F.lit(0.0), lambda acc, x: acc + x)
         / F.count(F.lit(1))).alias("_pmean"))
    seas = phase.join(center, key_cols).select(
        *key_cols, "_phase",
        (F.col("_praw") - F.col("_pmean")).alias("seasonal"))
    return (
        d.join(seas, [*key_cols, "_phase"], "left")
        .select(
            *key_cols, ts_col, F.col(value_col).alias("value"),
            "trend", "seasonal",
            (F.col(value_col) - F.col("trend") - F.col("seasonal"))
            .alias("remainder"),
        )
    )


def changepoint_single(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    min_seg: int = 2,
) -> DataFrame:
    """Single best changepoint per series (one round of binary
    segmentation, Scott & Knott / CUSUM-of-squares family): the split
    ``k`` that minimizes the two-segment squared-error cost

        cost(k) = SSE(x_1..k) + SSE(x_{k+1}..n),
        SSE via the prefix identity  Σx² − (Σx)²/len

    reported with its gain over the unsplit cost — the classic "is
    there a level shift, and where" screen, one fixed round of the
    recursive changepoint detectors (PELT/binseg) so it stays
    SQL-oracle-checkable.

    Engine parity: prefix sums Σx, Σx² accumulate in DECIMAL (exact,
    order-invariant). Values are carried at DECIMAL(16,6) so the square
    lands at DECIMAL(33,12) — exactly representable in BOTH engines
    (a (19,6) square needs precision 39 > 38 and silently loses a digit
    differently per engine — measured 1e-5 drift after the Σx²−(Σx)²/n
    cancellation — while DuckDB runs an (18,6) square in int64 and
    overflows); prefix sums are carried at DECIMAL(37,12), NOT 38, so
    the total−prefix subtraction lands at (38,12) exactly (Spark's
    (38,12)−(38,12) rounds to scale 11). |x| must fit ~1e10, Σx² ~1e25
    — the documented envelope. Every division
    happens in DOUBLE with one pinned expression tree
    ``S2 − (S1·S1)/len`` per segment, so cost/gain are bit-identical
    across engines. NULL values are dropped up front (the
    quantile_normalize/mann_whitney contract). Ties on cost break to
    the SMALLEST k. Keys with n < 2·min_seg emit no row.

    Scale shape: one shuffle to the key grain for the ordered window
    prefix sums (per-key state only), a map-side candidate filter
    (min_seg ≤ k ≤ n−min_seg), one argmin partial-agg groupBy, and a
    broadcastable O(keys) totals join. No collect, no cross join —
    candidates live on the same rows as the prefix sums."""
    if min_seg < 1:
        raise ValueError(f"min_seg must be >= 1, got {min_seg}")
    k = list(key_cols)
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(*k, F.col(order_col).alias("_o"),
                F.col(value_col).cast("decimal(16,6)").alias("_v"))
    )
    w = Window.partitionBy(*k).orderBy("_o")
    pre = (
        d.withColumn("_rn", F.row_number().over(w).cast("long"))
        .withColumn("_s1", F.sum("_v").over(w).cast("decimal(37,12)"))
        .withColumn("_s2", F.sum(
            (F.col("_v") * F.col("_v")).cast("decimal(33,12)"))
            .over(w).cast("decimal(37,12)"))
    )
    totals = pre.groupBy(*k).agg(
        F.max("_rn").alias("_n"),
        F.max_by("_s1", "_rn").alias("_t1"),
        F.max_by("_s2", "_rn").alias("_t2"),
    )
    cand = (
        pre.join(F.broadcast(totals), k)
        .filter((F.col("_rn") >= min_seg)
                & (F.col("_rn") <= F.col("_n") - min_seg))
    )
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    r1 = (F.col("_t1") - F.col("_s1")).cast("double")  # exact decimal sub
    r2 = (F.col("_t2") - F.col("_s2")).cast("double")
    kk = F.col("_rn").cast("double")
    rk = (F.col("_n") - F.col("_rn")).cast("double")
    cost = (s2 - (s1 * s1) / kk) + (r2 - (r1 * r1) / rk)
    best = (
        cand.withColumn("_cost", cost)
        .groupBy(*k)
        .agg(F.min(F.struct(
            F.col("_cost").alias("_c"), F.col("_rn").alias("_k"),
            F.col("_o").alias("_ord"))).alias("_m"),
            F.max("_n").alias("n_points"),
            F.max("_t1").alias("_ft1"), F.max("_t2").alias("_ft2"))
    )
    t1 = F.col("_ft1").cast("double")
    t2 = F.col("_ft2").cast("double")
    nn = F.col("n_points").cast("double")
    total_sse = t2 - (t1 * t1) / nn
    return best.select(
        *k, "n_points",
        F.col("_m._k").alias("cp_index"),
        F.col("_m._ord").alias("cp_order"),
        F.col("_m._c").alias("cost"),
        (total_sse - F.col("_m._c")).alias("gain"),
    )


def rolling_median(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    lookback: int = 7,
) -> DataFrame:
    """Exact trailing-window LOWER median per series — the robust
    rolling baseline next to :func:`rolling_zscore`'s mean/std (a single
    spike moves a 7-point mean by spike/7 but leaves the median
    untouched). Window = the last ``lookback`` rows INCLUDING the
    current one; rows before a full window report the median of what
    exists (n_window < lookback flags the ramp-up rows).

    Bit-exactness by construction: the lower median PICKS an actual
    value (sorted window, element ``(n+1) DIV 2``) — zero float
    arithmetic, so engines agree for free (the same order-statistic
    contract as ``mad_outliers``). The window orders by
    ``(order_col, value_col)`` — a total order, so tied order values
    can't make frame membership partition-order-dependent. NULL values
    are dropped up front.

    Scale shape: one shuffle to the key grain, one ordered ROWS window
    whose state is O(lookback) per row — collect_list over a bounded
    frame, never a per-key global sort beyond the window's own."""
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    k = list(key_cols)
    w = (
        Window.partitionBy(*k)
        .orderBy(order_col, value_col)
        .rowsBetween(-(lookback - 1), 0)
    )
    arr = F.sort_array(F.collect_list(value_col).over(w))
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("_arr", arr)
        .select(
            *k, order_col, value_col,
            F.size("_arr").cast("long").alias("n_window"),
            F.element_at(
                "_arr", F.expr("(size(_arr) + 1) DIV 2").cast("int")
            ).alias("rolling_median"),
        )
    )


def burstiness_report(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    min_events: int = 3,
) -> DataFrame:
    """Inter-arrival burstiness per key (Goh & Barabási 2008): gap
    statistics over consecutive event timestamps —
    ``B = (σ − μ)/(σ + μ)`` of the gap distribution, −1 for a perfect
    clock, →0 Poisson, →1 bursty — plus the coefficient of variation.
    The "is this entity a human or a cron job" screen.

    Engine parity: gaps are exact integer MICROSECONDS (unix_micros
    subtraction — the test timestamps carry sub-second parts, and a
    seconds floor would round differently per engine); moments
    accumulate as exact integers (gaps at DECIMAL(18,0), sums widened
    to DECIMAL(38,0)); variance uses the pinned tree
    ``(n·Σg² − Σg·Σg)/(n·n)`` evaluated in DOUBLE, then one
    correctly-rounded sqrt, then the B and CV divisions —
    bit-identical across engines (the mann_whitney sigma pattern).
    Keys with fewer than ``min_events`` events (< 2 gaps) emit no
    row.

    Scale shape: one shuffle to the key grain for the ordered lag
    window, one partial-agg groupBy of the integer moments."""
    k = list(key_cols)
    w = Window.partitionBy(*k).orderBy("_ts")
    gaps = (
        df.select(*k, F.col(ts_col).cast("timestamp").alias("_ts"))
        .withColumn("_prev", F.lag("_ts").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            *k,
            (F.unix_micros("_ts") - F.unix_micros("_prev"))
            .cast("decimal(18,0)").alias("_g"),
        )
    )
    agg = gaps.groupBy(*k).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("_g").cast("decimal(38,0)").alias("_s1"),
        F.sum((F.col("_g") * F.col("_g")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("_s2"),
    ).filter(F.col("n_gaps") >= min_events - 1)
    nd = F.col("n_gaps").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / nd
    var = (nd * s2 - s1 * s1) / (nd * nd)
    sigma = F.sqrt(var)
    return agg.select(
        *k, "n_gaps",
        mean.alias("mean_gap_us"),
        sigma.alias("sigma_gap_us"),
        F.when(mean != 0.0, sigma / mean).alias("cv"),
        F.when((sigma + mean) != 0.0,
               (sigma - mean) / (sigma + mean)).alias("burstiness"),
    )
