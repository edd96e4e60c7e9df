"""Markov-chain conversion attribution (removal effects).

Last-touch / first-touch attribution hands all credit to one touchpoint;
the Markov model (Anderl et al. 2014, "Mapping the customer journey")
credits each channel by how much the overall conversion probability
DROPS when the channel is removed from the journey graph — the
data-driven attribution the funnel/journey operators feed.

Spark does the corpus-sized work: journeys truncate at their first
conversion, transitions count with one key-partitioned window + one
partial-agg shuffle. The chain itself is O(channels²) — a handful of
states — so the absorbing-chain solve ``(I − Q)x = r`` and the
per-channel removal re-solves run driver-side in numpy (the same
collect-the-tiny-summary split as the BPE heap trainer; hauling a 10×10
matrix through a distributed solver would be scale theater).

The solve is float linear algebra (LAPACK) — deterministic for a given
matrix on a given platform but not a cross-engine bit contract, so the
catalog entry is rows-only and the MATH is pinned by hand-solvable
pytest chains instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START, CONV, NULL = "(start)", "(conversion)", "(null)"


def journey_transitions(
    df: DataFrame,
    journey_cols: list[str],
    ts_col: str = "ts",
    channel_col: str = "event_type",
    id_col: str = "event_id",
    conversion: str = "purchase",
) -> DataFrame:
    """(src, dst, n) transition counts over journeys: each journey is the
    channel sequence BEFORE its first ``conversion`` event, wrapped as
    START → c1 → … → ck → CONV (converted) or NULL (never converted).
    The conversion event itself is the absorber, not a touchpoint.

    One window over (journey, ts, id) + one partial-agg shuffle."""
    jid = [F.col(c) for c in journey_cols]
    w = Window.partitionBy(*journey_cols).orderBy(ts_col, id_col)
    conv_ts = F.min(
        F.when(F.col(channel_col) == conversion, F.col(ts_col))
    ).over(Window.partitionBy(*journey_cols))
    d = df.withColumn("_cts", conv_ts)
    touches = d.filter(
        F.col("_cts").isNull() | (F.col(ts_col) < F.col("_cts"))
    ).filter(F.col(channel_col) != conversion)
    seq = touches.withColumn(
        "_prev", F.lag(channel_col).over(w)
    ).withColumn("_nxt", F.lead(channel_col).over(w))
    mids = seq.select(
        F.coalesce(F.col("_prev"), F.lit(START)).alias("src"),
        F.col(channel_col).alias("dst"),
    )
    converted = F.max(
        (F.col(channel_col) == conversion).cast("int"))
    ends = (
        seq.filter(F.col("_nxt").isNull())
        .join(
            d.groupBy(*journey_cols).agg(converted.alias("_conv")),
            journey_cols,
        )
        .select(
            F.col(channel_col).alias("src"),
            F.when(F.col("_conv") == 1, F.lit(CONV))
            .otherwise(F.lit(NULL)).alias("dst"),
        )
    )
    # journeys whose FIRST event is the conversion: START -> CONV direct
    empty = (
        d.groupBy(*journey_cols).agg(
            converted.alias("_conv"),
            F.max((F.col(channel_col) != conversion).cast("int")
                  * F.when(F.col("_cts").isNull()
                           | (F.col(ts_col) < F.col("_cts")), 1)
                  .otherwise(0)).alias("_touched"),
        )
        .filter((F.col("_conv") == 1) & (
            F.col("_touched").isNull() | (F.col("_touched") == 0)))
        .select(F.lit(START).alias("src"), F.lit(CONV).alias("dst"))
    )
    return (
        mids.unionByName(ends).unionByName(empty)
        .groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    )


def _solve_conversion(trans: dict, states: list) -> float:
    """Absorbing-chain conversion probability from START: solve
    ``(I − Q)x = r`` over the transient states."""
    import numpy as np

    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    q = np.zeros((k, k))
    r = np.zeros(k)
    totals = {s: 0 for s in states}
    for (s, d), n in trans.items():
        if s in idx:
            totals[s] += n
    for (s, d), n in trans.items():
        if s not in idx or totals[s] == 0:
            continue
        p = n / totals[s]
        if d == CONV:
            r[idx[s]] += p
        elif d in idx:
            q[idx[s], idx[d]] += p
        # d == NULL or a removed channel: probability mass lost
    x = np.linalg.solve(np.eye(k) - q, r)
    return float(x[idx[START]]) if START in idx else 0.0


def markov_attribution(
    df: DataFrame,
    journey_cols: list[str],
    ts_col: str = "ts",
    channel_col: str = "event_type",
    id_col: str = "event_id",
    conversion: str = "purchase",
) -> DataFrame:
    """Per-channel removal-effect attribution: ``removal_effect`` =
    ``1 − P(conv | channel removed) / P(conv)``, ``attribution_share``
    normalizes the effects, ``attributed_conversions`` allocates the
    observed conversion count. Spark builds the transition counts; the
    O(channels²) chain solves driver-side."""
    spark = df.sparkSession
    rows = journey_transitions(
        df, journey_cols, ts_col, channel_col, id_col, conversion).collect()
    trans = {(r["src"], r["dst"]): int(r["n"]) for r in rows}
    channels = sorted(({s for s, _d in trans} | {d for _s, d in trans})
                      - {START, CONV, NULL})
    base_states = [START, *channels]
    p_all = _solve_conversion(trans, base_states)
    n_conv = sum(n for (s, d), n in trans.items() if d == CONV)
    effects = []
    for c in channels:
        states = [START] + [x for x in channels if x != c]
        # drop the removed channel's outgoing rows entirely; transitions
        # INTO it fall through as lost mass inside _solve_conversion
        sub = {(s, d): n for (s, d), n in trans.items() if s != c}
        p_without = _solve_conversion(sub, states) if p_all > 0 else 0.0
        eff = 0.0 if p_all == 0 else max(0.0, 1.0 - p_without / p_all)
        effects.append((c, eff))
    total = sum(e for _c, e in effects)
    out = [
        (c, float(p_all), float(e),
         float(e / total) if total > 0 else 0.0,
         float(n_conv * e / total) if total > 0 else 0.0)
        for c, e in effects
    ]
    return spark.createDataFrame(
        out, "channel string, p_conversion double, removal_effect double, "
             "attribution_share double, attributed_conversions double",
    )
