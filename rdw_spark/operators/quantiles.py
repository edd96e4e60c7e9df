"""Mergeable quantile sketches — the percentile twin of the HLL
distinct-count cube (``profiling.distinct_sketch_rollup``).

A raw ``percentile``/``approx_percentile`` answers ONE slicing of the
fact and rescans it for the next question. This module builds a
merging digest (t-digest family, Dunning & Ertl; ``k2``-style scale —
cluster weight capped at ``4·W·q(1−q)/delta``) per fine-grained group ONCE, after which ANY
coarser-grained quantile question is answered by merging the O(groups)
digest table — the 100 TB pattern for percentile dashboards over
arbitrary slices.

Scale shape: ``mapInPandas`` builds per-partition partial digests
(user-space map-side combine — each partition emits at most
#groups-it-saw rows of O(delta) centroids), then ONE shuffle on the
group keys merges partials. The fact's values never shuffle. All digest
math is vectorized numpy inside Arrow batches; no row-at-a-time Python.

Determinism contract (the HLL contract, pytest-locked): building or
merging the SAME partial digests is bit-deterministic (centroids are
processed in a total (mean, weight) sort order), and merge-then-ask
agrees with rebuild-from-scratch within the error envelope — but NOT
bit-exactly, and a different input partitioning yields different (still
within-envelope) partials, so never assert cross-partitioning equality.

Error: the q(1−q) weight cap means rank error ≤ 4·q(1−q)/delta —
≤ 1/delta at the median (delta=200 → ≤0.5%) and shrinking toward the
extremes, where clusters degrade to singletons; exact min/max are
carried so the tails interpolate against true endpoints. State is
O(delta·log) centroids rather than the k0 scale's flat delta — the
usual t-digest trade, chosen here because tail percentiles (p99s) are
what profile/report workloads actually ask for.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SKETCH_FIELDS = [
    T.StructField("means", T.ArrayType(T.DoubleType(), False), False),
    T.StructField("weights", T.ArrayType(T.DoubleType(), False), False),
    T.StructField("vmin", T.DoubleType(), True),
    T.StructField("vmax", T.DoubleType(), True),
    T.StructField("n", T.LongType(), False),
]


def _compress(means: np.ndarray, weights: np.ndarray, delta: int):
    """Fold sorted centroids into O(delta·log) clusters under the
    t-digest weight bound ``w_cluster ≤ 4·W·q(1−q)/delta`` (the k2-style
    scale function): clusters shrink toward the extremes, so tail
    quantiles keep near-exact rank resolution while the middle stays
    O(W/delta). Deterministic: input is put in a total (mean, weight)
    order first, and the running weighted mean is accumulated in that
    fixed order."""
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_so_far = 0.0
    for m, w in zip(means[1:], weights[1:]):
        proposed = cur_w + w
        qm = (w_so_far + proposed / 2.0) / total
        if proposed <= 4.0 * total * qm * (1.0 - qm) / delta:
            cur_w = proposed
            cur_m += (m - cur_m) * (w / cur_w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_so_far += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _digest_row(key, means, weights, vmin, vmax, n, delta):
    m, w = _compress(np.asarray(means, float), np.asarray(weights, float), delta)
    return (*key, m, w, vmin, vmax, n)


def _out_schema(df: DataFrame, group_cols: list[str]) -> T.StructType:
    return T.StructType(
        [df.schema[c] for c in group_cols] + list(_SKETCH_FIELDS)
    )


def quantile_sketch_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    delta: int = 200,
) -> DataFrame:
    """Build one mergeable quantile digest per group:
    ``(group…, means, weights, vmin, vmax, n)``. NULL values are ignored
    (percentile semantics); a group of only NULLs yields n=0 with NULL
    bounds. One shuffle (the partial-digest merge); the fact never
    shuffles its values."""
    cols = [*group_cols, value_col]
    out_schema = _out_schema(df, group_cols)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # partial digest per group seen by THIS partition (map-side combine)
        acc: dict[tuple, list[np.ndarray]] = {}
        for pdf in batches:
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                v = g[value_col].to_numpy(dtype=float)
                acc.setdefault(k, []).append(v[~np.isnan(v)])
        rows = []
        for k, chunks in acc.items():
            v = np.concatenate(chunks) if chunks else np.empty(0)
            if v.size == 0:
                rows.append((*k, [], [], None, None, 0))
                continue
            rows.append(_digest_row(
                k, v, np.ones_like(v), float(v.min()), float(v.max()),
                int(v.size), delta,
            ))
        yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    partials = df.select(*cols).mapInPandas(build, out_schema)
    return merge_quantile_sketches(partials, group_cols, delta)


def merge_quantile_sketches(
    sketches: DataFrame, group_cols: list[str], delta: int = 200
) -> DataFrame:
    """Roll a digest table up to a coarser grain (or merge per-batch
    digests of the same grain): concatenate centroids per surviving
    group and re-compress. Input is the tiny digest table — the fact is
    never rescanned, which is the whole point."""
    out_schema = _out_schema(sketches, group_cols)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        means = [np.asarray(x, float) for x in pdf["means"] if len(x)]
        if not means:
            row = (*key, [], [], None, None, 0)
            return pd.DataFrame([row], columns=[f.name for f in out_schema.fields])
        m = np.concatenate(means)
        w = np.concatenate(
            [np.asarray(x, float) for x in pdf["weights"] if len(x)])
        row = _digest_row(
            key, m, w,
            float(pdf["vmin"].min()), float(pdf["vmax"].max()),
            int(pdf["n"].sum()), delta,
        )
        return pd.DataFrame([row], columns=[f.name for f in out_schema.fields])

    return sketches.groupBy(*group_cols).applyInPandas(merge, out_schema)


def sketch_quantiles(
    sketches: DataFrame, qs: list[float], prefix: str = "q_"
) -> DataFrame:
    """Add one estimate column per requested quantile (``q_50`` for
    0.5, …): midpoint-interpolation over the digest's centroids with the
    exact min/max as endpoints. Vectorized over rows in one Arrow batch
    pass; empty digests (n=0) estimate NULL."""
    qlist = list(qs)

    @F.pandas_udf("array<double>")
    def est(means: pd.Series, weights: pd.Series,
            vmin: pd.Series, vmax: pd.Series) -> pd.Series:
        out = []
        for m, w, lo, hi in zip(means, weights, vmin, vmax):
            m = np.asarray(m, float)
            w = np.asarray(w, float)
            if m.size == 0:
                out.append([None] * len(qlist))
                continue
            total = w.sum()
            mid = np.cumsum(w) - w / 2.0
            x = np.concatenate(([0.0], mid, [total]))
            y = np.concatenate(([lo], m, [hi]))
            out.append([float(np.interp(q * total, x, y)) for q in qlist])
        return pd.Series(out)

    out = sketches.withColumn("_est", est("means", "weights", "vmin", "vmax"))
    for i, q in enumerate(qlist):
        name = f"{prefix}{str(q).replace('0.', '').replace('.', '_')}"
        out = out.withColumn(name, F.element_at("_est", i + 1))
    return out.drop("_est")


def sketch_percentile_of(
    sketches: DataFrame,
    values: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "pct_est",
) -> DataFrame:
    """Inverse quantile lookup: estimate each row's percentile WITHIN
    ITS GROUP's stored digest — scoring incoming values against a
    historical distribution without rescanning the history (the digest
    cube is the history). The estimator mirrors
    :func:`sketch_quantiles` exactly (midpoint interpolation with the
    exact min/max as endpoints), so ``sketch_percentile_of`` and
    ``sketch_quantiles`` are inverse maps of the same curve.

    Scale shape: the digest table is O(groups) and broadcasts into the
    join; estimation is one vectorized Arrow pass over the joined rows
    — the scored frame never shuffles. Values outside [vmin, vmax] clamp
    to 0/1; rows whose group has no digest (or an empty one) estimate
    NULL."""
    joined = values.join(
        F.broadcast(sketches.select(
            *group_cols, "means", "weights", "vmin", "vmax")),
        group_cols, "left")

    @F.pandas_udf("double")
    def est(v: pd.Series, means: pd.Series, weights: pd.Series,
            vmin: pd.Series, vmax: pd.Series) -> pd.Series:
        out = []
        for x, m, w, lo, hi in zip(v, means, weights, vmin, vmax):
            if x is None or m is None or len(m) == 0:
                out.append(None)
                continue
            m = np.asarray(m, float)
            w = np.asarray(w, float)
            total = w.sum()
            mid = np.cumsum(w) - w / 2.0
            xs = np.concatenate(([lo], m, [hi]))
            ys = np.concatenate(([0.0], mid, [total]))
            out.append(float(np.interp(float(x), xs, ys) / total))
        return pd.Series(out)

    return joined.withColumn(
        out_col,
        est(F.col(value_col).cast("double"), "means", "weights",
            "vmin", "vmax"),
    ).drop("means", "weights", "vmin", "vmax")


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Quantile normalization across groups (the score-equating /
    batch-effect-removal transform): replace each row's value with the
    GLOBAL order statistic at the row's within-group quantile, so every
    group's marginal distribution becomes the pooled one while rank
    order inside each group is preserved. The cross-cohort equating
    shape behind "compare scores from different test forms" — and the
    microarray-normalization classic (Bolstad et al. 2003).

    Semantics (all integer arithmetic — bit-exact across engines):
    within-group rank ``rg`` by (value, id); group size ``ng``; global
    target rank ``t = (rg−1)·(N−1) DIV (ng−1) + 1`` (a singleton group
    maps to the pooled median ``(N−1) DIV 2 + 1``); ``normalized`` =
    the value whose global (value, id) rank equals ``t``.

    NULL values carry no rank information and are dropped up front
    (the same contract as ``mann_whitney_u`` / ``mad_outliers``) —
    otherwise Spark's NULLS FIRST window order and an oracle's NULLS
    LAST would silently disagree on every rank.

    Scale shape: the within-group rank is a window PARTITIONED by
    group; the global rank table comes from the two-phase distributed
    prefix scan (``packing.with_global_offset`` — range partitions +
    per-partition windows + an O(partitions) offset collect, never a
    single-task global sort); the final lookup is a plain integer
    equi-join. No driver-side data beyond the partition offsets."""
    from pyspark.sql import Window

    from rdw_spark.operators.packing import with_global_offset

    df = df.filter(F.col(value_col).isNotNull())
    wg = Window.partitionBy(group_col).orderBy(value_col, id_col)
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_ng"))
    n = df.select(F.count(F.lit(1)).alias("_n"))
    ranked_src = (
        df.select(value_col, id_col)
        .withColumn("_one", F.lit(1))
        .withColumn("_k", F.struct(F.col(value_col), F.col(id_col)))
    )
    ref = (
        with_global_offset(ranked_src, "_one", "_k", out_col="_off")
        .select((F.col("_off") + 1).alias("_t"),
                F.col(value_col).alias("normalized"))
    )
    tagged = (
        df.withColumn("_rg", F.row_number().over(wg).cast("long"))
        .join(F.broadcast(sizes), group_col)
        .crossJoin(F.broadcast(n))
        .withColumn(
            "_t",
            F.when(F.col("_ng") == 1,
                   F.expr("(_n - 1) DIV 2") + F.lit(1))
            .otherwise(
                F.expr("((_rg - 1) * (_n - 1)) DIV (_ng - 1)") + F.lit(1)),
        )
    )
    return (
        tagged.join(ref, "_t")
        .select(id_col, group_col, value_col, "normalized")
    )
