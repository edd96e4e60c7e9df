"""Unified sketch cube: every mergeable summary a profile dashboard
needs, materialized in ONE scan of the fact.

The per-sketch modules each answer one family of questions from a
bounded per-group summary (``quantiles`` t-digests, ``freqitems``
Misra-Gries top-k, ``profiling`` HLL distinct counts) — but a dashboard
wants all three per slice, and calling the three rollups separately
scans and shuffles the fact three times. ``summary_cube`` builds every
requested sketch in a single ``mapInPandas`` partial pass (map-side
combine: each partition emits one row per group it saw, carrying ALL
the partials) followed by ONE shuffle on the group keys — the plan has
exactly one Exchange over the fact, pytest-locked.

Spec: ``[(out_name, kind, col, param)]`` with kinds
``"quantile"`` (param = t-digest delta), ``"topk"`` (param = kept
items m), ``"distinct"`` (param = lgk; 2**lgk one-byte registers), and
``"kmv"`` (param = k; the k smallest distinct hashes — the
set-operation sketch, EXACT merges and interoperable with
``operators.kmv``'s sign-flipped hash order).
Output: group cols + flat ``<name>__*`` sketch-state columns; read
human numbers off with :func:`summary_readout`, roll up to coarser
grains (or merge streaming per-batch deltas) with
:func:`merge_summary_cubes`.

Determinism: the distinct sketch hashes values JVM-side
(``xxhash64`` — engine-stable) and its registers merge by elementwise
max, so the merged registers are BIT-IDENTICAL to a one-shot build
under ANY partitioning (stronger than the DataSketches union contract
in ``profiling.distinct_sketch_rollup``). Digest and top-k partials
inherit their modules' contracts: bit-deterministic given the same
partials, error-envelope (not bit) equality across partitionings.

HLL estimator per Flajolet et al. 2007: ``alpha_m·m²/Σ2^-M_j`` with the
linear-counting small-range correction; 64-bit hashes make the
large-range correction irrelevant. Relative error ≈ 1.04/sqrt(2^lgk)
(lgk=12 → ~1.6%).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rdw_spark.operators.freqitems import _truncate
from rdw_spark.operators.quantiles import _compress

SummarySpec = "list[tuple[str, str, str, int]]"  # (name, kind, col, param)

_KINDS = ("quantile", "topk", "distinct", "kmv")


def _validate(spec) -> None:
    if not spec:
        raise ValueError("spec must be non-empty")
    seen = set()
    for name, kind, _col, param in spec:
        if kind not in _KINDS:
            raise ValueError(f"unknown sketch kind {kind!r} (want {_KINDS})")
        if name in seen:
            raise ValueError(f"duplicate output name {name!r}")
        seen.add(name)
        if kind == "distinct" and not (4 <= param <= 18):
            raise ValueError(f"lgk {param} out of range [4, 18]")
        if kind == "kmv" and param < 2:
            raise ValueError(f"kmv k {param} must be >= 2")
        if kind == "quantile" and param < 8:
            raise ValueError(f"delta {param} too small")
        if kind == "topk" and param < 1:
            raise ValueError(f"m {param} must be >= 1")


def _sketch_fields(spec) -> list[T.StructField]:
    fields: list[T.StructField] = []
    for name, kind, _col, _param in spec:
        if kind == "quantile":
            fields += [
                T.StructField(f"{name}__means", T.ArrayType(T.DoubleType(), False)),
                T.StructField(f"{name}__weights", T.ArrayType(T.DoubleType(), False)),
                T.StructField(f"{name}__vmin", T.DoubleType()),
                T.StructField(f"{name}__vmax", T.DoubleType()),
                T.StructField(f"{name}__n", T.LongType()),
            ]
        elif kind == "topk":
            fields += [
                T.StructField(f"{name}__items", T.ArrayType(T.StringType(), False)),
                T.StructField(f"{name}__counts", T.ArrayType(T.LongType(), False)),
                T.StructField(f"{name}__dropped", T.LongType()),
                T.StructField(f"{name}__ntotal", T.LongType()),
            ]
        elif kind == "distinct":
            fields += [T.StructField(f"{name}__regs", T.BinaryType())]
        else:  # kmv
            fields += [T.StructField(
                f"{name}__kmv", T.ArrayType(T.LongType(), False))]
    return fields


def _out_schema(df: DataFrame, group_cols: list[str], spec) -> T.StructType:
    return T.StructType([df.schema[c] for c in group_cols] + _sketch_fields(spec))


def _clz64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64. Exact: float64 log2 is
    exact on powers of two and cannot cross a power-of-two boundary for
    32-bit inputs (relative precision ~1e-16 vs the ~1e-10 gap)."""
    hi = (w >> np.uint64(32)).astype(np.uint32)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = np.full(w.shape, 64, dtype=np.int64)
    lo_nz = lo > 0
    out[lo_nz] = 63 - np.floor(np.log2(lo[lo_nz].astype(np.float64))).astype(np.int64)
    hi_nz = hi > 0
    out[hi_nz] = 31 - np.floor(np.log2(hi[hi_nz].astype(np.float64))).astype(np.int64)
    return out


def _hll_update(regs: np.ndarray, hashes: np.ndarray, lgk: int) -> None:
    """Fold signed-int64 xxhash64 values into the one-byte register
    array in place: index = top lgk bits, rank = clz(remaining)+1."""
    h = hashes.astype(np.int64).view(np.uint64)
    idx = (h >> np.uint64(64 - lgk)).astype(np.int64)
    w = (h << np.uint64(lgk)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    rank = np.minimum(_clz64(w) + 1, 64 - lgk + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet 2007 estimate with the linear-counting small-range
    correction. Deterministic in the registers."""
    m = float(regs.size)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(raw)


def summary_cube(
    df: DataFrame,
    group_cols: list[str],
    spec,
) -> DataFrame:
    """Materialize every sketch in ``spec`` per group in one scan.

    Plan shape: project (group cols + value cols + JVM ``xxhash64`` for
    the distinct sketches) → mapInPandas partials (one row per group per
    partition; all sketch math vectorized numpy) → ONE hash Exchange on
    the group keys → applyInPandas merge. NULL values are skipped per
    sketch (the per-sketch modules' convention); a group whose values
    are all NULL still appears with empty sketches."""
    _validate(spec)
    sel: list = [F.col(c) for c in group_cols]
    for name, kind, col, _param in spec:
        if kind == "distinct":
            # Hash JVM-side (engine-stable). The hash column must stay
            # NON-nullable: a nullable int64 with any NULL in the batch
            # becomes float64 in pandas and every hash round-trips
            # through a 53-bit mantissa, silently corrupting the low
            # bits. xxhash64 is never null (NULL input yields the seed),
            # so keep it unconditional and carry a validity flag.
            sel.append(F.xxhash64(F.col(col)).alias(f"_in_{name}"))
            sel.append(F.col(col).isNotNull().alias(f"_nn_{name}"))
        elif kind == "kmv":
            # sign-flipped so SIGNED int64 order == UNSIGNED hash order
            # (operators.kmv's convention — sketches interoperate);
            # same non-nullable + flag shape as "distinct" above
            sel.append(
                F.xxhash64(F.col(col))
                .bitwiseXOR(F.lit(-9223372036854775808))
                .alias(f"_in_{name}"))
            sel.append(F.col(col).isNotNull().alias(f"_nn_{name}"))
        elif kind == "quantile":
            sel.append(F.col(col).cast("double").alias(f"_in_{name}"))
        else:
            sel.append(F.col(col).cast("string").alias(f"_in_{name}"))
    out_schema = _out_schema(df, group_cols, spec)
    names = [f.name for f in out_schema.fields]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-group accumulators for THIS partition (map-side combine)
        qacc: dict[tuple, dict[str, list]] = {}
        tacc: dict[tuple, dict[str, dict]] = {}
        ttot: dict[tuple, dict[str, int]] = {}
        hacc: dict[tuple, dict[str, np.ndarray]] = {}
        kacc: dict[tuple, dict[str, np.ndarray]] = {}
        keys_seen: dict[tuple, None] = {}
        for pdf in batches:
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                keys_seen.setdefault(k)
                for name, kind, _col, param in spec:
                    v = g[f"_in_{name}"]
                    if kind == "quantile":
                        x = v.to_numpy(dtype=float)
                        x = x[~np.isnan(x)]
                        if x.size:
                            qacc.setdefault(k, {}).setdefault(name, []).append(x)
                    elif kind == "topk":
                        v = v[v.notna()]
                        c = tacc.setdefault(k, {}).setdefault(name, {})
                        for item, n in v.value_counts().items():
                            c[item] = c.get(item, 0) + int(n)
                        t = ttot.setdefault(k, {})
                        t[name] = t.get(name, 0) + int(len(v))
                    elif kind == "distinct":
                        # non-nullable int64 masked by the validity flag
                        # (see the projection note: dropna on a nullable
                        # long would have gone through float64)
                        h = v.to_numpy(dtype=np.int64)[
                            g[f"_nn_{name}"].to_numpy(dtype=bool)]
                        regs = hacc.setdefault(k, {}).setdefault(
                            name, np.zeros(1 << param, dtype=np.uint8))
                        if h.size:
                            _hll_update(regs, h, param)
                    else:  # kmv
                        h = v.to_numpy(dtype=np.int64)[
                            g[f"_nn_{name}"].to_numpy(dtype=bool)]
                        cur = kacc.setdefault(k, {}).setdefault(name, h[:0])
                        if h.size:
                            kacc[k][name] = np.unique(
                                np.concatenate([cur, h]))[:param]
        rows = []
        for k in keys_seen:
            row: list = list(k)
            for name, kind, _col, param in spec:
                if kind == "quantile":
                    chunks = qacc.get(k, {}).get(name, [])
                    x = np.concatenate(chunks) if chunks else np.empty(0)
                    if x.size == 0:
                        row += [[], [], None, None, 0]
                    else:
                        mm, ww = _compress(x, np.ones_like(x), param)
                        row += [mm, ww, float(x.min()), float(x.max()),
                                int(x.size)]
                elif kind == "topk":
                    counter = tacc.get(k, {}).get(name, {})
                    items, counts, dropped = _truncate(counter, param)
                    row += [items, counts, dropped,
                            ttot.get(k, {}).get(name, 0)]
                elif kind == "distinct":
                    regs = hacc.get(k, {}).get(
                        name, np.zeros(1 << param, dtype=np.uint8))
                    row += [bytes(regs)]
                else:  # kmv
                    arr = kacc.get(k, {}).get(name, np.empty(0, np.int64))
                    row += [[int(x) for x in arr]]
            rows.append(tuple(row))
        yield pd.DataFrame(rows, columns=names)

    partials = df.select(*sel).mapInPandas(build, out_schema)
    return merge_summary_cubes(partials, group_cols, spec)


def merge_summary_cubes(
    cubes: DataFrame,
    group_cols: list[str],
    spec,
) -> DataFrame:
    """Roll a cube table up to a coarser grain, or merge per-batch
    deltas of the same grain (the streaming maintenance read): digests
    concatenate-and-recompress, top-k summaries sum-and-retruncate,
    registers take the elementwise max. Touches only the O(groups·rows)
    summary table — the fact is never rescanned."""
    _validate(spec)
    out_schema = _out_schema(cubes, group_cols, spec)
    names = [f.name for f in out_schema.fields]

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        row: list = list(key)
        for name, kind, _col, param in spec:
            if kind == "quantile":
                means = [np.asarray(x, float) for x in pdf[f"{name}__means"]
                         if len(x)]
                if not means:
                    row += [[], [], None, None, 0]
                    continue
                m = np.concatenate(means)
                w = np.concatenate(
                    [np.asarray(x, float) for x in pdf[f"{name}__weights"]
                     if len(x)])
                mm, ww = _compress(m, w, param)
                row += [mm, ww, float(pdf[f"{name}__vmin"].min()),
                        float(pdf[f"{name}__vmax"].max()),
                        int(pdf[f"{name}__n"].sum())]
            elif kind == "topk":
                counter: dict = {}
                dropped = 0
                for items, counts, d in zip(pdf[f"{name}__items"],
                                            pdf[f"{name}__counts"],
                                            pdf[f"{name}__dropped"]):
                    dropped += int(d)
                    for i, c in zip(items, counts):
                        counter[i] = counter.get(i, 0) + int(c)
                items, counts, d2 = _truncate(counter, param)
                row += [items, counts, dropped + d2,
                        int(pdf[f"{name}__ntotal"].sum())]
            elif kind == "distinct":
                regs = np.zeros(1 << param, dtype=np.uint8)
                for b in pdf[f"{name}__regs"]:
                    if b is not None:
                        np.maximum(regs, np.frombuffer(b, dtype=np.uint8),
                                   out=regs)
                row += [bytes(regs)]
            else:  # kmv: k smallest of the union — EXACT merge
                parts = [np.asarray(x, dtype=np.int64)
                         for x in pdf[f"{name}__kmv"] if len(x)]
                if parts:
                    merged = np.unique(np.concatenate(parts))[:param]
                    row += [[int(x) for x in merged]]
                else:
                    row += [[]]
        return pd.DataFrame([tuple(row)], columns=names)

    return cubes.groupBy(*group_cols).applyInPandas(merge, out_schema)


def summary_readout(
    cube: DataFrame,
    spec,
    quantiles: tuple = (0.5,),
    topk: int = 5,
) -> DataFrame:
    """One human-readable row per group off the sketch state: per
    quantile sketch ``<name>_q<p>`` columns (midpoint interpolation with
    exact min/max endpoints — the ``sketch_quantiles`` estimator) plus
    the exact value count ``<name>_n``, per top-k sketch ``<name>_top`` (the k heaviest items, count desc / item
    asc) and ``<name>_ntotal``, per distinct sketch ``<name>_distinct``
    (the HLL estimate). Vectorized in one Arrow pass per sketch."""
    _validate(spec)
    out = cube
    qlist = list(quantiles)

    def _make_qest(qs: tuple):
        @F.pandas_udf("array<double>")
        def qest(means: pd.Series, weights: pd.Series, vmin: pd.Series,
                 vmax: pd.Series) -> pd.Series:
            res = []
            for m, w, lo, hi in zip(means, weights, vmin, vmax):
                m = np.asarray(m, float)
                w = np.asarray(w, float)
                if m.size == 0:
                    res.append([None] * len(qs))
                    continue
                total = w.sum()
                mid = np.cumsum(w) - w / 2.0
                x = np.concatenate(([0.0], mid, [total]))
                y = np.concatenate(([lo], m, [hi]))
                res.append([float(np.interp(q * total, x, y))
                            for q in qs])
            return pd.Series(res)
        return qest

    for name, kind, _col, param in spec:
        if kind == "quantile":
            out = out.withColumn(f"_est_{name}", _make_qest(tuple(qlist))(
                f"{name}__means", f"{name}__weights",
                f"{name}__vmin", f"{name}__vmax"))
            for i, q in enumerate(qlist):
                col = f"{name}_q{str(q).replace('0.', '').replace('.', '_')}"
                out = out.withColumn(col, F.element_at(f"_est_{name}", i + 1))
            out = out.drop(f"_est_{name}").withColumn(
                f"{name}_n", F.col(f"{name}__n"))
        elif kind == "topk":
            out = out.withColumn(
                f"{name}_top", F.slice(F.col(f"{name}__items"), 1, topk)
            ).withColumn(f"{name}_ntotal", F.col(f"{name}__ntotal"))
        elif kind == "kmv":
            # (k-1)/u_k when full, exact size when not — operators.kmv's
            # estimator over the sign-flipped hash order
            kc = F.col(f"{name}__kmv")
            est_col = F.when(
                F.size(kc) < param, F.size(kc).cast("double")
            ).otherwise(
                F.lit(float(param - 1))
                / (F.element_at(kc, param).cast("double")
                   / F.lit(float(2**64)) + F.lit(0.5)))
            out = out.withColumn(f"{name}_distinct", est_col)
        else:
            @F.pandas_udf("double")
            def dest(regs: pd.Series) -> pd.Series:
                return pd.Series([
                    hll_estimate(np.frombuffer(b, dtype=np.uint8))
                    if b is not None else None
                    for b in regs
                ])

            out = out.withColumn(f"{name}_distinct", dest(f"{name}__regs"))
    state = {f.name for f in _sketch_fields(spec)}
    return out.drop(*state)
