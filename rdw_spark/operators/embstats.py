"""Embedding-matrix statistics: exact Gram/covariance entries and
PCA whitening — the embedding-hygiene stage of a retrieval/dedup
pipeline (whitened embeddings make cosine ≈ Mahalanobis and improve
both ANN recall and near-dup thresholds).

Two Gram paths, both one-pass:

- :func:`embedding_gram` — EXACT: each requested (i, j) pair is one
  decimal-accumulated aggregate expression over
  ``CAST(e[i] AS DOUBLE) * CAST(e[j] AS DOUBLE)`` (f32→f64 is exact,
  f64 multiply is IEEE-identical everywhere, decimal addition is
  associative) → bit-identical across partitionings and engines; the
  DuckDB oracle mirrors it literally. Cost is C(d,2) aggregate
  expressions — right for audit-grade stats over a dim subset, wrong
  for d² at d in the hundreds (codegen blows past the JIT limit).
- :func:`_gram_numpy` — SCALE: ``mapInPandas`` emits one d×d partial
  ``XᵀX`` per Arrow batch (vectorized BLAS), the driver sums the tiny
  partials. Float addition order varies with partitioning ⇒ not
  bit-reproducible, but O(d²) state per batch and one scan at any d —
  the 100 TB path, used by :func:`whiten_embeddings`.

Whitening itself: d×d eigendecomposition on the DRIVER (numpy, d ≤ a
few thousand — trivially small next to the data), projection matrix
broadcast back and applied map-side per Arrow batch. The only
distributed work is the two scans.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_gram(
    df: DataFrame, dims: list[int], vec_col: str = "embedding"
) -> DataFrame:
    """Exact upper-triangle Gram + covariance over the 0-based ``dims``
    of ``vec_col``: long format ``(i, j, n, gram, cov)`` where
    ``gram = Σ x_i·x_j`` (decimal-exact, cast to double) and
    ``cov = gram/n − (Σx_i/n)·(Σx_j/n)`` as one fixed-order double
    expression. NULL vectors are excluded; rows are emitted for i <= j.
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    # normalize: the pair enumeration below assumes sorted, duplicate-free
    # dims (unsorted input would emit i > j rows; duplicates would alias
    # two aggregates to the same name and fail opaquely)
    dims = sorted(set(dims))
    if len(dims) > 32:
        raise ValueError(
            "embedding_gram is the exact/audit path; use whiten_embeddings'"
            " batched Gram for wide slices"
        )
    d = df.filter(F.col(vec_col).isNotNull())
    dec = "decimal(38,12)"
    el = {i: F.col(vec_col)[i].cast("double") for i in dims}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i in dims:
        aggs.append(F.sum(el[i].cast(dec)).alias(f"_s_{i}"))
    pairs = [(i, j) for a, i in enumerate(dims) for j in dims[a:]]
    for i, j in pairs:
        aggs.append(F.sum((el[i] * el[j]).cast(dec)).alias(f"_g_{i}_{j}"))
    one = d.agg(*aggs)
    parts = []
    for i, j in pairs:
        g = f"CAST(`_g_{i}_{j}` AS DOUBLE)"
        cov = (
            f"{g} / _n - (CAST(`_s_{i}` AS DOUBLE) / _n)"
            f" * (CAST(`_s_{j}` AS DOUBLE) / _n)"
        )
        parts.append(f"CAST({i} AS INT), CAST({j} AS INT), _n, {g}, {cov}")
    stack = (
        f"stack({len(pairs)}, " + ", ".join(parts)
        + ") AS (i, j, n, gram, cov)"
    )
    return one.select(F.expr(stack))


def _gram_numpy(df: DataFrame, vec_col: str, dim: int) -> tuple[np.ndarray, np.ndarray, int]:
    """One-pass (XᵀX, Σx, n) via per-Arrow-batch numpy partials — the
    wide-d scale path. Returns driver-side numpy (d×d gram, d sum, n)."""
    schema = "gram array<double>, s array<double>, n long"

    def part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in it:
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += x.shape[0]
        if n:
            yield pd.DataFrame(
                {"gram": [g.ravel().tolist()], "s": [s.tolist()], "n": [n]}
            )

    rows = (
        df.filter(F.col(vec_col).isNotNull())
        .select(vec_col)
        .mapInPandas(part, schema)
        .collect()
    )
    if not rows:
        raise ValueError("no non-null vectors")
    g = sum(np.array(r.gram).reshape(dim, dim) for r in rows)
    s = sum(np.array(r.s) for r in rows)
    n = sum(r.n for r in rows)
    return g, s, n


def whiten_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    eps: float = 1e-6,
    out_col: str = "whitened",
) -> DataFrame:
    """PCA-whiten an embedding column: fit mean + covariance in one
    distributed pass (batched numpy Gram), eigendecompose the d×d
    covariance on the driver, broadcast ``W = Λ^{-1/2}·Vᵀ`` and apply
    ``W·(x − μ)`` map-side per Arrow batch. Output schema = input +
    ``out_col`` (array<double>); whitened vectors have ≈identity
    covariance (pytest-checked), making cosine distance Mahalanobis-
    aware. ``eps`` regularizes small eigenvalues.
    """
    first = df.filter(F.col(vec_col).isNotNull()).select(vec_col).head()
    if first is None:
        raise ValueError("no non-null vectors")
    dim = len(first[0])
    g, s, n = _gram_numpy(df, vec_col, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    w = (evecs / np.sqrt(np.maximum(evals, 0.0) + eps)).T  # Λ^{-1/2} Vᵀ
    sc = df.sparkSession.sparkContext
    bw, bmu = sc.broadcast(w), sc.broadcast(mu)
    from pyspark.sql import types as T

    # NB: df.schema is Spark's cached StructType and .add() mutates it —
    # build a fresh copy so the input DataFrame's schema stays truthful
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def proj(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mask = pdf[vec_col].notna()
            res = pd.Series([None] * len(pdf), index=pdf.index, dtype=object)
            if mask.any():
                x = np.vstack(pdf.loc[mask, vec_col].to_numpy()).astype(np.float64)
                y = (x - bmu.value) @ bw.value.T
                res.loc[mask] = list(y)
            pdf[out_col] = res
            yield pdf

    return df.mapInPandas(proj, out_schema)


def pca_project(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> tuple[DataFrame, dict]:
    """PCA dimensionality reduction to ``k`` components — the embedding
    compressor in front of ANN/clustering (d→k cuts index bytes and
    distance FLOPs by d/k with measured variance loss).

    Same scale shape as :func:`whiten_embeddings`: one distributed pass
    fits mean + covariance (batched numpy Gram partials, O(d²) state),
    the d×d eigenproblem runs on the DRIVER, and the projection is
    map-only per Arrow batch. Components are deterministic given the
    fitted covariance (sorted by eigenvalue desc; sign fixed so each
    component's largest-|loading| coordinate is positive) — the
    covariance itself carries float partial-sum order, so like the Gram
    scale path this is reproducible-in-practice, not bit-contractual.

    Returns ``(projected_df, model)`` where model carries ``mean``,
    ``components`` (k×d), ``explained_variance`` and
    ``explained_variance_ratio``.
    """
    first = df.filter(F.col(vec_col).isNotNull()).select(vec_col).head()
    if first is None:
        raise ValueError("no non-null vectors")
    dim = len(first[0])
    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    g, s, n = _gram_numpy(df, vec_col, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k × d
    # canonical sign: largest-|loading| coordinate positive per component
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = np.maximum(evals[order], 0.0)
    total = float(np.trace(cov))
    model = {
        "mean": mu,
        "components": comps,
        "explained_variance": ev,
        "explained_variance_ratio": ev / total if total > 0 else ev,
        "n": n,
    }
    sc = df.sparkSession.sparkContext
    bc, bmu = sc.broadcast(comps), sc.broadcast(mu)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def proj(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            mask = pdf[vec_col].notna()
            res = pd.Series([None] * len(pdf), index=pdf.index, dtype=object)
            if mask.any():
                x = np.vstack(pdf.loc[mask, vec_col].to_numpy()).astype(np.float64)
                res.loc[mask] = list((x - bmu.value) @ bc.value.T)
            pdf[out_col] = res
            yield pdf

    return df.mapInPandas(proj, out_schema), model
