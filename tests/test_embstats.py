"""embstats: exact Gram vs numpy, whitening produces ≈identity covariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rdw_spark.io import load_table
from rdw_spark.operators.embstats import (
    _gram_numpy,
    embedding_gram,
    whiten_embeddings,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _np_matrix(emb):
    return np.vstack(
        [r.embedding for r in emb.filter(F.col("embedding").isNotNull()).collect()]
    ).astype(np.float64)


def test_exact_gram_matches_numpy(spark, emb):
    x = _np_matrix(emb)
    got = {(r.i, r.j): (r.gram, r.cov)
           for r in embedding_gram(emb, [0, 3, 7]).collect()}
    for i, j in got:
        exp_gram = float(x[:, i] @ x[:, j])
        exp_cov = float(np.mean(x[:, i] * x[:, j]) - x[:, i].mean() * x[:, j].mean())
        assert got[(i, j)][0] == pytest.approx(exp_gram, rel=1e-9)
        assert got[(i, j)][1] == pytest.approx(exp_cov, rel=1e-6, abs=1e-9)


def test_batched_gram_matches_numpy(spark, emb):
    x = _np_matrix(emb)
    g, s, n = _gram_numpy(emb.repartition(5), "embedding", x.shape[1])
    assert n == x.shape[0]
    assert np.allclose(g, x.T @ x, rtol=1e-9)
    assert np.allclose(s, x.sum(axis=0), rtol=1e-9)


def test_whitened_covariance_is_identity(spark, emb):
    out = whiten_embeddings(emb, eps=1e-9)
    y = np.vstack([r.whitened for r in out.collect()]).astype(np.float64)
    cov = np.cov(y, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(y.shape[1]), atol=1e-4)


def test_whitening_preserves_nulls_and_schema(spark):
    rows = [(1, [1.0, 2.0]), (2, None), (3, [3.0, 5.0]), (4, [0.0, -1.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    out = whiten_embeddings(df).collect()
    by_id = {r.id: r for r in out}
    assert by_id[2].whitened is None
    assert len(by_id[1].whitened) == 2


def test_gram_validates_dims(spark, emb):
    with pytest.raises(ValueError):
        embedding_gram(emb, [])
    with pytest.raises(ValueError):
        embedding_gram(emb, list(range(40)))


def test_pca_project_matches_numpy(spark):
    """Top-k projection: explained variance and projections match a
    numpy PCA on the collected matrix (same covariance convention);
    components orthonormal; ratio sums <= 1 and decreases; NULL vectors
    pass through as NULL."""
    import numpy as np

    from rdw_spark.operators.embstats import pca_project

    rng = np.random.default_rng(5)
    base = rng.normal(size=(300, 3)) @ np.diag([5.0, 1.0, 0.1])
    x = np.hstack([base, base[:, :1] * 0.5])  # 4 dims, rank-ish 3
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(300)]
    rows.append((999, None))
    df = spark.createDataFrame(rows, "id long, embedding array<double>")

    out, model = pca_project(df, k=2)
    got = {r["id"]: r["pca"] for r in out.collect()}
    assert got[999] is None and len(got[3]) == 2

    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / x.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    want_ev = evals[order]
    assert np.allclose(model["explained_variance"], want_ev, rtol=1e-8)
    r = model["explained_variance_ratio"]
    assert r[0] >= r[1] >= 0 and r.sum() <= 1.0 + 1e-12
    c = model["components"]
    assert np.allclose(c @ c.T, np.eye(2), atol=1e-10)
    # projections match numpy up to the canonical sign (already fixed)
    want = (x - mu) @ c.T
    got_m = np.vstack([got[i] for i in range(300)])
    assert np.allclose(got_m, want, atol=1e-8)
    # variance captured in projected space == eigenvalues
    assert np.allclose(got_m.var(axis=0, ddof=0), want_ev, rtol=1e-6)
