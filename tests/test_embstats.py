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
