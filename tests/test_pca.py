"""Distributed PCA: sufficient statistics vs numpy, eigen invariants,
projection correctness, sign stability."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyhctsa_spark.operators.pca import (
    covariance_stats,
    pca_fit,
    pca_project,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    d, n = 16, 400
    # anisotropic data: a few dominant axes so the spectrum is distinct
    A = rng.normal(size=(d, d)) * np.linspace(3, 0.1, d)
    X = rng.normal(size=(n, d)) @ A + rng.normal(2.0, 0.5, size=d)
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # the float32 column is the ground truth the engine sees
    return df.cache(), X.astype(np.float32).astype(np.float64)


def test_covariance_matches_numpy(spark, emb):
    df, X = emb
    got = np.zeros((X.shape[1], X.shape[1]))
    for r in covariance_stats(df).collect():
        got[r["i"], r["j"]] = r["cov"]
    want = X.T @ X / len(X) - np.outer(X.mean(0), X.mean(0))
    assert np.allclose(got, want, atol=1e-9)
    assert np.allclose(got, got.T, atol=1e-12)


def test_fit_invariants_and_numpy_agreement(spark, emb):
    df, X = emb
    comps, evals, mean = pca_fit(df, q=5)
    # orthonormal rows, descending eigenvalues
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-10)
    assert (np.diff(evals) <= 1e-12).all() and (evals > 0).all()
    assert np.allclose(mean, X.mean(0), atol=1e-9)
    # matches single-node PCA up to the shared sign convention
    C = np.cov(X.T, bias=True)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:5]
    ref = v[:, order].T
    for r in range(5):
        k = np.argmax(np.abs(ref[r]))
        if ref[r, k] < 0:
            ref[r] = -ref[r]
    assert np.allclose(np.abs(comps), np.abs(ref), atol=1e-7)
    assert np.allclose(comps, ref, atol=1e-7)
    assert np.allclose(evals, w[order], atol=1e-9)
    # sign convention: largest-|coordinate| positive
    for r in range(5):
        assert comps[r, np.argmax(np.abs(comps[r]))] > 0


def test_projection_matches_numpy_and_captures_variance(spark, emb):
    df, X = emb
    comps, evals, mean = pca_fit(df, q=3)
    got = (
        pca_project(df, comps, mean)
        .orderBy("vec_id").toPandas()[["pc1", "pc2", "pc3"]].to_numpy()
    )
    want = (X - X.mean(0)) @ comps.T
    assert np.allclose(got, want, atol=1e-9)
    # projected variance per axis == eigenvalue
    assert np.allclose(got.var(axis=0), evals, rtol=1e-6)


def test_projection_plan_is_map_side(spark, emb):
    df, _ = emb
    comps, evals, mean = pca_fit(df, q=2)
    plan = (
        pca_project(df, comps, mean)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
