"""PCA fit/transform vs numpy on a known anisotropic cloud."""

from __future__ import annotations

import numpy as np

from graph_database_spark.operators.pca import pca_fit, pca_transform


def _cloud(seed=7, n=200, d=6):
    rng = np.random.RandomState(seed)
    # Strongly anisotropic: variance concentrated on two directions.
    base = rng.randn(n, 2) * np.array([5.0, 2.0])
    mix = np.random.RandomState(1).randn(2, d)
    return base @ mix + 0.1 * rng.randn(n, d) + 3.0


def _df(spark, X):
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_fit_matches_numpy(spark):
    X = _cloud()
    model = pca_fit(_df(spark, X), k=3)
    assert np.allclose(model["mean"], X.mean(axis=0), atol=1e-9)

    cov = np.cov(X.T, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(model["explained_variance"], vals[:3], atol=1e-9)

    # Components orthonormal and spanning the top eigenspaces.
    C = np.array(model["components"])
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-9)
    for i, v in enumerate(C):
        assert np.allclose(cov @ v, model["explained_variance"][i] * v, atol=1e-7)


def test_transform_matches_numpy(spark):
    X = _cloud()
    model = pca_fit(_df(spark, X), k=2)
    got = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_transform(_df(spark, X), model).collect()
    }
    C = np.array(model["components"])
    want = (X - X.mean(axis=0)) @ C.T
    for i in range(len(X)):
        assert np.allclose(got[i], want[i], atol=1e-8), i


def test_variance_ordering_and_capture(spark):
    X = _cloud()
    model = pca_fit(_df(spark, X), k=4)
    ev = model["explained_variance"]
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    # Two planted directions dominate: top-2 capture > 99% of variance.
    total = np.trace(np.cov(X.T, bias=True))
    assert sum(ev[:2]) / total > 0.99
