"""PCA anomaly scoring vs the single-node NumPy oracle.

The distributed fit (Arrow-batch moment partials → driver eigh) must agree
with plain `np.linalg.eigh(np.cov(X))` on the collected data; scores must
vanish on data lying in the fitted subspace; the verdict threshold must
reproduce the reference's `score > np.percentile(scores, 95)` semantics
(end_to_end_prediction.py:444-461)."""

from __future__ import annotations

import numpy as np
import pytest

from anomalydetection_spark.operators import pca

D = 16
N = 400


def _make_df(spark, X, n_partitions=4):
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, vec array<double>").repartition(
        n_partitions
    )


@pytest.fixture(scope="module")
def lowrank():
    """Deterministic data concentrated near a 3-dim subspace + 8 outliers."""
    rng = np.random.RandomState(7)
    basis = np.linalg.qr(rng.randn(D, 3))[0]  # (D, 3) orthonormal
    coeffs = rng.randn(N, 3) * np.array([5.0, 3.0, 1.5])
    X = coeffs @ basis.T + 0.01 * rng.randn(N, D) + rng.randn(D) * 0.5
    X[:8] += rng.randn(8, D) * 4.0  # off-subspace outliers
    return X, basis


def test_fit_matches_numpy(spark, lowrank):
    X, _ = lowrank
    model = pca.fit_pca(_make_df(spark, X), "vec", k=5)
    cov = np.cov(X, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:5]
    assert model.n_rows == N
    np.testing.assert_allclose(model.mean, X.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(model.eigenvalues, evals, rtol=1e-8)
    # components span the same subspace: projector matrices must agree
    Vn = np.linalg.eigh(cov)[1][:, ::-1][:, :5].T
    np.testing.assert_allclose(
        model.components.T @ model.components, Vn.T @ Vn, atol=1e-6
    )


def test_fit_partition_invariant(spark, lowrank):
    X, _ = lowrank
    m2 = pca.fit_pca(_make_df(spark, X, n_partitions=2), "vec", k=4)
    m7 = pca.fit_pca(_make_df(spark, X, n_partitions=7), "vec", k=4)
    np.testing.assert_allclose(m2.mean, m7.mean, atol=1e-10)
    np.testing.assert_allclose(m2.eigenvalues, m7.eigenvalues, rtol=1e-9)
    np.testing.assert_allclose(m2.components, m7.components, atol=1e-7)


def test_subspace_data_scores_zero(spark):
    """Exact low-rank data reconstructs exactly: every score rounds to 0."""
    rng = np.random.RandomState(3)
    basis = np.linalg.qr(rng.randn(D, 2))[0]
    X = (rng.randn(200, 2) * [4.0, 2.0]) @ basis.T
    df = _make_df(spark, X)
    model = pca.fit_pca(df, "vec", k=2)
    scores = pca.reconstruction_scores(df, "vec_id", "vec", model)
    assert scores.agg({"score": "max"}).first()[0] <= 1e-6


def test_scores_match_numpy_and_flag_outliers(spark, lowrank):
    X, _ = lowrank
    df = _make_df(spark, X)
    model = pca.fit_pca(df, "vec", k=3)
    got = {
        r["vec_id"]: r["score"]
        for r in pca.reconstruction_scores(df, "vec_id", "vec", model).collect()
    }
    Xc = X - model.mean
    resid = Xc - (Xc @ model.components.T) @ model.components
    want = np.linalg.norm(resid, axis=1)
    for i in range(N):
        assert abs(got[i] - want[i]) < 1e-6
    # the 8 injected outliers carry the largest reconstruction errors
    top8 = sorted(got, key=got.get, reverse=True)[:8]
    assert set(top8) == set(range(8))


def test_verdict_threshold_semantics(spark, lowrank):
    X, _ = lowrank
    df = _make_df(spark, X)
    model = pca.fit_pca(df, "vec", k=3)
    scores = pca.reconstruction_scores(df, "vec_id", "vec", model)
    verdicts = pca.anomaly_verdicts(scores, "vec_id", q=0.95).collect()
    svals = np.array([r["score"] for r in verdicts])
    thr = np.percentile(svals, 95)  # linear interpolation — Spark's exact percentile
    for r in verdicts:
        assert r["is_anomaly"] == (r["score"] > thr + 1e-12 or (r["score"] > thr - 1e-12 and r["score"] > thr))
    n_anom = sum(r["is_anomaly"] for r in verdicts)
    assert 0 < n_anom <= int(0.05 * N) + 1
    flagged = {r["vec_id"] for r in verdicts if r["is_anomaly"]}
    assert set(range(8)) <= flagged


def test_mahalanobis_vs_numpy_mirror(spark):
    """Distributed fit + map-only scoring equals the direct single-node
    quadratic form; the known outlier carries the largest score."""
    import numpy as np

    from anomalydetection_spark.operators.pca import (
        fit_mahalanobis,
        mahalanobis_scores,
    )

    rng = np.random.RandomState(3)
    X = rng.randn(400, 6) @ rng.randn(6, 6) + rng.randn(6)
    X[7] += 25.0  # gross outlier
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    model = fit_mahalanobis(df, "embedding", ridge=1e-9)
    got = {r["vec_id"]: r["score"] for r in mahalanobis_scores(df, "vec_id", "embedding", model).collect()}

    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    prec = np.linalg.inv((cov + cov.T) / 2.0 + 1e-9 * np.eye(6))
    C = X - mean
    want = np.sqrt(np.maximum(np.einsum("ij,ij->i", C @ prec, C), 0.0))
    for i in range(len(X)):
        assert got[i] == pytest.approx(want[i], abs=1e-5)
    assert max(got, key=got.get) == 7


def test_mahalanobis_partition_invariance_and_ridge(spark):
    """Refits over a repartitioned copy agree to float error; a constant
    dimension (singular covariance) is handled by the ridge, never a
    LinAlgError."""
    import numpy as np

    from anomalydetection_spark.operators.pca import fit_mahalanobis

    rng = np.random.RandomState(9)
    X = np.c_[rng.randn(300, 4), np.full(300, 3.0)]  # constant 5th dim
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m1 = fit_mahalanobis(df, "embedding")
    m2 = fit_mahalanobis(df.repartition(7), "embedding")
    assert np.allclose(m1.precision, m2.precision, atol=1e-6)
    assert np.allclose(m1.mean, m2.mean, atol=1e-12)
    assert np.isfinite(m1.precision).all()
