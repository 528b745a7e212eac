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
