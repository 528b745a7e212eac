"""Distributed PCA anomaly scoring — the engine's analog of the
reference's latent-reconstruction scoring core.

The reference fits a representation of "normal" data (SimCLR projection →
VAE latent, end_to_end_prediction.py:360-431), scores each row by a norm
in that latent space (np.linalg.norm over the latent matrix,
end_to_end_prediction.py:444), thresholds at the 95th percentile
(end_to_end_prediction.py:447) and emits per-row verdicts
(end_to_end_prediction.py:451-461). A from-scratch Spark engine
re-expresses those *pipeline semantics* — fit a low-rank model, score rows
by reconstruction error, threshold at a quantile — with the classic
distributed-PCA construction instead of a learned encoder:

  fit     one pass computing (n, Σx, ΣxxT) as Arrow-batch partials: each
          batch does ONE rank-d gemm; the driver reduces |tasks| partial
          rows (model-sized — d and d², never row count) and runs the d×d
          covariance eigendecomposition locally. d ≤ ~10³ keeps the
          driver's eigh in milliseconds while the data pass is fully
          distributed — the standard big-n/small-d split.
  score   one pass: err = ||(x-μ) - V_k V_kᵀ (x-μ)||₂ per row, one gemm
          per Arrow batch against the broadcast (k×d) component matrix.
  verdict exact quantile threshold on the scores → per-row boolean, the
          reference's `scores > np.percentile(scores, 95)` semantics.

Scale: the fit's shuffle-free partials and the score's map-only pass both
stream the corpus once; only the threshold needs a distributed quantile —
exact `percentile` here (sort-based inside one agg; fine to ~10⁹ rows),
with the t-digest sketch (operators/tdigest.py) as the drop-in at 10¹².
Determinism: eigenvector signs are canonicalized (largest-|component|
positive) and partial sums are reduced in sorted driver order, so refits
on the same data give identical models; scores are rounded before
thresholding so a last-ulp difference cannot flip a verdict.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = top-k eigenvectors
    eigenvalues: np.ndarray   # (k,) descending
    n_rows: int

    @property
    def k(self) -> int:
        return self.components.shape[0]

    @property
    def dim(self) -> int:
        return self.components.shape[1]


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One (n, Σx, vec(ΣxxT)) row per Arrow batch — the map-side partial.

    The gram update is a single `X.T @ X` gemm per batch; emitted rows are
    model-sized (d + d² doubles), so collecting them moves O(|tasks|·d²)
    bytes to the driver regardless of row count."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0)],
                    "g": [(X.T @ X).reshape(-1)],
                }
            )

    return df.select(vec_col).mapInPandas(gen, "n long, s array<double>, g array<double>")


def _reduce_moments(rows) -> tuple[int, np.ndarray, np.ndarray]:
    """Canonical driver-side reduce of moment partials → (n, mean, cov).

    Partials are summed in a sorted order so two fits over differently-
    partitioned copies of the same data agree to float addition error
    (and two fits of the same physical layout agree exactly)."""
    if not rows:
        raise ValueError("moment fit: empty input")
    parts = sorted(
        ((int(r["n"]), np.array(r["s"]), np.array(r["g"])) for r in rows),
        key=lambda t: (t[0], t[1].tobytes()),
    )
    n = sum(p[0] for p in parts)
    s = np.sum([p[1] for p in parts], axis=0)
    g = np.sum([p[2] for p in parts], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    # symmetrize against float drift before the factorization
    cov = (cov + cov.T) / 2.0
    return n, mean, cov


def fit_pca(df: DataFrame, vec_col: str, k: int = 8) -> PCAModel:
    """Fit top-k principal components in one distributed pass (see
    ``_reduce_moments`` for the determinism contract)."""
    n, mean, cov = _reduce_moments(_moment_partials(df, vec_col).collect())
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T            # (k, d)
    # canonical sign: the largest-|x| entry of each component is positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=np.ascontiguousarray(comps),
        eigenvalues=np.maximum(evals[order], 0.0),
        n_rows=n,
    )


def reconstruction_scores(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    model: PCAModel,
    round_to: int = 6,
) -> DataFrame:
    """(id, score): score = ||(x-μ) - V_kᵀV_k(x-μ)||₂ — the distance from
    each vector to the fitted principal subspace, the reference's anomaly
    score with PCA standing in for the VAE encoder. Map-only: one gemm
    pair per Arrow batch against the closure-shipped (k×d) matrix."""
    mean = model.mean
    V = model.components  # (k, d)
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean
            resid = X - (X @ V.T) @ V
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "score": np.round(np.linalg.norm(resid, axis=1), round_to),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, f"{id_col} {id_type}, score double")


def anomaly_verdicts(scores: DataFrame, id_col: str, q: float = 0.95) -> DataFrame:
    """(id, score, is_anomaly): exact q-quantile threshold, strictly-above
    flags — `anomaly_prediction = score > np.percentile(score, 95)`
    (end_to_end_prediction.py:447-451). The scalar threshold is computed
    with the exact `percentile` aggregate and cross-joined back (broadcast
    of one row — no driver round-trip in the plan, no global sort of the
    score table). At 10¹² rows swap the aggregate for the t-digest sketch."""
    thr = scores.agg(F.percentile("score", F.lit(q)).alias("_thr"))
    return scores.crossJoin(F.broadcast(thr)).select(
        id_col,
        "score",
        (F.col("score") > F.col("_thr")).alias("is_anomaly"),
    )


@dataclass(frozen=True)
class MahalanobisModel:
    mean: np.ndarray       # (d,)
    precision: np.ndarray  # (d, d) = (cov + ridge·I)⁻¹, symmetric
    n_rows: int

    @property
    def dim(self) -> int:
        return self.precision.shape[0]


def fit_mahalanobis(
    df: DataFrame, vec_col: str, ridge: float = 1e-6
) -> MahalanobisModel:
    """Fit a full-covariance anomaly model in one distributed pass — the
    correlation-aware sibling of the PCA scorer: PCA flags distance from
    the dominant subspace, Mahalanobis flags improbability under the full
    fitted Gaussian (a point can sit ON the principal plane yet be far
    outside the data's density along it).

    Same one-pass (n, Σx, ΣxxT) partials and canonical driver reduce as
    ``fit_pca``; the d×d inverse runs driver-side in milliseconds for
    d ≤ ~10³ (the big-n/small-d split). ``ridge`` regularizes singular
    covariances (constant dimensions) — the standard shrinkage floor, and
    part of the model's deterministic identity."""
    n, mean, cov = _reduce_moments(_moment_partials(df, vec_col).collect())
    d = cov.shape[0]
    prec = np.linalg.inv(cov + float(ridge) * np.eye(d))
    prec = (prec + prec.T) / 2.0
    return MahalanobisModel(mean=mean, precision=np.ascontiguousarray(prec), n_rows=n)


def mahalanobis_scores(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    model: MahalanobisModel,
    round_to: int = 6,
) -> DataFrame:
    """(id, score): score = √max(0, (x−μ)ᵀ P (x−μ)) — map-only, one gemm
    per Arrow batch against the closure-shipped (d×d) precision matrix;
    rounded before any thresholding so a last-ulp difference cannot flip
    a verdict (the ``reconstruction_scores`` contract). Compose with
    ``anomaly_verdicts`` for the quantile-threshold pipeline."""
    mean = model.mean
    P = model.precision
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean
            q = np.maximum(np.einsum("ij,ij->i", X @ P, X), 0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "score": np.round(np.sqrt(q), round_to),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, f"{id_col} {id_type}, score double")
