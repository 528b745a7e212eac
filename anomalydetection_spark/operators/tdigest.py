"""Mergeable t-digest quantile sketches as Arrow-batched UDF partials.

Spark has no Python UDAF with a merge phase, so the partial/final pattern
is hand-rolled (SURVEY §2.11 U5):

    mapInPandas  — one serialized digest per Arrow batch per group (the
                   map-side "partial aggregate"; no shuffle of raw values)
    applyInPandas — merge the per-batch digests per group (the shuffle
                   carries kilobyte blobs, not the 10^12 raw rows)

The digest follows Dunning's merging t-digest (public algorithm,
"Computing Extremely Accurate Quantiles Using t-Digests"): centroids
bounded by the scale function k(q) = δ/2π · asin(2q-1); fully mergeable
and associative-enough for resume (blobs are version-stamped and stored in
the manifest's sketch_blob column).

Everything is NumPy over Arrow batches — no per-row Python.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

MAGIC = b"TD02"  # version stamp for manifest blobs (TD02: +exact min/max)


class TDigest:
    """Merging t-digest over float64 values."""

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        # exact extrema survive compression/merge — centroid means are
        # weighted averages, so q=0/q=1 would otherwise be approximate
        self.vmin = np.inf
        self.vmax = -np.inf
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []

    # -- construction ------------------------------------------------------
    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(v)
        v = v[mask]
        if v.size == 0:
            return
        if weights is None:
            w = np.ones_like(v)
        else:
            # apply the same NaN mask so means and weights stay aligned
            w = np.asarray(weights, dtype=np.float64)[mask]
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._buf_means.append(v)
        self._buf_weights.append(w)
        # amortized compaction keeps the buffer bounded
        if sum(b.size for b in self._buf_means) > 32 * self.compression:
            self._compress()

    def merge(self, other: "TDigest") -> None:
        if other.total_weight() == 0:
            return
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._buf_means.append(other._all_means())
        self._buf_weights.append(other._all_weights())
        self._compress()

    def _all_means(self) -> np.ndarray:
        return np.concatenate([self.means, *self._buf_means]) if self._buf_means else self.means

    def _all_weights(self) -> np.ndarray:
        return (
            np.concatenate([self.weights, *self._buf_weights])
            if self._buf_weights
            else self.weights
        )

    def total_weight(self) -> float:
        return float(self._all_weights().sum()) if self._all_means().size else 0.0

    def _compress(self) -> None:
        means = self._all_means()
        weights = self._all_weights()
        self._buf_means, self._buf_weights = [], []
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        # merge pass: greedily absorb while the k-size bound allows
        out_m: list[float] = []
        out_w: list[float] = []
        delta = self.compression
        k_limit = lambda q: (delta / (2 * np.pi)) * np.arcsin(np.clip(2 * q - 1, -1, 1))
        w_so_far = 0.0
        cur_m, cur_w = means[0], weights[0]
        k_lo = k_limit(0.0)
        for i in range(1, means.size):
            q_new = (w_so_far + cur_w + weights[i]) / total
            if k_limit(q_new) - k_lo <= 1.0:
                cur_m = (cur_m * cur_w + means[i] * weights[i]) / (cur_w + weights[i])
                cur_w += weights[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                k_lo = k_limit(w_so_far / total)
                cur_m, cur_w = means[i], weights[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- queries -----------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        if q <= 0.0:
            return float(self.vmin)
        if q >= 1.0:
            return float(self.vmax)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        # exact extrema clamp the interpolation at the edges
        return float(min(max(np.interp(target, cum, self.means), self.vmin), self.vmax))

    # -- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        buf = io.BytesIO()
        buf.write(MAGIC)
        buf.write(struct.pack("<dddI", self.compression, self.vmin, self.vmax, self.means.size))
        buf.write(self.means.tobytes())
        buf.write(self.weights.tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        assert data[:4] == MAGIC, "unknown t-digest blob version"
        compression, vmin, vmax, n = struct.unpack_from("<dddI", data, 4)
        off = 4 + 28
        td = cls(compression)
        td.vmin, td.vmax = vmin, vmax
        td.means = np.frombuffer(data, dtype=np.float64, count=n, offset=off).copy()
        td.weights = np.frombuffer(data, dtype=np.float64, count=n, offset=off + 8 * n).copy()
        return td


# ---------------------------------------------------------------------------
# Spark integration: partial (mapInPandas) → merge (applyInPandas)
# ---------------------------------------------------------------------------

def group_digests(df, value_col: str, group_cols: list[str], compression: float = 200.0):
    """Per-group serialized t-digest: (group_cols..., digest binary).

    Map-side partials mean the shuffle moves one blob per (batch × group),
    never raw values — the property that makes this viable at 10^12 rows.
    """
    from pyspark.sql import functions as F  # noqa: F401

    narrow = df.select(*group_cols, value_col)
    schema_partial = ", ".join(f"`{c}` {t}" for c, t in _types(narrow, group_cols)) + ", digest binary"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                td = TDigest(compression)
                td.add(g[value_col].to_numpy(dtype=np.float64, na_value=np.nan))
                key_t = key if isinstance(key, tuple) else (key,)
                rows.append((*key_t, td.to_bytes()))
            yield pd.DataFrame(rows, columns=[*group_cols, "digest"])

    partials = narrow.mapInPandas(partial, schema_partial)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        td = TDigest(compression)
        for blob in pdf["digest"]:
            td.merge(TDigest.from_bytes(bytes(blob)))
        return pd.DataFrame([(*key, td.to_bytes())], columns=[*group_cols, "digest"])

    return partials.groupBy(*group_cols).applyInPandas(merge, schema_partial)


def group_quantiles(
    df,
    value_col: str,
    group_cols: list[str],
    qs: list[float],
    compression: float = 200.0,
):
    """Per-group approximate quantiles from merged digests:
    (group_cols..., q_<pct> double ...)."""
    digests = group_digests(df, value_col, group_cols, compression)
    qcols = [f"q_{int(q * 100)}" for q in qs]
    schema = ", ".join(f"`{c}` {t}" for c, t in _types(df.select(*group_cols), group_cols))
    schema += ", " + ", ".join(f"{c} double" for c in qcols)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                td = TDigest.from_bytes(bytes(r["digest"]))
                rows.append((*[r[c] for c in group_cols], *[td.quantile(q) for q in qs]))
            yield pd.DataFrame(rows, columns=[*group_cols, *qcols])

    return digests.mapInPandas(extract, schema)


def group_bounds(
    df,
    value_col: str,
    group_cols: list[str],
    compression: float = 200.0,
):
    """Per-group EXACT sketch invariants from merged digests:
    (group_cols..., n long, vmin double, vmax double).

    count and min/max pass through partial→merge→extract untouched
    (unit weights sum exactly below 2^53; extrema are tracked outside the
    centroids), so unlike the quantiles these columns are hash-checkable
    against a plain SQL count/min/max — the oracle-visible proof that the
    sketch pipeline loses nothing it promises to keep."""
    digests = group_digests(df, value_col, group_cols, compression)
    schema = ", ".join(f"`{c}` {t}" for c, t in _types(df.select(*group_cols), group_cols))
    schema += ", n bigint, vmin double, vmax double"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                td = TDigest.from_bytes(bytes(r["digest"]))
                rows.append(
                    (*[r[c] for c in group_cols], int(td.total_weight()), td.vmin, td.vmax)
                )
            yield pd.DataFrame(rows, columns=[*group_cols, "n", "vmin", "vmax"])

    return digests.mapInPandas(extract, schema)


def _types(df, cols: list[str]) -> list[tuple[str, str]]:
    m = dict(zip(df.schema.names, [f.dataType.simpleString() for f in df.schema.fields]))
    return [(c, m[c]) for c in cols]


def quantile_drift(
    digests,
    group_cols: list[str],
    baseline_blob: bytes,
    probes: tuple[float, ...] = (0.1, 0.25, 0.5, 0.75, 0.9),
    max_rel_gap: float = 0.2,
):
    """Quantile-function drift per group vs a baseline digest — the
    sketch-side drift check for RESUMED runs: the manifest already holds
    per-partition t-digest blobs (plans/manifest.py), so a quantile
    distribution shift on previously-validated partitions is detectable
    from KB of state without rescanning a single row.

    Compares the group digest's quantile function against the baseline's
    at ``probes``: rel_gap(p) = |q_cur(p) − q_base(p)| / max(|q_base(p)|,
    1e-12). Emits (group_cols..., max_rel_gap, worst_probe, flagged)
    with flagged ⇔ max_rel_gap > ``max_rel_gap``. Probing the quantile
    function (not bucket mass) makes the signal scale-aware the same way
    W1 is, but on mergeable state: baselines can be last month's blobs
    merged driver-side.

    Approximate by design (t-digest error concentrates at the tails —
    probe the body, not p999); thresholds should sit well above the
    sketch's relative error at the chosen compression. The input frame
    is post-aggregation (one KB blob per group); the baseline rides the
    task closure, deserialized once per batch.
    """
    schema = ", ".join(f"`{c}` {t}" for c, t in _types(digests.select(*group_cols), group_cols))
    schema += ", max_rel_gap double, worst_probe double, flagged boolean"
    probes_t = tuple(float(p) for p in probes)
    thresh = float(max_rel_gap)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        base = TDigest.from_bytes(baseline_blob)
        base_q = {p: base.quantile(p) for p in probes_t}
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                td = TDigest.from_bytes(bytes(r["digest"]))
                worst, worst_p = 0.0, probes_t[0]
                for p in probes_t:
                    qb = base_q[p]
                    gap = abs(td.quantile(p) - qb) / max(abs(qb), 1e-12)
                    if gap > worst:
                        worst, worst_p = gap, p
                rows.append(
                    (*[r[c] for c in group_cols], worst, worst_p, worst > thresh)
                )
            yield pd.DataFrame(
                rows, columns=[*group_cols, "max_rel_gap", "worst_probe", "flagged"]
            )

    return digests.mapInPandas(score, schema)
