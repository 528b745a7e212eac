"""Mergeable HyperLogLog distinct-count sketches (second sketch family
next to operators/tdigest.py).

Why not `approx_count_distinct`? Spark's built-in HLL lives only inside
one aggregation — its partial state can't be persisted, merged across
runs, or carried in the manifest. This sketch is a byte blob with an
elementwise-max merge, so a resumed validation run combines finished
partitions' sketches with new ones WITHOUT rescanning them — the same
contract the t-digest blobs provide for quantiles (X2/S8/A12).

Division of labor keeps Python off the per-row path:
- the JVM hashes values (`F.xxhash64` column expression) — Python ever
  sees only int64 hashes in Arrow batches;
- register updates are vectorized NumPy (branchless clz over uint64).

Standard estimator (Flajolet et al., public algorithm): αm·m²/Σ2^-M
with linear counting below 2.5m. Relative error ≈ 1.04/√m (~1.6% at
p=12 / 4096 registers / 4 KB blobs).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

MAGIC = b"HL01"


def _clz_rest(w: np.ndarray, width: int) -> np.ndarray:
    """Leading zeros of ``w`` within ``width`` bits (w: uint64, branchless)."""
    n = np.zeros(w.shape, dtype=np.int64)
    x = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        n = np.where(mask, n + shift, n)
        x = np.where(mask, x << np.uint64(shift), x)
    return np.minimum(n, width)


class HLL:
    """HyperLogLog over pre-hashed int64 values."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes).astype(np.int64).view(np.uint64)
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h << np.uint64(self.p)
        rank = (_clz_rest(w, 64 - self.p) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HLL") -> None:
        assert other.p == self.p, "incompatible HLL precision"
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / np.sum(np.power(2.0, -self.registers.astype(np.float64)))
        if raw <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(raw)

    def to_bytes(self) -> bytes:
        return MAGIC + struct.pack("<I", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HLL":
        assert data[:4] == MAGIC, "unknown HLL blob version"
        (p,) = struct.unpack_from("<I", data, 4)
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8, count=1 << p, offset=8).copy()
        return h


# ---------------------------------------------------------------------------
# Spark integration: JVM hash → mapInPandas partial → applyInPandas merge
# ---------------------------------------------------------------------------

def group_hlls(df, value_col: str, group_cols: list[str], p: int = 12):
    """Per-group serialized HLL: (group_cols..., hll binary).

    NULLs are excluded (count-distinct semantics); the shuffle moves one
    4 KB blob per (batch × group), never values."""
    from pyspark.sql import functions as F

    from anomalydetection_spark.operators.tdigest import _types

    narrow = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, F.xxhash64(value_col).alias("_h")
    )
    schema = ", ".join(f"`{c}` {t}" for c, t in _types(narrow, group_cols)) + ", hll binary"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                h = HLL(p)
                h.add_hashed(g["_h"].to_numpy())
                key_t = key if isinstance(key, tuple) else (key,)
                rows.append((*key_t, h.to_bytes()))
            yield pd.DataFrame(rows, columns=[*group_cols, "hll"])

    partials = narrow.mapInPandas(partial, schema)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        h = HLL(p)
        for blob in pdf["hll"]:
            h.merge(HLL.from_bytes(bytes(blob)))
        return pd.DataFrame([(*key, h.to_bytes())], columns=[*group_cols, "hll"])

    return partials.groupBy(*group_cols).applyInPandas(merge, schema)


def group_approx_distinct(df, value_col: str, group_cols: list[str], p: int = 12):
    """(group_cols..., approx_distinct long) from merged sketches."""
    from anomalydetection_spark.operators.tdigest import _types

    hlls = group_hlls(df, value_col, group_cols, p)
    schema = ", ".join(
        f"`{c}` {t}" for c, t in _types(df.select(*group_cols), group_cols)
    )
    schema += ", approx_distinct bigint"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (
                    *[r[c] for c in group_cols],
                    int(round(HLL.from_bytes(bytes(r["hll"])).estimate())),
                )
                for _, r in pdf.iterrows()
            ]
            yield pd.DataFrame(rows, columns=[*group_cols, "approx_distinct"])

    return hlls.mapInPandas(extract, schema)
