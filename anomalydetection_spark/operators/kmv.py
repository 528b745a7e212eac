"""KMV (k-minimum-values / bottom-k theta) distinct sketches — the
fifth mergeable sketch family next to t-digest (quantiles), HLL
(distinct counts), Bloom (membership), and Misra-Gries (heavy hitters).

What it adds that HLL cannot: SET ALGEBRA over distinct sets. An HLL
register array supports union-merge only; a KMV sketch is a uniform
coordinated SAMPLE of the key space (the k smallest hash values), so
two sketches built over different corpora support INTERSECTION and
overlap estimation — "how many doc_ids does this batch share with the
corpus?", "which partition pairs hold common keys?" — from kilobytes of
state, no rescan, no join. The theta-sketch framework (Dasgupta et al.,
"Theta-Sketch Framework: Estimating Distinct Values over Data Streams",
and the Apache DataSketches KMV/theta public design) is the published
basis; this implementation is original and deliberately DETERMINISTIC:

* hash: the engine-portable 60-bit md5 hash (`portable_hash60`,
  operators/dedup.py) — first 15 hex digits of md5 as a bigint, uniform
  on [0, 2^60), reproducible bit-for-bit in DuckDB as
  ``('0x' || substr(md5(v), 1, 15))::bigint``. xxhash64 (the JVM-only
  family default) would be faster but unverifiable cross-engine; a
  sketch whose estimates an independent oracle can re-derive exactly is
  worth the md5.
* estimators: pure integer arithmetic — no float ever touches a result.
  With R = 2^60 and vals the sorted distinct hashes kept (≤ k):
    θ        = R if n_kept < k else vals[k-1]      (covered region [0, θ))
    distinct = n_kept if n_kept < k else (k-1)·R div θ
    common   = |{v ∈ A ∩ B : v < θ_AB}| · R div θ_AB,  θ_AB = min(θ_A, θ_B)
  The div is floor division of nonnegative ints — identical in Python,
  Spark decimal `div`, and DuckDB hugeint `//`. When both sketches are
  exact (n < k) the overlap estimate IS the exact overlap of hashes.
* relative error ≈ 1/√(k−2) on the estimation path (~4.4% at k=512,
  ~8 KB blobs); exact below k.

Scale shape (the house sketch pattern, hll.py:90): the JVM computes
hashes as a column expression; `mapInPandas` folds each Arrow batch into
per-group partial sketches (NumPy sort/unique, never per-row Python);
the shuffle moves one ≤8 KB blob per (input partition × group); a
grouped `applyInPandas` merge produces the final sketch. Merge =
union-unique-truncate — associative and commutative, so blobs are
manifest-checkpointable like the other four families.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

MAGIC = b"KV01"
HASH_RANGE = 1 << 60  # portable_hash60 values are uniform on [0, 2^60)


class KMV:
    """Bottom-k sketch over pre-hashed int64 values in [0, 2^60)."""

    def __init__(self, k: int = 512):
        self.k = int(k)
        self.values = np.empty(0, dtype=np.int64)

    def add_hashed(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return
        self.values = np.unique(np.concatenate([self.values, h]))[: self.k]

    def merge(self, other: "KMV") -> None:
        assert other.k == self.k, "incompatible KMV k"
        self.add_hashed(other.values)

    @property
    def theta(self) -> int:
        """Exclusive upper bound of the covered hash region [0, theta)."""
        if len(self.values) < self.k:
            return HASH_RANGE
        return int(self.values[self.k - 1])

    def estimate_distinct(self) -> int:
        """Integer-exact estimator: exact below k, (k-1)·R div θ above."""
        n = len(self.values)
        if n < self.k:
            return n
        return ((self.k - 1) * HASH_RANGE) // self.theta

    def estimate_common(self, other: "KMV") -> int:
        """Estimated |A ∩ B| via the shared covered region: matches of
        the two kept sets below min(θ_A, θ_B), scaled by the region.
        Exact when both sketches are exact."""
        th = min(self.theta, other.theta)
        a = self.values[self.values < th]
        b = other.values[other.values < th]
        matches = int(np.intersect1d(a, b, assume_unique=True).size)
        return (matches * HASH_RANGE) // th

    def to_bytes(self) -> bytes:
        return (
            MAGIC
            + struct.pack("<II", self.k, len(self.values))
            + np.ascontiguousarray(self.values, dtype="<i8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "KMV":
        assert data[:4] == MAGIC, "unknown KMV blob version"
        k, n = struct.unpack_from("<II", data, 4)
        s = cls(k)
        s.values = np.frombuffer(data, dtype="<i8", count=n, offset=12).astype(
            np.int64
        )
        return s


def group_kmvs(df, value_col: str, group_cols: list[str], k: int = 512):
    """Per-group serialized KMV: (group_cols..., kmv binary).

    NULLs are excluded (distinct-set semantics); the shuffle moves one
    ≤8 KB blob per (input partition × group), never values."""
    from pyspark.sql import functions as F

    from anomalydetection_spark.operators.dedup import portable_hash60
    from anomalydetection_spark.operators.tdigest import _types

    narrow = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        portable_hash60(F.col(value_col).cast("string")).alias("_h"),
    )
    schema = (
        ", ".join(f"`{c}` {t}" for c, t in _types(narrow, group_cols))
        + ", kmv binary"
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                s = KMV(k)
                s.add_hashed(g["_h"].to_numpy())
                key_t = key if isinstance(key, tuple) else (key,)
                rows.append((*key_t, s.to_bytes()))
            yield pd.DataFrame(rows, columns=[*group_cols, "kmv"])

    partials = narrow.mapInPandas(partial, schema)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        s = KMV(k)
        for blob in pdf["kmv"]:
            s.merge(KMV.from_bytes(bytes(blob)))
        return pd.DataFrame([(*key, s.to_bytes())], columns=[*group_cols, "kmv"])

    return partials.groupBy(*group_cols).applyInPandas(merge, schema)


def null_last_key(key_tuple):
    """None-safe ordering key for group-key tuples: each component sorts
    by (is-None, value), so NULL group keys order after every value and
    mixed None/value tuples never hit Python's unorderable-types
    TypeError. Shared by every driver-side iteration over collected
    per-group sketches."""
    return tuple((v is None, v) for v in key_tuple)


def collect_kmvs(df, value_col: str, group_cols: list[str], k: int = 512):
    """{group_key_tuple: KMV} — the merged per-group sketches collected
    to the driver. Model-sized (one ≤8 KB blob per group); the pattern
    every estimator below shares."""
    rows = group_kmvs(df, value_col, group_cols, k).collect()
    return {
        tuple(r[c] for c in group_cols): KMV.from_bytes(bytes(r["kmv"]))
        for r in rows
    }


def group_kmv_overlap(spark, df, value_col: str, group_cols: list[str], k: int = 512):
    """All unordered group pairs with estimated common-distinct counts:
    (a_<cols>..., b_<cols>..., est_common bigint). The pairwise algebra
    runs driver-side over the collected blobs (groups² pairs of ≤8 KB
    sketches — coreset-sized, like pca.py's d² moment collect); the
    distributed work is the one sketch build.

    NULL group keys are kept (group_kmvs groups with dropna=False) and
    ordered LAST via a None-safe sort key — Python cannot order None
    against a value, so a bare sorted() would raise on the first NULL
    group (round-4 ADVICE)."""
    sketches = collect_kmvs(df, value_col, group_cols, k)
    keys = sorted(sketches, key=null_last_key)
    rows = []
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            rows.append(
                (*ka, *kb, sketches[ka].estimate_common(sketches[kb]))
            )
    from anomalydetection_spark.operators.tdigest import _types

    types = _types(df.select(*group_cols), group_cols)
    schema = ", ".join(
        [f"`a_{c}` {t}" for c, t in types] + [f"`b_{c}` {t}" for c, t in types]
    )
    return spark.createDataFrame(rows, schema=f"{schema}, est_common bigint")
