"""frequent_items constraint: hot-key / boilerplate guard + MG sketch.

A training-data table fails quietly when one value dominates a column —
a boilerplate media asset stamped into every document, a crawler bug
replaying one media_ref, a hot doc_id prefix that will later skew every
shuffle keyed on it. The reference has no analog (its pandas frequency
filter, preprocessing.py:7-10, *drops* rare values; this constraint
flags DOMINANT ones) — this is a beyond-reference guard in the spirit
of the drift checks: distributional, per-partition, threshold-gated.

Exact path (the suite constraint): one hash aggregate per
(partition_id, media_ref) with map-side partials — the shuffle carries
|distinct keys| rows, never spans — then per-partition totals are
REUSED from those counts (a second aggregate over the counts, not a
second scan). A key is hot when its share of the partition's non-null
refs exceeds ``max_ref_share``; partitions with fewer than ``min_refs``
refs are vacuously clean (a 3-ref partition shouldn't fail at 33%).

Sketch path (unbounded-cardinality columns): Misra-Gries summaries —
the fourth mergeable sketch family next to t-digest (quantiles), HLL
(distinct counts), and Bloom (membership). MG with capacity c
guarantees: every value with true count > n/(c+1) is retained, and
every retained estimate undercounts by at most the sketch's tracked
decrement total (≤ n/(c+1)). Merging is counter addition followed by
the same trim — the mergeable-summaries construction (Agarwal et al.,
PODS'12), so per-partition sketches combine across resumed runs
without rescans, matching the t-digest/HLL/Bloom manifest contract.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINT = "frequent_items"

MAGIC = b"MG01"


@dataclass(frozen=True)
class FreqThresholds:
    max_ref_share: float = 0.05  # no media_ref may exceed 5% of a partition's refs
    min_refs: int = 50           # partitions with fewer refs are vacuously clean


def check(
    exploded: DataFrame,
    th: FreqThresholds = FreqThresholds(),
    persist_counts: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """frequent_items constraint → (verdicts, violations).

    ``exploded`` is the narrow span view (reassembly.explode_spans_meta);
    only the kind/media_ref leaves are touched, so the parquet scan skips
    the text leaf entirely (same pruning contract as referential).

    ONE scan of the span table total: NULL media_refs are kept as their
    own group in the count aggregate, so every partition (even one with
    zero refs) appears in the counts frame and the former separate
    ``distinct(partition_id)`` scan folds into the same aggregate. The
    counts frame (|distinct keys| rows — bounded by key cardinality, the
    documented exactness domain; unbounded columns take the MG sketch
    path) is persisted because totals, hot keys, max-share, and both
    output actions all re-consume it: un-persisted, one verdicts action
    re-ran the scan+shuffle up to four times. ``persist_counts=False``
    skips that cache — right when the caller already caches the exploded
    view (small inputs), where re-aggregating from the cache is cheaper
    than another materialization barrier."""
    from pyspark.storagelevel import StorageLevel

    counts_all = exploded.groupBy("partition_id", "media_ref").agg(
        F.count("*").alias("n")
    )
    if persist_counts:
        counts_all = counts_all.persist(StorageLevel.MEMORY_AND_DISK)
    counts = counts_all.filter(F.col("media_ref").isNotNull())
    # totals derived FROM the counts (tiny); the NULL-key group keeps
    # ref-less partitions present so every partition gets a verdict
    totals = counts_all.groupBy("partition_id").agg(
        F.sum(
            F.when(F.col("media_ref").isNotNull(), F.col("n")).otherwise(F.lit(0))
        ).alias("n_refs")
    )

    hot = counts.join(totals, "partition_id").filter(
        (F.col("n_refs") >= th.min_refs)
        & (F.col("n") > th.max_ref_share * F.col("n_refs"))
    )

    violations = hot.select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        F.lit(None).cast("string").alias("doc_id"),  # key-level, not doc-level
        F.lit(None).cast("int").alias("pos"),
        F.format_string(
            "hot media_ref=%s count=%d of %d refs", "media_ref", "n", "n_refs"
        ).alias("detail"),
    )

    hot_agg = hot.groupBy("partition_id").agg(
        F.count("*").cast("long").alias("violation_count")
    )
    share_agg = counts.groupBy("partition_id").agg(F.max("n").alias("max_n"))
    verdicts = (
        totals.join(share_agg, "partition_id", "left")
        .join(hot_agg, "partition_id", "left")
        .select(
            "partition_id",
            F.lit(CONSTRAINT).alias("constraint"),
            (F.coalesce("violation_count", F.lit(0)) == 0).alias("passed"),
            F.coalesce("violation_count", F.lit(0)).cast("long").alias("violation_count"),
            F.col("n_refs").cast("long").alias("row_count"),
            F.create_map(
                F.lit("max_ref_share"),
                F.when(
                    F.col("n_refs") > 0, F.coalesce("max_n", F.lit(0)) / F.col("n_refs")
                ).otherwise(F.lit(0.0)),
            ).alias("metrics"),
        )
    )
    return verdicts, violations


# ---------------------------------------------------------------------------
# Misra-Gries mergeable heavy-hitter sketch
# ---------------------------------------------------------------------------


class MisraGries:
    """Heavy-hitter summary over string keys with bounded memory.

    ``decremented`` tracks the total weight subtracted by trims: for any
    key, true_count - decremented <= estimate(key) <= true_count, and any
    key with true_count > decremented is guaranteed present. Since each
    trim subtracts its pivot from > capacity counters, decremented <=
    n / (capacity + 1)."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.counts: dict[str, int] = {}
        self.decremented = 0

    def add_counts(self, counts: pd.Series | dict[str, int]) -> None:
        """Bulk update from pre-aggregated (key → count) — callers feed
        pandas ``value_counts`` output so Python never loops per row."""
        items = counts.items() if hasattr(counts, "items") else counts
        for k, v in items:
            self.counts[k] = self.counts.get(k, 0) + int(v)
        self._trim()

    def _trim(self) -> None:
        if len(self.counts) <= self.capacity:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        # pivot = (capacity+1)-th largest count; subtracting it zeroes out
        # everything at or below, leaving <= capacity survivors
        pivot = int(np.partition(vals, -self.capacity - 1)[-self.capacity - 1])
        self.counts = {k: v - pivot for k, v in self.counts.items() if v > pivot}
        self.decremented += pivot

    def merge(self, other: "MisraGries") -> None:
        assert other.capacity == self.capacity, "incompatible MG capacity"
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v
        self.decremented += other.decremented
        self._trim()

    def estimate(self, key: str) -> tuple[int, int]:
        """(lower, upper) bound on the key's true count."""
        c = self.counts.get(key, 0)
        return c, c + self.decremented

    def topk(self, k: int) -> list[tuple[str, int]]:
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def to_bytes(self) -> bytes:
        parts = [MAGIC, struct.pack("<IQI", self.capacity, self.decremented, len(self.counts))]
        for k, v in self.counts.items():
            kb = k.encode()
            parts.append(struct.pack("<IQ", len(kb), v))
            parts.append(kb)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        assert data[:4] == MAGIC, "unknown MG blob version"
        capacity, decremented, n = struct.unpack_from("<IQI", data, 4)
        mg = cls(capacity)
        mg.decremented = decremented
        off = 4 + 16
        for _ in range(n):
            klen, v = struct.unpack_from("<IQ", data, off)
            off += 12
            mg.counts[data[off : off + klen].decode()] = v
            off += klen
        return mg


def partition_sketches(
    df: DataFrame, col: str, capacity: int = 256
) -> DataFrame:
    """One MG blob row per input partition via mapInPandas — Arrow batches
    are reduced with ``value_counts`` (vectorized) before the dict update,
    so Python cost is O(distinct per batch), not O(rows)."""
    from collections.abc import Iterator

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mg = MisraGries(capacity)
        seen = False
        for pdf in batches:
            seen = True
            vals = pdf[col].dropna()
            if len(vals):
                mg.add_counts(vals.value_counts())
        if seen:
            yield pd.DataFrame({"mg_blob": [mg.to_bytes()]})

    return df.select(col).mapInPandas(gen, "mg_blob binary")


def group_mgs(
    df: DataFrame, value_col: str, group_cols: list[str], capacity: int = 256
) -> DataFrame:
    """Per-group serialized MG summary: (group_cols..., mg binary) —
    the same partial→merge shape as hll.group_hlls / tdigest.group_digests
    so heavy-hitter state rides the manifest like the other sketch
    families. NULLs are excluded; the shuffle moves one bounded blob per
    (batch × group), never key rows."""
    from collections.abc import Iterator

    from anomalydetection_spark.operators.tdigest import _types

    narrow = df.filter(F.col(value_col).isNotNull()).select(*group_cols, value_col)
    schema = ", ".join(f"`{c}` {t}" for c, t in _types(narrow, group_cols)) + ", mg binary"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for key, g in pdf.groupby(group_cols, dropna=False, sort=False):
                mg = MisraGries(capacity)
                mg.add_counts(g[value_col].astype(str).value_counts())
                key_t = key if isinstance(key, tuple) else (key,)
                rows.append((*key_t, mg.to_bytes()))
            yield pd.DataFrame(rows, columns=[*group_cols, "mg"])

    partials = narrow.mapInPandas(partial, schema)

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        mg = MisraGries(capacity)
        for blob in pdf["mg"]:
            mg.merge(MisraGries.from_bytes(bytes(blob)))
        return pd.DataFrame([(*key, mg.to_bytes())], columns=[*group_cols, "mg"])

    return partials.groupBy(*group_cols).applyInPandas(merge, schema)


def merged_sketch(df: DataFrame, col: str, capacity: int = 256) -> MisraGries:
    """Global MG summary: per-partition sketches (bounded blobs) are
    collected — |partitions| rows, never data rows — and merged."""
    out = MisraGries(capacity)
    for r in partition_sketches(df, col, capacity).collect():
        out.merge(MisraGries.from_bytes(r["mg_blob"]))
    return out


def topk_rank_drift(
    df: DataFrame, group_col: str, value_col: str, k: int = 10
) -> DataFrame:
    """Heavy-hitter RANK drift per group vs the global baseline — the
    categorical complement of the histogram drift metrics: KL/W1/KS see
    mass move between buckets, but a support change in a high-cardinality
    column (yesterday's top user gone, a new key flooding in) shows up
    first as top-k membership and ORDER churn.

    Per group: top-k values by (count desc, value asc — total order,
    deterministic ties) compared against the global top-k:

      - ``n_common``          top-k values shared with the baseline
      - ``n_new``             group-top-k values absent from baseline top-k
      - ``rank_displacement`` Σ |rank_group − rank_global| over shared
      - ``jaccard_ppm``       ⌊n_common·10⁶ / |union|⌋ (exact integer DIV)

    All-integer output: equal inputs hash equal across engines.

    Scale shape: one hash aggregate to (group, value, n) — the shuffle
    carries distinct keys, never rows. The per-group rank window
    partitions BY GROUP; the global top-k avoids a partition-less rank
    window entirely: ``orderBy().limit(k)`` plans TakeOrderedAndProject
    (per-partition top-k, then a k-row merge on the driver-less single
    reduce), and the k-row frame's ranks come from a broadcast
    beats-self-join (k² comparisons on k rows) — nothing global ever
    sorts the full domain. The baseline ranks broadcast into the final
    per-group join.
    """
    from pyspark.sql.window import Window

    counts = df.filter(F.col(value_col).isNotNull()).groupBy(
        group_col, value_col
    ).agg(F.count(F.lit(1)).alias("n"))

    w = Window.partitionBy(group_col).orderBy(
        F.desc("n"), F.col(value_col).asc()
    )
    cur_topk = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(group_col, value_col, F.col("rk").alias("rk_cur"))
    )

    base_counts = counts.groupBy(value_col).agg(F.sum("n").alias("n"))
    base_topk = base_counts.orderBy(F.desc("n"), F.col(value_col).asc()).limit(k)
    a, b = base_topk.alias("a"), base_topk.alias("b")
    beats = (F.col("b.n") > F.col("a.n")) | (
        (F.col("b.n") == F.col("a.n")) & (F.col("b." + value_col) < F.col("a." + value_col))
    )
    base_ranked = (
        a.join(F.broadcast(b), beats, "left")
        .groupBy(F.col("a." + value_col).alias(value_col))
        .agg((F.count(F.col("b." + value_col)) + F.lit(1)).cast("int").alias("rk_base"))
    )

    # |baseline top-k| as a broadcast scalar (min(k, |domain|) — the
    # jaccard union must use the real size, not k)
    base_k = base_ranked.agg(F.count(F.lit(1)).cast("long").alias("_base_k"))
    joined = cur_topk.join(F.broadcast(base_ranked), value_col, "left").crossJoin(
        F.broadcast(base_k)
    )
    n_common = F.sum(F.when(F.col("rk_base").isNotNull(), 1).otherwise(0)).cast("long")
    k_cur = F.count(F.lit(1)).cast("long")
    return joined.groupBy(group_col).agg(
        n_common.alias("n_common"),
        (k_cur - n_common).cast("long").alias("n_new"),
        F.sum(
            F.when(
                F.col("rk_base").isNotNull(),
                F.abs(F.col("rk_cur") - F.col("rk_base")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("rank_displacement"),
        F.expr(
            "cast((sum(CASE WHEN rk_base IS NOT NULL THEN 1 ELSE 0 END) * 1000000) div "
            "(count(1) + first(_base_k) - sum(CASE WHEN rk_base IS NOT NULL THEN 1 ELSE 0 END)) AS bigint)"
        ).alias("jaccard_ppm"),
    )
