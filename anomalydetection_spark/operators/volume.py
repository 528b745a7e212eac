"""volume constraint: per-partition document-count bounds.

The Deequ ``hasSize`` class of check, partition-scoped: each Iceberg
partition must land between ``min_docs`` and ``max_docs`` documents.
Single-column stats can't see this failure mode — a partition that
half-arrived (upstream job died mid-write) or doubled (producer replayed
its input) has perfectly healthy per-value statistics; only its SIZE is
wrong. The reference's analog is its row-count-equality guards before
positional joins (end_to_end_prediction.py:507, 514): a cardinality
expectation checked explicitly, promoted here to a declarative per-
partition constraint.

``expected_partitions`` closes the blind spot a groupBy alone has: a
partition that never arrived produces NO group, so absence is invisible
to the aggregate. Passing the expected partition list (from the manifest
or the Iceberg partition metadata — the resume planner already derives
exactly this, plans/manifest.py) emits an n_docs=0 FAIL row for every
missing partition.

Scale shape: one hash aggregate over the narrowest possible projection
(the partition column alone — Parquet/Iceberg reads one column, and the
count is metadata-answerable for formats that expose it), map-side
partials absorb the per-partition fan-in; the expected-list join is
|partitions|-sized. No windows, no Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINT = "volume"


@dataclass(frozen=True)
class VolumeThresholds:
    min_docs: int = 1
    max_docs: int | None = None


def check(
    docs: DataFrame,
    th: VolumeThresholds = VolumeThresholds(),
    expected_partitions: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """volume constraint → (verdicts, violations).

    Violations are PARTITION-level (doc_id/pos NULL, like frequent_items'
    hot-key rows): one row per out-of-bounds partition, so the violation
    sink stays |partitions|-bounded however wrong the counts are.
    """
    counts = docs.groupBy("partition_id").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    if expected_partitions is not None:
        counts = (
            expected_partitions.select("partition_id")
            .distinct()
            .join(counts, "partition_id", "left")
            .select(
                "partition_id",
                F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            )
        )
    ok = F.col("n_docs") >= F.lit(int(th.min_docs))
    if th.max_docs is not None:
        ok = ok & (F.col("n_docs") <= F.lit(int(th.max_docs)))
    hi = "inf" if th.max_docs is None else str(int(th.max_docs))
    verdicts = counts.select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        ok.alias("passed"),
        F.when(ok, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("violation_count"),
        F.col("n_docs").alias("row_count"),
        F.create_map(
            F.lit("n_docs"), F.col("n_docs").cast("double"),
            F.lit("min_docs"), F.lit(float(th.min_docs)),
            F.lit("max_docs"), F.lit(float(th.max_docs) if th.max_docs is not None else float("inf")),
        ).alias("metrics"),
    )
    violations = verdicts.filter(~F.col("passed")).select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        F.lit(None).cast("string").alias("doc_id"),
        F.lit(None).cast("int").alias("pos"),
        F.format_string(
            "partition volume %d outside [%d, %s]",
            F.col("row_count"),
            F.lit(int(th.min_docs)),
            F.lit(hi),
        ).alias("detail"),
    )
    return verdicts, violations
