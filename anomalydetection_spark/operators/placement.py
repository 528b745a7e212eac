"""placement constraint: rows must live in the partition their key says.

An Iceberg partition value is a FUNCTION of row data (bucket(doc_id),
days(ts), …). Writers that bypass the table format — manual file surgery,
backfills with a stale transform, a resharded producer — can land rows in
the wrong partition, and the failure is silent AND poisonous: partition
pruning then skips files that contain matching rows, so queries quietly
return incomplete results while every per-partition statistic still looks
healthy. This constraint re-derives the expected partition from the
declared transform and flags every row where the physical partition
disagrees.

Scale shape: one map-only pass — the transform is a column expression
evaluated next to the existing ``partition_id``, violations filter out,
verdict counts are one hash aggregate over (partition_id, mismatch flag).
No joins, no windows, no Python; at 10^12 docs the cost is the scan the
suite's doc-level constraints already pay.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINT = "placement"


@dataclass(frozen=True)
class PlacementThresholds:
    # Spark SQL expression over the document columns computing the
    # EXPECTED partition id, e.g. "pmod(xxhash64(doc_id), 64)" for a
    # bucket transform. Required: there is no safe default transform.
    expr: str = ""


def check(
    docs: DataFrame, th: PlacementThresholds = PlacementThresholds()
) -> tuple[DataFrame, DataFrame]:
    """placement constraint → (verdicts, violations), suite row shapes.

    A row violates when ``expr`` evaluates non-null and differs from the
    physical ``partition_id`` (a NULL transform result is a schema/stats
    problem, not a placement one — use ``try_cast`` in the expr for
    transforms over possibly-malformed keys; ANSI mode fails plain casts
    loudly, which is the right default for a validator). Verdicts group by the PHYSICAL
    partition — the one whose files hold the misplaced rows and need
    rewriting."""
    if not th.expr:
        raise ValueError("placement constraint requires a transform expr")
    expected = F.expr(th.expr).cast("int")
    flagged = docs.select(
        "partition_id",
        "doc_id",
        expected.alias("_expected"),
        (expected.isNotNull() & (expected != F.col("partition_id"))).alias("_bad"),
    )
    verdicts = flagged.groupBy("partition_id").agg(
        F.lit(CONSTRAINT).alias("constraint"),
        (F.sum(F.col("_bad").cast("int")) == 0).alias("passed"),
        F.sum(F.col("_bad").cast("long")).alias("violation_count"),
        F.count(F.lit(1)).cast("long").alias("row_count"),
        F.create_map(
            F.lit("n_misplaced"), F.sum(F.col("_bad").cast("double"))
        ).alias("metrics"),
    )
    violations = flagged.filter("_bad").select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(None).cast("int").alias("pos"),
        F.format_string(
            "row in partition %d, transform places it in %d",
            F.col("partition_id"),
            F.col("_expected"),
        ).alias("detail"),
    )
    return verdicts, violations
