"""freshness constraint: event-time recency bounds per partition.

A validation suite that only checks VALUES misses the failure mode where a
partition silently stops receiving data: every constraint still passes on
the stale rows. Freshness closes that hole — each partition's newest
event-time must be within ``max_lag_seconds`` of an explicit ``as_of``
instant, and rows timestamped beyond ``as_of + max_future_seconds`` (clock
skew, corrupted producers) are flagged row-level. The reference's pipeline
has no freshness notion because it processes a static dump
(end_to_end_prediction.py:618 reads one fixed CSV); a continuously-ingested
10^12-doc table needs it (the Deequ/dbt `hasDataFreshness` analog).

Determinism: ``as_of`` is caller-supplied, never wall-clock — the same
input and config always yield the same verdicts (and the DuckDB oracle can
re-derive them). All comparisons happen in integer epoch microseconds
(`unix_micros`), so engines cannot disagree on sub-second rounding.

Scale shape: one map-only projection + one hash aggregate per group for
verdicts (map-side partials), one filter for future-row violations — no
joins, no windows, no Python. Like placement, the constraint is OPT-IN:
the interleaved documents schema carries no timestamp column, so there is
no safe default ``ts_expr``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINT = "freshness"

US = 1_000_000  # microseconds per second


@dataclass(frozen=True)
class FreshnessThresholds:
    # Spark SQL expression over the row columns producing the event
    # timestamp (castable to timestamp), e.g. "ts" or
    # "to_timestamp(props['ingested_at'])". Required: no safe default.
    ts_expr: str = ""
    # the instant staleness is measured against, ISO-8601 UTC. Required —
    # an implicit now() would make verdicts unreproducible across retries.
    as_of: str = ""
    max_lag_seconds: int = 86_400
    max_future_seconds: int = 0


def staleness(
    df: DataFrame, ts_expr: str, as_of: str, group_col: str = "partition_id"
) -> DataFrame:
    """Per-group freshness facts (the reusable core under ``check``):

    (group_col, n_rows, n_null_ts, max_ts_us, staleness_s, n_future_s_map)
    — staleness_s = as_of − max(ts) in whole seconds (integer floor-div of
    exact microsecond deltas; negative when the newest row is ahead of
    as_of), NULL when every timestamp in the group is NULL.
    """
    ts_us = F.unix_micros(F.expr(ts_expr).cast("timestamp"))
    as_of_us = F.unix_micros(F.to_timestamp(F.lit(as_of)))
    rows = df.select(F.col(group_col), ts_us.alias("_ts_us"), as_of_us.alias("_as_of_us"))
    return rows.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("_ts_us").isNull().cast("long")).alias("n_null_ts"),
        F.max("_ts_us").alias("max_ts_us"),
        F.floor(
            (F.first("_as_of_us") - F.max("_ts_us")) / F.lit(US)
        ).cast("long").alias("staleness_s"),
    )


def check(
    docs: DataFrame, th: FreshnessThresholds = FreshnessThresholds()
) -> tuple[DataFrame, DataFrame]:
    """freshness constraint → (verdicts, violations), suite row shapes.

    A partition FAILS when its newest timestamp is older than
    ``as_of − max_lag_seconds``, when any row is timestamped after
    ``as_of + max_future_seconds``, or when no row carries a usable
    timestamp at all (unknown freshness is NOT fresh). Future rows emit
    row-level violations (they're individually repairable); staleness is
    partition-level (doc_id NULL) — the fix is operational, not row edits.
    """
    if not th.ts_expr:
        raise ValueError("freshness constraint requires a ts_expr")
    if not th.as_of:
        raise ValueError("freshness constraint requires an explicit as_of")
    ts_us = F.unix_micros(F.expr(th.ts_expr).cast("timestamp"))
    as_of_us = F.unix_micros(F.to_timestamp(F.lit(th.as_of)))
    future_cut = as_of_us + F.lit(int(th.max_future_seconds) * US)
    id_col = "doc_id" if "doc_id" in docs.columns else None

    flagged = docs.select(
        "partition_id",
        (F.col(id_col) if id_col else F.lit(None)).cast("string").alias("_id"),
        ts_us.alias("_ts_us"),
        as_of_us.alias("_as_of_us"),
        (ts_us > future_cut).alias("_future"),
    )
    agg = flagged.groupBy("partition_id").agg(
        F.count(F.lit(1)).cast("long").alias("row_count"),
        F.max("_ts_us").alias("_max_ts_us"),
        F.first("_as_of_us").alias("_as_of_us"),
        F.sum(F.coalesce(F.col("_future"), F.lit(False)).cast("long")).alias("_n_future"),
    )
    staleness_s = F.floor((F.col("_as_of_us") - F.col("_max_ts_us")) / F.lit(US)).cast(
        "long"
    )
    stale = F.col("_max_ts_us").isNull() | (
        staleness_s > F.lit(int(th.max_lag_seconds))
    )
    verdicts = agg.select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        (~stale & (F.col("_n_future") == 0)).alias("passed"),
        # stale partitions count one partition-level violation; future rows
        # count individually — mirrors how drift (partition-level) and
        # referential (row-level) fold into violation_count
        (F.col("_n_future") + F.when(stale, 1).otherwise(0)).cast("long").alias(
            "violation_count"
        ),
        "row_count",
        F.map_from_arrays(
            F.array(F.lit("staleness_s"), F.lit("n_future"), F.lit("max_ts_us")),
            F.array(
                staleness_s.cast("double"),
                F.col("_n_future").cast("double"),
                F.col("_max_ts_us").cast("double"),
            ),
        ).alias("metrics"),
    )

    future_rows = flagged.filter(F.coalesce(F.col("_future"), F.lit(False))).select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        F.col("_id").alias("doc_id"),
        F.lit(None).cast("int").alias("pos"),
        F.format_string(
            "timestamp %d us is beyond as_of+%d s",
            F.col("_ts_us"),
            F.lit(int(th.max_future_seconds)),
        ).alias("detail"),
    )
    stale_rows = agg.filter(stale).select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        F.lit(None).cast("string").alias("doc_id"),
        F.lit(None).cast("int").alias("pos"),
        F.when(
            F.col("_max_ts_us").isNull(), F.lit("no usable timestamps in partition")
        )
        .otherwise(
            F.format_string(
                "stale: newest row %d s before as_of (max %d s)",
                staleness_s,
                F.lit(int(th.max_lag_seconds)),
            )
        )
        .alias("detail"),
    )
    return verdicts, future_rows.unionByName(stale_rows)
