"""Z-order data layout: multi-dimensional clustering for scan pruning.

At 10^12 documents the fastest scan is the one that never happens:
parquet/Iceberg readers skip whole row groups (and Iceberg whole files)
whose column min/max stats cannot satisfy the filter. Range-partitioning
on ONE column makes that column's stats tight and every other column's
stats useless; interleaving the bits of several bucketed columns into a
single Z-value and range-clustering on THAT keeps every participating
column's per-file min/max range narrow at once — the standard
multi-dimensional layout trick (Morton order; what Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => zorder(...))``
and Delta ``OPTIMIZE ZORDER BY`` do).

The reference has no layout story at all — its corpus is one local file
scanned front to back (drain.py:11-21); this module is pure
beyond-reference scale machinery.

Everything here is JVM column expressions (bit shifts + ORs unrolled at
plan-build time — whole-stage-codegen-friendly, no Python), and one
``repartitionByRange`` + ``sortWithinPartitions`` pair: a single range
shuffle, the same cost as any other re-layout pass.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one long.

    Bit ``b`` of column ``i`` lands at output position ``b*n + i`` — the
    Morton interleave. Inputs must be non-negative ints already bucketed
    into [0, 2^bits); callers clamp/bucket first (see ``bucketize``).
    n*bits must fit a signed long (≤ 62). The expression unrolls to
    n·bits shift/AND/OR terms, all inside whole-stage codegen.
    """
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)), b * n + i)
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return functools.reduce(lambda a, b: a.bitwiseOR(b), terms).alias("z")


def bucketize(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Clamp-and-scale a numeric column into the [0, 2^bits) bucket domain
    ``z_value`` expects (fixed bounds → stable buckets across runs; use
    dataset min/max or domain knowledge for lo/hi)."""
    n_buckets = 1 << bits
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi) - float(lo)) * n_buckets
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)), F.lit(n_buckets - 1)
    )


def cluster_by_zorder(
    df: DataFrame, cols: list[Column], n_files: int, bits: int = 16
) -> DataFrame:
    """Re-layout ``df`` into ``n_files`` Z-clustered output partitions:
    one range shuffle on the interleaved value + an in-partition sort, so
    a subsequent ``write`` produces files whose per-file min/max is tight
    on EVERY participating dimension. The helper column is dropped —
    the layout, not the value, is the product."""
    z = z_value(cols, bits=bits)
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def partition_bounds(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-physical-partition min/max of each column — the stats a
    parquet/Iceberg writer would persist per file; used to measure how
    tight a layout is (see tests): (pid, <c>_min, <c>_max, n_rows)."""
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.withColumn("_pid", F.spark_partition_id()).groupBy("_pid").agg(*aggs)
