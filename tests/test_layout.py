"""Z-order layout: interleave correctness + clustering tightness."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators import layout


def _morton_py(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_z_value_matches_reference(spark):
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    rows = df.select("x", "y", layout.z_value([F.col("x"), F.col("y")], bits=5)).collect()
    for r in rows:
        assert r["z"] == _morton_py(r["x"], r["y"], 5)


def test_bucketize_bounds(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (250.0,)], "v double")
    got = [r["b"] for r in df.select(layout.bucketize(F.col("v"), 0, 100, bits=4).alias("b")).collect()]
    assert got[0] == 0          # clamped below
    assert got[1] == 0
    assert got[2] == 8          # midpoint → bucket 8 of 16
    assert got[4] == 15         # clamped above
    assert all(0 <= b <= 15 for b in got)


def test_cluster_skipping_vs_single_dim(spark):
    """The property multi-dimensional skipping rests on: under
    single-column range partitioning a filter on the OTHER column prunes
    nothing (its per-file min/max spans the whole domain in every file);
    under Z-clustering both columns' per-file extents are bounded, so a
    selective filter on either column skips most files."""
    n, n_files = 40_000, 64
    pts = spark.range(n).select(
        F.pmod(F.xxhash64("id", F.lit("x")), F.lit(256)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit("y")), F.lit(256)).alias("y"),
    )

    def files_touched_by_y_filter(df, lo=0, hi=31):
        b = layout.partition_bounds(df, ["x", "y"]).collect()
        live = [r for r in b if r["n_rows"] > 0]
        touched = [r for r in live if r["y_min"] <= hi and r["y_max"] >= lo]
        return len(touched), len(live)

    single = pts.repartitionByRange(n_files, "x")
    zed = layout.cluster_by_zorder(pts, [F.col("x"), F.col("y")], n_files, bits=8)
    assert zed.count() == n  # layout is a pure re-arrangement

    s_touch, s_files = files_touched_by_y_filter(single)
    z_touch, z_files = files_touched_by_y_filter(zed)
    # x-partitioned: every file's y-stats span ~[0,255] → zero pruning
    assert s_touch == s_files
    # z-clustered: a 1/8-of-domain y filter touches a small fraction of
    # files (block side 32 at 64 files → ~1/8 + block-straddle slack)
    assert z_touch <= 0.35 * z_files, (z_touch, z_files)
