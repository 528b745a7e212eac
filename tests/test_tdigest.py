"""t-digest accuracy, mergeability, serialization, and Spark integration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.tdigest import TDigest, group_quantiles


def test_accuracy_vs_numpy():
    rng = np.random.default_rng(42)
    # skewed: lognormal
    vals = rng.lognormal(0, 1.5, 200_000)
    td = TDigest(200)
    for chunk in np.array_split(vals, 37):
        td.add(chunk)
    for q in (0.01, 0.25, 0.5, 0.9, 0.95, 0.99):
        exact = np.percentile(vals, q * 100)
        approx = td.quantile(q)
        assert approx == pytest.approx(exact, rel=0.02), q


def test_merge_equals_single():
    rng = np.random.default_rng(7)
    vals = rng.normal(10, 3, 100_000)
    single = TDigest(200)
    single.add(vals)
    merged = TDigest(200)
    for chunk in np.array_split(vals, 16):
        part = TDigest(200)
        part.add(chunk)
        merged.merge(TDigest.from_bytes(part.to_bytes()))
    for q in (0.05, 0.5, 0.95):
        assert merged.quantile(q) == pytest.approx(single.quantile(q), rel=0.01)
        assert merged.quantile(q) == pytest.approx(np.percentile(vals, q * 100), rel=0.01)


def test_serialization_roundtrip():
    td = TDigest(100)
    td.add(np.arange(1000, dtype=float))
    back = TDigest.from_bytes(td.to_bytes())
    assert back.quantile(0.5) == td.quantile(0.5)
    assert back.total_weight() == td.total_weight()


def test_empty_and_single():
    td = TDigest()
    assert np.isnan(td.quantile(0.5))
    td.add(np.array([42.0]))
    assert td.quantile(0.5) == 42.0


def test_spark_group_quantiles(spark):
    # two groups with known distributions, sprayed across partitions
    df = (
        spark.range(0, 60_000, numPartitions=16)
        .select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.when(F.col("id") % 2 == 0, (F.col("id") / 60000.0) * 100)
            .otherwise(F.pow(F.col("id") / 60000.0, 2.0) * 100)
            .alias("v"),
        )
    )
    got = {r["g"]: (r["q_50"], r["q_95"]) for r in
           group_quantiles(df, "v", ["g"], [0.5, 0.95]).collect()}
    pdf = df.toPandas()
    for g in ("0", "1"):
        vals = pdf[pdf["g"] == g]["v"].to_numpy()
        assert got[g][0] == pytest.approx(np.percentile(vals, 50), rel=0.02)
        assert got[g][1] == pytest.approx(np.percentile(vals, 95), rel=0.02)


def test_nan_values_mask_applies_to_weights():
    """NaN filter must drop the matching weights too, or means/weights
    misalign and quantiles silently shift."""
    vals = np.array([1.0, np.nan, 3.0, np.nan, 5.0])
    wts = np.array([1.0, 100.0, 1.0, 100.0, 1.0])
    td = TDigest(100)
    td.add(vals, wts)
    assert td.total_weight() == pytest.approx(3.0)
    assert td.quantile(0.5) == pytest.approx(3.0)


def test_quantile_drift_flags_shifted_group(spark):
    """Sketch-side drift: a group drawn from the baseline distribution
    stays under a 20% relative-gap bound; a 1.5x-scaled group flags —
    computed entirely from digest blobs, no raw-row rescan."""
    import numpy as np

    from anomalydetection_spark.operators.tdigest import (
        TDigest,
        group_digests,
        quantile_drift,
    )

    rng = np.random.RandomState(5)
    base_vals = rng.gamma(3.0, 100.0, 20000)
    base_td = TDigest()
    base_td.add(base_vals)

    rows = [("same", float(v)) for v in base_vals[:10000]] + [
        ("shifted", float(v * 1.5)) for v in base_vals[10000:]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    digests = group_digests(df, "v", ["g"])
    got = {r["g"]: r for r in quantile_drift(digests, ["g"], base_td.to_bytes()).collect()}
    assert got["same"]["flagged"] is False
    assert got["same"]["max_rel_gap"] < 0.05
    assert got["shifted"]["flagged"] is True
    # a uniform 1.5x scale moves every quantile by ~50%
    assert got["shifted"]["max_rel_gap"] == pytest.approx(0.5, abs=0.1)
