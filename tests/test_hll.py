"""HyperLogLog sketches: accuracy, merge associativity, serialization,
and the Spark partial→merge pipeline vs exact distinct counts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.hll import HLL, group_approx_distinct


def test_accuracy_bands():
    rng = np.random.default_rng(3)
    for n in (1_000, 100_000):
        h = HLL(12)
        h.add_hashed(np.unique(rng.integers(-2**63, 2**63, n, dtype=np.int64)))
        assert h.estimate() == pytest.approx(n, rel=0.05)


def test_merge_equals_single_and_roundtrip():
    rng = np.random.default_rng(5)
    a = rng.integers(-2**63, 2**63, 200_000, dtype=np.int64)
    h1, h2, hall = HLL(12), HLL(12), HLL(12)
    h1.add_hashed(a[:100_000])
    h2.add_hashed(a[100_000:])
    hall.add_hashed(a)
    h1.merge(HLL.from_bytes(h2.to_bytes()))
    assert np.array_equal(h1.registers, hall.registers)


def test_group_approx_distinct_vs_exact(spark):
    df = spark.range(0, 60_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        # group g has ~ (g+1)*5000 distinct values, with repeats
        F.pmod(F.col("id") * 37, (F.col("id") % 3 + 1) * 5000).cast("string").alias("v"),
    )
    got = {
        r["g"]: r["approx_distinct"]
        for r in group_approx_distinct(df, "v", ["g"]).collect()
    }
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], rel=0.05), (g, got[g], want[g])

    # partitioning-independent: same sketches from a different layout
    got2 = {
        r["g"]: r["approx_distinct"]
        for r in group_approx_distinct(df.repartition(13), "v", ["g"]).collect()
    }
    assert got == got2
