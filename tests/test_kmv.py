"""KMV bottom-k distinct sketches: exactness below k, estimator
accuracy above k, merge associativity, partition invariance, overlap
estimation, and the single-node Python mirror (md5 portable hash)."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.kmv import (
    HASH_RANGE,
    KMV,
    collect_kmvs,
    group_kmv_overlap,
    group_kmvs,
)


def h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_blob_roundtrip_and_exact_below_k():
    s = KMV(k=64)
    s.add_hashed(np.array([h60(v) for v in range(40)], dtype=np.int64))
    r = KMV.from_bytes(s.to_bytes())
    assert np.array_equal(r.values, s.values) and r.k == 64
    assert s.estimate_distinct() == 40  # exact: fewer than k distinct
    assert s.theta == HASH_RANGE


def test_duplicate_hashes_collapse():
    s = KMV(k=64)
    vals = np.array([h60(v % 10) for v in range(1000)], dtype=np.int64)
    s.add_hashed(vals)
    assert s.estimate_distinct() == 10


def test_estimator_accuracy_above_k():
    s = KMV(k=512)
    n = 20_000
    s.add_hashed(np.array([h60(v) for v in range(n)], dtype=np.int64))
    est = s.estimate_distinct()
    assert abs(est - n) / n < 0.15  # ~1/sqrt(k-2) ≈ 4.4%, generous bound
    # deterministic: same data, same hash, same estimate
    assert est == KMV.from_bytes(s.to_bytes()).estimate_distinct()


def test_merge_equals_single_build():
    full = KMV(k=128)
    parts = [KMV(k=128) for _ in range(4)]
    hashes = np.array([h60(v) for v in range(5000)], dtype=np.int64)
    full.add_hashed(hashes)
    for i, p in enumerate(parts):
        p.add_hashed(hashes[i::4])
    merged = KMV(k=128)
    for p in parts:
        merged.merge(p)
    assert merged.to_bytes() == full.to_bytes()


def test_overlap_exact_below_k_and_estimated_above():
    a, b = KMV(k=1024), KMV(k=1024)
    a.add_hashed(np.array([h60(v) for v in range(500)], dtype=np.int64))
    b.add_hashed(np.array([h60(v) for v in range(300, 800)], dtype=np.int64))
    assert a.estimate_common(b) == 200  # both exact -> exact overlap
    big_a, big_b = KMV(k=512), KMV(k=512)
    big_a.add_hashed(np.array([h60(v) for v in range(15_000)], dtype=np.int64))
    big_b.add_hashed(
        np.array([h60(v) for v in range(10_000, 25_000)], dtype=np.int64)
    )
    est = big_a.estimate_common(big_b)
    assert abs(est - 5000) / 5000 < 0.3


def test_group_kmvs_matches_python_mirror_and_partition_invariant(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).alias("v"),
    )
    sk1 = collect_kmvs(df, "v", ["g"], k=128)
    sk2 = collect_kmvs(df.repartition(17), "v", ["g"], k=128)
    for g in ("0", "1", "2"):
        mirror = KMV(k=128)
        vals = sorted({i % 700 for i in range(3000) if i % 3 == int(g)})
        mirror.add_hashed(np.array([h60(v) for v in vals], dtype=np.int64))
        assert sk1[(g,)].to_bytes() == mirror.to_bytes()
        assert sk2[(g,)].to_bytes() == mirror.to_bytes()


def test_group_kmvs_excludes_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "g string, v int"
    )
    sk = collect_kmvs(df, "v", ["g"], k=16)
    assert sk[("a",)].estimate_distinct() == 2


def test_group_kmv_overlap_frame(spark):
    df = spark.range(0, 900).select(
        F.when(F.col("id") < 600, "x").otherwise("y").alias("g"),
        # x holds 0..599, y holds 300..599: overlap = |y| = 300
        F.when(F.col("id") < 600, F.col("id"))
        .otherwise(F.col("id") - F.lit(300))
        .alias("v"),
    )
    out = group_kmv_overlap(spark, df, "v", ["g"], k=2048).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a_g"], r["b_g"]) == ("x", "y")
    assert r["est_common"] == 300  # both sketches exact below k


def test_shuffle_moves_blobs_not_values(spark):
    plan = group_kmvs(
        spark.range(0, 100).select(
            (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("v")
        ),
        "v",
        ["g"],
        k=32,
    )._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan or "mapInPandas" in plan.lower()


def test_group_kmv_overlap_null_group_keys(spark):
    """NULL group KEYS are legal groups (group_kmvs keeps them via
    dropna=False); the driver-side pair iteration must order them
    None-safely instead of raising TypeError on None-vs-str comparison
    (round-4 ADVICE), with the NULL group sorting LAST."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 1), (None, 3), ("b", 2), ("b", 3)],
        "g string, v int",
    )
    out = group_kmv_overlap(spark, df, "v", ["g"], k=64).collect()
    pairs = {(r["a_g"], r["b_g"]): r["est_common"] for r in out}
    # NULL group orders last: it only ever appears on the b side
    assert set(pairs) == {("a", "b"), ("a", None), ("b", None)}
    assert pairs[("a", "b")] == 1       # share v=2
    assert pairs[("a", None)] == 1      # share v=1
    assert pairs[("b", None)] == 1      # share v=3
