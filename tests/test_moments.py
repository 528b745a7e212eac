"""Higher-moment analyzers (operators/moments.py) vs NumPy population
moments: exact power-sum anchors, derived shape stats, NULL exclusion,
and the degenerate-group guards."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.moments import power_sums_exact, skewness_kurtosis


def _np_shape(xs):
    x = np.asarray(xs, dtype=float)
    n = len(x)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    return m, m2, m3 / m2**1.5, m4 / m2**2 - 3.0


def test_power_sums_exact_values(spark):
    rows = [("a", 3), ("a", 5), ("a", 7), ("b", 10), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in power_sums_exact(df, "v", ["g"]).collect()}
    assert got["a"]["n"] == 3
    assert int(got["a"]["s1"]) == 15
    assert int(got["a"]["s2"]) == 9 + 25 + 49
    assert int(got["a"]["s3"]) == 27 + 125 + 343
    assert int(got["a"]["s4"]) == 81 + 625 + 2401
    # NULLs excluded: group b has one usable row
    assert got["b"]["n"] == 1 and int(got["b"]["s1"]) == 10


def test_skewness_kurtosis_vs_numpy(spark):
    rng = np.random.RandomState(11)
    groups = {
        "sym": rng.randint(0, 100, 400).tolist(),
        "right": (rng.gamma(2.0, 50, 400).astype(int)).tolist(),
        "heavy": (rng.standard_t(3, 400) * 30 + 500).astype(int).tolist(),
    }
    rows = [(g, int(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in skewness_kurtosis(df, "v", ["g"]).collect()}
    for g, vs in groups.items():
        mean, var, skew, kurt = _np_shape(vs)
        r = got[g]
        assert r["mean"] == pytest.approx(mean, abs=2e-6)
        assert r["variance"] == pytest.approx(var, rel=1e-6)
        assert r["skewness"] == pytest.approx(skew, abs=2e-6)
        assert r["kurtosis"] == pytest.approx(kurt, abs=2e-6)
    # shape sanity on the constructed distributions
    assert got["right"]["skewness"] > 0.5
    assert got["heavy"]["kurtosis"] > 1.0


def test_constant_and_tiny_groups_guarded(spark):
    df = spark.createDataFrame(
        [("const", 7)] * 5 + [("single", 42)], "g string, v long"
    )
    got = {r["g"]: r for r in skewness_kurtosis(df, "v", ["g"]).collect()}
    c = got["const"]
    # B = 0 → shape stats undefined, never a division error
    assert c["variance"] == 0.0
    assert c["skewness"] is None and c["kurtosis"] is None
    s = got["single"]
    assert s["mean"] == 42.0 and s["skewness"] is None


def test_moments_merge_associative(spark):
    """The anchors are mergeable sufficient statistics: summing the
    power sums of two disjoint halves equals the whole — the property
    the manifest's resumable sketches rely on."""
    vals = list(range(1, 201))
    whole = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    h1 = spark.createDataFrame([("g", v) for v in vals[:97]], "g string, v long")
    h2 = spark.createDataFrame([("g", v) for v in vals[97:]], "g string, v long")
    w = power_sums_exact(whole, "v", ["g"]).collect()[0]
    a = power_sums_exact(h1, "v", ["g"]).collect()[0]
    b = power_sums_exact(h2, "v", ["g"]).collect()[0]
    for c in ("s1", "s2", "s3", "s4"):
        assert int(w[c]) == int(a[c]) + int(b[c])
    assert w["n"] == a["n"] + b["n"]


def test_ungrouped_whole_table(spark):
    df = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 100]], "v long")
    r = skewness_kurtosis(df, "v").collect()[0]
    mean, var, skew, kurt = _np_shape([1, 2, 3, 4, 100])
    assert r["mean"] == pytest.approx(mean, abs=1e-6)
    assert r["skewness"] == pytest.approx(skew, abs=2e-6)
    assert r["kurtosis"] == pytest.approx(kurt, abs=2e-6)
