"""Higher-moment analyzers (operators/moments.py) vs NumPy population
moments: exact power-sum anchors, deterministic fixed-point shape stats
(value·10⁶ bigints), NULL exclusion, and the degenerate-group guards."""

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


def _f(fp6):
    return None if fp6 is None else fp6 / 1e6


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


def test_power_sums_wide_domain_no_silent_wrap(spark):
    """Per-row powers are decimal products: values past the old int64-x⁴
    bound (|x| > 55,108 — the round-3 ADVICE silent-wrap) stay exact."""
    v = 1_000_000  # x⁴ = 1e24, far past int64, exact in decimal(38,0)
    df = spark.createDataFrame([("g", v)], "g string, v long")
    r = power_sums_exact(df, "v", ["g"]).collect()[0]
    assert int(r["s4"]) == v**4
    assert int(r["s3"]) == v**3


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
        assert _f(r["mean_fp6"]) == pytest.approx(mean, abs=2e-6)
        assert _f(r["variance_fp6"]) == pytest.approx(var, rel=1e-5)
        assert _f(r["skewness_fp6"]) == pytest.approx(skew, abs=2e-6)
        assert _f(r["kurtosis_fp6"]) == pytest.approx(kurt, abs=2e-6)
    # shape sanity on the constructed distributions
    assert got["right"]["skewness_fp6"] > 500_000
    assert got["heavy"]["kurtosis_fp6"] > 1_000_000


def test_constant_and_tiny_groups_guarded(spark):
    df = spark.createDataFrame(
        [("const", 7)] * 5 + [("single", 42)], "g string, v long"
    )
    got = {r["g"]: r for r in skewness_kurtosis(df, "v", ["g"]).collect()}
    c = got["const"]
    # B = 0 → shape stats undefined, never a division error
    assert c["variance_fp6"] == 0
    assert c["skewness_fp6"] is None and c["kurtosis_fp6"] is None
    s = got["single"]
    assert s["mean_fp6"] == 42_000_000 and s["skewness_fp6"] is None


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
    assert _f(r["mean_fp6"]) == pytest.approx(mean, abs=1e-6)
    assert _f(r["skewness_fp6"]) == pytest.approx(skew, abs=2e-6)
    assert _f(r["kurtosis_fp6"]) == pytest.approx(kurt, abs=2e-6)


def test_negative_values_sign_split(spark):
    """Negative sums exercise the sign-split integral divisions (Spark
    `div` truncates; the scheme splits sign so truncation == floor) and
    the signed limb reconstruction."""
    xs = [-9, -5, -1, 3]
    df = spark.createDataFrame([(v,) for v in xs], "v long")
    r = skewness_kurtosis(df, "v").collect()[0]
    mean, var, skew, kurt = _np_shape(xs)
    # mean = -3.0 exactly: trunc(|−12|·1e6 / 4)·sign = −3_000_000
    assert r["mean_fp6"] == -3_000_000
    assert _f(r["variance_fp6"]) == pytest.approx(var, abs=2e-6)
    assert _f(r["skewness_fp6"]) == pytest.approx(skew, abs=2e-6)
