"""Information-theoretic analyzers vs Python mirrors: entropy /
distinctness / mutual information / exact-moment correlation semantics,
including the null-exclusion and fixed-point contracts."""

from __future__ import annotations

import math

import numpy as np
import pytest

from anomalydetection_spark.operators.infotheory import (
    correlation_exact,
    entropy_fp,
    mutual_information_fp,
)


def _entropy_fp_mirror(counts):
    """Per-term-rounded fixed-point entropy numerator, as the operator
    defines it: Σ cnt·round(ln(n/cnt)·1e9)."""
    n = sum(counts)
    return sum(c * round(math.log(n / c) * 1e9) for c in counts)


def test_entropy_uniform_and_degenerate(spark):
    df = spark.createDataFrame(
        [("g", v) for v in ["a", "b", "c", "d"] * 25] + [("h", "only")] * 40,
        "grp string, v string",
    )
    out = {r["grp"]: r for r in entropy_fp(df, "v", ["grp"]).collect()}
    g = out["g"]
    assert g["n"] == 100 and g["n_distinct"] == 4
    assert g["distinctness_ppm"] == 40_000
    assert g["entropy_fp_n"] == _entropy_fp_mirror([25, 25, 25, 25])
    # uniform over 4: H = ln 4 exactly
    assert g["entropy_fp_n"] == 100 * round(math.log(4) * 1e9)
    h = out["h"]
    assert h["entropy_fp_n"] == 0 and h["n_distinct"] == 1
    assert h["distinctness_ppm"] == 25_000  # 1/40


def test_entropy_excludes_nulls_and_matches_mirror(spark):
    rng = np.random.default_rng(3)
    vals = [str(int(v)) for v in rng.integers(0, 7, 200)]
    rows = [(v,) for v in vals] + [(None,)] * 30
    df = spark.createDataFrame(rows, "v string")
    out = entropy_fp(df, "v").collect()[0]
    counts = [vals.count(str(k)) for k in range(7) if str(k) in vals]
    assert out["n"] == 200
    assert out["entropy_fp_n"] == _entropy_fp_mirror(counts)


def test_mutual_information_extremes(spark):
    # y == x: MI = H(x); independent y: MI numerator 0 exactly (every
    # cell ratio is 1, ln 1 = 0 — no rounding residue)
    rows_dep = [(str(i % 4), str(i % 4)) for i in range(80)]
    rows_ind = [(str(i % 4), str((i // 4) % 2)) for i in range(80)]
    dep = mutual_information_fp(
        spark.createDataFrame(rows_dep, "x string, y string"), "x", "y"
    ).collect()[0]
    ind = mutual_information_fp(
        spark.createDataFrame(rows_ind, "x string, y string"), "x", "y"
    ).collect()[0]
    assert dep["mi_fp_n"] == 80 * round(math.log(4) * 1e9)
    assert dep["n_cells"] == 4
    assert ind["mi_fp_n"] == 0
    assert ind["n_cells"] == 8


def test_mutual_information_mirror_on_random_joint(spark):
    rng = np.random.default_rng(11)
    xs = rng.integers(0, 3, 300)
    ys = (xs + rng.integers(0, 2, 300)) % 3  # correlated but not identical
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in zip(xs, ys)], "x string, y string"
    )
    got = mutual_information_fp(df, "x", "y").collect()[0]
    from collections import Counter

    joint = Counter(zip(xs.tolist(), ys.tolist()))
    cx = Counter(xs.tolist())
    cy = Counter(ys.tolist())
    n = 300
    expect = sum(
        c * round(math.log((c * n) / (cx[a] * cy[b])) * 1e9)
        for (a, b), c in joint.items()
    )
    assert got["mi_fp_n"] == expect
    assert got["mi_fp_n"] > 0


def test_correlation_exact_lines_and_nulls(spark):
    rows = (
        [("up", i, 3 * i + 7) for i in range(50)]
        + [("down", i, -2 * i + 1) for i in range(50)]
        + [("flat", i, 5) for i in range(50)]
        + [("up", None, 99), ("up", 99, None)]  # pairwise-excluded
    )
    df = spark.createDataFrame(rows, "g string, x int, y int")
    out = {r["g"]: r for r in correlation_exact(df, "x", "y", ["g"]).collect()}
    assert out["up"]["corr"] == 1.0 and out["up"]["n"] == 50
    assert out["down"]["corr"] == -1.0
    assert out["flat"]["corr"] is None  # zero variance -> undefined, not 0
    # exact moment sums are the mergeable stats
    assert out["up"]["sx"] == sum(range(50))
    assert out["up"]["sxy"] == sum(i * (3 * i + 7) for i in range(50))


def test_correlation_matches_numpy(spark):
    rng = np.random.default_rng(5)
    x = rng.integers(0, 1000, 400)
    y = x * 2 + rng.integers(-300, 300, 400)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(x, y)], "x long, y long"
    )
    got = correlation_exact(df, "x", "y").collect()[0]
    assert abs(got["corr"] - float(np.corrcoef(x, y)[0, 1])) < 1e-6


def test_correlation_matrix_matches_per_pair_analyzer(spark):
    """The one-pass matrix equals running correlation_exact per pair, and
    NULL exclusion is pairwise (a row missing only z still counts for the
    (x, y) pair)."""
    from anomalydetection_spark.operators.infotheory import correlation_matrix

    rows = [
        (1, 2, 10), (2, 4, 9), (3, 6, 8), (4, 8, None), (5, 10, 6), (6, None, 5),
    ]
    df = spark.createDataFrame(rows, "x long, y long, z long")
    got = {
        (r["col_x"], r["col_y"]): r
        for r in correlation_matrix(df, ["x", "y", "z"]).collect()
    }
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}
    for cx, cy in got:
        want = correlation_exact(df, cx, cy).collect()[0]
        g = got[(cx, cy)]
        for c in ("n", "sx", "sy", "sxy", "sxx", "syy"):
            assert g[c] == want[c], (cx, cy, c)
        if want["corr"] is None:
            assert g["corr"] is None
        else:
            assert g["corr"] == pytest.approx(float(want["corr"]), abs=1e-9)
    # x ∝ y exactly → corr 1; pairwise exclusion kept 5 rows for (x, y)
    assert got[("x", "y")]["n"] == 5 and got[("x", "y")]["corr"] == 1.0
    # x vs z is perfectly anti-monotone linear → -1 over its 5 pairs
    assert got[("x", "z")]["corr"] == -1.0
