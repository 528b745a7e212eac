"""Property test: the moment analyzer's decimal(38,0) power-sum anchors
equal exact Python big-int arithmetic on arbitrary int lists, and the
deterministic fixed-point shape columns equal a Python mirror of the
DOCUMENTED scheme — exact integer div for mean/variance, int64-limb
double reconstruction + floor(t·1e6 + 0.5) for skewness/kurtosis. The
mirror is step-for-step the engine/oracle contract: every float op is an
IEEE double op in the same order, so Python, Spark, and DuckDB must all
produce the same bits (the round-3 driver-red cell was the engine-native
round(double, 6), which this scheme removed from the hash boundary)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from anomalydetection_spark.operators.moments import skewness_kurtosis

# NB: this module must NOT call get_spark() with its own shuffle/master
# settings — getOrCreate applies builder SQL confs to the EXISTING shared
# session, and a leaked spark.sql.shuffle.partitions broke the AQE skew
# test downstream. Use the conftest fixture like every other test.


def _limb_double(v: int) -> float:
    """The moments.py limb reconstruction, literally: three base-10^13
    int64 limbs, each exactly convertible to double, recombined with
    left-associative double arithmetic."""
    sign = -1.0 if v < 0 else 1.0
    a = abs(v)
    l2 = a // 10**26
    r = a - l2 * 10**26
    l1 = r // 10**13
    l0 = r - l1 * 10**13
    return sign * (float(l2) * 1e26 + float(l1) * 1e13 + float(l0))


def _fp6_div(num: int, den: int):
    sign = -1 if num < 0 else 1
    return sign * ((abs(num) * 10**6) // den)


def _mirror(xs):
    """The shape_fp_sql expression shapes, in Python (exact ints for the
    anchors and B; IEEE doubles with the same op order for skew/kurt)."""
    nn = len(xs)
    s1 = sum(int(v) for v in xs)
    s2 = sum(int(v) ** 2 for v in xs)
    s3 = sum(int(v) ** 3 for v in xs)
    s4 = sum(int(v) ** 4 for v in xs)
    b_exact = nn * s2 - s1 * s1
    mean_fp6 = _fp6_div(s1, nn) if nn >= 1 else None
    var_fp6 = _fp6_div(b_exact, nn * nn) if nn >= 1 else None
    if nn >= 2 and b_exact > 0:
        nd = float(nn)
        d1 = _limb_double(s1)
        d2 = _limb_double(s2)
        d3 = _limb_double(s3)
        d4 = _limb_double(s4)
        bd = _limb_double(b_exact)
        a_d = nd * nd * d3 - 3.0 * nd * d1 * d2 + 2.0 * d1 * d1 * d1
        c_d = (
            nd * nd * nd * d4
            - 4.0 * nd * nd * d1 * d3
            + 6.0 * nd * d1 * d1 * d2
            - 3.0 * d1 * d1 * d1 * d1
        )
        skew_fp6 = math.floor(a_d / (bd * math.sqrt(bd)) * 1000000.0 + 0.5)
        kurt_fp6 = math.floor((c_d / (bd * bd) - 3.0) * 1000000.0 + 0.5)
    else:
        skew_fp6 = kurt_fp6 = None
    return mean_fp6, var_fp6, skew_fp6, kurt_fp6


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.integers(min_value=-55_108, max_value=55_108), min_size=1, max_size=60
    )
)
def test_power_sums_and_shapes_match_mirror(spark, xs):
    df = spark.createDataFrame([(int(v),) for v in xs], "v long")
    r = skewness_kurtosis(df, "v").collect()[0]
    assert r["n"] == len(xs)
    for p, col in ((1, "s1"), (2, "s2"), (3, "s3"), (4, "s4")):
        assert int(r[col]) == sum(int(v) ** p for v in xs)  # exact big-int
    mean_fp6, var_fp6, skew_fp6, kurt_fp6 = _mirror(xs)
    assert r["mean_fp6"] == mean_fp6
    assert r["variance_fp6"] == var_fp6
    assert r["skewness_fp6"] == skew_fp6
    assert r["kurtosis_fp6"] == kurt_fp6
