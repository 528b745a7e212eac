"""Property test: the moment analyzer's decimal(38,0) power-sum anchors
equal exact Python big-int arithmetic on arbitrary int lists within the
documented domain bound (|x| ≤ 55,108 keeps per-row x⁴ in int64), and
the derived shape stats equal a Python mirror of the DOCUMENTED raw-sum
expression shapes (the engine/oracle contract — the centered-moment
formula agrees only on well-conditioned input, which the fixed-seed unit
tests in test_moments.py cover)."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from anomalydetection_spark.operators.moments import skewness_kurtosis

# NB: this module must NOT call get_spark() with its own shuffle/master
# settings — getOrCreate applies builder SQL confs to the EXISTING shared
# session, and a leaked spark.sql.shuffle.partitions broke the AQE skew
# test downstream. Use the conftest fixture like every other test.


def _round6(v: float) -> float:
    """Spark's round(double, 6): HALF_UP over the double's SHORTEST
    decimal repr (BigDecimal.valueOf semantics) — differs from Python's
    built-in round (half-even over the exact binary expansion) exactly
    when the value needs ~15+ significant digits."""
    return float(Decimal(repr(v)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))

def _mirror(xs):
    """The module-docstring expression shapes, literally, in Python floats
    (IEEE doubles with the same op order as the Spark/SQL expressions)."""
    nn = len(xs)
    n = float(nn)
    s1 = float(sum(int(v) for v in xs))
    s2 = float(sum(int(v) ** 2 for v in xs))
    s3 = float(sum(int(v) ** 3 for v in xs))
    s4 = float(sum(int(v) ** 4 for v in xs))
    b = n * s2 - s1 * s1
    a = n * n * s3 - 3.0 * n * s1 * s2 + 2.0 * s1 * s1 * s1
    c = (
        n * n * n * s4
        - 4.0 * n * n * s1 * s3
        + 6.0 * n * s1 * s1 * s2
        - 3.0 * s1 * s1 * s1 * s1
    )
    mean = _round6(s1 / n) if nn >= 1 else None
    var = _round6(b / (n * n)) if nn >= 1 else None
    if nn >= 2 and b > 0:
        skew = _round6(a / (b * math.sqrt(b)))
        kurt = _round6(c / (b * b) - 3.0)
    else:
        skew = kurt = None
    return mean, var, skew, kurt


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
    mean, var, skew, kurt = _mirror(xs)
    # Spark's decimal→double cast and Python's int→float both round to
    # nearest; identical op order ⇒ identical doubles ⇒ identical round-6
    assert r["mean"] == mean
    assert r["variance"] == var
    assert r["skewness"] == skew
    assert r["kurtosis"] == kurt
