"""Higher-moment column analyzers: variance, skewness, excess kurtosis.

The remaining members of the Deequ numeric-analyzer family
(StandardDeviation / Skewness / Kurtosis) next to the suite's
count/null/min/max/quantiles (stats.py) and the information-theoretic
batch (infotheory.py). The signals a curation pipeline watches when a
column's *shape* drifts while its mean stays put: a length distribution
growing a heavy tail (kurtosis up), truncation or unit-mangling pulling
the tail in (skewness flips), silent clipping (kurtosis collapses toward
the uniform's −1.2).

The reference's analog is per-class reconstruction-error histogram shape
(VAE_utils.py:296-301) — here re-expressed as exact distributed moments.

Cross-engine determinism — the round-4 hardening. Round 3's contract
("identical expression shape ⇒ identical doubles ⇒ identical
round(·,6)") failed in the driver because the LAST step is engine-
defined: Spark rounds doubles via BigDecimal HALF_UP on the exact binary
value while DuckDB's double round is itself a float computation — near a
1e-6 midpoint they differ by one output unit. The replacement keeps
every operation on the hash boundary exactly specified:

* anchors: n bigint; Σx..Σx⁴ as decimal(38,0) accumulated from per-row
  DECIMAL products (never a silently-wrapping int64 power — the round-3
  ADVICE overflow: x⁴ wraps int64 beyond |x| = 55,108; decimal products
  instead overflow LOUDLY to NULL far beyond any realistic domain,
  per-row exact to |x| ≤ 10⁹).
* mean_fp6 / variance_fp6: exact integer fixed-point (value·10⁶,
  truncated toward zero) via decimal multiply + integral division —
  integer arithmetic end to end, no doubles anywhere. Sign is split out
  first so Spark's `div` (truncates) and DuckDB's `//` agree for
  negative sums.
* skewness_fp6 / kurtosis_fp6 (value·10⁶, floor(t·1e6 + 0.5)): the
  inputs are doubles RECONSTRUCTED FROM INT64 LIMBS — each decimal
  anchor is split into three base-10¹³ bigint limbs by exact integer
  div/mod, each limb is cast int64→double (exactly representable,
  conversion exactly specified by IEEE), and the limbs are recombined
  with double multiplies/adds in a fixed left-associative order. Every
  subsequent op (+, −, ×, ÷, sqrt) is IEEE-754 correctly rounded and
  therefore bit-identical across engines given bit-identical inputs;
  floor is exact on doubles. No engine-native "big decimal → double"
  cast (whose rounding is NOT pinned down — DuckDB reconstructs hugeint
  doubles from two halves with a possible double-rounding) and no
  engine-native double round() ever touches the hash boundary.

    B = n·S2 − S1²               (M2·n², population-variance numerator)
    A = n²·S3 − 3n·S1·S2 + 2S1³  (M3·n³)
    C = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3S1⁴  (M4·n⁴)

    variance  = B / n²
    skewness  = A / (B·√B)        (the n-powers cancel exactly)
    kurtosis  = C / B² − 3        (excess; Fisher convention)

B is computed EXACTLY in decimal(38,0) (exact while n ≤ ~1.8·10¹¹ per
group at |x| ≤ 5.5·10⁴) and limb-reconstructed; A and C are computed in
reconstructed doubles (their exact decimals would overflow 10³⁸ at
n ≳ 10⁵–10⁸ per group), with the expression shapes above mirrored
verbatim in SQL twins — same literals, same associativity.

Scale: ONE hash aggregate with map-side partials; the power sums are the
mergeable sufficient statistics (combine = add), so partition-level
partials merge associatively — the same property the manifest's sketch
blobs rely on. NULLs are excluded (completeness is its own analyzer);
n < 2 or a constant column (B = 0, decided on the EXACT B) yields NULL
shape columns, never a division error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"
# base-10^13 limb split: 3 limbs cover 10^38 < 10^39; each limb < 10^13
# fits int64 AND is exactly representable as a double (< 2^53)
_L = "10000000000000"  # 10^13
_L2 = "100000000000000000000000000"  # 10^26


def power_sum_aggs(value_col: str, prefix: str = "") -> list[Column]:
    """The five aggregate expressions of the exact anchors — importable
    into a caller's own single-pass groupBy (the suite's column_stats
    constraint rides them inside its existing span aggregate rather than
    paying a second scan). Emits {prefix}n, {prefix}s1..{prefix}s4.

    Per-row powers are DECIMAL products (x² as int64 is safe to
    |x| ≤ 3·10⁹, but x³/x⁴ wrap silently beyond 2·10⁶ / 5.5·10⁴ —
    casting to decimal(38,0) before each further multiply keeps the row
    exact to |x| ≤ 10⁹ and overflows to NULL, never to a wrong value,
    beyond that)."""
    x = F.col(value_col).cast("long")
    xd = x.cast(_D38)
    x2d = (xd * xd).cast(_D38)
    return [
        F.count(x).cast("long").alias(f"{prefix}n"),
        F.sum(xd).cast(_D38).alias(f"{prefix}s1"),
        F.sum(x2d).cast(_D38).alias(f"{prefix}s2"),
        F.sum((x2d * xd).cast(_D38)).cast(_D38).alias(f"{prefix}s3"),
        F.sum((x2d * x2d).cast(_D38)).cast(_D38).alias(f"{prefix}s4"),
    ]


def _limb_double_sql(expr: str) -> str:
    """SQL text reconstructing a double from a decimal(38,0) expression
    via three exact int64 base-10¹³ limbs. Engine-portable: uses only
    abs, integral div (`div` in Spark — callers swap `//` for DuckDB via
    LIMB_DIV_OP), exact decimal multiply/subtract, int64→double casts,
    and fixed left-associative double arithmetic — every step exactly
    specified, so both engines produce the same bits."""
    a = f"abs({expr})"
    l2 = f"CAST(({a} div CAST('{_L2}' AS DECIMAL(38,0))) AS BIGINT)"
    r = f"({a} - CAST({l2} AS DECIMAL(38,0)) * CAST('{_L2}' AS DECIMAL(38,0)))"
    l1 = f"CAST(({r} div CAST('{_L}' AS DECIMAL(38,0))) AS BIGINT)"
    l0 = f"CAST(({r} - CAST({l1} AS DECIMAL(38,0)) * CAST('{_L}' AS DECIMAL(38,0))) AS BIGINT)"
    mag = (
        f"(CAST({l2} AS DOUBLE) * 1e26 + CAST({l1} AS DOUBLE) * 1e13"
        f" + CAST({l0} AS DOUBLE))"
    )
    return f"((CASE WHEN {expr} < 0 THEN -1.0 ELSE 1.0 END) * {mag})"


def _fp6_div_sql(num: str, den: str) -> str:
    """SQL text for sign(num)·((|num|·10⁶) div den) as bigint — exact
    integer fixed-point of num/den at 1e-6, truncated toward zero, with
    sign split out so truncating and flooring division agree."""
    q = (
        f"CAST(((abs({num}) * CAST(1000000 AS DECIMAL(38,0)))"
        f" div CAST({den} AS DECIMAL(38,0))) AS BIGINT)"
    )
    return f"((CASE WHEN {num} < 0 THEN -1 ELSE 1 END) * {q})"


def shape_fp_exprs(prefix: str = "") -> dict[str, Column]:
    """Deterministic fixed-point shape columns over the {prefix}n..
    {prefix}s4 anchors, as bigint value·10⁶:

    * ``mean_fp6``, ``variance_fp6`` — exact integer arithmetic.
    * ``skewness_fp6``, ``kurtosis_fp6`` — floor(t·1e6 + 0.5) on doubles
      built from int64 limbs (module docstring); cross-engine
      bit-deterministic, accurate to ~2 ulp of the true double.

    Mirror the generated SQL verbatim in DuckDB twins via
    :data:`MOMENTS_SHAPE_SQL_DUCKDB` / :func:`shape_fp_sql`."""
    sqls = shape_fp_sql(prefix, dialect="spark")
    return {name: F.expr(sql) for name, sql in sqls.items()}


def shape_fp_sql(prefix: str = "", dialect: str = "spark") -> dict[str, str]:
    """The shape-column SQL texts, parameterized by integral-division
    operator: Spark spells it ``div``, DuckDB ``//``. Everything else is
    common SQL. The DuckDB twin embeds these same strings so the two
    engines run the SAME formula by construction."""
    n, s1, s2, s3, s4 = (f"{prefix}{c}" for c in ("n", "s1", "s2", "s3", "s4"))
    b_exact = (
        f"(CAST({n} AS DECIMAL(38,0)) * {s2} - {s1} * {s1})"
    )
    nd = f"CAST({n} AS DOUBLE)"
    d1 = _limb_double_sql(s1)
    d2 = _limb_double_sql(s2)
    d3 = _limb_double_sql(s3)
    d4 = _limb_double_sql(s4)
    bd = _limb_double_sql(b_exact)
    a_d = (
        f"({nd} * {nd} * {d3} - 3.0 * {nd} * {d1} * {d2}"
        f" + 2.0 * {d1} * {d1} * {d1})"
    )
    c_d = (
        f"({nd} * {nd} * {nd} * {d4} - 4.0 * {nd} * {nd} * {d1} * {d3}"
        f" + 6.0 * {nd} * {d1} * {d1} * {d2}"
        f" - 3.0 * {d1} * {d1} * {d1} * {d1})"
    )
    skew_t = f"({a_d} / ({bd} * sqrt({bd})))"
    kurt_t = f"({c_d} / ({bd} * {bd}) - 3.0)"
    out = {
        "mean_fp6": f"CASE WHEN {n} >= 1 THEN {_fp6_div_sql(s1, n)} END",
        "variance_fp6": (
            f"CASE WHEN {n} >= 1 THEN "
            f"{_fp6_div_sql(b_exact, f'(CAST({n} AS DECIMAL(38,0)) * CAST({n} AS DECIMAL(38,0)))')}"
            f" END"
        ),
        "skewness_fp6": (
            f"CASE WHEN {n} >= 2 AND {b_exact} > 0 THEN "
            f"CAST(floor({skew_t} * 1000000.0 + 0.5) AS BIGINT) END"
        ),
        "kurtosis_fp6": (
            f"CASE WHEN {n} >= 2 AND {b_exact} > 0 THEN "
            f"CAST(floor({kurt_t} * 1000000.0 + 0.5) AS BIGINT) END"
        ),
    }
    if dialect == "duckdb":
        out = {
            k: v.replace(" div ", " // ").replace("DECIMAL(38,0)", "HUGEINT")
            for k, v in out.items()
        }
    return out


def shape_cols(prefix: str = "") -> dict[str, Column]:
    """Convenience double-valued shape columns (mean/variance/skewness/
    kurtosis) for metrics maps and dashboards: the deterministic fp6
    integers divided by 10⁶ (int64→double exact, one IEEE divide). Hash
    boundaries should prefer the fp6 integers directly."""
    fp = shape_fp_exprs(prefix)
    return {
        name[: -len("_fp6")]: (col.cast("double") / F.lit(1000000.0))
        for name, col in fp.items()
    }


def power_sums_exact(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Exact mergeable moment anchors per group: (``n``, ``s1``..``s4``)
    with n bigint and s1..s4 decimal(38,0). One hash aggregate."""
    gcols = group_cols or []
    return df.groupBy(*gcols).agg(*power_sum_aggs(value_col))


def skewness_kurtosis(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group shape summary: the exact anchors plus deterministic
    fixed-point ``mean_fp6``, ``variance_fp6`` (population),
    ``skewness_fp6``, ``kurtosis_fp6`` (excess) — all bigint value·10⁶,
    derivations per the module docstring. Mirror
    ``shape_fp_sql(dialect='duckdb')`` verbatim in any SQL twin."""
    sums = power_sums_exact(df, value_col, group_cols)
    gcols = group_cols or []
    shapes = shape_fp_exprs()
    return sums.select(
        *gcols,
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        *[expr.alias(name) for name, expr in shapes.items()],
    )
