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

Cross-engine determinism (the `correlation_exact` precedent,
infotheory.py:129): the emitted anchors are EXACT — n as bigint and the
raw power sums Σx, Σx², Σx³, Σx⁴ as decimal(38,0), accumulated from
per-row int64 powers. The float display columns derive from those exact
sums with operands promoted to double BEFORE any product (IEEE double
mult/div is bit-identical across engines, so identical expression shape
⇒ identical doubles ⇒ identical round(·, 6)):

    B = n·S2 − S1²               (M2·n², population-variance numerator)
    A = n²·S3 − 3n·S1·S2 + 2S1³  (M3·n³)
    C = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3S1⁴  (M4·n⁴)

    variance  = B / n²
    skewness  = A / (B·√B)        (the n-powers cancel exactly)
    kurtosis  = C / B² − 3        (excess; Fisher convention)

Domain bound: per-row x⁴ must fit int64, i.e. |x| ≤ 55,108 — lengths,
counts, bucket ids, scores-in-cents all qualify; rescale wider domains
first. The decimal(38,0) sums then stay exact to ~10¹² rows × |x| ≤ 5·10⁴
(S4 ≤ 10¹²·9.2·10¹⁸ < 10³⁸).

Scale: ONE hash aggregate with map-side partials; the power sums are the
mergeable sufficient statistics (combine = add), so partition-level
partials merge associatively — the same property the manifest's sketch
blobs rely on. NULLs are excluded (completeness is its own analyzer);
n < 2 or a constant column (B = 0) yields NULL shape columns, never a
division error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def power_sum_aggs(value_col: str, prefix: str = "") -> list[Column]:
    """The five aggregate expressions of the exact anchors — importable
    into a caller's own single-pass groupBy (the suite's column_stats
    constraint rides them inside its existing span aggregate rather than
    paying a second scan). Emits {prefix}n, {prefix}s1..{prefix}s4."""
    x = F.col(value_col).cast("long")
    x2 = x * x
    return [
        F.count(x).cast("long").alias(f"{prefix}n"),
        F.sum(x.cast(_D38)).cast(_D38).alias(f"{prefix}s1"),
        F.sum(x2.cast(_D38)).cast(_D38).alias(f"{prefix}s2"),
        F.sum((x2 * x).cast(_D38)).cast(_D38).alias(f"{prefix}s3"),
        F.sum((x2 * x2).cast(_D38)).cast(_D38).alias(f"{prefix}s4"),
    ]


def shape_cols(prefix: str = "") -> dict[str, Column]:
    """Derived shape columns (mean/variance/skewness/kurtosis, round-6
    doubles) over the {prefix}n..{prefix}s4 anchor columns, in the
    module-docstring expression shapes — mirror them verbatim in SQL
    twins."""
    n = F.col(f"{prefix}n").cast("double")
    s1 = F.col(f"{prefix}s1").cast("double")
    s2 = F.col(f"{prefix}s2").cast("double")
    s3 = F.col(f"{prefix}s3").cast("double")
    s4 = F.col(f"{prefix}s4").cast("double")
    b = n * s2 - s1 * s1
    a = n * n * s3 - F.lit(3.0) * n * s1 * s2 + F.lit(2.0) * s1 * s1 * s1
    c = (
        n * n * n * s4
        - F.lit(4.0) * n * n * s1 * s3
        + F.lit(6.0) * n * s1 * s1 * s2
        - F.lit(3.0) * s1 * s1 * s1 * s1
    )
    nn = F.col(f"{prefix}n")
    return {
        "mean": F.when(nn >= 1, F.round(s1 / n, 6)),
        "variance": F.when(nn >= 1, F.round(b / (n * n), 6)),
        "skewness": F.when((nn >= 2) & (b > 0), F.round(a / (b * F.sqrt(b)), 6)),
        "kurtosis": F.when(
            (nn >= 2) & (b > 0), F.round(c / (b * b) - F.lit(3.0), 6)
        ),
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
    """Per-group shape summary: the exact anchors plus round-6 double
    ``mean``, ``variance`` (population), ``skewness``, ``kurtosis``
    (excess). Derivations follow the module-docstring expression shapes
    exactly — mirror them verbatim in any SQL twin."""
    sums = power_sums_exact(df, value_col, group_cols)
    gcols = group_cols or []
    shapes = shape_cols()
    return sums.select(
        *gcols,
        "n",
        "s1",
        "s2",
        "s3",
        "s4",
        *[expr.alias(name) for name, expr in shapes.items()],
    )
