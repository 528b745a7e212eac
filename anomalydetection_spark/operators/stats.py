"""Per-partition column statistics constraint.

Generalizes the reference's feature-matrix summary (count / n_features /
mean / std / min / max, mlflow_utils.py:71-97) and its null filter
(feature_extraction.py:79) into declarative per-Iceberg-partition column
stats with pass/fail thresholds:

- doc level: row count, empty-span rate, spans-per-doc mean/max
- span level: per-kind counts, null-text rate on text/code spans,
  span text-length count/mean/stddev/min/max/p50/p95

Scale design: ONE explode + ONE hash aggregate per level. All metrics are
conditional aggregates inside a single ``groupBy(partition_id)`` — Spark
plans a partial (map-side) + final agg, so the shuffle carries one row per
(partition_id × metric-set), not per span. Exact ``percentile`` matches
NumPy's linear interpolation (reference end_to_end_prediction.py:447); at
10^12-row scale swap to ``percentile_approx`` / the t-digest sketch path
(operators/tdigest.py) via ``exact_quantiles=False``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINT = "column_stats"


@dataclass(frozen=True)
class StatsThresholds:
    max_null_text_rate: float = 0.05   # share of text/code spans with NULL text
    max_empty_spans_rate: float = 0.05
    min_rows: int = 1
    exact_quantiles: bool = True       # False → percentile_approx at scale
    # opt-in shape moments (operators/moments.py): adds text_len_skewness /
    # text_len_kurtosis to the verdict metrics map — report-only signals
    # for the metrics ledger's anomaly detection (a length distribution
    # growing a heavy tail moves kurtosis long before mean/p95 move).
    # Rides the SAME span aggregate (exact int64 power sums as extra
    # map-side partials, no second scan); default off → byte-identical.
    collect_moments: bool = False


def check(
    docs: DataFrame,
    exploded: DataFrame,  # the narrow meta view (reassembly.explode_spans_meta)
    th: StatsThresholds = StatsThresholds(),
    share_violations: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """column_stats constraint → (verdicts, violations).

    ``share_violations``: persist the violation rows and derive the
    verdicts' ``n_null_text`` from THEM (a per-partition count join)
    instead of an inline conditional sum — the verdict action then
    materializes the persisted frame, so the separate violations action
    reuses it rather than re-scanning the span table (one fewer pass over
    the fat text leaf per suite run; identical values either way)."""
    # --- doc-level single-pass agg ---------------------------------------
    # span count via the offset leaf (same length as spans; nested pruning
    # then reads one int leaf instead of the whole struct incl. text)
    n_spans_arr = F.size(F.col("spans.offset"))
    doc_stats = docs.groupBy("partition_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg(F.when(n_spans_arr == 0, 1.0).otherwise(0.0)).alias("empty_spans_rate"),
        F.avg(n_spans_arr).alias("spans_per_doc_mean"),
        F.max(n_spans_arr).cast("double").alias("spans_per_doc_max"),
    )

    # --- span-level single-pass agg (over the narrow meta view: text_len
    # is NULL iff text is NULL, so null-rate and length stats need no raw
    # string bytes) ------------------------------------------------------
    texty = F.col("kind").isin("text", "code")
    tlen = F.col("text_len").cast("double")
    if th.exact_quantiles:
        p50 = F.expr("percentile(text_len, 0.5)")
        p95 = F.expr("percentile(text_len, 0.95)")
    else:
        p50 = F.expr("percentile_approx(text_len, 0.5, 10000)").cast("double")
        p95 = F.expr("percentile_approx(text_len, 0.95, 10000)").cast("double")

    violations = exploded.filter(texty & F.col("text_len").isNull()).select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.concat(F.lit("null text on kind="), F.col("kind")).alias("detail"),
    )
    if share_violations:
        from pyspark.storagelevel import StorageLevel

        violations = violations.persist(StorageLevel.MEMORY_AND_DISK)
        null_counts = violations.groupBy("partition_id").agg(
            F.count("*").cast("long").alias("n_null_text")
        )

    agg_null_text = (
        F.sum(F.when(texty & F.col("text_len").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_text")
    )
    moment_aggs = []
    if th.collect_moments:
        from anomalydetection_spark.operators.moments import power_sum_aggs

        moment_aggs = power_sum_aggs("text_len", "_mom_")
    span_stats = exploded.groupBy("partition_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.when(texty, 1).otherwise(0)).cast("long").alias("n_texty"),
        *([] if share_violations else [agg_null_text]),
        F.avg(tlen).alias("text_len_mean"),
        F.stddev(tlen).alias("text_len_std"),
        F.min(tlen).alias("text_len_min"),
        F.max(tlen).alias("text_len_max"),
        p50.alias("text_len_p50"),
        p95.alias("text_len_p95"),
        F.approx_count_distinct("media_ref").cast("double").alias("media_ref_approx_distinct"),
        *moment_aggs,
    )

    joined = doc_stats.join(span_stats, "partition_id", "left")
    if share_violations:
        joined = joined.join(null_counts, "partition_id", "left").withColumn(
            "n_null_text", F.coalesce(F.col("n_null_text"), F.lit(0)).cast("long")
        )
    null_text_rate = F.when(
        F.col("n_texty") > 0, F.col("n_null_text") / F.col("n_texty")
    ).otherwise(F.lit(0.0))

    passed = (
        (F.col("n_docs") >= F.lit(th.min_rows))
        & (F.col("empty_spans_rate") <= F.lit(th.max_empty_spans_rate))
        & (null_text_rate <= F.lit(th.max_null_text_rate))
    )

    metric_keys = [
        F.lit("n_docs"), F.lit("n_spans"), F.lit("empty_spans_rate"),
        F.lit("spans_per_doc_mean"), F.lit("spans_per_doc_max"),
        F.lit("null_text_rate"), F.lit("text_len_mean"), F.lit("text_len_std"),
        F.lit("text_len_min"), F.lit("text_len_max"),
        F.lit("text_len_p50"), F.lit("text_len_p95"),
        F.lit("media_ref_approx_distinct"),
    ]
    metric_vals = [
        F.col("n_docs").cast("double"), F.col("n_spans").cast("double"),
        F.col("empty_spans_rate"), F.col("spans_per_doc_mean"),
        F.col("spans_per_doc_max"), null_text_rate,
        F.col("text_len_mean"), F.col("text_len_std"),
        F.col("text_len_min"), F.col("text_len_max"),
        F.col("text_len_p50"), F.col("text_len_p95"),
        F.col("media_ref_approx_distinct"),
    ]
    if th.collect_moments:
        from anomalydetection_spark.operators.moments import shape_cols

        shapes = shape_cols("_mom_")
        metric_keys += [F.lit("text_len_skewness"), F.lit("text_len_kurtosis")]
        metric_vals += [shapes["skewness"], shapes["kurtosis"]]
    verdicts = joined.select(
        "partition_id",
        F.lit(CONSTRAINT).alias("constraint"),
        passed.alias("passed"),
        F.coalesce(F.col("n_null_text"), F.lit(0)).cast("long").alias("violation_count"),
        F.col("n_docs").cast("long").alias("row_count"),
        F.map_from_arrays(
            F.array(*metric_keys), F.array(*metric_vals)
        ).alias("metrics"),
    )

    return verdicts, violations


def mad_outliers(
    agg: DataFrame,
    value_col: str,
    *,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust (median/MAD) outlier flags over an already-aggregated frame.

    The reference thresholds anomaly scores at a fixed quantile
    (end_to_end_prediction.py:447); the robust-z variant is the standard
    batch analog when the score distribution has heavy tails: median and
    MAD = median(|x - median|) resist the outliers themselves.

    Plan shape (scale-safe): ``agg`` is small (one row per group/bucket —
    the *input* corpus was already reduced by a hash agg), so the two
    exact-percentile passes aggregate it to single-row scalars that
    broadcast back via crossJoin — the same scalar-agg pattern as the
    drift checks (drift.py:103), no partition-less window anywhere.

    Returns ``agg`` + (rz, is_outlier); rz is NULL when MAD = 0 (constant
    series — every deviation infinite; flag only exact non-equality).
    """
    v = F.col(value_col).cast("double")
    med = agg.agg(F.percentile(v, F.lit(0.5)).alias("_med"))
    with_med = agg.crossJoin(F.broadcast(med))
    mad = with_med.agg(
        F.percentile(F.abs(v - F.col("_med")), F.lit(0.5)).alias("_mad")
    )
    scored = with_med.crossJoin(F.broadcast(mad))
    rz = F.when(F.col("_mad") > 0, F.round(F.abs(v - F.col("_med")) / F.col("_mad"), 6))
    is_out = F.when(F.col("_mad") > 0, F.abs(v - F.col("_med")) / F.col("_mad") > z_threshold).otherwise(
        v != F.col("_med")
    )
    return scored.select(
        *[F.col(c) for c in agg.columns],
        rz.alias("rz"),
        is_out.alias("is_outlier"),
    )


def mad_outliers_grouped(
    agg: DataFrame,
    group_col: str,
    value_col: str,
    *,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Per-group robust (median/MAD) outlier flags — `mad_outliers` with
    the median and MAD computed WITHIN each group, so a value is judged
    against its own series' distribution (an hour anomalous for logins
    may be normal for batch jobs).

    Plan shape: two grouped exact-percentile aggregates over the
    already-aggregated input (group-keyed hash aggs, map-side partials —
    no window, no crossJoin blowup), each broadcast back onto the rows.
    Returns ``agg`` + (rz, is_outlier) with the `mad_outliers` zero-MAD
    convention per group.
    """
    v = F.col(value_col).cast("double")
    med = agg.groupBy(group_col).agg(F.percentile(v, F.lit(0.5)).alias("_med"))
    with_med = agg.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        F.percentile(F.abs(v - F.col("_med")), F.lit(0.5)).alias("_mad")
    )
    scored = with_med.join(F.broadcast(mad), group_col)
    rz = F.when(F.col("_mad") > 0, F.round(F.abs(v - F.col("_med")) / F.col("_mad"), 6))
    is_out = F.when(
        F.col("_mad") > 0, F.abs(v - F.col("_med")) / F.col("_mad") > z_threshold
    ).otherwise(v != F.col("_med"))
    return scored.select(
        *[F.col(c) for c in agg.columns],
        rz.alias("rz"),
        is_out.alias("is_outlier"),
    )
