"""Metric-history anomaly detection: integer-exact strategy semantics on
crafted series, a NumPy mirror on random series, and the run-ledger
integration (a partition whose violation count jumps across validation
runs is flagged even though every in-run constraint still evaluates)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.datagen import (
    DataGenConfig,
    clean_config,
    generate_documents,
    generate_media_assets,
)
from anomalydetection_spark.operators import drift, reassembly
from anomalydetection_spark.operators.metrics_anomaly import (
    AnomalyThresholds,
    flag_anomalies,
    metric_history_check,
)
from anomalydetection_spark.plans.manifest import ResumableValidator


def _series(spark, values, key="m"):
    return spark.createDataFrame(
        [(key, i, int(v)) for i, v in enumerate(values)],
        "metric string, seq int, value long",
    )


def _flags(spark, values, col, **kw):
    df = flag_anomalies(
        _series(spark, values), ["metric"], "seq", "value", AnomalyThresholds(**kw)
    )
    return [r[col] for r in df.orderBy("seq").collect()]


def test_online_normal_flags_spike_causally(spark):
    # stable history then a spike: only the spike flags, and the points
    # BEFORE it keep their flags (causal — history-only windows)
    vals = [100, 102, 98, 101, 99, 100, 500, 100]
    got = _flags(spark, vals, "normal_anomaly")
    assert got[6] is True
    assert all(g is False for i, g in enumerate(got) if i != 6)


def test_zero_variance_history_flags_any_deviation(spark):
    got = _flags(spark, [50, 50, 50, 50, 51], "normal_anomaly")
    assert got == [False, False, False, False, True]
    same = _flags(spark, [50, 50, 50, 50, 50], "normal_anomaly")
    assert same == [False] * 5


def test_min_history_gates_early_points(spark):
    # huge jump at index 2, but min_history=3 means nothing can flag before
    # index 3
    got = _flags(spark, [1, 1, 999, 1], "normal_anomaly", min_history=3)
    assert got[2] is False


def test_change_anomaly_relative_bounds(spark):
    # +50%/−50% bounds vs the immediate predecessor, strict inequalities:
    # 100→150 is exactly +50% (no flag), 150→226 is just over (+50.7%),
    # 226→112 is just under half (flag), 112→57 is 50.9% (no flag)
    got = _flags(spark, [100, 150, 226, 112, 57], "change_anomaly")
    assert got == [False, False, True, True, False]


def test_change_anomaly_absolute_bound(spark):
    got = _flags(
        spark,
        [1000, 1020, 1031],
        "change_anomaly",
        max_pct_increase=500,
        max_pct_decrease=99,
        max_abs_change=10,
    )
    # +20 and +11 both exceed the abs bound of 10
    assert got == [False, True, True]


def test_online_normal_matches_numpy_mirror(spark):
    rng = np.random.default_rng(7)
    for trial in range(3):
        vals = rng.integers(0, 10_000, size=40).tolist()
        got = _flags(spark, vals, "normal_anomaly", k_num=3, k_den=2, min_history=3)
        for i, v in enumerate(vals):
            hist = np.array(vals[:i], dtype=np.float64)
            if len(hist) < 3:
                expect = False
            else:
                mu = hist.mean()
                sd = hist.std(ddof=1)
                expect = bool(abs(v - mu) > 1.5 * sd)
            assert got[i] == expect, (trial, i, vals)


def test_metric_history_check_keeps_latest_per_series(spark):
    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 1, 11), ("b", 0, 5), ("b", 1, 99)],
        "metric string, seq int, value long",
    )
    out = metric_history_check(df, ["metric"], "seq", "value").collect()
    by_key = {r["metric"]: r for r in out}
    assert len(out) == 2
    assert by_key["a"]["seq"] == 1 and by_key["b"]["seq"] == 1
    assert by_key["b"]["change_anomaly"] is True


CFG = DataGenConfig(n_docs=800, n_partitions=4, n_media=150)


def test_run_ledger_anomaly_flags_violation_jump(spark, tmp_path):
    """Four validation passes over the same partitions (invalidated between
    passes): three on the stable input, a fourth on an input with a much
    higher duplicate rate. The jump partitionwise violation_count series
    must flag on the LAST pass only, via the validator's own ledger."""
    docs = generate_documents(spark, CFG).cache()
    noisy = generate_documents(
        spark,
        DataGenConfig(n_docs=800, n_partitions=4, n_media=150, dup_rate=0.4, seed=43),
    ).cache()
    media = generate_media_assets(spark, CFG).cache()
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(CFG)))
    ).cache()

    v = ResumableValidator(spark, str(tmp_path / "state"), str(tmp_path / "out"))
    for _ in range(3):
        v.run(docs, media, baseline)
        v.manifest.invalidate(list(range(4)))
    v.run(noisy, media, baseline)

    hist = v.metrics_history()
    # one row per (pass, partition): 4 passes x 4 partitions
    assert hist.count() == 16
    # seq strictly orders passes
    assert [r["seq"] for r in hist.select("seq").distinct().orderBy("seq").collect()] == [
        1, 2, 3, 4,
    ]

    latest = v.metric_anomalies(
        AnomalyThresholds(k_num=3, k_den=1, min_history=2)
    ).collect()
    flags = {
        (r["partition_id"], r["metric"]): r["normal_anomaly"] for r in latest
    }
    # every partition's violation_count jumped on the noisy pass
    assert all(flags[(p, "violation_count")] for p in range(4))
    # latest rows are all from the 4th pass
    assert all(r["seq"] == 4 for r in latest)


def test_metric_anomalies_is_causal_after_stable_run(spark, tmp_path):
    """A second stable pass after the spike: the spike is now history and
    the newest (stable, equal-to-early-history) point must not flag under
    change_anomaly — flags never 'stick' to the series."""
    docs = generate_documents(spark, CFG).cache()
    media = generate_media_assets(spark, CFG).cache()
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(CFG)))
    ).cache()

    v = ResumableValidator(spark, str(tmp_path / "state"), str(tmp_path / "out"))
    for _ in range(2):
        v.run(docs, media, baseline)
        v.manifest.invalidate(list(range(4)))
    v.run(docs, media, baseline)
    latest = v.metric_anomalies().collect()
    assert latest and all(not r["change_anomaly"] for r in latest)
