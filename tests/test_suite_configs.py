"""Config-path equivalence: every SuiteConfig variant must produce
identical verdicts (they change the physical plan, never the semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.datagen import (
    DataGenConfig,
    clean_config,
    generate_documents,
    generate_media_assets,
)
from anomalydetection_spark.operators import drift, reassembly, stats
from anomalydetection_spark.plans.suite import SuiteConfig, run_suite

CFG = DataGenConfig(n_docs=1200, n_partitions=4, n_media=200, drift_partitions=(3,))


@pytest.fixture(scope="module")
def inputs(spark):
    docs = generate_documents(spark, CFG).cache()
    media = generate_media_assets(spark, CFG).cache()
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(CFG)))
    ).cache()
    return docs, media, baseline


def _key(res):
    return sorted(
        (r["partition_id"], r["constraint"], r["passed"], r["violation_count"], r["row_count"])
        for r in res.verdicts.collect()
    )


def test_all_suite_configs_equivalent(spark, inputs):
    docs, media, baseline = inputs
    golden = _key(run_suite(docs, media, baseline, SuiteConfig()))
    variants = [
        SuiteConfig(persist_exploded=False),
        SuiteConfig(persist_violations=False),
        SuiteConfig(repartition_exploded=8),
        SuiteConfig(persist_exploded=False, repartition_exploded=8, persist_violations=False),
        SuiteConfig(n_salts=4),
        SuiteConfig(broadcast_media=False),
    ]
    for cfg in variants:
        assert _key(run_suite(docs, media, baseline, cfg)) == golden, cfg


def test_approx_quantile_path(spark, inputs):
    """exact_quantiles=False (the 10^12-row path): percentile_approx stats
    stay within tolerance of the exact ones; pass/fail identical."""
    docs, media, baseline = inputs
    exploded = reassembly.explode_spans_meta(docs)
    exact_v, _ = stats.check(docs, exploded, stats.StatsThresholds(exact_quantiles=True))
    approx_v, _ = stats.check(docs, exploded, stats.StatsThresholds(exact_quantiles=False))
    e = {r["partition_id"]: r for r in exact_v.collect()}
    a = {r["partition_id"]: r for r in approx_v.collect()}
    assert set(e) == set(a)
    for pid in e:
        assert a[pid]["passed"] == e[pid]["passed"]
        for q in ("text_len_p50", "text_len_p95"):
            assert a[pid]["metrics"][q] == pytest.approx(e[pid]["metrics"][q], rel=0.05)
