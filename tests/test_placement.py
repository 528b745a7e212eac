"""placement constraint: misplaced-row detection semantics and the
opt-in suite/declarative wiring (not in the default constraint set; a
spec naming it without a transform fails loudly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.datagen import (
    DataGenConfig,
    clean_config,
    generate_documents,
    generate_media_assets,
)
from anomalydetection_spark.operators import drift, reassembly
from anomalydetection_spark.operators.placement import PlacementThresholds, check
from anomalydetection_spark.plans.declarative import run_declarative
from anomalydetection_spark.plans.suite import (
    ALL_CONSTRAINTS,
    run_suite,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d0", 0),   # 0 % 2 == 0: ok
            ("d1", 1),   # ok
            ("d2", 1),   # misplaced: transform says 0
            ("d3", 0),   # misplaced: transform says 1
        ],
        "doc_id string, partition_id int",
    ).withColumn("spans", F.expr("array()"))


EXPR = "pmod(cast(substr(doc_id, 2) as bigint), 2)"


def test_flags_only_misplaced_rows(spark):
    verdicts, violations = check(_docs(spark), PlacementThresholds(expr=EXPR))
    v = {r["partition_id"]: r for r in verdicts.collect()}
    assert v[0]["violation_count"] == 1 and not v[0]["passed"]
    assert v[1]["violation_count"] == 1 and not v[1]["passed"]
    assert v[0]["row_count"] == 2
    viol = {r["doc_id"]: r["detail"] for r in violations.collect()}
    assert set(viol) == {"d2", "d3"}
    assert viol["d2"] == "row in partition 1, transform places it in 0"


def test_null_transform_results_are_not_violations(spark):
    # try_cast (not cast: ANSI mode throws on malformed input) NULLs out —
    # a NULL transform result is a stats/schema problem, not a placement one
    docs = spark.createDataFrame([("nope", 0)], "doc_id string, partition_id int")
    verdicts, violations = check(
        docs, PlacementThresholds(expr="try_cast(doc_id as int)")
    )
    assert violations.count() == 0
    assert all(r["passed"] for r in verdicts.collect())


def test_requires_expr(spark):
    with pytest.raises(ValueError, match="transform expr"):
        check(_docs(spark), PlacementThresholds())


CFG = DataGenConfig(n_docs=400, n_partitions=4, n_media=100)


def test_optional_in_suite_and_declarative(spark):
    docs = generate_documents(spark, clean_config(CFG)).cache()
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))

    # not in the default run
    res = run_suite(docs, media, baseline)
    assert "placement" not in {r["constraint"] for r in res.verdicts.collect()}
    assert "placement" not in ALL_CONSTRAINTS

    # selectable via the declarative spec with the real datagen transform
    # (datagen assigns partition_id = floor(cid * n_partitions / n_docs)
    # over a permuted cid — reuse the column itself as a trivially-true
    # transform to prove the wiring, then a wrong transform to prove
    # detection)
    spec_ok = {
        "constraints": [
            {"type": "uniqueness"},
            {"type": "placement", "expr": "partition_id"},
        ]
    }
    res_ok = run_declarative(spec_ok, docs, media, baseline)
    rows = [r for r in res_ok.verdicts.collect() if r["constraint"] == "placement"]
    assert rows and all(r["passed"] for r in rows)

    spec_bad = {
        "constraints": [
            {"type": "placement", "expr": "pmod(xxhash64(doc_id), 4)"},
        ]
    }
    res_bad = run_declarative(spec_bad, docs, media, baseline)
    bad = [r for r in res_bad.verdicts.collect() if r["constraint"] == "placement"]
    assert any(not r["passed"] for r in bad)


def test_declarative_placement_without_expr_fails(spark):
    docs = generate_documents(spark, clean_config(CFG))
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))
    with pytest.raises(ValueError, match="transform expr"):
        run_declarative(
            {"constraints": [{"type": "placement"}]}, docs, media, baseline
        )
