"""expression constraint: NULL-is-violation semantics, where-scoping, the
fused multi-rule scan, and the repeatable declarative entry (deduped by
rule name, per-rule severity)."""

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
from anomalydetection_spark.operators.expression import ExpressionRule, check
from anomalydetection_spark.plans.declarative import compile_spec, run_declarative
from anomalydetection_spark.plans.suite import SuiteConfig, run_suite


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d0", 0, 10, "en"),
            ("d1", 0, -5, "en"),     # breaks nonneg
            ("d2", 1, None, "en"),   # NULL n -> nonneg is NULL -> violation
            ("d3", 1, 7, None),      # NULL lang -> out of en scope
            ("d4", 1, 3, "fr"),      # out of en scope
        ],
        "doc_id string, partition_id int, n int, lang string",
    )


RULES = (
    ExpressionRule("nonneg", "n >= 0"),
    ExpressionRule("en_small", "n < 100", where="lang = 'en'"),
)


def test_null_expr_is_violation_and_where_scopes(spark):
    verdicts, violations = check(_docs(spark), RULES)
    v = {(r["partition_id"], r["constraint"]): r for r in verdicts.collect()}
    # every (partition x rule) pair has a verdict row, all-pass included
    assert len(v) == 4
    assert not v[(0, "expression:nonneg")]["passed"]
    assert v[(0, "expression:nonneg")]["violation_count"] == 1
    # d2: NULL predicate result counts as a violation — an unevaluable
    # safety check must not silently pass the row
    assert not v[(1, "expression:nonneg")]["passed"]
    assert v[(1, "expression:nonneg")]["violation_count"] == 1
    # en_small: d2 is the only in-scope partition-1 row and n<100 is NULL
    # there -> violation; d3 (NULL lang) and d4 (fr) are out of scope
    assert v[(1, "expression:en_small")]["metrics"]["n_checked"] == 1.0
    assert v[(1, "expression:en_small")]["violation_count"] == 1
    assert v[(0, "expression:en_small")]["passed"]
    assert v[(0, "expression:en_small")]["metrics"]["n_checked"] == 2.0

    viol = {(r["doc_id"], r["constraint"]): r["detail"] for r in violations.collect()}
    assert set(viol) == {
        ("d1", "expression:nonneg"),
        ("d2", "expression:nonneg"),
        ("d2", "expression:en_small"),
    }
    assert viol[("d2", "expression:en_small")] == "rule failed: n < 100 [where lang = 'en']"


def test_bad_rules_fail_fast(spark):
    with pytest.raises(ValueError, match="duplicate expression rule"):
        check(_docs(spark), (ExpressionRule("a", "n > 0"), ExpressionRule("a", "n < 9")))
    with pytest.raises(ValueError, match="requires an expr"):
        check(_docs(spark), (ExpressionRule("a", ""),))
    with pytest.raises(ValueError, match="invalid expression rule name"):
        check(_docs(spark), (ExpressionRule("bad name!", "n > 0"),))
    with pytest.raises(ValueError, match="at least one rule"):
        check(_docs(spark), ())


CFG = DataGenConfig(n_docs=400, n_partitions=4, n_media=100)


def test_declarative_expression_entries_and_severity(spark):
    docs = generate_documents(spark, clean_config(CFG)).cache()
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))

    spec = {
        "constraints": [
            {"type": "uniqueness"},
            # repeatable: two expression entries coexist
            {"type": "expression", "name": "has_id", "expr": "doc_id is not null"},
            {"type": "expression", "name": "never_holds", "expr": "size(spans) < 0",
             "severity": "warn"},
        ]
    }
    res = run_declarative(spec, docs, media, baseline)
    v = {r["constraint"]: r for r in res.verdicts.collect() if r["constraint"].startswith("expression")}
    assert v["expression:has_id"]["passed"]
    assert not v["expression:never_holds"]["passed"]
    # warn-level rule reports but does not gate the partition rollup
    assert all(r["passed"] for r in res.partition_rollup.collect())
    sev = {r["constraint"]: r["severity"] for r in res.global_verdicts.collect()}
    assert sev["expression:never_holds"] == "warn"
    assert sev["expression:has_id"] == "error"

    with pytest.raises(ValueError, match="duplicate expression rule"):
        compile_spec(
            {"constraints": [
                {"type": "expression", "name": "x", "expr": "1=1"},
                {"type": "expression", "name": "x", "expr": "2=2"},
            ]}
        )


def test_rules_ride_the_default_suite(spark):
    docs = generate_documents(spark, clean_config(CFG)).cache()
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))
    cfg = SuiteConfig(
        expressions=(ExpressionRule("id_prefixed", "doc_id like 'doc-%'"),),
        persist_exploded=False,
    )
    res = run_suite(docs, media, baseline, cfg)
    names = {r["constraint"] for r in res.verdicts.collect()}
    assert "expression:id_prefixed" in names and "uniqueness" in names
