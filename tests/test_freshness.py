"""freshness constraint: event-time recency semantics (stale partitions,
future rows, all-NULL timestamps) and the opt-in suite/declarative wiring
(not in the default run; a spec naming it without ts_expr/as_of fails
loudly). Staleness is always measured against an explicit as_of — never
wall-clock — so every assertion here is deterministic."""

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
from anomalydetection_spark.operators.freshness import (
    FreshnessThresholds,
    check,
    staleness,
)
from anomalydetection_spark.plans.declarative import run_declarative
from anomalydetection_spark.plans.suite import ALL_CONSTRAINTS, run_suite

AS_OF = "2024-01-31 00:00:00"


def _docs(spark):
    # partition 0: fresh (newest 10 min before as_of)
    # partition 1: stale (newest 2 h before as_of)
    # partition 2: fresh but one row 30 s in the FUTURE (clock skew)
    # partition 3: all timestamps NULL (unknown freshness)
    rows = [
        ("d0", 0, "2024-01-30 23:50:00"),
        ("d1", 0, "2024-01-30 12:00:00"),
        ("d2", 1, "2024-01-30 22:00:00"),
        ("d3", 1, "2024-01-30 21:00:00"),
        ("d4", 2, "2024-01-30 23:59:00"),
        ("d5", 2, "2024-01-31 00:00:30"),
        ("d6", 3, None),
    ]
    return spark.createDataFrame(
        rows, "doc_id string, partition_id int, ts string"
    )


TH = FreshnessThresholds(ts_expr="ts", as_of=AS_OF, max_lag_seconds=3600)


def test_verdicts_cover_stale_future_and_null(spark):
    verdicts, violations = check(_docs(spark), TH)
    v = {r["partition_id"]: r for r in verdicts.collect()}
    assert v[0]["passed"] and v[0]["violation_count"] == 0
    assert v[0]["metrics"]["staleness_s"] == 600.0
    # stale: newest 2h old > 1h budget → one partition-level violation
    assert not v[1]["passed"] and v[1]["violation_count"] == 1
    assert v[1]["metrics"]["staleness_s"] == 7200.0
    # future row: partition fails, violation is row-level
    assert not v[2]["passed"] and v[2]["violation_count"] == 1
    assert v[2]["metrics"]["n_future"] == 1.0
    # unknown freshness is NOT fresh
    assert not v[3]["passed"] and v[3]["violation_count"] == 1
    assert v[3]["metrics"]["staleness_s"] is None

    viol = violations.collect()
    by_part = {(r["partition_id"], r["doc_id"]): r["detail"] for r in viol}
    assert len(viol) == 3
    # stale + all-NULL violations are partition-level (doc_id NULL) — the
    # fix is operational, not row edits; future rows name the row
    assert "stale: newest row 7200 s before as_of" in by_part[(1, None)]
    assert by_part[(3, None)] == "no usable timestamps in partition"
    assert "beyond as_of+0 s" in by_part[(2, "d5")]


def test_max_future_tolerance_absorbs_skew(spark):
    th = FreshnessThresholds(
        ts_expr="ts", as_of=AS_OF, max_lag_seconds=3600, max_future_seconds=60
    )
    verdicts, violations = check(_docs(spark), th)
    v = {r["partition_id"]: r for r in verdicts.collect()}
    # the 30s-ahead row now sits inside the tolerance window
    assert v[2]["passed"] and v[2]["violation_count"] == 0
    assert violations.filter(F.col("partition_id") == 2).count() == 0


def test_staleness_facts_negative_when_ahead(spark):
    # the reusable core: staleness_s is negative when the newest row is
    # ahead of as_of (floor of the exact microsecond delta)
    facts = {
        r["partition_id"]: r
        for r in staleness(_docs(spark), "ts", AS_OF).collect()
    }
    assert facts[2]["staleness_s"] == -30  # newest row 30 s ahead of as_of
    assert facts[3]["max_ts_us"] is None and facts[3]["staleness_s"] is None
    assert facts[3]["n_null_ts"] == 1 and facts[3]["n_rows"] == 1


def test_requires_config(spark):
    with pytest.raises(ValueError, match="ts_expr"):
        check(_docs(spark), FreshnessThresholds(as_of=AS_OF))
    with pytest.raises(ValueError, match="as_of"):
        check(_docs(spark), FreshnessThresholds(ts_expr="ts"))


CFG = DataGenConfig(n_docs=400, n_partitions=4, n_media=100)


def test_optional_in_suite_and_declarative(spark):
    docs = generate_documents(spark, clean_config(CFG)).cache()
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))

    # not in the default run
    res = run_suite(docs, media, baseline)
    assert "freshness" not in {r["constraint"] for r in res.verdicts.collect()}
    assert "freshness" not in ALL_CONSTRAINTS

    # the documents schema carries no timestamp column — ts_expr is any SQL
    # expression over the row; a constant instant proves the wiring with a
    # verdict every engine can re-derive
    spec_ok = {
        "constraints": [
            {
                "type": "freshness",
                "ts_expr": "timestamp '2024-01-30 23:50:00'",
                "as_of": AS_OF,
                "max_lag_seconds": 3600,
            }
        ]
    }
    res_ok = run_declarative(spec_ok, docs, media, baseline)
    rows = [r for r in res_ok.verdicts.collect() if r["constraint"] == "freshness"]
    assert rows and all(r["passed"] for r in rows)

    spec_stale = {
        "constraints": [
            {
                "type": "freshness",
                "ts_expr": "timestamp '2024-01-29 00:00:00'",
                "as_of": AS_OF,
                "max_lag_seconds": 3600,
            }
        ]
    }
    res_bad = run_declarative(spec_stale, docs, media, baseline)
    bad = [r for r in res_bad.verdicts.collect() if r["constraint"] == "freshness"]
    assert bad and all(not r["passed"] for r in bad)


def test_declarative_freshness_without_config_fails(spark):
    docs = generate_documents(spark, clean_config(CFG))
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))
    with pytest.raises(ValueError, match="ts_expr"):
        run_declarative(
            {"constraints": [{"type": "freshness", "as_of": AS_OF}]},
            docs,
            media,
            baseline,
        )
