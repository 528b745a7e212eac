"""Constraint suggestion: generic profiler rule semantics on crafted
frames, and the profile→suggest→validate closure — a spec suggested from
a clean batch must pass that batch, and must fail a dirty batch on
exactly the injected violation classes."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.datagen import (
    DataGenConfig,
    clean_config,
    generate_documents,
    generate_media_assets,
)
from anomalydetection_spark.operators import drift, reassembly
from anomalydetection_spark.plans.declarative import compile_spec, run_declarative
from anomalydetection_spark.plans.suggest import profile_suggest, suggest_spec


def _rules(df):
    return {(r["column"], r["rule"]): r["param"] for r in df.collect()}


def test_profiler_rules_on_crafted_frame(spark):
    df = spark.createDataFrame(
        [
            (1, "a", None, 10),
            (2, "b", "x", 20),
            (3, "a", "y", 30),
            (4, "b", "z", -5),
        ],
        "id long, cat string, maybe string, num int",
    )
    got = _rules(profile_suggest(df, max_domain=3))
    assert ("id", "complete") in got and ("id", "unique") in got
    assert got[("id", "value_range")] == "1..4"
    assert got[("cat", "isin")] == "a|b"
    assert ("cat", "unique") not in got
    # 1 null of 4 rows: ceil(1e6/4)=250000, x2 headroom = 500000
    assert got[("maybe", "max_null_rate_ppm")] == "500000"
    assert ("maybe", "complete") not in got and ("maybe", "unique") not in got
    assert got[("num", "value_range")] == "-5..30"


def test_profiler_null_rate_caps_at_ppm_million(spark):
    df = spark.createDataFrame([(None,), (None,), ("x",)], "v string")
    got = _rules(profile_suggest(df))
    # ceil(2e6/3)*2 > 1e6 -> capped
    assert got[("v", "max_null_rate_ppm")] == "1000000"


def test_profiler_approx_mode_matches_exact_at_low_cardinality(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(100)], "a long, b long")
    exact = _rules(profile_suggest(df, exact_distinct=True))
    approx = _rules(profile_suggest(df, exact_distinct=False))
    # approx mode can never PROVE uniqueness (sketch error), so it drops
    # exactly the unique rules; every other suggestion is identical (the
    # domain pass stays exact regardless of how cardinality was gated)
    assert {k for k in exact if k[1] != "unique"} == set(approx)
    assert ("a", "unique") in exact and ("a", "unique") not in approx


CLEAN = DataGenConfig(
    n_docs=1500, n_partitions=5, n_media=200,
    dup_rate=0.0, hot_rate=0.0, dangling_rate=0.0,
    null_text_rate=0.0, empty_spans_rate=0.0, reversed_offset_rate=0.0,
)
DIRTY = DataGenConfig(
    n_docs=1500, n_partitions=5, n_media=200,
    dup_rate=0.15, dangling_rate=0.15, malformed_ref_rate=0.15,
    null_text_rate=0.15, empty_spans_rate=0.0, reversed_offset_rate=0.0,
)


def test_suggested_spec_closure(spark):
    clean = generate_documents(spark, CLEAN).cache()
    media = generate_media_assets(spark, CLEAN).cache()
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(clean)).cache()

    spec = suggest_spec(clean)
    cfg, selected = compile_spec(spec)  # spec must compile as-is
    assert "pattern" in selected  # single-prefix refs -> inferred pattern
    pattern_entry = next(c for c in spec["constraints"] if c["type"] == "pattern")
    assert pattern_entry["ref_pattern"] == "^m-[0-9]{8,8}$"

    # the batch that produced the spec passes it
    res = run_declarative(spec, clean, media, baseline)
    verdicts = res.verdicts.collect()
    failed = [(r["constraint"], r["partition_id"]) for r in verdicts if not r["passed"]]
    assert failed == []

    # a dirty batch fails it on exactly the injected classes
    dirty = generate_documents(spark, DIRTY).cache()
    res2 = run_declarative(spec, dirty, media, baseline)
    by_constraint = {}
    for r in res2.verdicts.collect():
        by_constraint.setdefault(r["constraint"], []).append(r["passed"])
    assert not all(by_constraint["uniqueness"])      # injected dup_rate
    assert not all(by_constraint["referential"])     # injected dangling_rate
    assert not all(by_constraint["pattern"])         # injected malformed refs
    assert not all(by_constraint["column_stats"])    # injected null_text_rate
    assert all(by_constraint["span_order"])          # nothing injected there


def test_suggest_spec_omits_pattern_on_mixed_prefixes(spark):
    docs = generate_documents(
        spark, DataGenConfig(n_docs=400, n_partitions=2, malformed_ref_rate=0.2)
    )
    spec = suggest_spec(docs)
    types = [c["type"] for c in spec["constraints"]]
    # malformed REF_ prefixes break single-prefix inference: suggesting a
    # pattern this batch violates would fail the batch that defined it
    assert "pattern" not in types
    cfg, selected = compile_spec(spec)
    assert "pattern" not in selected


def test_suggested_volume_bounds_catch_partition_loss(spark):
    clean = generate_documents(spark, CLEAN).cache()
    media = generate_media_assets(spark, CLEAN)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(clean))
    spec = suggest_spec(clean)
    half = clean.filter(
        (F.col("partition_id") != 3) | (F.xxhash64("doc_id") % 100 < 5)
    )
    res = run_declarative(spec, half, media, baseline)
    vol = {
        r["partition_id"]: r["passed"]
        for r in res.verdicts.collect()
        if r["constraint"] == "volume"
    }
    assert vol[3] is False  # collapsed partition breaches suggested min_docs
    assert all(v for p, v in vol.items() if p != 3)


def test_pattern_skeleton_rule(spark):
    """pattern_skeleton fires only when every non-null value collapses to
    ONE skeleton; placeholders are idempotent (literal '9'/'A' values
    cannot fake a different shape); all-null and mixed-shape columns
    never get the rule."""
    from anomalydetection_spark.plans.suggest import profile_suggest

    df = spark.createDataFrame(
        [
            ("m-00123", "x1", None, "free text one"),
            ("m-9", "y42", None, "2 totally !! different"),
            ("m-777", "A9", None, "shapes"),
        ],
        "ref string, code string, empty string, prose string",
    )
    rules = {
        (r["column"], r["rule"]): r["param"] for r in profile_suggest(df).collect()
    }
    assert rules[("ref", "pattern_skeleton")] == "A-9"
    # 'x1', 'y42', and the literal 'A9' all collapse to 'A9'
    assert rules[("code", "pattern_skeleton")] == "A9"
    assert ("empty", "pattern_skeleton") not in rules
    assert ("prose", "pattern_skeleton") not in rules
