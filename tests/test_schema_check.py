"""schema constraint: structural diff semantics (modes, widenings,
nesting), conform()'s reshape contract, and suite integration — a batch
with a drifted schema fails `schema` while the data constraints still
evaluate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anomalydetection_spark.datagen import (
    DataGenConfig,
    clean_config,
    generate_documents,
    generate_media_assets,
)
from anomalydetection_spark.operators import drift, reassembly
from anomalydetection_spark.operators.schema_check import (
    SchemaThresholds,
    check,
    conform,
    diff_schemas,
    relax_nullability,
)
from anomalydetection_spark.plans.suite import run_suite
from anomalydetection_spark.schema import DOCUMENTS_SCHEMA


def _st(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


def test_diff_modes_missing_and_extra(spark):
    expected = _st("a string, b int")
    actual = _st("a string, c double")
    compat = diff_schemas(actual, expected, "compatible")
    strict = diff_schemas(actual, expected, "strict")
    # b nullable-missing: fine in compatible, flagged in strict;
    # c unexpected: flagged in both
    assert compat == ["unexpected column c"]
    assert "missing column b" in strict and "unexpected column c" in strict


def test_diff_missing_nonnull_flags_in_compatible(spark):
    expected = T.StructType([T.StructField("a", T.StringType(), False)])
    assert diff_schemas(_st("z int"), expected, "compatible") == [
        "missing column a",
        "unexpected column z",
    ]


def test_diff_widenings_and_lossy(spark):
    expected = _st("a bigint, b double")
    assert diff_schemas(_st("a int, b float"), expected, "compatible") == []
    assert diff_schemas(_st("a int, b float"), expected, "strict") != []
    # narrowing is never ok
    lossy = diff_schemas(_st("a string, b double"), expected, "compatible")
    assert lossy == ["type mismatch at a: expected bigint, got string"]


def test_diff_nullability_regression(spark):
    expected = T.StructType([T.StructField("a", T.StringType(), False)])
    actual = T.StructType([T.StructField("a", T.StringType(), True)])
    assert diff_schemas(actual, expected, "compatible") == [
        "nullability regression at a: contract requires non-null"
    ]
    # stricter-than-contract is fine in compatible mode
    relaxed_expected = T.StructType([T.StructField("a", T.StringType(), True)])
    strict_actual = T.StructType([T.StructField("a", T.StringType(), False)])
    assert diff_schemas(strict_actual, relaxed_expected, "compatible") == []


def test_diff_recurses_into_spans_struct(spark):
    good = relax_nullability(DOCUMENTS_SCHEMA)
    bad = _st(
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:int,offset:int>>, "
        "partition_id int"
    )
    issues = diff_schemas(bad, good, "compatible")
    assert issues == ["type mismatch at spans[].media_ref: expected string, got int"]


def test_conform_reorders_fills_and_widens(spark):
    expected = _st("a bigint, b string, c double")
    df = spark.createDataFrame([(1.5, 10, "extra")], "c double, a int, junk string")
    out = conform(df, expected)
    assert out.columns == ["a", "b", "c"]
    assert dict(out.dtypes) == {"a": "bigint", "b": "string", "c": "double"}
    row = out.collect()[0]
    assert row["a"] == 10 and row["b"] is None and row["c"] == 1.5


def test_conform_fails_loudly_on_lossy(spark):
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError, match="type mismatch at a"):
        conform(df, _st("a bigint"))


def test_check_verdicts_use_metadata_partitions(spark):
    docs = spark.createDataFrame(
        [("d1", None, 0)], "doc_id string, spans string, partition_id int"
    )  # spans has the wrong type on purpose
    expected_parts = spark.createDataFrame([(0,), (1,), (2,)], "partition_id int")
    verdicts, violations = check(
        docs, relax_nullability(DOCUMENTS_SCHEMA), SchemaThresholds(), expected_parts
    )
    v = verdicts.collect()
    assert {r["partition_id"] for r in v} == {0, 1, 2}
    assert all(not r["passed"] and r["violation_count"] == 1 for r in v)
    assert all(r["row_count"] == 0 for r in v)  # structural: no rows scanned
    details = {r["detail"] for r in violations.collect()}
    assert details == {
        "type mismatch at spans: expected array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, got string"
    }
    assert violations.count() == 3  # one per expected partition


CFG = DataGenConfig(n_docs=600, n_partitions=3, n_media=100)


def test_suite_schema_constraint_end_to_end(spark):
    docs = generate_documents(spark, clean_config(CFG)).cache()
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))

    res = run_suite(docs, media, baseline)
    ok = {r["constraint"]: r["passed"] for r in res.verdicts.collect()}
    assert ok["schema"] is True

    # a drifted batch: an extra column the contract doesn't know
    drifted = docs.withColumn("ingest_host", F.lit("h1"))
    res2 = run_suite(drifted, media, baseline)
    by = {}
    for r in res2.verdicts.collect():
        by.setdefault(r["constraint"], []).append(r["passed"])
    assert not any(by["schema"])            # schema fails everywhere
    assert all(by["span_order"])            # data constraints still evaluate
    assert all(by["uniqueness"])
    viol = res2.violations.filter(F.col("constraint") == "schema").collect()
    assert {r["detail"] for r in viol} == {"unexpected column ingest_host"}
