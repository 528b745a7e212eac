"""Datagen determinism + injected-violation coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.datagen import (
    DataGenConfig,
    clean_config,
    generate_documents,
    generate_media_assets,
)
from anomalydetection_spark.schema import DOCUMENTS_SCHEMA


CFG = DataGenConfig(n_docs=2000, n_partitions=4, drift_partitions=(3,))


def test_schema_matches_input_hint(spark):
    docs = generate_documents(spark, CFG)
    # names + types must match input_hint exactly (nullability is advisory)
    assert docs.schema.simpleString() == DOCUMENTS_SCHEMA.simpleString()


def test_deterministic_across_partitionings(spark):
    a = generate_documents(spark, CFG).orderBy("doc_id", "partition_id")
    cfg_b = DataGenConfig(**{**CFG.__dict__, "data_partitions": 13})
    b = generate_documents(spark, cfg_b).orderBy("doc_id", "partition_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_violation_classes_present(spark):
    docs = generate_documents(spark, CFG).cache()
    media = generate_media_assets(spark, CFG)
    # duplicates (incl. hot keys)
    dups = docs.groupBy("doc_id").count().filter("count > 1")
    assert dups.count() > 0
    assert docs.filter(F.col("doc_id").startswith("hot-")).count() > 2
    # empty spans
    assert docs.filter(F.size("spans") == 0).count() > 0
    # null text on text spans
    spans = docs.select("doc_id", F.explode("spans").alias("s"))
    assert spans.filter((F.col("s.kind") == "text") & F.col("s.text").isNull()).count() > 0
    # dangling media refs
    refs = spans.filter(F.col("s.media_ref").isNotNull()).select(F.col("s.media_ref").alias("media_ref"))
    assert refs.join(media, "media_ref", "left_anti").count() > 0
    # reversed offsets still a permutation of 0..n-1
    perm = docs.filter(F.size("spans") > 1).select(
        F.size("spans").alias("n"),
        F.array_sort(F.transform("spans", lambda s: s["offset"])).alias("sorted_offsets"),
    )
    bad = perm.filter(
        F.col("sorted_offsets") != F.sequence(F.lit(0), F.col("n") - 1)
    )
    assert bad.count() == 0
    # some docs have non-ascending raw offsets (the reversed ones)
    nonasc = docs.filter(F.size("spans") > 1).filter(
        F.transform("spans", lambda s: s["offset"])
        != F.array_sort(F.transform("spans", lambda s: s["offset"]))
    )
    assert nonasc.count() > 0


def test_clean_config_has_no_violations(spark):
    ccfg = clean_config(CFG)
    docs = generate_documents(spark, ccfg).cache()
    media = generate_media_assets(spark, ccfg)
    assert docs.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert docs.filter(F.size("spans") == 0).count() == 0
    spans = docs.select(F.explode("spans").alias("s"))
    assert spans.filter((F.col("s.kind") == "text") & F.col("s.text").isNull()).count() == 0
    refs = spans.filter(F.col("s.media_ref").isNotNull()).select(F.col("s.media_ref").alias("media_ref"))
    assert refs.join(media, "media_ref", "left_anti").count() == 0
