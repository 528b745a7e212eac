"""Media-side referential ripple: when the media catalog is itself a
docstore table, an incremental validation run re-validates only doc
partitions whose stored media_ref Bloom contains a catalog key that
appeared or disappeared between the catalog's validated snapshot and its
current head — deletes orphan matching spans (PASS→FAIL), inserts cure
previously-dangling refs (FAIL→PASS), and everything else stays skipped.

The symmetric sibling of the uniqueness ripple (plans/manifest.py
_uniqueness_ripple): referential is partition-local only for a FIXED
catalog, so catalog motion is the one other cross-partition hazard."""

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
from anomalydetection_spark.plans.manifest import ResumableValidator
from anomalydetection_spark.plans.suite import run_suite
from anomalydetection_spark.sources import docstore
from anomalydetection_spark.sources.io import write_table

# clean knobs: referential (and every other constraint) starts all-green,
# so any FAIL below is attributable to the catalog mutation under test.
# n_media >> referenced refs so single-partition refs exist.
CFG = clean_config(
    DataGenConfig(n_docs=600, n_partitions=6, n_media=4000, drift_partitions=())
)

MEDIA_DDL = "media_ref string, media_kind string, n_bytes long"


@pytest.fixture(scope="module")
def inputs(spark):
    docs = generate_documents(spark, CFG).cache()
    media = generate_media_assets(spark, CFG).cache()
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs)).cache()
    refs_by_part = {
        r["media_ref"]: set(r["pids"])
        for r in reassembly.explode_spans_meta(docs)
        .filter(F.col("media_ref").isNotNull())
        .groupBy("media_ref")
        .agg(F.collect_set("partition_id").alias("pids"))
        .collect()
    }
    return docs, media, baseline, refs_by_part


def _tables(spark, docs, media, tmp_path):
    docs_dir = str(tmp_path / "docs")
    media_dir = str(tmp_path / "media")
    write_table(
        docs.repartitionByRange(CFG.n_partitions, "partition_id"),
        docs_dir,
        fmt="docstore",
    )
    write_table(media, media_dir, fmt="docstore")
    return docs_dir, media_dir


def _validator(spark, tmp_path):
    return ResumableValidator(
        spark, str(tmp_path / "state"), str(tmp_path / "out")
    )


def _verdict_key(df):
    return sorted(
        (r["partition_id"], r["constraint"], r["passed"], r["violation_count"], r["row_count"])
        for r in df.collect()
    )


def _referential(v):
    return {
        r["partition_id"]: r["passed"]
        for r in v.verdicts().filter(F.col("constraint") == "referential").collect()
    }


def _solo_ref(refs_by_part):
    """A media_ref referenced by exactly one partition (deterministic seed)."""
    for ref, pids in sorted(refs_by_part.items()):
        if len(pids) == 1:
            return ref, next(iter(pids))
    raise AssertionError("fixture has no single-partition media_ref")


def test_media_delete_ripples_to_referencing_partition_only(spark, tmp_path, inputs):
    docs, media, baseline, refs_by_part = inputs
    docs_dir, media_dir = _tables(spark, docs, media, tmp_path)
    v = _validator(spark, tmp_path)

    r1 = v.run_docstore_incremental(
        docs_dir, None, baseline, media_table_dir=media_dir
    )
    assert sorted(r1["validated_partitions"]) == list(range(CFG.n_partitions))
    assert all(_referential(v).values())

    ref, pid = _solo_ref(refs_by_part)
    docstore.delete_where(spark, media_dir, f"media_ref = '{ref}'")

    r2 = v.run_docstore_incremental(
        docs_dir, None, baseline, media_table_dir=media_dir
    )
    # docs table did not move; only the catalog delta drives invalidation
    assert r2["invalidated_partitions"] == []
    assert r2["media_invalidated_partitions"] == [pid]
    assert r2["validated_partitions"] == [pid]
    verdicts = _referential(v)
    assert verdicts[pid] is False
    assert all(ok for p, ok in verdicts.items() if p != pid)
    viol = v.violations().filter(F.col("constraint") == "referential").collect()
    assert viol and all(ref in r["detail"] for r in viol)
    assert {r["partition_id"] for r in viol} == {pid}

    # byte-parity with a from-scratch suite over the final state
    media_now = spark.read.format("docstore").option("path", media_dir).load()
    fresh = run_suite(docs, media_now, baseline)
    assert _verdict_key(v.verdicts()) == _verdict_key(fresh.verdicts)

    # re-inserting the key cures the orphan: same partition re-validates,
    # verdict flips back, violations clear
    write_table(
        spark.createDataFrame([(ref, "image", 2048)], MEDIA_DDL),
        media_dir,
        mode="append",
        fmt="docstore",
    )
    r3 = v.run_docstore_incremental(
        docs_dir, None, baseline, media_table_dir=media_dir
    )
    assert r3["media_invalidated_partitions"] == [pid]
    assert all(_referential(v).values())
    assert v.violations().filter(F.col("constraint") == "referential").isEmpty()
    media_final = spark.read.format("docstore").option("path", media_dir).load()
    fresh2 = run_suite(docs, media_final, baseline)
    assert _verdict_key(v.verdicts()) == _verdict_key(fresh2.verdicts)


def test_unreferenced_media_change_invalidates_nothing(spark, tmp_path, inputs):
    docs, media, baseline, _refs = inputs
    docs_dir, media_dir = _tables(spark, docs, media, tmp_path)
    v = _validator(spark, tmp_path)
    v.run_docstore_incremental(docs_dir, None, baseline, media_table_dir=media_dir)

    # a brand-new key no span mentions: delta is non-empty, but no
    # partition's ref_bloom contains it → zero re-validation
    write_table(
        spark.createDataFrame([("zz-never-referenced", "audio", 1)], MEDIA_DDL),
        media_dir,
        mode="append",
        fmt="docstore",
    )
    r2 = v.run_docstore_incremental(
        docs_dir, None, baseline, media_table_dir=media_dir
    )
    assert r2["media_invalidated_partitions"] == []
    assert r2["validated_partitions"] == []
    assert r2["media_previous_snapshot"] < r2["media_snapshot_version"]

    # an untouched catalog advances nothing and validates nothing
    r3 = v.run_docstore_incremental(
        docs_dir, None, baseline, media_table_dir=media_dir
    )
    assert r3["media_invalidated_partitions"] == []
    assert r3["validated_partitions"] == []


def test_missing_ref_blooms_revalidate_conservatively(spark, tmp_path, inputs):
    docs, media, baseline, refs_by_part = inputs
    docs_dir, media_dir = _tables(spark, docs, media, tmp_path)
    v = _validator(spark, tmp_path)
    # no sketches stored → catalog motion cannot be bounded per partition
    v.run_docstore_incremental(
        docs_dir, None, baseline, media_table_dir=media_dir, with_sketches=False
    )
    ref, _pid = _solo_ref(refs_by_part)
    docstore.delete_where(spark, media_dir, f"media_ref = '{ref}'")
    r2 = v.run_docstore_incremental(
        docs_dir, None, baseline, media_table_dir=media_dir, with_sketches=False
    )
    assert r2["media_invalidated_partitions"] == list(range(CFG.n_partitions))
    assert r2["validated_partitions"] == list(range(CFG.n_partitions))


def test_ref_bloom_blob_contains_own_refs(spark, inputs):
    from anomalydetection_spark.operators import bloom as bloomops
    from anomalydetection_spark.plans.manifest import group_sketch_blobs

    docs, _media, _baseline, refs_by_part = inputs
    meta = reassembly.explode_spans_meta(docs).select(
        "doc_id", "partition_id", "text_len", "media_ref"
    )
    blobs = {
        r["partition_id"]: bytes(r["ref_bloom"])
        for r in group_sketch_blobs(meta).collect()
    }
    assert set(blobs) == set(range(CFG.n_partitions))
    # no false negatives: every partition's blob contains every ref its
    # spans mention (checked via the JVM probe, the build's hash family)
    refs = (
        reassembly.explode_spans_meta(docs)
        .filter(F.col("media_ref").isNotNull())
        .select("partition_id", "media_ref")
        .distinct()
    )
    for pid, blob in blobs.items():
        missing = (
            refs.filter(F.col("partition_id") == pid)
            .filter(~bloomops.might_contain(F.col("media_ref"), blob))
            .count()
        )
        assert missing == 0
    # discrimination: a ref exclusive to one partition is absent from at
    # least one other blob (xxhash64 is deterministic, so this is stable)
    ref, pid = _solo_ref(refs_by_part)
    one = spark.createDataFrame([(ref,)], "media_ref string")
    others = [
        p for p, blob in blobs.items()
        if p != pid
        and one.filter(bloomops.might_contain(F.col("media_ref"), blob)).count() == 0
    ]
    assert others, "solo ref matched every other partition's bloom"
