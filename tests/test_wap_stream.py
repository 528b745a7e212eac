"""Streaming WAP admission gate + table-maintenance additions.

Covers the foreachBatch WAP sink (good batches publish, bad batches are
quarantined on their audit branch while the stream continues), its
exactly-once replay guard (the atomic publish-marker tag), and
remove_orphan_files' safety window.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.datagen import (
    DataGenConfig,
    clean_config,
    generate_documents,
    generate_media_assets,
)
from anomalydetection_spark.operators import drift, reassembly
from anomalydetection_spark.sources import docstore as ds
from anomalydetection_spark.sources.io import write_table

CFG = DataGenConfig(n_docs=300, n_partitions=3, n_media=200)
CLEAN = clean_config(CFG)


@pytest.fixture()
def ctx(spark, tmp_path):
    path = str(tmp_path / "t")
    docs = generate_documents(spark, CLEAN)
    write_table(docs, path, fmt="docstore")
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, CLEAN))
    )
    return path, docs, media, baseline


def _count_main(spark, path):
    return (
        spark.read.format("docstore").option("path", path).load().count()
    )


def test_wap_foreach_batch_gate_and_replay(spark, ctx):
    """Direct foreachBatch-callable drive: a good batch publishes and
    tags its marker atomically; replaying the SAME batch_id is a no-op
    (no double ingest); a bad batch is blocked, its branch survives, and
    replaying it re-audits to the same verdict without corrupting main."""
    from anomalydetection_spark.streaming.wap_sink import wap_foreach_batch

    path, docs, media, baseline = ctx
    results: dict[int, dict] = {}
    fn = wap_foreach_batch(
        path, media, baseline, on_result=lambda bid, r: results.__setitem__(bid, r)
    )
    n0 = _count_main(spark, path)

    good = (
        docs.filter(F.col("partition_id") == 1).limit(15)
        .withColumn("doc_id", F.concat(F.lit("g-"), F.col("doc_id")))
    )
    fn(good, 0)
    assert results[0]["published"] is True
    assert _count_main(spark, path) == n0 + 15
    refs = ds.table_refs(path)
    assert "published-batch-0" in refs and refs["published-batch-0"]["type"] == "tag"
    assert "wap-batch-0" not in refs  # dropped after publish

    # at-least-once replay of the published batch: marker short-circuits
    v_before = ds.current_version(path)
    fn(good, 0)
    assert 0 in results and _count_main(spark, path) == n0 + 15
    assert ds.current_version(path) == v_before  # not even a commit

    bad = docs.filter(F.col("partition_id") == 2).limit(10)  # dup doc_ids
    fn(bad, 1)
    assert results[1]["published"] is False
    assert _count_main(spark, path) == n0 + 15  # never visible
    assert "wap-batch-1" in ds.table_refs(path)  # quarantined for drill-down

    # replay of the blocked batch: branch is dropped and re-staged, same verdict
    fn(bad, 1)
    assert results[1]["published"] is False
    assert _count_main(spark, path) == n0 + 15
    assert "published-batch-1" not in ds.table_refs(path)


def test_wap_ingest_stream_end_to_end(spark, ctx, tmp_path):
    """A real file-source stream (one file per trigger) through
    start_wap_ingest_stream: both batches audited, clean rows published,
    duplicate rows blocked — main's final count proves the gate."""
    from anomalydetection_spark.streaming.wap_sink import start_wap_ingest_stream

    path, docs, media, baseline = ctx
    feed_dir = str(tmp_path / "feed")
    good = (
        docs.filter(F.col("partition_id") == 0).limit(12)
        .withColumn("doc_id", F.concat(F.lit("s-"), F.col("doc_id")))
    )
    bad = docs.filter(F.col("partition_id") == 1).limit(12)
    good.coalesce(1).write.parquet(os.path.join(feed_dir, "f1"))
    bad.coalesce(1).write.parquet(os.path.join(feed_dir, "f2"))

    n0 = _count_main(spark, path)
    source = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir + "/*")
    )
    results: dict[int, dict] = {}
    q = start_wap_ingest_stream(
        spark, source, path, media, baseline,
        checkpoint_dir=str(tmp_path / "ck"),
        on_result=lambda bid, r: results.__setitem__(bid, r),
    )
    deadline = time.time() + 180
    while time.time() < deadline and len(results) < 2:
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)

    assert len(results) == 2, results
    published = sum(1 for r in results.values() if r["published"])
    assert published == 1
    assert _count_main(spark, path) == n0 + 12
    refs = ds.table_refs(path)
    assert sum(1 for n in refs if n.startswith("published-batch-")) == 1
    assert sum(1 for n in refs if n.startswith("wap-batch-")) == 1  # the blocked one


def test_remove_orphan_files(spark, ctx):
    """Orphans (never referenced by any manifest) older than the safety
    window are reclaimed; referenced files and YOUNG orphans survive."""
    path, docs, media, baseline = ctx
    live = {
        f["path"] for f in ds.load_manifest(path)["files"]
    }
    # plant an old orphan and a young orphan
    old_orphan = os.path.join(path, "data-orphan-old.parquet")
    young_orphan = os.path.join(path, "data-orphan-young.parquet")
    for p in (old_orphan, young_orphan):
        with open(p, "wb") as f:
            f.write(b"PAR1junkPAR1")
    os.utime(old_orphan, (time.time() - 10 * 24 * 3600,) * 2)

    out = ds.remove_orphan_files(path)
    assert out["removed_files"] == 1 and out["kept_young"] == 1
    assert not os.path.exists(old_orphan)
    assert os.path.exists(young_orphan)
    for p in live:
        assert os.path.exists(os.path.join(path, p))
    # the table still reads fine
    assert _count_main(spark, path) == docs.count()
