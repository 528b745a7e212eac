"""Structured Streaming validation: micro-batch suite + running stats,
resume from checkpoint."""

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
from anomalydetection_spark.streaming.validate_stream import (
    start_running_stats_stream,
    start_validation_stream,
)

CFG = DataGenConfig(n_docs=600, n_partitions=3, n_media=150)


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    docs = generate_documents(spark, CFG)
    media = generate_media_assets(spark, CFG).cache()
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(CFG)))
    ).cache()
    indir = str(root / "in")
    # two arrival chunks = two micro-batches (maxFilesPerTrigger=1)
    docs.filter(F.col("partition_id") < 2).coalesce(1).write.mode("append").parquet(indir)
    docs.filter(F.col("partition_id") >= 2).coalesce(1).write.mode("append").parquet(indir)
    return root, indir, docs, media, baseline


def test_foreach_batch_validation(spark, stream_env):
    root, indir, docs, media, baseline = stream_env
    q = start_validation_stream(
        spark, indir, media, baseline,
        str(root / "out"), str(root / "ckpt"),
    )
    q.awaitTermination(120)
    verdicts = spark.read.parquet(str(root / "out" / "verdicts"))
    # every (partition, constraint) appears exactly once across batches
    pairs = [(r["partition_id"], r["constraint"]) for r in verdicts.collect()]
    assert len(pairs) == len(set(pairs)) == 3 * 5
    assert verdicts.select("batch_id").distinct().count() == 2

    # restart with same checkpoint: no new batches → no duplicate verdicts
    q2 = start_validation_stream(
        spark, indir, media, baseline,
        str(root / "out"), str(root / "ckpt"),
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(str(root / "out" / "verdicts")).count() == 15


def test_running_stats_stream(spark, stream_env):
    root, indir, docs, media, baseline = stream_env
    q = start_running_stats_stream(spark, indir, queryName="rs_test")
    q.awaitTermination(120)
    got = {r["partition_id"]: r["n_spans"] for r in spark.sql("SELECT * FROM rs_test").collect()}
    want = {
        r["partition_id"]: r["n"]
        for r in docs.select("partition_id", F.explode_outer("spans").alias("s"))
        .groupBy("partition_id")
        .agg(F.count("s").alias("n"))
        .collect()
    }
    assert got == want
