"""Docstore CDC streaming source: snapshot versions as the offset log,
file-granular change feed per micro-batch, and the CDC-driven incremental
validation consumer (the streaming twin of run_docstore_incremental)."""

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
from anomalydetection_spark.plans.suite import run_suite
from anomalydetection_spark.sources import docstore
from anomalydetection_spark.sources.io import write_table
from anomalydetection_spark.streaming.validate_stream import (
    start_cdc_validation_stream,
)

DOCS_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, partition_id int"
)


def _extra(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


def _read_feed(spark, table, out, ck, starting_version=0):
    """Run the CDC stream to exhaustion (availableNow) and return the sink."""
    docstore.register(spark)
    q = (
        spark.readStream.format("docstore")
        .option("path", table)
        .option("cdc", "true")
        .option("startingVersion", str(starting_version))
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out)


def test_cdc_feed_types_and_net_state(spark, tmp_path):
    table = str(tmp_path / "t")
    rows = [(f"d{i}", [("text", f"body {i}", None, 0)], i % 3) for i in range(30)]
    docstore.register(spark)
    _extra(spark, rows).repartitionByRange(3, "partition_id").write.format(
        "docstore"
    ).option("path", table).mode("overwrite").save()
    _extra(spark, [("d100", [("text", "new", None, 0)], 1)]).write.format(
        "docstore"
    ).option("path", table).mode("append").save()
    docstore.delete_where(spark, table, "doc_id = 'd7'")  # COW rewrite
    docstore.delete_where_mor(spark, table, "doc_id = 'd11'")  # MOR delete file

    feed = _read_feed(spark, table, str(tmp_path / "out"), str(tmp_path / "ck"))
    assert set(feed.select("_change_type").distinct().toPandas()["_change_type"]) == {
        "insert",
        "delete",
    }
    # v1: 30 inserts; v2: 1 insert; v3 (COW): rewritten file's rows emit
    # delete+insert pairs except d7 (delete only); v4 (MOR): d11 delete
    by_v = {
        (r["_commit_version"], r["_change_type"]): r["count"]
        for r in feed.groupBy("_commit_version", "_change_type").count().collect()
    }
    assert by_v[(1, "insert")] == 30
    assert by_v[(2, "insert")] == 1
    assert by_v[(3, "delete")] == by_v[(3, "insert")] + 1  # d7 uncancelled
    assert by_v[(4, "delete")] == 1

    # NET state from the raw feed == the table's current visible rows
    net = (
        feed.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("_change_type") == "insert", 1).otherwise(-1)).alias(
                "n"
            )
        )
        .filter("n != 0")
    )
    live = {r["doc_id"] for r in net.collect()}
    table_now = {
        r["doc_id"]
        for r in spark.read.format("docstore")
        .option("path", table)
        .load()
        .select("doc_id")
        .collect()
    }
    assert live == table_now
    assert "d7" not in live and "d11" not in live and "d100" in live


def test_cdc_stream_from_now_skips_history(spark, tmp_path):
    table = str(tmp_path / "t")
    docstore.register(spark)
    _extra(spark, [("a", [("text", "x", None, 0)], 0)]).write.format(
        "docstore"
    ).option("path", table).mode("overwrite").save()
    v_now = docstore.current_version(table)
    _extra(spark, [("b", [("text", "y", None, 0)], 0)]).write.format(
        "docstore"
    ).option("path", table).mode("append").save()
    feed = _read_feed(
        spark, table, str(tmp_path / "out"), str(tmp_path / "ck"),
        starting_version=v_now,
    )
    assert [r["doc_id"] for r in feed.select("doc_id").collect()] == ["b"]

    # restart on the SAME checkpoint with no new commits: nothing new
    q = (
        spark.readStream.format("docstore")
        .option("path", table)
        .option("cdc", "true")
        .option("startingVersion", str(v_now))
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1


CFG = DataGenConfig(n_docs=1200, n_partitions=6, n_media=200, drift_partitions=(5,))


@pytest.fixture(scope="module")
def inputs(spark):
    docs = generate_documents(spark, CFG).cache()
    media = generate_media_assets(spark, CFG).cache()
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(CFG)))
    ).cache()
    return docs, media, baseline


def _verdict_key(df):
    return sorted(
        (r["partition_id"], r["constraint"], r["passed"], r["violation_count"], r["row_count"])
        for r in df.collect()
    )


def test_cdc_validation_stream_revalidates_changed(spark, tmp_path, inputs):
    from anomalydetection_spark.plans.manifest import ResumableValidator

    docs, media, baseline = inputs
    table = str(tmp_path / "t")
    docstore.register(spark)
    write_table(
        docs.repartitionByRange(CFG.n_partitions, "partition_id"), table, fmt="docstore"
    )
    state, out, ck = (str(tmp_path / d) for d in ("state", "out", "ck"))

    # pass 1: full-history CDC → validates every partition
    q = start_cdc_validation_stream(
        spark, table, media, baseline, state, out, ck, starting_version=0
    )
    q.awaitTermination(600)
    v = ResumableValidator(spark, state, out)
    assert v.manifest.done_partitions() == set(range(CFG.n_partitions))
    before = {
        r["partition_id"]: r["run_id"] for r in v.manifest.read().collect()
    }

    # commit a cross-partition dup (rips partition 0) + a dangling ref in 2
    dup_id = docs.filter("partition_id = 0").select("doc_id").first()["doc_id"]
    _extra(
        spark,
        [
            (dup_id, [("text", "dup body", None, 0)], 2),
            ("zz-cdc-1", [("image", None, "media-none-xyz", 0)], 2),
        ],
    ).write.format("docstore").option("path", table).mode("append").save()

    # pass 2: same checkpoint — only the new commit streams
    q = start_cdc_validation_stream(
        spark, table, media, baseline, state, out, ck, starting_version=0
    )
    q.awaitTermination(600)
    after = {r["partition_id"]: r["run_id"] for r in v.manifest.read().collect()}
    revalidated = {p for p in after if after[p] != before[p]}
    assert revalidated == {0, 2}  # changed partition + uniqueness ripple

    dup_parts = sorted(
        r["partition_id"]
        for r in v.violations()
        .filter((F.col("constraint") == "uniqueness") & (F.col("doc_id") == dup_id))
        .collect()
    )
    assert dup_parts == [0, 2]

    truth = run_suite(
        spark.read.format("docstore").option("path", table).load(), media, baseline
    )
    assert _verdict_key(v.verdicts()) == _verdict_key(truth.verdicts)


def test_cdc_max_versions_per_batch_bounds_each_microbatch(spark, tmp_path):
    """Admission control: with maxVersionsPerBatch=2 a 6-commit backlog
    replays as micro-batches spanning at most 2 contiguous snapshot
    versions each (processingTime trigger — availableNow latches one end
    offset), a restart resumes from the checkpoint with no duplicates,
    and the concatenated feed covers every version exactly once."""
    import time

    table = str(tmp_path / "tbl")
    docstore.register(spark)
    for i in range(6):
        _extra(spark, [(f"d{i}", [("text", f"t{i}", None, 0)], 0)]).write.format(
            "docstore"
        ).option("path", table).mode("append").save()
    assert docstore.current_version(table) == 6

    batches: list[list[int]] = []

    def sink(df, bid):
        vs = sorted({r["_commit_version"] for r in df.select("_commit_version").collect()})
        if vs:
            batches.append(vs)

    def run(stop_after_total):
        q = (
            spark.readStream.format("docstore")
            .option("path", table)
            .option("cdc", "true")
            .option("startingVersion", "0")
            .option("maxVersionsPerBatch", "2")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if sum(len(v) for v in batches) >= stop_after_total:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)

    run(4)   # first session drains versions 1..4 in clamped batches
    run(6)   # restart from the checkpoint finishes 5..6
    assert len(batches) >= 3
    for vs in batches:
        assert len(vs) <= 2
        assert vs[-1] - vs[0] <= 1  # contiguous clamp
    seen = sorted(v for vs in batches for v in vs)
    assert seen == [1, 2, 3, 4, 5, 6]  # nothing skipped, nothing repeated
