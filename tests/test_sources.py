"""Source connectors: labeled-log scan, CSV with schema, iceberg gating."""

from __future__ import annotations

import pytest

from anomalydetection_spark.sources import io


def test_read_labeled_logs(spark, tmp_path):
    p = tmp_path / "logs.txt"
    p.write_text(
        "- 1178385746 normal line content here\n"
        "ALERT 1178385747 bad thing happened\n"
        "\n"
        "- tail\n"
    )
    df = io.read_labeled_logs(spark, str(p))
    rows = {r["log"]: r["label"] for r in df.collect()}
    assert rows["1178385746 normal line content here"] == 0
    assert rows["1178385747 bad thing happened"] == 1
    assert rows["tail"] == 0
    assert df.count() == 3  # blank line skipped


def test_read_labeled_logs_limit_pushdown(spark, tmp_path):
    p = tmp_path / "logs2.txt"
    p.write_text("\n".join(f"- line {i}" for i in range(100)))
    df = io.read_labeled_logs(spark, str(p), limit=10)
    assert df.count() <= 10


def test_read_csv_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("template,n\nfoo,3\nbar,5\n")
    df = io.read_csv(spark, str(p), "template string, n int")
    assert df.schema.simpleString() == "struct<template:string,n:int>"
    assert {r["template"]: r["n"] for r in df.collect()} == {"foo": 3, "bar": 5}


def test_iceberg_gated(spark):
    assert io.iceberg_available(spark) is False  # no jars in this image
    with pytest.raises(RuntimeError, match="iceberg"):
        io.read_table(spark, "catalog.db.tbl", fmt="iceberg")


def test_read_table_parquet_fallback(spark, tmp_path):
    spark.range(5).write.parquet(str(tmp_path / "t"))
    assert io.read_table(spark, str(tmp_path / "t")).count() == 5


def test_full_suite_through_table_io_contract(spark, tmp_path):
    """Iceberg-swap contract: the entire validation suite run through
    write_table → read_table (the format-gated path) must produce verdicts
    identical to running on the in-memory frames. The iceberg branch
    itself can't execute here (no runtime jars — documented in README);
    this pins that the swap surface is the only difference."""
    from anomalydetection_spark.datagen import (
        DataGenConfig, clean_config, generate_documents, generate_media_assets,
    )
    from anomalydetection_spark.operators import drift, reassembly
    from anomalydetection_spark.plans.suite import run_suite
    from anomalydetection_spark.sources.io import read_table, write_table

    cfg = DataGenConfig(n_docs=600, n_partitions=3, n_media=150)
    docs = generate_documents(spark, cfg)
    media = generate_media_assets(spark, cfg)
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(cfg)))
    )

    write_table(docs, str(tmp_path / "docs"), partition_by=["partition_id"])
    write_table(media, str(tmp_path / "media"))
    write_table(baseline, str(tmp_path / "baseline"))
    docs2 = read_table(spark, str(tmp_path / "docs"), fmt="auto")
    media2 = read_table(spark, str(tmp_path / "media"))
    baseline2 = read_table(spark, str(tmp_path / "baseline"))

    def key(df):
        return sorted(
            (r["partition_id"], r["constraint"], r["passed"], r["violation_count"],
             r["row_count"])
            for r in df.collect()
        )

    direct = run_suite(docs, media, baseline)
    roundtrip = run_suite(docs2, media2, baseline2)
    assert key(direct.verdicts) == key(roundtrip.verdicts)
    assert direct.violations.count() == roundtrip.violations.count()

    # both sides of the format gate: explicit iceberg fmt must fail loudly
    # here (no silent parquet fallback masking a misconfigured cluster)
    import pytest as _pytest
    from anomalydetection_spark.sources.io import iceberg_available

    assert not iceberg_available(spark)
    with _pytest.raises(RuntimeError, match="iceberg runtime jars"):
        read_table(spark, "catalog.db.docs", fmt="iceberg")


def test_compact_output_reduces_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: a fragmented write (many tiny files) is
    rewritten to the size-targeted file count with identical content."""
    from anomalydetection_spark.sources.io import compact_output

    out = str(tmp_path / "frag")
    spark.range(10_000).selectExpr("id", "id % 7 AS grp").repartition(50).write.parquet(out)
    import pathlib

    assert len(list(pathlib.Path(out).rglob("*.parquet"))) >= 50
    stats = compact_output(spark, out, target_file_mb=256)
    assert stats["files_before"] >= 50
    assert stats["files_after"] <= 4  # tiny dataset → one target-size file (+luck)
    df = spark.read.parquet(out)
    assert df.count() == 10_000
    assert df.selectExpr("sum(id) AS s").first()["s"] == 10_000 * 9_999 // 2


def test_orc_roundtrip_preserves_spans(spark, tmp_path):
    """fmt='orc': the nested span struct round-trips byte-identically
    through the ORC sink/source pair (S5 format coverage)."""
    from anomalydetection_spark.datagen import DataGenConfig, generate_documents
    from anomalydetection_spark.sources.io import read_table, write_table

    docs = generate_documents(spark, DataGenConfig(n_docs=300, n_partitions=3))
    out = str(tmp_path / "docs_orc")
    write_table(docs, out, partition_by=["partition_id"], fmt="orc")
    back = read_table(spark, out, fmt="orc")
    assert back.count() == docs.count()
    key = lambda df: sorted(
        (r["doc_id"], [tuple(s) for s in (r["spans"] or [])]) for r in df.collect()
    )
    assert key(back) == key(docs)
