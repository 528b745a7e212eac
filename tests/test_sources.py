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
