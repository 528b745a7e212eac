"""Row-group pruning: the in-file tier below manifest file stats.

A pushed predicate that survives file-level pruning still steers
``read()``: each task consults its parquet footer's per-row-group
statistics and skips groups that provably hold no match — so a kept
file's non-matching bytes never leave disk. The Iceberg/parquet
standard split of responsibilities (manifest stats prune files, footer
stats prune row groups), with the same safety rules as _file_pruned:
stat-less or float columns never prune, and Spark re-applies every
filter post-scan so a kept group is never a correctness dependency.

Scale: at 100 TB a clustered file holds hundreds of row groups; a point
or range predicate on the cluster column reads O(matching groups), not
O(file). The journal's ``rg-*`` markers make the skip observable.
"""

from __future__ import annotations

import glob as _glob
import os

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.sources import docstore


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """One docstore table whose single data file holds ~10 row groups
    clustered by user_id (sorted write + small Arrow batches), so the
    MANIFEST stats span everything (file-level pruning can't help) while
    footer stats separate the groups."""
    path = str(tmp_path_factory.mktemp("rgtab") / "t")
    docstore.register(spark)
    df = spark.range(10_000).select(
        F.col("id").cast("int").alias("user_id"),
        (F.col("id") % 7).cast("int").alias("partition_id"),
        F.concat(F.lit("u-"), F.col("id")).alias("name"),
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
    try:
        (
            df.orderBy("user_id")
            .coalesce(1)
            .write.format("docstore")
            .option("path", path)
            .mode("append")
            .save()
        )
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    return path


def _scan(spark, path, journal, predicate):
    os.makedirs(journal)
    df = (
        spark.read.format("docstore")
        .option("path", path)
        .option("journal", journal)
        .option("pruned_scan", "true")
        .load()
        .filter(predicate)
    )
    rows = sorted(r["user_id"] for r in df.collect())
    kept = total = 0
    for m in _glob.glob(f"{journal}/rg-*"):
        k, t = os.path.basename(m).rsplit("-", 3)[1::2]
        kept += int(k)
        total += int(t)
    return rows, kept, total


def test_range_predicate_skips_row_groups(spark, table, tmp_path):
    rows, kept, total = _scan(
        spark, table, str(tmp_path / "j1"), F.col("user_id").between(4200, 4300)
    )
    assert rows == list(range(4200, 4301))
    assert total >= 8, "fixture should produce many row groups"
    # 101 consecutive ids in ~1000-row sorted groups → at most 2 groups
    assert 1 <= kept <= 2


def test_in_set_predicate_skips_row_groups(spark, table, tmp_path):
    rows, kept, total = _scan(
        spark, table, str(tmp_path / "j2"), F.col("user_id").isin(17, 9911)
    )
    assert rows == [17, 9911]
    assert kept <= 2 < total


def test_unclustered_predicate_prunes_nothing_but_stays_correct(
    spark, table, tmp_path
):
    # partition_id cycles 0..6 in every group: stats can never exclude
    rows, kept, total = _scan(
        spark, table, str(tmp_path / "j3"), F.col("partition_id") == 3
    )
    assert rows == [u for u in range(10_000) if u % 7 == 3]
    assert kept == total


def test_plain_scan_reads_every_group(spark, table, tmp_path):
    # no pruned_scan option → no bounds ship to the splits
    journal = str(tmp_path / "j4")
    os.makedirs(journal)
    df = (
        spark.read.format("docstore")
        .option("path", table)
        .option("journal", journal)
        .load()
        .filter(F.col("user_id") < 5)
    )
    assert df.count() == 5
    marks = _glob.glob(f"{journal}/rg-*")
    assert marks
    for m in marks:
        k, t = os.path.basename(m).rsplit("-", 3)[1::2]
        assert k == t


def test_position_deletes_survive_group_skipping(spark, table, tmp_path):
    """Position deletes address rows by file-absolute index; skipping
    earlier groups must not shift which rows a later group drops."""
    # delete a slice living deep in the file (group ~8 of 10)
    out = docstore.delete_where_mor(
        spark, table, "user_id >= 8100 AND user_id < 8120"
    )
    assert out["deleted_rows"] == 20
    rows, kept, total = _scan(
        spark, table, str(tmp_path / "j5"), F.col("user_id").between(8000, 8200)
    )
    assert rows == [u for u in range(8000, 8201) if not (8100 <= u < 8120)]
    assert kept < total
    # and the same rows come back on an unpruned scan
    plain = sorted(
        r["user_id"]
        for r in spark.read.format("docstore")
        .option("path", table)
        .load()
        .filter(F.col("user_id").between(8000, 8200))
        .collect()
    )
    assert plain == rows
