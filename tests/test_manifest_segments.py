"""Manifest segments: O(delta) commit metadata (the Iceberg
manifest-file model).

Without segments every commit re-serializes the table's ENTIRE file
list into manifest-v{N}.json — at 10^12 docs (~10^6 files) that is
hundreds of MB of metadata write amplification per append. With
segments, a commit's manifest carries immutable `seg-*.json` references
for the unchanged bulk and inlines only the delta; the roll threshold
bounds the inline list. Reference behavior modeled: Iceberg's
manifest-list → manifest-file reuse across snapshots
(core/src/main/java/org/apache/iceberg/SnapshotProducer.java's
manifest reuse; re-expressed for the JSON docstore).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.sources import docstore as ds


def _rows(spark, pfx, n, part=0):
    return spark.range(n).select(
        F.concat(F.lit(pfx), F.col("id").cast("string")).alias("doc_id"),
        F.lit(part).alias("partition_id"),
        F.col("id").cast("int").alias("n"),
    )


def _write(spark, t, df, mode):
    (df.coalesce(1).write.format("docstore").option("path", t)
     .option("segment_roll", "4").mode(mode).save())


def _raw_manifest(t, v=None):
    v = v if v is not None else ds.current_version(t)
    with open(os.path.join(t, f"manifest-v{v}.json")) as f:
        return json.load(f)


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    ds.register(spark)
    _write(spark, t, _rows(spark, "a", 3), "overwrite")
    for i in range(6):
        _write(spark, t, _rows(spark, f"b{i}-", 3), "append")
    return t


def test_appends_roll_into_segments(spark, table):
    raw = _raw_manifest(table)
    segs = raw.get("segments") or []
    assert segs, "appends past the roll threshold must create a segment"
    assert len(raw["files"]) <= 4, "inline list stays bounded by the roll"
    assert sum(s["n_files"] for s in segs) + len(raw["files"]) == 7
    # reads see the full expansion
    df = spark.read.format("docstore").option("path", table).load()
    assert df.count() == 21
    assert ds.load_manifest(table)["files"].__len__() == 7


def test_append_is_delta_metadata(spark, table):
    before = _raw_manifest(table)
    _write(spark, table, _rows(spark, "c", 3), "append")
    after = _raw_manifest(table)
    # the new manifest REFERENCES the same immutable segments and inlines
    # only the delta on top of the prior inline entries
    assert [s["path"] for s in after["segments"]] == [
        s["path"] for s in before["segments"]
    ]
    assert len(after["files"]) == len(before["files"]) + 1
    assert (
        spark.read.format("docstore").option("path", table).load().count()
        == 24
    )


def test_time_travel_across_segment_boundaries(spark, table):
    # v3 predates the roll; v7 is the segmented head — both read exactly
    for v, expect in ((1, 3), (3, 9), (7, 21)):
        got = (
            spark.read.format("docstore").option("path", table)
            .option("version", str(v)).load().count()
        )
        assert got == expect, f"v{v}"


def test_mutation_invalidates_only_touched_segment(spark, table, tmp_path):
    # grow a SECOND segment so the table has two
    for i in range(5):
        _write(spark, table, _rows(spark, f"c{i}-", 3), "append")
    raw = _raw_manifest(table)
    assert len(raw["segments"]) >= 2
    seg_paths = [s["path"] for s in raw["segments"]]
    # MOR-delete one row from a file inside the FIRST segment
    ds.delete_where_mor(spark, table, "doc_id = 'a0'")
    after = _raw_manifest(table)
    kept = [s["path"] for s in after.get("segments") or []]
    assert seg_paths[0] not in kept, "touched segment re-inlines"
    assert all(p in kept for p in seg_paths[1:]), "untouched segments survive"
    df = spark.read.format("docstore").option("path", table).load()
    assert df.count() == 21 + 15 - 1
    assert df.filter("doc_id = 'a0'").count() == 0


def test_cdc_diff_and_changed_partitions_across_segments(spark, table):
    # the version-step diff reads expanded manifests: an append on a
    # segmented table plans CDC splits for exactly its delta files
    before = {f["path"] for f in ds.load_manifest(table)["files"]}
    _write(spark, table, _rows(spark, "d", 3, part=1), "append")
    v = ds.current_version(table)
    splits = ds._diff_version_step(table, v)
    assert all(s.change_type == "insert" for s in splits)
    new_paths = {os.path.basename(s.path) for s in splits}
    assert new_paths == {
        f["path"] for f in ds.load_manifest(table)["files"]
    } - before
    assert ds.changed_partitions(table, v - 1, v) == {1}


def test_expire_and_orphans_respect_segment_references(spark, table, tmp_path):
    seg_paths = {s["path"] for s in _raw_manifest(table)["segments"]}
    assert seg_paths
    ds.expire_snapshots(table, keep_last=1)
    for p in seg_paths:  # still referenced by the surviving head
        assert os.path.exists(os.path.join(table, p))
    # an unreferenced (orphan) segment file is reclaimed past the window
    orphan = os.path.join(table, "seg-deadbeef.json")
    with open(orphan, "w") as f:
        json.dump([], f)
    os.utime(orphan, (1, 1))  # ancient mtime: outside the safety window
    young = os.path.join(table, "seg-cafebabe.json")
    with open(young, "w") as f:
        json.dump([], f)
    res = ds.remove_orphan_files(table, older_than_seconds=3600)
    assert not os.path.exists(orphan)
    assert os.path.exists(young), "in-flight-aged files are never touched"
    assert res["removed_files"] >= 1
    for p in seg_paths:
        assert os.path.exists(os.path.join(table, p))
    # table still fully readable
    assert (
        spark.read.format("docstore").option("path", table).load().count()
        == 21
    )


def test_branch_commits_reuse_parent_segments(spark, table):
    ds.create_branch(table, "audit")
    (_rows(spark, "staged", 2).coalesce(1).write.format("docstore")
     .option("path", table).option("branch", "audit")
     .option("segment_roll", "4").mode("append").save())
    head_raw = _raw_manifest(table)
    assert head_raw["branch"] == "audit"
    main_segs = {
        s["path"]
        for s in (_raw_manifest(table, ds.resolve_ref(table, "main"))
                  .get("segments") or [])
    }
    assert main_segs <= {s["path"] for s in head_raw["segments"]}
    # main readers don't see staged rows; the branch sees everything
    main_df = spark.read.format("docstore").option("path", table).load()
    assert main_df.count() == 21
    br = (spark.read.format("docstore").option("path", table)
          .option("ref", "audit").load())
    assert br.count() == 23
    # publish keeps the shared segments byte-identical
    ds.fast_forward(table, "audit", "main")
    pub = _raw_manifest(table)
    assert main_segs <= {s["path"] for s in pub.get("segments") or []}
    assert (
        spark.read.format("docstore").option("path", table).load().count()
        == 23
    )


def test_eq_deletes_apply_across_segments(spark, table):
    res = ds.delete_where_eq(spark, table, "doc_id", ["a1", "b2-0"])
    assert res["n_keys"] == 2
    df = spark.read.format("docstore").option("path", table).load()
    assert df.count() == 19
    assert df.filter(F.col("doc_id").isin("a1", "b2-0")).count() == 0
