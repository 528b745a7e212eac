"""Refs (branches + tags), rollback, metadata tables, and the
write-audit-publish workflow over the docstore table format.

The Iceberg snapshot-ref model, proven end-to-end: branch writes are
invisible to main (and to main's CDC feed and the incremental
validator's watermark) until a fast-forward publish; tags pin snapshots
against expiry; rollback is a history-preserving new commit; and the
WAP workflow gates VISIBILITY of a staged batch on the constraint
suite's verdicts.
"""

from __future__ import annotations

import os

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
from anomalydetection_spark.sources.io import read_table, write_table

CFG = DataGenConfig(n_docs=400, n_partitions=4, n_media=200)
CLEAN = clean_config(CFG)


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def _read(spark, path, **opts):
    r = spark.read.format("docstore").option("path", path)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


@pytest.fixture()
def table(spark, tmp_path):
    """A 2-snapshot main lineage: v1 = partitions 0-1, v2 (+= 2-3)."""
    path = str(tmp_path / "t")
    docs = generate_documents(spark, CLEAN)
    write_table(docs.filter(F.col("partition_id") < 2), path, fmt="docstore")
    write_table(
        docs.filter(F.col("partition_id") >= 2), path, mode="append", fmt="docstore"
    )
    return path, docs


def test_branch_write_isolated_from_main(spark, table):
    """A branch append is invisible on main (default read AND explicit
    ref=main) even though the branch commit is the NEWEST manifest; the
    branch read sees base + staged rows; an unknown branch fails before
    any data is written."""
    path, docs = table
    n_main = _read(spark, path).count()
    ds.create_branch(path, "audit")
    staged = generate_documents(spark, CLEAN).limit(25).withColumn(
        "doc_id", F.concat(F.lit("a-"), F.col("doc_id"))
    )
    staged.write.format("docstore").option("path", path).option(
        "branch", "audit"
    ).mode("append").save()

    assert ds.resolve_ref(path, "audit") == ds.current_version(path)
    assert ds.resolve_ref(path, "main") < ds.current_version(path)
    assert _read(spark, path).count() == n_main
    assert _read(spark, path, ref="main").count() == n_main
    assert _read(spark, path, ref="audit").count() == n_main + 25

    with pytest.raises(Exception, match="no branch 'nope'"):
        staged.write.format("docstore").option("path", path).option(
            "branch", "nope"
        ).mode("append").save()


def test_tag_pins_snapshot_and_rejects_writes(spark, table):
    """A tag reads frozen content across later main commits; writing to a
    tag fails; expire_snapshots keeps the tagged snapshot alive while
    reclaiming untagged history of the same age."""
    path, docs = table
    v1_ids = _ids(_read(spark, path, version=1))
    ds.create_tag(path, "baseline", at_version=1)
    write_table(
        generate_documents(spark, CLEAN).limit(10).withColumn(
            "doc_id", F.concat(F.lit("b-"), F.col("doc_id"))
        ),
        path, mode="append", fmt="docstore",
    )
    assert _ids(_read(spark, path, ref="baseline")) == v1_ids

    with pytest.raises(Exception, match="tag"):
        docs.limit(1).write.format("docstore").option("path", path).option(
            "branch", "baseline"
        ).mode("append").save()

    ds.expire_snapshots(path, keep_last=1)
    # v2 (untagged, not newest) is gone; v1 survives through its tag
    assert _ids(_read(spark, path, ref="baseline")) == v1_ids
    with pytest.raises(Exception):
        _read(spark, path, version=2).count()


def test_fast_forward_publish_and_guard(spark, table):
    """Publishing a branch fast-forwards main to its exact content
    (metadata-only — the staged data files are REUSED, not rewritten);
    a main commit after the fork makes the publish fail loudly instead
    of silently overwriting it."""
    path, docs = table
    ds.create_branch(path, "stage")
    staged = generate_documents(spark, CLEAN).limit(30).withColumn(
        "doc_id", F.concat(F.lit("c-"), F.col("doc_id"))
    )
    staged.write.format("docstore").option("path", path).option(
        "branch", "stage"
    ).mode("append").save()
    branch_files = {f["path"] for f in ds.load_manifest(path, ref="stage")["files"]}

    before = _read(spark, path).count()
    ds.fast_forward(path, "stage", "main")
    assert _read(spark, path).count() == before + 30
    main_files = {f["path"] for f in ds.load_manifest(path, ref="main")["files"]}
    assert main_files == branch_files  # zero data movement

    # divergence guard: fork, then advance main, then try to publish
    ds.create_branch(path, "stale")
    staged.limit(5).withColumn("doc_id", F.concat(F.lit("g-"), F.col("doc_id"))).write.format(
        "docstore"
    ).option("path", path).option("branch", "stale").mode("append").save()
    write_table(docs.limit(3), path, mode="append", fmt="docstore")  # main moved
    with pytest.raises(ValueError, match="not an .*ancestor|ancestor"):
        ds.fast_forward(path, "stale", "main")


def test_rollback_preserves_history(spark, table):
    """rollback_to(v1) restores v1's exact content as a NEW commit; the
    rolled-past snapshot stays time-travel-readable."""
    path, docs = table
    v1_ids = _ids(_read(spark, path, version=1))
    v2_ids = _ids(_read(spark, path, version=2))
    ds.rollback_to(path, 1)
    assert _ids(_read(spark, path)) == v1_ids
    assert _ids(_read(spark, path, version=2)) == v2_ids  # history intact


def test_cdc_feed_skips_branch_commits(spark, table, tmp_path):
    """The CDC stream over a table with interleaved branch activity emits
    main's changes only — staged rows surface exactly once, at publish,
    with the publish commit's version."""
    path, docs = table
    ds.create_branch(path, "wip")
    staged = generate_documents(spark, CLEAN).limit(20).withColumn(
        "doc_id", F.concat(F.lit("d-"), F.col("doc_id"))
    )
    staged.write.format("docstore").option("path", path).option(
        "branch", "wip"
    ).mode("append").save()
    pub_v = ds.fast_forward(path, "wip", "main")

    feed = (
        spark.readStream.format("docstore")
        .option("path", path)
        .option("cdc", "true")
        .option("startingVersion", "2")  # changes after the fixture's head
        .load()
    )
    q = (
        feed.writeStream.format("memory")
        .queryName("refs_cdc")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from refs_cdc").collect()
    staged_ids = {r["doc_id"] for r in staged.select("doc_id").collect()}
    assert {r["doc_id"] for r in rows} == staged_ids
    assert all(r["_change_type"] == "insert" for r in rows)
    assert {r["_commit_version"] for r in rows} == {pub_v}
    assert len(rows) == 20  # once each — never re-emitted from the branch


def test_metadata_tables(spark, table):
    path, _ = table
    ds.create_branch(path, "b1")
    ds.create_tag(path, "t1", at_version=1)

    snaps = ds.metadata_table(spark, path, "snapshots").collect()
    assert [r["version"] for r in snaps] == sorted(r["version"] for r in snaps)
    by_v = {r["version"]: r for r in snaps}
    assert by_v[2]["branch"] == "main" and by_v[2]["parent"] == 1
    assert by_v[3]["branch"] is None  # refs-only metadata commit

    refs = {r["name"]: r for r in ds.metadata_table(spark, path, "refs").collect()}
    assert refs["main"]["type"] == "branch"
    assert refs["b1"] == refs["b1"]  # present
    assert refs["t1"]["type"] == "tag" and refs["t1"]["version"] == 1

    files = ds.metadata_table(spark, path, "files", ref="main").collect()
    assert sum(r["rows"] for r in files) == _read(spark, path).count()
    assert all("partition_id" in r["stats"] for r in files)

    hist = ds.metadata_table(spark, path, "history").collect()
    assert hist[0]["is_current"] and hist[0]["version"] == ds.resolve_ref(path)
    assert [r["version"] for r in hist] == sorted(
        (r["version"] for r in hist), reverse=True
    )


def test_wap_blocks_bad_batch_and_publishes_good(spark, tmp_path):
    """The flagship workflow: a duplicate-riddled batch is staged, audited
    red, and NEVER becomes visible on main; the clean batch publishes,
    and its audit validated only the touched partitions."""
    from anomalydetection_spark.plans.wap import write_audit_publish

    path = str(tmp_path / "wap_t")
    docs = generate_documents(spark, CLEAN)
    write_table(docs, path, fmt="docstore")
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, CLEAN))
    )
    n0 = _read(spark, path).count()

    # bad batch: every doc_id collides with an established one
    bad = docs.filter(F.col("partition_id") == 1).limit(20)
    res = write_audit_publish(spark, path, bad, media, baseline)
    assert res["published"] is False
    failed = {v["constraint"] for v in res["verdicts"] if not v["passed"]}
    assert "uniqueness" in failed
    assert _read(spark, path).count() == n0  # main never saw it
    # staged branch kept for drill-down
    assert res["branch"] in ds.table_refs(path)
    assert res["violations"].count() > 0
    ds.drop_ref(path, res["branch"])

    # good batch: fresh ids into one partition
    good = (
        docs.filter(F.col("partition_id") == 2).limit(20)
        .withColumn("doc_id", F.concat(F.lit("e-"), F.col("doc_id")))
    )
    res2 = write_audit_publish(spark, path, good, media, baseline)
    assert res2["published"] is True, res2["verdicts"]
    assert res2["audited_partitions"] == [2]  # metadata-bounded scope
    assert _read(spark, path).count() == n0 + 20
    assert res2["branch"] not in ds.table_refs(path)  # dropped after publish


def test_incremental_validator_ignores_staged_branch(spark, tmp_path):
    """The snapshot watermark follows MAIN: a staged branch commit does
    not trigger re-validation; its publish does, bounded to the touched
    partitions."""
    from anomalydetection_spark.plans.manifest import ResumableValidator

    path = str(tmp_path / "inc_t")
    docs = generate_documents(spark, CLEAN)
    write_table(docs, path, fmt="docstore")
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, CLEAN))
    )
    v = ResumableValidator(spark, str(tmp_path / "state"), str(tmp_path / "out"))
    s1 = v.run_docstore_incremental(path, media, baseline)
    assert len(s1["validated_partitions"]) == CFG.n_partitions

    # staged-only activity: nothing to validate
    ds.create_branch(path, "stage")
    batch = (
        docs.filter(F.col("partition_id") == 3).limit(10)
        .withColumn("doc_id", F.concat(F.lit("f-"), F.col("doc_id")))
    )
    batch.write.format("docstore").option("path", path).option(
        "branch", "stage"
    ).mode("append").save()
    s2 = v.run_docstore_incremental(path, media, baseline)
    assert s2["validated_partitions"] == []
    assert s2["snapshot_version"] == s1["snapshot_version"]

    # publish: exactly the touched partition re-validates
    ds.fast_forward(path, "stage", "main")
    s3 = v.run_docstore_incremental(path, media, baseline)
    assert s3["validated_partitions"] == [3]
    assert s3["snapshot_version"] == ds.resolve_ref(path, "main")


def test_legacy_table_backcompat(spark, tmp_path):
    """Tables committed before refs existed (manifests without refs keys)
    read identically, report the implied main ref, and accept branch
    creation on top."""
    path = str(tmp_path / "legacy_t")
    docs = generate_documents(spark, CLEAN)
    write_table(docs, path, fmt="docstore")
    # strip the refs/branch/parent keys to simulate a pre-refs manifest
    import json

    mp = os.path.join(path, "manifest-v1.json")
    with open(mp) as f:
        m = json.load(f)
    for k in ("refs", "branch", "parent"):
        m.pop(k, None)
    os.remove(mp)
    with open(mp, "w") as f:
        json.dump(m, f)

    assert ds.resolve_ref(path, "main") == 1
    n = _read(spark, path).count()
    ds.create_branch(path, "b")
    assert _read(spark, path, ref="b").count() == n
    write_table(docs.limit(5), path, mode="append", fmt="docstore")
    assert _read(spark, path).count() == n + 5


def test_wap_bounded_uniqueness_catches_cross_partition_established_dup(
    spark, tmp_path
):
    """The audit's table-wide uniqueness runs behind a Bloom over the
    audited partitions' ids (batch-sized shuffle, not table-sized): a
    batch whose ids duplicate docs ESTABLISHED in an untouched partition
    must still be blocked — the Bloom has no false negatives, so every
    established copy of an audited id reaches duplicate detection."""
    from anomalydetection_spark.plans.wap import write_audit_publish

    path = str(tmp_path / "wap_x")
    docs = generate_documents(spark, CLEAN)
    write_table(docs, path, fmt="docstore")
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, CLEAN))
    )
    n0 = _read(spark, path).count()

    # ids stolen from established partition 1, staged into partition 3:
    # the established copies live in a partition the audit never touches
    bad = (
        docs.filter(F.col("partition_id") == 1).limit(10)
        .withColumn("partition_id", F.lit(3).cast("int"))
    )
    res = write_audit_publish(spark, path, bad, media, baseline)
    assert res["audited_partitions"] == [3]  # partition 1 untouched
    assert res["published"] is False
    failed = {v["constraint"] for v in res["verdicts"] if not v["passed"]}
    assert "uniqueness" in failed
    # each of the 10 staged rows is a duplicate row in the audited scope
    uniq_viol = res["violations"].filter("constraint = 'uniqueness'")
    assert uniq_viol.count() == 10
    assert {r["partition_id"] for r in uniq_viol.collect()} == {3}
    assert _read(spark, path).count() == n0
    ds.drop_ref(path, res["branch"])


def test_partitions_metadata_table(spark, tmp_path):
    """`partitions` metadata table: per-partition file/row rollup from
    manifest stats alone — clustered files group under their partition,
    stat-spanning files under NULL, and totals reconcile with `files`."""
    path = str(tmp_path / "pmeta")
    # range partitioning with explicit numPartitions: one partition value
    # per task (hash repartition can collide values into one file, and
    # AQE would coalesce the tiny shuffle into one spanning file)
    docs = generate_documents(spark, CLEAN).repartitionByRange(4, "partition_id")
    write_table(docs, path, fmt="docstore")
    parts = ds.metadata_table(spark, path, "partitions")
    got = {r["partition"]: r for r in parts.collect()}
    truth = {
        r["partition_id"]: r["n"]
        for r in _read(spark, path).groupBy("partition_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    # clustered write: every partition appears, row counts exact
    for pid, n in truth.items():
        assert got[pid]["rows"] == n and got[pid]["n_files"] >= 1
    files_total = ds.metadata_table(spark, path, "files").agg(
        F.sum("rows").alias("s")
    ).collect()[0]["s"]
    assert sum(r["rows"] for r in got.values()) == files_total


def test_wap_uniqueness_scope_is_batch_bounded_not_table_sized(spark, tmp_path):
    """The bounded scope frame must hold ≈ |audited rows| + |established
    copies of audited ids| (+ Bloom false positives ≪ table), never the
    whole table — the row-count proof that duplicate detection stopped
    shuffling every established doc_id per ingest."""
    from anomalydetection_spark.plans.wap import _bounded_uniqueness_scope

    path = str(tmp_path / "wap_scope")
    docs = generate_documents(spark, CLEAN)
    write_table(docs, path, fmt="docstore")
    full = _read(spark, path)
    n_table = full.count()

    audited = [3]
    scoped = full.filter(F.col("partition_id") == 3)
    n_scoped = scoped.count()
    scope = _bounded_uniqueness_scope(spark, full, scoped, audited, "partition_id")
    n_scope = scope.count()
    # CLEAN config: no cross-partition duplicates — established copies = 0,
    # so anything above |scoped| is Bloom false positives (~1% of the
    # established side at 12 bits/key, far below table size)
    assert n_scoped <= n_scope < n_scoped + 0.05 * n_table
    assert n_scope < n_table


def test_wap_uniqueness_scope_keeps_null_partition_rows(spark, tmp_path):
    """NULL-partition established rows must reach duplicate detection in
    BOTH scope branches: ~isin(NULL) is NULL (row silently dropped)
    without the explicit isNull disjunct."""
    from anomalydetection_spark.plans.wap import _bounded_uniqueness_scope

    full = spark.createDataFrame(
        [("dup-1", 1), ("solo", 2), ("dup-1", None)],
        "doc_id string, partition_id int",
    )
    scoped = full.filter(F.col("partition_id") == 3).unionByName(
        spark.createDataFrame([("dup-1", 3)], "doc_id string, partition_id int")
    )
    scope = _bounded_uniqueness_scope(spark, full, scoped, [3], "partition_id")
    rows = [(r["doc_id"], r["partition_id"]) for r in scope.collect()]
    assert ("dup-1", None) in rows  # the NULL-partition established copy
    assert ("dup-1", 1) in rows
    assert ("dup-1", 3) in rows


def test_wap_uniqueness_scope_anti_join_branch_above_threshold(spark, tmp_path):
    """Above 256 audited partitions the established-side exclusion plans
    as a broadcast anti-join instead of a 300-term NOT IN literal — same
    rows (incl. NULL partitions), just a bounded plan."""
    from anomalydetection_spark.plans.wap import _bounded_uniqueness_scope

    full = spark.createDataFrame(
        [(f"d{i}", i) for i in range(320)] + [("d5", None)],
        "doc_id string, partition_id int",
    )
    audited = list(range(300))
    scoped = full.filter(F.col("partition_id") < 300)
    scope = _bounded_uniqueness_scope(spark, full, scoped, audited, "partition_id")
    rows = {(r["doc_id"], r["partition_id"]) for r in scope.collect()}
    assert ("d5", None) in rows          # NULL-partition established copy kept
    assert ("d5", 5) in rows             # its audited twin
    # established non-matching rows appear only as Bloom false positives
    assert len(rows) <= 300 + 1 + 21
