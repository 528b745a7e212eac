"""CDC-incremental validation over docstore snapshots: only partitions
whose file set changed since the last validated snapshot re-validate,
the changed set derived from snapshot-manifest METADATA alone (the
Iceberg incremental-processing model — no data scan to plan the run)."""

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

CFG = DataGenConfig(n_docs=1200, n_partitions=6, n_media=200, drift_partitions=(5,))

DOCS_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, partition_id int"
)


@pytest.fixture(scope="module")
def inputs(spark):
    docs = generate_documents(spark, CFG).cache()
    media = generate_media_assets(spark, CFG).cache()
    baseline = drift.compute_baseline(
        reassembly.explode_spans_meta(generate_documents(spark, clean_config(CFG)))
    ).cache()
    return docs, media, baseline


def _make_table(spark, docs, path: str) -> str:
    # cluster files by partition so manifest stats carry exact partition
    # bounds per file (one partition value per file — the Iceberg layout;
    # range partitioning, not hash, so distinct values never share a task)
    write_table(
        docs.repartitionByRange(CFG.n_partitions, "partition_id"), path, fmt="docstore"
    )
    return path


def _extra(spark, rows):
    return spark.createDataFrame(rows, DOCS_DDL)


def _append_statsless_copy(path: str) -> list[dict]:
    """Manifest file list with one extra entry: a byte-copy of the first
    data file committed WITHOUT column stats (a writer that predates
    stats tracking) — metadata alone cannot bound what it touched."""
    import shutil
    import uuid as _uuid

    import os

    m = docstore.load_manifest(path)
    files = [dict(f) for f in m["files"]]
    src = files[0]["path"]  # manifest paths are relative to the table dir
    dst = f"copy-{_uuid.uuid4().hex[:8]}-{src}"
    shutil.copyfile(os.path.join(path, src), os.path.join(path, dst))
    return files + [{**files[0], "path": dst, "stats": {}}]


def _verdict_key(df):
    return sorted(
        (r["partition_id"], r["constraint"], r["passed"], r["violation_count"], r["row_count"])
        for r in df.collect()
    )


def test_changed_partitions_from_metadata(spark, tmp_path, inputs):
    docs, _media, _baseline = inputs
    path = _make_table(spark, docs, str(tmp_path / "t1"))
    v1 = docstore.current_version(path)

    # append into partition 3 only
    write_table(
        _extra(spark, [("zz-new-1", [("text", "hello new", None, 0)], 3)]),
        path, mode="append", fmt="docstore",
    )
    v2 = docstore.current_version(path)
    assert docstore.changed_partitions(path, v1, v2) == {3}

    # COW delete rewrites files of the partitions holding matches
    docstore.delete_where(spark, path, "doc_id = 'zz-new-1'")
    v3 = docstore.current_version(path)
    assert docstore.changed_partitions(path, v2, v3) == {3}

    # MOR position delete mutates only the target file's entry
    r = docstore.delete_where_mor(
        spark, path, "partition_id = 1 AND doc_id LIKE 'doc-%'"
    )
    assert r["deleted_rows"] > 0
    v4 = docstore.current_version(path)
    changed = docstore.changed_partitions(path, v3, v4)
    assert changed == {1}

    # no change between identical snapshots
    assert docstore.changed_partitions(path, v4, v4) == set()


def test_changed_partitions_unbounded_returns_none(spark, tmp_path, inputs):
    docs, _media, _baseline = inputs
    path = _make_table(spark, docs, str(tmp_path / "t2"))
    v1 = docstore.current_version(path)
    # an appended file WITHOUT the partition column tracked in stats:
    # copy a data file under a new name and commit it stats-less
    docstore.commit_snapshot(path, _append_statsless_copy(path), docstore.load_manifest(path)["schema"])
    v2 = docstore.current_version(path)
    assert docstore.changed_partitions(path, v1, v2) is None


def test_incremental_revalidates_only_changed(spark, tmp_path, inputs):
    docs, media, baseline = inputs
    path = _make_table(spark, docs, str(tmp_path / "t3"))
    v = ResumableValidator(spark, str(tmp_path / "state3"), str(tmp_path / "out3"))

    s1 = v.run_docstore_incremental(path, media, baseline)
    assert s1["validated_partitions"] == [0, 1, 2, 3, 4, 5]
    assert s1["invalidated_partitions"] == []

    # identical snapshot → nothing re-validates
    s2 = v.run_docstore_incremental(path, media, baseline)
    assert s2["validated_partitions"] == []
    assert s2["snapshot_version"] == s1["snapshot_version"]

    # new docs land in partition 2: one of them duplicates a doc_id that
    # lives in partition 0 (cross-partition collision — the uniqueness
    # RIPPLE: partition 0's verdict flips although its files never moved)
    # and one dangles a media_ref. The ripple probe must pull partition 0
    # into the re-validated set via its stored doc_id Bloom; partitions
    # sharing no changed-multiplicity key stay skipped.
    dup_id = docs.filter("partition_id = 0").select("doc_id").first()["doc_id"]
    write_table(
        _extra(
            spark,
            [
                (dup_id, [("text", "dup body", None, 0)], 2),
                ("zz-inc-1", [("image", None, "media-none-xyz", 0)], 2),
            ],
        ),
        path, mode="append", fmt="docstore",
    )
    s3 = v.run_docstore_incremental(path, media, baseline)
    assert s3["invalidated_partitions"] == [0, 2]
    assert s3["validated_partitions"] == [0, 2]
    assert sorted(s3["skipped_partitions"]) == [1, 3, 4, 5]

    viol = v.violations()
    dup_parts = sorted(
        r["partition_id"]
        for r in viol.filter(
            (F.col("constraint") == "uniqueness") & (F.col("doc_id") == dup_id)
        ).collect()
    )
    assert dup_parts == [0, 2]
    assert (
        viol.filter(
            (F.col("constraint") == "referential")
            & F.col("detail").contains("media-none-xyz")
        ).count()
        == 1
    )

    # ground truth: a from-scratch single-shot suite over the final table
    docstore.register(spark)
    full_docs = spark.read.format("docstore").option("path", path).load()
    truth = run_suite(full_docs, media, baseline)
    want = _verdict_key(truth.verdicts)
    got = _verdict_key(v.verdicts())
    assert got == want

    # deletion ripple: removing the partition-2 copy restores partition 0's
    # uniqueness PASS — the vanished key's multiplicity delta must pull
    # partition 0 back in even though its own files are again untouched
    docstore.delete_where(spark, path, "doc_id = 'zz-inc-1'")
    docstore.delete_where_mor(
        spark, path, f"partition_id = 2 AND doc_id = '{dup_id}'"
    )
    s4 = v.run_docstore_incremental(path, media, baseline)
    assert 0 in s4["invalidated_partitions"] and 2 in s4["invalidated_partitions"]
    assert (
        v.violations().filter(
            (F.col("constraint") == "uniqueness") & (F.col("doc_id") == dup_id)
        ).count()
        == 0
    )
    truth2 = run_suite(
        spark.read.format("docstore").option("path", path).load(), media, baseline
    )
    assert _verdict_key(v.verdicts()) == _verdict_key(truth2.verdicts)


def test_incremental_survives_expired_watermark(spark, tmp_path, inputs):
    """expire_snapshots reclaiming the watermarked version must degrade to
    full re-validation, never crash on time travel."""
    docs, media, baseline = inputs
    path = _make_table(spark, docs, str(tmp_path / "t5"))
    v = ResumableValidator(spark, str(tmp_path / "state5"), str(tmp_path / "out5"))
    v.run_docstore_incremental(path, media, baseline)

    write_table(
        _extra(spark, [("zz-exp-1", [("text", "x", None, 0)], 1)]),
        path, mode="append", fmt="docstore",
    )
    docstore.compact_snapshot(spark, path, n_files=6)
    docstore.expire_snapshots(path, keep_last=1)  # watermark v1 now gone
    assert docstore.changed_partitions(path, 1, docstore.current_version(path)) is None
    s = v.run_docstore_incremental(path, media, baseline)
    assert s["invalidated_partitions"] == [0, 1, 2, 3, 4, 5]
    assert s["validated_partitions"] == [0, 1, 2, 3, 4, 5]


def test_incremental_unbounded_change_invalidates_all_done(spark, tmp_path, inputs):
    docs, media, baseline = inputs
    path = _make_table(spark, docs, str(tmp_path / "t4"))
    v = ResumableValidator(spark, str(tmp_path / "state4"), str(tmp_path / "out4"))
    v.run_docstore_incremental(path, media, baseline)

    # append a stats-less file copy: metadata can no longer bound the
    # change, so every done partition must re-validate (never narrower)
    docstore.commit_snapshot(
        path, _append_statsless_copy(path), docstore.load_manifest(path)["schema"]
    )
    s = v.run_docstore_incremental(path, media, baseline)
    assert s["invalidated_partitions"] == [0, 1, 2, 3, 4, 5]
    assert s["validated_partitions"] == [0, 1, 2, 3, 4, 5]


def test_partition_values_from_metadata(spark, tmp_path, inputs):
    docs, _media, _baseline = inputs
    path = _make_table(spark, docs, str(tmp_path / "t5"))
    assert docstore.partition_values(path) == [0, 1, 2, 3, 4, 5]
    # a stats-less file breaks the exact-enumeration contract → None
    docstore.commit_snapshot(
        path, _append_statsless_copy(path), docstore.load_manifest(path)["schema"]
    )
    assert docstore.partition_values(path) is None


def test_incremental_scan_is_file_bounded(spark, tmp_path):
    """Re-validating one changed partition must OPEN only the files that
    can hold it (plus any uniqueness-scope hits) — the docstore
    ``partition_in`` load bound, evidenced by the reader journal. Before
    this bound, the pending row-filter still scanned every file and
    discarded the finished partitions' rows after reading them."""
    import glob as _glob
    import os

    # CLEAN docs: the shared fixture injects cross-partition duplicate
    # doc_ids, which would make the uniqueness scope legitimately pull
    # colliding partitions' files — this test isolates the file bound
    ccfg = clean_config(CFG)
    docs = generate_documents(spark, ccfg)
    media = generate_media_assets(spark, ccfg)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))
    path = _make_table(spark, docs, str(tmp_path / "t6"))
    v = ResumableValidator(spark, str(tmp_path / "state6"), str(tmp_path / "out6"))
    v.run_docstore_incremental(path, media, baseline)

    # fresh ids in partition 3 only: no uniqueness ripple, no scope hits
    write_table(
        _extra(
            spark,
            [
                ("zz-bound-1", [("text", "body one", None, 0)], 3),
                ("zz-bound-2", [("text", "body two", None, 0)], 3),
            ],
        ),
        path, mode="append", fmt="docstore",
    )
    journal = str(tmp_path / "j6")
    os.makedirs(journal)
    v.docstore_journal = journal
    s = v.run_docstore_incremental(path, media, baseline)
    assert s["validated_partitions"] == [3]

    # only the files whose stats can hold partition 3 may be opened by
    # the bounded loads — every other partition's file stays on disk
    man = docstore.load_manifest(path)
    p3_files = {
        f["path"] for f in man["files"]
        if f["stats"]["partition_id"][0] <= 3 <= f["stats"]["partition_id"][1]
    }
    assert 2 <= len(p3_files) < len(man["files"])
    opened = {
        os.path.basename(m)[len("opened-"):]
        for m in _glob.glob(f"{journal}/opened-*")
    }
    assert opened == p3_files
    # and the bounded run's verdicts still match a from-scratch suite
    truth = run_suite(
        spark.read.format("docstore").option("path", path).load(), media, baseline
    )
    assert _verdict_key(v.verdicts()) == _verdict_key(truth.verdicts)


def test_eq_delete_triggers_incremental_revalidation(spark, tmp_path, inputs):
    """An equality-delete commit changes row VISIBILITY without touching
    the file list; `changed_partitions` must still bound the affected
    partitions (via eq-delete applicability signatures) and the
    incremental run must re-validate them — verdict row counts drop by
    exactly the deleted rows, verdicts byte-match a from-scratch suite
    over the post-delete table."""
    docs, media, baseline = inputs
    path = _make_table(spark, docs, str(tmp_path / "eqinc"))
    v = ResumableValidator(spark, str(tmp_path / "stateE"), str(tmp_path / "outE"))
    s1 = v.run_docstore_incremental(path, media, baseline)
    assert sorted(s1["validated_partitions"]) == list(range(CFG.n_partitions))

    # GDPR-style erasure: three doc_ids from partition 2, by key only
    victims = [
        r["doc_id"]
        for r in spark.read.format("docstore").option("path", path).load()
        .filter("partition_id = 2").select("doc_id").distinct().limit(3).collect()
    ]
    docstore.delete_where_eq(spark, path, "doc_id", victims)

    s2 = v.run_docstore_incremental(path, media, baseline)
    assert s2["validated_partitions"], "eq-delete commit must trigger re-validation"
    assert 2 in s2["validated_partitions"]

    # final verdicts == from-scratch suite over the post-delete table
    post = spark.read.format("docstore").option("path", path).load()
    golden = _verdict_key(run_suite(post, media, baseline).verdicts)
    assert _verdict_key(v.verdicts()) == golden

    # a third run with no commits validates nothing
    s3 = v.run_docstore_incremental(path, media, baseline)
    assert s3["validated_partitions"] == []
