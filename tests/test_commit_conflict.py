"""Optimistic-concurrency commits: the exclusive-manifest-create CAS,
lost-update detection via expected_base, append re-merge under
contention, and stale-hint repair."""

from __future__ import annotations

import json
import os
import threading

import pytest

from anomalydetection_spark.sources import docstore

DOCS_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>, partition_id int"
)


def _write(spark, path, rows, mode):
    docstore.register(spark)
    spark.createDataFrame(rows, DOCS_DDL).write.format("docstore").option(
        "path", path
    ).mode(mode).save()


def _rows(tag, n, pid=0):
    return [(f"{tag}-{i}", [("text", f"body {i}", None, 0)], pid) for i in range(n)]


def test_stale_base_commit_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    _write(spark, t, _rows("a", 5), "overwrite")
    m1 = docstore.load_manifest(t)  # base v1
    _write(spark, t, _rows("b", 3), "append")  # someone else → v2
    # a file list computed against v1 must NOT be committable: it would
    # silently drop b's files
    with pytest.raises(docstore.CommitConflict):
        docstore.commit_snapshot(t, m1["files"], m1["schema"], expected_base=1)
    # recomputed against the head, it commits fine
    m2 = docstore.load_manifest(t)
    v = docstore.commit_snapshot(t, m2["files"], m2["schema"], expected_base=2)
    assert v == 3


def test_exclusive_create_arbitrates_same_version(spark, tmp_path):
    t = str(tmp_path / "t")
    _write(spark, t, _rows("a", 5), "overwrite")
    m = docstore.load_manifest(t)
    # two writers race for v2 with no expected_base: exactly one wins
    results: list = [None, None]

    def attempt(i):
        try:
            results[i] = docstore.commit_snapshot(t, m["files"], m["schema"])
        except docstore.CommitConflict as e:
            results[i] = e

    # deterministic interleave: first commit wins, second must conflict on
    # the version it raced for (head moved between its read and link)
    b = threading.Barrier(2)
    ts = [threading.Thread(target=lambda i=i: (b.wait(), attempt(i))) for i in range(2)]
    [th.start() for th in ts]
    [th.join() for th in ts]
    wins = [r for r in results if isinstance(r, int)]
    # both may win (serialized as v2 then v3) but never the SAME version,
    # and at least one commits
    assert wins and len(set(wins)) == len(wins)
    assert docstore.current_version(t) == 1 + len(wins)


def test_concurrent_appends_merge_not_lost(spark, tmp_path):
    """The writer-level retry loop: N threads append through the Spark
    writer concurrently; every batch must survive into the final head."""
    t = str(tmp_path / "t")
    _write(spark, t, _rows("base", 10), "overwrite")
    errs: list = []

    def append(tag):
        try:
            _write(spark, t, _rows(tag, 5, pid=1), "append")
        except Exception as e:  # pragma: no cover - failure evidence
            errs.append(e)

    ts = [threading.Thread(target=append, args=(f"w{i}",)) for i in range(4)]
    [th.start() for th in ts]
    [th.join() for th in ts]
    assert not errs
    ids = {
        r["doc_id"]
        for r in spark.read.format("docstore")
        .option("path", t)
        .load()
        .select("doc_id")
        .collect()
    }
    for i in range(4):
        assert {f"w{i}-{j}" for j in range(5)} <= ids, f"writer {i} lost"
    assert len(ids) == 30


def test_stale_hint_probe_repair(spark, tmp_path):
    """A crash between manifest link and hint update leaves a stale hint;
    reads and the next commit must still see/extend the true head."""
    t = str(tmp_path / "t")
    _write(spark, t, _rows("a", 4), "overwrite")
    _write(spark, t, _rows("b", 4), "append")
    assert docstore.current_version(t) == 2
    # simulate the crash: regress the hint to v1 (manifest-v2 still exists)
    with open(os.path.join(t, "version-hint.text"), "w") as f:
        f.write("1")
    assert docstore.current_version(t) == 2  # probe repairs
    assert (
        spark.read.format("docstore").option("path", t).load().count() == 8
    )
    _write(spark, t, _rows("c", 4), "append")
    assert docstore.current_version(t) == 3
    m = docstore.load_manifest(t)
    assert sum(f["rows"] for f in m["files"]) == 12


def test_manifest_content_atomic_under_link(tmp_path):
    """The committed manifest name appears only with complete content —
    json.load of a just-committed manifest never sees a partial write."""
    t = str(tmp_path / "t")
    os.makedirs(t)
    files = [{"path": "data-x.parquet", "rows": 1, "stats": {}}]
    v = docstore.commit_snapshot(t, files, "{}")
    with open(os.path.join(t, f"manifest-v{v}.json")) as f:
        m = json.load(f)
    # commit stamps each new entry with its sequence number (= this version)
    assert m["files"] == [{**f, "seq": v} for f in files]
    # no temp litter
    assert not [p for p in os.listdir(t) if p.startswith("._manifest")]


def test_rewrite_eq_deletes_retries_on_conflict(spark, tmp_path, monkeypatch):
    """The eq→position fold is a read-modify-write: a concurrent append
    landing between its manifest read and its commit must raise
    CommitConflict (stale expected_base) and the operation-level retry
    must recompute against the new head — the appended rows survive, the
    fold still applies, and no eq list leaks into the final snapshot."""
    t = str(tmp_path / "race")
    _write(spark, t, _rows("a", 6), "overwrite")
    docstore.delete_where_eq(spark, t, "doc_id", ["a-0", "a-1"])

    real_commit = docstore.commit_snapshot
    fired = {"n": 0}

    def racing_commit(table_dir, files, schema_json, **kw):
        # intercept ONLY the fold's commit (it clears eq_deletes); slip a
        # concurrent append in first so its expected_base goes stale
        if kw.get("eq_deletes") == [] and fired["n"] == 0:
            fired["n"] = 1
            _write(spark, t, _rows("late", 2, pid=1), "append")
        return real_commit(table_dir, files, schema_json, **kw)

    monkeypatch.setattr(docstore, "commit_snapshot", racing_commit)
    rep = docstore.rewrite_eq_deletes(spark, t)
    monkeypatch.setattr(docstore, "commit_snapshot", real_commit)

    assert fired["n"] == 1
    assert rep["eq_files_folded"] == 1 and rep["deleted_rows"] == 2
    m = docstore.load_manifest(t)
    assert not m.get("eq_deletes")
    got = sorted(
        r["doc_id"]
        for r in spark.read.format("docstore").option("path", t).load().collect()
    )
    # eq-deleted a-0/a-1 stay gone; the racing append's rows survive
    assert got == ["a-2", "a-3", "a-4", "a-5", "late-0", "late-1"]
