"""`docstore`: an Iceberg-shaped table format as a Python DataSourceV2.

The production engine targets Iceberg catalogs (sources/io.py read_table /
write_table with ``fmt='iceberg'``); this sandbox has no Iceberg runtime
jars and no network to vendor them, so this module implements the three
Iceberg properties the engine actually depends on as a from-scratch
DataSourceV2 (PySpark's Python DataSource API — planned as a real V2
``BatchScan``/``PythonScan``, not a parquet alias):

1. **snapshot-atomic commits** — every write lands data files under the
   table dir, then commits ONE manifest JSON listing them; a
   ``version-hint`` pointer file is swapped last (os.rename, atomic on
   POSIX), so readers see the old snapshot or the new one, never a
   half-written mix (the Iceberg metadata-pointer protocol,
   version-hint.text analog);
2. **manifest-driven scan planning** — `partitions()` plans one input
   split per committed data file from the manifest, never from directory
   listing (stale/abandoned files are invisible, exactly why Iceberg
   scans survive concurrent writers);
3. **file pruning from column stats** — the manifest records per-file
   min/max for ``partition_id``; pushed filters (`pushFilters`) prune
   whole files before any read, the Iceberg manifest-stats skip.

Everything inside a data file is plain parquet, written/read with
pyarrow over Arrow record batches — no per-row Python on either path.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

STATS_COLUMN = "partition_id"
_HINT = "version-hint.text"


# ---------------------------------------------------------------------------
# snapshot metadata
# ---------------------------------------------------------------------------

def _hint_path(table_dir: str) -> str:
    return os.path.join(table_dir, _HINT)


def current_version(table_dir: str) -> int:
    try:
        with open(_hint_path(table_dir)) as f:
            return int(f.read().strip())
    except OSError:
        return 0


def load_manifest(table_dir: str, version: int | None = None) -> dict:
    """Manifest of the current snapshot, or of an explicit committed
    ``version`` (time travel — the Iceberg ``VERSION AS OF`` analog).
    Requesting a version newer than the hint fails: files may exist on
    disk for an in-flight write, but only the hint swap commits them."""
    head = current_version(table_dir)
    if head == 0:
        raise FileNotFoundError(f"no committed snapshot under {table_dir}")
    v = head if version is None else int(version)
    if not (1 <= v <= head):
        raise ValueError(f"snapshot v{v} not committed (table at v{head})")
    with open(os.path.join(table_dir, f"manifest-v{v}.json")) as f:
        return json.load(f)


def snapshots(table_dir: str) -> list[dict]:
    """Committed snapshot history, oldest first: (version, n_files, rows)
    per manifest — the `.snapshots` metadata-table analog."""
    out = []
    for v in range(1, current_version(table_dir) + 1):
        m = load_manifest(table_dir, v)
        out.append(
            {
                "version": v,
                "n_files": len(m["files"]),
                "rows": sum(f["rows"] for f in m["files"]),
            }
        )
    return out


def commit_snapshot(table_dir: str, files: list[dict], schema_json: str) -> int:
    """Write manifest-v{N+1}.json then atomically swap the version hint.
    The hint rename is the commit point — a crash before it leaves the
    previous snapshot intact and the new files unreferenced (Iceberg's
    orphan files, cleaned by maintenance, never read)."""
    v = current_version(table_dir) + 1
    manifest = {"version": v, "schema": schema_json, "files": files}
    mpath = os.path.join(table_dir, f"manifest-v{v}.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    tmp = os.path.join(table_dir, f"._hint.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, _hint_path(table_dir))  # atomic commit point
    return v


# ---------------------------------------------------------------------------
# read path
# ---------------------------------------------------------------------------

@dataclass
class _FileSplit(InputPartition):
    path: str
    journal_dir: str | None


class DocStoreReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType) -> None:
        self.table_dir = options["path"]
        # optional side-channel recording which files were actually opened
        # (the pruning-evidence hook for tests; no-op unless set)
        self.journal_dir = options.get("journal") or None
        v = options.get("version")
        self.manifest = load_manifest(self.table_dir, int(v) if v is not None else None)
        self._bounds: tuple[float | None, float | None] = (None, None)
        self._in_set: set | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept range/equality/in filters on the stats column; everything
        else is returned as unsupported (Spark re-applies it post-scan, so
        pruning is an optimization, never a correctness dependency)."""
        lo, hi = self._bounds
        unsupported: list[Filter] = []
        for flt in filters:
            col = flt.attribute[0] if len(flt.attribute) == 1 else None
            if col != STATS_COLUMN:
                unsupported.append(flt)
            elif isinstance(flt, (EqualTo, EqualNullSafe)):
                lo = flt.value if lo is None else max(lo, flt.value)
                hi = flt.value if hi is None else min(hi, flt.value)
            elif isinstance(flt, (GreaterThan, GreaterThanOrEqual)):
                lo = flt.value if lo is None else max(lo, flt.value)
            elif isinstance(flt, (LessThan, LessThanOrEqual)):
                hi = flt.value if hi is None else min(hi, flt.value)
            elif isinstance(flt, In):
                s = set(flt.values)
                self._in_set = s if self._in_set is None else (self._in_set & s)
            else:
                unsupported.append(flt)
        self._bounds = (lo, hi)
        return iter(unsupported)

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self._bounds
        splits = []
        for f in self.manifest["files"]:
            fmin, fmax = f["stats"].get(STATS_COLUMN, (None, None))
            if fmin is not None:
                if lo is not None and fmax < lo:
                    continue
                if hi is not None and fmin > hi:
                    continue
                if self._in_set is not None and not any(
                    fmin <= v <= fmax for v in self._in_set
                ):
                    continue
            splits.append(_FileSplit(os.path.join(self.table_dir, f["path"]), self.journal_dir))
        # empty-scan guard: Spark requires >= 1 partition
        return splits or [_FileSplit("", None)]

    def read(self, part: _FileSplit):  # -> Iterator[pa.RecordBatch]
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not part.path:
            return
        if part.journal_dir:
            open(
                os.path.join(
                    part.journal_dir,
                    f"opened-{os.path.basename(part.path)}",
                ),
                "w",
            ).close()
        pf = pq.ParquetFile(part.path)
        expected = self._arrow_schema()
        for batch in pf.iter_batches():
            if expected is None or batch.schema.names == expected.names:
                yield batch
                continue
            # schema evolution: files written before a column was added
            # NULL-fill it; columns since dropped are projected away; order
            # follows the snapshot schema (the Iceberg name-based mapping)
            cols = []
            for field in expected:
                if field.name in batch.schema.names:
                    cols.append(batch.column(field.name))
                else:
                    cols.append(pa.nulls(batch.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(cols, schema=expected)

    def _arrow_schema(self):
        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            return to_arrow_schema(
                StructType.fromJson(json.loads(self.manifest["schema"]))
            )
        except Exception:  # pragma: no cover - conversion gap → no evolution
            return None


# ---------------------------------------------------------------------------
# write path
# ---------------------------------------------------------------------------

def _merge_schemas(old_json: str, new_json: str) -> StructType:
    """Name-based schema evolution on append (the Iceberg add-column
    rule): established columns keep their position and type (a type
    conflict fails loudly — no silent promotion); columns present on only
    one side become NULLABLE, because some committed data files will lack
    them and read back NULL-filled. Added columns append at the end in
    write order."""
    from pyspark.sql.types import StructField

    old = StructType.fromJson(json.loads(old_json))
    new = StructType.fromJson(json.loads(new_json))
    new_by_name = {f.name: f for f in new.fields}
    fields = []
    for f in old.fields:
        nf = new_by_name.pop(f.name, None)
        if nf is None:
            fields.append(StructField(f.name, f.dataType, True))
        elif nf.dataType != f.dataType:
            raise TypeError(
                f"schema evolution cannot change column '{f.name}' from "
                f"{f.dataType.simpleString()} to {nf.dataType.simpleString()}"
            )
        else:
            fields.append(StructField(f.name, f.dataType, f.nullable or nf.nullable))
    for f in new.fields:  # preserve the incoming order of added columns
        if f.name in new_by_name:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


@dataclass
class _FilesWritten(WriterCommitMessage):
    files: list  # [{path, rows, stats}]


class DocStoreWriter(DataSourceArrowWriter):
    """Arrow-batch writer: each task streams its record batches into one
    parquet file under the table dir and reports (path, rows, stats) in
    its commit message; nothing becomes visible until `commit` swaps the
    version hint on the driver."""

    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self.table_dir = options["path"]
        self.schema_json = schema.json()
        self.overwrite = overwrite
        os.makedirs(self.table_dir, exist_ok=True)

    def write(self, batches) -> _FilesWritten:
        import pyarrow as pa
        import pyarrow.parquet as pq

        name = f"data-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.table_dir, f"._tmp.{name}")
        writer = None
        rows = 0
        cmin = cmax = None
        for batch in batches:
            if writer is None:
                writer = pq.ParquetWriter(tmp, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
            if STATS_COLUMN in batch.schema.names:
                import pyarrow.compute as pc

                col = batch.column(STATS_COLUMN)
                mm = pc.min_max(col).as_py()
                if mm["min"] is not None:
                    cmin = mm["min"] if cmin is None else min(cmin, mm["min"])
                    cmax = mm["max"] if cmax is None else max(cmax, mm["max"])
        if writer is None:
            return _FilesWritten([])
        writer.close()
        os.replace(tmp, os.path.join(self.table_dir, name))
        stats = {STATS_COLUMN: [cmin, cmax]} if cmin is not None else {}
        return _FilesWritten([{"path": name, "rows": rows, "stats": stats}])

    def commit(self, messages: list[_FilesWritten]) -> None:
        files: list[dict] = []
        for m in messages:
            files.extend(m.files)
        schema_json = self.schema_json
        if not self.overwrite:
            v = current_version(self.table_dir)
            if v:
                prior = load_manifest(self.table_dir)
                files = prior["files"] + files
                schema_json = _merge_schemas(
                    prior["schema"], self.schema_json
                ).json()
        commit_snapshot(self.table_dir, files, schema_json)

    def abort(self, messages: list[_FilesWritten]) -> None:
        # uncommitted data files are invisible (manifest-driven planning);
        # best-effort cleanup of the orphans
        for m in messages:
            for f in m.files:
                try:
                    os.remove(os.path.join(self.table_dir, f["path"]))
                except OSError:
                    pass


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------

class DocStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "docstore"

    def schema(self) -> StructType:
        v = self.options.get("version")
        manifest = load_manifest(self.options["path"], int(v) if v is not None else None)
        return StructType.fromJson(json.loads(manifest["schema"]))

    def reader(self, schema: StructType) -> DocStoreReader:
        return DocStoreReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> DocStoreWriter:
        return DocStoreWriter(self.options, schema, overwrite)


def register(spark) -> None:
    """Idempotent registration of the docstore format on this session.
    Filter pushdown to Python data sources is opt-in; without it Spark
    refuses to plan a reader that implements pushFilters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocStoreDataSource)


# ---------------------------------------------------------------------------
# table maintenance: the expireSnapshots / rewriteDataFiles analogs
# ---------------------------------------------------------------------------

def expire_snapshots(table_dir: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` snapshots and delete data
    files no surviving snapshot references (Iceberg expireSnapshots +
    orphan cleanup). The current snapshot is never expired; time travel
    to expired versions fails loudly afterwards.

    Deletion order is crash-safe: manifests of expired versions are
    removed FIRST (making those versions unreadable), then data files
    referenced only by them — a crash mid-way leaves extra unreferenced
    files (invisible to manifest-driven scans), never a readable snapshot
    with missing data."""
    head = current_version(table_dir)
    keep = set(range(max(1, head - keep_last + 1), head + 1))
    expired = [v for v in range(1, head + 1) if v not in keep]
    live_files: set[str] = set()
    for v in keep:
        live_files.update(f["path"] for f in load_manifest(table_dir, v)["files"])
    dead_files: set[str] = set()
    for v in expired:
        dead_files.update(f["path"] for f in load_manifest(table_dir, v)["files"])
    dead_files -= live_files
    for v in expired:
        os.remove(os.path.join(table_dir, f"manifest-v{v}.json"))
    removed = 0
    for path in dead_files:
        try:
            os.remove(os.path.join(table_dir, path))
            removed += 1
        except OSError:
            pass
    return {"expired_versions": expired, "removed_files": removed}


def compact_snapshot(
    spark, table_dir: str, n_files: int = 1, zorder_by: list[str] | None = None
) -> int:
    """Rewrite the current snapshot's data into ``n_files`` files and
    commit the result as a NEW snapshot (Iceberg rewriteDataFiles): same
    rows, fewer files; prior snapshots stay time-travel-readable until
    expire_snapshots reclaims them. Returns the new version.

    ``zorder_by`` selects the rewriteDataFiles *zorder strategy*: rows
    are re-laid-out on the Morton-interleaved key
    (operators/layout.cluster_by_zorder) so per-file min/max stats are
    tight on EVERY named dimension — compaction and scan-skipping
    clustering in one pass."""
    df = spark.read.format("docstore").option("path", table_dir).load()
    if zorder_by:
        from pyspark.sql import functions as F

        from anomalydetection_spark.operators import layout

        df = layout.cluster_by_zorder(
            df, [F.col(c) for c in zorder_by], n_files=int(n_files)
        )
    else:
        df = df.repartition(int(n_files))
    df.write.format("docstore").option("path", table_dir).mode("overwrite").save()
    return current_version(table_dir)


def _footer_stats(path: str) -> tuple[int, dict]:
    """(rows, stats) for a data file from its parquet FOOTER only — no
    data pages read; the rewrite path builds manifest entries from this."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    rows = md.num_rows
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if STATS_COLUMN not in idx:
        return rows, {}
    cmin = cmax = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx[STATS_COLUMN]).statistics
        if st is None or not st.has_min_max:
            return rows, {}
        cmin = st.min if cmin is None else min(cmin, st.min)
        cmax = st.max if cmax is None else max(cmax, st.max)
    return rows, ({STATS_COLUMN: [cmin, cmax]} if cmin is not None else {})


def delete_where(spark, table_dir: str, condition: str) -> dict:
    """Copy-on-write row-level delete (the Iceberg ``DELETE FROM`` in COW
    mode): ONLY data files containing matching rows are rewritten without
    them; untouched files carry forward into the new snapshot by
    reference — at 100 TB a delete touching one partition rewrites that
    partition's files, not the table. Prior snapshots stay
    time-travel-readable until expire_snapshots reclaims them.

    Two bounded passes: (1) a probe scan marking which files contain
    matches (filter pushdown + footer-pruned), (2) a rewrite scan of ONLY
    the affected files. Returns {new_version, rewritten_files,
    deleted_rows}; a no-match delete commits nothing.
    """
    from pyspark.sql import functions as F

    manifest = load_manifest(table_dir)
    by_name = {f["path"]: f for f in manifest["files"]}
    paths = [os.path.join(table_dir, p) for p in by_name]
    if not paths:
        return {"new_version": manifest["version"], "rewritten_files": 0, "deleted_rows": 0}
    cond = F.expr(condition)
    probe = (
        spark.read.parquet(*paths)
        .withColumn("_file", F.input_file_name())
        .filter(cond)
        .groupBy("_file")
        .count()
        .collect()
    )
    affected = {os.path.basename(r["_file"]): r["count"] for r in probe}
    if not affected:
        return {"new_version": manifest["version"], "rewritten_files": 0, "deleted_rows": 0}
    deleted_rows = int(sum(affected.values()))
    kept_entries = [f for f in manifest["files"] if f["path"] not in affected]
    rewrite_paths = [os.path.join(table_dir, p) for p in affected]
    tmpdir = os.path.join(table_dir, f"._rewrite.{uuid.uuid4().hex}")
    spark.read.parquet(*rewrite_paths).filter(~cond).write.parquet(tmpdir)
    new_entries = []
    for fn in sorted(os.listdir(tmpdir)):
        if not fn.endswith(".parquet"):
            continue
        name = f"data-{uuid.uuid4().hex}.parquet"
        os.replace(os.path.join(tmpdir, fn), os.path.join(table_dir, name))
        rows, stats = _footer_stats(os.path.join(table_dir, name))
        if rows:
            new_entries.append({"path": name, "rows": rows, "stats": stats})
        else:
            os.remove(os.path.join(table_dir, name))
    import shutil

    shutil.rmtree(tmpdir, ignore_errors=True)
    v = commit_snapshot(table_dir, kept_entries + new_entries, manifest["schema"])
    return {
        "new_version": v,
        "rewritten_files": len(affected),
        "deleted_rows": deleted_rows,
    }


def merge_into(spark, table_dir: str, updates, key_col: str) -> dict:
    """Copy-on-write upsert (the Iceberg ``MERGE INTO ... WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT``, COW mode): rows of ``updates``
    replace same-key table rows; new keys append. ONE atomic snapshot:
    only data files containing matched keys are rewritten (minus their
    matched rows), untouched files carry forward by reference, and the
    update rows land as new files — readers see the pre-merge or
    post-merge table, never a mix.

    The matched-key probe broadcasts the update key set while it is small
    (updates are batch-sized next to the table); at larger batches swap
    the isin-literal for a broadcast semi-join — the file-granular rewrite
    shape is unchanged. Returns {new_version, rewritten_files,
    replaced_rows, upserted_rows}.
    """
    from pyspark.sql import functions as F

    manifest = load_manifest(table_dir)
    paths = [os.path.join(table_dir, f["path"]) for f in manifest["files"]]
    keys = [r[0] for r in updates.select(key_col).distinct().collect()]
    probe = (
        spark.read.parquet(*paths)
        .withColumn("_file", F.input_file_name())
        .filter(F.col(key_col).isin(keys))
        .groupBy("_file")
        .count()
        .collect()
    ) if paths else []
    affected = {os.path.basename(r["_file"]): r["count"] for r in probe}
    kept_entries = [f for f in manifest["files"] if f["path"] not in affected]
    new_entries: list[dict] = []
    tmpdir = os.path.join(table_dir, f"._merge.{uuid.uuid4().hex}")
    if affected:
        rewrite_paths = [os.path.join(table_dir, p) for p in affected]
        spark.read.parquet(*rewrite_paths).filter(
            ~F.col(key_col).isin(keys)
        ).write.parquet(os.path.join(tmpdir, "kept"))
    updates.write.parquet(os.path.join(tmpdir, "new"))
    for sub in ("kept", "new"):
        subdir = os.path.join(tmpdir, sub)
        if not os.path.isdir(subdir):
            continue
        for fn in sorted(os.listdir(subdir)):
            if not fn.endswith(".parquet"):
                continue
            name = f"data-{uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(subdir, fn), os.path.join(table_dir, name))
            rows, stats = _footer_stats(os.path.join(table_dir, name))
            if rows:
                new_entries.append({"path": name, "rows": rows, "stats": stats})
            else:
                os.remove(os.path.join(table_dir, name))
    import shutil

    shutil.rmtree(tmpdir, ignore_errors=True)
    schema_json = _merge_schemas(manifest["schema"], updates.schema.json()).json()
    v = commit_snapshot(table_dir, kept_entries + new_entries, schema_json)
    return {
        "new_version": v,
        "rewritten_files": len(affected),
        "replaced_rows": int(sum(affected.values())),
        "upserted_rows": updates.count(),
    }
