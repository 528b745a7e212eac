"""Resume semantics: kill after K of N partitions → only N−K re-validated,
final verdicts identical to a single uninterrupted run."""

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


def test_full_then_resume_identical(spark, tmp_path, inputs):
    docs, media, baseline = inputs

    # ---- uninterrupted run (golden) -------------------------------------
    golden = run_suite(docs, media, baseline)
    golden_verdicts = _verdict_key(golden.verdicts)

    # ---- run 1: validates everything ------------------------------------
    v = ResumableValidator(spark, str(tmp_path / "state"), str(tmp_path / "out"))
    s1 = v.run(docs, media, baseline)
    assert s1["validated_partitions"] == list(range(6))
    assert s1["skipped_partitions"] == []

    # ---- simulated kill: partitions 2 and 4 lose their done status ------
    v.manifest.invalidate([2, 4])

    # ---- resume: only 2 and 4 re-validated ------------------------------
    s2 = v.run(docs, media, baseline)
    assert s2["validated_partitions"] == [2, 4]
    assert sorted(s2["skipped_partitions"]) == [0, 1, 3, 5]

    # ---- final persisted verdicts == uninterrupted run ------------------
    persisted = v.verdicts().select(
        "partition_id", "constraint", "passed", "violation_count", "row_count"
    )
    assert _verdict_key(persisted) == golden_verdicts

    # ---- third run: nothing to do ---------------------------------------
    s3 = v.run(docs, media, baseline)
    assert s3["validated_partitions"] == []
    assert sorted(s3["skipped_partitions"]) == list(range(6))

    # ---- manifest carries mergeable sketch state ------------------------
    import numpy as np

    from anomalydetection_spark.operators.tdigest import TDigest

    m = {r["partition_id"]: r for r in v.manifest.read().collect()}
    merged = TDigest()
    for r in m.values():
        assert r["sketch_blob"] is not None
        merged.merge(TDigest.from_bytes(bytes(r["sketch_blob"])))
    lens = (
        docs.selectExpr("explode(spans) s")
        .selectExpr("length(s.text) l")
        .filter("l is not null")
        .toPandas()["l"]
        .to_numpy(dtype=float)
    )
    assert merged.quantile(0.5) == pytest.approx(np.percentile(lens, 50), rel=0.03)
    assert merged.quantile(0.95) == pytest.approx(np.percentile(lens, 95), rel=0.03)


def test_run_reports_appended(spark, tmp_path, inputs):
    """Each validation pass appends one bookkeeping row (the MLflow-log
    analog): full run, then a resumed 1-partition run."""
    docs, media, baseline = inputs
    v = ResumableValidator(spark, str(tmp_path / "stateR"), str(tmp_path / "outR"))
    s1 = v.run(docs, media, baseline)
    v.manifest.invalidate([3])
    s2 = v.run(docs, media, baseline)
    reports = {r["run_id"]: r for r in v.run_reports().collect()}
    assert set(reports) == {s1["run_id"], s2["run_id"]}
    assert reports[s1["run_id"]]["n_partitions_validated"] == 6
    assert reports[s2["run_id"]]["n_partitions_validated"] == 1
    assert reports[s2["run_id"]]["n_partitions_skipped"] == 5
    assert reports[s1["run_id"]]["all_passed"] is False  # injected violations


def test_resume_keeps_global_uniqueness(spark, tmp_path, inputs):
    """A duplicate pair spanning a done and a pending partition must still
    be flagged when only the pending partition is re-validated."""
    docs, media, baseline = inputs
    # construct: same doc_id in partition 0 (done) and partition 1 (pending)
    extra = spark.createDataFrame(
        [
            ("xdup-1", [("text", "a b", None, 0)], 0),
            ("xdup-1", [("text", "c d", None, 0)], 1),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, partition_id int",
    )
    docs2 = docs.unionByName(extra)
    v = ResumableValidator(spark, str(tmp_path / "state2"), str(tmp_path / "out2"))
    v.run(docs2, media, baseline)
    v.manifest.invalidate([1])
    s = v.run(docs2, media, baseline)
    assert s["validated_partitions"] == [1]
    viol = v.violations().filter(
        (F.col("constraint") == "uniqueness") & (F.col("doc_id") == "xdup-1")
    )
    parts = sorted(r["partition_id"] for r in viol.collect())
    assert parts == [0, 1]


def test_pending_filter_anti_joins_above_threshold(spark, tmp_path):
    """A resume over a 10⁴-done-partition manifest must plan the pending
    filter as a broadcast anti-join against the manifest frame, never a
    10⁴-term In literal (round-3 verdict minor 4b)."""
    from anomalydetection_spark.plans.manifest import (
        ManifestStore,
        pending_partition_filter,
    )

    store = ManifestStore(spark, str(tmp_path / "bigstate"))
    n_done = 10_000
    store.mark_done(
        [
            {"partition_id": p, "row_count": 1, "violation_count": 0, "passed": True}
            for p in range(n_done)
        ],
        run_id="seed",
    )
    done = store.done_partitions()
    assert len(done) == n_done

    docs = spark.range(0, 11_000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("int").alias("partition_id")
    )
    pending = pending_partition_filter(docs, done, store.read())
    plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        pending._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin LeftAnti" in plan
    assert " IN (" not in plan
    assert pending.count() == 1_000  # exactly the not-done partitions

    # small done sets keep the source-prunable In literal
    small = pending_partition_filter(docs, {1, 2, 3}, store.read())
    small_plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        small._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in small_plan
    assert small.count() == 11_000 - 3


def test_pending_filter_branches_agree_on_null_partitions(spark, tmp_path):
    """NULL-partition docs are PENDING on BOTH plan branches: a bare
    ``NOT IN`` evaluates to NULL for NULL keys and used to silently drop
    them from the In-literal branch while the anti-join branch kept them,
    so resumed verdicts depended on the done-count (round-4 verdict minor
    3b). Both branches must return byte-identical pending sets."""
    from anomalydetection_spark.plans.manifest import (
        ManifestStore,
        pending_partition_filter,
    )

    store = ManifestStore(spark, str(tmp_path / "nullstate"))
    store.mark_done(
        [
            {"partition_id": p, "row_count": 1, "violation_count": 0, "passed": True}
            for p in range(8)
        ],
        run_id="seed",
    )
    done = store.done_partitions()

    docs = spark.createDataFrame(
        [(f"d{i}", i if i < 10 else None) for i in range(12)],
        "doc_id string, partition_id int",
    )
    # force each branch with the isin_max knob on the same inputs
    isin_branch = pending_partition_filter(docs, done, store.read(), isin_max=10**6)
    anti_branch = pending_partition_filter(docs, done, store.read(), isin_max=0)
    isin_rows = sorted((r["doc_id"], r["partition_id"]) for r in isin_branch.collect())
    anti_rows = sorted((r["doc_id"], r["partition_id"]) for r in anti_branch.collect())
    assert isin_rows == anti_rows
    # the NULL-partition docs (d10, d11) are pending on both branches
    expected = [("d10", None), ("d11", None), ("d8", 8), ("d9", 9)]
    assert isin_rows == expected


def test_bloom_bounds_resumed_uniqueness_scope(spark, tmp_path, inputs):
    """On resume, the global-uniqueness job scans only pending partitions
    plus finished partitions whose stored doc_id Blooms contain a pending
    doc_id — with verdicts identical to the full rescan (round-3 verdict
    ask #7).

    Needs a CLEAN table (the violation fixture injects hot-key dups into
    EVERY partition, where widening to the full scope is the correct
    answer — covered below): per-partition-unique doc_ids, plus one
    injected 0↔5 duplicate, must pull exactly partition 0 back in."""
    docs, media, baseline = inputs
    clean = generate_documents(spark, clean_config(CFG))
    extra = spark.createDataFrame(
        [
            ("bdup-9", [("text", "a b", None, 0)], 0),
            ("bdup-9", [("text", "c d", None, 0)], 5),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, partition_id int",
    )
    docs2 = clean.unionByName(extra).cache()
    golden = run_suite(docs2, media, baseline)

    v = ResumableValidator(spark, str(tmp_path / "stateB"), str(tmp_path / "outB"))
    first = v.run(docs2, media, baseline)
    assert first["uniqueness_scope_partitions"] is None  # nothing done yet
    v.manifest.invalidate([5])
    s = v.run(docs2, media, baseline)
    assert s["validated_partitions"] == [5]
    # pending partition 5 + the one finished partition sharing a doc_id;
    # partitions 1-4 are provably disjoint and skipped
    assert s["uniqueness_scope_partitions"] == [0, 5]
    # reduced scope, identical verdicts for the re-validated partition
    assert _verdict_key(v.verdicts().filter("partition_id = 5")) == _verdict_key(
        golden.verdicts.filter("partition_id = 5")
    )
    docs2.unpersist()

    # the violation fixture injects pair/hot dups across partitions — the
    # probe must return a SUPERSET of the partitions that truly share a
    # doc_id with pending partition 5 (no false negatives; fp may widen)
    dirty, _, _ = inputs
    p5_ids = dirty.filter("partition_id = 5").select("doc_id").distinct()
    truly_sharing = {
        r["partition_id"]
        for r in dirty.join(p5_ids, "doc_id", "left_semi")
        .select("partition_id")
        .distinct()
        .collect()
    }
    v2 = ResumableValidator(spark, str(tmp_path / "stateB2"), str(tmp_path / "outB2"))
    v2.run(dirty, media, baseline)
    v2.manifest.invalidate([5])
    s2 = v2.run(dirty, media, baseline)
    assert truly_sharing <= set(s2["uniqueness_scope_partitions"])


def test_manifest_pointer_swap_never_leaves_gap(spark, tmp_path):
    """mark_done publishes a new version dir then flips a pointer file —
    the previously-published manifest stays readable under its own dir
    until the pointer moves, so no reader ever sees an empty state_dir."""
    from pathlib import Path

    from anomalydetection_spark.plans.manifest import ManifestStore

    store = ManifestStore(spark, str(tmp_path / "state"))
    (tmp_path / "state").mkdir()
    store.mark_done(
        [{"partition_id": 0, "row_count": 10, "violation_count": 0, "sketch_blob": None}],
        run_id="r1",
    )
    ptr = Path(tmp_path / "state" / ManifestStore.POINTER)
    assert ptr.exists()
    v1 = ptr.read_text().strip()
    assert (tmp_path / "state" / v1).exists()
    assert store.read().count() == 1

    # second publish: pointer flips to a new version, old version GC'd
    store.mark_done(
        [{"partition_id": 1, "row_count": 20, "violation_count": 2, "sketch_blob": None}],
        run_id="r2",
    )
    v2 = ptr.read_text().strip()
    assert v2 != v1
    assert not (tmp_path / "state" / v1).exists()
    m = store.read()
    assert m.count() == 2
    assert {r["partition_id"] for r in m.collect()} == {0, 1}


def test_latest_and_best_run_selection(spark, tmp_path):
    """search_runs analog: latest-by-time and best-by-metric over the
    run_reports history (max_by aggregate, no sort)."""
    from anomalydetection_spark.plans.manifest import ResumableValidator

    v = ResumableValidator(spark, str(tmp_path / "st"), str(tmp_path / "out"))
    rows = [
        ("r1", "2026-08-01T10:00:00+00:00", 4, 0, 100, 7, False),
        ("r2", "2026-08-02T10:00:00+00:00", 4, 0, 100, 3, False),
        ("r3", "2026-08-03T10:00:00+00:00", 2, 2, 100, 3, False),  # ties r2 on metric, newer
        ("r4", "2026-08-02T12:00:00+00:00", 4, 0, 100, 9, False),
    ]
    spark.createDataFrame(
        rows,
        "run_id string, finished_at string, n_partitions_validated int, "
        "n_partitions_skipped int, row_count long, violation_count long, all_passed boolean",
    ).write.mode("overwrite").parquet(str(tmp_path / "out" / "run_reports"))

    assert v.latest_run().first()["run_id"] == "r3"
    assert v.best_run("violation_count").first()["run_id"] == "r3"   # tie → newest
    assert v.best_run("violation_count", ascending=False).first()["run_id"] == "r4"
    assert v.best_run("row_count", ascending=False).first()["run_id"] == "r3"  # tie → newest


def test_hll_blobs_merge_to_global_distinct(spark, tmp_path, inputs):
    """Second sketch family (X2/S8/A12): per-partition media_ref HLLs in
    the manifest merge to a global distinct estimate without rescanning —
    and the estimate tracks the exact distinct count within HLL error."""
    from anomalydetection_spark.operators.hll import HLL
    from anomalydetection_spark.operators.reassembly import explode_spans_meta
    from anomalydetection_spark.plans.manifest import ResumableValidator

    docs, media, baseline = inputs
    v = ResumableValidator(spark, str(tmp_path / "st"), str(tmp_path / "out"))
    v.run(docs, media, baseline)
    m = v.manifest.read()
    blobs = [bytes(r["hll_blob"]) for r in m.collect() if r["hll_blob"] is not None]
    assert len(blobs) == 6  # one per partition

    merged = HLL()
    for b in blobs:
        merged.merge(HLL.from_bytes(b))
    exact = (
        explode_spans_meta(docs)
        .filter("media_ref IS NOT NULL")
        .select("media_ref")
        .distinct()
        .count()
    )
    est = merged.estimate()
    assert abs(est - exact) / exact < 0.1, (est, exact)


def test_mg_blobs_merge_to_global_heavy_hitters(spark, tmp_path, inputs):
    """Fourth sketch family: per-partition media_ref Misra-Gries summaries
    in the manifest merge to a global heavy-hitter view without rescans —
    the top merged key matches the exact global top key, and its estimate
    brackets the exact count."""
    from anomalydetection_spark.operators.freqitems import MisraGries
    from anomalydetection_spark.operators.reassembly import explode_spans_meta
    from anomalydetection_spark.plans.manifest import ResumableValidator
    from pyspark.sql import functions as F

    docs, media, baseline = inputs
    v = ResumableValidator(spark, str(tmp_path / "st"), str(tmp_path / "out"))
    v.run(docs, media, baseline)
    m = v.manifest.read()
    blobs = [bytes(r["mg_blob"]) for r in m.collect() if r["mg_blob"] is not None]
    assert len(blobs) == 6  # one per partition

    merged = MisraGries()
    for b in blobs:
        merged.merge(MisraGries.from_bytes(b))
    exact = (
        explode_spans_meta(docs)
        .filter("media_ref IS NOT NULL")
        .groupBy("media_ref")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "media_ref")
        .limit(1)
        .first()
    )
    top_key, top_n = merged.topk(1)[0]
    lo, hi = merged.estimate(exact["media_ref"])
    assert lo <= exact["n"] <= hi
    # with per-partition capacity far above the distinct-ref count the
    # sketch is exact, so the merged top key is the true top key
    assert top_key == exact["media_ref"]


def test_sketch_blobs_single_scan_and_family_parity(spark, tmp_path, inputs):
    """The manifest's sketch phase computes all three blob families in ONE
    pass: the fused plan contains exactly one scan of the docs relation
    (the per-family composition used to run three jobs, each rescanning
    every pending partition). HLL blobs are bit-identical to the
    per-family builder; t-digest quantiles and MG bounds honor the same
    contracts."""
    import numpy as np

    from anomalydetection_spark.operators.freqitems import MisraGries, group_mgs
    from anomalydetection_spark.operators.hll import group_hlls
    from anomalydetection_spark.operators.tdigest import TDigest
    from anomalydetection_spark.plans.manifest import group_sketch_blobs

    docs, media, baseline = inputs
    path = str(tmp_path / "docs_pq")
    docs.write.parquet(path)
    meta = reassembly.explode_spans_meta(spark.read.parquet(path)).select(
        "doc_id", "partition_id", "text_len", "media_ref"
    )

    fused = group_sketch_blobs(meta)
    plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        fused._jdf.queryExecution(), "formatted"
    )
    import re

    # one scan NODE: formatted explain names each node twice (tree line +
    # detail header), so count the numbered detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan

    rows = {r["partition_id"]: r for r in fused.collect()}
    assert sorted(rows) == list(range(6))

    # HLL: register-max merge is order-independent → bytes identical
    hll_ref = {
        r["partition_id"]: bytes(r["hll"])
        for r in group_hlls(meta, "media_ref", ["partition_id"]).collect()
    }
    assert {p: bytes(r["hll"]) for p, r in rows.items()} == hll_ref

    # t-digest: same quantile accuracy as the per-family contract
    lens = meta.filter("text_len IS NOT NULL").toPandas()
    for pid, r in rows.items():
        td = TDigest.from_bytes(bytes(r["digest"]))
        part = lens[lens["partition_id"] == pid]["text_len"].to_numpy(dtype=float)
        assert td.quantile(0.5) == pytest.approx(np.percentile(part, 50), rel=0.05)

    # MG: estimate brackets the exact per-partition top count
    refs = meta.filter("media_ref IS NOT NULL").toPandas()
    for pid, r in rows.items():
        mg = MisraGries.from_bytes(bytes(r["mg"]))
        counts = refs[refs["partition_id"] == pid]["media_ref"].value_counts()
        top_key, top_n = counts.index[0], int(counts.iloc[0])
        lo, hi = mg.estimate(top_key)
        assert lo <= top_n <= hi


def test_metadata_partition_list_arms_missing_partition_volume(spark, tmp_path, inputs):
    """A partition the metastore lists but the scan never produces must
    surface as a volume FAIL (n_docs=0) instead of silently not existing —
    the metadata-driven partition_ids path arms operators/volume.py's
    expected_partitions hook."""
    docs, media, baseline = inputs
    present = docs.filter(F.col("partition_id") != 3)  # partition 3 lost upstream
    v = ResumableValidator(spark, str(tmp_path / "state"), str(tmp_path / "out"))
    info = v.run(present, media, baseline, partition_ids=[0, 1, 2, 3, 4, 5])
    assert 3 in info["validated_partitions"]
    vol = {
        r["partition_id"]: r
        for r in v.verdicts().filter("constraint = 'volume'").collect()
    }
    assert not vol[3]["passed"] and vol[3]["row_count"] == 0
    assert all(vol[p]["passed"] for p in (0, 1, 2, 4, 5))


def test_quantile_drift_report_from_stored_blobs(spark, tmp_path, inputs):
    """Sketch-side drift over validated partitions: self-baseline (merged
    from the run's own blobs) flags nothing; a scaled baseline flags
    every partition — no raw-row rescan, only manifest state."""
    from anomalydetection_spark.operators.tdigest import TDigest

    docs, media, baseline = inputs
    v = ResumableValidator(spark, str(tmp_path / "state"), str(tmp_path / "out"))
    v.run(docs, media, baseline)

    merged = TDigest()
    rows = v.manifest.read().collect()
    for r in rows:
        merged.merge(TDigest.from_bytes(bytes(r["sketch_blob"])))

    clean = {r["partition_id"]: r for r in v.quantile_drift_report(merged.to_bytes()).collect()}
    assert len(clean) == len(rows)
    # the length-drift-injected partition (CFG drift_partitions=(5,)) is a
    # REAL quantile shift and must flag even against the self-baseline;
    # the clean partitions stay under the bound
    assert clean[5]["flagged"] is True
    for pid in range(5):
        assert clean[pid]["flagged"] is False, clean[pid]
        assert clean[pid]["max_rel_gap"] < 0.2

    # baseline from a different regime: every quantile ~2x the observed
    import numpy as np

    shifted = TDigest()
    lens = (
        docs.selectExpr("explode(spans) s")
        .selectExpr("length(s.text) l")
        .filter("l is not null")
        .toPandas()["l"]
        .to_numpy(dtype=float)
    )
    shifted.add(lens * 2.0)
    hot = {r["partition_id"]: r for r in v.quantile_drift_report(shifted.to_bytes()).collect()}
    assert all(r["flagged"] for r in hot.values())


def test_overlap_report_from_stored_kmv_blobs(spark, tmp_path, inputs):
    """Cross-partition doc_id overlap from the manifest's KMV blobs alone
    (no corpus rescan): with < k distinct ids per partition the sketches
    are exact, so the report must equal the true pairwise overlap — the
    quantitative complement of the Bloom ripple's yes/no probe."""
    docs, media, baseline = inputs
    v = ResumableValidator(spark, str(tmp_path / "stateK"), str(tmp_path / "outK"))

    # no runs yet -> empty frame, not an error
    assert v.overlap_report().count() == 0

    v.run(docs, media, baseline)
    got = {
        (r["partition_a"], r["partition_b"]): r
        for r in v.overlap_report().collect()
    }

    ids = docs.select("partition_id", "doc_id").distinct()
    a, b = ids.alias("a"), ids.alias("b")
    truth = {
        (r["pa"], r["pb"]): r["n"]
        for r in a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.partition_id") < F.col("b.partition_id")),
        )
        .groupBy(
            F.col("a.partition_id").alias("pa"),
            F.col("b.partition_id").alias("pb"),
        )
        .agg(F.countDistinct("a.doc_id").alias("n"))
        .collect()
    }
    assert truth, "fixture should inject cross-partition duplicate doc_ids"
    assert set(got) == set(truth)
    exact_distinct = {
        r["partition_id"]: r["n"]
        for r in ids.groupBy("partition_id")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    for (pa, pb), r in got.items():
        assert r["est_common"] == truth[(pa, pb)]
        assert r["est_distinct_a"] == exact_distinct[pa]
        assert r["est_distinct_b"] == exact_distinct[pb]

    # min_est filters: a bound above every true overlap empties the report
    assert v.overlap_report(min_est=max(truth.values()) + 1).count() == 0


def test_zero_span_doc_still_bounds_resumed_uniqueness(spark, tmp_path):
    """Regression: a cross-partition duplicate whose done-side copy has
    ZERO spans must still be found by a resumed run. The doc-identity
    blobs (Bloom/KMV) are built with outer explode, so span-less docs
    reach the done partition's Bloom and the uniqueness scope probe
    pulls that partition in — an inner-exploded blob would skip it and
    the resumed verdict would silently diverge from the full scan."""
    from anomalydetection_spark.schema import DOCUMENTS_SCHEMA

    def span(i):
        return ("text", f"span {i}", None, i)

    rows = [
        ("dup-X", [], 0),                      # zero-span copy, partition 0
        ("solo-A", [span(0)], 0),
        ("dup-X", [span(0), span(1)], 1),      # spanned copy, partition 1
        ("solo-B", [span(0)], 1),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    media = spark.createDataFrame(
        [], "media_ref string, media_kind string, n_bytes long"
    )
    from anomalydetection_spark.operators import drift, reassembly

    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))

    golden = _verdict_key(run_suite(docs, media, baseline).verdicts)

    v = ResumableValidator(spark, str(tmp_path / "stateZ"), str(tmp_path / "outZ"))
    v.run(docs, media, baseline)
    v.manifest.invalidate([1])
    s = v.run(docs, media, baseline)
    assert s["validated_partitions"] == [1]
    # the probe must have pulled partition 0 (the zero-span copy) into scope
    assert 0 in (s["uniqueness_scope_partitions"] or [])
    assert _verdict_key(v.verdicts()) == golden
    uniq = {
        r["partition_id"]: r["passed"]
        for r in v.verdicts().filter("constraint = 'uniqueness'").collect()
    }
    assert uniq == {0: False, 1: False}


def test_doc_identity_sketches_gated_on_first_span_row(spark, tmp_path, inputs):
    """The fused sketch scan hashes doc identity ONCE per doc (gated on
    pos == 0 / NULL) instead of once per span; the gated blobs must be
    bit-identical to ungated ones, and the manifest KMV blob must equal
    the operator-built sketch over the same docs (algebra compatibility:
    exact int64 hashes survive the Arrow crossing — a float64 leak would
    round 60-bit hashes and silently diverge here)."""
    from anomalydetection_spark.operators.kmv import KMV
    from anomalydetection_spark.operators.kmv import collect_kmvs
    from anomalydetection_spark.plans.manifest import group_sketch_blobs

    docs, _, _ = inputs
    meta_pos = reassembly.explode_spans_meta(docs, outer=True).select(
        "doc_id", "partition_id", "pos", "text_len", "media_ref"
    )
    meta_nopos = reassembly.explode_spans_meta(docs, outer=True).select(
        "doc_id", "partition_id", "text_len", "media_ref"
    )
    gated = {r["partition_id"]: r for r in group_sketch_blobs(meta_pos).collect()}
    ungated = {r["partition_id"]: r for r in group_sketch_blobs(meta_nopos).collect()}
    assert set(gated) == set(ungated)
    for pid in gated:
        assert bytes(gated[pid]["bloom"]) == bytes(ungated[pid]["bloom"])
        assert bytes(gated[pid]["kmv"]) == bytes(ungated[pid]["kmv"])

    # manifest KMV == operator-built KMV over the document-level frame
    op = collect_kmvs(docs, "doc_id", ["partition_id"], k=512)
    for pid in gated:
        assert bytes(gated[pid]["kmv"]) == op[(pid,)].to_bytes()
