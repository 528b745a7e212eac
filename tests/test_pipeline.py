"""Reference-pipeline analog: parse → template → filter → embed → verdict."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark import pipeline


@pytest.fixture(scope="module")
def raw_logs(spark):
    lines = []
    # 9+ token structured lines; label token first (drain.py format)
    # non-numeric word variation so masking yields MULTIPLE templates
    # (identical templates → identical embeddings → degenerate threshold)
    kinds = ["parity", "ecc", "torus", "fanin", "cache"]
    for i in range(200):
        label = "-" if i % 10 else "ALERT"
        node = f"node{i % 4}"
        kind = kinds[i % 5] if i % 10 else "alertpath failure severe"
        lines.append(
            f"{label} 117838570{i % 10} 2005.06.03 {node} Jun 3 15:42:5{i % 10} "
            f"RAS KERNEL INFO instruction {kind} error corrected count {i}"
        )
    lines.append("- short line")          # <9 tokens after label strip
    lines.append("ALERT 0x1f node bad")   # malformed short
    return spark.createDataFrame([(l,) for l in lines], "value string").cache()


def test_parse_labels_and_fields(raw_logs):
    parsed = pipeline.parse_logs(raw_logs)
    assert parsed.filter("label = 1").count() == 21  # 20 ALERT + malformed ALERT
    short = parsed.filter(F.col("log") == "short line").collect()[0]
    assert short["Timestamp"] == "" and short["Content"] == ""
    full = parsed.filter(F.col("Content") != "").limit(1).collect()[0]
    # positional layout: "Jun 3 15:42:5x" spans Time..Type, then RAS KERNEL
    assert full["Component"] == "RAS" and full["Level"] == "KERNEL"
    assert full["Content"].startswith("INFO ")


def test_mine_templates_masks_and_params(raw_logs):
    t = pipeline.mine_templates(pipeline.parse_logs(raw_logs))
    row = t.filter(F.col("Content").contains("count 7")).limit(1).collect()[0]
    assert row["template"].endswith("count <*>")
    assert "7" in row["params"].values()
    # 5 normal word-variants + 1 alert variant
    assert t.filter(F.col("template") != "").select("template").distinct().count() == 6


def test_frequency_filter_materializes_dropped(raw_logs):
    t = pipeline.mine_templates(pipeline.parse_logs(raw_logs))
    kept, dropped = pipeline.frequency_filter(t, threshold=5)
    assert kept.count() == 200
    assert dropped.count() == 2   # the two odd lines (template counts 1)


def test_embed_deterministic_and_shaped(raw_logs):
    t = pipeline.mine_templates(pipeline.parse_logs(raw_logs)).limit(20)
    a = {r["log"]: list(r["embedding"]) for r in pipeline.embed(t).collect()}
    b = {r["log"]: list(r["embedding"]) for r in pipeline.embed(t.repartition(5)).collect()}
    assert a == b
    assert all(len(v) == pipeline.EMBED_DIM for v in a.values())


def test_end_to_end_metrics(raw_logs):
    res = pipeline.run_pipeline(raw_logs, freq_threshold=5, pct=0.95)
    m = res["metrics"].collect()[0]
    assert m["n"] == 200
    assert m["tp"] + m["fp"] + m["fn"] + m["tn"] == 200
    # 95th-pct threshold → ~5% flagged
    assert 0 < m["n_anomalies"] <= 20
    v = res["verdicts"]
    assert v.filter("anomaly_prediction = 1").count() == m["n_anomalies"]
    # final report: keyed projection + cardinality/agreement checks (J3/J4)
    report = res["report"]
    checks = res["report_checks"].collect()[0]
    assert report.count() == checks["n_rows"] == 200
    assert checks["n_flagged"] == m["n_anomalies"]
    assert 0.0 <= checks["label_agreement_rate"] <= 1.0
    assert set(report.columns) == {
        "label", "log", "template", "params", "anomaly_score", "anomaly_prediction"
    }


def test_generalize_templates_merge_and_overflow(spark):
    """Drain-refinement analog: same-key templates differing in ≤K token
    positions merge (disagreeing positions → <*>); a group needing more
    than K new wildcards stays unmerged."""
    from anomalydetection_spark import pipeline

    rows = [
        # group A (5 tokens, 'get file', end 'ok'): differs only at pos 3 → merge
        ("get file alpha from ok", 10),
        ("get file beta from ok", 5),
        # group B: differs at 3 positions → exceeds max_wildcards=2, kept apart
        ("put obj a b c d end", 3),
        ("put obj x y z d end", 4),
        # singleton
        ("delete tmp now", 7),
    ]
    df = spark.createDataFrame(rows, "template string, n long")
    out = {r["template"]: (r["n_templates_merged"], r["n_events"])
           for r in pipeline.generalize_templates(df, max_wildcards=2).collect()}
    assert out["get file <*> from ok"] == (2, 15)
    assert out["put obj a b c d end"] == (1, 3)
    assert out["put obj x y z d end"] == (1, 4)
    assert out["delete tmp now"] == (1, 7)
    assert len(out) == 4


def test_embed_loader_contract_load_once_batch_sized(spark, raw_logs, tmp_path):
    """The model swap point (pipeline.embed ``loader=``) honors two
    contracts a real transformer checkpoint depends on:

    1. load-once-per-executor-process: a reused python worker running many
       tasks loads the model once (process-level _MODEL_CACHE), so a GB-
       sized checkpoint is not re-read per task;
    2. batch-sized calls: the model sees whole Arrow batches (one matmul
       per batch), never per-row invocations.

    Evidenced by a counting fake that journals loads and matmul batch
    sizes to a shared directory (local mode: workers share the FS)."""
    import glob
    import os
    import uuid

    import numpy as np

    journal = str(tmp_path / "model_journal")
    os.makedirs(journal, exist_ok=True)

    class CountingModel:
        # refuse numpy coercion so `batch @ model` defers to __rmatmul__
        __array_ufunc__ = None

        def __init__(self, mat, journal):
            self.mat = mat
            self.journal = journal
            self.shape = mat.shape

        def __rmatmul__(self, batch):
            fn = f"{self.journal}/call-{os.getpid()}-{uuid.uuid4().hex}"
            with open(fn, "w") as f:
                f.write(str(batch.shape[0]))
            return batch @ self.mat

    def counting_loader(dim):
        rng = np.random.default_rng(42)
        mat = rng.standard_normal((1024, dim)).astype(np.float32)
        with open(f"{journal}/load-{os.getpid()}-{uuid.uuid4().hex}", "w") as f:
            f.write("1")
        return CountingModel(mat, journal)

    # pin the journal path through pickling (closures re-unpickle per task)
    counting_loader.__qualname__ = f"counting_loader_{uuid.uuid4().hex}"

    t = (
        pipeline.mine_templates(pipeline.parse_logs(raw_logs))
        .select("template", "log")
        .repartition(1)  # one worker → cross-task cache is observable
        .cache()
    )
    t.count()
    out1 = pipeline.embed(t, loader=counting_loader)
    out2 = pipeline.embed(t, loader=counting_loader)
    n_rows = t.count()
    rows1 = out1.collect()  # task 1
    rows2 = out2.collect()  # task 2, same worker via reuse

    loads = glob.glob(f"{journal}/load-*")
    calls = glob.glob(f"{journal}/call-*")
    load_pids = {os.path.basename(p).split("-")[1] for p in loads}
    call_pids = {os.path.basename(p).split("-")[1] for p in calls}
    # THE load-once contract: no worker process ever loaded the model
    # twice, however Spark scheduled the two tasks across its worker pool
    # (cross-task cache reuse under many-tasks-few-workers is pinned in
    # test_multimodal's sibling contract test)
    assert len(loads) == len(load_pids)
    assert call_pids <= load_pids
    # batch-sized calls: every call covers many rows; totals match 2 passes
    sizes = [int(open(p).read()) for p in calls]
    assert sum(sizes) == 2 * n_rows
    assert len(sizes) < 2 * n_rows
    assert min(sizes) > 1
    # fake model output matches the default loader bit-for-bit (same seed)
    want = {r["log"]: r["embedding"] for r in pipeline.embed(t).collect()}
    assert {r["log"]: r["embedding"] for r in rows1} == want
    assert {r["log"]: r["embedding"] for r in rows2} == want
