"""Streaming write-audit-publish sink: continuous gated ingestion.

``foreachBatch`` → :func:`plans.wap.write_audit_publish` — every arriving
micro-batch is STAGED on its own audit branch, validated, and published
to the docstore table's main branch only if green. A red micro-batch is
quarantined as its surviving audit branch (drill-down via
``.option('ref', 'wap-batch-N')``) while the stream keeps flowing — bad
data delays nothing and corrupts nothing, because it was never visible.

This closes the loop with streaming/validate_stream.start_cdc_validation
_stream: that consumer validates what a table ALREADY accepted (detect);
this sink validates BEFORE acceptance (prevent). Together they are the
reference pipeline's train-time/score-time split re-expressed as table
lifecycle: the CDC validator is the monitoring pass, the WAP sink the
admission gate.

Exactly-once under at-least-once replay: ``foreachBatch`` re-runs a
micro-batch when the stream crashes between the batch's side effects and
its offset-checkpoint commit. The publish marker makes the replay a
no-op: every published batch's snapshot is TAGGED ``<marker>N`` in the
SAME commit that fast-forwards main (docstore.fast_forward's atomic
refs_update), so a replayed batch sees the tag and skips. A replay of a
crashed UNPUBLISHED attempt drops the half-staged branch and re-stages —
deterministic inputs produce the same verdict, so blocked stays blocked.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from anomalydetection_spark.plans.suite import SuiteConfig
from anomalydetection_spark.plans.wap import write_audit_publish
from anomalydetection_spark.sources import docstore as ds


def wap_foreach_batch(
    table_dir: str,
    media: DataFrame,
    baseline: DataFrame,
    cfg: SuiteConfig = SuiteConfig(),
    constraints: tuple[str, ...] | list[str] | None = None,
    branch_prefix: str = "wap-batch-",
    marker_prefix: str = "published-batch-",
    on_result=None,
):
    """Build the ``foreachBatch`` callable. ``on_result(batch_id, res)``
    observes every audited batch (default: one JSON line to stdout)."""

    def _fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        marker = f"{marker_prefix}{batch_id}"
        branch = f"{branch_prefix}{batch_id}"
        refs = ds.table_refs(table_dir)
        if marker in refs:
            # replayed after a crash that followed the publish: the marker
            # tag landed atomically with it, so this batch is already in
            if branch in refs:  # crash fell between publish and branch drop
                ds.drop_ref(table_dir, branch)
            return
        if branch in refs:
            # replayed after a crash mid-stage/mid-audit: the half-staged
            # branch was never published — drop and re-stage
            ds.drop_ref(table_dir, branch)
        res = write_audit_publish(
            spark, table_dir, batch, media, baseline,
            cfg=cfg, constraints=constraints,
            branch=branch, publish_tag=marker,
        )
        report = {
            "batch_id": batch_id,
            **{k: res[k] for k in (
                "published", "branch", "staged_version",
                "published_version", "audited_partitions", "n_violations",
            )},
        }
        if on_result is not None:
            on_result(batch_id, res)
        else:
            print(json.dumps(report))

    return _fn


def start_wap_ingest_stream(
    spark: SparkSession,
    source: DataFrame,
    table_dir: str,
    media: DataFrame,
    baseline: DataFrame,
    checkpoint_dir: str,
    cfg: SuiteConfig = SuiteConfig(),
    constraints: tuple[str, ...] | list[str] | None = None,
    on_result=None,
):
    """Attach the WAP admission gate to any streaming ``source`` of
    document rows (file source, Kafka-decoded frame, rate-generated test
    feed — anything with the documents schema). Returns the started
    StreamingQuery; stop via ``.stop()`` or drain with
    ``trigger(availableNow=True)`` upstream."""
    ds.register(spark)
    return (
        source.writeStream.foreachBatch(
            wap_foreach_batch(
                table_dir, media, baseline, cfg=cfg,
                constraints=constraints, on_result=on_result,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("wap-ingest")
        .start()
    )
