"""Canonical schemas for the validation engine.

The primary input is the interleaved text+media ``documents`` table per
BASELINE.json ``input_hint``:

    doc_id:string, spans:array<struct<kind,text,media_ref,offset>>

plus an explicit ``partition_id`` column standing in for the Iceberg
partition (bucket(doc_id) / ingest day). The reference's analog of a span
sequence is the positional-array data flow (feature matrices aligned by row
position, end_to_end_prediction.py:502-516); here order is explicit via
``offset`` so it survives shuffles.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
        T.StructField("partition_id", T.IntegerType(), False),
    ]
)

MEDIA_ASSETS_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

BASELINE_HISTOGRAMS_SCHEMA = T.StructType(
    [
        T.StructField("feature", T.StringType(), False),  # 'span_kind' | 'span_length'
        T.StructField("bucket", T.StringType(), False),
        T.StructField("p", T.DoubleType(), False),  # sums to 1 per feature
    ]
)

# Unified violation row: one row per offending doc/span per constraint.
# The reference's analog is the *dropped* rows of the frequency filter
# (preprocessing.py:10) and rows with anomaly_prediction == 1
# (end_to_end_prediction.py:590) — here they are materialized, never silent.
VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("constraint", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("pos", T.IntegerType(), True),  # span index, null for doc-level
        T.StructField("detail", T.StringType(), True),
    ]
)

# Per-partition, per-constraint verdict. The reference's analog is the
# aggregate metrics block (end_to_end_prediction.py:464-479).
VERDICTS_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("constraint", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("violation_count", T.LongType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), True),
    ]
)

# Checkpointed per-partition manifest (the engine's resume state; analog of
# the Drain FilePersistence state file, models/drain.py:48-51).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # pending|running|done
        T.StructField("row_count", T.LongType(), True),
        T.StructField("violation_count", T.LongType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("sketch_blob", T.BinaryType(), True),  # serialized t-digests
        T.StructField("hll_blob", T.BinaryType(), True),     # serialized HyperLogLog
        T.StructField("mg_blob", T.BinaryType(), True),      # serialized Misra-Gries
        T.StructField("bloom_blob", T.BinaryType(), True),   # doc_id Bloom
        T.StructField("ref_bloom_blob", T.BinaryType(), True),  # media_ref Bloom
        T.StructField("kmv_blob", T.BinaryType(), True),     # doc_id KMV theta sketch
        T.StructField("updated_at", T.StringType(), True),
    ]
)
