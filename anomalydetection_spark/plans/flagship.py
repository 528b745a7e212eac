"""Flagship query: full constraint suite over a spans-shaped table derived
deterministically from the driver's flat ``documents`` parquet.

The derivation (pure column expressions, no Python) reshapes each flat doc
into the BASELINE.json input_hint shape: tokens are grouped into 5-token
chunks; every 4th chunk becomes a media span with an md5-derived media_ref
(a slice of which dangles past the derived catalog), the rest are text
spans. partition_id = doc_id % 4 stands in for the Iceberg partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anomalydetection_spark.operators import drift, reassembly
from anomalydetection_spark.plans.suite import SuiteConfig, run_suite

N_MEDIA = 100          # derived catalog size
MEDIA_REF_SPACE = 120  # refs are drawn from a larger space → some dangle
CHUNK = 5


def derive_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.ceil(F.size(toks) / CHUNK).cast("int")
    chunk_text = lambda i: F.array_join(F.slice(toks, i * CHUNK + 1, CHUNK), " ")
    ref_hash = lambda i: F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#"), i.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(MEDIA_REF_SPACE),
    )
    span = lambda i: F.when(
        F.pmod(i, F.lit(4)) == 3,
        F.struct(
            F.lit("image").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.format_string("m-%05d", ref_hash(i)).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    ).otherwise(
        F.struct(
            F.lit("text").alias("kind"),
            chunk_text(i).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        )
    )
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(F.sequence(F.lit(0), n_chunks - 1), span).alias("spans"),
        F.pmod("doc_id", F.lit(4)).cast("int").alias("partition_id"),
    )


def derived_media_assets(spark: SparkSession) -> DataFrame:
    return spark.range(N_MEDIA).select(
        F.format_string("m-%05d", F.col("id")).alias("media_ref"),
        F.lit("image").alias("media_kind"),
        (F.col("id") * 1000 + 1024).alias("n_bytes"),
    )


def flagship_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run stats+uniqueness+referential+drift+span_order on the derived
    spans table; returns the per-(partition, constraint) verdicts with the
    metrics map rendered to JSON (stable schema for the driver's check)."""
    docs = derive_spans_documents(spark, sf_dir)
    media = derived_media_assets(spark)
    baseline = drift.compute_baseline(reassembly.explode_spans_meta(docs))
    res = run_suite(docs, media, baseline, SuiteConfig(persist_exploded=True))
    return res.verdicts.select(
        "partition_id",
        "constraint",
        "passed",
        "violation_count",
        "row_count",
        F.to_json("metrics").alias("metrics_json"),
    ).orderBy("partition_id", "constraint")
