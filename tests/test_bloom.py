"""Bloom-filter sketch + scalable referential path.

Contracts under test mirror the other sketch families' suites
(test_hll.py, test_tdigest.py): no false negatives ever, bounded false
positives at the documented sizing, OR-merge == build-on-union, and the
composed referential operator returning EXACTLY the plain anti-join's
rows (the property that keeps it inside the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators import bloom, referential
from anomalydetection_spark.operators.reassembly import explode_spans_meta


def test_no_false_negatives(spark):
    df = spark.range(2000).select(F.concat(F.lit("key-"), F.col("id")).alias("k"))
    blob = bloom.blob_from_df(df, "k", m_bits=1 << 16, k=5)
    n_hit = df.filter(bloom.might_contain(F.col("k"), blob)).count()
    assert n_hit == 2000  # every inserted key must test positive


def test_false_positive_rate_bounded(spark):
    inserted = spark.range(2000).select(F.concat(F.lit("in-"), F.col("id")).alias("k"))
    blob = bloom.blob_from_df(inserted, "k", m_bits=1 << 16, k=5)
    # 10k keys guaranteed disjoint from the inserted set
    probes = spark.range(10_000).select(F.concat(F.lit("out-"), F.col("id")).alias("k"))
    fp = probes.filter(bloom.might_contain(F.col("k"), blob)).count()
    # theoretical fpp at n=2000, m=2^16, k=5 is ~0.1%; assert an order of
    # magnitude of slack so the test is sizing-sensitive but not flaky
    assert fp / 10_000 < 0.01


def test_merge_equals_union_build(spark):
    a = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    b = spark.range(400, 900).select(F.col("id").cast("string").alias("k"))
    merged = bloom.merge_blobs(bloom.blob_from_df(a, "k"), bloom.blob_from_df(b, "k"))
    whole = bloom.blob_from_df(a.unionByName(b), "k")
    assert merged == whole  # OR-merge is exactly the union filter


def test_blob_roundtrip_params(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("k"))
    blob = bloom.blob_from_df(df, "k", m_bits=1 << 14, k=3, seed=42)
    m_bits, k, seed, words = bloom.unpack_blob(blob)
    assert (m_bits, k, seed) == (1 << 14, 3, 42)
    assert words.size == (1 << 14) // 64


def _spans_fixture(spark):
    """120 docs; refs drawn from m-000..m-149 against a 100-asset catalog
    → a deterministic mix of valid and dangling media_refs."""
    docs = spark.range(120).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("hello world").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("image").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.format_string("m-%03d", F.pmod(F.xxhash64("id"), F.lit(150))).alias(
                    "media_ref"
                ),
                F.lit(1).alias("offset"),
            ),
        ).alias("spans"),
        F.pmod("id", F.lit(4)).cast("int").alias("partition_id"),
    )
    media = spark.range(100).select(F.format_string("m-%03d", "id").alias("media_ref"))
    return docs, media


def test_scalable_matches_plain_anti_join(spark):
    docs, media = _spans_fixture(spark)
    exploded = explode_spans_meta(docs)
    plain = {
        (r["doc_id"], r["pos"], r["media_ref"])
        for r in referential.dangling_refs(exploded, media).collect()
    }
    scalable = {
        (r["doc_id"], r["pos"], r["media_ref"])
        for r in bloom.dangling_refs_scalable(exploded, media, m_bits=1 << 14).collect()
    }
    assert plain and scalable == plain  # non-trivial fixture, identical rows


def test_definite_dangles_skip_catalog(spark):
    """A filter built over the catalog must reject every ref outside it —
    the short-circuit that spares definitely-dangling keys the verify
    join (and with no inserted-key collisions here, blooms exactly)."""
    docs, media = _spans_fixture(spark)
    exploded = explode_spans_meta(docs)
    blob = bloom.blob_from_df(media, "media_ref", m_bits=1 << 16)
    refs = exploded.filter(F.col("media_ref").isNotNull())
    definite = refs.filter(~bloom.might_contain(F.col("media_ref"), blob))
    plain = referential.dangling_refs(exploded, media)
    # every bloom-rejected ref is truly dangling (no false negatives ⇒
    # the short-circuit can never misclassify a valid ref)
    assert definite.join(media, "media_ref", "left_semi").count() == 0
    assert definite.count() <= plain.count()
