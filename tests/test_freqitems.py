"""frequent_items constraint + Misra-Gries sketch guarantees.

Exact-path tests pin the constraint against the single-node pandas
oracle (test_operators conventions); sketch tests pin the MG
guarantees that make it safe at unbounded cardinality: heavy keys are
never lost, estimates bracket true counts, and merging partition
sketches equals sketching the whole stream (within the same bounds).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from anomalydetection_spark import oracle
from anomalydetection_spark.operators import freqitems
from anomalydetection_spark.operators.freqitems import FreqThresholds, MisraGries
from anomalydetection_spark.operators.reassembly import explode_spans_meta


def _docs_with_hot_ref(spark, hot_partition=1):
    """3 partitions × 100 docs, one media span each; partition ``hot_
    partition`` stamps the SAME media_ref on 60% of its docs (the
    boilerplate-asset failure mode), others draw from 200 refs."""
    docs = spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.lit("some words here").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("image").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.when(
                    (F.pmod("id", F.lit(3)) == hot_partition) & (F.pmod("id", F.lit(5)) < 3),
                    F.lit("m-HOT"),
                )
                .otherwise(F.format_string("m-%03d", F.pmod(F.xxhash64("id"), F.lit(200))))
                .alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
        ).alias("spans"),
        F.pmod("id", F.lit(3)).cast("int").alias("partition_id"),
    )
    return docs


def test_hot_key_fails_only_its_partition(spark):
    docs = _docs_with_hot_ref(spark)
    verdicts, violations = freqitems.check(
        explode_spans_meta(docs), FreqThresholds(max_ref_share=0.05, min_refs=50)
    )
    by_part = {r["partition_id"]: r for r in verdicts.collect()}
    assert set(by_part) == {0, 1, 2}
    assert not by_part[1]["passed"] and by_part[1]["violation_count"] == 1
    assert by_part[0]["passed"] and by_part[2]["passed"]
    assert by_part[1]["metrics"]["max_ref_share"] > 0.5
    v = violations.collect()
    assert len(v) == 1 and "m-HOT" in v[0]["detail"] and v[0]["partition_id"] == 1


def test_exact_check_vs_pandas_oracle(spark):
    docs = _docs_with_hot_ref(spark)
    pdocs = docs.toPandas()
    pdocs["spans"] = pdocs["spans"].apply(list)  # numpy array -> list for the oracle
    sp = oracle.explode(pdocs)
    want = oracle.frequent_items_verdicts(sp, max_ref_share=0.05, min_refs=50)
    got, _ = freqitems.check(
        explode_spans_meta(docs), FreqThresholds(max_ref_share=0.05, min_refs=50)
    )
    got_pd = (
        got.select("partition_id", "passed", "violation_count", "row_count")
        .toPandas()
        .sort_values("partition_id")
        .reset_index(drop=True)
    )
    want_pd = (
        want[["partition_id", "passed", "violation_count", "row_count"]]
        .sort_values("partition_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_pd, want_pd, check_dtype=False)


def test_min_refs_guards_small_partitions(spark):
    docs = _docs_with_hot_ref(spark)
    # with min_refs above the partition sizes every partition is vacuously clean
    verdicts, _ = freqitems.check(
        explode_spans_meta(docs), FreqThresholds(max_ref_share=0.05, min_refs=10_000)
    )
    assert all(r["passed"] for r in verdicts.collect())


# ---------------------------------------------------------------------------
# Misra-Gries sketch
# ---------------------------------------------------------------------------


def _zipf_stream(n=20_000, n_keys=2_000, seed=7):
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.3, size=n) % n_keys
    return pd.Series([f"k{int(k)}" for k in keys])


def test_mg_heavy_keys_never_lost():
    s = _zipf_stream()
    true = s.value_counts()
    mg = MisraGries(capacity=64)
    for chunk in np.array_split(s, 10):
        mg.add_counts(pd.Series(chunk).value_counts())
    assert mg.decremented <= len(s) / 65  # n/(c+1) bound
    for key, cnt in true.items():
        if cnt > mg.decremented:
            assert key in mg.counts, f"heavy key {key} ({cnt}) lost"
        if key in mg.counts:
            lo, hi = mg.estimate(key)
            assert lo <= cnt <= hi


def test_mg_merge_matches_single_sketch_bounds():
    s = _zipf_stream(seed=11)
    halves = np.array_split(s, 2)
    a, b = MisraGries(64), MisraGries(64)
    a.add_counts(pd.Series(halves[0]).value_counts())
    b.add_counts(pd.Series(halves[1]).value_counts())
    a.merge(b)
    true = s.value_counts()
    assert a.decremented <= len(s) / 65
    for key, cnt in true.items():
        if cnt > a.decremented:
            assert key in a.counts
        if key in a.counts:
            lo, hi = a.estimate(key)
            assert lo <= cnt <= hi


def test_mg_blob_roundtrip():
    mg = MisraGries(8)
    mg.add_counts({"a": 5, "b": 3, "c": 1})
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back.counts == mg.counts
    assert (back.capacity, back.decremented) == (mg.capacity, mg.decremented)


def test_mg_distributed_sketch(spark):
    """merged_sketch over a Spark column: the known-heavy key dominates
    and its estimate brackets the true count."""
    df = spark.range(10_000).select(
        F.when(F.pmod("id", F.lit(4)) < 2, F.lit("HEAVY"))
        .otherwise(F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(3000))))
        .alias("v")
    )
    mg = freqitems.merged_sketch(df, "v", capacity=128)
    assert mg.topk(1)[0][0] == "HEAVY"
    lo, hi = mg.estimate("HEAVY")
    assert lo <= 5000 <= hi


# hypothesis property: MG guarantees hold for ARBITRARY streams and
# arbitrary chunkings/merge orders, not just the zipf fixtures above
try:
    from hypothesis import given, settings, strategies as st

    @given(
        data=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        n_chunks=st.integers(min_value=1, max_value=5),
        capacity=st.integers(min_value=2, max_value=16),
    )
    @settings(max_examples=200, deadline=None)
    def test_mg_property_bounds(data, n_chunks, capacity):
        s = pd.Series([f"k{v}" for v in data])
        true = s.value_counts()
        chunks = np.array_split(s, n_chunks)
        mg = MisraGries(capacity)
        for ch in chunks:
            part = MisraGries(capacity)
            if len(ch):
                part.add_counts(pd.Series(ch).value_counts())
            mg.merge(part)
        assert mg.decremented <= len(s) / (capacity + 1)
        assert len(mg.counts) <= capacity
        for key, cnt in true.items():
            if cnt > mg.decremented:
                assert key in mg.counts
            lo, hi = mg.estimate(key)
            assert lo <= cnt <= hi

except ImportError:  # hypothesis is baked in, but stay import-safe
    pass


# ---------------------------------------------------------------------------
# heavy-hitter rank drift
# ---------------------------------------------------------------------------


def test_topk_rank_drift_hand_computed(spark):
    from anomalydetection_spark.operators.freqitems import topk_rank_drift

    rows = (
        [("g1", "a")] * 30 + [("g1", "b")] * 20 + [("g1", "c")] * 10
        + [("g2", "a")] * 5 + [("g2", "d")] * 40 + [("g2", "b")] * 1
    )
    df = spark.createDataFrame(rows, "g string, v string")
    got = {r["g"]: r for r in topk_rank_drift(df, "g", "v", k=3).collect()}
    # global: d=40, a=35, b=21, c=10 → base top-3 = d(1), a(2), b(3)
    g1 = got["g1"]  # top-3 a(1), b(2), c(3): shares a,b
    assert g1["n_common"] == 2 and g1["n_new"] == 1
    assert g1["rank_displacement"] == abs(1 - 2) + abs(2 - 3)
    assert g1["jaccard_ppm"] == 2 * 1_000_000 // 4
    g2 = got["g2"]  # top-3 d(1), a(2), b(3): identical to baseline
    assert g2["n_common"] == 3 and g2["n_new"] == 0
    assert g2["rank_displacement"] == 0 and g2["jaccard_ppm"] == 1_000_000


def test_topk_rank_drift_small_domain(spark):
    """Domain smaller than k: the jaccard union uses the REAL baseline
    size, and ties rank deterministically by value."""
    from anomalydetection_spark.operators.freqitems import topk_rank_drift

    df = spark.createDataFrame(
        [("g", "x"), ("g", "y")], "g string, v string"
    )
    r = topk_rank_drift(df, "g", "v", k=10).collect()[0]
    assert r["n_common"] == 2 and r["n_new"] == 0
    assert r["rank_displacement"] == 0
    assert r["jaccard_ppm"] == 1_000_000
