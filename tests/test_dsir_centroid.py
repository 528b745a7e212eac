"""Batch-9 operators: DSIR importance weights + exact class centroids.

Oracle hashes pin cross-engine values; these tests pin the semantics
(target docs score higher; centroid math matches NumPy exactly at the
fixed-point quantum) and the scale-shape plan properties.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from anomalydetection_spark.operators import similarity, textops
from anomalydetection_spark.plans import driver_queries_quality as dqq

SF = "/root/testdata/sf0.01"


def _formatted(spark, df) -> str:
    return spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_dsir_target_docs_score_highest(spark):
    # 3 docs share the target's vocabulary, 3 are off-distribution; a doc
    # mixing both lands between them
    rows = (
        [(i, "alpha beta gamma alpha beta", True) for i in range(3)]
        + [(10 + i, "zig zag zog quux blorp", False) for i in range(3)]
        + [(20, "alpha beta zig zag zog", False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {
        r["doc_id"]: r["avg_weight"]
        for r in textops.dsir_importance(df, "doc_id", "text", F.col("tgt")).collect()
    }
    # DSIR weights are a *ranking* signal for resampling — absolute sign
    # depends on the smoothing mass (B >> corpus at toy scale): assert the
    # order target > mixed > off-distribution, and a clear margin
    assert out[0] > out[20] > out[10]
    assert out[0] - out[10] > 0.5


def test_dsir_weight_table_broadcasts(spark):
    plan = _formatted(spark, dqq.dsir_importance_by_lang(spark, SF))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # bucket weights broadcast back
    assert "SortMergeJoin" not in plan


def test_centroid_matches_numpy_exactly(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    labels = (np.arange(40) % 3).astype(int)
    df = spark.createDataFrame(
        [(int(l), v.tolist()) for l, v in zip(labels, vecs)],
        "label int, embedding array<float>",
    )
    out = {r["label"]: r for r in similarity.class_centroid_stats(df, "label", "embedding").collect()}
    s = similarity.CENTROID_SCALE
    for lab in (0, 1, 2):
        sel = vecs[labels == lab].astype(np.float64)
        q = np.floor(sel * s + 0.5).astype(np.int64)
        n = len(sel)
        norm2_num = int((q.sum(axis=0).astype(object) ** 2).sum())
        assert out[lab]["n_vecs"] == n
        assert out[lab]["norm2_num"] == norm2_num  # bigint-exact
        cn = round(float(np.sqrt(norm2_num)) / (s * n), 6)
        assert abs(out[lab]["centroid_norm"] - cn) < 1e-12
        sumsq_total = int((q.astype(object) ** 2).sum())
        msd = round((n * sumsq_total - norm2_num) / (n * n * float(s) ** 2), 6)
        assert abs(out[lab]["mean_sq_dist"] - msd) < 1e-12


def test_centroid_partition_invariant(spark):
    # exact integer sums ⇒ identical output at any parallelism
    em = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = sorted(
        map(tuple, similarity.class_centroid_stats(em.coalesce(1), "label", "embedding").collect())
    )
    b = sorted(
        map(tuple, similarity.class_centroid_stats(em.repartition(16), "label", "embedding").collect())
    )
    assert a == b


def test_centroid_no_window_partial_agg(spark):
    em = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _formatted(spark, similarity.class_centroid_stats(em, "label", "embedding"))
    assert "Window" not in plan
    assert "partial_sum" in plan  # map-side partials absorb the dim fan-out
