"""volume constraint: per-partition document-count bounds + missing-
partition detection (operators/volume.py), and its pandas-oracle golden."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark import oracle
from anomalydetection_spark.operators import volume


def _docs(spark, counts: dict[int, int]):
    rows = []
    for pid, n in counts.items():
        rows.extend((f"d{pid}-{i}", [], pid) for i in range(n))
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, partition_id int",
    )


def test_volume_bounds_and_details(spark):
    docs = _docs(spark, {0: 5, 1: 1, 2: 12})
    th = volume.VolumeThresholds(min_docs=2, max_docs=10)
    verdicts, violations = volume.check(docs, th)
    v = {r["partition_id"]: r for r in verdicts.collect()}
    assert v[0]["passed"] and v[0]["violation_count"] == 0 and v[0]["row_count"] == 5
    assert not v[1]["passed"]  # under min
    assert not v[2]["passed"]  # over max
    det = {r["partition_id"]: r["detail"] for r in violations.collect()}
    assert set(det) == {1, 2}
    assert "1 outside [2, 10]" in det[1]
    assert det[1].startswith("partition volume")
    # violations are partition-level: no doc_id / pos
    assert all(r["doc_id"] is None for r in violations.collect())


def test_volume_flags_missing_expected_partition(spark):
    docs = _docs(spark, {0: 5, 2: 5})
    expected = spark.createDataFrame([(0,), (1,), (2,)], "partition_id int")
    verdicts, violations = volume.check(
        docs, volume.VolumeThresholds(min_docs=1), expected_partitions=expected
    )
    v = {r["partition_id"]: r for r in verdicts.collect()}
    assert set(v) == {0, 1, 2}
    assert not v[1]["passed"] and v[1]["row_count"] == 0  # never arrived
    assert v[0]["passed"] and v[2]["passed"]


def test_volume_matches_pandas_oracle(spark):
    docs = _docs(spark, {0: 3, 1: 7, 2: 1})
    verdicts, _ = volume.check(docs, volume.VolumeThresholds(min_docs=2, max_docs=6))
    got = sorted(
        (r["partition_id"], r["passed"], r["violation_count"], r["row_count"])
        for r in verdicts.collect()
    )
    pdf = docs.toPandas()
    want = oracle.volume_verdicts(pdf, min_docs=2, max_docs=6)
    want_rows = sorted(
        (int(r["partition_id"]), bool(r["passed"]), int(r["violation_count"]), int(r["row_count"]))
        for _, r in want.iterrows()
    )
    assert got == want_rows


def test_volume_is_single_narrow_agg(spark):
    docs = _docs(spark, {0: 5, 1: 5})
    verdicts, _ = volume.check(docs, volume.VolumeThresholds())
    plan = spark._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        verdicts._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan and "Join" not in plan
    assert "partial_count" in plan  # map-side partials
