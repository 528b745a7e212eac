"""UDTF surface: SQL-callable table functions agree with the JVM bulk
paths they mirror."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.functions.udtfs import register_udtfs
from anomalydetection_spark.operators.dedup import shingle_rows


def test_shingle_udtf_matches_jvm_bulk_path(spark):
    register_udtfs(spark)
    docs = spark.createDataFrame(
        [
            ("d1", "the quick brown fox jumps"),
            ("d2", "one two"),  # shorter than k=3 → no shingles
            ("d3", "a b c"),
        ],
        "doc_id string, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, s.shingle FROM udtf_docs d, LATERAL shingles(d.text, 3) s"
    )
    got = {(r["doc_id"], r["shingle"]) for r in via_udtf.collect()}
    want = {(r["doc_id"], r["shingle"]) for r in shingle_rows(docs, "doc_id", "text").collect()}
    assert got == want
    assert ("d2",) not in {(d,) for d, _ in got}  # short doc emits nothing


def test_template_udtf(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT t.* FROM VALUES ('user 42 failed after 3 tries'), ('no digits here') v(line), "
        "LATERAL line_template(v.line) t"
    ).collect()
    by_tpl = {r["template"]: r for r in rows}
    assert by_tpl["user <*> failed after <*> tries"]["params"] == ["42", "3"]
    assert by_tpl["no digits here"]["n_params"] == 0
