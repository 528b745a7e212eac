"""Two-table reconciliation: summary gate (counts + multiset checksum) and
key-level diff statuses, including the duplicate-multiplicity case XOR-based
checksums miss."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.reconcile import diff, summary

KEYS = ["k"]
CMP = ["v"]


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("p0", 1, "a"),
            ("p0", 2, "b"),
            ("p0", 3, "c"),   # missing from right
            ("p1", 4, "d"),
            ("p1", 5, "e"),   # value differs on right
            ("p1", 6, "f"),
            ("p1", 6, "f"),   # duplicated twice here, once on right
        ],
        "g string, k int, v string",
    )
    right = spark.createDataFrame(
        [
            ("p0", 1, "a"),
            ("p0", 2, "b"),
            ("p1", 4, "d"),
            ("p1", 5, "E"),
            ("p1", 6, "f"),
            ("p1", 7, "g"),   # missing from left
        ],
        "g string, k int, v string",
    )
    return left, right


def test_summary_flags_every_divergent_group(spark):
    left, right = _frames(spark)
    s = {r["g"]: r for r in summary(left, right, KEYS, CMP, "g").collect()}
    assert s["p0"]["n_left"] == 3 and s["p0"]["n_right"] == 2
    assert not s["p0"]["counts_match"] and not s["p0"]["checksum_match"]
    assert s["p1"]["n_left"] == 4 and s["p1"]["n_right"] == 4
    # equal counts but different content: the checksum catches it
    assert s["p1"]["counts_match"] and not s["p1"]["checksum_match"]


def test_summary_identical_sides_match(spark):
    left, _ = _frames(spark)
    s = summary(left, left, KEYS, CMP, "g").collect()
    assert all(r["counts_match"] and r["checksum_match"] for r in s)


def test_summary_group_on_one_side_only(spark):
    left, _ = _frames(spark)
    s = {
        r["g"]: r
        for r in summary(
            left, left.filter(F.col("g") != "p0"), KEYS, CMP, "g"
        ).collect()
    }
    assert s["p0"]["n_right"] == 0
    assert not s["p0"]["counts_match"] and not s["p0"]["checksum_match"]


def test_diff_statuses_and_multiplicity(spark):
    left, right = _frames(spark)
    d = {r["k"]: (r["g"], r["status"]) for r in diff(left, right, KEYS, CMP, "g").collect()}
    assert d[3] == ("p0", "missing_in_right")
    assert d[7] == ("p1", "missing_in_left")
    assert d[5] == ("p1", "value_mismatch")
    # same key, same value, DIFFERENT multiplicity (2 vs 1): still flagged
    assert d[6] == ("p1", "value_mismatch")
    # matching keys never leave the join
    assert set(d) == {3, 5, 6, 7}


def test_diff_without_group_col(spark):
    left, right = _frames(spark)
    d = {r["k"]: r["status"] for r in diff(left, right, KEYS, CMP).collect()}
    assert d[3] == "missing_in_right" and len(d) == 4
