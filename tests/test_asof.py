"""As-of join: boundary conditions (no prior row, exact-ts match, ties)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.asof import asof_join


def ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("u1", ts(5), 100),   # before any right row → NULL
            ("u1", ts(10), 101),  # exactly at right row 10 → sees it
            ("u1", ts(25), 102),  # after rows at 10, 20 → sees 20
            ("u2", ts(30), 200),  # u2 has its own history
        ],
        "key string, ts timestamp, left_id int",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts(10), 1, 1.5),
            ("u1", ts(20), 2, 2.5),
            ("u1", ts(20), 3, 3.5),  # tie at ts=20: larger rid wins
            ("u2", ts(1), 9, 9.5),
        ],
        "key string, ts timestamp, rid int, rv double",
    )
    return left, right


def test_asof_semantics(spark, frames):
    left, right = frames
    out = asof_join(left, right, "key", "ts", ["rid", "rv"], tiebreak="rid")
    got = {r["left_id"]: (r["rid_asof"], r["rv_asof"]) for r in out.collect()}
    assert got[100] == (None, None)      # nothing at-or-before 00:05
    assert got[101] == (1, 1.5)          # same-instant right row visible
    assert got[102] == (3, 3.5)          # latest ≤ ts, tie → larger rid
    assert got[200] == (9, 9.5)
    assert out.count() == left.count()   # strictly left-preserving


def test_asof_partitioning_invariant(spark, frames):
    left, right = frames
    a = sorted(map(tuple, asof_join(left, right, "key", "ts", ["rid"], tiebreak="rid").collect()))
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(7), right.repartition(3), "key", "ts", ["rid"], tiebreak="rid"
            ).collect(),
        )
    )
    assert a == b


def test_asof_null_right_col_carries_same_row(spark):
    """A right row with NULL in one carried column must NOT borrow that
    column's value from an older right row (struct-carry regression)."""
    left = spark.createDataFrame(
        [("u1", ts(30), 1)], "key string, ts timestamp, left_id int"
    )
    right = spark.createDataFrame(
        [("u1", ts(10), 7, 7.5), ("u1", ts(20), 8, None)],
        "key string, ts timestamp, rid int, rv double",
    )
    row = asof_join(left, right, "key", "ts", ["rid", "rv"], tiebreak="rid").collect()[0]
    # latest right row is (rid=8, rv=NULL): rv must stay NULL, not 7.5
    assert row["rid_asof"] == 8
    assert row["rv_asof"] is None
