"""Salted skew join: result-equivalence with a plain join + spread checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows on one hot key, a few hundred on cold keys
    fact = spark.range(11_000).select(
        F.when(F.col("id") < 10_000, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 97).cast("string"))
        ).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"k{i}", f"dim-{i}") for i in range(97)],
        "k string, attr string",
    )
    return fact.cache(), dim.cache()


def _canon(df):
    return sorted(map(tuple, df.select("k", "v", "attr").collect()))


def test_salted_equals_plain_inner(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", n_salts=8)
    assert _canon(salted) == _canon(plain)


def test_salted_hot_only(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k")
    salted = salted_join(fact, dim, "k", n_salts=8, hot_keys=["HOT"])
    assert _canon(salted) == _canon(plain)


def test_left_join_preserved(spark, skewed):
    fact, dim = skewed
    fact2 = fact.unionByName(
        spark.createDataFrame([("orphan", 999_999)], "k string, v long")
    )
    plain = fact2.join(dim, "k", "left")
    salted = salted_join(fact2, dim, "k", n_salts=8, how="left")
    key = lambda df: sorted((r["k"], r["v"], r["attr"]) for r in df.collect())
    assert key(salted) == key(plain)


def test_hot_key_actually_spreads(spark, skewed):
    """The hot key's fact rows must land on multiple salts (the whole point)."""
    fact, dim = skewed
    from anomalydetection_spark.operators import skew as skew_mod
    from pyspark.sql import functions as F

    f = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.lit("sj")), F.lit(8)).cast("int"),
    )
    n_salts_used = f.filter(F.col("k") == "HOT").select("_salt").distinct().count()
    assert n_salts_used >= 4
