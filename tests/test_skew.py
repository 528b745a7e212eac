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


def test_aqe_splits_skewed_join(spark):
    """North-rule 'AQE skew-join handling': with the skew thresholds scaled
    down to test-sized data, AQE's OptimizeSkewedJoin must split the hot
    key's oversized shuffle partition into subpartitions (the final adaptive
    plan marks the join skew=true) while preserving the join result. This is
    the runtime complement to salted_join: salting handles skew the planner
    can predict, AQE catches it at shuffle time from actual map statistics.
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        pad = "x" * 120
        fact = spark.range(60_000).select(
            F.when(F.col("id") < 55_000, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 37).cast("string")))
            .alias("k"),
            F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(40).select(
            F.when(F.col("id") == 0, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") - 1).cast("string")))
            .alias("k"),
            F.col("id").alias("attr"),
        )
        joined = fact.join(dim, "k")
        # collect() executes THIS DataFrame's own QueryExecution (count()
        # would wrap it in a fresh one, leaving this plan un-finalized)
        assert len(joined.collect()) == 60_000  # every fact row matches one dim row
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_key_skew_top_k_and_tiebreak(spark):
    from anomalydetection_spark.operators.skew import key_skew

    df = spark.createDataFrame(
        [("hot",)] * 6 + [("b",)] * 2 + [("a",)] * 2 + [("cold",)],
        "k string",
    )
    rows = key_skew(df, "k", top_k=3).collect()
    # 4 distinct keys, 11 rows; ties (a=b=2) break by key asc
    assert [(r["k"], r["n"]) for r in rows] == [("hot", 6), ("a", 2), ("b", 2)]
    top = rows[0]
    assert top["share"] == round(6 / 11, 6)
    assert top["x_mean"] == round(6 * 4 / 11, 6)


def test_partition_skew_hand_computed(spark):
    from anomalydetection_spark.operators.skew import partition_skew

    df = spark.createDataFrame(
        [(0,), (1,), (1,), (1,)], "partition_id int"
    )
    r = partition_skew(df).collect()[0]
    assert (r["n_groups"], r["total_rows"], r["min_rows"], r["max_rows"]) == (2, 4, 1, 3)
    assert r["imbalance"] == 1.5          # max(3) / mean(2)
    assert r["cv"] == 0.5                 # sqrt(2*10 - 16) / 4


def test_join_fanout_audit_predicts_exact_join_size(spark):
    """The pre-join audit's predicted_rows must equal the ACTUAL inner
    equi-join output, hot keys rank by per-key product, and the fanout
    ratio flags an expanding join — all before any raw-row join runs."""
    from anomalydetection_spark.operators.skew import join_fanout_audit

    left = spark.createDataFrame(
        [("hot",)] * 50 + [("warm",)] * 5 + [("cold",)] * 1 + [("left_only",)] * 9,
        "k string",
    )
    right = spark.createDataFrame(
        [("hot",)] * 40 + [("warm",)] * 3 + [("cold",)] * 1 + [("right_only",)] * 7,
        "k string",
    )
    rows = join_fanout_audit(left, right, "k", top_k=2).collect()
    actual = left.join(right, "k").count()  # 50*40 + 5*3 + 1 = 2016
    assert actual == 2016
    assert len(rows) == 2
    assert [r["k"] for r in rows] == ["hot", "warm"]  # product desc
    for r in rows:
        assert r["predicted_rows"] == actual
        assert r["n_join_keys"] == 3  # left_only/right_only never meet
        assert r["max_product"] == 2000
    hot = rows[0]
    assert (hot["n_left"], hot["n_right"], hot["product"]) == (50, 40, 2000)
    # fanout vs the larger input (65 left): floor(2016e6 / 65)
    assert hot["fanout_x_fp6"] == (2016 * 1_000_000) // 65


def test_fanout_fp6_saturates_over_the_cliff(spark):
    """The fanout ratio must saturate to LONG_MAX — never wrap negative —
    when predicted·1e6/max(nl,nr) exceeds 2^63-1 (round-4 ADVICE: Spark's
    decimal `div` emits a wrapping bigint, so saturation must precede
    it), and must equal DuckDB's hugeint evaluation of the mirrored CASE
    on BOTH sides of the cliff."""
    import duckdb

    from anomalydetection_spark.operators.skew import fanout_fp6_sql

    LM = 9223372036854775807
    # (predicted, nl, nr): below the cliff, exactly at it, far beyond it
    cases = [
        (2016, 100, 65),                       # ordinary regime
        (10**13, 1, 1),                        # fanout 1e19 > LM → saturate
        (LM, 1, 1),                            # clamped predicted, den 1
        (9223372036854, 1, 1),                 # exactly (LM div 1e6) → ELSE
        (9223372036855, 1, 1),                 # one past the guard → THEN
        (10**37, 10**12, 10**12),              # huge both sides
        (10**18, 10**12, 5),                   # normal large regime
    ]
    df = spark.createDataFrame(
        [(str(p), n_l, n_r) for p, n_l, n_r in cases],
        "pred_s string, _nl long, _nr long",
    ).selectExpr(
        "CAST(pred_s AS DECIMAL(38,0)) AS _predicted", "_nl", "_nr"
    )
    got = [
        r[0]
        for r in df.selectExpr(fanout_fp6_sql()).collect()
    ]
    want = [
        duckdb.sql(
            f"SELECT CASE WHEN least({p}::hugeint, {LM}::hugeint)"
            f" > 9223372036854::hugeint * greatest({n_l}::hugeint, {n_r}::hugeint)"
            f" THEN {LM}::bigint"
            f" ELSE ((least({p}::hugeint, {LM}::hugeint) * 1000000::hugeint)"
            f" // greatest({n_l}::hugeint, {n_r}::hugeint))::bigint END"
        ).fetchone()[0]
        for p, n_l, n_r in cases
    ]
    assert got == want
    assert all(v is not None and v >= 0 for v in got)  # no wrap, no NULL
    assert got[1] == LM and got[4] == LM
    assert got[0] == (2016 * 1_000_000) // 100
