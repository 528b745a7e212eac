"""Golden tests: each constraint operator vs the single-node pandas oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark import oracle
from anomalydetection_spark.datagen import DataGenConfig, generate_documents, generate_media_assets
from anomalydetection_spark.operators import drift, reassembly, referential, stats, uniqueness

CFG = DataGenConfig(n_docs=1500, n_partitions=4, n_media=300, drift_partitions=(3,))


@pytest.fixture(scope="module")
def data(spark):
    docs = generate_documents(spark, CFG).cache()
    media = generate_media_assets(spark, CFG).cache()
    exploded = reassembly.explode_spans_meta(docs).cache()
    pdocs = docs.toPandas()
    pdocs["spans"] = pdocs["spans"].apply(
        lambda arr: [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
            for s in arr
        ]
    )
    pmedia = media.toPandas()
    psp = oracle.explode(pdocs)
    return docs, media, exploded, pdocs, pmedia, psp


def test_stats_vs_oracle(data, spark):
    docs, media, exploded, pdocs, pmedia, psp = data
    verdicts, violations = stats.check(docs, exploded)
    got = {r["partition_id"]: r.asDict() for r in verdicts.collect()}
    want = oracle.stats_metrics(pdocs, psp, stats.StatsThresholds())
    assert set(got) == set(want["partition_id"])
    for _, w in want.iterrows():
        g = got[w["partition_id"]]
        assert g["passed"] == w["passed"]
        assert g["violation_count"] == w["violation_count"]
        assert g["row_count"] == w["row_count"]
        m = g["metrics"]
        assert m["n_spans"] == w["n_spans"]
        for key in (
            "null_text_rate", "empty_spans_rate", "spans_per_doc_mean",
            "text_len_mean", "text_len_std", "text_len_min", "text_len_max",
            "text_len_p50", "text_len_p95",
        ):
            assert m[key] == pytest.approx(w[key], rel=1e-9), key
    # violation rows = exactly the null-text spans
    n_null = int(psp[psp["kind"].isin(oracle.TEXTY) & psp["text"].isna()].shape[0])
    assert violations.count() == n_null


def test_uniqueness_vs_oracle(data):
    docs, *_ , pdocs, pmedia, psp = data
    verdicts, violations = uniqueness.check(docs)
    want = oracle.uniqueness_violations(pdocs)
    got = violations.select("partition_id", "doc_id").toPandas()
    key = lambda df: sorted(map(tuple, df[["partition_id", "doc_id"]].to_numpy()))
    assert key(got) == key(want)
    # verdict rollup consistent with violations
    vc = {r["partition_id"]: r["violation_count"] for r in verdicts.collect()}
    wc = want.groupby("partition_id").size().to_dict()
    for pid, n in vc.items():
        assert n == wc.get(pid, 0)


def test_referential_vs_oracle(data):
    docs, media, exploded, pdocs, pmedia, psp = data
    verdicts, violations = referential.check(exploded, media)
    want = oracle.referential_violations(psp, pmedia)
    got = violations.select("partition_id", "doc_id", "pos").toPandas()
    key = lambda df: sorted(map(tuple, df[["partition_id", "doc_id", "pos"]].to_numpy()))
    assert key(got) == key(want)


def test_drift_vs_oracle(data, spark):
    docs, media, exploded, pdocs, pmedia, psp = data
    # baseline = non-drifted partitions
    base_exploded = exploded.filter(~F.col("partition_id").isin([3]))
    baseline = drift.compute_baseline(base_exploded)
    verdicts, violations = drift.check(exploded, baseline, drift.DriftThresholds())
    want = oracle.drift_scores(psp, psp[psp["partition_id"] != 3], drift.DriftThresholds())
    got = {r["partition_id"]: r.asDict() for r in verdicts.collect()}
    for pid, g in want.groupby("partition_id"):
        m = got[pid]["metrics"]
        for _, row in g.iterrows():
            assert m[f"kl_{row['feature']}"] == pytest.approx(row["kl"], rel=1e-6, abs=1e-9)
            assert m[f"psi_{row['feature']}"] == pytest.approx(row["psi"], rel=1e-6, abs=1e-9)
    # the drifted partition must actually trip the constraint
    assert got[3]["passed"] is False
    for pid in (0, 1, 2):
        assert got[pid]["passed"] is True


def test_stats_collect_moments_opt_in(data, spark):
    """collect_moments: off by default (13-key metrics map); when set the
    span aggregate carries exact power-sum partials and the verdict map
    gains text_len skewness/kurtosis that agree with the standalone
    moments operator on the same span view."""
    from anomalydetection_spark.operators.moments import skewness_kurtosis

    docs, media, exploded, pdocs, pmedia, psp = data
    default_v, _ = stats.check(docs, exploded, stats.StatsThresholds())
    d0 = default_v.collect()[0].asDict()
    assert len(d0["metrics"]) == 13 and "text_len_skewness" not in d0["metrics"]

    verdicts, _ = stats.check(
        docs, exploded, stats.StatsThresholds(collect_moments=True)
    )
    got = {r["partition_id"]: r.asDict() for r in verdicts.collect()}
    want = {
        r["partition_id"]: r
        for r in skewness_kurtosis(exploded, "text_len", ["partition_id"]).collect()
    }
    for pid, row in got.items():
        assert row["metrics"]["text_len_skewness"] == pytest.approx(
            want[pid]["skewness_fp6"] / 1e6, abs=1e-9
        )
        assert row["metrics"]["text_len_kurtosis"] == pytest.approx(
            want[pid]["kurtosis_fp6"] / 1e6, abs=1e-9
        )
        # the non-moment metrics are unchanged by the opt-in
        for k, v in d0["metrics"].items():
            if pid == d0["partition_id"]:
                assert row["metrics"][k] == pytest.approx(v, rel=1e-12)


def test_drift_bounded_metrics_opt_in(data, spark):
    """max_js / max_hellinger: off by default (4-key metrics map, KL/PSI
    detail format unchanged); when set, the bounded pair rides the same
    frame — the drifted partition's JS/Hellinger flag it at a tight
    bound, clean partitions stay under a loose one, and the scores agree
    with the standalone ks_js_hellinger analyzer's formulas."""
    docs, media, exploded, pdocs, pmedia, psp = data
    base_exploded = exploded.filter(~F.col("partition_id").isin([3]))
    baseline = drift.compute_baseline(base_exploded)

    default_v, _ = drift.check(exploded, baseline, drift.DriftThresholds())
    default_rows = {r["partition_id"]: r.asDict() for r in default_v.collect()}
    assert sorted(default_rows[3]["metrics"]) == [
        "kl_span_kind", "kl_span_length", "psi_span_kind", "psi_span_length",
    ]

    th = drift.DriftThresholds(max_js=1e-4, max_hellinger=1e-2)
    verdicts, violations = drift.check(exploded, baseline, th)
    got = {r["partition_id"]: r.asDict() for r in verdicts.collect()}
    assert len(got[3]["metrics"]) == 8
    # bounded scores live inside their theoretical ranges
    for pid, row in got.items():
        for feat in ("span_kind", "span_length"):
            assert 0.0 <= row["metrics"][f"js_{feat}"] <= math.log(2) + 1e-12
            assert 0.0 <= row["metrics"][f"hellinger_{feat}"] <= 1.0 + 1e-12
    # the drifted partition trips the tight bounded thresholds; KL/PSI on
    # clean partitions stay green so any extra failure comes from JS/H
    assert got[3]["passed"] is False
    # detail string now carries all four scores
    det = [r["detail"] for r in violations.collect() if r["partition_id"] == 3]
    assert any("js=" in d and "hellinger=" in d for d in det)
    # loose bounds keep clean partitions green
    loose_v, _ = drift.check(
        exploded, baseline, drift.DriftThresholds(max_js=0.5, max_hellinger=0.9)
    )
    loose = {r["partition_id"]: r.asDict() for r in loose_v.collect()}
    for pid in (0, 1, 2):
        assert loose[pid]["passed"] is True
    # KL/PSI values are unaffected by enabling the bounded pair
    for pid in got:
        for k in ("kl_span_kind", "psi_span_kind", "kl_span_length", "psi_span_length"):
            assert got[pid]["metrics"][k] == pytest.approx(
                default_rows[pid]["metrics"][k], rel=1e-12
            )


def test_span_order_vs_oracle(data, spark):
    docs, *_ , pdocs, pmedia, psp = data
    verdicts, violations = reassembly.check(docs)
    # datagen's reversed offsets are valid permutations → zero violations
    assert violations.count() == 0
    assert len(oracle.span_order_violations(pdocs)) == 0
    # hand-made malformed docs: duplicate / gapped / null offsets
    bad = spark.createDataFrame(
        [
            ("bad-dup", [("text", "a", None, 0), ("text", "b", None, 0)], 0),
            ("bad-gap", [("text", "a", None, 0), ("text", "b", None, 2)], 0),
            ("bad-null", [("text", "a", None, None)], 1),
            ("good", [("text", "a", None, 1), ("text", "b", None, 0)], 1),
            ("good-empty", [], 1),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, partition_id int",
    )
    v2, viol2 = reassembly.check(bad)
    got = sorted(r["doc_id"] for r in viol2.collect())
    assert got == ["bad-dup", "bad-gap", "bad-null"]


def test_explode_reassemble_roundtrip(data, spark):
    """Span-sequence-equality invariant: explode → reassemble reproduces the
    offset-sorted span sequence exactly (kind, text, media_ref, offset)."""
    docs, *_ = data
    # restrict to unique doc_ids: reassembly's groupBy key precondition
    # (duplicates are the uniqueness constraint's job)
    from pyspark.sql.window import Window

    uniq = (
        docs.withColumn("_n", F.count("*").over(Window.partitionBy("doc_id")))
        .filter(F.col("_n") == 1)
        .drop("_n")
    )
    nonempty = uniq.filter(F.size("spans") > 0)
    round_tripped = reassembly.reassemble(reassembly.explode_spans(nonempty))
    expected = reassembly.sorted_spans(nonempty)
    diff = round_tripped.exceptAll(expected)
    assert diff.count() == 0
    assert expected.exceptAll(round_tripped).count() == 0
    assert round_tripped.count() == nonempty.count()


def test_wasserstein_chisq_hand_computed(spark):
    """W1 + chi-square vs a hand-derived example.

    Groups a/b each hold 4 rows in opposite buckets; baseline = union:
    CDF gap for either group is |1.0 - 0.5| at bucket 0 → W1 = 0.5;
    chi-square: E = 2 per bucket, (4-2)²/2 + (0-2)²/2 = 4.0.
    """
    cur = spark.createDataFrame(
        [("a", 0, 4), ("b", 1, 4)], "g string, bucket int, n long"
    )
    base = spark.createDataFrame([(0, 4), (1, 4)], "bucket int, n long")
    got = {r["g"]: r for r in drift.wasserstein_chisq(cur, base, "g").collect()}
    for g in ("a", "b"):
        assert got[g]["w1"] == pytest.approx(0.5, abs=1e-12)
        assert got[g]["chisq"] == pytest.approx(4.0, abs=1e-12)


def test_wasserstein_identical_distributions_zero(spark):
    """A group matching the baseline exactly scores 0 on both metrics, and
    a current-only bucket (absent from the baseline) still moves W1 while
    staying outside chi-square's support (E=0 convention)."""
    cur = spark.createDataFrame(
        [("same", 0, 2), ("same", 1, 6), ("novel", 2, 4)],
        "g string, bucket int, n long",
    )
    base = spark.createDataFrame([(0, 2), (1, 6)], "bucket int, n long")
    got = {r["g"]: r for r in drift.wasserstein_chisq(cur, base, "g").collect()}
    assert got["same"]["w1"] == pytest.approx(0.0, abs=1e-12)
    assert got["same"]["chisq"] == pytest.approx(0.0, abs=1e-12)
    # novel: all mass at bucket 2, baseline CDF hits 1.0 by bucket 1 →
    # gaps |0-0.25| + |0-1.0| = 1.25; both baseline buckets expect E>0
    # with O=0 → chisq = 4·(0.25+0.75·... ) hand value: E0=1, E1=3 → 1+3=4
    assert got["novel"]["w1"] == pytest.approx(1.25, abs=1e-12)
    assert got["novel"]["chisq"] == pytest.approx(4.0, abs=1e-12)


def test_ks_js_hellinger_hand_computed(spark):
    """KS/JS/Hellinger vs hand-derived values on the disjoint-mass example.

    Groups a/b each hold 4 rows in opposite buckets; baseline = union
    (p=[1,0] vs q=[.5,.5] for group a): KS = max CDF gap = 0.5;
    JS(p||q) with m=[.75,.25]: ½(1·ln(1/.75)) + ½(.5·ln(.5/.75) +
    .5·ln(.5/.25)); Hellinger = sqrt(½((1−√.5)² + (0−√.5)²)).
    """
    cur = spark.createDataFrame(
        [("a", 0, 4), ("b", 1, 4)], "g string, bucket int, n long"
    )
    base = spark.createDataFrame([(0, 4), (1, 4)], "bucket int, n long")
    got = {r["g"]: r for r in drift.ks_js_hellinger(cur, base, "g").collect()}
    js_expect = 0.5 * (1.0 * math.log(1 / 0.75)) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    )
    hell_expect = math.sqrt(
        0.5 * ((1 - math.sqrt(0.5)) ** 2 + math.sqrt(0.5) ** 2)
    )
    for g in ("a", "b"):
        assert got[g]["ks"] == pytest.approx(0.5, abs=1e-12)
        assert got[g]["js"] == pytest.approx(js_expect, rel=1e-12)
        assert got[g]["hellinger"] == pytest.approx(hell_expect, rel=1e-12)


def test_ks_js_hellinger_bounds_and_zero(spark):
    """Identical distributions score exactly 0 on all three; fully
    disjoint support drives JS to its ln 2 ceiling and KS/Hellinger to 1
    (current-only bucket exercises the dense-grid nq=0 path)."""
    cur = spark.createDataFrame(
        [("same", 0, 2), ("same", 1, 6), ("novel", 9, 8)],
        "g string, bucket int, n long",
    )
    base = spark.createDataFrame([(0, 2), (1, 6)], "bucket int, n long")
    got = {r["g"]: r for r in drift.ks_js_hellinger(cur, base, "g").collect()}
    assert got["same"]["ks"] == pytest.approx(0.0, abs=1e-12)
    assert got["same"]["js"] == pytest.approx(0.0, abs=1e-12)
    assert got["same"]["hellinger"] == pytest.approx(0.0, abs=1e-12)
    assert got["novel"]["ks"] == pytest.approx(1.0, abs=1e-12)
    assert got["novel"]["js"] == pytest.approx(math.log(2), rel=1e-12)
    assert got["novel"]["hellinger"] == pytest.approx(1.0, abs=1e-12)


def test_ks_js_hellinger_numpy_reference(spark):
    """Randomized histograms vs a NumPy mirror of the three formulas."""
    import numpy as np

    rng = np.random.RandomState(7)
    buckets = list(range(12))
    cur_rows = [
        (f"g{gi}", b, int(rng.randint(0, 50) + 1)) for gi in range(4) for b in buckets
    ]
    base_rows = [(b, int(rng.randint(1, 80))) for b in buckets]
    cur = spark.createDataFrame(cur_rows, "g string, bucket int, n long")
    base = spark.createDataFrame(base_rows, "bucket int, n long")
    got = {r["g"]: r for r in drift.ks_js_hellinger(cur, base, "g").collect()}
    q = np.array([n for _, n in base_rows], dtype=float)
    q /= q.sum()
    for gi in range(4):
        p = np.array(
            [n for g, _, n in cur_rows if g == f"g{gi}"], dtype=float
        )
        p /= p.sum()
        ks = np.max(np.abs(np.cumsum(p) - np.cumsum(q)))
        m = (p + q) / 2
        js = 0.5 * np.sum(np.where(p > 0, p * np.log(np.where(p > 0, p, 1) / m), 0)) + \
            0.5 * np.sum(np.where(q > 0, q * np.log(np.where(q > 0, q, 1) / m), 0))
        hell = math.sqrt(0.5 * np.sum((np.sqrt(p) - np.sqrt(q)) ** 2))
        r = got[f"g{gi}"]
        assert r["ks"] == pytest.approx(ks, rel=1e-9)
        assert r["js"] == pytest.approx(js, rel=1e-9)
        assert r["hellinger"] == pytest.approx(hell, rel=1e-9)


def test_benford_string_digit_extraction(spark):
    """Dense 9-digit grid; sign, leading zeros, NULL, and zero handled via
    the string rendering (no float log10 anywhere near a power of ten)."""
    df = spark.createDataFrame(
        [("123.00",), ("0.045",), ("-210.5",), ("9.00",), ("1000.00",),
         (None,), ("0.00",)],
        "v string",
    ).withColumn("v", F.col("v").cast("decimal(10,2)"))
    rows = {r["digit"]: r for r in drift.benford(df, "v").collect()}
    assert sorted(rows) == list(range(1, 10))
    # 5 usable values: 123→1, 0.04→4 (cast rounds 0.045 to 0.05 → digit 5), 210→2, 9→9, 1000→1
    counts = {d: rows[d]["n"] for d in rows if rows[d]["n"]}
    assert counts == {1: 2, 2: 1, 5: 1, 9: 1}
    assert rows[1]["share"] == 0.4
    assert rows[1]["expected"] == round(__import__("math").log10(2), 6)
    assert rows[3]["n"] == 0 and rows[3]["share"] == 0.0


def test_mad_outliers_grouped_judges_within_group(spark):
    """A value anomalous for its own group flags even when it is routine
    globally; the zero-MAD convention applies per group."""
    rows = (
        [("low", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 9, 10, 50]]
        + [("high", float(v)) for v in [50, 52, 48, 51, 49, 50, 51, 49, 50, 52]]
        + [("const", 7.0)] * 5 + [("const", 8.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.mad_outliers_grouped(df, "g", "v", z_threshold=3.5)
    got = [(r["g"], r["v"], r["is_outlier"]) for r in out.collect()]
    # 50 is a gross outlier within 'low' but every 'high' value ≈ 50 is clean
    assert ("low", 50.0, True) in got
    assert all(not o for g, v, o in got if g == "high")
    assert all(not o for g, v, o in got if g == "low" and v != 50.0)
    # zero-MAD group: the single deviating value flags by exact inequality
    assert ("const", 8.0, True) in got
    assert ("const", 7.0, False) in got
