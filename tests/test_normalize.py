"""Unit tests: text normalization, C4 line filtering, MAD robust outliers."""

from __future__ import annotations

import unicodedata

from pyspark.sql import Row
from pyspark.sql import functions as F

from anomalydetection_spark.operators import normalize, stats


def test_strip_markup_order_and_entities(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="a <b>bold</b> c"),
            # entity decoding happens AFTER tag strip: '&lt;b&gt;' must
            # survive as literal '<b>', never be re-stripped as a tag
            Row(id=2, text="&lt;b&gt; &amp;amp; x"),
            Row(id=3, text="ctrl\x07here\tand\nnewline"),
            Row(id=4, text="  padded   spaces  "),
        ]
    )
    out = {
        r["id"]: r["s"]
        for r in df.select("id", normalize.strip_markup(F.col("text")).alias("s")).collect()
    }
    assert out[1] == "a bold c"
    assert out[2] == "<b> &amp; x"  # '&amp;' decoded once, not recursively
    assert out[3] == "ctrlhere and newline"
    assert out[4] == "padded spaces"


def test_normalize_docs_nfc(spark):
    decomposed = "café"  # e + combining acute
    composed = unicodedata.normalize("NFC", decomposed)
    assert composed != decomposed and len(composed) == len(decomposed) - 1
    df = spark.createDataFrame(
        [Row(id=1, text=decomposed), Row(id=2, text=composed), Row(id=3, text="plain")]
    )
    rows = {r["id"]: r for r in normalize.normalize_docs(df, "id", "text").collect()}
    assert rows[1]["normalized"] == composed and rows[1]["nfc_changed"]
    assert rows[2]["normalized"] == composed and not rows[2]["nfc_changed"]
    assert not rows[3]["nfc_changed"]
    assert rows[1]["chars_removed"] == 0  # NFC delta is not markup removal


def test_c4_line_filter_verdicts(spark):
    good = "A perfectly fine sentence with words."
    df = spark.createDataFrame(
        [
            Row(id=1, text="\n".join([good, good, good])),  # kept
            Row(id=2, text="\n".join([good, good, "short one"])),  # too few lines
            Row(id=3, text="\n".join([good, good, good, "lorem ipsum filler text."])),
            Row(id=4, text="\n".join([good, good, good, "if (x) { y(); }"])),
            # line rule details: no terminal punctuation / <5 words
            Row(id=5, text="\n".join(["ends without punctuation here ok", "Tiny line.", good, good])),
        ]
    )
    out = {r["id"]: r for r in normalize.c4_line_filter(df, "id", "text").collect()}
    assert out[1]["reason"] == "kept" and out[1]["keep"]
    assert out[2]["reason"] == "too_few_lines" and out[2]["n_kept_lines"] == 2
    assert out[3]["reason"] == "ban_phrase"  # ban wins over line count
    assert out[4]["reason"] == "brace"
    assert out[5]["reason"] == "too_few_lines" and out[5]["n_kept_lines"] == 2
    assert out[5]["n_lines"] == 4


def test_mad_outliers_flags_planted_spike(spark):
    rows = [Row(k=i, v=100 + (i % 5)) for i in range(20)] + [Row(k=99, v=100000)]
    df = spark.createDataFrame(rows)
    out = {r["k"]: r for r in stats.mad_outliers(df, "v").collect()}
    assert out[99]["is_outlier"] and out[99]["rz"] > 3.5
    assert not any(out[k]["is_outlier"] for k in range(20))
    # scale-shape guard: scalar-agg crossJoins only, no partition-less window
    plan = stats.mad_outliers(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_mad_outliers_constant_series(spark):
    df = spark.createDataFrame([Row(k=i, v=7) for i in range(5)] + [Row(k=9, v=8)])
    out = {r["k"]: r for r in stats.mad_outliers(df, "v").collect()}
    # MAD over {7,7,7,7,7,8} is 0 → rz NULL, outlier = exact non-equality
    assert out[9]["rz"] is None and out[9]["is_outlier"]
    assert not out[0]["is_outlier"]
