"""Text analysis operators for training-data pipelines.

- language ID: n-gram/marker-token voting heuristic (argmax of per-lang
  marker hits with a deterministic tiebreak)
- quality scoring: length / stopword-ratio / lexical-diversity composite
- token counting: whitespace tokens + distinct types
- document fingerprinting: min-shingle-hash (winnowing-lite)

All built-in column expressions (JVM, whole-stage codegen) — these run on
every doc of a 10^12-doc corpus, so nothing here may leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomalydetection_spark.operators.dedup import portable_hash60

# tiny marker sets for the heuristic (synthetic corpora only exercise the
# mechanism; a real deployment swaps in per-language stopword lists)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "los", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, predicted_lang, votes): argmax marker-token hits; ties and
    zero-hit docs resolve to 'und' (deterministic: langs checked in sorted
    order, strict-greater comparison)."""
    toks = _tokens(text_col)
    out = df.select(F.col(id_col), toks.alias("_toks"))
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        score = F.size(F.filter("_toks", lambda t: t.isin(markers)))
        score_cols.append(score.alias(f"_s_{lang}"))
    out = out.select(id_col, *score_cols)
    best = F.greatest(*[F.col(f"_s_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.lit("und")
    # first lang (sorted) reaching the max wins; zero max → 'und'
    for lang in reversed(sorted(LANG_MARKERS)):
        pred = F.when((best > 0) & (F.col(f"_s_{lang}") == best), F.lit(lang)).otherwise(pred)
    return out.select(id_col, pred.alias("predicted_lang"), best.cast("long").alias("votes"))


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_types, stopword_ratio, diversity, quality):
    a deterministic composite in [0,1] — the batch analog of per-document
    quality filters in corpus curation pipelines."""
    toks = _tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("_toks"), F.length(F.col(text_col)).alias("_len"))
    n_tokens = F.size("_toks")
    n_types = F.size(F.array_distinct("_toks"))
    n_stop = F.size(F.filter("_toks", lambda t: t.isin(STOPWORDS)))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    diversity = F.when(n_tokens > 0, n_types / n_tokens).otherwise(F.lit(0.0))
    len_factor = F.least(n_tokens / F.lit(64.0), F.lit(1.0))
    quality = F.round(
        0.4 * len_factor + 0.4 * diversity + 0.2 * (1.0 - stop_ratio), 6
    )
    return base.select(
        id_col,
        n_tokens.cast("long").alias("n_tokens"),
        n_types.cast("long").alias("n_types"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(diversity, 6).alias("diversity"),
        quality.alias("quality"),
    )


def token_stats(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group corpus token accounting: total tokens, distinct types,
    avg tokens/doc — one explode + two hash aggs."""
    toks = _tokens(text_col)
    exploded = df.select(F.col(group_col), F.explode(toks).alias("token"))
    return exploded.groupBy(group_col).agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("token").alias("n_types"),
    )


BPE_ISH_PATTERN = r"[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\s]"


def bpe_ish_tokens(text_col: str):
    """Greedy fixed-width subword chunking: letters in ≤4-char pieces,
    digits in ≤3-char pieces, punctuation single — a deterministic,
    regex-only stand-in for BPE token *counting* (corpus accounting needs
    stable counts, not a learned vocab)."""
    return F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)


def subword_stats(df: DataFrame, group_col: str, text_col: str) -> DataFrame:
    """Per-group subword accounting: total + distinct BPE-ish tokens."""
    exploded = df.select(F.col(group_col), F.explode(bpe_ish_tokens(text_col)).alias("tok"))
    return exploded.groupBy(group_col).agg(
        F.count("*").alias("n_subwords"),
        F.countDistinct("tok").alias("n_distinct_subwords"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, fingerprint): min k-shingle hash — a stable content fingerprint
    invariant to shingle order (winnowing-lite; SURVEY's rolling-hash
    analog with an engine-portable hash)."""
    toks = _tokens(text_col)
    # sequence(1, 0) would be descending — short docs get an empty shingle
    # list and a NULL fingerprint instead
    idx = F.when(F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    shingle_arr = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    hashes = F.transform(shingle_arr, lambda s: portable_hash60(s))
    return df.select(
        F.col(id_col),
        F.array_min(hashes).alias("fingerprint"),
    )
