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


# ---------------------------------------------------------------------------
# corpus-curation operators: decontamination, repetition quality, domain mix
# ---------------------------------------------------------------------------

def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    max_ratio: float = 0.05,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing k-token
    n-grams with an evaluation/benchmark corpus (the n-gram-overlap
    decontamination used for LLM training sets).

    Returns one row per training doc with >=1 matched shingle:
    (id, n_matched, n_shingles, contamination_ratio, contaminated) —
    ``contaminated`` once the matched fraction exceeds ``max_ratio``.

    Scale: the benchmark shingle set is DISTINCT-aggregated then broadcast
    (eval suites are MB-sized next to a 100 TB corpus); the corpus
    shingles stream through one broadcast semi-join + one hash-agg — the
    fact side never shuffles on shingle. If the benchmark ever outgrows
    broadcast range, swap the broadcast for operators/bloom.py's
    membership blobs (same distinct-first shape, probe instead of join).
    """
    from anomalydetection_spark.operators.dedup import shingle_rows

    bench_sh = shingle_rows(benchmark, id_col, text_col, k).select("shingle").distinct()
    doc_sh = shingle_rows(docs, id_col, text_col, k)
    per_doc = doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi").groupBy(
        id_col
    ).agg(F.count("*").alias("n_matched"))
    totals = doc_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    ratio = F.col("n_matched") / F.col("n_shingles")
    return per_doc.join(totals, id_col).select(
        id_col,
        "n_matched",
        "n_shingles",
        F.round(ratio, 6).alias("contamination_ratio"),
        (ratio > max_ratio).alias("contaminated"),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_top_bigram_share: float = 0.20,
    max_dup_trigram_frac: float = 0.30,
    min_diversity: float = 0.20,
) -> DataFrame:
    """Per-document repetition/quality metrics in the Gopher-rules family
    (Rae et al. 2021: repetitious documents are low-quality training
    signal), adapted to unstructured text (no line structure assumed):

    - ``top_bigram_share``: occurrences of the most frequent bigram / all
      bigram occurrences (boilerplate detector);
    - ``dup_trigram_frac``: fraction of trigram occurrences whose trigram
      occurs more than once in the doc (copy-paste/looping detector);
    - ``diversity``: distinct tokens / total tokens;
    - ``flagged``: any threshold breached.

    All JVM (explode + two hash-aggs per n-gram order, map-side partials);
    per-doc cardinality is bounded by doc length so no skew beyond doc
    size, which the explode distributes."""
    toked = docs.select(id_col, _tokens(text_col).alias("_toks"))

    def gram_counts(n: int, out: str) -> DataFrame:
        parts = [F.element_at(F.col("_toks"), F.col("_i") + j) for j in range(n)]
        idx = F.when(
            F.size("_toks") >= n, F.sequence(F.lit(1), F.size("_toks") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        grams = toked.select(id_col, F.explode(idx).alias("_i"), "_toks").select(
            id_col, F.concat_ws(" ", *parts).alias("_g")
        )
        per_gram = grams.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
        return per_gram.groupBy(id_col).agg(
            F.sum("_c").alias(f"_total_{out}"),
            F.max("_c").alias(f"_max_{out}"),
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0)).alias(f"_dup_{out}"),
        )

    uni = toked.select(
        id_col,
        F.size("_toks").alias("_n_tokens"),
        F.size(F.array_distinct("_toks")).alias("_n_types"),
    )
    bi = gram_counts(2, "bi")
    tri = gram_counts(3, "tri")
    top_share = F.round(F.col("_max_bi") / F.col("_total_bi"), 6)
    dup_frac = F.round(F.col("_dup_tri") / F.col("_total_tri"), 6)
    diversity = F.round(F.col("_n_types") / F.col("_n_tokens"), 6)
    return (
        uni.join(bi, id_col, "left").join(tri, id_col, "left")
        .select(
            id_col,
            F.col("_n_tokens").cast("long").alias("n_tokens"),
            F.coalesce(top_share, F.lit(0.0)).alias("top_bigram_share"),
            F.coalesce(dup_frac, F.lit(0.0)).alias("dup_trigram_frac"),
            diversity.alias("diversity"),
            (
                (F.coalesce(top_share, F.lit(0.0)) > max_top_bigram_share)
                | (F.coalesce(dup_frac, F.lit(0.0)) > max_dup_trigram_frac)
                | (diversity < min_diversity)
            ).alias("flagged"),
        )
    )


def paragraph_boilerplate(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_dup: int = 2,
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide boilerplate-paragraph detection (the paragraph-level
    exact-dedup pass of CCNet/RefinedWeb-style curation): a paragraph is
    boilerplate when its exact text occurs in ≥ ``min_dup`` documents.

    Returns one row per doc: (id, n_paragraphs, n_boilerplate,
    boilerplate_frac).

    Scale: paragraphs are compared by 60-bit content hash, never by
    string shuffle — split → posexplode → hash-agg on the hash
    (map-side partials; the fat paragraph text is dropped before the
    exchange). The duplicated-hash set is distinct-aggregated and joined
    back; at corpus scale that set is the rare side (boilerplate is by
    definition repeated, so its distinct count is corpus-sublinear) and
    Spark/AQE broadcast it when small. One doc-id hash-agg re-assembles
    per-doc fractions. Docs are counted per distinct (doc, hash) so a
    paragraph repeated WITHIN one doc does not self-qualify."""
    from anomalydetection_spark.operators.dedup import portable_hash60

    paras = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), sep, -1)).alias("_p"),
    ).select("id", portable_hash60(F.col("_p")).alias("_h"))
    dup_hashes = (
        paras.select("id", "_h").distinct()
        .groupBy("_h").agg(F.count("*").alias("_docs"))
        .filter(F.col("_docs") >= min_dup)
        .select("_h")
    )
    marked = paras.join(dup_hashes.withColumn("_dup", F.lit(1)), "_h", "left")
    n_para = F.count("*")
    n_boiler = F.sum(F.coalesce(F.col("_dup"), F.lit(0)))
    return marked.groupBy("id").agg(
        n_para.cast("long").alias("n_paragraphs"),
        n_boiler.cast("long").alias("n_boilerplate"),
        F.round(n_boiler / n_para, 6).alias("boilerplate_frac"),
    )


def domain_mixture(
    docs: DataFrame,
    source_col: str,
    text_col: str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Training-mix planning: per-source token counts, observed token
    share, and the sampling weight that reshapes the corpus to
    ``target_shares`` (uniform across observed sources when None) —
    weight = target_share / observed_share, so sampling each source's
    docs with probability ∝ weight yields the target mixture.

    One narrow scan + one tiny hash-agg (|sources| rows); the share
    denominator is a scalar agg broadcast back (no partition-less
    window)."""
    per_src = docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens(text_col))).alias("n_tokens"),
    )
    total = per_src.agg(F.sum("n_tokens").alias("_tot"))
    joined = per_src.crossJoin(F.broadcast(total))
    observed = F.col("n_tokens") / F.col("_tot")
    if target_shares is None:
        n_src = per_src.count()
        target = F.lit(1.0 / n_src)
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in kv]
        )
        target = mapping[F.col(source_col)]
    return joined.select(
        source_col,
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(observed, 6).alias("observed_share"),
        F.round(target, 6).alias("target_share"),
        F.round(target / observed, 6).alias("sampling_weight"),
    )


# URL / domain analysis ------------------------------------------------------

# engine-portable (no lookaround/backrefs): scheme://host[/path] up to
# whitespace; host captured by the same sub-expression in Spark and RE2
URL_PATTERN = r"https?://([A-Za-z0-9.-]+)[^\s]*"


def url_domain_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Per-domain corpus accounting (the C4-style host-blocklist pass):
    (domain, n_urls, n_docs, blocked) for every hostname appearing in any
    ``text_col`` URL.

    Scale: one projection pass extracts all URLs per doc
    (`regexp_extract_all`, JVM), hostnames explode and hash-agg — the
    only shuffle carries (domain, doc-distinct flags), never document
    text. The blocklist is a literal `isin` (Catalyst folds it into the
    scan's predicate space); a million-entry blocklist would swap to a
    broadcast join without changing the output contract."""
    # NB: F.regexp_extract_all with a lit() pattern, NOT F.expr — a SQL
    # string literal would eat the backslash in [^\s] and silently turn it
    # into [^s], which swallows every URL after the first in a doc
    urls = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(1))
        ).alias("domain"),
    )
    per_domain = urls.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("id").cast("long").alias("n_docs"),
    )
    blocked = (
        F.col("domain").isin(*blocklist) if blocklist else F.lit(False)
    )
    return per_domain.withColumn("blocked", blocked)


def doc_url_filter(
    docs: DataFrame, id_col: str, text_col: str, blocklist: list[str]
) -> DataFrame:
    """Adds (n_urls, has_blocked_domain) per doc — the doc-level verdict
    the curation pipeline filters on. Map-only: per-doc URL extraction and
    a literal-array intersection, no shuffle."""
    doms = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(1))
    blocked_arr = F.array(*[F.lit(b) for b in blocklist])
    return docs.select(
        F.col(id_col),
        F.size(doms).cast("long").alias("n_urls"),
        (F.size(F.array_intersect(doms, blocked_arr)) > 0).alias("has_blocked_domain"),
    )


# deterministic temperature sampling ----------------------------------------

def temperature_sample(
    docs: DataFrame,
    source_col: str,
    text_col: str,
    id_col: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-flattened mixture sampling (the multilingual-corpus
    rebalancing rule: p_s ∝ share_s^(1/T), keep-probability scaled so the
    largest source keeps everything). Returns per-source
    (n_docs, n_kept, keep_prob) under a DETERMINISTIC per-doc Bernoulli:
    a doc is kept iff hash60(id) % 1e6 < keep_prob * 1e6 — reproducible
    across runs/engines, no rand().

    Scale: per-source token shares are one tiny hash-agg (|sources| rows,
    broadcast back); the keep decision is a map-side hash compare. The
    doc stream shuffles once (the share join is broadcast) and only for
    the final per-source rollup."""
    per_src = docs.groupBy(source_col).agg(
        F.sum(F.size(_tokens(text_col))).alias("_n_tok")
    )
    tot = per_src.agg(F.sum("_n_tok").alias("_tot"))
    # share^(1/T), normalized so max keep_prob = 1.0 (largest source is
    # never upsampled — sampling can only drop). T=2 (the common default)
    # uses sqrt, which IEEE 754 requires to be correctly rounded — so the
    # whole keep_prob computation is bit-identical across engines; pow()
    # is libm-dependent in its last ulp and only cross-engine-stable away
    # from rounding boundaries.
    share = F.col("_n_tok") / F.col("_tot")
    flat = F.sqrt(share) if temperature == 2.0 else F.pow(share, 1.0 / temperature)
    shares = per_src.crossJoin(F.broadcast(tot)).select(
        source_col, flat.alias("_flat")
    )
    mx = shares.agg(F.max("_flat").alias("_mx"))
    probs = shares.crossJoin(F.broadcast(mx)).select(
        source_col, (F.col("_flat") / F.col("_mx")).alias("keep_prob")
    )
    marked = docs.join(F.broadcast(probs), source_col).withColumn(
        "_keep",
        (portable_hash60(F.col(id_col).cast("string")) % 1_000_000)
        < F.col("keep_prob") * 1_000_000,
    )
    return marked.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        F.round(F.first("keep_prob"), 6).alias("keep_prob"),
    )


# hashed linear quality classifier -------------------------------------------

CLASSIFIER_BUCKETS = 1 << 20
# fixed-point weight scale: weights live in {-501_001 … +501_001} / 1e6-ish,
# integer-summed so cross-engine float summation order can never matter
CLASSIFIER_MOD = 1_000_003
CLASSIFIER_LCG_A = 1_103_515_245
CLASSIFIER_LCG_C = 12_345


def _bucket(token: Column) -> Column:
    """Portable 20-bit feature bucket: md5-derived 60-bit hash mod B
    (same engine-portable hash family as dedup.portable_hash60)."""
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long") % CLASSIFIER_BUCKETS


def _weight_int(bucket: Column) -> Column:
    """Deterministic integer weight in [-(M-1)/2, (M-1)/2] for a feature
    bucket — an LCG over the bucket id standing in for trained fastText /
    logistic-regression weights. The loader-swap contract (pipeline.embed's
    pattern) applies: a real model replaces this formula with a broadcast
    weight array, nothing else changes."""
    return (bucket * CLASSIFIER_LCG_A + CLASSIFIER_LCG_C) % CLASSIFIER_MOD - (
        CLASSIFIER_MOD - 1
    ) // 2


def classifier_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """FastText-style hashed-bag-of-words linear scorer (the quality- /
    toxicity-classifier filtering pass of web-corpus pipelines, e.g.
    CCNet / FineWeb-Edu): tokens → hash buckets → weight lookup → mean
    weight → sigmoid score → keep verdict at 0.5.

    Returns (id, n_tokens, sum_weight, score, keep) where ``sum_weight``
    is the EXACT integer sum of fixed-point weights (order-independent —
    the cross-engine determinism anchor), ``score`` =
    round(sigmoid(sum_weight / (M · n_tokens)), 6), and ``keep`` ⇔
    sum_weight > 0 (sigmoid > ½ exactly, no float compare).

    Scale shape: entirely map-side JVM expressions (split → transform →
    aggregate over the token array); no shuffle, no Python. At 10^12 docs
    this pipelines into whatever agg consumes it.
    """
    extra = list(keep_cols or [])
    toks = _tokens(text_col)
    weights = F.transform(toks, lambda t: _weight_int(_bucket(t)))
    sum_w = F.aggregate(weights, F.lit(0).cast("long"), lambda acc, w: acc + w)
    n_tok = F.size(toks).cast("long")
    scored = df.select(
        F.col(id_col),
        *extra,
        n_tok.alias("n_tokens"),
        sum_w.alias("sum_weight"),
    )
    s = F.col("sum_weight") / (F.lit(float(CLASSIFIER_MOD)) * F.col("n_tokens"))
    return scored.select(
        id_col,
        *extra,
        "n_tokens",
        "sum_weight",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-s)), 6).alias("score"),
        (F.col("sum_weight") > 0).alias("keep"),
    )


# self-trained unigram LM scoring (perplexity-filter analog) -----------------

LM_SCALE = 1_000_000_000  # fixed-point quantum for log-prob sums


def unigram_logprob_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_cols: list[str] | None = None,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-doc negative log-likelihood under a unigram LM trained on the
    corpus ITSELF — the self-supervised stand-in for the KenLM perplexity
    filter of CCNet-style pipelines: gibberish / off-distribution docs
    score high, boilerplate scores low. No external model, no OOV (every
    token is in the vocabulary by construction).

    Returns (id, *keep_cols, n_tokens, nll_fp, nll): ``nll_fp`` is the
    EXACT integer sum of per-token round(-ln(p)·1e9) fixed-point values
    (summation-order-proof), ``nll`` = round(nll_fp / (1e9·n_tokens), 6).

    Scale shape: pass 1 is one hash agg over the exploded token stream
    (map-side partials absorb hot tokens); the total is a scalar
    crossJoin. Pass 2 re-joins tokens to the vocabulary — broadcast while
    the vocab fits (the common case: vocab ≪ corpus), shuffle join with
    AQE skew handling above (``broadcast_vocab=False``). Both passes
    stream the token column once each; all arithmetic is JVM-side.
    """
    extra = list(keep_cols or [])
    toks = df.select(F.col(id_col), *extra, F.explode(_tokens(text_col)).alias("term"))
    vocab = toks.groupBy("term").agg(F.count("*").cast("long").alias("_cnt"))
    total = vocab.agg(F.sum("_cnt").alias("_total"))
    lp_fp = F.round(
        -F.log(F.col("_cnt") / F.col("_total")) * F.lit(float(LM_SCALE)), 0
    ).cast("long")
    vocab_p = vocab.crossJoin(F.broadcast(total)).select("term", lp_fp.alias("_lp_fp"))
    if broadcast_vocab:
        vocab_p = F.broadcast(vocab_p)
    scored = (
        toks.join(vocab_p, "term")
        .groupBy(id_col, *extra)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_lp_fp").alias("nll_fp"),
        )
    )
    return scored.withColumn(
        "nll",
        F.round(F.col("nll_fp") / (F.lit(float(LM_SCALE)) * F.col("n_tokens")), 6),
    )


# DSIR-style hashed importance weights (data selection for LMs) --------------

DSIR_BUCKETS = 1 << 16


def _dsir_features(text_col: str) -> Column:
    """Unigram + bigram feature array (the DSIR paper's hashed n-gram
    feature space): tokens plus space-joined adjacent pairs."""
    toks = _tokens(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.slice(toks, 1, F.size(toks) - 1),
            lambda t, i: F.concat_ws(" ", t, F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Importance weights for Data Selection via Importance Resampling
    (DSIR, Xie et al. 2023): hashed n-gram bag models of the TARGET
    distribution (rows where ``is_target``) and the RAW distribution (all
    rows), per-doc weight = Σ_features log(p_target(f) / p_raw(f)) with
    add-one smoothing over the 2^16 hashed buckets.

    Determinism contract: the per-bucket log-ratio is ONE ``ln`` of an
    exact integer rational — round(1e9·ln(((ct+1)·(Nr+B)) /
    ((cr+1)·(Nt+B)))) — so both engines round the same double once, and
    per-doc sums are exact bigint additions (summation-order-proof).

    Scale shape: one hash agg over the exploded feature stream fits both
    models simultaneously (target count = conditional sum, raw count =
    plain count — a single pass); totals are one scalar crossJoin; the
    ≤2^16-row weight table broadcasts back onto the feature stream, so
    the corpus is scanned exactly twice and never shuffled on anything
    wider than (id, feature). The integer products assume corpus feature
    counts ≤ ~9e9·B⁻¹ per bucket at 1e9-scale use the float form instead.

    Returns (id, *keep_cols, n_feats, weight_fp, avg_weight).
    """
    extra = list(keep_cols or [])
    feats = df.select(
        F.col(id_col),
        *extra,
        is_target.cast("long").alias("_tgt"),
        F.explode(_dsir_features(text_col)).alias("_f"),
    ).withColumn("_b", _bucket(F.col("_f")) % DSIR_BUCKETS)
    buckets = feats.groupBy("_b").agg(
        F.sum("_tgt").alias("_ct"), F.count("*").cast("long").alias("_cr")
    )
    totals = buckets.agg(
        F.sum("_ct").alias("_nt"), F.sum("_cr").alias("_nr")
    )
    w_fp = F.round(
        F.log(
            ((F.col("_ct") + 1) * (F.col("_nr") + DSIR_BUCKETS))
            / ((F.col("_cr") + 1) * (F.col("_nt") + DSIR_BUCKETS))
        )
        * F.lit(float(LM_SCALE)),
        0,
    ).cast("long")
    weights = F.broadcast(
        buckets.crossJoin(F.broadcast(totals)).select("_b", w_fp.alias("_w"))
    )
    scored = (
        feats.join(weights, "_b")
        .groupBy(id_col, *extra)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            F.sum("_w").alias("weight_fp"),
        )
    )
    return scored.withColumn(
        "avg_weight",
        F.round(F.col("weight_fp") / (F.lit(float(LM_SCALE)) * F.col("n_feats")), 6),
    )


# Stupid Backoff bigram LM (Brants et al., EMNLP'07) ------------------------

# round(ln(1/0.4)·1e9): the backoff penalty for α = 0.4 (the paper's
# constant), pre-quantized so both engines add the identical integer
SB_ALPHA_FP = 916_290_732


def bigram_logprob_scores(
    train_df: DataFrame,
    score_df: DataFrame,
    id_col: str,
    text_col: str,
    keep_cols: list[str] | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc NLL under a Stupid-Backoff bigram LM trained on
    ``train_df`` — the order-2 upgrade of ``unigram_logprob_scores``
    (token ORDER now matters: shuffled or spliced text scores high even
    when its unigram mix is perfectly in-distribution):

        S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})   if bigram seen
                         = α · c(w_i) / N                 else (α = 0.4)

    with a 1/N floor for fully-OOV tokens, and the first token of each
    doc scored by its unigram. Every log is taken ONCE of an exact count
    rational in the ln(num/den) form and fixed-pointed at 1e-9; per-doc
    sums are integer (the unigram/DSIR determinism contract). Returns
    (id, *keep_cols, n_tokens, n_backoff, nll_fp, nll).

    Scale shape: training is two hash aggs over the train token/bigram
    streams (map-side partials); scoring is the exploded score stream
    joined to the count tables — broadcast while the model fits
    (``broadcast_model``), shuffle joins with AQE above. The bigram
    table is |distinct bigrams|-sized, never positional.
    """
    extra = list(keep_cols or [])
    toks_t = train_df.select(F.explode(_tokens(text_col)).alias("term"))
    uni = toks_t.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("_c1"))
    total = uni.agg(F.sum("_c1").cast("long").alias("_n"))

    def pairs(col: str) -> Column:
        t = _tokens(col)
        return F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("prev"),
                    F.element_at(t, i + 1).alias("cur"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))

    bi = (
        train_df.select(F.explode(pairs(text_col)).alias("p"))
        .select("p.prev", "p.cur")
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("long").alias("_c2"))
    )
    uni_b = F.broadcast(uni) if broadcast_model else uni
    bi_b = F.broadcast(bi) if broadcast_model else bi

    ln_fp = lambda num, den: F.round(  # noqa: E731
        F.log(num.cast("double") / den.cast("double")) * F.lit(float(LM_SCALE)), 0
    ).cast("long")

    # first token of each non-empty doc: unigram score, no α penalty
    first = (
        score_df.select(
            F.col(id_col), *extra, F.element_at(_tokens(text_col), 1).alias("cur")
        )
        .filter(F.col("cur").isNotNull() & (F.col("cur") != ""))
        .join(uni_b.withColumnRenamed("term", "cur"), "cur", "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            *extra,
            ln_fp(F.col("_n"), F.coalesce(F.col("_c1"), F.lit(1))).alias("_lp"),
            F.lit(0).alias("_backoff"),
        )
    )
    # positions ≥ 2: bigram if seen, else α-penalized unigram backoff
    rest = (
        score_df.select(F.col(id_col), *extra, F.explode(pairs(text_col)).alias("p"))
        .select(id_col, *extra, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
        .join(bi_b, ["prev", "cur"], "left")
        .join(
            uni_b.select(F.col("term").alias("prev"), F.col("_c1").alias("_cprev")),
            "prev",
            "left",
        )
        .join(
            uni_b.select(F.col("term").alias("cur"), F.col("_c1").alias("_ccur")),
            "cur",
            "left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            *extra,
            F.when(F.col("_c2").isNotNull(), ln_fp(F.col("_cprev"), F.col("_c2")))
            .otherwise(
                F.lit(SB_ALPHA_FP)
                + ln_fp(F.col("_n"), F.coalesce(F.col("_ccur"), F.lit(1)))
            )
            .alias("_lp"),
            F.when(F.col("_c2").isNull(), 1).otherwise(0).alias("_backoff"),
        )
    )
    scored = (
        first.unionByName(rest)
        .groupBy(id_col, *extra)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_backoff").cast("long").alias("n_backoff"),
            F.sum("_lp").cast("long").alias("nll_fp"),
        )
    )
    return scored.withColumn(
        "nll",
        F.round(F.col("nll_fp") / (F.lit(float(LM_SCALE)) * F.col("n_tokens")), 6),
    )
