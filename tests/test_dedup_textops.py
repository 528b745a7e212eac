"""Unit tests: dedup families, similarity search, text analysis operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators import dedup, similarity, textops


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (4, "completely different words about spark shuffles here"),
        (5, "el la de los es un texto corto"),
        (6, "ab"),                                            # < 3 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(corpus):
    got = dedup.exact_duplicates(corpus, "doc_id", "text").collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 2
    assert got[0]["keep_id"] == 1


def test_shingles_short_doc_empty(corpus):
    sh = dedup.shingle_rows(corpus, "doc_id", "text", 3)
    assert sh.filter(F.col("doc_id") == 6).count() == 0
    # doc 1: 9 tokens → 7 shingles, all distinct
    assert sh.filter(F.col("doc_id") == 1).count() == 7


def test_minhash_finds_near_and_exact_dups(corpus):
    pairs = dedup.minhash_dedup_pairs(corpus, "doc_id", "text", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 3)] == 1.0          # exact dup
    assert (1, 2) in got and got[(1, 2)] > 0.5  # near dup
    assert all(a < b for a, b in got)
    assert not any({a, b} & {4, 5, 6} for a, b in got)


def test_simhash_near_pairs(corpus):
    # the one-word change flips 3 of 7 shingles → hamming 4 on 32 bits, so
    # test with a budget of 6 (band recall is only *guaranteed* ≤3, but the
    # pair shares its low byte so blocking still surfaces it)
    pairs = dedup.simhash_near_pairs(corpus, "doc_id", "text", max_hamming=6)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got[(1, 3)] == 0            # identical text → identical signature
    assert (1, 2) in got and 0 < got[(1, 2)] <= 6
    assert not any({4, 5} & {a, b} for a, b in got)


def test_simhash_deterministic(spark, corpus):
    a = {r["doc_id"]: r["simhash"] for r in
         dedup.simhash_signatures(corpus, "doc_id", "text").collect()}
    b = {r["doc_id"]: r["simhash"] for r in
         dedup.simhash_signatures(corpus.repartition(7), "doc_id", "text").collect()}
    assert a == b
    assert all(0 <= v < 2**32 for v in a.values())


def test_brute_force_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (10, [1.0, 0.1, 0.0]),   # closest to query 0
        (11, [0.0, 1.0, 0.0]),
        (12, [-1.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    c = df.filter("vec_id >= 10")
    got = similarity.brute_force_topk(c, q, "vec_id", "embedding", k=3).collect()
    ranked = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rk"])]
    assert ranked == [10, 11, 12]
    assert got[0]["cos"] <= 1.0


def test_norm_blocked_near_pairs(spark):
    rows = [
        (1, [3.0, 4.0]),      # norm 5
        (2, [3.0, 4.0]),      # identical → cos 1
        (3, [30.0, 40.0]),    # norm 50: different block, cos 1 with 1 but blocked away
        (4, [0.1, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # default SRP blocking is angle-based: parallel vectors of different
    # magnitude share every band, so the (1,3) cos=1 pair IS found
    got = {(r["id_a"], r["id_b"]) for r in
           similarity.norm_blocked_near_pairs(df, "vec_id", "embedding", 0.999).collect()}
    assert (1, 2) in got
    assert (1, 3) in got
    # explicit scalar block_col restores single-key blocking (and its trade)
    norm_got = {(r["id_a"], r["id_b"]) for r in
                similarity.norm_blocked_near_pairs(
                    df, "vec_id", "embedding", 0.999,
                    block_col=F.floor(similarity.l2_norm(F.col("embedding"))),
                ).collect()}
    assert (1, 2) in norm_got
    assert (1, 3) not in norm_got  # pruned by the norm block


def test_language_id(corpus):
    got = {r["doc_id"]: r["predicted_lang"] for r in
           textops.language_id(corpus, "doc_id", "text").collect()}
    assert got[1] == "en"
    assert got[5] == "es"
    assert got[6] == "und"


def test_quality_score_bounds(corpus):
    rows = textops.quality_score(corpus, "doc_id", "text").collect()
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
        assert r["n_types"] <= r["n_tokens"]
    by_id = {r["doc_id"]: r for r in rows}
    # doc 4: all distinct words, no stopwords → higher diversity than doc 1
    assert by_id[4]["diversity"] > by_id[1]["diversity"]


def test_fingerprint_stability_and_nulls(spark, corpus):
    fp = {r["doc_id"]: r["fingerprint"] for r in
          textops.fingerprint(corpus, "doc_id", "text").collect()}
    assert fp[1] == fp[3]          # identical text → identical fingerprint
    assert fp[1] != fp[4]
    assert fp[6] is None           # < k tokens
    fp2 = {r["doc_id"]: r["fingerprint"] for r in
           textops.fingerprint(corpus.repartition(5), "doc_id", "text").collect()}
    assert fp == fp2


def test_ngram_jaccard_freq_cap_bounds_hot_shingle(spark):
    """A boilerplate shingle shared by every doc must not generate O(n²)
    candidate pairs; true near-dups must still be found via their rare
    shingles, with Jaccard computed over ALL shingles."""
    boiler = "terms of service apply to all"
    rows = [(i, f"{boiler} item{i} alpha{i} beta{i} gamma{i}") for i in range(100)]
    rows += [(1000, rows[0][1] + " tail"), (1001, rows[1][1] + " tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    metrics = {}
    pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.5, df_cap=10, metrics=metrics
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1000) in got and (1, 1001) in got
    assert metrics["n_shingles_hot"] >= 4  # the boilerplate run of shingles
    # candidate generation excluded the hot shingles: without the cap the
    # boilerplate alone yields 102*101/2 ≈ 5k pairs; verified pairs stay 2
    assert len(got) == 2


def test_connected_components_transitive_chains(spark):
    """A~B, B~C, C~D must collapse to one cluster with the min id as
    canonical — pairwise keep-min would leave B,C,D pointing at different
    survivors. Isolated pair + chain + diamond all converge."""
    pairs = spark.createDataFrame(
        [
            (2, 9), (9, 4), (4, 7),          # chain: {2,4,7,9} → 2
            (10, 11), (10, 12), (11, 12),    # triangle: → 10
            (20, 21),                        # isolated pair → 20
        ],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["comp"] for r in dedup.connected_components(pairs).collect()}
    assert got == {2: 2, 9: 2, 4: 2, 7: 2,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_decontaminate_flags_benchmark_overlap(spark):
    """A training doc embedding a benchmark 5-gram verbatim is flagged;
    clean docs don't appear; ratio matches hand count."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            # contains bench 5-grams: 'alpha beta gamma delta epsilon' and
            # 'beta gamma delta epsilon zeta'
            (1, "x alpha beta gamma delta epsilon zeta y"),
            (2, "totally different words nothing shared here at all"),
            (3, "alpha beta gamma q delta epsilon zeta r s"),  # broken run
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           textops.decontaminate(train, bench, "doc_id", "text", k=5).collect()}
    assert set(got) == {1}
    r = got[1]
    assert r["n_matched"] == 2
    assert r["n_shingles"] == 4  # 8 tokens -> 4 distinct 5-grams
    assert r["contaminated"]  # 0.5 > 0.05


def test_repetition_stats_gopher_metrics(spark):
    """Hand-checkable repetition metrics: a looping doc breaches the
    dup-trigram and top-bigram thresholds; a diverse doc passes; a
    too-short doc yields zero gram metrics without NULLs."""
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 10),              # one bigram dominates
            (2, "one two three four five six seven eight nine ten"),
            (3, "solo"),                         # shorter than any bigram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           textops.repetition_stats(df, "doc_id", "text").collect()}
    # doc 1: 20 tokens, 19 bigrams, 'spam ham' occurs 10x
    assert got[1]["top_bigram_share"] == pytest.approx(10 / 19, abs=1e-6)
    assert got[1]["dup_trigram_frac"] == 1.0  # every trigram repeats
    assert got[1]["flagged"]
    assert got[2]["dup_trigram_frac"] == 0.0 and not got[2]["flagged"]
    assert got[3]["top_bigram_share"] == 0.0
    assert got[3]["dup_trigram_frac"] == 0.0
    assert got[3]["diversity"] == 1.0


def test_domain_mixture_weights_rebalance(spark):
    """Uniform target over 2 sources: weights invert the observed token
    shares and weighted shares sum back to 1."""
    df = spark.createDataFrame(
        [("a", "one two three four five six"), ("a", "seven eight"), ("b", "x y")],
        "source string, text string",
    )
    got = {r["source"]: r for r in
           textops.domain_mixture(df, "source", "text").collect()}
    assert got["a"]["n_tokens"] == 8 and got["b"]["n_tokens"] == 2
    assert got["a"]["observed_share"] == 0.8
    assert got["a"]["sampling_weight"] == pytest.approx(0.5 / 0.8, abs=1e-6)
    assert got["b"]["sampling_weight"] == pytest.approx(0.5 / 0.2, abs=1e-6)
    # explicit target shares
    got2 = {r["source"]: r for r in
            textops.domain_mixture(df, "source", "text",
                                   target_shares={"a": 0.25, "b": 0.75}).collect()}
    assert got2["a"]["target_share"] == 0.25
    assert got2["b"]["sampling_weight"] == pytest.approx(0.75 / 0.2, abs=1e-6)


def test_incremental_exact_dedup_statuses_and_bloom_parity(spark):
    corpus = spark.createDataFrame(
        [(1, "old text one"), (2, "Old Text One  "), (3, "old text two")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "old text one"),    # dup vs corpus (normalized)
            (11, "fresh text a"),    # unique
            (12, "fresh text b"),    # first of in-batch pair → unique
            (13, "FRESH TEXT B"),    # in-batch dup of 12 (normalized)
            (14, "old text two"),    # dup vs corpus AND would pair in batch? no — corpus wins
        ],
        "doc_id long, text string",
    )
    from anomalydetection_spark.operators import dedup

    got = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_exact_dedup(batch, corpus, "doc_id", "text").collect()
    }
    assert got == {
        10: "dup_vs_corpus",
        11: "unique",
        12: "unique",
        13: "dup_in_batch",
        14: "dup_vs_corpus",
    }
    plain = dedup.incremental_exact_dedup(batch, corpus, "doc_id", "text", use_bloom=False)
    assert {(r["doc_id"], r["status"]) for r in plain.collect()} == set(got.items())
