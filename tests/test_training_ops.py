"""Unit tests: batch-5 training-corpus operators — duplicate-window
coverage, SemDeDup, hashed linear quality classifier."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators import dedup, similarity, textops


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon completely different tail here"),
        (3, "totally unrelated words that no other document shares at all"),
        (4, "short doc"),  # < k tokens → zero windows
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_window_hashes_positions(corpus):
    w = dedup.window_hashes(corpus, "doc_id", "text", k=5)
    got = {r["doc_id"]: r["n"] for r in w.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    # doc1: 8 tokens → 4 windows; doc2: 9 → 5; doc3: 10 → 6; doc4: absent
    assert got == {1: 4, 2: 5, 3: 6}


def test_duplicate_window_coverage(corpus):
    cov = {r["doc_id"]: r for r in dedup.duplicate_window_coverage(
        corpus, "doc_id", "text", k=5).collect()}
    assert set(cov) == {1, 2, 3, 4}
    # docs 1 and 2 share exactly one 5-token window: "alpha beta gamma delta epsilon"
    assert cov[1]["n_dup_windows"] == 1 and cov[1]["n_windows"] == 4
    assert cov[2]["n_dup_windows"] == 1 and cov[2]["n_windows"] == 5
    assert cov[3]["n_dup_windows"] == 0
    # zero-window doc is reported, not dropped; fraction is NULL not 0/0
    assert cov[4]["n_windows"] == 0 and cov[4]["dup_frac"] is None
    assert cov[1]["dup_frac"] == 0.25
    assert cov[2]["dup_frac"] == 0.2


def test_duplicate_window_within_doc_repeat(spark):
    # a window repeated inside ONE doc is not cross-doc duplicated...
    solo = spark.createDataFrame(
        [(1, "x y z w v x y z w v")], "doc_id long, text string"
    )
    got = dedup.duplicate_window_coverage(solo, "doc_id", "text", k=5).collect()[0]
    assert got["n_dup_windows"] == 0
    # ...but once a second doc shares it, every occurrence in both docs counts
    both = spark.createDataFrame(
        [(1, "x y z w v x y z w v"), (2, "x y z w v")],
        "doc_id long, text string",
    )
    cov = {r["doc_id"]: r for r in dedup.duplicate_window_coverage(
        both, "doc_id", "text", k=5).collect()}
    assert cov[1]["n_dup_windows"] == 2  # positions 1 and 6
    assert cov[2]["n_dup_windows"] == 1


@pytest.fixture(scope="module")
def vectors(spark):
    # two tight clusters on orthogonal axes + one exact copy + one near-copy
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.9, 0.1, 0.0, 0.0]),
        (11, [0.9, 0.1, 0.0, 0.0]),      # exact copy of 10 → dup
        (12, [0.88, 0.12, 0.01, 0.0]),   # near 10 (cos > 0.95) → dup
        (20, [0.1, 0.95, 0.0, 0.0]),
        (21, [0.0, 0.0, 1.0, 0.0]),      # closer to cell 1 but far from all → kept
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_semdedup_marks_cluster_local_dups(vectors):
    centroids = vectors.filter(F.col("vec_id") < 2)
    got = {r["vec_id"]: r for r in similarity.semdedup(
        vectors.filter(F.col("vec_id") >= 10), centroids,
        "vec_id", "embedding", threshold=0.95).collect()}
    assert set(got) == {10, 11, 12, 20, 21}
    # lower id keeps; higher-id copies are the duplicates
    assert not got[10]["is_dup"]
    assert got[11]["is_dup"] and got[12]["is_dup"]
    assert not got[20]["is_dup"] and not got[21]["is_dup"]
    # assignment is the real coarse quantizer: x-axis docs in cell 0
    assert got[10]["cell"] == 0 and got[20]["cell"] == 1


def test_semdedup_cross_cluster_pairs_invisible(spark):
    # identical vectors forced into different cells are NOT compared —
    # the documented clustering trade-off (recall bounded by the quantizer)
    rows = [(0, [1.0, 0.0]), (1, [-1.0, 0.0]),
            (10, [1.0, 0.0]), (11, [-1.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = vecs.filter(F.col("vec_id") < 2)
    got = {r["vec_id"]: r["is_dup"] for r in similarity.semdedup(
        vecs.filter(F.col("vec_id") >= 10), cents, "vec_id", "embedding").collect()}
    assert got == {10: False, 11: False}


def test_classifier_scores_contract(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "zzz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.classifier_scores(docs, "doc_id", "text").collect()}
    # deterministic: identical text → identical score
    assert got[1]["sum_weight"] == got[2]["sum_weight"]
    assert got[1]["score"] == got[2]["score"]
    # keep ⇔ sum_weight > 0 ⇔ sigmoid > 0.5 (exact integer predicate)
    for r in got.values():
        assert r["keep"] == (r["sum_weight"] > 0)
        assert (r["score"] > 0.5) == r["keep"] or r["sum_weight"] == 0
        # score matches sigmoid of the fixed-point mean
        s = r["sum_weight"] / (textops.CLASSIFIER_MOD * r["n_tokens"])
        assert abs(r["score"] - 1.0 / (1.0 + math.exp(-s))) < 1e-6
    assert got[1]["n_tokens"] == 4


def test_classifier_weight_range(spark):
    # weights are bounded fixed-point integers (no overflow at any bucket)
    half = (textops.CLASSIFIER_MOD - 1) // 2
    docs = spark.createDataFrame(
        [(1, " ".join(f"tok{i}" for i in range(1000)))], "doc_id long, text string"
    )
    r = textops.classifier_scores(docs, "doc_id", "text").collect()[0]
    assert abs(r["sum_weight"]) <= half * r["n_tokens"]


def test_bm25_manual_reference(spark):
    import math

    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    qset = {1: "apple cherry", 2: "banana missingterm", 3: "durian"}
    q = spark.createDataFrame(list(qset.items()), "query_id long, qtext string")
    from anomalydetection_spark.operators import retrieval

    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_scores(d, q, "doc_id", "text").collect()
    }

    # single-node reference (same formula, float math)
    toks = {i: t.split() for i, t in docs}
    n, avgdl = 3, sum(len(v) for v in toks.values()) / 3
    dfreq = {"apple": 1, "banana": 2, "cherry": 2, "durian": 1}

    def bm25(qterms, did):
        s = 0.0
        for t in qterms:
            tf = toks[did].count(t)
            if tf == 0 or t not in dfreq:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks[did]) / avgdl))
        return s

    for (qid, did), score in got.items():
        assert abs(score - bm25(qset[qid].split(), did)) < 1e-5
    # only docs sharing ≥1 query term appear: 'durian' matches doc 3 alone
    assert {(qid, did) for (qid, did) in got if qid == 3} == {(3, 3)}
    # a query term absent from the corpus contributes nothing but doesn't
    # block the other terms
    assert (2, 1) in got and (2, 2) in got and (2, 3) not in got


def test_bm25_topk_rank_determinism(spark):
    from anomalydetection_spark.operators import retrieval

    # identical docs → identical scores → ties broken by ascending id
    d = spark.createDataFrame(
        [(i, "same words here") for i in range(5)], "doc_id long, text string"
    )
    q = spark.createDataFrame([(1, "same words")], "query_id long, qtext string")
    got = retrieval.bm25_topk(d, q, "doc_id", "text", k=3).orderBy("rk").collect()
    assert [r["doc_id"] for r in got] == [0, 1, 2]


def test_unigram_logprob_scores(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a a b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in textops.unigram_logprob_scores(docs, "doc_id", "text").collect()
    }
    # corpus counts: a=6, b=1, c=1, total=8
    lp = {"a": -math.log(6 / 8), "b": -math.log(1 / 8), "c": -math.log(1 / 8)}
    exp1 = round(4 * round(lp["a"] * 1e9) / (1e9 * 4), 6)
    exp2_fp = 2 * round(lp["a"] * 1e9) + round(lp["b"] * 1e9) + round(lp["c"] * 1e9)
    assert got[1]["nll"] == exp1
    assert got[2]["nll_fp"] == exp2_fp
    # the common-token-only doc scores LOWER than the rare-token doc
    assert got[1]["nll"] < got[2]["nll"]


def test_unigram_broadcast_vs_shuffle_identical(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3} common") for i in range(40)],
        "doc_id long, text string",
    )
    a = textops.unigram_logprob_scores(docs, "doc_id", "text", broadcast_vocab=True)
    b = textops.unigram_logprob_scores(docs, "doc_id", "text", broadcast_vocab=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# reciprocal-rank fusion
# ---------------------------------------------------------------------------


def test_rrf_fuse_hand_computed(spark):
    """Fused scores are exact int64 reciprocal sums; a doc on both lists
    beats a better-ranked doc on one list when the sums say so."""
    from anomalydetection_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, "d1", 1), (1, "d2", 2), (1, "d3", 3)], "qid long, id string, rk int"
    )
    dense = spark.createDataFrame(
        [(1, "d2", 1), (1, "d4", 2)], "qid long, id string, rk int"
    )
    got = {r["id"]: r for r in rrf_fuse([lex, dense], "qid", "id").collect()}
    fp = lambda rk: round(1e9 / (60 + rk))  # noqa: E731
    assert got["d2"]["rrf_fp"] == fp(2) + fp(1) and got["d2"]["n_lists"] == 2
    assert got["d1"]["rrf_fp"] == fp(1) and got["d1"]["n_lists"] == 1
    assert got["d4"]["rrf_fp"] == fp(2)
    # both-lists d2 outranks single-list rank-1 d1
    assert got["d2"]["rrf_fp"] > got["d1"]["rrf_fp"]


def test_rrf_topk_deterministic_ties(spark):
    """Equal fused scores break by id ascending; topk truncates per query
    independently."""
    from anomalydetection_spark.operators.retrieval import rrf_fuse

    l1 = spark.createDataFrame(
        [(1, "b", 1), (1, "a", 2), (2, "z", 1)], "qid long, id string, rk int"
    )
    l2 = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "y", 1)], "qid long, id string, rk int"
    )
    out = rrf_fuse([l1, l2], "qid", "id", topk=1).collect()
    by_q = {r["qid"]: r for r in out}
    # q1: a and b tie exactly (ranks {1,2} vs {2,1}) → id asc wins
    assert by_q[1]["id"] == "a" and by_q[1]["rk"] == 1
    # q2: y and z tie on single rank-1 entries → y first
    assert by_q[2]["id"] == "y"


# ---------------------------------------------------------------------------
# Stupid-Backoff bigram LM
# ---------------------------------------------------------------------------


def test_bigram_scores_hand_computed(spark):
    """Tiny train corpus with known counts: in-distribution bigrams score
    ln(c_prev/c_bigram), unseen bigrams pay the alpha penalty plus the
    unigram backoff, OOV tokens hit the 1/N floor."""
    from anomalydetection_spark.operators.textops import (
        LM_SCALE,
        SB_ALPHA_FP,
        bigram_logprob_scores,
    )

    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    # counts: a=3, b=3, c=1, N=7; bigrams: (a,b)=3, (b,a)=1, (b,c)=1
    score = spark.createDataFrame(
        [(10, "a b"), (11, "c a"), (12, "z")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in bigram_logprob_scores(train, score, "doc_id", "text").collect()
    }
    fp = lambda num, den: round(math.log(num / den) * LM_SCALE)  # noqa: E731

    # doc 10: first token 'a' → ln(7/3); bigram (a,b) seen c2=3, c_prev=3 → ln(3/3)=0
    assert got[10]["n_tokens"] == 2 and got[10]["n_backoff"] == 0
    assert got[10]["nll_fp"] == fp(7, 3) + fp(3, 3)
    # doc 11: first 'c' → ln(7/1); bigram (c,a) unseen → alpha + ln(7/3)
    assert got[11]["n_backoff"] == 1
    assert got[11]["nll_fp"] == fp(7, 1) + SB_ALPHA_FP + fp(7, 3)
    # doc 12: single OOV token → unigram floor ln(7/1), no pairs
    assert got[12]["n_tokens"] == 1 and got[12]["n_backoff"] == 0
    assert got[12]["nll_fp"] == fp(7, 1)


def test_bigram_flags_reordered_text(spark):
    """Token order sensitivity — the reason to go order-2: a doc whose
    tokens are a permutation of in-distribution text is unigram-invisible
    but pays bigram backoff on nearly every transition."""
    from anomalydetection_spark.operators.textops import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    train = spark.createDataFrame(
        [(i, base) for i in range(20)], "doc_id long, text string"
    )
    rev = " ".join(base.split()[::-1])
    score = spark.createDataFrame(
        [(100, base), (101, rev)], "doc_id long, text string"
    )
    bg = {r["doc_id"]: r for r in bigram_logprob_scores(train, score, "doc_id", "text").collect()}
    assert bg[100]["n_backoff"] == 0
    assert bg[101]["n_backoff"] > 5
    assert bg[101]["nll"] > bg[100]["nll"] + 1.0
    # the unigram scorer cannot tell a permutation apart: identical
    # token multiset ⇒ identical unigram NLL on both docs
    ug = {
        r["doc_id"]: r["nll_fp"]
        for r in unigram_logprob_scores(score, "doc_id", "text").collect()
    }
    assert ug[100] == ug[101]
