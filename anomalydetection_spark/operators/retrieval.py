r"""Distributed BM25 lexical retrieval.

The sparse complement to the dense ANN operators (similarity.py): the
reference ranks rows by a learned dense score
(end_to_end_prediction.py:444); web-corpus pipelines additionally need
lexical top-k lookup (retrieval QA, decontamination probes, boilerplate
hunting). BM25 (Robertson–Spärck Jones / Okapi, public literature) over
whitespace tokens.

Cross-engine determinism: every count (tf, df, doc length, N) is an
exact integer; the only floats are the per-term idf/saturation arithmetic
(identical sequential scalar ops in any engine) and per-term
contributions are quantized to 1e-9 fixed point and INTEGER-summed per
(query, doc), so float summation order can never flip a score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SCALE = 1_000_000_000  # fixed-point quantum for score sums


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score per (query, doc) sharing ≥1 term: (query_id, id, score).

    Scale shape (the part that matters at 10^12 docs): doc tokens are
    filtered to the query vocabulary BEFORE the tf aggregate — the
    vocabulary is broadcast, so the per-(doc, term) posting table is
    bounded by |docs| × |query vocab|, never the full inverted index.
    Doc length rides the explode (no self-join); corpus totals (N, Σdl)
    are one scalar agg broadcast back; df per term is |vocab| rows,
    broadcast into the scoring join. One shuffle total: the
    (query, doc) score aggregation.
    """
    toks = docs.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("dl"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    corpus = docs.select(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long").alias("dl")
    ).agg(F.count("*").alias("n_docs"), F.sum("dl").alias("total_len"))
    qterms = queries.select(
        F.col(qid_col), F.explode(F.split(F.trim(F.col(qtext_col)), r"\s+")).alias("term")
    ).distinct()
    vocab = qterms.select("term").distinct()
    tf = (
        toks.join(F.broadcast(vocab), "term")
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(corpus))
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib_fp = F.round(idf * sat * F.lit(float(SCALE)), 0).cast("long")
    per_pair = scored.select(qid_col, id_col, contrib_fp.alias("_fp"))
    return (
        per_pair.groupBy(qid_col, id_col)
        .agg(F.sum("_fp").alias("_sfp"))
        .select(
            qid_col,
            id_col,
            F.round(F.col("_sfp") / F.lit(float(SCALE)), 6).alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs per query by BM25: (query_id, id, score, rk).

    The rank window partitions by query over the matched docs — fine for
    interactive query sets; a huge batch lookup (decontamination at
    10^12) should pre-top-k per partition first, exactly the
    ``brute_force_topk_blas`` two-phase pattern (similarity.py:76).
    Deterministic ties: (score desc, id asc).
    """
    scores = bm25_scores(docs, queries, id_col, text_col, qid_col, qtext_col, k1, b)
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.col(id_col).asc())
    return scores.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def rrf_fuse(
    ranked_lists: list[DataFrame],
    qid_col: str,
    id_col: str,
    rk_col: str = "rk",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of per-query rank lists (Cormack/Clarke/
    Buettcher SIGIR'09): score(d) = Σ_lists 1/(k + rank_list(d)) — the
    standard hybrid-retrieval combiner (lexical BM25 + dense ANN), robust
    because it consumes only RANKS, so the lists' incomparable raw score
    scales never need calibration.

    Each input frame carries (qid_col, id_col, rk_col) with rk ≥ 1;
    candidates absent from a list contribute 0 from it (the standard
    convention). Returns (qid_col, id_col, rrf_fp, n_lists[, rk]).

    Determinism: each contribution is quantized to 1e-9 fixed point —
    round(1e9/(k+rk)) as int64 — and INTEGER-summed, so float summation
    order can never flip a fused score (the BM25 contract, above). No
    tie sits on a .5 rounding boundary for k=60 and any plausible depth:
    1e9/(60+rk) = z+0.5 needs 60+rk to be an odd divisor of 2·10⁹, and
    the smallest such above 60 is 125.

    Scale: inputs are already per-query top-depth lists (bounded rows);
    the union + one hash aggregate is the only shuffle, keyed by
    (query, doc). With ``topk`` a per-query rank window follows —
    partitioned by query, never partition-less. Deterministic ties:
    (rrf_fp desc, id asc).
    """
    contrib = F.round(F.lit(1e9) / (F.lit(k) + F.col(rk_col).cast("double")), 0).cast(
        "long"
    )
    parts = [
        r.select(
            F.col(qid_col).alias("_qid"),
            F.col(id_col).alias("_id"),
            contrib.alias("_fp"),
        )
        for r in ranked_lists
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = (
        u.groupBy("_qid", "_id")
        .agg(
            F.sum("_fp").cast("long").alias("rrf_fp"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .select(
            F.col("_qid").alias(qid_col),
            F.col("_id").alias(id_col),
            "rrf_fp",
            "n_lists",
        )
    )
    if topk is None:
        return fused
    w = Window.partitionBy(qid_col).orderBy(F.desc("rrf_fp"), F.col(id_col).asc())
    return fused.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= topk)
