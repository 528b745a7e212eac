"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the correctness baseline — broadcast the query
  set, JVM-side higher-order dot products, rank window per query.
- norm-bucket / LSH-blocked near-dup pairs: the scale path — candidate
  pruning before the quadratic join.

Scale design: brute force is O(|queries| × |corpus|) with the query side
broadcast — right for small query batches over huge corpora (each executor
streams its corpus partition once; no shuffle of the corpus). For
corpus×corpus near-dup the blocked variant bounds pairs per bucket.
Dot products use `F.aggregate` over zipped arrays — whole-stage-codegen
JVM loops, no Python. A Pandas-UDF matmul variant would win for k-NN with
thousands of queries (BLAS batching); at that point switch to
`mapInPandas` over broadcast query matrices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, sequential over the array (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    """Row-wise ||a||₂ — the reference's np.linalg.norm over the feature
    matrix (end_to_end_prediction.py:444), as a JVM higher-order reduce."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_id_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors per query: (query_id, neighbor_id, cos, rk).

    The ranking key is the cosine pre-rounded to 6 decimals (+ neighbor id
    tiebreak) so a last-ulp float difference can never reorder results.
    """
    qid = query_id_col or id_col
    q = F.broadcast(
        queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("_qvec"))
    )
    joined = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")).crossJoin(q)
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    Centroids are broadcast (there are k of them, k ≪ corpus); assignment
    is a crossJoin + per-row argmin via min(struct(dist, centroid_id)) —
    deterministic tie-break on centroid_id, all JVM-side. At 10^12 vectors
    this is one broadcast-join pass; a production system would train the
    centroids with k-means — here any deterministic centroid set works
    (the partitioning property is what matters, not centroid quality).
    Returns (id_col, cell, dist).
    """
    cents = F.broadcast(
        centroids.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
    )
    # squared L2 distance, sequential over the zipped arrays
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_cvec"), lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = corpus.crossJoin(cents).select(
        id_col,
        F.struct(F.round(d2, 6).alias("dist"), F.col("_cid").alias("cell")).alias("_dc"),
    )
    best = scored.groupBy(id_col).agg(F.min("_dc").alias("_best"))
    return best.select(id_col, F.col("_best.cell").alias("cell"), F.col("_best.dist").alias("dist"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """IVF-pruned cosine top-k: both sides are cell-assigned, then each
    query searches ONLY its own cell (nprobe=1) — the scale path where
    brute force's |q|×|corpus| join becomes |q|×|cell|.

    Recall is traded for the prune (a neighbor in another cell is missed);
    the brute-force operator is the correctness baseline to measure that
    trade against.
    """
    c_cells = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "cell"
    )
    q_cells = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "cell"
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")).join(
        c_cells, "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")).join(
        q_cells, "query_id"
    )
    joined = c.join(F.broadcast(q), "cell")
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def norm_blocked_near_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    block_col: Column | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cos ≥ threshold) with block
    pruning: candidates must share a coarse block (default: floor(norm))
    before the pairwise join — the LSH-shaped guard that keeps the join
    out of O(n²) territory. Custom ``block_col`` lets callers use real
    LSH bucket ids instead."""
    blocked = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        (block_col if block_col is not None else F.floor(l2_norm(F.col(vec_col)))).alias("_blk"),
    )
    a = blocked.select(F.col("_id").alias("id_a"), F.col("_vec").alias("vec_a"), "_blk")
    b = blocked.select(F.col("_id").alias("id_b"), F.col("_vec").alias("vec_b"), "_blk")
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos")
    )
    return scored.filter(F.col("cos") >= threshold)
