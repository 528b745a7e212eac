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

import hashlib

import numpy as np
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


def brute_force_topk_blas(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_id_col: str | None = None,
) -> DataFrame:
    """Arrow/BLAS variant of ``brute_force_topk`` for LARGE query batches:
    the query matrix is collected once (bounded by the query set, not the
    corpus), shipped in the UDF closure, and every corpus Arrow batch does
    ONE sgemm against it — thousands of queries per batch at memory
    bandwidth instead of |q| per-row expression evaluations.

    Emits per-partition top-k candidates from ``mapInPandas`` (k rows per
    query per input partition), then one global rank window per query —
    the shuffle carries k·|queries|·|partitions| candidate rows, never the
    |q|×|corpus| score matrix. Same output contract as the JVM operator:
    cosine rounded to 6, (cos desc, neighbor_id) ordering.
    """
    import pandas as pd

    qid = query_id_col or id_col
    qrows = queries.select(qid, vec_col).collect()
    q_ids = np.array([r[qid] for r in qrows])
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, cos double"

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = np.round(Qn @ Cn.T, 6)  # |q| × |batch| in one gemm
            n_keep = min(k, S.shape[1])
            # per-query top-k within the batch (argpartition: O(n) not sort)
            idx = np.argpartition(-S, n_keep - 1, axis=1)[:, :n_keep]
            rows = {
                "query_id": np.repeat(q_ids, n_keep),
                "neighbor_id": pdf[id_col].to_numpy()[idx].reshape(-1),
                "cos": np.take_along_axis(S, idx, axis=1).reshape(-1),
            }
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(gen, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return partial.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


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


def ivf_assign_topn(
    items: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    nprobe: int,
) -> DataFrame:
    """The ``nprobe`` nearest centroid cells per vector: (id, cell, probe_rk).

    Same broadcast-crossJoin distance pass as ``ivf_assign``; ranking is a
    window partitioned BY VECTOR (bounded: |centroids| rows per partition),
    deterministic on (rounded dist, cell)."""
    cents = F.broadcast(
        centroids.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("_cvec"),
            lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = items.crossJoin(cents).select(
        id_col, F.col("_cid").alias("cell"), F.round(d2, 6).alias("dist")
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cell")
    return (
        scored.withColumn("probe_rk", F.row_number().over(w))
        .filter(F.col("probe_rk") <= nprobe)
        .select(id_col, "cell", "probe_rk")
    )


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 16,
    n_iters: int = 5,
) -> DataFrame:
    """Deterministic Lloyd k-means over an embedding column → a centroids
    DataFrame shaped for ``ivf_topk`` (same id/vec column names).

    Per iteration: one broadcast-crossJoin assignment pass (argmin over k
    centroids, all JVM) + one element-wise mean (posexplode → (cell, dim)
    hash agg with map-side partials). Centroids collect k×d values to the
    driver each round — bounded by the model size, not the data. Init is
    the k vectors with the smallest md5(id) (a deterministic spread-out
    sample; no RNG state). At 10^12 rows fit on a sampled subset — the
    assignment pass is the only full-table scan the final index needs.
    Empty cells keep their previous centroid."""
    spark = df.sparkSession
    init = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init)]

    def cents_df(c):
        return spark.createDataFrame(c, f"{id_col} long, {vec_col} array<double>")

    for _ in range(n_iters):
        assigned = ivf_assign(df, cents_df(cents), id_col, vec_col).select(id_col, "cell")
        comp = (
            df.join(assigned, id_col)
            .select("cell", F.posexplode(vec_col).alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.avg("val").alias("m"))
        )
        rows = (
            comp.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("s"))
            .select("cell", F.transform("s", lambda x: x["m"]).alias("vec"))
            .collect()
        )
        new = {r["cell"]: [float(x) for x in r["vec"]] for r in rows}
        cents = [(c, new.get(c, v)) for c, v in cents]
    return cents_df(cents)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-pruned cosine top-k: the corpus is cell-assigned once, each
    query searches its ``nprobe`` nearest cells — the scale path where
    brute force's |q|×|corpus| join becomes |q|×(nprobe·|cell|).

    Recall is traded for the prune (a neighbor outside the probed cells is
    missed); the brute-force operator is the correctness baseline to
    measure that trade against, ``kmeans_fit`` trains centroids that match
    the data's structure, and ``nprobe`` dials the trade at query time.
    """
    c_cells = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "cell"
    )
    q_cells = ivf_assign_topn(queries, centroids, id_col, vec_col, nprobe).select(
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


def srp_sign_matrix(dim: int, n_bits: int, seed: str = "srp-v1") -> np.ndarray:
    """Deterministic ±1 random-hyperplane matrix (n_bits × dim).

    Signs derive from md5 over (seed, bit, component) — a public, stable
    hash — so the engine's Arrow UDF and the DuckDB oracle-SQL builder
    materialize the *identical* matrix with no RNG state to share.
    Rademacher (±1) projections are a valid signed-random-projection
    family for angular LSH (Charikar, STOC'02).
    """
    rows = []
    for j in range(n_bits):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:15], 16) % 2 == 0 else -1)
        rows.append(row)
    return np.array(rows, dtype=np.int64)


def srp_band_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_bands: int = 8,
    bits_per_band: int = 12,
    quant: int = 1_000_000,
    seed: str = "srp-v1",
) -> DataFrame:
    """LSH band signatures via signed random projections: one row per
    (vector, band) with the band's packed bit value — join on
    (band, band_val) is the bucket probe.

    Vectorized Arrow UDF (mapInPandas): each batch does ONE int64 matmul
    against the deterministic hyperplane matrix. Components are quantized
    with floor(x·quant) first so every downstream sum is exact integer
    arithmetic — signatures are bit-identical across engines, batch
    orders, and partitionings (a float dot near 0 could otherwise flip a
    sign between Spark and the DuckDB oracle).

    Scale: n_bands rows of 3 small columns per vector, no shuffle here;
    the bucket join downstream shuffles only (id, band, band_val).
    """
    import pandas as pd

    n_bits = n_bands * bits_per_band
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, band int, band_val long"
    narrow = df.select(id_col, vec_col)

    def gen(batches):
        S = None
        powers = 1 << np.arange(bits_per_band, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if S is None:
                S = srp_sign_matrix(V.shape[1], n_bits, seed)
            Q = np.floor(V * quant).astype(np.int64)
            bits = ((Q @ S.T) >= 0).astype(np.int64)
            vals = bits.reshape(len(V), n_bands, bits_per_band) @ powers
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(V)),
                    "band_val": vals.reshape(-1),
                }
            )

    return narrow.mapInPandas(gen, out_schema)


def srp_candidate_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_bands: int = 8,
    bits_per_band: int = 12,
    seed: str = "srp-v1",
) -> DataFrame:
    """Distinct (id_a, id_b) candidate pairs sharing ≥1 SRP band bucket.

    The shuffle carries only signatures; bucket sizes concentrate near 1
    for spread-out corpora (random vectors collide per band w.p. ≈2^-bits),
    so pair generation is bounded by true-near-duplicate clusters — never
    the O(n²) blowup of coarse scalar blocking keys."""
    sigs = srp_band_signatures(
        df, id_col, vec_col, n_bands=n_bands, bits_per_band=bits_per_band, seed=seed
    )
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "band_val")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "band_val")
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def srp_blocked_near_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    n_bands: int = 8,
    bits_per_band: int = 12,
    seed: str = "srp-v1",
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cos ≥ threshold): SRP band
    buckets generate candidates, exact cosine verifies them. Recall per
    true pair at cos=c is 1-(1-p^r)^b with p = 1-arccos(c)/π — ≈0.999 at
    the defaults for c ≥ 0.99."""
    cand = srp_candidate_pairs(
        df, id_col, vec_col, n_bands=n_bands, bits_per_band=bits_per_band, seed=seed
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    scored = cand.join(va, "id_a").join(vb, "id_b").select(
        "id_a", "id_b", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos")
    )
    return scored.filter(F.col("cos") >= threshold)


def norm_blocked_near_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    block_col: Column | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cos ≥ threshold) with block
    pruning before the pairwise join.

    Default blocking is SRP vector-LSH (``srp_blocked_near_pairs``): real
    embedding corpora are unit-normalized or norm-concentrated, so any
    scalar norm-derived key collapses to one block and the join degrades
    to O(n²). A caller-supplied ``block_col`` (e.g. a language or tenant
    partition) still short-circuits to single-key blocking."""
    if block_col is None:
        return srp_blocked_near_pairs(df, id_col, vec_col, threshold=threshold)
    blocked = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        block_col.alias("_blk"),
    )
    a = blocked.select(F.col("_id").alias("id_a"), F.col("_vec").alias("vec_a"), "_blk")
    b = blocked.select(F.col("_id").alias("id_b"), F.col("_vec").alias("vec_b"), "_blk")
    pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos")
    )
    return scored.filter(F.col("cos") >= threshold)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN — the memory-scale path
# ---------------------------------------------------------------------------


def pq_train_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    n_train: int = 1024,
    n_iters: int = 8,
) -> np.ndarray:
    """Deterministic PQ codebooks, shape (m, ksub, d/m).

    Vectors are unit-normalized and split into ``m`` subspaces; each
    subspace gets its own Lloyd k-means run over a bounded training
    sample (the ``n_train`` rows with smallest md5(id) — PQ training on
    a sample is standard practice; the full corpus is only ever
    ENCODED, one pass). Init per subspace = first ``ksub`` distinct
    sub-vectors in sample order; ties and iteration order are fully
    deterministic, so two fits produce identical codebooks.
    """
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_train)
        .collect()
    )
    V = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    d = V.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    books = np.zeros((m, ksub, dsub))
    for s in range(m):
        X = V[:, s * dsub : (s + 1) * dsub]
        # init: first ksub distinct sub-vectors in (md5-ordered) sample order
        seen: list[tuple] = []
        for row in X:
            t = tuple(np.round(row, 12))
            if t not in seen:
                seen.append(t)
            if len(seen) == ksub:
                break
        C = np.array(seen, dtype=np.float64)
        if C.shape[0] < ksub:  # degenerate sample: pad by repeating
            C = np.vstack([C] * (ksub // max(1, C.shape[0]) + 1))[:ksub]
        for _ in range(n_iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    C[c] = X[mask].mean(axis=0)
        books[s] = C
    return books


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks: np.ndarray
) -> DataFrame:
    """One-pass corpus encoding: (id, codes array<int>) — m small ints
    per vector (d·4 bytes → m bytes at ksub ≤ 256: 32× compression at
    d=64/m=8, which is what lets a 10^12-vector index live in cluster
    RAM). Vectorized Arrow batches: per subspace one (batch × ksub)
    distance matrix + argmin, no Python per row."""
    import pandas as pd

    m, ksub, dsub = codebooks.shape
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True)
            codes = np.zeros((len(V), m), dtype=np.int32)
            for s in range(m):
                X = V[:, s * dsub : (s + 1) * dsub]
                d2 = ((X[:, None, :] - codebooks[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    return df.select(id_col, vec_col).mapInPandas(gen, f"{id_col} {id_type}, codes array<int>")


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank_factor: int = 4,
) -> DataFrame:
    """Compressed-domain cosine top-k via PQ + asymmetric distance (ADC),
    exact-reranked: codes are scored against per-query lookup tables
    (m×ksub sub-distances, computed once per task), the top
    ``k·rerank_factor`` ADC candidates per query are re-scored with
    EXACT cosine, and the final top-k ranks on the exact value — so
    every returned cosine is true (same contract as ``ivf_topk``), with
    PQ deciding only which candidates get the exact computation.

    Scale: the scan streams m-byte codes, not d·4-byte vectors; the
    shuffle carries k·rerank_factor·|queries| candidate rows per input
    partition; the exact rerank touches |candidates| vectors. Unlike
    IVF this needs no cell-balanced data; compose with IVF (IVF-PQ) by
    encoding within cells when both memory and probe pruning matter.
    On unit-normalized vectors L2-ADC ordering is cosine ordering.
    """
    import pandas as pd

    books = pq_train_codebooks(corpus, id_col, vec_col, m=m, ksub=ksub)
    codes = pq_encode(corpus, id_col, vec_col, books)

    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in qrows])
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    dsub = Q.shape[1] // m
    # per-query LUT: luts[q, s, c] = ||Q[q,sub s] - codeword c||^2
    luts = np.stack(
        [
            ((Q[:, s * dsub : (s + 1) * dsub][:, None, :] - books[s][None, :, :]) ** 2).sum(
                axis=2
            )
            for s in range(m)
        ],
        axis=1,
    )
    n_keep = k * rerank_factor

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["codes"].to_numpy())  # (n, m)
            # ADC: sum LUT entries the codes select — (nq, n) via take_along
            D = np.zeros((len(q_ids), len(C)))
            for s in range(m):
                D += luts[:, s, :][:, C[:, s]]
            keep = min(n_keep, D.shape[1])
            idx = np.argpartition(D, keep - 1, axis=1)[:, :keep]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, keep),
                    "neighbor_id": pdf[id_col].to_numpy()[idx].reshape(-1),
                    "adc": np.round(np.take_along_axis(D, idx, axis=1), 6).reshape(-1),
                }
            )

    partial = codes.mapInPandas(score, "query_id long, neighbor_id long, adc double")
    w_adc = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    cand = partial.withColumn("_rk", F.row_number().over(w_adc)).filter(
        F.col("_rk") <= n_keep
    )
    # exact rerank: true cosine on the candidate set only
    qv = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qv"), F.col("_cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def semdedup(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space, then inside each cluster mark a vector as a *semantic
    duplicate* when its cosine to some lower-id cluster-mate reaches
    ``threshold``. The lower id is the deterministic keeper, matching the
    exact-dedup keep-min convention.

    Returns (id, cell, is_dup) — one row per corpus vector.

    Scale shape: clustering bounds the candidate pairs (never all-pairs
    — the within-cell self-join shuffles on ``cell`` only and each cell
    is |cell|² local work); assignment is one broadcast-centroid pass
    (``ivf_assign``). At 10^12 vectors the cell count is chosen so cells
    fit an executor (k ≈ n / target_cell); a skewed hot cell is split by
    AQE or by re-clustering that cell with a finer codebook. Cosine is
    rounded to 6 decimals before the threshold compare (cross-engine
    determinism contract shared with the dedup/ANN operators).
    """
    assigned = ivf_assign(corpus, centroids, id_col, vec_col).select(id_col, "cell")
    vecs = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_vec")
    ).join(assigned, id_col)
    a = vecs.select(
        F.col(id_col).alias("id_a"), F.col("_vec").alias("_va"), "cell"
    )
    b = vecs.select(
        F.col(id_col).alias("id_b"), F.col("_vec").alias("_vb"), "cell"
    )
    pairs = a.join(b, "cell").filter(F.col("id_a") < F.col("id_b"))
    cos = F.round(cosine(F.col("_va"), F.col("_vb")), 6)
    dup_ids = (
        pairs.select("id_b", cos.alias("_cos"))
        .filter(F.col("_cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        vecs.select(id_col, "cell")
        .join(dup_ids, id_col, "left")
        .select(id_col, "cell", F.coalesce("_dup", F.lit(False)).alias("is_dup"))
    )


# exact fixed-point class-centroid statistics --------------------------------

CENTROID_SCALE = 1_000_000


def class_centroid_stats(
    df: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Per-class centroid norm and dispersion over an embedding column,
    computed EXACTLY in fixed point so the result is summation-order-proof
    (the order float vector sums arrive in differs run-to-run on a
    cluster; quantized bigint sums never do).

    Components quantize to floor(x·1e6 + ½) — floor, not round: Spark's
    ``round`` goes through the decimal string (BigDecimal.valueOf) while
    other engines round the binary double, and the two disagree on values
    whose shortest decimal form ends in .5; ``floor(d + 0.5)`` is plain
    IEEE arithmetic and bit-identical everywhere. Per-(label, dim) sums and
    sums-of-squares are exact bigints; then
      ``centroid_norm``  = sqrt(Σ_d sum_fp²) / (1e6·n)
      ``mean_sq_dist``   = (n·Σ_d sumsq_fp − Σ_d sum_fp²) / (n²·1e12)
    using E‖x−c‖² = E‖x‖² − ‖c‖² — both derive from one integer
    numerator, one IEEE-exact sqrt/division, rounded to 6.

    Scale shape: posexplode streams the vectors once into a
    (label, dim)-keyed hash agg (map-side partials absorb the dimension
    fan-out); the second agg is |labels|·d rows. No windows, no Python.
    Integer bounds: safe while n·Σx_fp² < 2^63 — i.e. corpora up to
    ~10^5 vectors per label at ‖x‖∞ ≤ 10, d = 1024; shard larger classes
    or drop to DECIMAL(38) sums.

    Returns (label, n_vecs, norm2_num, centroid_norm, mean_sq_dist).
    """
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x * F.lit(float(CENTROID_SCALE)) + F.lit(0.5)).cast("long"),
    )
    ex = df.select(F.col(label_col).alias("label"), F.posexplode(q).alias("dim", "x_fp"))
    per_dim = ex.groupBy("label", "dim").agg(
        F.sum("x_fp").alias("sum_fp"),
        F.sum(F.col("x_fp") * F.col("x_fp")).alias("sumsq_fp"),
        F.count("*").cast("long").alias("n"),
    )
    per_label = per_dim.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.sum(F.col("sum_fp") * F.col("sum_fp")).alias("norm2_num"),
        F.sum("sumsq_fp").alias("sumsq_total"),
    )
    s = float(CENTROID_SCALE)
    return per_label.select(
        "label",
        "n_vecs",
        "norm2_num",
        F.round(
            F.sqrt(F.col("norm2_num")) / (F.lit(s) * F.col("n_vecs")), 6
        ).alias("centroid_norm"),
        F.round(
            (F.col("n_vecs") * F.col("sumsq_total") - F.col("norm2_num"))
            / (F.col("n_vecs") * F.col("n_vecs") * F.lit(s * s)),
            6,
        ).alias("mean_sq_dist"),
    )
