"""IVF vs brute-force: correctness of the prune + measured recall.

The IVF path trades recall for a |corpus|/k-sized search space; this test
pins (a) every IVF result is a true cosine (same values as brute force
computes for those pairs) and (b) recall@5 on the fixture embeddings is
reported and above a sanity floor — the quality/throughput trade is
*measured*, not assumed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators import similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def em(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_ivf_results_are_true_cosines(spark, em):
    centroids = em.filter(F.col("vec_id") < 8)
    corpus = em.filter(F.col("vec_id") >= 10)
    queries = em.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105))
    ivf = similarity.ivf_topk(corpus, queries, centroids, "vec_id", "embedding", k=5)
    brute = similarity.brute_force_topk(corpus, queries, "vec_id", "embedding", k=10**9)
    b = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in brute.collect()
    }
    for r in ivf.collect():
        assert b[(r["query_id"], r["neighbor_id"])] == r["cos"]


def _recall_at_5(ivf, brute):
    got = {}
    for r in ivf.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    want = {}
    for r in brute.collect():
        want.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(got.get(q, set()) & w) / len(w) for q, w in want.items()]
    return sum(recalls) / len(recalls), got


def test_ivf_recall_at_5(spark, em):
    centroids = em.filter(F.col("vec_id") < 8)
    corpus = em.filter(F.col("vec_id") >= 10)
    queries = em.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
    ivf = similarity.ivf_topk(
        corpus, queries, centroids, "vec_id", "embedding", k=5, nprobe=2
    )
    brute = similarity.brute_force_topk(corpus, queries, "vec_id", "embedding", k=5)
    recall, got = _recall_at_5(ivf, brute)
    # the fixture is ISOTROPIC random unit vectors (no cluster structure —
    # measured within/cross-label cosine both ≈ 0), so ANY cell pruning
    # caps recall near nprobe/k; the floor asserts the probe isn't
    # degenerate (random cells would give ~2/8 = 0.25)
    assert recall >= 0.3, f"recall@5={recall:.3f}"
    # a query's own vector is in the corpus and always lands in its own cell
    self_hits = sum(1 for q, g in got.items() if q in g)
    assert self_hits == len(got)


def test_kmeans_ivf_recall_on_clustered_corpus(spark):
    """The IVF contract on data with real cluster structure (its actual
    use case): kmeans_fit centroids + nprobe=2 must reach recall@5 ≥ 0.9
    against brute force."""
    import numpy as np

    rng = np.random.default_rng(11)
    n_clusters, per, d = 10, 60, 32
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(scale=0.12, size=(per, d))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        for j, p in enumerate(pts):
            rows.append((c * 1000 + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = similarity.kmeans_fit(df, "vec_id", "embedding", k=n_clusters, n_iters=5)
    corpus = df.filter(F.col("vec_id") % 1000 >= 5)
    queries = df.filter(F.col("vec_id") % 1000 < 2)
    ivf = similarity.ivf_topk(
        corpus, queries, cents, "vec_id", "embedding", k=5, nprobe=2
    )
    brute = similarity.brute_force_topk(corpus, queries, "vec_id", "embedding", k=5)
    recall, _ = _recall_at_5(ivf, brute)
    assert recall >= 0.9, f"recall@5={recall:.3f}"

    # determinism: same fit twice → identical centroids
    again = similarity.kmeans_fit(df, "vec_id", "embedding", k=n_clusters, n_iters=5)
    a = sorted(map(tuple, ((r["vec_id"], tuple(r["embedding"])) for r in cents.collect())))
    b = sorted(map(tuple, ((r["vec_id"], tuple(r["embedding"])) for r in again.collect())))
    assert a == b


def test_srp_blocking_bounded_on_unit_normalized(spark):
    """The degenerate case for scalar-norm blocking: every vector is unit
    norm, so floor(norm) puts ALL of them in one block (O(n²) pairs). SRP
    band buckets must keep candidates bounded by true near-dup structure
    AND still find every injected near-duplicate."""
    import numpy as np

    rng = np.random.default_rng(7)
    n, d = 400, 64
    V = rng.normal(size=(n, d))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(n)]
    # 20 injected near-dups of vectors 0..19 (tiny perturbation, renormalized)
    for i in range(20):
        w = V[i] + rng.normal(scale=1e-4, size=d)
        w /= np.linalg.norm(w)
        rows.append((1000 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cand = similarity.srp_candidate_pairs(df, "vec_id", "embedding")
    n_cand = cand.count()
    n_total = 420 * 419 // 2
    assert n_cand < 0.02 * n_total, f"{n_cand} candidates ≈ all-pairs {n_total}"

    pairs = similarity.norm_blocked_near_pairs(
        df, "vec_id", "embedding", threshold=0.999
    )
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, 1000 + i) for i in range(20)} <= found


def test_blas_topk_matches_jvm_operator(spark, em):
    """The Arrow/BLAS brute-force variant returns the same neighbors as the
    JVM expression operator (cos may differ in the last ulp before
    rounding, so sets match exactly and scores to 1e-6)."""
    corpus = em.filter(F.col("vec_id") >= 10)
    queries = em.filter(F.col("vec_id") < 10)
    jvm = similarity.brute_force_topk(corpus, queries, "vec_id", "embedding", k=5)
    blas = similarity.brute_force_topk_blas(corpus, queries, "vec_id", "embedding", k=5)
    a = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in jvm.collect()}
    b = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in blas.collect()}
    assert set(a) == set(b)
    for key in a:
        assert abs(a[key] - b[key]) <= 1e-6, (key, a[key], b[key])


def test_pq_topk_recall_and_true_cosines(spark):
    """PQ/ADC with exact rerank on the clustered corpus: recall@5 ≥ 0.8
    vs brute force, every returned cosine is the true cosine, and
    codebook training is deterministic."""
    import numpy as np

    rng = np.random.default_rng(23)
    n_clusters, per, d = 8, 50, 32
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(scale=0.15, size=(per, d))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        for j, p in enumerate(pts):
            rows.append((c * 1000 + j, [float(x) for x in p]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    corpus = df.filter(F.col("vec_id") % 1000 >= 3)
    queries = df.filter(F.col("vec_id") % 1000 < 2)

    pq = similarity.pq_topk(corpus, queries, "vec_id", "embedding", k=5, m=8, ksub=16)
    brute = similarity.brute_force_topk(corpus, queries, "vec_id", "embedding", k=5)
    recall, _ = _recall_at_5(pq, brute)
    assert recall >= 0.8, f"recall@5={recall:.3f}"

    # every PQ result carries the TRUE cosine (rerank contract)
    all_cos = {
        (r["query_id"], r["neighbor_id"]): r["cos"]
        for r in similarity.brute_force_topk(
            corpus, queries, "vec_id", "embedding", k=10**9
        ).collect()
    }
    for r in pq.collect():
        assert all_cos[(r["query_id"], r["neighbor_id"])] == r["cos"]

    # deterministic codebooks
    b1 = similarity.pq_train_codebooks(corpus, "vec_id", "embedding", m=8, ksub=16)
    b2 = similarity.pq_train_codebooks(corpus, "vec_id", "embedding", m=8, ksub=16)
    assert np.array_equal(b1, b2)


def test_semdedup_recall_with_trained_centroids(spark):
    """SemDeDup with kmeans_fit-trained centroids on a clustered corpus
    (the production config; the driver query fixes centroids only for the
    DuckDB twin): every injected near-duplicate must be caught — a
    perturbed copy lands in its original's cluster by construction — and
    the dup count stays a small fraction of the corpus (no all-pairs
    degeneracy marking everything duplicated)."""
    import numpy as np

    rng = np.random.default_rng(23)
    n_clusters, per, d = 8, 50, 32
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(scale=0.15, size=(per, d))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        for j, p in enumerate(pts):
            rows.append((c * 1000 + j, [float(x) for x in p]))
    # 16 injected near-dups (cos > 0.999 to their originals)
    originals = [c * 1000 for c in range(n_clusters)] + [c * 1000 + 1 for c in range(n_clusters)]
    by_id = dict(rows)
    for k, oid in enumerate(originals):
        v = np.array(by_id[oid])
        w = v + rng.normal(scale=1e-4, size=d)
        w /= np.linalg.norm(w)
        rows.append((50_000 + k, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = similarity.kmeans_fit(df, "vec_id", "embedding", k=n_clusters, n_iters=5)
    marked = similarity.semdedup(df, cents, "vec_id", "embedding", threshold=0.999)
    dups = {r["vec_id"] for r in marked.filter("is_dup").collect()}
    # every injected copy has a higher id than its original → must be marked
    assert {50_000 + k for k in range(len(originals))} <= dups
    # and the threshold keeps ordinary cluster-mates (cos ≪ 0.999) apart
    assert len(dups) <= len(originals) + 5
