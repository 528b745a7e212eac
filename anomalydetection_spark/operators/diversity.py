"""Diversity selection: farthest-point (k-center greedy) coreset sampling.

Training-data curation doesn't only REMOVE near-duplicates (operators/
dedup.py, similarity.py) — it also SELECTS maximally-spread exemplars:
seed sets for active learning, eval-set construction, per-cluster
representatives. The 2-approximation for the k-center objective is the
classic greedy (Gonzalez 1985): start from a seed, then repeatedly take
the point farthest from everything selected so far.

Determinism: the seed is the LOWEST id (no RNG), every argmax tie breaks
by id ascending, and all arithmetic runs in float64 over the float32
inputs in document order — the same greedy on the same table always picks
the same exemplars, and a SQL engine can replay the selection exactly
(chained argmax CTEs; see the driver query's DuckDB twin).

Scale shape — the standard FPS recurrence, not all-pairs:
    min_dist_{r+1}(x) = min(min_dist_r(x), dist(x, c_{r+1}))
keeps ONE running column over the corpus; each of the k rounds is a
map (distance to the newly chosen center, broadcast as a literal — the
center is d floats, not data) + one TakeOrdered(1). Total O(k·N·d) work,
k driver-side rows collected (model-sized, the IVF/PQ convention in
similarity.py). The corpus is persisted once; lineage stays flat because
each round rebuilds from the materialized (id, v, min_dist) projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def kcenter_select(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    checkpoint_every: int = 32,
    _plan_probe: list | None = None,
) -> DataFrame:
    """Greedy k-center selection under cosine distance (1 − cosine).

    Returns a small DataFrame (rank, <id_col>, min_dist): rank 1 is the
    seed (lowest id, min_dist NULL), rank r>1 is the point whose distance
    to the previously-selected set was maximal at the time of selection
    (rounded at 1e-6 for cross-engine comparison; the argmax itself uses
    full float64). Zero-norm vectors carry no direction and are excluded.

    Plan growth is BOUNDED for real k: selected ids accumulate in a
    materialized ``_sel`` flag column (never a growing ``isin`` literal),
    and the running frame is ``localCheckpoint``-ed every
    ``checkpoint_every`` rounds (the connected_components discipline,
    dedup.py), so expression depth and lineage stay ≤ one batch no matter
    how large k grows. ``_plan_probe``, when given a list, receives the
    final internal plan string so tests can assert the bound.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = (
        df.select(F.col(id_col).cast("long").alias("id"), dvec.alias("v"))
        .withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
        .filter(F.col("norm") > 0)
        .persist()
    )
    try:
        seed = base.orderBy("id").select("id", "v", "norm").first()
        if seed is None:
            raise ValueError("no usable vectors to select from")
        chosen = [(1, int(seed["id"]), None)]

        def dist_to(center_v, center_norm):
            c = F.array(*[F.lit(float(x)) for x in center_v])
            return 1.0 - _dot(F.col("v"), c) / (F.col("norm") * F.lit(float(center_norm)))

        cur = base.withColumn("min_dist", dist_to(seed["v"], seed["norm"])).withColumn(
            "_sel", F.col("id") == F.lit(int(seed["id"]))
        )
        for r in range(2, k + 1):
            nxt = (
                cur.filter(~F.col("_sel"))
                .orderBy(F.col("min_dist").desc(), F.col("id").asc())
                .first()
            )
            if nxt is None:
                break  # fewer distinct points than k
            chosen.append((r, int(nxt["id"]), float(nxt["min_dist"])))
            cur = cur.withColumn(
                "min_dist", F.least("min_dist", dist_to(nxt["v"], nxt["norm"]))
            ).withColumn("_sel", F.col("_sel") | (F.col("id") == F.lit(int(nxt["id"]))))
            if (r - 1) % checkpoint_every == 0:
                # truncate lineage + expression depth; eager, executor-local
                cur = cur.localCheckpoint()
        if _plan_probe is not None:
            _plan_probe.append(
                cur._jdf.queryExecution().analyzed().toString()  # noqa: SLF001
            )
        out = df.sparkSession.createDataFrame(
            chosen, f"rank int, {id_col} long, min_dist double"
        )
        return out.select("rank", id_col, F.round("min_dist", 6).alias("min_dist"))
    finally:
        base.unpersist()
