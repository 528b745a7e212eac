"""Farthest-point (k-center greedy) selection: NumPy mirror parity,
partitioning invariance, and the edge cases (k > points, zero-norm
vectors, deterministic seed)."""

from __future__ import annotations

import numpy as np
import pytest

from anomalydetection_spark.operators.diversity import kcenter_select


def _mirror(ids, vecs, k):
    """Reference greedy: seed = lowest id, argmax of min cosine distance,
    ties by id ascending."""
    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    v = np.asarray(vecs, dtype=np.float64)[order]
    n = v / np.linalg.norm(v, axis=1, keepdims=True)
    chosen = [0]
    out = [(1, int(ids[0]), None)]
    md = 1.0 - n @ n[0]
    for r in range(2, k + 1):
        cand = [i for i in range(len(ids)) if i not in chosen]
        if not cand:
            break
        # argmax over md with id-ascending tie-break (ids sorted => first max)
        best = max(cand, key=lambda i: (md[i], -ids[i]))
        out.append((r, int(ids[best]), float(md[best])))
        chosen.append(best)
        md = np.minimum(md, 1.0 - n @ n[best])
    return out


def _vecs(seed=7, n=40, d=8):
    rng = np.random.default_rng(seed)
    return list(range(n)), rng.normal(size=(n, d)).tolist()


def test_matches_numpy_mirror(spark):
    ids, vecs = _vecs()
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "vec_id long, embedding array<double>"
    )
    got = [
        (r["rank"], r["vec_id"], r["min_dist"])
        for r in kcenter_select(df, k=6).orderBy("rank").collect()
    ]
    want = [
        (r, i, None if d is None else round(d, 6)) for r, i, d in _mirror(ids, vecs, 6)
    ]
    assert [g[:2] for g in got] == [w[:2] for w in want]
    for g, w in zip(got[1:], want[1:]):
        assert g[2] == pytest.approx(w[2], abs=1e-6)


def test_partitioning_invariance(spark):
    ids, vecs = _vecs(seed=11)
    rows = [(i, v) for i, v in zip(ids, vecs)]
    a = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(1)
    b = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(7)
    sa = [(r["rank"], r["vec_id"]) for r in kcenter_select(a, k=5).orderBy("rank").collect()]
    sb = [(r["rank"], r["vec_id"]) for r in kcenter_select(b, k=5).orderBy("rank").collect()]
    assert sa == sb


def test_k256_bounded_plan_and_mirror_parity(spark):
    """Real-k selection (k=256, round-3 verdict ask #5): the selected-id
    predicate is an accumulated flag column, never a growing isin, and
    localCheckpoint every 32 rounds caps expression depth — the final
    internal plan must stay batch-sized (independent of k) and the
    selection must still match the NumPy greedy exactly."""
    ids, vecs = _vecs(seed=3, n=300, d=4)
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(ids, vecs)], "vec_id long, embedding array<double>"
    )
    probe: list = []
    got = [
        (r["rank"], r["vec_id"])
        for r in kcenter_select(df, k=256, _plan_probe=probe)
        .orderBy("rank")
        .collect()
    ]
    want = [(r, i) for r, i, _ in _mirror(ids, vecs, 256)]
    assert got == want
    # after 256 rounds the plan reflects ≤ checkpoint_every rounds of
    # expressions, not 256: no isin literal over chosen ids, and the
    # analyzed-plan text is orders of magnitude below the unchecked
    # O(k·d)-literal blowup (256 rounds × 4-float centers ≫ 100k chars)
    (plan,) = probe
    assert " IN (" not in plan
    assert len(plan) < 100_000, len(plan)


def test_k_exceeds_points_and_zero_norm_excluded(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = kcenter_select(df, k=10).orderBy("rank").collect()
    # zero-norm vec 3 excluded; only 2 selectable points
    assert [(r["rank"], r["vec_id"]) for r in rows] == [(1, 1), (2, 2)]
    assert rows[1]["min_dist"] == pytest.approx(1.0, abs=1e-9)  # orthogonal

    with pytest.raises(ValueError, match="k must be"):
        kcenter_select(df, k=0)
