"""Property tests pinning the KMV sketch's algebra: merge is
associative/commutative/idempotent (any partition of any multiset of
values yields the identical blob), estimates are deterministic, and the
below-k region is exact — over hypothesis-generated inputs, no Spark."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from anomalydetection_spark.operators.kmv import HASH_RANGE, KMV


def h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


values = st.lists(st.integers(min_value=-(10**6), max_value=10**6), max_size=400)


@settings(max_examples=60, deadline=None)
@given(values, st.integers(min_value=1, max_value=5))
def test_any_partitioning_merges_to_the_same_blob(vals, n_parts):
    hashes = np.array([h60(v) for v in vals], dtype=np.int64)
    full = KMV(k=64)
    full.add_hashed(hashes)
    merged = KMV(k=64)
    for i in range(n_parts):
        part = KMV(k=64)
        part.add_hashed(hashes[i::n_parts])
        merged.merge(part)
    assert merged.to_bytes() == full.to_bytes()


@settings(max_examples=60, deadline=None)
@given(values, values)
def test_merge_commutes_and_is_idempotent(a_vals, b_vals):
    ha = np.array([h60(v) for v in a_vals], dtype=np.int64)
    hb = np.array([h60(v) for v in b_vals], dtype=np.int64)
    ab, ba = KMV(k=32), KMV(k=32)
    ab.add_hashed(ha)
    other = KMV(k=32)
    other.add_hashed(hb)
    ab.merge(other)
    ba.add_hashed(hb)
    other2 = KMV(k=32)
    other2.add_hashed(ha)
    ba.merge(other2)
    assert ab.to_bytes() == ba.to_bytes()
    again = KMV.from_bytes(ab.to_bytes())
    again.merge(KMV.from_bytes(ab.to_bytes()))
    assert again.to_bytes() == ab.to_bytes()


@settings(max_examples=60, deadline=None)
@given(values)
def test_below_k_exact_and_theta_contract(vals):
    distinct = {h60(v) for v in vals}
    s = KMV(k=1024)
    s.add_hashed(np.array(sorted(distinct), dtype=np.int64))
    if len(distinct) < 1024:
        assert s.estimate_distinct() == len(distinct)
        assert s.theta == HASH_RANGE
    # self-overlap of an exact sketch is the exact distinct count
    assert s.estimate_common(KMV.from_bytes(s.to_bytes())) == s.estimate_distinct()


@settings(max_examples=40, deadline=None)
@given(values, values)
def test_overlap_never_exceeds_either_distinct_estimate_when_exact(a_vals, b_vals):
    ha = {h60(v) for v in a_vals}
    hb = {h60(v) for v in b_vals}
    a, b = KMV(k=2048), KMV(k=2048)
    a.add_hashed(np.array(sorted(ha), dtype=np.int64))
    b.add_hashed(np.array(sorted(hb), dtype=np.int64))
    if len(ha) < 2048 and len(hb) < 2048:  # both exact
        assert a.estimate_common(b) == len(ha & hb)
