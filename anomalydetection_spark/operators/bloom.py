"""Mergeable Bloom-filter sketches + the shuffle-minimal referential path.

Third sketch family next to operators/tdigest.py (quantiles) and
operators/hll.py (distinct counts): a Bloom filter is the membership
sketch — "definitely absent" / "maybe present" with a tunable false-
positive rate and NO false negatives. Like the other two it is a byte
blob with a cheap merge (bitwise OR), so per-Iceberg-partition catalog
sketches can be built once, stored in the run manifest, and combined
across resumed runs without rescanning finished partitions (X2/S8).

Where the reference keeps its membership set as an in-memory pandas
index (`isin` filter, preprocessing.py:7-10), this engine needs the
same check against a catalog that may not fit ANY single executor. The
scalable referential pattern composes three shuffle-minimal pieces:

1. **Distinct-first**: the fact side (10^12 span rows) is reduced to
   its distinct keys via a map-side-combining aggregate before any
   join — the only full-table shuffle carries |distinct refs| rows,
   never the span rows themselves.
2. **Bloom short-circuit**: keys the filter rejects are *definitely*
   dangling — they skip the catalog join entirely. Only "maybe" keys
   (valid refs + the fpp tail) reach the exact verification anti-join.
3. **Broadcast-back**: the verified dangling-key set (violations are
   rare) is broadcast and semi-joined back to the fact side to
   materialize violation rows — again no fact-side shuffle.

The final answer is EXACTLY the plain anti-join's (false positives are
re-checked; false negatives don't exist), so the operator stays inside
the DuckDB oracle gate.

Membership testing is pure JVM column expressions: the word array is a
plan literal (broadcast with the task binaries), probes are k xxhash64
evaluations + element_at + bitwise AND — whole-stage codegen, no
Python, no shuffle. The literal-array regime covers catalogs up to
~10^7 keys (m = 2^24 → 2 MB plan literal); beyond that, ship the blob
with `SparkContext.broadcast` and probe in a vectorized Arrow batch
(same blob format), or lean on AQE's runtime bloom-filter join — the
sketch contract here is what makes the state resumable either way.
"""

from __future__ import annotations

import struct
from functools import reduce

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC = b"BF01"

DEFAULT_M_BITS = 1 << 20  # 128 KB of words; fpp ~0.8% at 10^5 keys, k=5
DEFAULT_K = 5
DEFAULT_SEED = 0x5EED


def _probe(col: Column, i: int, m_bits: int, seed: int) -> tuple[Column, Column]:
    """(word_idx:int, bit_mask:long) of probe ``i`` — all JVM expressions.

    xxhash64 over (value, seed+i) gives k independent probe streams with
    no Python-side hashing to keep in sync (the same expressions run at
    build and at test time, so false negatives are structurally
    impossible)."""
    pos = F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(m_bits))
    word = F.floor(pos / 64).cast("int")
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )
    return word, mask


def build_words(
    df: DataFrame,
    col: str | Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """One pass over ``df`` → sparse (word_idx, bits) rows of the filter.

    k (word, mask) pairs per key explode into rows, then ONE hash
    aggregate with map-side `bit_or` partials merges them — the shuffle
    carries at most min(k·|keys|, m/64) rows of two small ints. Partial
    filters from different inputs (or resumed runs) merge by unioning
    the word rows and re-aggregating — OR is associative."""
    c = F.col(col) if isinstance(col, str) else col
    entries = [
        F.struct(w.alias("w"), m.alias("m"))
        for w, m in (_probe(c, i, m_bits, seed) for i in range(k))
    ]
    return (
        df.filter(c.isNotNull())
        .select(F.explode(F.array(*entries)).alias("e"))
        .select(F.col("e.w").alias("word_idx"), F.col("e.m").alias("bits"))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def words_to_blob(
    word_rows, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K, seed: int = DEFAULT_SEED
) -> bytes:
    """Pack collected (word_idx, bits) rows into a manifest-storable blob.

    Layout: magic | m_bits | k | seed | m_bits/64 little-endian int64
    words. The collect is bounded by the filter size (m/64 rows), never
    the key count."""
    words = np.zeros(m_bits // 64, dtype=np.int64)
    for r in word_rows:
        words[r["word_idx"]] = r["bits"]
    return MAGIC + struct.pack("<QII", m_bits, k, seed) + words.tobytes()


def blob_from_df(
    df: DataFrame,
    col: str | Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> bytes:
    return words_to_blob(
        build_words(df, col, m_bits=m_bits, k=k, seed=seed).collect(), m_bits, k, seed
    )


def unpack_blob(blob: bytes) -> tuple[int, int, int, np.ndarray]:
    assert blob[:4] == MAGIC, "unknown bloom blob version"
    m_bits, k, seed = struct.unpack_from("<QII", blob, 4)
    words = np.frombuffer(blob, dtype=np.int64, offset=4 + 16)
    assert words.size == m_bits // 64
    return m_bits, k, seed, words


def merge_blobs(a: bytes, b: bytes) -> bytes:
    """Bitwise-OR merge — the Bloom union. Parameters must match (same
    hash family), mirroring HLL precision / t-digest delta checks."""
    ma, ka, sa, wa = unpack_blob(a)
    mb, kb, sb, wb = unpack_blob(b)
    assert (ma, ka, sa) == (mb, kb, sb), "incompatible bloom parameters"
    return MAGIC + struct.pack("<QII", ma, ka, sa) + (wa | wb).tobytes()


def probe_positions(
    col: Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> Column:
    """array<long> of the k probe BIT positions for ``col`` — the JVM
    (xxhash64) half of a build whose bit-setting half runs in a pandas
    worker (manifest.group_sketch_blobs): hashing stays JVM-side and
    identical to build_words/might_contain, so blobs built either way
    share one hash family and interoperate (merge, intersect, probe)."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(m_bits)) for i in range(k)]
    )


def blob_from_positions(
    positions: "np.ndarray",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> bytes:
    """Pack a flat int64 array of probe bit positions (from
    :func:`probe_positions` rows) into the standard blob layout."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    pos = np.asarray(positions, dtype=np.int64)
    np.bitwise_or.at(
        words, pos // 64, np.left_shift(np.uint64(1), (pos % 64).astype(np.uint64))
    )
    return MAGIC + struct.pack("<QII", m_bits, k, seed) + words.astype(np.int64).tobytes()


def blobs_intersect(a: bytes, b: bytes) -> bool:
    """Sound over-approximate overlap test: False ⇒ the two key sets are
    DISJOINT for certain (a common key sets the same bits in both, so a
    zero AND proves absence); True ⇒ maybe overlapping (fpp-bounded).
    This is what lets a resumed run skip re-scanning finished partitions
    whose doc_id Blooms share no bits with the pending partitions'."""
    ma, ka, sa, wa = unpack_blob(a)
    mb, kb, sb, wb = unpack_blob(b)
    assert (ma, ka, sa) == (mb, kb, sb), "incompatible bloom parameters"
    return bool(np.bitwise_and(wa, wb).any())


def might_contain(col: Column, blob: bytes) -> Column:
    """JVM membership predicate against a built filter.

    False ⇒ the value was never inserted (no false negatives); True ⇒
    maybe. The word array rides in the plan as an array<long> literal;
    each probe is element_at + AND — codegen'd, shuffle-free."""
    m_bits, k, seed, words = unpack_blob(blob)
    arr = F.lit([int(w) for w in words])
    conds = []
    for i in range(k):
        word, mask = _probe(col, i, m_bits, seed)
        conds.append(F.element_at(arr, word + 1).bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, conds)


def dangling_keys_scalable(
    fact: DataFrame,
    ref_col: str,
    catalog: DataFrame,
    catalog_col: str | None = None,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Distinct fact keys absent from the catalog — exact, via the
    distinct-first + bloom-short-circuit + verify composition.

    Returns one row per dangling key value (column ``ref_col``)."""
    ccol = catalog_col or ref_col
    keys = (
        fact.filter(F.col(ref_col).isNotNull()).select(ref_col).distinct()
    )
    blob = blob_from_df(catalog, ccol, m_bits=m_bits, k=k)
    maybe = might_contain(F.col(ref_col), blob)
    definite = keys.filter(~maybe)
    survivors = keys.filter(maybe)
    false_pos = survivors.join(
        catalog.select(F.col(ccol).alias(ref_col)), ref_col, "left_anti"
    )
    return definite.unionByName(false_pos)


def dangling_refs_scalable(
    exploded: DataFrame,
    media: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Drop-in for referential.dangling_refs when the catalog outgrows a
    broadcast hash join: same rows out, fact side never shuffled.

    The dangling-key set (small — violations are the exception) is
    broadcast back onto the span table as a semi-join, so violation-row
    materialization is one more scan, zero shuffles."""
    keys = dangling_keys_scalable(exploded, "media_ref", media, m_bits=m_bits, k=k)
    return exploded.filter(F.col("media_ref").isNotNull()).join(
        F.broadcast(keys), "media_ref", "left_semi"
    )
