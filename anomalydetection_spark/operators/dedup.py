"""Deduplication operators for large-scale training-data pipelines.

Five dedup families, each expressed as DataFrame ops (no per-row Python):

- exact:          hash-groupBy on normalized text
- minhash + LSH:  shingle → 60-bit portable hash → H minhashes → banded
                  bucket join → candidate pairs → exact-Jaccard verify
- simhash:        per-bit majority over shingle hashes → 32-bit signature,
                  banded candidate join, hamming-distance verify
- n-gram Jaccard: shingle-join blocking + exact set-overlap arithmetic
- embedding cosine: see operators/similarity.py

Scale design: every family is shuffle-bounded by (candidate pairs +
shingle rows), never by |docs|²: LSH bands / hash blocks prune the
quadratic pair space before any join. The 60-bit hash is md5-derived so
the same values are computable in any engine (the DuckDB oracle included);
a production deployment would swap in xxhash64 for speed without changing
the shapes.

Reference tie-in: the reference dedups nothing, but its frequency filter
(preprocessing.py:4-13) is the same shape as `exact_duplicates` —
group-count + threshold + semi/anti join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P = 2_147_483_647  # 2^31 - 1, Mersenne prime for the minhash universe
MINHASH_A = [131, 137, 139, 149, 151, 157, 163, 167]
MINHASH_B = [7, 11, 13, 17, 19, 23, 29, 31]


def portable_hash60(c: Column) -> Column:
    """Deterministic 60-bit hash reproducible in any engine with md5:
    first 15 hex digits of md5 as a bigint."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def tokenize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("tokens"))


def shingle_rows(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-token shingles per doc: (id_col, shingle)."""
    toked = tokenize(df, id_col, text_col)
    parts = [F.element_at(F.col("tokens"), F.col("i") + j) for j in range(k)]
    # NB: Spark's sequence(1, 0) is DESCENDING [1, 0] — docs shorter than k
    # tokens must map to an empty index array, not a greatest() clamp
    idx = F.when(
        F.size("tokens") >= k, F.sequence(F.lit(1), F.size("tokens") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    shingled = toked.select(
        id_col,
        F.explode(idx).alias("i"),
        "tokens",
    ).select(id_col, F.concat_ws(" ", *parts).alias("shingle"))
    return shingled.distinct()


def exact_duplicates(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """Exact dedup: (text_hash, n_docs, keep_id) for groups of size > 1.
    keep_id = min(id) is the canonical survivor."""
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.trim(t))
    return (
        df.select(F.md5(t).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8, k: int = 3
) -> DataFrame:
    """(id, m0..m{H-1}) minhash signature columns from one hash-agg pass."""
    sh = shingle_rows(df, id_col, text_col, k)
    h = (portable_hash60(F.col("shingle")) % P).alias("h")
    hashed = sh.select(id_col, h)
    aggs = [
        F.min((F.lit(MINHASH_A[j]) * F.col("h") + F.lit(MINHASH_B[j])) % P).alias(f"m{j}")
        for j in range(n_hashes)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str, n_hashes: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs
    (id_a < id_b, distinct). The band key is an md5 of the band's minhash
    slice — the classic shuffle-pruning step that keeps dedup o(n²)."""
    n_bands = n_hashes // rows_per_band
    band_key = lambda b: F.md5(
        F.concat_ws("_", *[F.col(f"m{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)])
    )
    # ONE explode, not a union of per-band selects: a union re-plans (and
    # re-computes) the whole signature subtree once per band
    entries = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_key(b).alias("band_key"))
            for b in range(n_bands)
        ]
    )
    bands = sigs.select(F.col(id_col), F.explode(entries).alias("_e")).select(
        id_col, F.col("_e.band").alias("band"), F.col("_e.band_key").alias("band_key")
    )
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b_ = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b_, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard on candidate pairs: (id_a, id_b, jaccard) ≥ threshold.
    Integer overlap counts + one double division → engine-deterministic.

    Size-ratio prefilter (standard, provably result-preserving):
    J(A,B) = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|), so any pair whose
    set sizes differ by more than the threshold ratio is dropped BEFORE
    the expensive per-shingle intersection join — the broadcast-size join
    costs one small row per candidate, the intersection join costs
    min(|A|,|B|) rows per candidate."""
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("sz"))
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sza"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("szb"))
    sized = (
        pairs.join(za, "id_a")
        .join(zb, "id_b")
        .filter(
            F.least("sza", "szb") >= F.greatest("sza", "szb") * F.lit(threshold)
        )
    )
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        sized.select("id_a", "id_b", "sza", "szb")
        .join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "sza", "szb")
        .agg(F.count("*").alias("ic"))
    )
    jac = inter.select(
        "id_a",
        "id_b",
        (F.col("ic") / (F.col("sza") + F.col("szb") - F.col("ic"))).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates →
    exact-Jaccard verification. Returns (id_a, id_b, jaccard rounded 6)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, k)
    cands = lsh_candidate_pairs(sigs, id_col, n_hashes)
    sh = shingle_rows(df, id_col, text_col, k)
    out = jaccard_verify(cands, sh, id_col, threshold)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.35,
    k: int = 3,
    df_cap: int = 50,
    metrics: dict | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with frequency-capped blocking.

    Candidate pairs must share ≥1 *rare* shingle (document frequency ≤
    ``df_cap``): a stop-shingle in f docs alone yields f·(f−1)/2 candidate
    pairs — quadratic in its popularity — so hot shingles are excluded
    from pair GENERATION (standard prefix-filter practice) while the exact
    Jaccard VERIFICATION still counts every shingle. A true pair is missed
    only if *all* its shared shingles exceed the cap, which at
    threshold-level overlap means the docs are built entirely from
    corpus-wide boilerplate.

    ``metrics`` (optional dict) receives ``n_shingles_total`` /
    ``n_shingles_hot`` — the dropped-blocking-key count, surfaced so a run
    can log how much of the corpus is boilerplate (one extra tiny agg job).
    """
    sh = shingle_rows(df, id_col, text_col, k)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    if metrics is not None:
        tot, hot = dfreq.agg(
            F.count("*"), F.sum((F.col("df") > df_cap).cast("long"))
        ).first()
        metrics["n_shingles_total"] = tot
        metrics["n_shingles_hot"] = int(hot or 0)
    rare = dfreq.filter(F.col("df") <= df_cap).select("shingle")
    blocked = sh.join(rare, "shingle")
    sa = blocked.select(F.col(id_col).alias("id_a"), "shingle")
    sb = blocked.select(F.col(id_col).alias("id_b"), "shingle")
    cands = (
        sa.join(sb, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    out = jaccard_verify(cands, sh, id_col, threshold)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-dup pair graph → (node, component): component = the minimum
    node id reachable, i.e. the canonical survivor of each duplicate
    cluster. This is the "apply" step the pair-reporting queries feed —
    drop every node with node != component and the corpus is deduplicated
    against transitive duplicate chains (A~B, B~C ⇒ one survivor), which
    pairwise keep-min gets wrong.

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels; converges in ≤ graph
    diameter rounds (near-dup clusters are shallow — boilerplate families
    link through shared hubs). Each round is one join + one hash agg,
    both partitioned by node id; ``localCheckpoint`` truncates the plan
    lineage so round N doesn't replan rounds 1..N-1 (swap for
    ``checkpoint`` with a checkpoint dir on a real cluster). Convergence
    is detected with a count of changed labels — a driver-side scalar per
    round, not a collect of labels.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    sym = fwd.unionByName(rev)
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("comp", F.col("node"))
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(
                labels.select(F.col("node").alias("src"), F.col("comp").alias("src_comp")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("src_comp").alias("nbr_comp"))
            .select(F.col("dst").alias("node"), "nbr_comp")
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
                (F.coalesce("nbr_comp", F.col("comp")) < F.col("comp")).cast("int").alias("_chg"),
            )
        ).localCheckpoint()
        changed = new_labels.agg(F.sum("_chg")).first()[0] or 0
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels


SIMHASH_BITS = 32


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, simhash) 32-bit per-bit-majority signature over shingle hashes.

    Single hash aggregate, no bit explode: each (doc, shingle) row feeds
    32 `sum((h>>j & 1)·2−1)` aggregates (literal shifts, all JVM, one
    column per bit) — map-side partials shrink the shuffle to one 32-column
    row per doc, versus the 32× row explosion this replaced (measured 3×
    slower than MinHash on the same corpus in round 1)."""
    sh = shingle_rows(df, id_col, text_col, k)
    hashed = sh.select(id_col, portable_hash60(F.col("shingle")).alias("h"))
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(F.shiftright("h", j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return bit_sums.select(id_col, sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    k: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash: 8-bit band blocking (a pair within
    hamming ≤ 3 of 32 bits shares at least one of 4 bands by pigeonhole),
    then exact hamming verify via bit_count(xor).

    Blocking is the Manku block-combination scheme (WWW'07, public):
    split the 32 bits into ``max_hamming + 3`` blocks and key one band
    table per 3-block combination — ≤ ``max_hamming`` flipped bits ruin at
    most that many blocks, leaving ≥ 3 intact, so some combination matches
    (guaranteed recall). At the default that means C(6,3)=20 tables with
    ~16-bit keys: round 1's 4×8-bit bands gave only 256 buckets per band,
    which goes quadratic on ANY corpus past ~10k docs (measured 260M raw
    join pairs on 161k docs); wider keys shrink buckets by ~256×. Since
    every returned pair is hamming-verified, the result set is exactly
    "all pairs with hamming ≤ max_hamming" under either blocking — the
    scheme changes throughput, never output (the DuckDB oracle keeps the
    simple 4-band form for this reason).

    No distinct/groupBy after the band join: a pair colliding in several
    combinations is kept only in its FIRST matching one — decidable
    row-locally from the two signatures via mask compares — so the
    post-join pipeline is pure map-side filters."""
    import itertools

    sigs = simhash_signatures(df, id_col, text_col, k)

    n_blocks = max_hamming + 3
    bounds = [round(i * SIMHASH_BITS / n_blocks) for i in range(n_blocks + 1)]
    block_masks = [
        ((1 << bounds[i + 1]) - 1) ^ ((1 << bounds[i]) - 1) for i in range(n_blocks)
    ]
    combo_masks = [
        block_masks[i] | block_masks[j] | block_masks[l]
        for i, j, l in itertools.combinations(range(n_blocks), 3)
    ]

    # ONE explode, not a union of per-combo selects (a union re-plans the
    # signature aggregation subtree once per combination — 20× at default)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("band"),
                F.col("simhash").bitwiseAND(F.lit(mask)).alias("band_key"),
            )
            for c, mask in enumerate(combo_masks)
        ]
    )
    bands = sigs.select(id_col, "simhash", F.explode(entries).alias("_e")).select(
        id_col, "simhash", F.col("_e.band").alias("band"), F.col("_e.band_key").alias("band_key")
    )
    a = bands.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"), "band", "band_key")
    b_ = bands.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"), "band", "band_key")
    joined = a.join(b_, ["band", "band_key"]).filter(F.col("id_a") < F.col("id_b"))
    matches = F.array(
        *[
            F.col("sig_a").bitwiseAND(F.lit(m)) == F.col("sig_b").bitwiseAND(F.lit(m))
            for m in combo_masks
        ]
    )
    first_combo = F.array_position(matches, F.lit(True)) - 1
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        joined.filter(F.col("band") == first_combo)
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    *,
    normalize: bool = True,
    use_bloom: bool = True,
    m_bits: int = 1 << 20,
) -> DataFrame:
    """Classify an ingest batch against an existing corpus by exact
    (normalized) text identity: (id, text_hash, status) with status
    'dup_vs_corpus' (hash already in the corpus), 'dup_in_batch' (repeat
    within the batch, first id is the keeper), or 'unique'.

    Scale shape (the continuous-ingestion dedup a growing corpus runs on
    every batch): the corpus contributes only DISTINCT text hashes and is
    NEVER shuffled against the batch — a Bloom filter over corpus hashes
    (bounded blob, operators/bloom.py) prefilters batch hashes JVM-side,
    and only the bloom-positive hashes (≤ batch-distinct, typically ≪)
    are verified with a semi-join whose left side streams the corpus
    once. False positives die in the verify; false negatives are
    impossible, so output is hash-identical to the plain-join twin
    (``use_bloom=False``)."""
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.trim(t))
    batch = new_docs.select(F.col(id_col), F.md5(t).alias("text_hash"))
    ct = F.col(text_col)
    if normalize:
        ct = F.lower(F.trim(ct))
    corpus_hashes = corpus.select(F.md5(ct).alias("text_hash")).distinct()

    batch_stats = batch.groupBy("text_hash").agg(
        F.min(id_col).alias("_keep_id"), F.count("*").alias("_n")
    )
    if use_bloom:
        from anomalydetection_spark.operators import bloom

        blob = bloom.blob_from_df(corpus_hashes, "text_hash", m_bits=m_bits)
        candidates = batch_stats.select("text_hash").filter(
            bloom.might_contain(F.col("text_hash"), blob)
        )
    else:
        candidates = batch_stats.select("text_hash")
    # verify: corpus streams once against the (batch-bounded) candidate set
    verified = corpus_hashes.join(candidates, "text_hash", "left_semi").withColumn(
        "_in_corpus", F.lit(True)
    )
    enriched = batch.join(verified, "text_hash", "left").join(batch_stats, "text_hash")
    status = (
        F.when(F.col("_in_corpus"), F.lit("dup_vs_corpus"))
        .when((F.col("_n") > 1) & (F.col(id_col) != F.col("_keep_id")), F.lit("dup_in_batch"))
        .otherwise(F.lit("unique"))
    )
    return enriched.select(id_col, "text_hash", status.alias("status"))


def keep_best(
    components: DataFrame,
    scored: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-aware canonicalization of duplicate clusters: for each
    component from ``connected_components`` pick the member with the
    highest ``score_col`` (ties broken by lowest id) instead of the lowest
    id — the policy real curation pipelines want, since the canonical
    survivor should be the best-written copy, not an arbitrary one.

    ``components`` is (node, comp); ``scored`` carries (id_col, score_col)
    for at least every node. One equi-join on the doc id plus one hash agg
    on the component: the argmax is a struct max (score asc, id desc via
    negation), so partial aggregation applies — no window, no sort. Nodes
    missing from ``scored`` would null-propagate; callers pass a full
    scoring frame (an inner join drops them loudly in tests).

    Returns (cluster_id, keep_id, n_members, best_score).
    """
    m = components.join(
        scored.select(F.col(id_col).alias("node"), F.col(score_col).alias("_s")),
        "node",
    )
    best = m.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.max(F.struct(F.col("_s").alias("s"), (-F.col("node")).alias("neg_id"))).alias("b"),
    )
    return best.select(
        "cluster_id",
        (-F.col("b.neg_id")).cast("long").alias("keep_id"),
        "n_members",
        F.col("b.s").alias("best_score"),
    )


def window_hashes(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Every k-token window per doc, hashed: (id, wpos, whash).

    Unlike ``shingle_rows`` this keeps per-position rows (coverage
    accounting needs positional attribution, and a window repeated inside
    one doc counts once per occurrence) and hashes the window text to a
    60-bit int map-side, so nothing wider than (id, int, bigint) ever
    reaches a shuffle.
    """
    toked = tokenize(df, id_col, text_col)
    parts = [F.element_at(F.col("tokens"), F.col("wpos") + j) for j in range(k)]
    idx = F.when(
        F.size("tokens") >= k, F.sequence(F.lit(1), F.size("tokens") - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return toked.select(id_col, F.explode(idx).alias("wpos"), "tokens").select(
        id_col, "wpos", portable_hash60(F.concat_ws(" ", *parts)).alias("whash")
    )


def duplicate_window_coverage(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Substring-level duplication accounting — the window-granularity
    relaxation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    k-token window is *duplicated* when it occurs in ≥ 2 distinct docs;
    per doc we report total windows, duplicated windows, and the
    duplicated fraction (the signal substring dedup trims on).

    Returns one row per input doc: (id, n_windows, n_dup_windows,
    dup_frac) — docs shorter than k tokens get n_windows = 0 and a NULL
    fraction, never a silent drop.

    Scale shape: window text dies map-side (60-bit hashes only);
    ``n_windows`` is derived from the token count (map-only, no agg);
    the cross-doc window set is distinct(id, whash) → hash-agg on whash
    (both partial-aggregated map-side, so a boilerplate window appearing
    a million times in one doc contributes one row to the count agg);
    attribution back to docs is a semi-join of the narrow window stream
    against that set, shuffling only (whash) keys. The text column is
    read three times (token-count base, window-set build, attribution),
    each a map-only pass over the pruned text leaf — against columnar
    storage that is cheaper at 100 TB than persisting the exploded
    window stream, which is ~|tokens| rows wide.
    """
    toked = tokenize(df, id_col, text_col)
    base = toked.select(
        id_col,
        F.greatest(F.size("tokens") - (k - 1), F.lit(0)).cast("long").alias("n_windows"),
    )
    w = window_hashes(df, id_col, text_col, k)
    dup_set = (
        w.select(id_col, "whash")
        .distinct()
        .groupBy("whash")
        .agg(F.count("*").alias("_n_docs"))
        .filter(F.col("_n_docs") >= 2)
        .select("whash")
    )
    dup_per_doc = (
        w.join(dup_set, "whash", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_dup_windows"))
    )
    out = base.join(dup_per_doc, id_col, "left").select(
        id_col,
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0).cast("long")).alias("n_dup_windows"),
    )
    return out.withColumn(
        "dup_frac",
        F.when(
            F.col("n_windows") > 0,
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        ),
    )
