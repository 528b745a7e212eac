"""Curation-batch operators: PII scan/redaction, sequence packing,
boilerplate-paragraph detection.

Each test pins the operator against a hand-computed or pandas-computed
reference on a tiny corpus; packing additionally asserts partition
invariance (the two-phase distributed prefix scan must give identical
spans at any parallelism — the property that makes it safe at 10^12
docs where a single-task `Window.orderBy` scan would be the bottleneck).
"""

from __future__ import annotations

from anomalydetection_spark.operators import packing, pii, textops


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_pii_scan_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.co.uk today"),
            (2, "hosts 10.0.0.1 and 192.168.1.255"),
            (3, "call 555-123-4567 or ssn 123-45-6789"),
            (4, "clean text, no identifiers here"),
            (5, "double a@b.io c@d.net"),
        ],
        "id int, text string",
    )
    got = {r["id"]: r for r in pii.pii_scan(df, "id", "text").collect()}
    assert (got[1]["n_email"], got[1]["has_pii"]) == (1, True)
    assert got[2]["n_ipv4"] == 2
    # phone (ddd-ddd-dddd) and ssn (ddd-dd-dddd) are shape-disjoint
    assert (got[3]["n_phone"], got[3]["n_ssn"]) == (1, 1)
    assert (got[4]["has_pii"], got[4]["n_email"]) == (False, 0)
    assert got[5]["n_email"] == 2


def test_pii_redact_order_and_masking(spark):
    df = spark.createDataFrame(
        [(1, "x a@ex.io y 10.1.2.3 z 555-111-2222 w 111-22-3333")],
        "id int, text string",
    )
    out = pii.pii_redact(df, "text").head()["redacted"]
    assert out == "x <email> y <ipv4> z <phone> w <ssn>"
    # an @ before an IP-shaped host is NOT an email (pattern requires an
    # alphabetic TLD), so only the ipv4 pattern fires on it
    df2 = spark.createDataFrame([(1, "a@10.1.2.3")], "id int, text string")
    assert pii.pii_redact(df2, "text").head()["redacted"] == "a@<ipv4>"


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def _span_reference(rows):
    """Exclusive prefix-sum reference in plain Python."""
    acc, out = 0, {}
    for doc_id, n in sorted(rows):
        out[doc_id] = (n, acc, acc + n)
        acc += n
    return out


def test_token_spans_match_reference_and_partition_invariant(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "id int, n_tok int")
    ref = _span_reference(rows)
    for nparts in (1, 4, 7):
        got = {
            r["id"]: (r["n_tok"], r["start"], r["end"])
            for r in packing.token_spans(df, "id", "n_tok", num_partitions=nparts).collect()
        }
        assert got == ref, f"num_partitions={nparts}"


def test_pack_chunks_straddle_and_conservation(spark):
    # docs of 6 tokens each, capacity 10: doc boundaries straddle chunks
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 6)) for i in range(1, 11)], "doc_id int, text string"
    )
    packed = packing.pack_chunks(docs, "doc_id", "text", capacity=10, num_partitions=3)
    rows = _rows(packed, "chunk_id", "id")
    # token conservation: every token lands in exactly one chunk
    assert sum(r[2] for r in rows) == 60
    by_doc = {}
    for chunk_id, doc_id, tok, is_split in rows:
        by_doc.setdefault(doc_id, []).append((chunk_id, tok, is_split))
    # doc 1 occupies [0,6) -> chunk 0 only; doc 2 [6,12) straddles 0/1
    assert by_doc[1] == [(0, 6, False)]
    assert by_doc[2] == [(0, 4, True), (1, 2, True)]
    stats = {r["chunk_id"]: r for r in packing.chunk_stats(packed).collect()}
    # 60 tokens / capacity 10 = 6 chunks, every one exactly full
    assert len(stats) == 6
    assert all(s["n_tokens"] == 10 for s in stats.values())


def test_pack_chunks_skips_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, "d e")], "doc_id int, text string"
    )
    packed = packing.pack_chunks(docs, "doc_id", "text", capacity=4)
    rows = _rows(packed, "chunk_id", "id")
    assert [r[1] for r in rows] == [1, 3, 3]  # doc 2 contributes nothing
    assert sum(r[2] for r in rows) == 5


# ---------------------------------------------------------------------------
# boilerplate paragraphs
# ---------------------------------------------------------------------------

def test_paragraph_boilerplate_cross_doc_only(spark):
    boiler = "subscribe now"
    docs = spark.createDataFrame(
        [
            (1, "alpha body\n\n" + boiler),
            (2, "beta body\n\n" + boiler),
            (3, "gamma solo\n\ngamma solo"),  # repeated WITHIN one doc only
            (4, "delta unique"),
        ],
        "id int, text string",
    )
    got = {
        r["id"]: (r["n_paragraphs"], r["n_boilerplate"], r["boilerplate_frac"])
        for r in textops.paragraph_boilerplate(docs, "id", "text").collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    # within-doc repetition must not self-qualify as boilerplate
    assert got[3] == (2, 0, 0.0)
    assert got[4] == (1, 0, 0.0)


def test_paragraph_boilerplate_min_dup_threshold(spark):
    docs = spark.createDataFrame(
        [(1, "x\n\nshared"), (2, "y\n\nshared"), (3, "z\n\nshared")],
        "id int, text string",
    )
    strict = textops.paragraph_boilerplate(docs, "id", "text", min_dup=4)
    assert all(r["n_boilerplate"] == 0 for r in strict.collect())
    loose = textops.paragraph_boilerplate(docs, "id", "text", min_dup=3)
    assert all(r["n_boilerplate"] == 1 for r in loose.collect())


# ---------------------------------------------------------------------------
# URL / domain ops
# ---------------------------------------------------------------------------

def test_url_domain_stats_counts_and_blocklist(spark):
    docs = spark.createDataFrame(
        [
            (1, "see http://a.example.org/x and https://b.example.net/y?q=1"),
            (2, "again http://a.example.org/z"),
            (3, "no urls here"),
            (4, "dup http://a.example.org/1 http://a.example.org/2"),
        ],
        "id int, text string",
    )
    got = {
        r["domain"]: (r["n_urls"], r["n_docs"], r["blocked"])
        for r in textops.url_domain_stats(
            docs, "id", "text", blocklist=["b.example.net"]
        ).collect()
    }
    # two urls in one doc must BOTH extract (regression: F.expr SQL-literal
    # escaping turned [^\s] into [^s] and swallowed the second URL)
    assert got["a.example.org"] == (4, 3, False)
    assert got["b.example.net"] == (1, 1, True)


def test_doc_url_filter_verdicts(spark):
    docs = spark.createDataFrame(
        [
            (1, "x https://bad.example.com/p y http://ok.example.org/q"),
            (2, "only http://ok.example.org/r"),
            (3, "plain text"),
        ],
        "id int, text string",
    )
    got = {
        r["id"]: (r["n_urls"], r["has_blocked_domain"])
        for r in textops.doc_url_filter(
            docs, "id", "text", blocklist=["bad.example.com"]
        ).collect()
    }
    assert got == {1: (2, True), 2: (1, False), 3: (0, False)}


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------

def test_temperature_sample_flattens_mixture(spark):
    # heavily skewed: src a has 9x the tokens of src b
    rows = [(i, "a", "w " * 9) for i in range(90)] + [
        (i, "b", "w") for i in range(90, 100)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    got = {
        r["source"]: r
        for r in textops.temperature_sample(
            docs, "source", "text", "doc_id", temperature=2.0
        ).collect()
    }
    # largest source keeps everything (keep_prob 1.0); smaller source keeps
    # sqrt-flattened share: sqrt(10/820)/sqrt(810/820)
    assert got["a"]["keep_prob"] == 1.0
    expected_b = (10 / 820) ** 0.5 / (810 / 820) ** 0.5
    assert abs(got["b"]["keep_prob"] - expected_b) < 1e-6
    assert got["a"]["n_kept"] == 90  # prob 1.0 keeps every doc
    assert 0 <= got["b"]["n_kept"] <= 10


def test_temperature_sample_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = textops.temperature_sample(docs, "source", "text", "doc_id").collect()
    b = textops.temperature_sample(docs, "source", "text", "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# deterministic epoch shuffle
# ---------------------------------------------------------------------------


def test_epoch_order_is_a_per_shard_permutation(spark):
    from anomalydetection_spark.operators import packing

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    out = packing.epoch_order(df, "doc_id", 8, seed=1).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == 300
    for shard, poss in by_shard.items():
        # positions are exactly 1..n within each shard
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_epoch_order_seed_reshuffles_but_shards_stay(spark):
    """A new epoch (seed) permutes WITHIN shards but never moves a doc
    between shards — the partitioned export is written once; reruns with
    the same seed reproduce the identical order."""
    from anomalydetection_spark.operators import packing

    df = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in packing.epoch_order(df, "doc_id", 4, seed=1).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in packing.epoch_order(df, "doc_id", 4, seed=2).collect()}
    a2 = {r["doc_id"]: (r["shard"], r["pos"]) for r in packing.epoch_order(df, "doc_id", 4, seed=1).collect()}
    assert a == a2  # same seed → identical order
    assert all(a[d][0] == b[d][0] for d in a)  # shard membership seed-free
    moved = sum(1 for d in a if a[d][1] != b[d][1])
    assert moved > 300  # a new seed re-orders nearly everything
