"""Deterministic, fully-distributed synthetic data generator.

Produces the interleaved ``documents`` table (BASELINE.json ``input_hint``
shape) plus the ``media_assets`` dimension, with every violation class
injectable on demand (FIXTURES.md §1):

- duplicate ``doc_id`` values incl. hot keys (salted-uniqueness exercise)
- dangling ``media_ref`` (referential anti-join)
- malformed ``media_ref`` format / NULL ref on media spans
  (pattern / cross_column constraints)
- null ``text`` on text spans (null-rate stats)
- drifted partitions with a different span-kind mix and span-length
  distribution (KL/PSI drift)
- reversed ``offset`` sequences (reassembly-order invariant)
- empty ``spans`` arrays

Scale design: generation is ``spark.range`` + built-in column expressions
only — no driver-side loops, no Python UDFs — so the same code generates
1e3 docs in a unit test or 1e10 docs on a cluster. All randomness is
``xxhash64(id, tag, seed)`` based: deterministic per row regardless of
partitioning, task retries, or executor count.

The reference's corpus is a labeled log file read line-by-line
(models/drain.py:11-21); this generator is its scalable analog with the
label trick replaced by injected violation classes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Small deterministic vocabulary for span text (pseudo-words).
_VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "stream", "batch", "shuffle", "partition",
    "vector", "tensor", "sketch", "digest", "anomaly", "verdict", "span",
    "media", "offset", "manifest", "lineage", "quantile", "drift", "salt",
]

KINDS = ["text", "image", "audio", "code"]


@dataclass(frozen=True)
class DataGenConfig:
    n_docs: int = 10_000
    n_partitions: int = 8
    seed: int = 42
    n_media: int = 1_000
    max_spans: int = 8
    # violation knobs (fractions of docs / spans)
    dup_rate: float = 0.02          # pairwise duplicate doc_ids
    hot_keys: int = 2               # number of hot duplicate doc_ids
    hot_rate: float = 0.01          # fraction of docs collapsing onto hot keys
    dangling_rate: float = 0.03     # media spans with refs outside the catalog
    malformed_ref_rate: float = 0.0  # media spans with refs in a wrong format (pattern)
    missing_ref_rate: float = 0.0    # media spans with NULL media_ref (cross_column)
    null_text_rate: float = 0.02    # text spans with NULL text
    empty_spans_rate: float = 0.01  # docs with spans = []
    reversed_offset_rate: float = 0.05  # docs with reversed (still valid) offsets
    drift_partitions: tuple[int, ...] = ()  # partitions with shifted distributions
    # baseline distribution knobs
    mean_words: int = 8
    drift_extra_words: int = 10     # drifted spans are this much longer
    data_partitions: int | None = None  # spark partitions for the range


def _u(col_id: Column, tag: str, seed: int) -> Column:
    """Deterministic uniform [0,1) derived from (id, tag, seed)."""
    return (F.pmod(F.xxhash64(col_id, F.lit(tag), F.lit(seed)), F.lit(1_000_000))) / 1_000_000.0


def _h(col_id: Column, tag: str, seed: int) -> Column:
    """Deterministic non-negative 63-bit hash from (id, tag, seed)."""
    return F.abs(F.xxhash64(col_id, F.lit(tag), F.lit(seed)))


def generate_documents(spark: SparkSession, cfg: DataGenConfig) -> DataFrame:
    """The interleaved documents table with injected violations."""
    s = cfg.seed
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    n_vocab = len(_VOCAB)

    df = spark.range(0, cfg.n_docs, numPartitions=cfg.data_partitions or None)
    cid = F.col("id")

    part = F.pmod(cid, F.lit(cfg.n_partitions)).cast("int")
    drifted = part.isin(list(cfg.drift_partitions)) if cfg.drift_partitions else F.lit(False)

    # --- doc_id with duplicate + hot-key injection ------------------------
    u_dup = _u(cid, "dup", s)
    base_doc_id = F.format_string("doc-%012d", cid)
    pair_doc_id = F.format_string("doc-%012d", cid - F.pmod(cid, F.lit(2)))
    hot_doc_id = F.format_string("hot-%03d", F.pmod(_h(cid, "hot", s), F.lit(cfg.hot_keys)))
    doc_id = (
        F.when(u_dup < F.lit(cfg.hot_rate), hot_doc_id)
        .when(u_dup < F.lit(cfg.hot_rate + cfg.dup_rate), pair_doc_id)
        .otherwise(base_doc_id)
    )

    # --- span array -------------------------------------------------------
    n_spans = (F.pmod(_h(cid, "nspans", s), F.lit(cfg.max_spans)) + 1).cast("int")
    n_spans = F.when(_u(cid, "empty", s) < F.lit(cfg.empty_spans_rate), F.lit(0)).otherwise(n_spans)
    reverse = _u(cid, "rev", s) < F.lit(cfg.reversed_offset_rate)

    def span_for(i: Column) -> Column:
        """Build one span struct for span index i of doc `cid` (closure cols)."""
        sid = cid * 1024 + i  # unique per (doc, span) for hashing
        ku = _u(sid, "kind", s)
        # baseline kind mix: 55% text, 20% image, 10% audio, 15% code
        # drifted mix:       25% text, 40% image, 25% audio, 10% code
        kind = (
            F.when(
                drifted,
                F.when(ku < 0.25, "text")
                .when(ku < 0.65, "image")
                .when(ku < 0.90, "audio")
                .otherwise("code"),
            ).otherwise(
                F.when(ku < 0.55, "text")
                .when(ku < 0.75, "image")
                .when(ku < 0.85, "audio")
                .otherwise("code")
            )
        )
        is_texty = kind.isin("text", "code")
        n_words = (
            F.pmod(_h(sid, "nwords", s), F.lit(cfg.mean_words * 2)) + 1
            + F.when(drifted, F.lit(cfg.drift_extra_words)).otherwise(F.lit(0))
        ).cast("int")
        words = F.transform(
            F.sequence(F.lit(1), n_words),
            lambda w: F.element_at(vocab, (F.pmod(_h(sid * 131 + w, "word", s), F.lit(n_vocab)) + 1).cast("int")),
        )
        text = F.array_join(words, " ")
        text = F.when(
            is_texty & (_u(sid, "nulltext", s) >= F.lit(cfg.null_text_rate)), text
        ).otherwise(F.lit(None).cast("string"))

        # media_ref: only for media spans; a slice is dangling (beyond catalog);
        # optional injected slices are NULL (cross_column) or wrong-format (pattern)
        ref_space = int(cfg.n_media / (1.0 - cfg.dangling_rate)) if cfg.dangling_rate > 0 else cfg.n_media
        ref_num = F.pmod(_h(sid, "ref", s), F.lit(max(ref_space, 1)))
        u_refviol = _u(sid, "refviol", s)
        well_formed = F.format_string("m-%08d", ref_num)
        media_ref = F.when(
            ~is_texty,
            F.when(u_refviol < F.lit(cfg.missing_ref_rate), F.lit(None).cast("string"))
            .when(
                u_refviol < F.lit(cfg.missing_ref_rate + cfg.malformed_ref_rate),
                F.format_string("REF_%08d", ref_num),
            )
            .otherwise(well_formed),
        ).otherwise(F.lit(None).cast("string"))

        offset = F.when(reverse, n_spans - 1 - i).otherwise(i).cast("int")
        return F.struct(
            kind.alias("kind"), text.alias("text"),
            media_ref.alias("media_ref"), offset.alias("offset"),
        )

    spans = F.when(n_spans > 0, F.transform(F.sequence(F.lit(0), n_spans - 1), span_for)).otherwise(
        F.array().cast("array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    )

    return df.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        part.alias("partition_id"),
    )


def generate_media_assets(spark: SparkSession, cfg: DataGenConfig) -> DataFrame:
    """Referential dimension: the catalog of valid media_refs."""
    s = cfg.seed
    df = spark.range(0, cfg.n_media)
    cid = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(_h(cid, "mkind", s), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.format_string("m-%08d", cid).alias("media_ref"),
        kind.alias("media_kind"),
        (F.pmod(_h(cid, "mbytes", s), F.lit(10_000_000)) + 1024).alias("n_bytes"),
    )


def clean_config(cfg: DataGenConfig) -> DataGenConfig:
    """A copy of cfg with every violation knob zeroed — used to produce the
    drift *baseline* distribution and golden 'all pass' fixtures."""
    return DataGenConfig(
        n_docs=cfg.n_docs,
        n_partitions=cfg.n_partitions,
        seed=cfg.seed,
        n_media=cfg.n_media,
        max_spans=cfg.max_spans,
        dup_rate=0.0,
        hot_keys=1,
        hot_rate=0.0,
        dangling_rate=0.0,
        malformed_ref_rate=0.0,
        missing_ref_rate=0.0,
        null_text_rate=0.0,
        empty_spans_rate=0.0,
        reversed_offset_rate=0.0,
        drift_partitions=(),
        mean_words=cfg.mean_words,
        drift_extra_words=cfg.drift_extra_words,
        data_partitions=cfg.data_partitions,
    )
