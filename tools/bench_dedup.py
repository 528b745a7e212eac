"""Dedup-operator throughput bench (the BENCH.md 'Training-data ops' table).

Builds the same corpus shape as round 1's ad-hoc measurement — text spans
exploded out of datagen documents — and times each near-dup family
end-to-end (signature → candidates → verify → count) at local[8].

Also measures the n-gram Jaccard frequency cap on a skew-injected corpus
(every doc sharing one boilerplate prefix): candidate pairs with the cap
vs the quadratic count the uncapped blocking would have generated.

Usage: python tools/bench_dedup.py [--n-docs 40000] [--master 'local[8]']
Prints one markdown row per measurement.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from anomalydetection_spark.datagen import DataGenConfig, generate_documents
from anomalydetection_spark.operators import dedup
from anomalydetection_spark.session import get_spark


def text_corpus(spark, n_docs: int):
    cfg = DataGenConfig(n_docs=n_docs, n_partitions=8)
    docs = generate_documents(spark, cfg)
    rows = (
        docs.select("doc_id", F.posexplode("spans").alias("pos", "span"))
        .filter(F.col("span.kind").isin("text", "code") & F.col("span.text").isNotNull())
        .select(
            F.concat_ws("#", "doc_id", F.col("pos").cast("string")).alias("doc_id"),
            F.col("span.text").alias("text"),
        )
    )
    return rows


def timed(label: str, df, n_input: int) -> tuple[int, float]:
    t0 = time.time()
    n_out = df.count()
    dt = time.time() - t0
    print(
        f"| {label} | {n_input:,} | {n_out:,} | {dt:.1f} | {n_input / dt:,.0f} |",
        flush=True,
    )
    return n_out, dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=40_000)
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    spark = get_spark(master=args.master)
    corpus = text_corpus(spark, args.n_docs)
    corpus = corpus.persist()
    n = corpus.count()
    print(f"corpus: {n:,} text rows from {args.n_docs:,} docs ({args.master})")
    print("| op | docs | output pairs | elapsed (s) | docs/sec |")
    print("|---|---|---|---|---|")

    timed(
        "MinHash(8)+LSH near-dup (3-gram Jaccard >= 0.5 verify)",
        dedup.minhash_dedup_pairs(corpus, "doc_id", "text", threshold=0.5),
        n,
    )
    timed(
        "SimHash-32 near-dup (hamming <= 3)",
        dedup.simhash_near_pairs(corpus, "doc_id", "text"),
        n,
    )

    # --- skew-injected n-gram Jaccard: cap vs uncapped candidate counts ----
    boiler = "all rights reserved terms of service apply "
    skew = corpus.select("doc_id", F.concat(F.lit(boiler), "text").alias("text"))
    sh = dedup.shingle_rows(skew, "doc_id", "text", 3)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    quad = dfreq.agg(
        F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("uncapped_pairs"),
        F.sum(
            F.when(F.col("df") <= 50, F.col("df") * (F.col("df") - 1) / 2).otherwise(0)
        ).alias("capped_pairs"),
    ).first()
    print(
        f"skew corpus shingle-blocking pair bound: uncapped <= {int(quad['uncapped_pairs']):,}"
        f" vs df<=50 cap <= {int(quad['capped_pairs']):,}"
    )
    t0 = time.time()
    n_pairs = dedup.ngram_jaccard_pairs(
        skew, "doc_id", "text", threshold=0.5, df_cap=50
    ).count()
    dt = time.time() - t0
    print(
        f"| n-gram Jaccard (df<=50 cap, skew-injected boilerplate) | {n:,} |"
        f" {n_pairs:,} | {dt:.1f} | {n / dt:,.0f} |"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
