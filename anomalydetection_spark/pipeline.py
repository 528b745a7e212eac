"""The reference pipeline, re-expressed as one lazy Spark DAG.

Reference flow (end_to_end_prediction.py:618-667, eager, file-materialized
between every stage):

    raw logs → Drain parse (drain.py:11-43) → template mine (drain.py:53-67)
    → frequency filter (preprocessing.py:4-13) → CodeBERT embed
    (feature_extraction.py:26-73) → SimCLR/VAE transform → L2 score
    (end_to_end_prediction.py:444) → 95th-pct threshold (:447) → verdict
    (:451) → report join (:502-516) + metrics (:464-479)

This module states the same semantics declaratively — Catalyst fuses all
narrow stages into whole-stage-codegen spans, shuffles only at the
group-count and the quantile, and the Python "model" runs as a
scalar-iterator pandas UDF (loaded once per executor, Arrow batches — the
U1 contract; the heavy transformer is replaced by a deterministic
hash-projection stand-in since no torch ships here, with the production
swap point documented).

Template mining: Drain3's online prefix-tree clustering is inherently
sequential-stateful; the declarative analog is token masking (digits /
hex / uuids → <*>), which at web scale is both deterministic and
embarrassingly parallel — the classic trade the reference's own pipeline
approximates, since Drain templates converge to masked shapes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMBED_DIM = 64


# --- stage 1: parse (drain.py:11-43) ---------------------------------------

def parse_logs(raw: DataFrame, line_col: str = "value") -> DataFrame:
    """Label + 9-field positional parse with empty-string fallback.

    First token '-' → label 0 else 1 (drain.py:19); rows with <9 tokens get
    all-empty structured fields (drain.py:36-38) — made explicit with a
    single when() guard instead of a Python row loop.
    """
    head = F.split(F.trim(F.col(line_col)), " ", 2)
    parsed = raw.select(
        F.when(F.element_at(head, 1) == "-", 0).otherwise(1).alias("label"),
        F.coalesce(F.element_at(head, 2), F.lit("")).alias("log"),
    )
    toks = F.split(F.col("log"), r"\s+")
    n = F.size(toks)
    fields = ["Timestamp", "Date", "Node", "Time", "NodeRepeat", "Type", "Component", "Level"]
    cols = [
        F.when(n >= 9, F.element_at(toks, i + 1)).otherwise(F.lit("")).alias(name)
        for i, name in enumerate(fields)
    ]
    content = F.when(n >= 9, F.array_join(F.slice(toks, 9, n - 8), " ")).otherwise(F.lit(""))
    return parsed.select("label", "log", *cols, content.alias("Content"))


# --- stage 2: template mining (declarative analog of drain.py:53-67) -------

_MASK_NUM = r"\b\d+\b"
_MASK_HEX = r"\b0[xX][0-9a-fA-F]+\b"
_MASK_IP = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def mine_templates(parsed: DataFrame, content_col: str = "Content") -> DataFrame:
    """Mask volatile tokens → template; extract params as the masked-out
    token map (the reference's template+params pair, drain.py:57-66,
    rebuilt with arrays_zip/filter instead of a Python zip loop)."""
    masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(content_col), _MASK_IP, "<*>"), _MASK_HEX, "<*>"
        ),
        _MASK_NUM,
        "<*>",
    )
    out = parsed.withColumn("template", masked)
    zipped = F.arrays_zip(
        F.split(F.col("template"), r"\s+").alias("t"),
        F.split(F.col(content_col), r"\s+").alias("w"),
    )
    params = F.filter(zipped, lambda z: z["t"] == "<*>")
    return out.withColumn(
        "params",
        F.map_from_entries(
            F.transform(
                params,
                lambda z, i: F.struct(
                    F.concat(F.lit("param_"), i.cast("string")).alias("k"), z["w"].alias("v")
                ),
            )
        ),
    )


def generalize_templates(
    templated: DataFrame,
    template_col: str = "template",
    max_wildcards: int = 2,
) -> DataFrame:
    """Drain-style cluster refinement after regex masking (drain.py:53-67):
    templates sharing the Drain tree key — (token count, first two tokens,
    last token) — are merged token-wise, each position where members
    disagree generalized to ``<*>``, PROVIDED the merged template would
    gain at most ``max_wildcards`` new wildcard positions (the relational
    analog of Drain's similarity threshold: too-dissimilar templates stay
    separate clusters). Heterogeneous corpora thus converge to Drain-like
    cluster counts instead of fragmenting per literal value.

    Input: one row per raw template (with its ``n`` count, e.g. from a
    groupBy). Output: (template, n_templates_merged, n_events) — merged
    groups plus untouched singletons/overflow groups.

    Scale: two hash aggregates over (group key, position) rows — the
    explode is bounded by Σ tokens over *distinct templates*, not events;
    min/max per position get map-side partials; no window, no Python.
    """
    toks = F.split(F.col(template_col), r"\s+")
    keyed = templated.select(
        F.col(template_col).alias("_tpl"),
        F.col("n"),
        toks.alias("_toks"),
        F.size(toks).alias("_n_tok"),
        F.element_at(toks, 1).alias("_t1"),
        F.element_at(toks, 2).alias("_t2"),
        F.element_at(toks, -1).alias("_tl"),
    )
    gkey = ["_n_tok", "_t1", "_t2", "_tl"]
    pos = keyed.select(
        *gkey, "_tpl", "n", F.posexplode("_toks").alias("_p", "_tok")
    )
    per_pos = pos.groupBy(*gkey, "_p").agg(
        F.min("_tok").alias("_lo"), F.max("_tok").alias("_hi")
    )
    merged = (
        per_pos.select(
            *gkey,
            "_p",
            F.when(F.col("_lo") == F.col("_hi"), F.col("_lo")).otherwise(F.lit("<*>")).alias("_mt"),
            (F.col("_lo") != F.col("_hi")).cast("int").alias("_wild"),
        )
        .groupBy(*gkey)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_mt"))), lambda x: x["_mt"]
                ),
            ).alias("_merged_tpl"),
            F.sum("_wild").alias("_n_new_wild"),
        )
    )
    grp = keyed.groupBy(*gkey).agg(
        F.sum("n").alias("_n_events"), F.count("*").alias("_n_tpls")
    )
    decided = merged.join(grp, gkey).select(
        *gkey,
        (F.col("_n_new_wild") <= F.lit(max_wildcards)).alias("_do_merge"),
        "_merged_tpl",
        "_n_events",
        "_n_tpls",
    )
    merged_out = decided.filter(F.col("_do_merge")).select(
        F.col("_merged_tpl").alias("template"),
        F.col("_n_tpls").cast("long").alias("n_templates_merged"),
        F.col("_n_events").cast("long").alias("n_events"),
    )
    kept_out = (
        keyed.join(decided.filter(~F.col("_do_merge")).select(*gkey), gkey)
        .select(
            F.col("_tpl").alias("template"),
            F.lit(1).cast("long").alias("n_templates_merged"),
            F.col("n").cast("long").alias("n_events"),
        )
    )
    return merged_out.unionByName(kept_out)


# --- stage 3: frequency filter (preprocessing.py:4-13) ----------------------

def frequency_filter(
    templated: DataFrame, threshold: int = 5
) -> tuple[DataFrame, DataFrame]:
    """Keep rows whose template occurs > threshold times; the dropped rows
    are RETURNED as the violation side (T2 materialized), not discarded.
    Window form (single shuffle on template) per SURVEY A4."""
    from pyspark.sql.window import Window

    counted = templated.withColumn(
        "template_count", F.count("*").over(Window.partitionBy("template"))
    )
    kept = counted.filter(F.col("template_count") > threshold)
    dropped = counted.filter(F.col("template_count") <= threshold)
    return kept, dropped


# --- stage 4: embed (U1 — feature_extraction.py:26-73) ----------------------

def _load_projection(dim: int, vocab_hash_dim: int = 1024) -> np.ndarray:
    """The 'model': a fixed seeded random projection matrix. Stands in for
    CodeBERT (feature_extraction.py:38-43); production swaps this loader
    for the transformer checkpoint — the load-once-per-executor pattern
    below is unchanged."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((vocab_hash_dim, dim)).astype(np.float32)


# process-level model cache: the scalar-iterator UDF body runs once per
# TASK, so without this a reused python worker would re-load the model for
# every task it executes. Keyed by the loader's import path (closures are
# re-unpickled per task, so object identity won't survive; module-path
# identity does).
_MODEL_CACHE: dict[tuple, object] = {}


def _load_model_once(loader, dim: int):
    key = (getattr(loader, "__module__", ""), getattr(loader, "__qualname__", repr(loader)), dim)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = loader(dim)
    return _MODEL_CACHE[key]


def embed(
    df: DataFrame,
    text_col: str = "template",
    dim: int = EMBED_DIM,
    loader=_load_projection,
) -> DataFrame:
    """Scalar-iterator pandas UDF: the projection loads ONCE per executor
    process (cached across tasks via _load_model_once), then every Arrow
    batch is a vectorized bag-of-hashed-tokens matmul — the reference's
    batched GPU loop (feature_extraction.py:53-71) without per-row Python.

    ``loader`` is the model swap point: production replaces the seeded
    projection with the transformer-checkpoint loader; the load-once /
    batch-sized-call contract is pinned by tests/test_pipeline.py's
    counting fake regardless of which loader is plugged in. The loaded
    object only needs ``.shape[0]`` (hash vocab size) and to support
    ``batch_matrix @ model``."""
    from pyspark.sql.functions import pandas_udf

    import zlib

    @pandas_udf("array<float>")
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        proj = _load_model_once(loader, dim)  # once per executor-process lifetime
        vdim = proj.shape[0]
        for s in batches:
            mats = np.zeros((len(s), vdim), dtype=np.float32)
            # one pandas explode per batch, then crc32 only per UNIQUE token
            # (log corpora are template-shaped: the vocabulary is tiny next
            # to the token stream) — no per-row Python loop.
            # crc32, NOT hash(): python str hashing is salted per process
            # and would differ across executors.
            toks = s.reset_index(drop=True).fillna("").str.split().explode().dropna()
            if len(toks):
                uniq, inv = np.unique(toks.to_numpy(dtype=object), return_inverse=True)
                codes = np.array(
                    [zlib.crc32(u.encode()) % vdim for u in uniq], dtype=np.int64
                )
                np.add.at(mats, (toks.index.to_numpy(), codes[inv]), 1.0)
            yield pd.Series(list((mats @ proj).astype(np.float32)))

    return df.withColumn("embedding", _embed(F.col(text_col)))


# --- stages 5-7: score, threshold, verdict ---------------------------------

def score_and_verdict(
    embedded: DataFrame, threshold_percentile: float = 0.95
) -> DataFrame:
    """L2 score (A6, JVM higher-order aggregate), exact global quantile
    (A5 — matching np.percentile's interpolation at
    end_to_end_prediction.py:447), broadcast threshold join, verdict (P7)."""
    scored = embedded.withColumn(
        "anomaly_score",
        F.sqrt(
            F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
            )
        ),
    )
    th = scored.agg(
        F.expr(f"percentile(anomaly_score, {threshold_percentile})").alias("_th")
    )
    return (
        scored.crossJoin(F.broadcast(th))
        .withColumn(
            "anomaly_prediction", (F.col("anomaly_score") > F.col("_th")).cast("int")
        )
        .drop("_th")
    )


def evaluate(verdicts: DataFrame) -> DataFrame:
    """Accuracy / precision / recall / F1 + anomaly rate from conditional
    aggregates (end_to_end_prediction.py:464-479) — one scalar agg row."""
    y, p = F.col("label"), F.col("anomaly_prediction")
    agg = verdicts.agg(
        F.count("*").alias("n"),
        F.sum(((y == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((y == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((y == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((y == 0) & (p == 0)).cast("long")).alias("tn"),
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    return agg.select(
        "n", "tp", "fp", "fn", "tn",
        ((F.col("tp") + F.col("tn")) / F.col("n")).alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0).alias("f1"),
        (F.col("tp") + F.col("fp")).alias("n_anomalies"),
    )


def final_report(verdicts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Stage 8 (end_to_end_prediction.py:481-535): the combined report.

    The reference glues originals ⊕ templates ⊕ predictions by ROW POSITION
    guarded only by a row-count equality check (:507, :514) — fragile under
    any reordering. Here every stage carried its keys, so the report is
    just a projection, and the reference's guard becomes an explicit
    *cardinality + agreement* check DataFrame (J3/J4):

        (n_rows, n_flagged, label_agreement_rate)

    where label_agreement_rate generalizes the reference's
    ``(true_label == label).mean()`` (:519-521).
    """
    report = verdicts.select(
        "label", "log", "template", "params", "anomaly_score", "anomaly_prediction"
    )
    checks = verdicts.agg(
        F.count("*").alias("n_rows"),
        F.sum("anomaly_prediction").cast("long").alias("n_flagged"),
        F.round(
            F.avg((F.col("label") == F.col("anomaly_prediction")).cast("double")), 6
        ).alias("label_agreement_rate"),
    )
    return report, checks


def run_pipeline(
    raw: DataFrame,
    freq_threshold: int = 5,
    pct: float = 0.95,
    embed_col: str = "log",
) -> dict:
    """End-to-end: one DAG, two shuffles (template window + quantile), no
    intermediate files. Returns {verdicts, dropped, metrics} DataFrames.

    ``embed_col``: 'log' embeds the raw message (score varies per row, like
    the reference's fine-grained Drain templates); 'template' embeds the
    masked shape (scores collapse per template group).
    """
    parsed = parse_logs(raw)
    templated = mine_templates(parsed)
    kept, dropped = frequency_filter(templated, freq_threshold)
    embedded = embed(kept, text_col=embed_col)
    verdicts = score_and_verdict(embedded, pct)
    report, checks = final_report(verdicts)
    return {
        "verdicts": verdicts,
        "dropped": dropped,
        "metrics": evaluate(verdicts),
        "report": report,
        "report_checks": checks,
    }
