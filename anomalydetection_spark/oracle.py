"""Single-node pandas/NumPy oracle for the constraint suite.

A deliberately simple reimplementation in the *reference's* idioms —
``value_counts`` for group counts (preprocessing.py:7), ``np.percentile``
with linear interpolation (end_to_end_prediction.py:447), ``isin`` anti-sets
(preprocessing.py:10), histogram + KL arithmetic (VAE_utils.py:112-115,
296-301) — used as the golden-output check (SURVEY §5): the distributed
engine must agree with this on identical input.

Input: pandas DataFrames where ``spans`` is a list of dicts with keys
(kind, text, media_ref, offset). Output: plain dict-of-DataFrames matching
the engine's verdict/violation semantics (compared after canonical sort).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from anomalydetection_spark.operators.drift import (
    LENGTH_BUCKET_MAX,
    LENGTH_BUCKET_WIDTH,
    DriftThresholds,
)
from anomalydetection_spark.operators.stats import StatsThresholds

TEXTY = {"text", "code"}


def explode(docs: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in docs.iterrows():
        for pos, s in enumerate(r["spans"] or []):
            rows.append(
                {
                    "doc_id": r["doc_id"],
                    "partition_id": r["partition_id"],
                    "pos": pos,
                    "kind": s["kind"],
                    "text": s["text"],
                    "media_ref": s["media_ref"],
                    "offset": s["offset"],
                }
            )
    return pd.DataFrame(
        rows, columns=["doc_id", "partition_id", "pos", "kind", "text", "media_ref", "offset"]
    )


def stats_metrics(docs: pd.DataFrame, sp: pd.DataFrame, th: StatsThresholds) -> pd.DataFrame:
    out = []
    for pid, g in docs.groupby("partition_id"):
        gs = sp[sp["partition_id"] == pid]
        texty = gs[gs["kind"].isin(TEXTY)]
        n_null = int(texty["text"].isna().sum())
        lens = gs["text"].dropna().str.len().to_numpy(dtype=float)
        sizes = g["spans"].apply(len)
        null_rate = n_null / len(texty) if len(texty) else 0.0
        empty_rate = float((sizes == 0).mean())
        out.append(
            {
                "partition_id": pid,
                "constraint": "column_stats",
                "passed": (
                    len(g) >= th.min_rows
                    and empty_rate <= th.max_empty_spans_rate
                    and null_rate <= th.max_null_text_rate
                ),
                "violation_count": n_null,
                "row_count": len(g),
                "n_spans": len(gs),
                "null_text_rate": null_rate,
                "empty_spans_rate": empty_rate,
                "spans_per_doc_mean": float(sizes.mean()),
                "text_len_mean": float(lens.mean()) if len(lens) else None,
                "text_len_std": float(lens.std(ddof=1)) if len(lens) > 1 else None,
                "text_len_min": float(lens.min()) if len(lens) else None,
                "text_len_max": float(lens.max()) if len(lens) else None,
                # same linear interpolation as the reference's np.percentile
                "text_len_p50": float(np.percentile(lens, 50)) if len(lens) else None,
                "text_len_p95": float(np.percentile(lens, 95)) if len(lens) else None,
            }
        )
    return pd.DataFrame(out)


def uniqueness_violations(docs: pd.DataFrame) -> pd.DataFrame:
    counts = docs["doc_id"].value_counts()  # reference idiom, preprocessing.py:7
    dups = set(counts[counts > 1].index)
    v = docs[docs["doc_id"].isin(dups)][["partition_id", "doc_id"]].copy()
    v["constraint"] = "uniqueness"
    return v.reset_index(drop=True)


def referential_violations(sp: pd.DataFrame, media: pd.DataFrame) -> pd.DataFrame:
    refs = sp[sp["media_ref"].notna()]
    valid = set(media["media_ref"])
    v = refs[~refs["media_ref"].isin(valid)][  # anti-set, preprocessing.py:10 inverse
        ["partition_id", "doc_id", "pos", "media_ref"]
    ].copy()
    v["constraint"] = "referential"
    return v.reset_index(drop=True)


def _hist(sp: pd.DataFrame) -> dict[tuple[str, str], float]:
    out: dict[tuple[str, str], float] = {}
    kind_counts = sp["kind"].value_counts()
    for k, n in kind_counts.items():
        out[("span_kind", str(k))] = n / len(sp)
    lens = sp["text"].dropna().str.len()
    if len(lens):
        buckets = np.minimum(lens // LENGTH_BUCKET_WIDTH, LENGTH_BUCKET_MAX).astype(int)
        bc = buckets.value_counts()
        for b, n in bc.items():
            out[("span_length", str(b))] = n / len(lens)
    return out


def drift_scores(sp: pd.DataFrame, baseline_sp: pd.DataFrame, th: DriftThresholds) -> pd.DataFrame:
    base = _hist(baseline_sp)
    out = []
    for pid, g in sp.groupby("partition_id"):
        cur = _hist(g)
        for feature in ("span_kind", "span_length"):
            keys = {k for k in set(cur) | set(base) if k[0] == feature}
            kl = psi = 0.0
            for key in keys:
                p = cur.get(key, 0.0) + th.epsilon
                q = base.get(key, 0.0) + th.epsilon
                kl += p * math.log(p / q)
                psi += (p - q) * math.log(p / q)
            out.append({"partition_id": pid, "feature": feature, "kl": kl, "psi": psi})
    return pd.DataFrame(out)


def span_order_violations(docs: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in docs.iterrows():
        spans = r["spans"] or []
        if not spans:
            continue
        offs = sorted(s["offset"] for s in spans)
        if offs != list(range(len(spans))):
            rows.append({"partition_id": r["partition_id"], "doc_id": r["doc_id"]})
    v = pd.DataFrame(rows, columns=["partition_id", "doc_id"])
    v["constraint"] = "span_order"
    return v


def pattern_violations(sp: pd.DataFrame, ref_pattern: str) -> pd.DataFrame:
    """Non-null media_refs failing the format regex (re.fullmatch-free:
    the engine's rlike is a search, so the pattern carries its anchors)."""
    import re

    rx = re.compile(ref_pattern)
    refs = sp[sp["media_ref"].notna()]
    bad = refs[~refs["media_ref"].map(lambda r: bool(rx.search(r)))]
    v = bad[["partition_id", "doc_id", "pos", "media_ref"]].copy()
    v["constraint"] = "pattern"
    return v.reset_index(drop=True)


def cross_column_violations(sp: pd.DataFrame) -> pd.DataFrame:
    """kind-vs-media_ref consistency + kind domain (operators/patterns.py)."""
    media_kinds = {"image", "audio", "video"}
    known = media_kinds | TEXTY
    bad = sp[
        (sp["kind"].isin(media_kinds) & sp["media_ref"].isna())
        | (sp["kind"].isin(TEXTY) & sp["media_ref"].notna())
        | ~sp["kind"].isin(known)
    ]
    v = bad[["partition_id", "doc_id", "pos", "kind"]].copy()
    v["constraint"] = "cross_column"
    return v.reset_index(drop=True)


def frequent_items_verdicts(sp: pd.DataFrame, max_ref_share: float, min_refs: int) -> pd.DataFrame:
    """Hot media_ref detection in the reference's value_counts idiom."""
    out = []
    for pid, g in sp.groupby("partition_id"):
        refs = g["media_ref"].dropna()
        counts = refs.value_counts()  # preprocessing.py:7 idiom
        n_refs = int(len(refs))
        hot = counts[counts > max_ref_share * n_refs] if n_refs >= min_refs else counts[:0]
        out.append(
            {
                "partition_id": pid,
                "constraint": "frequent_items",
                "passed": len(hot) == 0,
                "violation_count": int(len(hot)),
                "row_count": n_refs,
                "max_ref_share": float(counts.max() / n_refs) if n_refs else 0.0,
            }
        )
    return pd.DataFrame(out)


def volume_verdicts(
    docs: pd.DataFrame,
    min_docs: int = 1,
    max_docs: int | None = None,
    expected_partitions: list | None = None,
) -> pd.DataFrame:
    """Per-partition document-count bounds (operators/volume.py), in the
    reference's row-count-guard idiom (end_to_end_prediction.py:507)."""
    counts = docs["partition_id"].value_counts().to_dict()
    pids = set(counts)
    if expected_partitions is not None:
        pids |= set(expected_partitions)
    out = []
    for pid in sorted(pids):
        n = int(counts.get(pid, 0))
        ok = n >= min_docs and (max_docs is None or n <= max_docs)
        out.append(
            {
                "partition_id": pid,
                "constraint": "volume",
                "passed": ok,
                "violation_count": 0 if ok else 1,
                "row_count": n,
            }
        )
    return pd.DataFrame(out)
