"""PII detection and redaction for training-corpus curation.

Finds (and optionally masks) personally-identifiable strings — emails,
IPv4 addresses, phone-shaped numbers, SSN-shaped ids — the scrubbing pass
every public-web training corpus runs before tokenization.

All patterns are engine-portable regexes (no lookaround, no backrefs) so
the same pattern string runs on Spark's Java regex engine and DuckDB's
RE2 oracle byte-identically. Everything is built-in column expressions
(`regexp_count` / `regexp_replace`, JVM whole-stage codegen): this scans
every byte of a 10^12-doc corpus, so nothing here may leave the JVM.

Reference scope note: the reference repo (ElkamelDyari/AnomalyDetection)
has no PII pass — this is part of the beyond-reference curation surface
(README "LLM-data-pipeline operators").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered dict: scan/redact apply in this order, so a string matched by an
# earlier pattern is already masked when later patterns run (emails first —
# an email's domain must not survive as a hostname-ish token)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(text_col: Column | str) -> dict[str, Column]:
    """Per-kind match-count columns for one text column.

    `ssn` (ddd-dd-dddd) and `phone` (ddd-ddd-dddd) are disjoint by shape;
    `ipv4` cannot overlap either (dots vs dashes), and the email pattern
    requires an alphabetic TLD so an IP-shaped host (`a@10.1.2.3`) is
    counted only as ipv4. The scan reports raw per-pattern hits; the
    *redaction* applies in `PII_PATTERNS` order."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return {kind: F.regexp_count(c, F.lit(pat)) for kind, pat in PII_PATTERNS.items()}


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_email, n_ipv4, n_phone, n_ssn, has_pii): one projection pass,
    one regexp_count per pattern — map-only, no shuffle."""
    counts = pii_counts(text_col)
    cols = [counts[k].cast("long").alias(f"n_{k}") for k in PII_PATTERNS]
    total = sum(counts.values())
    return df.select(F.col(id_col), *cols, (total > 0).alias("has_pii"))


def pii_redact(
    df: DataFrame, text_col: str, out_col: str = "redacted", tag: str = "<{kind}>"
) -> DataFrame:
    """Adds ``out_col``: ``text_col`` with every PII match replaced by its
    kind tag (``<email>``, ``<ipv4>``, ...), applied in PII_PATTERNS order.
    Spark's regexp_replace is global; the DuckDB twin needs the 'g' flag."""
    out = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, tag.format(kind=kind))
    return df.withColumn(out_col, out)
