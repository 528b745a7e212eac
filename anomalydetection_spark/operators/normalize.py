"""Text normalization operators for training-data pipelines.

- markup stripping: HTML/XML tag removal + entity decoding + control-char
  stripping + whitespace collapse, all JVM ``regexp_replace`` chains
  (whole-stage codegen — this touches every byte of a 10^12-doc corpus,
  so the hot path never leaves the JVM)
- Unicode NFC canonicalization: a scalar Arrow-batched pandas UDF
  (``unicodedata.normalize``) — the one step with no JVM builtin; Python,
  but vectorized per Arrow batch, never per row via ``udf()``

The reference pipeline consumes pre-cleaned log lines (drain.py:17 only
``strip()``s); a web-scale corpus needs the cleaning pass itself. Both
transforms are deterministic pure functions of the input string, so the
DuckDB oracle (``nfc_normalize`` + the same RE2-safe patterns) re-derives
them exactly.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Engine-portable patterns (no lookaround/backrefs): identical strings run
# on Spark's Java regex and DuckDB's RE2.
TAG_PATTERN = r"<[^>]+>"
CONTROL_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"  # escaped form: safe to embed in SQL text
WS_PATTERN = r"\s+"

# minimal entity table, applied in fixed order AFTER tag stripping so
# '&lt;b&gt;' never becomes a live tag ('&amp;' last, per the usual rule
# that ampersand decoding must not re-trigger other entities)
ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_markup(col: Column) -> Column:
    """Tag-strip + entity-decode + control-strip + whitespace-collapse as
    one JVM expression chain. Order matters and is part of the contract:
    tags → entities → control chars → whitespace → trim."""
    out = F.regexp_replace(col, TAG_PATTERN, "")
    for ent, repl in ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    out = F.regexp_replace(out, CONTROL_PATTERN, "")
    out = F.regexp_replace(out, WS_PATTERN, " ")
    return F.trim(out)


@pandas_udf(StringType())
def nfc_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Unicode NFC canonicalization, Arrow batch at a time (U1-style
    scalar-iterator pandas UDF; SURVEY §2.11)."""
    for s in batches:
        yield s.map(
            lambda t: unicodedata.normalize("NFC", t) if isinstance(t, str) else t
        )


def normalize_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    nfc: bool = True,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *keep_cols, normalized, chars_removed, nfc_changed): the
    standard cleaning pass — markup strip (JVM) then NFC canonicalization
    (Arrow UDF).

    ``chars_removed`` counts the markup/whitespace bytes dropped;
    ``nfc_changed`` flags docs whose text was not already NFC (combining
    sequences composed). ``keep_cols`` ride through the map-only plan —
    never join the output back to the corpus to recover a column (that is
    a corpus-wide shuffle at real scale)."""
    keep = keep_cols or []
    stripped = strip_markup(F.col(text_col))
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.col(text_col).alias("_raw"),
        stripped.alias("_stripped"),
    )
    if nfc:
        out = out.withColumn("normalized", nfc_udf(F.col("_stripped")))
    else:
        out = out.withColumn("normalized", F.col("_stripped"))
    return out.select(
        id_col,
        *keep,
        "normalized",
        (F.length("_raw") - F.length("_stripped")).cast("long").alias("chars_removed"),
        (F.col("normalized") != F.col("_stripped")).alias("nfc_changed"),
    )


# ---------------------------------------------------------------------------
# C4-style line filters (Raffel et al. 2020, public method): keep lines that
# end in terminal punctuation and have enough words; drop docs that are left
# with too few lines or contain ban-phrases / code braces.
# ---------------------------------------------------------------------------

TERMINAL_PUNCT = (".", "!", "?", '"')
BAN_PHRASES = ["lorem ipsum", "javascript"]
MIN_WORDS_PER_LINE = 5
MIN_LINES_PER_DOC = 3


def _line_ok(line: Column) -> Column:
    words = F.size(F.split(F.trim(line), WS_PATTERN))
    ends_ok = F.lit(False)
    for p in TERMINAL_PUNCT:
        ends_ok = ends_ok | F.endswith(F.trim(line), F.lit(p))
    return (F.length(F.trim(line)) > 0) & ends_ok & (words >= MIN_WORDS_PER_LINE)


def c4_line_filter(
    df: DataFrame, id_col: str, text_col: str, *, keep_cols: list[str] | None = None
) -> DataFrame:
    """(id, *keep_cols, n_lines, n_kept_lines, keep, reason): line-level
    C4 filtering.

    Per-line rule: non-empty, ends in terminal punctuation, ≥5 words.
    Doc verdicts (first matching reason wins, fixed order):
      'ban_phrase'  — lowercase text contains a ban phrase
      'brace'       — text contains '{' (code page heuristic)
      'too_few_lines' — <3 lines survive the line rule
      'kept'        — otherwise
    One map-only pass: split + higher-order filter, no shuffle, no UDF."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, _line_ok)
    lower = F.lower(F.col(text_col))
    ban = F.lit(False)
    for p in BAN_PHRASES:
        ban = ban | F.contains(lower, F.lit(p))
    reason = (
        F.when(ban, F.lit("ban_phrase"))
        .when(F.contains(F.col(text_col), F.lit("{")), F.lit("brace"))
        .when(F.size(kept) < MIN_LINES_PER_DOC, F.lit("too_few_lines"))
        .otherwise(F.lit("kept"))
    )
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        (reason == "kept").alias("keep"),
        reason.alias("reason"),
    )
