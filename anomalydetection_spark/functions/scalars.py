"""Reusable scalar/array Column helpers (all JVM-side, codegen-friendly).

Centralizes the column expressions the operators share so user code can
compose them without reaching into operator modules:

- array math: dot / l2_norm / cosine (sequential double reduction —
  deterministic, the reference's np.linalg.norm analog)
- portable_hash60: md5-derived 60-bit hash reproducible in any engine
- tokenization: whitespace tokens + BPE-ish subword chunks
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# canonical implementations live with their operator families; this module
# is the stable public re-export surface
from anomalydetection_spark.operators.dedup import portable_hash60  # noqa: F401
from anomalydetection_spark.operators.similarity import cosine, dot, l2_norm  # noqa: F401
from anomalydetection_spark.operators.textops import bpe_ish_tokens  # noqa: F401


def whitespace_tokens(text_col: str | Column) -> Column:
    """Whitespace tokenization with trim — the engine's standard split
    (identical regex semantics to the DuckDB oracle's string_split_regex)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")
