"""Public column-function facade — one import point for the engine's
reusable Column-level helpers (SURVEY §2.8's scalar-function surface).

    from anomalydetection_spark import functions as EF
    df.select(EF.l2_norm("embedding"), EF.portable_hash60(F.col("text")))
"""

from anomalydetection_spark.functions.scalars import (  # noqa: F401
    bpe_ish_tokens,
    cosine,
    dot,
    l2_norm,
    portable_hash60,
    whitespace_tokens,
)
