"""As-of join — Spark has no native one (SURVEY guide's common-OLAP gap).

Semantics: for each left row, attach the single right row with the same
key whose timestamp is the latest one ≤ the left timestamp.

Strategy (composition of built-ins, no Python):
    union the two sides tagged by origin → one window sorted by
    (key, ts, origin) → ``last(right_value, ignorenulls)`` carries the most
    recent right row forward onto every left row.

This is one shuffle on the key (the same partitioning both sides need
anyway) and one sort within partitions — versus the naive
range-join-then-argmax which explodes to |left|×|right-per-key| rows.
Left rows tie-broken to see right rows at the SAME timestamp (origin
order sorts right first at equal ts).

For genuinely huge per-key histories a production variant adds time-bucket
pre-partitioning; the window form is the correct baseline and is exactly
expressible in the DuckDB oracle for verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at-or-before
    its timestamp (NULL-filled when no prior right row exists).

    ``tiebreak``: extra right-side ordering column for deterministic
    results when several right rows share a (key, ts) — the largest
    tiebreak value wins.
    """
    # Carry all right columns as ONE struct so last(ignorenulls) picks every
    # carried value from the SAME right row — per-column last() would mix
    # rows whenever a right row legitimately holds NULL in one column.
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    struct_type = right.select(r_struct.alias("_r")).schema["_r"].dataType
    l_tagged = left.withColumn("_origin", F.lit(1)).withColumn(
        "_r", F.lit(None).cast(struct_type)
    )
    r_tagged = right.select(key, ts, F.lit(0).alias("_origin"), r_struct.alias("_r"))
    left_cols = [c for c in left.columns]
    union_cols = [key, ts, "_origin", "_r"]
    extra_left = [c for c in left_cols if c not in (key, ts)]
    for c in extra_left:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.select(*union_cols, *extra_left).unionByName(
        r_tagged.select(*union_cols, *extra_left)
    )
    order = [F.col(ts), F.col("_origin")]
    if tiebreak is not None:
        order.append(F.col("_r")[tiebreak].asc_nulls_first())
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    carried = unioned.select(
        key,
        ts,
        "_origin",
        *extra_left,
        F.last("_r", ignorenulls=True).over(w).alias("_r_carried"),
    )
    return (
        carried.filter(F.col("_origin") == 1)
        .select(
            key,
            ts,
            *extra_left,
            *[F.col("_r_carried")[c].alias(f"{c}{suffix}") for c in right_cols],
        )
    )
