"""Two-table reconciliation: does a copy still equal its source?

Validation engines are asked this constantly — after a migration, a
backfill, a CDC replay, an engine swap — and none of the single-table
constraints answer it. The reference has the single-node analog baked
into its workflow (it re-reads its own stage dumps and trusts them,
end_to_end_prediction.py:618-667); at 10^12 documents "trust" needs a
cheap proof.

Two levels, priced differently:

- ``summary(...)``: per-group row counts + an order-insensitive content
  checksum (SUM of a 64-bit row hash, promoted to decimal(38,0) so 1e12
  rows cannot wrap). ONE hash aggregate per side + a join on the group
  key — no fact-side shuffle beyond the aggregates' map-side partials.
  This is the O(scan) "are they equal" gate a scheduler runs every time.
  SUM (not XOR-fold) is deliberate: XOR is blind to even-multiplicity
  errors (a row duplicated twice on one side XORs away); a sum of hashes
  is multiset-sensitive.

- ``diff(...)``: per-KEY drill-down — which keys are missing from which
  side, which carry different values. Aggregates each side per key first
  (count + checksum), then full-outer joins the two KEY-level frames: a
  shuffle on the key, the unavoidable price of naming offenders, paid
  only after the summary gate failed. Duplicate keys don't explode the
  join (they're pre-aggregated into the per-key multiset checksum).

Cross-engine determinism note: raw checksums are engine-specific (each
engine hashes its own way), but every EQUALITY over them — counts_match,
checksum_match, per-key status — is engine-independent on the same data,
so those booleans/statuses cross the oracle boundary while raw sums don't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed(df: DataFrame, key_cols: list[str], compare_cols: list[str], group_col: str | None):
    row_hash = F.xxhash64(*[F.col(c) for c in (*key_cols, *compare_cols)])
    gcols = [group_col] if group_col else []
    return (
        df.select(*gcols, *key_cols, row_hash.cast("decimal(38,0)").alias("_h"))
        .groupBy(*gcols, *key_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"), F.sum("_h").alias("_sum"))
    )


def summary(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    group_col: str,
) -> DataFrame:
    """Per-group equality gate:
    (group_col, n_left, n_right, counts_match, checksum_match).
    A group present on only one side reports the other side's count as 0
    and matches nothing."""
    row_hash = F.xxhash64(*[F.col(c) for c in (*key_cols, *compare_cols)])

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}"),
            F.sum(row_hash.cast("decimal(38,0)")).alias(f"_sum_{tag}"),
        )

    j = side(left, "left").join(side(right, "right"), group_col, "full_outer")
    return j.select(
        group_col,
        F.coalesce("n_left", F.lit(0)).alias("n_left"),
        F.coalesce("n_right", F.lit(0)).alias("n_right"),
        (F.coalesce("n_left", F.lit(0)) == F.coalesce("n_right", F.lit(0))).alias(
            "counts_match"
        ),
        (
            F.col("_sum_left").isNotNull()
            & F.col("_sum_right").isNotNull()
            & (F.col("_sum_left") == F.col("_sum_right"))
        ).alias("checksum_match"),
    )


def diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    group_col: str | None = None,
) -> DataFrame:
    """Key-level drill-down: one row per differing key with status in
    {missing_in_right, missing_in_left, value_mismatch} (value_mismatch
    covers different values AND different duplicate-multiplicity, both
    via the per-key multiset checksum). Matching keys are filtered out
    before anything leaves the join. When ``group_col`` is given it rides
    along (coalesced across sides) for per-partition accounting."""
    lk = _keyed(left, key_cols, compare_cols, group_col)
    rk = _keyed(right, key_cols, compare_cols, group_col)
    ln = {"_n": "_ln", "_sum": "_lsum", **({group_col: "_lg"} if group_col else {})}
    rn = {"_n": "_rn", "_sum": "_rsum", **({group_col: "_rg"} if group_col else {})}
    lk = lk.withColumnsRenamed(ln)
    rk = rk.withColumnsRenamed(rn)
    j = lk.join(rk, key_cols, "full_outer")
    status = (
        F.when(F.col("_rn").isNull(), F.lit("missing_in_right"))
        .when(F.col("_ln").isNull(), F.lit("missing_in_left"))
        .when(
            (F.col("_ln") != F.col("_rn")) | (F.col("_lsum") != F.col("_rsum")),
            F.lit("value_mismatch"),
        )
    )
    out_cols = [*key_cols, status.alias("status")]
    if group_col:
        out_cols.insert(0, F.coalesce("_lg", "_rg").alias(group_col))
    return j.select(*out_cols).filter(F.col("status").isNotNull())
