"""Skew-handling join utilities (SURVEY §4 O10, north-rule requirement).

Two layers of defense against hot keys:

1. AQE (`spark.sql.adaptive.skewJoin.enabled`, on in session.py): at
   runtime Spark splits oversized shuffle partitions of sort-merge joins.
   This covers *join* skew with zero code — but only for shuffle joins,
   and only after a stage materializes.
2. Explicit salting (this module): for known-hot keys (e.g. a doc_id
   prefix that dominates the table) the fact side gets a random-but-
   deterministic salt in [0, S) appended to the join key, and the
   dimension side is exploded S× so every salted key still matches. The
   hot key's rows now spread across S tasks *by construction* — no
   runtime detection needed, and it also works for broadcast-ineligible
   dimensions and for aggregations (see operators/uniqueness.py for the
   salted two-phase aggregate variant).

Salting multiplies the dim side S×, so keep S small (8-32) and apply only
when skew is known — the helper takes an optional ``hot_keys`` list to
salt ONLY the hot keys, leaving the rest of the join untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with salt-spread hot keys.

    ``hot_keys=None`` salts every key (uniform spread, S× dim blow-up);
    with an explicit hot list, only those keys are salted — cold keys join
    on salt 0 and the dim explodes only for hot rows.
    """
    fact_salt = F.pmod(F.xxhash64(F.monotonically_increasing_id(), F.lit("sj")), F.lit(n_salts))
    dim_salts = F.sequence(F.lit(0), F.lit(n_salts - 1))
    if hot_keys is not None:
        is_hot_f = F.col(key).isin(hot_keys)
        fact_salt = F.when(is_hot_f, fact_salt).otherwise(F.lit(0))
        dim_salts = F.when(F.col(key).isin(hot_keys), dim_salts).otherwise(
            F.array(F.lit(0))
        )
    f = fact.withColumn("_salt", fact_salt.cast("int"))
    # generators must be projected, not withColumn'd, when wrapped in CASE
    d = dim.select("*", F.explode(dim_salts).alias("_salt_raw")).withColumn(
        "_salt", F.col("_salt_raw").cast("int")
    ).drop("_salt_raw")
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")


def key_skew(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Hot-key audit: the top-k heaviest keys with their share of the table
    and their multiple of the mean key load — the diagnostic that decides
    BETWEEN the two defenses above (a handful of named hot keys → salt
    exactly those; broad heavy tail → AQE + more partitions).

    One hash aggregate over the key (map-side partials), a KB-sized scalar
    aggregate broadcast back, and a TakeOrdered over the |distinct keys|
    aggregate — the raw table is scanned once and never sorted. Ties at the
    k-th slot break deterministically (count desc, key asc). Shares round
    at 1e-6 from exact bigint counts, so engines agree bit-for-bit.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("n"))
    totals = counts.agg(
        F.sum("n").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("_n_keys"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col(key).asc()).limit(top_k)
    return top.crossJoin(F.broadcast(totals)).select(
        key,
        "n",
        F.round(F.col("n") / F.col("_total"), 6).alias("share"),
        F.round(F.col("n") * F.col("_n_keys") / F.col("_total"), 6).alias("x_mean"),
    )


def partition_skew(df: DataFrame, group_col: str = "partition_id") -> DataFrame:
    """Partition-balance audit, ONE summary row:
    (n_groups, total_rows, min_rows, max_rows, imbalance, cv) where
    imbalance = max/mean (the straggler factor a reader of this table eats)
    and cv is the coefficient of variation of group sizes, computed from
    exact decimal(38,0) moment sums — summation order cannot perturb it.
    Two hash aggregates over |groups| rows; the table is scanned once."""
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    d38 = "decimal(38,0)"
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("total_rows"),
        F.min("n").alias("min_rows"),
        F.max("n").alias("max_rows"),
        F.round(
            F.max("n") * F.count(F.lit(1)) / F.sum("n"), 6
        ).alias("imbalance"),
        # cv = sqrt(k*Σn² − (Σn)²) / Σn, exact under the sqrt's argument
        F.round(
            F.sqrt(
                (
                    F.count(F.lit(1)).cast(d38) * F.sum(F.col("n").cast(d38) * F.col("n").cast(d38))
                    - F.sum(F.col("n").cast(d38)) * F.sum(F.col("n").cast(d38))
                ).cast("double")
            )
            / F.sum("n").cast("double"),
            6,
        ).alias("cv"),
    )


def join_fanout_audit(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_k: int = 10,
) -> DataFrame:
    """Pre-join explosion audit: predict an equi-join's output size and
    name the keys that dominate it BEFORE paying for the join.

    An inner equi-join emits Σ_k n_left(k)·n_right(k) rows — a handful
    of keys heavy on BOTH sides can turn a "join two 10^9-row tables"
    into 10^13 output rows (the unnoticed many-to-many that takes a
    cluster down). This audit computes that sum exactly plus the top-k
    contributing keys, from per-side key histograms:

    one hash aggregate per side (map-side partials over distinct keys),
    an equi-join of the two |distinct-key|-sized count tables (never the
    raw rows), one scalar rollup, and a TakeOrdered for the top keys.
    Output (one row per top key, summary columns repeated):
    (key, n_left, n_right, product, predicted_rows, n_join_keys,
    max_product, fanout_x) where fanout_x = predicted_rows relative to
    the larger input at 1e-6 fixed-point — > 1 means the join EXPANDS.
    All counts exact bigints; products/sums exact decimal(38,0); ties at
    the k-th slot break (product desc, key asc) so engines agree."""
    d38 = "decimal(38,0)"
    ln = left.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("n_left"))
    rn = right.groupBy(key).agg(F.count(F.lit(1)).cast("long").alias("n_right"))
    both = ln.join(rn, key, "inner").select(
        key,
        "n_left",
        "n_right",
        (F.col("n_left").cast(d38) * F.col("n_right").cast(d38)).alias("_p"),
    )
    totals = both.agg(
        F.sum("_p").cast(d38).alias("_predicted"),
        F.count(F.lit(1)).cast("long").alias("n_join_keys"),
        F.max("_p").cast(d38).alias("_maxp"),
    ).crossJoin(
        left.agg(F.count(F.lit(1)).cast("long").alias("_nl")).crossJoin(
            right.agg(F.count(F.lit(1)).cast("long").alias("_nr"))
        )
    )
    top = both.orderBy(F.col("_p").desc(), F.col(key).asc()).limit(top_k)

    # SATURATING long casts: a decimal(38,0) beyond 2^63-1 would cast to
    # NULL under non-ANSI Spark (and error in DuckDB) — exactly for the
    # catastrophic joins this audit exists to flag. Beyond ~9.2e18
    # predicted rows the precise count is irrelevant; LONG_MAX reads as
    # "over the cliff" and both engines agree on it.
    long_max = "CAST(9223372036854775807 AS DECIMAL(38,0))"

    def _sat(expr: str) -> Column:
        return F.expr(f"CAST(least({expr}, {long_max}) AS BIGINT)")

    return top.crossJoin(F.broadcast(totals)).select(
        key,
        "n_left",
        "n_right",
        _sat("_p").alias("product"),
        _sat("_predicted").alias("predicted_rows"),
        "n_join_keys",
        _sat("_maxp").alias("max_product"),
        F.expr(fanout_fp6_sql()).alias("fanout_x_fp6"),
    )


def fanout_fp6_sql(
    predicted: str = "_predicted", nl: str = "_nl", nr: str = "_nr"
) -> str:
    """Spark SQL text of the saturating fixed-point fanout ratio
    floor(predicted·1e6 / max(nl,nr)) as bigint.

    Saturation happens BEFORE Spark's decimal ``div`` (which emits a
    WRAPPING bigint, never LONG_MAX): when even the LONG_MAX-clamped
    predicted count puts the quotient past 2^63-1 — i.e. predicted >
    (LONG_MAX div 1e6) · max(nl,nr) — the CASE emits LONG_MAX outright.
    The guard product stays inside decimal(38,0) (≤ ~8.5e31) and the
    ELSE-branch quotient is provably ≤ (LONG_MAX div 1e6)·1e6 < 2^63, so
    nothing ever wraps. The DuckDB twin mirrors the identical CASE in
    hugeint (driver_queries_quality.JOIN_FANOUT_SQL), so both engines
    agree bit-for-bit on both sides of the cliff."""
    long_max = "CAST(9223372036854775807 AS DECIMAL(38,0))"
    mx = f"CAST(greatest({nl}, {nr}) AS DECIMAL(38,0))"
    return (
        f"CASE WHEN least({predicted}, {long_max}) >"
        f" CAST(9223372036854 AS DECIMAL(38,0)) * {mx}"
        f" THEN CAST(9223372036854775807 AS BIGINT)"
        f" ELSE CAST((least({predicted}, {long_max})"
        f" * CAST(1000000 AS DECIMAL(38,0)))"
        f" div {mx} AS BIGINT) END"
    )
