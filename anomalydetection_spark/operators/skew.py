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
