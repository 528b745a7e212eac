"""Constraint suggestion: profile a table, emit constraints it satisfies.

The reference hand-tunes its thresholds (anomaly quantile, drop lists)
per dataset; a validation engine at fleet scale needs the Deequ
``ConstraintSuggestionRunner`` loop instead — profile the table once,
propose the constraints the data already satisfies (with headroom), and
hand back a runnable spec so the NEXT batch is validated against what
THIS batch looked like. Two surfaces:

- ``profile_suggest``: a generic per-column profiler → suggestion rows
  (completeness / uniqueness / value domain / value range), engine-
  portable: every emitted value is a bigint or a deterministic string,
  so an external SQL engine derives the identical suggestion set.
- ``suggest_spec``: the interleaved-documents specialization — observes
  the suite's own thresholds (null-text rate, empty-spans rate, volume
  bounds, hot-ref share, media_ref pattern shape) and returns a
  declarative spec dict that ``plans.declarative.compile_spec`` accepts,
  closing the loop: profile → suggest → validate.

Scale design: profiling is Deequ's two-pass shape — pass 1 is ONE hash
aggregate over the table (counts, distincts, min/max for every column at
once); pass 2 collects value domains ONLY for the columns pass 1 proved
low-cardinality (bounded by max_domain·|columns| values, broadcast-small
by construction). High-cardinality columns never reach a collect_set.
Exact per-column distincts expand the aggregate |columns|-fold (Spark's
multi-distinct Expand) — at real table scale pass
``exact_distinct=False`` to use approx_count_distinct in a single
non-expanded pass; suggestions are thresholds with headroom, so sketch
error is immaterial there (the oracle-checked driver query uses exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_suggest(
    df: DataFrame,
    columns: list[str] | None = None,
    max_domain: int = 8,
    null_rate_headroom: int = 2,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column constraint suggestions as (column, rule, param) rows.

    Rules emitted per column, from observed data:

    - ``complete``            — zero NULLs observed (param: '')
    - ``max_null_rate_ppm``   — NULLs observed; param = observed rate in
      parts-per-million, ceiling-rounded, times ``null_rate_headroom``
      (capped at 1e6) — exact integer arithmetic, engine-portable
    - ``unique``              — no NULLs and every value distinct
    - ``isin``                — at most ``max_domain`` distinct non-null
      values; param = sorted values joined with '|'
    - ``value_range``         — numeric columns; param = 'min..max'
    - ``pattern_skeleton``    — string columns where EVERY non-null value
      collapses to one character-class skeleton (digit runs → '9',
      letter runs → 'A', other chars literal — both replacements are
      idempotent, so skeletons are fixed points and the fingerprint is
      unambiguous); param = the skeleton, e.g. 'A9' for src17. High-
      entropy text never satisfies the single-skeleton proof, so the
      rule self-selects identifier-shaped columns.

    Row order is data-independent (column then rule); all params are
    deterministic strings.
    """
    cols = columns or df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))

    def skel(c: str):
        return F.regexp_replace(
            F.regexp_replace(F.col(c), "[0-9]+", "9"), "[A-Za-z]+", "A"
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(c)
            ).alias(f"{c}__nd")
        )
        if isinstance(dtypes[c], _NUMERIC):
            aggs.append(F.min(c).cast("string").alias(f"{c}__mn"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__mx"))
        if isinstance(dtypes[c], T.StringType):
            # distinct SKELETON count rides the same pass; == 1 proves the
            # column has a single shape (any sketch estimates 1 exactly)
            aggs.append(
                (
                    F.count_distinct(skel(c))
                    if exact_distinct
                    else F.approx_count_distinct(skel(c))
                ).alias(f"{c}__nskel")
            )
    stats = df.agg(*aggs)
    row = stats.collect()[0].asDict()  # one KB-sized row — the Deequ pass-1 action

    low_card = [c for c in cols if row[f"{c}__nd"] <= max_domain]
    skel_cols = [
        c
        for c in cols
        if isinstance(dtypes[c], T.StringType) and row.get(f"{c}__nskel") == 1
    ]
    domains: dict[str, str] = {}
    skeletons: dict[str, str] = {}
    if low_card or skel_cols:
        dom_row = (
            df.agg(
                *[
                    F.struct(
                        F.array_join(
                            F.array_sort(F.collect_set(F.col(c).cast("string"))), "|"
                        ).alias("dom"),
                        F.size(F.collect_set(F.col(c).cast("string"))).alias("n"),
                    ).alias(c)
                    for c in low_card
                ],
                *[F.max(skel(c)).alias(f"{c}__skel") for c in skel_cols],
            )
            .collect()[0]
            .asDict()
        )
        # the domain pass is exact even when pass 1 used sketches: a column
        # whose approx distinct slipped under the gate but whose true
        # cardinality exceeds max_domain is dropped here, never suggested
        domains = {
            c: dom_row[c]["dom"] for c in low_card if dom_row[c]["n"] <= max_domain
        }
        skeletons = {c: dom_row[f"{c}__skel"] for c in skel_cols}

    n = row["__n"]
    out: list[tuple[str, str, str]] = []
    for c in cols:
        nn, nd = row[f"{c}__nn"], row[f"{c}__nd"]
        nulls = n - nn
        if nulls == 0:
            out.append((c, "complete", ""))
        else:
            ppm = (nulls * 1_000_000 + n - 1) // n  # ceil, exact
            out.append(
                (c, "max_null_rate_ppm", str(min(1_000_000, ppm * null_rate_headroom)))
            )
        # uniqueness needs the EXACT distinct count — a sketch can never
        # prove nd == n, so approx mode suggests completeness/domains/
        # ranges but leaves uniqueness to an exact pass
        if exact_distinct and nulls == 0 and nd == n:
            out.append((c, "unique", ""))
        if nd <= max_domain and c in domains:
            out.append((c, "isin", domains[c]))
        if isinstance(dtypes[c], _NUMERIC):
            out.append((c, "value_range", f"{row[f'{c}__mn']}..{row[f'{c}__mx']}"))
        if c in skeletons and skeletons[c] is not None:
            out.append((c, "pattern_skeleton", skeletons[c]))
    out.sort()
    return df.sparkSession.createDataFrame(out, "column string, rule string, param string")


def _ceil_rate(num: int, den: int, headroom_num: int, headroom_den: int, floor: float) -> float:
    """Observed rational num/den scaled by headroom, ceiling-rounded at ppm
    granularity, floored — a threshold derived FROM data must sit strictly
    above the data that produced it."""
    if den == 0:
        return floor
    ppm = (num * 1_000_000 * headroom_num + den * headroom_den - 1) // (den * headroom_den)
    return max(floor, min(1.0, ppm / 1_000_000))


def suggest_spec(
    docs: DataFrame,
    headroom_num: int = 2,
    headroom_den: int = 1,
    min_rate_floor: float = 0.01,
    volume_slack_pct: int = 50,
) -> dict:
    """Observe an interleaved-documents batch and return a declarative spec
    (plans/declarative.py shape) under which THAT batch passes, with
    multiplicative headroom so ordinary batch-to-batch wobble doesn't page
    anyone — the profile→suggest→validate loop.

    ONE aggregate pass over the exploded span view observes every
    span-level rate and the media_ref shape at once; one doc-level
    aggregate observes per-partition volumes and the empty-spans rate.
    The media_ref pattern is INFERRED, not assumed: if every non-null ref
    matches ``^<prefix>-<digits>$`` with a single prefix, the suggested
    pattern pins that prefix and the observed digit-length range;
    otherwise the pattern constraint is omitted (suggesting a pattern the
    data violates would fail the very batch that defined it).
    """
    from anomalydetection_spark.operators.reassembly import explode_spans_meta

    exploded = explode_spans_meta(docs)
    ref = F.col("media_ref")
    digits = F.regexp_extract(ref, r"^([A-Za-z]+)-([0-9]+)$", 2)
    prefix = F.regexp_extract(ref, r"^([A-Za-z]+)-([0-9]+)$", 1)
    span_row = (
        exploded.agg(
            F.sum(
                F.when(F.col("kind").isin("text", "code") & F.col("text_len").isNull(), 1)
                .otherwise(0)
            ).alias("null_text"),
            F.sum(F.when(F.col("kind").isin("text", "code"), 1).otherwise(0)).alias(
                "text_spans"
            ),
            F.sum(F.when(ref.isNotNull(), 1).otherwise(0)).alias("n_refs"),
            F.sum(F.when(ref.isNotNull() & (digits == ""), 1).otherwise(0)).alias(
                "bad_shape_refs"
            ),
            F.count_distinct(F.when(digits != "", prefix)).alias("n_prefixes"),
            F.min(F.when(digits != "", F.length(digits))).alias("min_dlen"),
            F.max(F.when(digits != "", F.length(digits))).alias("max_dlen"),
            F.min(F.when(digits != "", prefix)).alias("a_prefix"),
        )
        .collect()[0]
        .asDict()
    )
    doc_rows = (
        docs.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.size("spans") == 0, 1).otherwise(0)).alias("n_empty"),
        )
        .collect()
    )
    n_docs = sum(r["n_docs"] for r in doc_rows)
    n_empty = sum(r["n_empty"] for r in doc_rows)
    min_part = min((r["n_docs"] for r in doc_rows), default=0)
    max_part = max((r["n_docs"] for r in doc_rows), default=0)

    constraints: list[dict] = [
        {"type": "schema", "mode": "compatible"},
        {
            "type": "column_stats",
            "max_null_text_rate": _ceil_rate(
                span_row["null_text"], span_row["text_spans"],
                headroom_num, headroom_den, min_rate_floor,
            ),
            "max_empty_spans_rate": _ceil_rate(
                n_empty, n_docs, headroom_num, headroom_den, min_rate_floor
            ),
        },
        {"type": "uniqueness"},
        {"type": "referential"},
        {"type": "distribution_drift"},
        {"type": "span_order"},
        {"type": "frequent_items"},
        {"type": "cross_column"},
        {
            "type": "volume",
            "min_docs": max(1, min_part * (100 - volume_slack_pct) // 100),
            "max_docs": max_part * (100 + volume_slack_pct) // 100 + 1,
        },
    ]
    if (
        span_row["n_refs"] > 0
        and span_row["bad_shape_refs"] == 0
        and span_row["n_prefixes"] == 1
    ):
        constraints.insert(
            6,
            {
                "type": "pattern",
                "ref_pattern": (
                    f"^{span_row['a_prefix']}-[0-9]"
                    f"{{{span_row['min_dlen']},{span_row['max_dlen']}}}$"
                ),
            },
        )
    return {"constraints": constraints}
