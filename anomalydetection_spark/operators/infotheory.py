"""Information-theoretic column analyzers: entropy, distinctness, mutual
information, correlation.

The Deequ analyzer family the suite's per-column stats don't yet cover —
the signals a curation pipeline watches per batch: did a categorical
column's entropy collapse (one value flooding the table), did two columns
that should be independent start co-varying, did distinctness drop.

Cross-engine determinism (the DSIR / unigram-NLL precedent,
driver_queries_training.py): every logarithm is taken ONCE, of an exact
integer rational, and immediately fixed-pointed at 1e-9 —
``round(ln(a/b)·1e9)`` as a bigint — then only integer arithmetic (count-
weighted sums) follows. Entropy and MI are emitted as exact bigint
numerators (nats · 1e9 · N), so equal inputs hash equal across engines;
consumers divide by N driver-side when they want a float.

Scale design: everything reduces to hash aggregates over the analyzed
columns — value counts are |domain|-sized after the first agg, marginals
broadcast onto the joint table, and nothing wider than (value, count)
crosses a shuffle. No windows, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP = 1_000_000_000.0  # 1e-9 fixed point, the repo-wide ln scale


def _ln_fp(num, den):
    """round(ln(num/den)·1e9) as bigint — ONE ln of an exact integer
    rational, the only float op in any analyzer here."""
    return F.round(F.log(num.cast("double") / den.cast("double")) * F.lit(_FP)).cast(
        "long"
    )


def entropy_fp(df: DataFrame, value_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Shannon entropy of ``value_col``'s non-null distribution, per group.

    Emits per group: ``n`` (non-null rows), ``n_distinct``,
    ``distinctness_ppm`` (⌊distinct·1e6/n⌋, exact), and ``entropy_fp_n``
    = Σ_v cnt_v · round(ln(n/cnt_v)·1e9) — the entropy numerator in
    nats·1e9·n. H itself = entropy_fp_n / (1e9·n); the division stays
    with the consumer so the emitted row is pure bigint.

    Two hash aggregates: value counts (|domain|-sized), then the group
    rollup. NULLs are excluded from the distribution (completeness is its
    own analyzer)."""
    gcols = group_cols or []
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        # |domain|-sized; persisted so the totals branch and the join
        # branch share ONE table scan instead of re-aggregating the corpus
        # per consumer (Catalyst does not dedupe common subtrees)
        .persist()
    )
    totals = counts.groupBy(*gcols).agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_distinct")
    )
    joined = counts.join(F.broadcast(totals), gcols) if gcols else counts.crossJoin(
        F.broadcast(totals)
    )
    out = joined.groupBy(*gcols).agg(
        F.max("n").cast("long").alias("n"),
        F.max("n_distinct").cast("long").alias("n_distinct"),
        F.sum(F.col("cnt") * _ln_fp(F.col("n"), F.col("cnt")))
        .cast("long")
        .alias("entropy_fp_n"),
    )
    # integer DIV, not float-divide-then-truncate: a correctly-rounded
    # double quotient can land on the next integer and truncate high
    return out.select(
        *gcols,
        "n",
        "n_distinct",
        F.expr("(n_distinct * 1000000) div n").alias("distinctness_ppm"),
        "entropy_fp_n",
    )


def mutual_information_fp(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Mutual information between two categorical columns, as the exact
    bigint numerator ``mi_fp_n`` = Σ_{x,y} cnt_xy · round(ln(cnt_xy·n /
    (cnt_x·cnt_y))·1e9), in nats·1e9·n (zero ⇔ independent up to fixed-
    point granularity; rows with a NULL on either side excluded).

    One joint count aggregate; the two marginals derive FROM the joint
    (|domain_x| and |domain_y| sized — never a second pass over the
    table) and broadcast back onto it."""
    pairs = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(x_col, y_col)
        .agg(F.count(F.lit(1)).alias("cnt_xy"))
        # |cells|-sized; persisted so both marginals and the total derive
        # from ONE materialized joint — unpersisted, the four consumers
        # would each re-scan and re-aggregate the full table
        .persist()
    )
    mx = pairs.groupBy(x_col).agg(F.sum("cnt_xy").alias("cnt_x"))
    my = pairs.groupBy(y_col).agg(F.sum("cnt_xy").alias("cnt_y"))
    n = pairs.agg(F.sum("cnt_xy").alias("n"))
    joined = (
        pairs.join(F.broadcast(mx), x_col)
        .join(F.broadcast(my), y_col)
        .crossJoin(F.broadcast(n))
    )
    return joined.agg(
        F.max("n").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        # operands promoted to double BEFORE the products: cnt_xy·n would
        # overflow int64 at 10^12-row tables, and IEEE double mult/div is
        # bit-identical across engines so the fixed-pointed ln still hashes
        F.sum(
            F.col("cnt_xy")
            * _ln_fp(
                F.col("cnt_xy").cast("double") * F.col("n"),
                F.col("cnt_x").cast("double") * F.col("cnt_y"),
            )
        )
        .cast("long")
        .alias("mi_fp_n"),
    )


def correlation_exact(
    df: DataFrame, x_col: str, y_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Pearson correlation between two INTEGER columns from exact bigint
    moment sums — n, Σx, Σy, Σxy, Σx², Σy² are emitted exactly (the
    mergeable sufficient statistics), plus ``corr`` rounded to 6 as the
    display value. Callers needing cross-engine hashing compare the exact
    sums; rows with a NULL on either side are excluded pairwise (the
    Deequ Correlation contract). One hash aggregate, map-side partial."""
    gcols = group_cols or []
    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    x = F.when(both, F.col(x_col)).cast("long")
    y = F.when(both, F.col(y_col)).cast("long")
    agg = df.groupBy(*gcols).agg(
        F.count(x).cast("long").alias("n"),
        F.sum(x).cast("long").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y).cast("long").alias("sxy"),
        F.sum(x * x).cast("long").alias("sxx"),
        F.sum(y * y).cast("long").alias("syy"),
    )
    # derived second-moment products in decimal(38,0): n·Σy² already grazes
    # int64 at modest scale (cents² sums), and silent wrap would flip corr
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    varx = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    vary = dec("n") * dec("syy") - dec("sy") * dec("sy")
    corr = F.when(
        (varx > 0) & (vary > 0),
        F.round(num / F.sqrt(varx.cast("double") * vary.cast("double")), 6),
    )
    return agg.select(*gcols, "n", "sx", "sy", "sxy", "sxx", "syy", corr.alias("corr"))


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """All-pairs Pearson correlation over a fixed INTEGER column list in
    ONE hash aggregate — the matrix form of ``correlation_exact``: Deequ
    runs one analyzer per pair (p·(p−1)/2 table passes); here every
    pair's exact bigint moment sums (n, Σx, Σy, Σxy, Σx², Σy²) ride a
    single scan as map-side partials, and the long-form pivot happens on
    the one aggregated row.

    Emits one row per unordered pair (col_x < col_y by list position):
    the exact sums plus round-6 ``corr``. Pairwise NULL exclusion per
    pair. Scale: the aggregate width is O(p²) columns — fine to p ~ 50;
    the scan stays single-pass regardless, and the long-form pivot
    happens driver-side on the ONE aggregated row (model-sized, the
    pca.py moment-collect precedent — a plan-side union of p²/2 selects
    would re-run the aggregate per branch, Catalyst does not dedupe
    common subtrees). Derived corr: exact Python big-int cross products
    (overflow-free by construction), ONE float division — int→float and
    decimal→double both round to nearest, so the value matches an
    engine-side decimal derivation bit for bit.
    """
    import math

    aggs = []
    pairs = [(cx, cy) for i, cx in enumerate(cols) for cy in cols[i + 1 :]]
    for cx, cy in pairs:
        both = F.col(cx).isNotNull() & F.col(cy).isNotNull()
        x = F.when(both, F.col(cx)).cast("long")
        y = F.when(both, F.col(cy)).cast("long")
        p = f"{cx}__{cy}"
        aggs += [
            F.count(x).cast("long").alias(f"{p}__n"),
            F.sum(x).cast("long").alias(f"{p}__sx"),
            F.sum(y).cast("long").alias(f"{p}__sy"),
            F.sum(x * y).cast("long").alias(f"{p}__sxy"),
            F.sum(x * x).cast("long").alias(f"{p}__sxx"),
            F.sum(y * y).cast("long").alias(f"{p}__syy"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()

    out = []
    for cx, cy in pairs:
        p = f"{cx}__{cy}"
        n = int(row[f"{p}__n"])
        sx = int(row[f"{p}__sx"] or 0)
        sy = int(row[f"{p}__sy"] or 0)
        sxy = int(row[f"{p}__sxy"] or 0)
        sxx = int(row[f"{p}__sxx"] or 0)
        syy = int(row[f"{p}__syy"] or 0)
        num = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        corr = (
            round(float(num) / math.sqrt(float(varx) * float(vary)), 6)
            if varx > 0 and vary > 0
            else None
        )
        out.append((cx, cy, n, sx, sy, sxy, sxx, syy, corr))
    return df.sparkSession.createDataFrame(
        out,
        "col_x string, col_y string, n long, sx long, sy long, "
        "sxy long, sxx long, syy long, corr double",
    )
