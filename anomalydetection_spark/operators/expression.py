"""expression constraint: named row-level SQL predicates (dbt-test analog).

The built-in constraints cover the interleaved-documents invariants the
reference pipeline implies (end_to_end_prediction.py:618-667 hard-codes its
checks in imperative steps); production tables always grow one-off business
rules on top — "n_chars matches length(text)", "source is never 'test' in
prod partitions". This operator is the generic escape hatch: each rule is a
SQL boolean expression over the row, optionally scoped by a ``where``
predicate, evaluated entirely JVM-side.

Semantics (per rule, per row):
- ``where`` non-TRUE (false or NULL) → row out of scope, not checked;
- in scope and ``expr`` TRUE → pass;
- in scope and ``expr`` FALSE **or NULL** → violation. NULL is a violation
  by design: a safety check that cannot be evaluated on a row must not
  silently pass it (the cross_column NULL-kind fix taught this lesson —
  see ADVICE r02).

Scale shape: ALL rules fuse into ONE projection over the document table —
R rules cost one scan + one hash aggregate (map-side partials) for the
verdicts, and the violation rows ride a filter over the same projection.
No joins, no windows, no Python. Verdict rows exist for every
(partition × rule) pair including all-pass ones, so a disappearing rule is
visible, not silent.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSTRAINT_PREFIX = "expression"

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9_.-]*$")


@dataclass(frozen=True)
class ExpressionRule:
    # short identifier; the verdict/violation constraint column reads
    # "expression:<name>"
    name: str
    # SQL boolean over the row's columns, e.g. "n_chars = length(text)"
    expr: str
    # optional SQL predicate scoping which rows are checked; out-of-scope
    # rows are neither passed nor failed (and are excluded from n_checked)
    where: str = ""

    @property
    def constraint(self) -> str:
        return f"{CONSTRAINT_PREFIX}:{self.name}"


def _validate(rules: tuple[ExpressionRule, ...]) -> None:
    seen: set[str] = set()
    for r in rules:
        if not _NAME_RE.match(r.name or ""):
            raise ValueError(f"invalid expression rule name: {r.name!r}")
        if r.name in seen:
            raise ValueError(f"duplicate expression rule name: {r.name!r}")
        seen.add(r.name)
        if not r.expr:
            raise ValueError(f"expression rule {r.name!r} requires an expr")


def check(
    docs: DataFrame, rules: tuple[ExpressionRule, ...]
) -> tuple[DataFrame, DataFrame]:
    """Evaluate all rules in one fused scan → (verdicts, violations) in the
    suite row shapes."""
    _validate(rules)
    if not rules:
        raise ValueError("expression check requires at least one rule")
    id_col = (
        F.col("doc_id").cast("string") if "doc_id" in docs.columns else F.lit(None).cast("string")
    )

    cols = [F.col("partition_id"), id_col.alias("_id")]
    for i, r in enumerate(rules):
        in_scope = (
            F.coalesce(F.expr(r.where).cast("boolean"), F.lit(False))
            if r.where
            else F.lit(True)
        )
        ok = F.coalesce(F.expr(r.expr).cast("boolean"), F.lit(False))
        cols.append(in_scope.alias(f"_c{i}"))
        cols.append((in_scope & ~ok).alias(f"_v{i}"))
    proj = docs.select(*cols)

    aggs = [F.count(F.lit(1)).cast("long").alias("row_count")]
    for i in range(len(rules)):
        aggs.append(F.sum(F.col(f"_c{i}").cast("long")).alias(f"_nc{i}"))
        aggs.append(F.sum(F.col(f"_v{i}").cast("long")).alias(f"_nv{i}"))
    agg = proj.groupBy("partition_id").agg(*aggs)

    per_rule = F.array(
        *[
            F.struct(
                F.lit(r.constraint).alias("constraint"),
                F.col(f"_nc{i}").alias("n_checked"),
                F.col(f"_nv{i}").alias("n_violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    stacked = agg.select(
        "partition_id", "row_count", F.explode(per_rule).alias("r")
    )
    verdicts = stacked.select(
        "partition_id",
        F.col("r.constraint").alias("constraint"),
        (F.col("r.n_violations") == 0).alias("passed"),
        F.col("r.n_violations").alias("violation_count"),
        "row_count",
        F.map_from_arrays(
            F.array(F.lit("n_checked"), F.lit("n_violations")),
            F.array(
                F.col("r.n_checked").cast("double"),
                F.col("r.n_violations").cast("double"),
            ),
        ).alias("metrics"),
    )

    fails = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(f"_v{i}"),
                    F.struct(
                        F.lit(r.constraint).alias("constraint"),
                        F.lit(
                            f"rule failed: {r.expr}"
                            + (f" [where {r.where}]" if r.where else "")
                        ).alias("detail"),
                    ),
                )
                for i, r in enumerate(rules)
            ]
        )
    )
    violations = (
        proj.select("partition_id", "_id", F.explode(fails).alias("f"))
        .select(
            "partition_id",
            F.col("f.constraint").alias("constraint"),
            F.col("_id").alias("doc_id"),
            F.lit(None).cast("int").alias("pos"),
            F.col("f.detail").alias("detail"),
        )
    )
    return verdicts, violations
