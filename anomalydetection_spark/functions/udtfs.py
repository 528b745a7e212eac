"""Python UDTFs — the table-function corner of the UDF surface (SURVEY
§2.11 U6 sibling).

The engine's generator workloads run on JVM ``explode``/``posexplode``
(operators/reassembly.py, dedup.shingle_rows) — that stays the hot
path. UDTFs cover what those can't express as a single column
expression: a *table* function callable from SQL with per-row Python
logic and multi-row, multi-column output, composable via LATERAL. The
reference's analog is the Drain template-miner emitting (template,
params) per log line (models/drain.py:60-67) — a function-of-one-row
returning a relation.

Arrow-optimized (``useArrow=True``) so batches cross the boundary in
columnar form; still per-row ``eval`` calls in Python, which is why the
docstrings point each UDTF at its vectorized equivalent for bulk use.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, shingle: string", useArrow=True)
class ShingleUDTF:
    """k-token shingles of one text: LATERAL-composable twin of
    dedup.shingle_rows (which is the JVM bulk path). Emits (pos,
    shingle) with pos 0-based; texts shorter than k emit nothing —
    the same contract as shingle_rows' empty-index-array branch."""

    def eval(self, text: str, k: int = 3):
        if text is None:
            return
        toks = text.strip().split()
        for i in range(len(toks) - k + 1):
            yield i, " ".join(toks[i : i + k])


@udtf(returnType="template: string, n_params: int, params: array<string>", useArrow=True)
class TemplateUDTF:
    """Drain-style one-line template extraction: digit runs become <*>
    and are returned as the parameter list (models/drain.py:60-67's
    (template, params) emission as a table function). Bulk path:
    pipeline.mine_templates' regexp_replace + generalize_templates."""

    def eval(self, line: str):
        if line is None:
            return
        import re

        params = re.findall(r"\d+", line)
        yield re.sub(r"\d+", "<*>", line), len(params), params


def register_udtfs(spark) -> None:
    """Make the table functions callable from SQL:

        SELECT d.doc_id, s.shingle
        FROM docs d, LATERAL shingles(d.text, 3) s
    """
    spark.udtf.register("shingles", ShingleUDTF)
    spark.udtf.register("line_template", TemplateUDTF)
