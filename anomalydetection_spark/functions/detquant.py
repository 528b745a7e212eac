"""Cross-engine deterministic quantization for hash-boundary doubles.

The round-3 driver-red cell (`moments_n_chars_by_lang`) came from the
one step in an otherwise bit-identical float pipeline that engines
implement differently: rounding a double at 1e-6. Spark's
``round(double, 6)`` converts through BigDecimal and applies HALF_UP on
the EXACT binary value; DuckDB's ``round`` is itself a float
computation — near a 1e-6 midpoint the two emit different outputs for
the same input bits.

``det_round6`` replaces that engine-defined step with ops every engine
specifies exactly: one IEEE multiply, one IEEE add, ``floor`` (exact on
doubles), an int cast, and one IEEE divide —
``floor(x·10⁶ + 0.5) / 10⁶``. Given bit-identical input doubles, the
output is bit-identical by construction on any IEEE-754 engine. The
convention differs from HALF_UP only at exact midpoints (ties go toward
+∞ instead of away from zero) — irrelevant for a determinism boundary,
where the only requirement is that both sides pick the SAME side.

Input doubles are bit-identical whenever they are built from exactly
converted operands (int64 ≤ 2⁵³, or decimals via the moments.py limb
reconstruction) combined with +, −, ×, ÷, sqrt in the same order —
those ops are IEEE correctly rounded everywhere. Transcendentals
(ln/log10/exp/pow) are NOT correctly rounded by libm and can differ by
an ulp across engines; hash boundaries must fix-point them at coarse
granularity (infotheory._ln_fp) or inline driver-computed literals
(drift.benford's expected shares).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def det_round6(x: Column) -> Column:
    """floor(x·10⁶ + 0.5) / 10⁶ as a double — see module docstring.
    Mirror with :data:`DET_ROUND6_SQL` in DuckDB twins."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(
        1000000.0
    )


def det_round6_sql(expr: str) -> str:
    """The DuckDB spelling of :func:`det_round6` around ``expr``."""
    return f"(CAST(floor(({expr}) * 1000000.0 + 0.5) AS BIGINT) / 1000000.0)"
