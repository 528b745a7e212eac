"""Midpoint-hazard audit for the registry's hash boundary.

The round-3 driver-red cell (`moments_n_chars_by_lang`) was a double
whose exact decimal expansion sat ON a 1e-6 rounding midpoint: Spark's
round(double, 6) (BigDecimal HALF_UP on the exact binary value) and
DuckDB's float round can then disagree ACROSS ENGINE VERSIONS even
though both pass together today. The driver's data is deterministic, so
the exposure is enumerable: run every registry query at sf0.01 and flag
every float output whose fractional part at 1e-6 scale is within
--tol of 0.5 (and, for context, of 0.0 — trailing-digit truncation
boundaries). Queries with no flagged value carry zero midpoint risk for
the driver gate regardless of engine version skew.

Usage: python tools/midpoint_audit.py [--sf-dir /root/testdata/sf0.01]
       [--tol 1e-4] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


SCALES = (100, 1_000, 10_000, 1_000_000)  # every round(·, n) the registry uses


def frac_at_1e6(x: float) -> float:
    """Worst-case distance of x·10^k's exact decimal expansion from the
    nearest integer+0.5 midpoint across the registry's rounding scales,
    computed exactly via Fraction. (Name kept for the audit-note grep.)"""
    from fractions import Fraction

    worst = 0.5
    for scale in SCALES:
        f = Fraction(x) * scale
        frac = f - (f.numerator // f.denominator)
        worst = min(worst, abs(float(frac) - 0.5))
    return worst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # Intercept F.round with identity BEFORE the query modules bind it:
    # outputs are then the PRE-round doubles — the values whose proximity
    # to a 1e-6 midpoint is the actual hazard (post-round outputs always
    # sit ON grid points and would hide it). det_round6 sites are floor-
    # based and unaffected — already-hardened queries audit clean. SQL-text
    # round() inside spark.sql strings is not intercepted (audited by grep).
    from pyspark.sql import functions as F

    F.round = lambda col, scale=0: F.col(col) if isinstance(col, str) else col  # type: ignore[assignment]

    import __spark_entry__ as entrymod
    from anomalydetection_spark.session import get_spark

    spark = get_spark(app_name="midpoint-audit", master="local[8]")
    queries = entrymod.queries()
    names = args.names or list(queries)
    flagged: dict[str, list] = {}
    for name in names:
        try:
            rows = queries[name](spark, args.sf_dir).collect()
        except Exception as e:  # pragma: no cover
            print(f"  {name:32s} ERROR {e}")
            continue
        hits = []
        for r in rows:
            d = r.asDict()
            for col, v in d.items():
                if isinstance(v, float) and math.isfinite(v) and v == v:
                    gap = frac_at_1e6(v)
                    if gap < args.tol:
                        hits.append((col, v, gap))
        if hits:
            flagged[name] = hits
            worst = min(hits, key=lambda h: h[2])
            print(
                f"  {name:32s} {len(hits):3d} near-midpoint values; worst "
                f"{worst[0]}={worst[1]!r} (gap {worst[2]:.2e})"
            )
        else:
            print(f"  {name:32s} clean")
    print(f"\n{len(flagged)} of {len(names)} queries carry near-midpoint values")
    for name, hits in sorted(flagged.items(), key=lambda kv: min(h[2] for h in kv[1])):
        worst = min(hits, key=lambda h: h[2])
        print(f"  {name}: {worst[0]}={worst[1]!r} gap={worst[2]:.2e} ({len(hits)} values)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
