"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and the matching
``oracle_sql()`` on DuckDB over the same parquet, then compares:
row count, sorted column names, and an order-insensitive value hash
(rows sorted, floats canonicalized to 9 significant decimals).

Usage: python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        return canon(float(v))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from anomalydetection_spark.session import get_spark

    spark = get_spark(app_name="check-correctness", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(queries)

    n_pass = n_fail = n_nosql = 0
    for name in names:
        fn = queries[name]
        t0 = time.time()
        sdf = fn(spark, args.sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:<32} NOSQL rows={len(srows)} ({t_spark:.1f}s) [rows-only check]")
            n_nosql += 1
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        sh, sn = table_hash(scols, srows)
        dh, dn = table_hash(dcols, drows)
        ok_schema = sorted(scols) == sorted(dcols)
        ok = ok_schema and sn == dn and sh == dh
        status = "PASS" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        print(
            f"  {name:<32} {status} rows={sn}/{dn} hash={sh}/{dh}"
            f" schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'}"
            f" ({t_spark:.1f}s/{t_duck:.1f}s)"
        )
        if not ok and args.show_diff:
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(canon(r[i]) for i in order_d) for r in drows)
            only_s = [x for x in ls if x not in set(ld)][:5]
            only_d = [x for x in ld if x not in set(ls)][:5]
            print(f"    cols(sorted): {sorted(scols)}")
            for x in only_s:
                print(f"    spark-only: {x}")
            for x in only_d:
                print(f"    duck-only : {x}")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_nosql} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
