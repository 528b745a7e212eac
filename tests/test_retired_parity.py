"""Oracle parity for retired driver-registry entries (plans/retired.py).

Round-3 verdict ask #9: 15 redundant registry entries moved out of the
driver's bounded correctness window into this pytest gate. Each retired
query still runs end-to-end against its full DuckDB oracle at sf0.001 on
every pytest pass, using the SAME compare the driver uses (row count,
sorted column names, order-insensitive value hash with floats
canonicalized to 9 significant digits — tools/check_correctness.py).

Also pins the retirement contract itself: every retired name must stay
OUT of the live registry, and its designated registry twin must stay IN
(so no family loses driver-checkable coverage).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from anomalydetection_spark.plans.retired import RETIRED
from tools.check_correctness import TABLES, table_hash

SF_DIR = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not Path(SF_DIR).exists(), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def duck():
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_retirement_contract():
    import __spark_entry__ as entrymod

    live = set(entrymod._PRIORITY) | set(entrymod._TAIL)
    for name, (_fn, _sql, twin) in RETIRED.items():
        assert name not in live, f"retired entry {name} still registered"
        assert twin in live, f"{name}'s registry twin {twin} missing"


@needs_testdata
@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_oracle_parity(spark, duck, name):
    fn, sql, _twin = RETIRED[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    sh, sn = table_hash(scols, srows)
    dh, dn = table_hash(dcols, drows)
    assert sn == dn, f"{name}: rows {sn} vs {dn}"
    assert sh == dh, f"{name}: value hash mismatch"
