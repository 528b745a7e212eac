"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship constraint suite on a spans-shaped table
derived from sf0.001; ``queries()``/``oracle_sql()`` map the operator
inventory from SURVEY.md §2 onto the driver fixture tables with DuckDB
oracle SQL twins (see anomalydetection_spark/plans/driver_queries.py for
the cross-engine determinism rules).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from anomalydetection_spark.plans import driver_queries, driver_queries_dedup
from anomalydetection_spark.plans.flagship import (
    SUITE_VERDICTS_SQL,
    flagship_suite,
    suite_verdicts,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full validation suite
    (stats, uniqueness, referential, drift, span_order) over the derived
    interleaved documents table → per-partition verdict rows."""
    return flagship_suite(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(driver_queries.QUERIES)
    q.update(driver_queries_dedup.QUERIES)
    # deterministic columns of the flagship suite — full DuckDB oracle twin
    q["suite_verdicts"] = suite_verdicts
    return q


def oracle_sql() -> dict[str, str]:
    sql = dict(driver_queries.ORACLE_SQL)
    sql.update(driver_queries_dedup.ORACLE_SQL)
    sql["suite_verdicts"] = SUITE_VERDICTS_SQL
    return sql
