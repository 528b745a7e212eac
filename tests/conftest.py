"""Shared SparkSession fixture (local, small parallelism for fast tests)."""

from __future__ import annotations

import pytest

from anomalydetection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="anomalydetection-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield spark
