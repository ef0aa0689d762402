"""Shared SparkSession fixture (what reference src/tests/conftest.py:4-8
only scaffolds — it builds a session but ships no tests)."""

from __future__ import annotations

import pytest

from scalable_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="scalable-etl-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()
