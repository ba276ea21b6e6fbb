"""Shared fixtures: one SparkSession + DuckDB oracle connection."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("FLINK_SPARK_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_spark.session import get_spark

    s = get_spark(app_name="flink_spark-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from flink_spark.testing import duck_connect

    con = duck_connect(SF_DIR)
    yield con
    con.close()
