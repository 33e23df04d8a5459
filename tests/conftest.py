"""Shared test fixtures: one SparkSession per test session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from karna_spark.session import get_spark

    s = get_spark(app_name="karna_spark_tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    from karna_spark.oracle import duckdb_connection

    con = duckdb_connection(SF_ORACLE)
    yield con
    con.close()
