"""Shared fixtures: one Spark session + one DuckDB connection per test run.

SF ladder (SURVEY §5.6): tests default to sf0.001 for speed; the driver's
own gate re-runs the same comparisons at sf0.01. Override with
``UP_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/``.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("UP_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from userportrait.session import get_spark

    return get_spark("userportrait-tests")


@pytest.fixture(scope="session")
def duck():
    from userportrait.testing.check import duckdb_connection

    return duckdb_connection(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
