"""Shared fixtures: one Spark session + one DuckDB connection per test run.

SF ladder (SURVEY §5.6): tests default to sf0.001 for speed; the driver's
own gate re-runs the same comparisons at sf0.01. Override with
``UP_TEST_SF_DIR=/root/testdata/sf0.01 pytest tests/``.

Two tiers (r15, VERDICT r14 "Next round" #1 — the full suite outgrew the
driver's verify window and timed out at ~96% with zero failures):

* default (``pytest tests/``): the smoke/invariant tier — every kernel
  bit-identity pin, the plan audits over the non-side-effecting registry,
  and the value-level differential for the driver's own 50-op grading
  window. Target <10 min, what the driver's verify runs.
* full (``UP_SLOW_TESTS=1 pytest tests/``): additionally the
  ``@pytest.mark.slow`` tier — the whole-registry differential, the
  streaming state/restart ladders, the ANN lifecycle invariants, and the
  full-registry plan audits. The complete assertion set is unchanged;
  nothing was deleted, only tiered. The builder runs this before every
  round close.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("UP_TEST_SF_DIR", "/root/testdata/sf0.001")
SLOW_TIER = os.environ.get("UP_SLOW_TESTS") == "1"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-depth tier; skipped unless UP_SLOW_TESTS=1"
    )


def pytest_collection_modifyitems(config, items):
    if SLOW_TIER:
        return
    skip = pytest.mark.skip(reason="slow tier: set UP_SLOW_TESTS=1 for the full assertion set")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
