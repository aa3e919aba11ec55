"""Differential oracle vs DuckDB for every registered op (SURVEY §5.1).

One pytest per op id: the same row-count + schema + order-insensitive
canonical value comparison the driver applies at sf0.01, run locally at
sf0.001 so regressions surface before the driver does.
"""

from __future__ import annotations

import pytest

from userportrait.registry import load_all_ops
from userportrait.testing.check import compare_op

from .conftest import SF_DIR

ALL_OPS = sorted(load_all_ops())


@pytest.mark.parametrize("name", ALL_OPS)
def test_op_matches_oracle(spark, duck, name):
    r = compare_op(spark, duck, name, SF_DIR)
    assert r["status"] in ("PASS", "ROWS_ONLY"), f"{name}: {r['status']}\n{r['detail']}"
    if r["status"] == "ROWS_ONLY":
        # ROWS-only ops (seeded ML) must still produce rows.
        assert r["detail"].split()[0] != "0", f"{name} returned 0 rows"
