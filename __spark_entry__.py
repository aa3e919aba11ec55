"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``userportrait`` package (SURVEY.md §3.2/§7);
this module only adapts the op registry to the driver's contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from userportrait.registry import load_all_ops  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star join (customer ⋈ orders ⋈ nation ⋈ region) + RFM-lite per-customer
    profile — the reference's core product shape (SURVEY §7-M1) expressed as
    one declarative plan: broadcastable dims, single shuffle on o_custkey.
    """
    from userportrait.flagship import flagship_profile

    return flagship_profile(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: o.fn for name, o in load_all_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every EXACT op; ROWS-only ops are omitted."""
    return {name: o.oracle for name, o in load_all_ops().items() if o.oracle is not None}
