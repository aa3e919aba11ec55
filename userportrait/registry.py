"""Operator registry — the SURVEY.md §2 contract, made executable.

Every op id from SURVEY §2 registers here via the ``@op`` decorator:

    @op("filter_simple", oracle="SELECT ... FROM orders WHERE ...")
    def filter_simple(spark, sf_dir) -> DataFrame: ...

``__spark_entry__.py`` exposes the registry as ``queries()`` / ``oracle_sql()``
for the driver. Ops whose semantics are not SQL-expressible (seeded ML,
approx sketches) register with ``oracle=None`` -> driver records the weaker
rows-only check (SURVEY §2.0 rule 5).

Cross-engine determinism conventions (SURVEY §2.0), applied mechanically:
  1. float sums -> CAST(x AS DECIMAL(38,4)) pre-aggregation on BOTH engines
     (order-independent, exact); derived ratios computed from those exact
     decimals cast to double (bitwise-identical across engines, no rounding
     games needed).
  2. every row_number()/rank() ORDER BY ends in a unique key.
  3. events.ts us-truncation convention (catalog.py).
  4. collected lists always sort_array()/list_sort().
  5. integer sums CAST AS BIGINT in DuckDB (its sum(int) is HUGEINT);
     year()/datediff()/ntile() etc. cast to matching widths on both sides.
  6. every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check


OPS: dict[str, Op] = {}


def op(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in OPS:
            raise ValueError(f"duplicate op id: {name}")
        OPS[name] = Op(name, fn, oracle)
        return fn

    return deco


_LOADED = False


def load_all_ops() -> dict[str, Op]:
    """Import every ops module exactly once, populating OPS."""
    global _LOADED
    if not _LOADED:
        from .ops import ALL_MODULES  # noqa: F401  (import side effect registers ops)

        _LOADED = True
    return OPS
