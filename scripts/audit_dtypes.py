"""Audit driver-visible dtype divergence between Spark toPandas() and DuckDB .df().

The driver hashes pandas frames from both engines; columns whose pandas dtypes
diverge (Decimal objects vs float64, datetime.date objects vs datetime64[us],
list columns) hash-mismatch or crash even when values are equal. This script
runs every registered op at a small SF on both engines and reports per-column
pandas dtype classes so we can normalize output schemas.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SF_DIR", "/root/testdata/sf0.001")

from decimal import Decimal
from datetime import date, datetime

import numpy as np
import pandas as pd

from userportrait.registry import OPS, load_all_ops
from userportrait.session import get_spark
from userportrait.testing.check import duckdb_connection

SF = os.environ["SF_DIR"]


def cls_of(series: pd.Series) -> str:
    dt = series.dtype
    if dt == object:
        for v in series:
            if v is None:
                continue
            if isinstance(v, Decimal):
                return "DECIMAL_OBJ"
            if isinstance(v, (list, tuple, np.ndarray)):
                return "LIST"
            if isinstance(v, dict):
                return "MAP"
            if isinstance(v, datetime):
                return "DT_OBJ"
            if isinstance(v, date):
                return "DATE_OBJ"
            if isinstance(v, bytes):
                return "BYTES"
            return type(v).__name__
        return "all-null-obj"
    k = dt.kind  # i u f M m b O
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return f"dt64[{dt}]"
    if k == "b":
        return "bool"
    return str(dt)


def main(names):
    load_all_ops()
    spark = get_spark("dtype-audit")
    con = duckdb_connection(SF)
    names = names or list(OPS)
    for name in names:
        o = OPS[name]
        try:
            sdf = o.fn(spark, SF).limit(200).toPandas()
        except Exception as ex:
            print(f"{name}: SPARK_ERR {type(ex).__name__}: {str(ex)[:120]}")
            continue
        flags = []
        if o.oracle is not None:
            try:
                ddf = con.execute(f"SELECT * FROM ({o.oracle}) LIMIT 200").df()
            except Exception as ex:
                print(f"{name}: ORACLE_ERR {str(ex)[:120]}")
                continue
            for c in sdf.columns:
                sc = cls_of(sdf[c])
                dc = cls_of(ddf[c]) if c in ddf.columns else "MISSING"
                # datetime64 resolutions (ns vs us) proved hash-compatible in
                # r03 (scan_events_ns green) -> treat all dt64 as one class.
                norm = lambda x: "dt64" if x.startswith("dt64") else x
                if norm(sc) != norm(dc) or sc in ("DECIMAL_OBJ", "LIST", "MAP") or dc in ("DECIMAL_OBJ", "LIST", "MAP"):
                    flags.append(f"{c}: spark={sc} duck={dc}")
        else:
            for c in sdf.columns:
                sc = cls_of(sdf[c])
                if sc in ("DECIMAL_OBJ", "LIST", "MAP", "DATE_OBJ"):
                    flags.append(f"{c}: spark={sc} (rows-only)")
        if flags:
            print(f"{name}: " + "; ".join(flags))
    print("AUDIT DONE")


if __name__ == "__main__":
    main(sys.argv[1:])
