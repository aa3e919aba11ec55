"""Local DuckDB differential harness (SURVEY §5.1).

Replicates the driver's correctness gate ahead of time: for every registered
op with an oracle, run the Spark query and the DuckDB oracle on the same
parquet tables and compare row-count + column names + an order-insensitive
canonical value multiset. Stricter than any reasonable driver hash: floats
compare bitwise (our determinism conventions make them bitwise-equal across
engines), decimals by exact value, timestamps by instant.

CLI:
    python -m userportrait.testing.check            # all oracle-backed ops
    python -m userportrait.testing.check filter_simple join_semi
    SF_DIR=/root/testdata/sf0.01 python -m userportrait.testing.check
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback
from datetime import date, datetime
from decimal import Decimal

import duckdb

from ..catalog import TABLES, release_pins
from ..registry import OPS, load_all_ops
from ..session import get_spark

DEFAULT_SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the ten driver views pre-registered,
    mirroring the driver's harness (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver testdata ships single files; Spark-written staging (e.g.
        # scripts/scale_replica.py) produces directories of part files
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == 0.0:
            return "f:0.0"
        return f"f:{v!r}"
    if isinstance(v, Decimal):
        return "d:" + format(v.normalize(), "f")
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return "D:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={_canon_cell(v[k])}" for k in sorted(v)) + "}"
    return "s:" + str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def compare_op(spark, con, name: str, sf_dir: str) -> dict:
    o = OPS[name]
    out = {"name": name, "status": "PASS", "detail": ""}
    t0 = time.time()
    try:
        sdf = o.fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception:
        out.update(status="SPARK_ERROR", detail=traceback.format_exc(limit=8))
        return out
    if o.oracle is None:
        out.update(status="ROWS_ONLY", detail=f"{len(srows)} rows")
        return out
    try:
        cur = con.execute(o.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
    except Exception:
        out.update(status="ORACLE_ERROR", detail=traceback.format_exc(limit=4))
        return out
    if sorted(scols) != sorted(dcols):
        out.update(status="SCHEMA_MISMATCH", detail=f"spark={sorted(scols)} duckdb={sorted(dcols)}")
        return out
    # Driver-replica dtype guard: the driver hashes pandas frames, where
    # Decimal objects vs float64 (DuckDB .df() downcasts DECIMAL), list/map
    # cells (unsortable), and datetime.date objects vs datetime64 diverge
    # even when the values are equal (r03: 17 hash-misses, 1 crash). Outputs
    # must stick to str/int/float/bool/timestamp columns.
    bad_types = []
    for f in sdf.schema.fields:
        t = f.dataType.typeName()
        if t in ("decimal", "array", "map", "struct", "date"):
            bad_types.append(f"{f.name}:{t}")
    if bad_types:
        out.update(status="DRIVER_DTYPE", detail=", ".join(bad_types))
        return out
    if len(srows) != len(drows):
        out.update(status="ROWCOUNT_MISMATCH", detail=f"spark={len(srows)} duckdb={len(drows)}")
        return out
    sc, dc = _canon_rows(scols, srows), _canon_rows(dcols, drows)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        out.update(
            status="VALUE_MISMATCH",
            detail="\n".join(f"  spark : {a}\n  duckdb: {b}" for a, b in diffs),
        )
        return out
    out["detail"] = f"{len(srows)} rows, {time.time() - t0:.2f}s"
    return out


def main(argv: list[str]) -> int:
    load_all_ops()
    names = [a for a in argv if not a.startswith("-")] or list(OPS)
    sf_dir = DEFAULT_SF_DIR
    spark = get_spark("userportrait-check")
    con = duckdb_connection(sf_dir)
    failed = 0
    for name in names:
        if name not in OPS:
            print(f"?? unknown op: {name}")
            failed += 1
            continue
        r = compare_op(spark, con, name, sf_dir)
        release_pins()  # free per-op checkpoint blocks (long-session cap)
        ok = r["status"] in ("PASS", "ROWS_ONLY")
        failed += 0 if ok else 1
        mark = "ok" if ok else "FAIL"
        print(f"[{mark}] {name}: {r['status']} {r['detail'][:2000]}")
    print(f"\n{len(names) - failed}/{len(names)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
