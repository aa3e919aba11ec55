"""Stage a synthetic Nx replica of an sf directory to measure scaling.

Fact tables are unioned N times with primary/foreign keys offset per copy
(key + i * (max_key + 1)) so referential integrity holds within each copy;
dimension tables (region, nation) are copied unchanged -- at 100 TB they
would still be broadcast-sized, so replicating them would distort the
experiment. Document text is left identical across copies on purpose: the
replicas become true near-duplicate groups, which is exactly the workload
the dedup ops face on real crawl data.

Usage:
    python scripts/scale_replica.py [N] [src_sf_dir] [dest_dir]
    # defaults: 10 /root/testdata/sf0.1 /tmp/userportrait_scale10

Then:  SPARK_GRAFT_SF_DIR=/tmp/userportrait_scale10 python bench.py
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from userportrait.catalog import TABLES, read_table  # noqa: E402
from userportrait.session import get_spark  # noqa: E402

# table -> columns that must be offset per copy (PKs and the FKs that
# reference a replicated table; nation/region FKs stay untouched).
OFFSET_KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(df: DataFrame, keys: list[str], n: int) -> DataFrame:
    if not keys or n <= 1:
        return df
    strides = {k: df.agg(F.max(k)).first()[0] + 1 for k in keys}
    copies = []
    for i in range(n):
        c = df
        for k, stride in strides.items():
            c = c.withColumn(k, (F.col(k) + F.lit(i * stride)).cast("bigint"))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dest = sys.argv[3] if len(sys.argv) > 3 else "/tmp/userportrait_scale10"
    spark = get_spark()
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        df = read_table(spark, src, t)
        out = replicate(df, OFFSET_KEYS[t], n)
        # one file per ~replica keeps the source partition count honest:
        # a 10x dataset should not arrive as a single parquet file.
        parts = 1 if not OFFSET_KEYS[t] else n
        path = os.path.join(dest, f"{t}.parquet")
        out.repartition(parts).write.mode("overwrite").parquet(path + ".dir")
        # the harness expects <table>.parquet; a directory with that name
        # reads fine from both Spark and DuckDB.
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        os.rename(path + ".dir", path)
        print(f"staged {t}: {out.count()} rows -> {path}")
    print("done:", dest)


if __name__ == "__main__":
    main()
