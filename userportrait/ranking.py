"""Distributed exact ranking primitives.

``exact_ntile_scores`` computes exact global ``ntile(k)`` buckets for one or
more orderings of the same DataFrame WITHOUT any single-partition exchange —
the scalable replacement for ``ntile(k) OVER (ORDER BY ...)``, which plans as
``Exchange SinglePartition`` and funnels every row through one task.

Decomposition (all JVM-side, no Python workers):

  1. approxQuantile boundaries split the sort value into ~npart range buckets.
     The boundaries only need to RESPECT the global order (rows in bucket i
     sort before rows in bucket i+1; equal sort values share a bucket) — their
     accuracy affects balance, never correctness.
  2. one counting pass over the bucket columns (collected to the driver:
     ≤ npart^len(orderings) combo rows — a metadata aggregate, not data).
  3. exact global rank = driver-computed prefix-sum offset of the bucket
     + row_number() within the bucket (hash-partitioned by bucket id, fully
     parallel; the in-bucket ordering carries the unique tie-break).
  4. ntile(k) is then pure integral arithmetic on (rank, total): the first
     (total % k) buckets get (total // k + 1) rows. `div`, not float
     division — float quotients truncate the wrong way near 2^53.

Every ordering must end in a unique tie-break column so the total order is
strict; that is what makes the decomposition bitwise-equal to the
single-partition window (the ops' DuckDB oracles keep the plain
``ntile() OVER`` form, so the equivalence is re-proven on every run).

Skew note: a single sort value dominating the distribution degenerates to one
hot bucket (ntile over a near-constant column is inherently serial in the tie
region); the unique tie-break bounds the damage to one bucket's row_number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exact_ntile_scores(
    df: DataFrame,
    orderings: list[tuple[Column, str, str]],
    k: int = 5,
    npart: int = 32,
) -> DataFrame:
    """Append one exact global ntile(k) score column per ordering.

    ``orderings``: (sort_value, tie_col, out_name) triples. ``sort_value`` is
    a Column in ASCENDING orientation (negate for DESC); ``tie_col`` a unique
    column name; ``out_name`` the int score column (1..k) to append.
    """
    work = df
    for sort_value, _tie, out in orderings:
        work = work.withColumn(f"_s_{out}", sort_value.cast("double"))
    s_cols = [f"_s_{out}" for _, _, out in orderings]

    # Persist spans only the two driver actions below (boundary sampling and
    # the combo count); the returned lazy plan recomputes deterministically.
    cached = work.persist()
    work = cached
    try:
        probs = [i / npart for i in range(1, npart)]
        all_bounds = work.approxQuantile(s_cols, probs, 1.0 / (4 * npart))
        for (_, _, out), s_col, bounds in zip(orderings, s_cols, all_bounds):
            uniq = sorted(set(bounds))
            bkt = F.lit(0)
            for b in uniq:
                bkt = bkt + (F.col(s_col) > F.lit(float(b))).cast("int")
            work = work.withColumn(f"_b_{out}", bkt)

        b_cols = [f"_b_{out}" for _, _, out in orderings]
        combos = work.groupBy(*b_cols).count().collect()
        total = sum(r["count"] for r in combos)

        for _, tie, out in orderings:
            marg: dict[int, int] = {}
            for r in combos:
                marg[r[f"_b_{out}"]] = marg.get(r[f"_b_{out}"], 0) + r["count"]
            offset = 0
            off_expr = F.lit(None).cast("bigint")
            for b in sorted(marg):
                off_expr = F.when(F.col(f"_b_{out}") == b, F.lit(offset)).otherwise(off_expr)
                offset += marg[b]

            w = Window.partitionBy(f"_b_{out}").orderBy(
                F.col(f"_s_{out}").asc(), F.col(tie).asc()
            )
            work = work.withColumn(
                f"_r_{out}", (off_expr + F.row_number().over(w)).cast("bigint")
            )
            base, rem = divmod(total, k)
            big = (base + 1) * rem  # rows covered by the oversized buckets
            bucket = F.when(
                F.col(f"_r_{out}") <= big,
                F.expr(f"(_r_{out} - 1) div {base + 1}") + 1,
            ).otherwise(
                F.lit(rem) + F.expr(f"(_r_{out} - {big} - 1) div {max(base, 1)}") + 1
            )
            work = work.withColumn(out, bucket.cast("int"))

        helper = [c for out in (o[2] for o in orderings) for c in (f"_s_{out}", f"_b_{out}", f"_r_{out}")]
        return work.drop(*helper)
    finally:
        cached.unpersist(blocking=False)


def global_row_number(
    df: DataFrame, sort_exprs: list[Column], key_col: str, n_parts: int = 32
) -> DataFrame:
    """``df`` + a ``rn`` column = exact global ``row_number() OVER (ORDER BY
    sort_exprs)`` with NO ``Exchange SinglePartition`` — the reusable form
    of win_rank_distributed's decomposition (windows.py), for any frame
    with a unique ``key_col``:

      1. range-repartition + sortWithinPartitions on the full sort key
         (ties split consistently by the unique tie-break inside
         sort_exprs),
      2. pin() the partitioned frame (RangePartitioner samples
         nondeterministically; both consumers must read ONE materialized
         partitioning),
      3. per-partition counts -> prefix-sum offsets over the n_parts-row
         metadata frame (the only SinglePartition-ish step, bounded by
         partition count, never data),
      4. a mapInPandas running counter over (key, pid) ONLY — non-key
         columns never round-trip through Arrow, because pandas folds NaN
         and NULL together for float columns — then offset + local
         position joins back to ``df`` on the unique key.
    """
    from .catalog import pin

    key_type = dict(df.dtypes)[key_col]
    parted = df.repartitionByRange(n_parts, *sort_exprs).sortWithinPartitions(*sort_exprs)
    with_pid = pin(parted.select(key_col).withColumn("pid", F.spark_partition_id()))
    counts = with_pid.groupBy("pid").agg(F.count("*").alias("cnt"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("offset")
    )

    def local_rank(batches):
        pos = 0
        for pdf in batches:
            n = len(pdf)
            pdf = pdf.copy()
            pdf["local_rank"] = range(pos + 1, pos + n + 1)
            pos += n
            yield pdf

    ranked = with_pid.mapInPandas(
        local_rank, f"{key_col} {key_type}, pid int, local_rank bigint"
    )
    rn = ranked.join(F.broadcast(offsets), "pid").select(
        key_col, (F.col("offset") + F.col("local_rank")).cast("bigint").alias("rn")
    )
    return df.join(rn, key_col)
