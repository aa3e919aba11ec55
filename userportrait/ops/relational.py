"""§2.B — projections, filters, predicates.

Reference analog [R, SURVEY §0.1]: each tag model's rule string carries a
``selectFieldNames`` column list (projection) and the match-tag family is a
predicate surface over user attributes. Here they are plain Catalyst
expressions so pushdown/pruning reach the parquet scan (asserted in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..registry import op


@op(
    "proj_select_rename",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS lineno,
           CAST(CAST(l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) AS net
    FROM lineitem
    """,
)
def proj_select_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename + computed net price (decimal-exact)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("lineno"),
        (F.col("l_extendedprice").cast("decimal(38,4)") * (F.lit(1) - F.col("l_discount").cast("decimal(38,4)")))
        .cast("double")
        .alias("net"),
    )


@op(
    "filter_simple",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000",
)
def filter_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single comparison predicate; pushed to the parquet scan."""
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@op(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE (o_orderstatus IN ('F','O') AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31')
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND NOT (o_totalprice < 1000)
    """,
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT + IN + BETWEEN(dates) + LIKE — the match-tag predicate shapes [R]."""
    o = read_table(spark, sf_dir, "orders")
    pred = (
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_orderdate").between("1996-01-01", "1998-12-31")
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & ~(F.col("o_totalprice") < 1000)
    )
    return o.filter(pred).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@op(
    "filter_null_semantics",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id, v IS NULL AS v_is_null,
           coalesce(v, -1.0) AS v_filled,
           v IS NOT DISTINCT FROM 0.0 AS v_nullsafe_zero
    FROM e
    WHERE v IS NULL OR v > 400
    """,
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isNull / coalesce / null-safe equality (<=> vs IS NOT DISTINCT FROM)."""
    e = read_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(F.col("value"))
    return (
        e.select("event_id", "user_id", v.alias("v"))
        .filter(F.col("v").isNull() | (F.col("v") > 400))
        .select(
            "event_id",
            "user_id",
            F.col("v").isNull().alias("v_is_null"),
            F.coalesce(F.col("v"), F.lit(-1.0)).alias("v_filled"),
            F.col("v").eqNullSafe(F.lit(0.0)).alias("v_nullsafe_zero"),
        )
    )
