"""§2.D — aggregations.

Reference analog [R, SURVEY §0.1]: the "statistical tag" family — grouped
sums/avgs/counts of order amounts, login/activity counts, top-by-count
preferences. All expressed as hash aggregates with map-side partial
aggregation (Catalyst default), decimal-cast per SURVEY §2.0 rule 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register_views
from ..registry import op


@op(
    "agg_groupby_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l_discount AS DECIMAL(38,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS VARCHAR) AS DOUBLE) AS avg_qty,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the statistical-tag workhorse.

    avg is derived from the exact decimal sum cast to double (bitwise-equal
    across engines) rather than a float avg (order-dependent).
    """
    li = load(spark, sf_dir).lineitem.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
    dec = lambda c: F.col(c).cast("decimal(38,4)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("double").alias("sum_disc_price"),
        (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).cast("double").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@op(
    "agg_count_distinct",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (activity tags [R])."""
    return (
        load(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events"))
    )


@op(
    "agg_multi_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)) AS BIGINT) AS n_days
    FROM events GROUP BY event_type
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one pass (Expand-based plan)."""
    e = load(spark, sf_dir).events
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", "ts").cast("date")).alias("n_days"),
    )


@op("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type — sketch differs across engines so
    the oracle is ROWS-only (SURVEY §2.0 rule 5); tests assert ±5% vs exact."""
    e = load(spark, sf_dir).events
    return e.groupBy("event_type").agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))


@op(
    "agg_filter_clause",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
           CAST(CAST(sum(CAST(value AS DECIMAL(38,4))) FILTER (WHERE event_type = 'purchase') AS VARCHAR) AS DOUBLE) AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count-when)."""
    e = load(spark, sf_dir).events
    return e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(38,4)")))
        .cast("double")
        .alias("purchase_value"),
    )


@op(
    "agg_having",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) > 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation predicate (HAVING)."""
    o = load(spark, sf_dir).orders
    return o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders")).filter(F.col("n_orders") > 15)


@op(
    "agg_grouping_sets",
    oracle="""
    SELECT c_mktsegment, n_name, CAST(grouping_id(c_mktsegment, n_name) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping_id disambiguation (cube analytics, EXT)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, n_name, CAST(grouping_id(c_mktsegment, n_name) AS BIGINT) AS gid,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
        """
    )


@op(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name, CAST(grouping_id(r_name, n_name) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical margins: region → nation → grand total."""
    t = load(spark, sf_dir)
    joined = t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey")).join(
        F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    return joined.rollup("r_name", "n_name").agg(
        F.grouping_id("r_name", "n_name").cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
    ).select("r_name", "n_name", "gid", "n_customers")


@op(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (returnflag, linestatus)."""
    li = load(spark, sf_dir).lineitem
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id("l_returnflag", "l_linestatus").cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(38,4)")).cast("double").alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_lines", "sum_qty")


@op(
    "agg_collect_sorted",
    oracle="""
    SELECT o_custkey, array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities
    FROM orders GROUP BY o_custkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collected list, deterministic via sort_array (SURVEY §2.0 rule 4) —
    the reference's profile-assembly accumulation [R].

    Emitted pipe-joined: the driver's pandas canonicalizer cannot sort/hash
    list cells (r03 crash), and a joined string is hash-stable on both
    engines while preserving the sorted-collect semantics under test."""
    o = load(spark, sf_dir).orders
    return o.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), "|").alias("priorities")
    )


@op(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a FIXED value list (no value-discovery job — required at
    scale; discovery would be a full extra scan)."""
    e = load(spark, sf_dir).events
    piv = e.groupBy("user_id").pivot("event_type", ["click", "view", "purchase", "signup", "error"]).count()
    # pivot-count yields nulls for absent combos; FILTER-count semantics give 0
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in ["click", "view", "purchase", "signup", "error"]],
    )


@op(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(sqrt((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE))
                      / (CAST(count(*) AS DOUBLE) * (count(*) - 1))), 6) AS sd_qty,
           round((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE))
                 / (CAST(count(*) AS DOUBLE) * (count(*) - 1)), 6) AS var_qty,
           round((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE)
              - CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE))
           / sqrt((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE))
                 * (CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS VARCHAR) AS DOUBLE)
                    - CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) * CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE))), 6)
           AS corr_price_qty,
           median(l_quantity) AS median_qty,
           CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical moments + exact percentiles.

    sd/var/corr are ALL derived from decimal-exact moment sums with an
    identical double-arithmetic expression on both sides — deterministic by
    construction (SURVEY §2.0 rule 1). Engine-native stddev_samp/var_samp
    (single-pass Welford vs two-pass) agreed bitwise at the contract SF but
    drifted 1-2 ulp at the 10× replica (r05 sweep), so the scored path no
    longer uses them anywhere.
    """
    li = load(spark, sf_dir).lineitem
    d18 = lambda c: F.col(c).cast("decimal(19,4)")
    d38 = lambda c: F.col(c).cast("decimal(38,4)")
    n = F.count(F.lit(1)).cast("double")
    sxy = F.sum(d18("l_extendedprice") * d18("l_quantity")).cast("double")
    sx = F.sum(d38("l_extendedprice")).cast("double")
    sy = F.sum(d38("l_quantity")).cast("double")
    sxx = F.sum(d18("l_extendedprice") * d18("l_extendedprice")).cast("double")
    syy = F.sum(d18("l_quantity") * d18("l_quantity")).cast("double")
    corr = F.round((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
    var = F.round((n * syy - sy * sy) / (n * (F.count(F.lit(1)) - 1)), 6)
    sd = F.round(F.sqrt((n * syy - sy * sy) / (n * (F.count(F.lit(1)) - 1))), 6)
    return li.groupBy("l_returnflag").agg(
        sd.alias("sd_qty"),
        var.alias("var_qty"),
        corr.alias("corr_price_qty"),
        F.median("l_quantity").alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
    )


@op(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS p50,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9), 6) AS p90,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 6) AS p99,
           round(quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS p50_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (p50/p90/p99 continuous + p50 discrete).
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` share the
    (n-1)·p linear-interpolation definition (verified: identical on probe
    data); 6dp rounding absorbs interpolation-arithmetic ulps. At 100 TB
    exact percentiles require a full sort per group — the sketch-based
    ``percentile_approx`` is the scale path; this op is the exact oracle
    form (group cardinality is small here)."""
    li = load(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("p99"),
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)"), 6).alias("p50_disc"),
    )


_HIST_BUCKET = (
    "CAST(CASE WHEN o_totalprice < 0 THEN 0"
    " WHEN o_totalprice >= 400000 THEN 21"
    " ELSE floor(o_totalprice / 20000) + 1 END AS INT)"
)


@op(
    "agg_histogram",
    oracle=f"""
    SELECT {_HIST_BUCKET} AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (width_bucket semantics: 20
    buckets over [0, 400k] plus under/overflow buckets 0 and 21) — the
    data-profiling primitive behind skew detection and bucket-edge
    choices. The bucket expression is shared verbatim with the oracle
    (DuckDB 1.0 has no width_bucket) so boundary rounding is identical.
    Map-side bucketing + one tiny groupBy."""
    o = load(spark, sf_dir).orders
    return o.groupBy(F.expr(_HIST_BUCKET).alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@op("agg_approx_percentile", oracle=None)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's percentile_approx sketch
    (Greenwald-Khanna, accuracy 10000) — the constant-memory quantile path
    for 100 TB columns where exact percentile's full sort is off the table.
    Sketch internals differ across engines -> ROWS-only oracle (SURVEY
    §2.0 rule 5); tests/test_invariants.py asserts each estimate lands
    within 1% of DuckDB's exact quantile."""
    li = load(spark, sf_dir).lineitem
    pct = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99], 10000)
    return li.groupBy("l_returnflag").agg(
        F.element_at(pct, 1).alias("p50"),
        F.element_at(pct, 2).alias("p95"),
        F.element_at(pct, 3).alias("p99"),
        F.count("*").cast("bigint").alias("n"),
    )


@op(
    "agg_mode",
    oracle="""
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n FROM (
      SELECT c.c_mktsegment, o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY count(*) DESC, o.o_orderpriority ASC) AS rn
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_orderpriority
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent order priority per market segment) —
    the categorical "statistical tag" the reference's preference tags rest
    on. Built as count + row_number with an explicit tie-break rather than
    Spark's ``mode()`` (whose tie choice is nondeterministic — useless for
    reproducible tags). Two map-side-combinable shuffles on small keys."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    counted = (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("n").desc(), F.col("o_orderpriority").asc())
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_mktsegment", F.col("o_orderpriority").alias("mode_priority"), "n")
    )


# KMV (bottom-k / k-minimum-values) sketch: the mergeable distinct-count
# sketch that, unlike HLL, also supports SET OPERATIONS (union exactly,
# intersection via the Jaccard of the merged bottom-k) — Beyer et al.,
# "On Synopses for Distinct-Value Estimation Under Multiset Operations"
# (SIGMOD'07). Deterministic by construction (md5 order), so unlike the
# HLL ops this sketch is EXACT-oracle-able: DuckDB reproduces the same
# bottom-k and the same integer estimator bit for bit.
KMV_K = 256
_KMV_SCALE = 16**12  # 12 hex nibbles of md5 -> value in [0, 2^48)


def _kmv_val_sql(h: str) -> str:
    """The 12-nibble md5-prefix fold as IDENTICAL SQL text for both
    engines (the hilbert_step_exprs convention): value in [0, 2^48)."""
    from .curation import HEX

    # CAST ... AS BIGINT before the multiply: the small power-of-16
    # literals fit in INT, and INT x INT overflows under ANSI (Spark) and
    # int32 (DuckDB) for high nibbles
    terms = [
        f"(CAST(instr('{HEX}', substr({h}, {i + 1}, 1)) AS BIGINT) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    ]
    return "(" + " + ".join(terms) + ")"


@op(
    "agg_kmv_set_cardinality",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), hv AS (
      SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h,
             CAST({_kmv_val_sql("md5(CAST(user_id AS VARCHAR))")} AS BIGINT) AS val
      FROM du
    ), sk AS (
      SELECT event_type, h, val FROM (
        SELECT event_type, h, val,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM hv
      ) WHERE rn <= {KMV_K}
    ), st AS (
      SELECT event_type, count(*) AS cnt, max(val) AS vk FROM sk GROUP BY event_type
    ), pairs AS (
      SELECT * FROM (VALUES ('click', 'purchase'), ('view', 'click'), ('view', 'purchase'))
             AS t(ta, tb)
    ), uh AS (
      SELECT p.ta, p.tb, s.h, s.val,
             max(CASE WHEN s.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s ON s.event_type IN (p.ta, p.tb)
      GROUP BY p.ta, p.tb, s.h, s.val
    ), uk AS (
      SELECT ta, tb, val, in_a, in_b FROM (
        SELECT ta, tb, val, in_a, in_b,
               row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
        FROM uh
      ) WHERE rn <= {KMV_K}
    ), us AS (
      SELECT ta, tb, count(*) AS cnt_u, max(val) AS vk_u,
             sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_both
      FROM uk GROUP BY ta, tb
    )
    SELECT u.ta AS type_a, u.tb AS type_b,
           CAST(CASE WHEN a.cnt < {KMV_K} THEN a.cnt
                     ELSE ({KMV_K} - 1) * {_KMV_SCALE} // a.vk END AS BIGINT) AS est_a,
           CAST(CASE WHEN b.cnt < {KMV_K} THEN b.cnt
                     ELSE ({KMV_K} - 1) * {_KMV_SCALE} // b.vk END AS BIGINT) AS est_b,
           CAST(CASE WHEN u.cnt_u < {KMV_K} THEN u.cnt_u
                     ELSE ({KMV_K} - 1) * {_KMV_SCALE} // u.vk_u END AS BIGINT) AS est_union,
           CAST(CASE WHEN u.cnt_u < {KMV_K} THEN u.n_both
                     ELSE (u.n_both * (({KMV_K} - 1) * {_KMV_SCALE} // u.vk_u)) // {KMV_K} END AS BIGINT) AS est_intersect
    FROM us u JOIN st a ON a.event_type = u.ta JOIN st b ON b.event_type = u.tb
    """,
)
def agg_kmv_set_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-cardinality SET ALGEBRA via KMV (bottom-k) sketches — the
    audience-overlap question ("how many users both clicked AND
    purchased?") that HLL cannot answer (HLL unions but never
    intersects; the §2.D approx family previously stopped at
    agg_approx_distinct / agg_hll_*). Per event type, the sketch is the
    K smallest md5(user_id) values over distinct users; union sketches
    merge as bottom-k of the union (associative — the mergeability that
    makes this a one-pass distributed sketch); |A∩B| is estimated as
    (matching fraction of the merged bottom-k) × est(|A∪B|), and every
    estimate degrades to the EXACT count when the sketch holds the whole
    set (cnt < K). All estimator arithmetic is integer (md5-prefix
    values in [0, 2^48), integer division), so the op is deterministic
    and EXACT-oracled — DuckDB reproduces sketch and estimate bit for
    bit, the same md5 discipline as doc_train_split.

    Spark shape: ONE shuffle of the distinct (type, user) pairs into a
    two-phase bottom-k (per-(type, 32-salt) window keeps K, then the
    per-type window ranks ≤ 32·K survivors — the per-partition-then-merge
    pattern that makes bottom-k scale; a naive single window would drag
    EVERY distinct user of a type through one task at 100 TB). Everything
    after the second window runs on ≤ K-row frames. Estimator accuracy is
    gated by tests/test_invariants.py::test_kmv_estimates_within_bounds
    (relative error vs exact counts)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir).events
    du = (
        e.where(F.col("event_type").isin("view", "click", "purchase"))
        .select("event_type", "user_id")
        .distinct()
    )
    h = F.md5(F.col("user_id").cast("string"))
    hv = du.select(
        "event_type",
        h.alias("h"),
        F.expr(_kmv_val_sql("md5(CAST(user_id AS STRING))")).cast("bigint").alias("val"),
    )
    # two-phase bottom-k: salt -> per-salt top K -> global per-type top K
    salted = hv.withColumn("salt", F.pmod(F.xxhash64("h"), F.lit(32)))
    w1 = Window.partitionBy("event_type", "salt").orderBy("h")
    w2 = Window.partitionBy("event_type").orderBy("h")
    sk = (
        salted.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= KMV_K)
        .withColumn("rn2", F.row_number().over(w2))
        .where(F.col("rn2") <= KMV_K)
        .select("event_type", "h", "val")
    )
    pairs = spark.createDataFrame(
        [("click", "purchase"), ("view", "click"), ("view", "purchase")], "ta string, tb string"
    )
    uh = (
        pairs.join(sk, sk["event_type"].isin(F.col("ta"), F.col("tb")) == F.lit(True))
        .groupBy("ta", "tb", "h", "val")
        .agg(
            F.max(F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)).alias("in_b"),
        )
    )
    # Per-SIDE sketch stats fold into the SAME aggregation as the union
    # stats (r14, guide §7.2 "duplicated subtrees"): the r13 `st` branch
    # joined twice into the output, so the whole distinct → hash →
    # two-window sketch chain under `sk` was planned and evaluated three
    # times (three events scans in the physical plan). Every sk row of
    # type ta appears in its pair's union group with in_a = 1 — the
    # per-pair union is LOSSLESS below the rn cap — so cnt_a ≡ st.cnt and
    # vk_a ≡ st.vk hold exactly, computed over the UNCAPPED group while
    # the union estimators keep the rn ≤ K cap. One subtree, one scan.
    w3 = Window.partitionBy("ta", "tb").orderBy("h")
    capped = F.col("rn") <= KMV_K
    out = (
        uh.withColumn("rn", F.row_number().over(w3))
        .groupBy("ta", "tb")
        .agg(
            F.sum(F.when(capped, 1).otherwise(0)).alias("cnt_u"),
            F.max(F.when(capped, F.col("val"))).alias("vk_u"),
            F.sum(
                F.when(capped & (F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
            ).alias("n_both"),
            F.sum("in_a").alias("cnt_a"),
            F.max(F.when(F.col("in_a") == 1, F.col("val"))).alias("vk_a"),
            F.sum("in_b").alias("cnt_b"),
            F.max(F.when(F.col("in_b") == 1, F.col("val"))).alias("vk_b"),
        )
    )
    est_union = F.when(F.col("cnt_u") < KMV_K, F.col("cnt_u")).otherwise(
        F.expr(f"CAST(({KMV_K} - 1) * {_KMV_SCALE} AS BIGINT) div vk_u")
    )
    return out.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.when(F.col("cnt_a") < KMV_K, F.col("cnt_a"))
        .otherwise(F.expr(f"CAST(({KMV_K} - 1) * {_KMV_SCALE} AS BIGINT) div vk_a"))
        .cast("bigint")
        .alias("est_a"),
        F.when(F.col("cnt_b") < KMV_K, F.col("cnt_b"))
        .otherwise(F.expr(f"CAST(({KMV_K} - 1) * {_KMV_SCALE} AS BIGINT) div vk_b"))
        .cast("bigint")
        .alias("est_b"),
        est_union.cast("bigint").alias("est_union"),
        F.when(F.col("cnt_u") < KMV_K, F.col("n_both"))
        .otherwise(
            F.expr(
                f"CAST(n_both * (CAST(({KMV_K} - 1) * {_KMV_SCALE} AS BIGINT) div vk_u) AS BIGINT) div {KMV_K}"
            )
        )
        .cast("bigint")
        .alias("est_intersect"),
    )


@op(
    "agg_weighted_percentile",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag, l_extendedprice AS x,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wx
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT flag, x,
             CAST(sum(wx) OVER (PARTITION BY flag ORDER BY x) AS BIGINT) AS cum,
             CAST(sum(wx) OVER (PARTITION BY flag) AS BIGINT) AS tot
      FROM g
    )
    SELECT flag,
           min(CASE WHEN 2 * cum >= tot THEN x END) AS p50_weighted,
           min(CASE WHEN 10 * cum >= 9 * tot THEN x END) AS p90_weighted
    FROM c GROUP BY flag
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted percentiles per group — the quantity-weighted price
    distribution (each lineitem counts l_quantity times): lower-bound
    definition, smallest x whose cumulative weight reaches p·total.
    Neither engine has a weighted percentile aggregate; the portable —
    and distributed — form IS the cumulative-weight construction:
    pre-aggregate weight per (group, x) (shrinks the window input to
    distinct values), one cumulative-sum window ordered by x, then
    conditional-min per group. One shuffle on the group key; the window
    sort reuses it. Weights are integer-valued quantities CAST BIGINT,
    so every comparison (2·cum ≥ tot, 10·cum ≥ 9·tot) is exact integer
    math on both engines — no float cumulative drift, no decimal
    precision games (the agg_percentile discipline, weighted).

    At 100 TB the same plan holds: the per-(group, x) pre-aggregate is
    map-side combinable, and the per-group window is the only serial
    step — bounded by distinct values per group, not rows. The exact
    unweighted siblings are agg_percentile/agg_stats; the sketch path
    for when even distinct-values-per-group explodes is
    agg_approx_percentile."""
    li = load(spark, sf_dir).lineitem
    return weighted_percentile_frame(
        li.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("x"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
    )


def weighted_percentile_frame(df: DataFrame) -> DataFrame:
    """The cumulative-weight construction over any (flag, x, w) frame —
    factored so the hypothesis property test can drive it with arbitrary
    inputs against a brute-force reference (the lower-bound threshold
    crossings under integer weights are the part worth property-testing)."""
    from pyspark.sql import Window

    g = df.groupBy("flag", "x").agg(F.sum("w").cast("bigint").alias("wx"))
    w_cum = Window.partitionBy("flag").orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tot = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "x",
        F.sum("wx").over(w_cum).cast("bigint").alias("cum"),
        F.sum("wx").over(w_tot).cast("bigint").alias("tot"),
    )
    return c.groupBy("flag").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("tot"), F.col("x"))).alias("p50_weighted"),
        F.min(F.when(10 * F.col("cum") >= 9 * F.col("tot"), F.col("x"))).alias("p90_weighted"),
    )
