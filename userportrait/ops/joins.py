"""§2.C — joins.

Reference analog [R, SURVEY §0.1]: every tag model is "source rows ⋈ tag-rule
rows" (broadcastable dim join) and the profile writer is a full-outer merge
with the existing profile table. Scale posture (SURVEY §4): dims broadcast
explicitly; big fact-fact joins shuffle on their keys (sort-merge); the as-of
join is the union+window formulation (O(n log n), no per-key pair blowup)
rather than a pairwise join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import op


@op(
    "join_inner_equi",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain hash equi-join, the reference's source⋈rules shape."""
    t = load(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey)
        .filter(F.col("o_orderstatus") == "F")
        .select("c_custkey", "c_name", "c_mktsegment", "o_orderkey", "o_totalprice")
    )


@op(
    "join_broadcast_dim",
    oracle="""
    SELECT p.p_brand AS brand, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type LIKE 'PROMO%'
    GROUP BY brand
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim): the star-schema pattern that must hold at 100 TB.

    ``F.broadcast`` pins BroadcastHashJoin (asserted in tests/test_plans.py) —
    no shuffle of the 600k-row (at sf0.1; billions at scale) lineitem side.
    """
    t = load(spark, sf_dir)
    dim = t.part.filter(F.col("p_type").like("PROMO%"))
    return (
        t.lineitem.join(F.broadcast(dim), t.lineitem.l_partkey == dim.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(38,4)")).cast("double").alias("total_qty"),
        )
    )


@op(
    "join_sortmerge_big",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,4)) * (1 - CAST(l.l_discount AS DECIMAL(38,4)))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
)
def join_sortmerge_big(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join forced to sort-merge (`hint("merge")`) — the strategy
    that scales when neither side broadcasts; both sides shuffle once on the
    join key and the downstream groupBy reuses that partitioning."""
    t = load(spark, sf_dir)
    rev = (F.col("l_extendedprice").cast("decimal(38,4)") * (F.lit(1) - F.col("l_discount").cast("decimal(38,4)")))
    return (
        t.orders.hint("merge")
        .join(t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


_PER_CUST_ORDERS = """
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS spend
    FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey
"""


def _per_cust_orders(t) -> DataFrame:
    return (
        t.orders.filter(F.col("o_orderstatus") == "P")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,4)")).cast("double").alias("spend"),
        )
    )


@op(
    "join_outer_left",
    oracle=f"""
    SELECT c.c_custkey, c.c_mktsegment, a.n_orders, a.spend
    FROM customer c LEFT JOIN ({_PER_CUST_ORDERS}) a ON c.c_custkey = a.o_custkey
    """,
)
def join_outer_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: every customer, null stats where no 'P' orders exist —
    the reference's profile-merge direction (keep all users) [R]."""
    t = load(spark, sf_dir)
    a = _per_cust_orders(t)
    return t.customer.join(a, t.customer.c_custkey == a.o_custkey, "left").select(
        "c_custkey", "c_mktsegment", "n_orders", "spend"
    )


@op(
    "join_outer_right",
    oracle=f"""
    SELECT c.c_custkey, c.c_mktsegment, a.n_orders, a.spend
    FROM ({_PER_CUST_ORDERS}) a RIGHT JOIN customer c ON c.c_custkey = a.o_custkey
    """,
)
def join_outer_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer (mirror of left — exercises the dedicated plan path)."""
    t = load(spark, sf_dir)
    a = _per_cust_orders(t)
    return a.join(t.customer, t.customer.c_custkey == a.o_custkey, "right").select(
        "c_custkey", "c_mktsegment", "n_orders", "spend"
    )


@op(
    "join_outer_full",
    oracle="""
    WITH hi AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         ue AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY user_id)
    SELECT coalesce(hi.c_custkey, ue.user_id) AS entity_id, hi.c_acctbal, ue.n_events
    FROM hi FULL OUTER JOIN ue ON hi.c_custkey = ue.user_id
    """,
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer with unmatched rows on BOTH sides (high-balance customers
    vs event-active users) — the reference's profile upsert shape [R]."""
    t = load(spark, sf_dir)
    hi = t.customer.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    ue = t.events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return hi.join(ue, hi.c_custkey == ue.user_id, "full").select(
        F.coalesce("c_custkey", "user_id").alias("entity_id"), "c_acctbal", "n_events"
    )


@op(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one big order (left_semi: no row multiplication)."""
    t = load(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(big, t.customer.c_custkey == big.o_custkey, "left_semi").select("c_custkey", "c_name")


@op(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no big order (left_anti) — churn-audience shape [R]."""
    t = load(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 300000)
    return t.customer.join(big, t.customer.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@op(
    "join_cross_small",
    oracle="SELECT r.r_name AS region_name, n.n_name AS nation_name FROM region r CROSS JOIN nation n",
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian of two tiny dims (5 x 25)."""
    t = load(spark, sf_dir)
    return t.region.crossJoin(t.nation).select(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    )


@op(
    "join_theta_range",
    oracle="""
    SELECT a.event_id AS first_id, b.event_id AS second_id, a.user_id,
           CAST(date_diff('second', CAST(a.ts AS TIMESTAMP), CAST(b.ts AS TIMESTAMP)) AS BIGINT) AS gap_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND CAST(a.ts AS TIMESTAMP) < CAST(b.ts AS TIMESTAMP)
     AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi self-join: same-user event pairs within 5 minutes.

    The user_id equi-key keeps this a hash/sort-merge join with a residual
    range predicate — per-user fan-out only, which is the partitioning that
    survives scale (sessionization precursor)."""
    t = load(spark, sf_dir)
    a = t.events.alias("a")
    b = t.events.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.ts") < F.col("b.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTE"))
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("first_id"),
        F.col("b.event_id").alias("second_id"),
        F.col("a.user_id").alias("user_id"),
        ((F.unix_timestamp("b.ts") - F.unix_timestamp("a.ts")).cast("bigint")).alias("gap_s"),
    )


@op(
    "join_asof_latest",
    oracle="""
    SELECT p.event_id,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
               AND e.ts < p.ts
             ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_event_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the same user's latest earlier
    non-purchase event (strict: candidate.ts < purchase.ts).

    Implemented as the scalable union+window formulation (point-in-time
    correctness for feature stores, SURVEY §2.C): tag candidates and queries,
    sort once per user by (ts, role, event_id) and carry the last candidate
    with ``last(..., ignorenulls)``. O(n log n) per user — no pairwise
    blowup, unlike a join + row_number. Queries sort BEFORE candidates at
    equal ts, enforcing strictness."""
    t = load(spark, sf_dir)
    ev = t.events
    queries = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("role"), F.lit(None).cast("bigint").alias("cand_id")
    )
    cands = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("role"), F.col("event_id").alias("cand_id")
    )
    # role: query=0, candidate=1. Order by (ts, role, event_id): at equal ts the
    # query precedes every candidate, so an equal-ts candidate is never carried.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = queries.unionAll(cands).withColumn("asof_event_id", F.last("cand_id", ignorenulls=True).over(w))
    return merged.filter(F.col("role") == 0).select("event_id", "asof_event_id")


@op(
    "join_interval",
    oracle="""
    WITH q AS (SELECT DISTINCT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start FROM orders)
    SELECT q.q_start, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM q JOIN orders o
      ON o.o_orderdate >= q.q_start AND o.o_orderdate < q.q_start + INTERVAL 3 MONTH
    GROUP BY q.q_start
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join: orders into derived quarter windows.

    Range-only join conditions force BroadcastNestedLoopJoin (every stream
    row probes every interval). The scale-safe rewrite is range BINNING:
    add a redundant bucket equi-key — here ``date_trunc('quarter', ts) ==
    q_start``, exact because the intervals are quarter-aligned — so the
    plan becomes a BroadcastHashJoin (asserted in tests/test_plans.py) with
    the range predicate as a residual filter. For OVERLAPPING intervals the
    same pattern explodes each interval into the bins it covers first; the
    probe side still hash-routes to one bucket."""
    t = load(spark, sf_dir)
    # q derives from orders and joins back to orders: alias both sides so the
    # range predicate resolves against the correct lineage (self-join trap).
    q = t.orders.select(F.date_trunc("quarter", "o_orderdate").alias("q_start")).distinct().alias("q")
    o = t.orders.alias("o")
    cond = (
        (F.date_trunc("quarter", F.col("o.o_orderdate")) == F.col("q.q_start"))
        & (F.col("o.o_orderdate") >= F.col("q.q_start"))
        & (F.col("o.o_orderdate") < F.col("q.q_start") + F.expr("INTERVAL 3 MONTH"))
    )
    return (
        F.broadcast(q)
        .join(o, cond)
        .groupBy("q_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,4)")).cast("double").alias("revenue"),
        )
    )


@op(
    "join_self_graph",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, r.r_name AS region_name
    FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    JOIN region r ON r.r_regionkey = a.n_regionkey
    """,
)
def join_self_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: unordered nation pairs sharing a region."""
    t = load(spark, sf_dir)
    a = t.nation.alias("a")
    b = t.nation.alias("b")
    return (
        a.join(b, (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
        .join(F.broadcast(t.region), F.col("a.n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("r_name").alias("region_name"),
        )
    )


# One cloned big×big-regime session per SparkContext: repeated invocations
# (harness loops, bench runs) must not accumulate SparkSession state in the
# shared JVM context (ADVICE r6). The session-wide confs are set once; the
# shuffle width re-syncs from the caller each call (it may differ per test).
_BLOOM_SESSIONS: dict[str, SparkSession] = {}


def _bloom_session(spark: SparkSession) -> SparkSession:
    key = spark.sparkContext.applicationId
    s2 = _BLOOM_SESSIONS.get(key)
    if s2 is None:
        s2 = spark.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # default 10 GB models "fact scan big enough to be worth filtering";
        # test parquet is MBs, so arm injection unconditionally
        s2.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        _BLOOM_SESSIONS[key] = s2
    s2.conf.set(
        "spark.sql.shuffle.partitions", spark.conf.get("spark.sql.shuffle.partitions")
    )
    return s2


@op(
    "join_bloom_filtered",
    oracle="""
    SELECT l.l_orderkey, CAST(count(*) AS BIGINT) AS n_items,
           CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 450000
    GROUP BY l.l_orderkey
    """,
)
def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join (r6 addition): a selective dim predicate
    (high-value orders) is compiled into a ``bloom_filter_agg`` that Spark
    pushes into the FACT side's scan stage, so non-matching lineitem rows
    are dropped before the shuffle — the sort-merge-join sibling of dynamic
    partition pruning (scan_dpp_join), and the lever that matters when the
    100 TB fact side is NOT partitioned on the join key. With broadcast
    available Spark rightly skips injection (the filter would be pointless),
    so this op models the big×big regime: a cloned session (independent
    SQLConf — nothing leaks to other ops) disables autoBroadcast and drops
    the injection threshold to test scale. Results are exact either way:
    the bloom filter only pre-drops rows the join would discard
    (tests/test_plans.py asserts the injection is real)."""
    s2 = _bloom_session(spark)
    t = load(s2, sf_dir)
    o = t.orders.where(F.col("o_totalprice") > 450000).select("o_orderkey")
    l = t.lineitem.select("l_orderkey", "l_extendedprice")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,4)")).cast("double").alias("revenue"),
        )
    )


ASOF_TOL_S = 3600  # 1 h match horizon


@op(
    "join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
               AND e.ts < p.ts
               AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(e.ts AS TIMESTAMP)) <= CAST({ASOF_TOL_S} AS BIGINT) * 1000000
             ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS asof_event_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE horizon (pandas ``merge_asof``'s
    ``tolerance=`` semantics, the feature-store variant the strict as-of
    lacks): each purchase matches the same user's latest earlier
    non-purchase event ONLY IF it happened within the last hour —
    a stale feature is worse than no feature, so beyond the horizon the
    join yields NULL rather than a year-old click.

    Same scalable union+window shape as join_asof_latest (one shuffle per
    user, one sort, last-ignorenulls carry — no pairwise blowup), with the
    carried value widened to (cand_ts, cand_id) so the horizon test is a
    post-carry integer-µs filter: carrying first and filtering after is
    exactly the tolerance semantics (the latest candidate either
    qualifies or nothing does — any earlier candidate is farther away)."""
    t = load(spark, sf_dir)
    ev = t.events
    queries = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("role"),
        F.lit(None).cast("struct<us:bigint,id:bigint>").alias("cand"),
    )
    cands = ev.filter(F.col("event_type") != "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("role"),
        F.struct(F.unix_micros("ts").alias("us"), F.col("event_id").alias("id")).alias("cand"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = queries.unionAll(cands).withColumn(
        "last_cand", F.last("cand", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("role") == 0).select(
        "event_id",
        F.when(
            F.unix_micros("ts") - F.col("last_cand.us") <= ASOF_TOL_S * 1_000_000,
            F.col("last_cand.id"),
        ).alias("asof_event_id"),
    )


@op(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
               AND e.ts > p.ts
             ORDER BY e.ts ASC, e.event_id ASC LIMIT 1) AS next_event_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each purchase, the same user's EARLIEST
    later non-purchase event (strict: candidate.ts > purchase.ts) — the
    direction='forward' of pandas merge_asof, and the outcome-attachment
    query of effect measurement ("what did the user do next?"), completing
    the as-of family (backward: join_asof_latest; horizon: tolerance;
    forward: this).

    Same union+window decomposition, mirrored: tag candidates role 0 and
    queries role 1 so an EQUAL-ts candidate sorts BEFORE its query and
    never lands in the query's strictly-following frame; carry the first
    candidate ahead with ``first(ignorenulls)`` over
    (currentRow, unboundedFollowing). One shuffle per user, no pairwise
    blowup — identical scale shape to join_asof_latest."""
    return asof_forward_frame(load(spark, sf_dir).events)


def asof_forward_frame(ev: DataFrame) -> DataFrame:
    """The forward-as-of union+window construction over any
    (event_id, user_id, ts, event_type) frame — factored so the
    hypothesis property test can drive it with arbitrary inputs against
    a brute-force reference (the role ordering at equal timestamps is
    the subtle part worth property-testing)."""
    cands = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("role"), F.col("event_id").alias("cand_id")
    )
    queries = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("role"), F.lit(None).cast("bigint").alias("cand_id")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = queries.unionAll(cands).withColumn(
        "next_event_id", F.first("cand_id", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("role") == 1).select("event_id", "next_event_id")


@op(
    "join_asof_nearest",
    oracle="""
    SELECT p.event_id,
           (SELECT e.event_id FROM events e
             WHERE e.user_id = p.user_id AND e.event_type <> 'purchase'
               AND e.ts <> p.ts
             ORDER BY abs(epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP))) ASC,
                      (e.ts > p.ts) ASC,
                      CASE WHEN e.ts < p.ts THEN -e.event_id ELSE e.event_id END ASC
             LIMIT 1) AS nearest_event_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: for each purchase, the same user's closest
    non-purchase event in EITHER direction by |Δts| — pandas
    ``merge_asof(direction='nearest')``, the fourth and last member of
    the as-of family (backward: join_asof_latest; horizon: tolerance;
    forward: join_asof_forward). Ties between an equally-near earlier
    and later event resolve BACKWARD (the pandas convention: the past is
    the safer feature); equal-ts candidates are excluded, consistent
    with both strict siblings.

    Shape: the backward carry (last-ignorenulls over the preceding
    frame, queries sorting before equal-ts candidates) and the forward
    carry (first-ignorenulls over the following frame, candidates
    sorting before equal-ts queries) run as TWO window passes over ONE
    union frame — both partition by user_id, so the plan shuffles once
    and sorts twice; picking the closer carried struct is a per-row
    expression. No pairwise blowup, same scale shape as the siblings.
    Within an equal-|Δ| side, the carry's own tie-break applies:
    backward keeps the highest event_id at its ts (last over id-asc),
    forward the lowest (first over id-asc) — the oracle's signed
    event_id ORDER BY term mirrors exactly that."""
    return asof_nearest_frame(load(spark, sf_dir).events)


def asof_nearest_frame(ev: DataFrame) -> DataFrame:
    """The nearest-as-of two-carry construction over any
    (event_id, user_id, ts, event_type) frame — factored so the
    hypothesis property test can drive it with arbitrary inputs against
    a brute-force reference (the per-side tie-breaks at equal |Δ| are
    the subtle part worth property-testing)."""
    cand_t = "struct<us:bigint,id:bigint>"
    queries = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(0).alias("role_b"),
        F.lit(1).alias("role_f"),
        F.lit(None).cast(cand_t).alias("cand"),
    )
    cands = ev.filter(F.col("event_type") != "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(1).alias("role_b"),
        F.lit(0).alias("role_f"),
        F.struct(F.unix_micros("ts").alias("us"), F.col("event_id").alias("id")).alias("cand"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role_b", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "role_f", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        queries.unionAll(cands)
        .withColumn("back", F.last("cand", ignorenulls=True).over(w_back))
        .withColumn("fwd", F.first("cand", ignorenulls=True).over(w_fwd))
    )
    b_d = F.unix_micros("ts") - F.col("back.us")
    f_d = F.col("fwd.us") - F.unix_micros("ts")
    return merged.filter(F.col("role_b") == 0).select(
        "event_id",
        F.when(F.col("back").isNull(), F.col("fwd.id"))
        .when(F.col("fwd").isNull(), F.col("back.id"))
        .when(b_d <= f_d, F.col("back.id"))
        .otherwise(F.col("fwd.id"))
        .alias("nearest_event_id"),
    )
