"""§2.H — scalar function surface, grouped into multi-function queries.

Dialect deltas handled on the ORACLE side so the Spark code stays idiomatic:
dayofweek origin (Spark 1=Sunday vs DuckDB 0=Sunday), initcap (absent in
DuckDB -> emulated), 1-based list indexing, json_extract_string vs
get_json_object. Transcendentals (ln/log10) round to 6dp — JVM vs libm can
differ in the last ulp (same policy as agg_stats corr).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import op


@op(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           concat(c_name, ':', c_mktsegment) AS full_tag,
           upper(c_name) AS uname, lower(c_mktsegment) AS lseg,
           CAST(length(c_name) AS INT) AS name_len,
           substring(c_name, 1, 8) AS name_prefix,
           trim('  ' || c_name || ' ') AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           string_split(c_name, '#')[2] AS cust_num,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           upper(substring(c_mktsegment, 1, 1)) || lower(substring(c_mktsegment, 2)) AS seg_title
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substring/case/trim/lpad/split/regexp_*/initcap — the rule-match
    string toolkit [R]. DuckDB lacks initcap; oracle emulates it."""
    c = load(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("full_tag"),
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.split("c_name", "#").getItem(1).alias("cust_num"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.initcap("c_mktsegment").alias("seg_title"),
    )


@op(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS TIMESTAMP) AS plus_30d,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2001-09-01') AS INT) AS days_to_anchor,
           CAST(date_diff('month', date_trunc('month', o_orderdate),
                          TIMESTAMP '2001-09-01') AS DOUBLE) AS months_to_anchor,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS TIMESTAMP) AS as_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date kit incl. the dayofweek origin delta (Spark 1=Sunday; DuckDB
    0=Sunday — oracle compensates, SURVEY §2.H) and months_between pinned to
    month-boundary semantics both engines share."""
    o = load(spark, sf_dir).orders
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("plus_30d"),
        F.datediff(F.lit("2001-09-01").cast("date"), F.col("o_orderdate").cast("date")).cast("int").alias("days_to_anchor"),
        F.months_between(F.lit("2001-09-01").cast("timestamp"), F.date_trunc("month", "o_orderdate")).cast("double").alias("months_to_anchor"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        F.to_date(F.date_format("o_orderdate", "yyyy-MM-dd")).cast("timestamp").alias("as_date"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_s"),
    )


@op(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           abs(l_extendedprice - 50000) AS dist_50k,
           power(l_quantity, 2) AS qty_sq,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           CAST(CAST(l_orderkey AS BIGINT) % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_extendedprice - 50000) AS INT) AS side_of_50k,
           greatest(l_quantity, l_discount * 100) AS g,
           least(l_quantity, l_discount * 100) AS l
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math kit. floor/ceil/abs/sqrt are IEEE-exact cross-engine; ln/log10
    round to 6dp (ulp-level libm differences); no raw round() on data values
    (2-decimal prices sit exactly on round-half boundaries — SURVEY §2.0)."""
    li = load(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_extendedprice") - 50000).alias("dist_50k"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_extendedprice") - 50000).cast("int").alias("side_of_50k"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("l"),
    )


@op(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal >= 8000 THEN 'platinum'
                WHEN c_acctbal >= 5000 THEN 'gold'
                WHEN c_acctbal >= 2000 THEN 'silver'
                WHEN c_acctbal >= 0    THEN 'bronze'
                ELSE 'debtor' END AS value_tier,
           IF(c_mktsegment = 'AUTOMOBILE', 'auto', 'other') AS seg_flag,
           nullif(c_mktsegment, 'MACHINERY') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'REDACTED') AS seg_filled
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-tier bucketing — the match-tag rule engine's core shape [R]."""
    c = load(spark, sf_dir).customer
    tier = (
        F.when(F.col("c_acctbal") >= 8000, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2000, "silver")
        .when(F.col("c_acctbal") >= 0, "bronze")
        .otherwise("debtor")
    )
    return c.select(
        "c_custkey",
        tier.alias("value_tier"),
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", "auto").otherwise("other").alias("seg_flag"),
        F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")).alias("seg_or_null"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("REDACTED")).alias("seg_filled"),
    )


@op(
    "fn_array",
    oracle="""
    WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)
    SELECT vec_id, label,
           CAST(len(v) AS INT) AS dim,
           round(list_sum(list_transform(v, x -> x * x)), 6) AS sq_norm,
           round(list_sum(list_filter(v, x -> x > 0)), 6) AS pos_sum,
           CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
           round(v[1] * 2.0, 6) AS first_doubled,
           round(list_sort(v)[1], 6) AS min_elem,
           round(list_sum(v[1:8]), 6) AS head_sum,
           round(list_sum(list_transform(list_zip(v[1:8], list_reverse_sort(v)[1:8]),
                                         p -> p[1] * p[2])), 6) AS zip_dot
    FROM e
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column (EXT multimodal):
    transform/filter/aggregate/zip_with/slice/sort_array/size."""
    e = load(spark, sf_dir).embeddings
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dbl0 = F.lit(0.0)
    agg_sum = lambda arr: F.aggregate(arr, dbl0, lambda a, x: a + x)
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.round(agg_sum(F.transform(v, lambda x: x * x)), 6).alias("sq_norm"),
        F.round(agg_sum(F.filter(v, lambda x: x > 0)), 6).alias("pos_sum"),
        F.size(F.filter(v, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(F.element_at(v, 1) * 2.0, 6).alias("first_doubled"),
        F.round(F.element_at(F.sort_array(v), 1), 6).alias("min_elem"),
        F.round(agg_sum(F.slice(v, 1, 8)), 6).alias("head_sum"),
        F.round(
            agg_sum(
                F.zip_with(
                    F.slice(v, 1, 8),
                    F.slice(F.sort_array(v, asc=False), 1, 8),
                    lambda x, y: x * y,
                )
            ),
            6,
        ).alias("zip_dot"),
    )


@op(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           concat('k=', json_extract_string(props, '$.k')) AS tag_render
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON + map surface over events.props (DRV) and the profile tag-map
    rendering convention: maps are canonicalized (sorted keys) before output
    because raw map hashing is unstable (SURVEY §2.0)."""
    e = load(spark, sf_dir).events
    m = F.from_json(F.col("props"), "map<string,string>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.concat(F.lit("k="), F.get_json_object("props", "$.k")).alias("tag_render"),
    )


@op(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey << 2 AS BIGINT) AS shl2,
           CAST(l_orderkey >> 1 AS BIGINT) AS shr1,
           CAST(l_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(l_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS BIGINT) AS mixed,
           CAST(bit_count(CAST(l_orderkey AS BIGINT)) AS INT) AS popcount,
           CAST(~l_orderkey AS BIGINT) AS flipped
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise kit (shifts, and/or/xor, popcount, complement) — the bucket
    and bitmap-mask arithmetic under partitioners, bloom filters, and the
    bitmap audience ops. Integer-exact on both engines by construction."""
    li = load(spark, sf_dir).lineitem
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.shiftleft(k, 2).cast("bigint").alias("shl2"),
        F.shiftright(k, 1).cast("bigint").alias("shr1"),
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("with_flag"),
        k.bitwiseXOR(F.col("l_linenumber").cast("bigint")).cast("bigint").alias("mixed"),
        F.bit_count(k).cast("int").alias("popcount"),
        F.bitwise_not(k).cast("bigint").alias("flipped"),
    )


@op(
    "fn_variant",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             json_extract(props, '$.missing') AS missing
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS k_sum,
           CAST(max(k) AS BIGINT) AS k_max,
           CAST(sum(2 * k) AS BIGINT) AS k2_sum,
           CAST(sum(CASE WHEN missing IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM v GROUP BY event_type
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT semi-structured type (Spark 4): ``parse_json`` turns the
    events ``props`` JSON string into a binary variant ONCE at scan time —
    at 100 TB the win over repeated ``get_json_object`` string parsing is
    that every downstream path access (``variant_get``) reads the parsed
    tree, and variant columns persisted to parquet carry shredded
    sub-columns for pushdown. Exercised surface: typed path extraction
    (``variant_get($.k, 'bigint')``), array path traversal on a
    constructed nested document (``$.a[1]``), and NULL-safe access to an
    absent field (``try_variant_get``) — the three access shapes a
    telemetry pipeline hits. The oracle computes the identical algebra
    with DuckDB's JSON kit, so the cross-engine claim is about the
    VALUES, not the storage format."""
    e = load(spark, sf_dir).events
    rows = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(parse_json(props), '$.missing', 'bigint')").alias("missing"),
    ).select(
        "event_type",
        "k",
        "missing",
        F.expr("variant_get(parse_json(concat('{\"a\":[', cast(k as string), ',', cast(k * 2 as string), ']}')), '$.a[1]', 'bigint')").alias("k2"),
    )
    return rows.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.max("k").cast("bigint").alias("k_max"),
        F.sum("k2").cast("bigint").alias("k2_sum"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing"),
    )


@op(
    "fn_collation",
    oracle="""
    WITH w AS (
      SELECT CASE p_partkey % 3 WHEN 0 THEN upper(p_brand)
                                WHEN 1 THEN lower(p_brand)
                                ELSE p_brand END AS w
      FROM part
    )
    SELECT min(w) AS brand_min, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT w) AS BIGINT) AS n_variants
    FROM w GROUP BY lower(w)
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATIONS (Spark 4): a case-mixed brand column (upper /
    lower / original by key mod 3) is grouped under the UTF8_LCASE
    collation — the engine-native way to make comparisons, joins, GROUP
    BY, and ORDER BY case-insensitive WITHOUT wrapping every reference in
    lower() (which blocks pushdown and breaks stats; a collated column
    keeps both). Output is normalized deterministically (binary min of
    the variants + counts), so the cross-engine claim is that the
    collation induces exactly the lower()-partitioning DuckDB computes —
    true by UTF8_LCASE's definition. At 100 TB collations matter because
    the lower()-wrapper alternative is applied per-query per-reference;
    the collation is declared once on the column."""
    p = load(spark, sf_dir).part
    w = (
        F.when(F.col("p_partkey") % 3 == 0, F.upper("p_brand"))
        .when(F.col("p_partkey") % 3 == 1, F.lower("p_brand"))
        .otherwise(F.col("p_brand"))
    )
    return (
        p.select(w.alias("w"))
        .groupBy(F.collate("w", "UTF8_LCASE").alias("wc"))
        .agg(
            F.min(F.col("w").cast("string")).alias("brand_min"),
            F.count("*").cast("bigint").alias("n"),
            F.count_distinct(F.col("w").cast("string")).cast("bigint").alias("n_variants"),
        )
        .drop("wc")
    )
