"""§2.L — the UDF/UDAF/UDTF surface, demonstrated end-to-end.

The reference's only custom function is its profile merge-UDF (SURVEY §2.L
basis [R]); this module rebuilds that shape (udf_python_scalar) and adds the
full modern PySpark surface: Arrow-vectorized scalar pandas UDF, grouped-agg
pandas UDF, applyInPandas, mapInPandas, and a Python UDTF.

Performance doctrine (SURVEY §4 / the 100 TB mandate): row-at-a-time Python
UDFs are the slow path — ``udf_python_scalar`` exists as the sanctioned
surface demo ONLY (VERDICT r1 rule); every other op here moves data via
Arrow record batches (10-100× less serialization overhead), and nothing in
this module ever collects to the driver.

Cross-engine float policy for the aggregating UDFs: Spark casts the inputs
to DECIMAL(38,4) *before* the UDF (so the cast semantics are Spark's, known
to match DuckDB's from §2.D), the pandas UDF sums ``Decimal`` objects —
exact, order-independent — and the single final division happens in float64
on both engines (SURVEY §2.0 rule 1 carried into Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from ..catalog import load, register_views
from ..registry import op


@op(
    "udf_python_scalar",
    oracle="SELECT c_custkey, 'SEG:' || c_mktsegment AS seg_tag FROM customer",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time ``@udf`` tag formatter — the reference's merge-UDF shape
    [R]. Kept as the §2.L surface demo; the vectorized ops below are the
    pattern for anything on a data path."""

    @udf("string")
    def seg_tag(seg: str) -> str:
        return f"SEG:{seg}"

    c = load(spark, sf_dir).customer
    return c.select("c_custkey", seg_tag("c_mktsegment").alias("seg_tag"))


@op(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS net_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized net-price: one ufunc chain per record batch, same
    elementwise double math as the SQL expression → bitwise-equal."""

    @pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
    )


@op(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           min(l_extendedprice) AS min_price,
           CAST(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDFs: min + quantity-weighted mean price per
    return flag. The weighted mean's sums arrive as DECIMAL(38,4) Series
    (cast Spark-side) and are summed as exact ``Decimal``s in Python, so the
    result is order-independent and engine-agnostic."""

    @pandas_udf("double")
    def pd_min(s: pd.Series) -> float:
        return float(s.min())

    @pandas_udf("double")
    def pd_wavg(num: pd.Series, den: pd.Series) -> float:
        return float(sum(num)) / float(sum(den))

    li = load(spark, sf_dir).lineitem
    return li.select(
        "l_returnflag",
        "l_extendedprice",
        (F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(38,4)").alias("wsum_in"),
        F.col("l_quantity").cast("decimal(38,4)").alias("qty_dec"),
    ).groupBy("l_returnflag").agg(
        pd_min("l_extendedprice").alias("min_price"),
        pd_wavg("wsum_in", "qty_dec").alias("wavg_price"),
    )


@op(
    "udf_apply_in_pandas",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 4) AS z_score
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    QUALIFY count(*) OVER w >= 2
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer z-score normalization of order totals via
    ``applyInPandas`` — the custom-stateless-group-transform pattern. Groups
    of one order are skipped (sample stddev undefined); 4dp rounding absorbs
    pandas-vs-SQL summation-order ulps (SURVEY §2.K round-4 policy)."""

    def zscore(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["o_custkey", "o_orderkey", "z_score"])
        x = g["o_totalprice"]
        z = ((x - x.mean()) / x.std(ddof=1)).round(4)
        return pd.DataFrame(
            {"o_custkey": g["o_custkey"], "o_orderkey": g["o_orderkey"], "z_score": z}
        )

    o = load(spark, sf_dir).orders
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .applyInPandas(zscore, "o_custkey bigint, o_orderkey bigint, z_score double")
    )


@op(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           value * CAST(json_extract_string(props, '$.k') AS INT) AS scaled_value
    FROM events
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-wise ``mapInPandas`` transform: parse the props JSON payload and
    derive a scaled value — the ETL-enrichment shape for opaque payload
    columns (multimodal metadata pattern, SURVEY §2.K intro)."""

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            k = pdf["props"].map(lambda s: int(json.loads(s)["k"])).astype("int32")
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "k": k,
                    "scaled_value": pdf["value"] * k,
                }
            )

    e = load(spark, sf_dir).events
    return e.select("event_id", "user_id", "value", "props").mapInPandas(
        enrich, "event_id bigint, user_id bigint, k int, scaled_value double"
    )


@op(
    "udtf_python",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, toks[p.pos] AS token, CAST(p.pos AS INT) AS pos
    FROM t CROSS JOIN (SELECT unnest(generate_series(1, 1000)) AS pos) p
    WHERE p.pos <= len(toks)
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark ≥3.5) exploding a document into (doc_id, token,
    1-based pos) rows, applied per input row via a SQL LATERAL join — the
    table-function analog of unnest WITH ORDINALITY."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, pos int")
    class SplitDoc:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield doc_id, tok, i

    register_views(spark, sf_dir)
    spark.udtf.register("split_doc", SplitDoc)
    return spark.sql(
        "SELECT s.doc_id, s.token, s.pos FROM documents, LATERAL split_doc(doc_id, text) s"
    )


@op(
    "udf_arrow_scalar",
    oracle="""
    SELECT p_partkey, upper(p_brand) || '/' || CAST(p_size AS VARCHAR) AS brand_size
    FROM part
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``): row-at-a-time Python
    semantics but Arrow-batch transfer instead of pickle — the Spark ≥3.5
    middle ground between legacy Python UDFs (~100× slow path) and pandas
    UDFs. Surface demo like udf_python_scalar; real pipelines still prefer
    the builtin-expression equivalent (the oracle)."""

    @udf(returnType="string", useArrow=True)
    def brand_size(brand: str, size: int) -> str:
        return f"{brand.upper()}/{size}"

    p = load(spark, sf_dir).part
    return p.select("p_partkey", brand_size("p_brand", "p_size").alias("brand_size"))
