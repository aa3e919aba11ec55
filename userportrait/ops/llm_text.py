"""§2.K (text half) — LLM-training-data text analysis over ``documents``.

The reference has no text-corpus tooling (its text analysis is the
product-preference keyword match, SURVEY §2.K basis column); these four ops
are the EXT extension mandated by BASELINE.json:6: corpus token stats,
n-grams, pure-SQL TF-IDF, and per-language metadata stats.

Scale notes (100 TB): every op here is a single explode→groupBy pipeline —
map-side combine applies (partial aggregation before the shuffle), the
shuffle key is the token/bigram (high cardinality → even distribution), and
nothing touches the driver. top-k is a global ``orderBy().limit(k)`` which
Spark executes as per-partition top-k + single small merge (TakeOrdered),
not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import op


def _tokens(doc_df: DataFrame) -> DataFrame:
    """(doc_id, lang, token) — one row per token occurrence, split on spaces."""
    return doc_df.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")


@op(
    "text_tokenize_topk",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY cnt DESC, token ASC
    LIMIT 20
    """,
)
def text_tokenize_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 tokens by frequency (tie-break token asc).

    explode(split) → count — the canonical word-count; the limit(20) runs as
    TakeOrdered (per-partition heap + driver merge of 20-row heaps), so the
    full token-count table is never globally sorted.
    """
    d = load(spark, sf_dir).documents
    return (
        _tokens(d)
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(20)
    )


@op(
    "text_ngram",
    oracle="""
    WITH toks AS (
      SELECT lang, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT lang,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toks
    )
    SELECT lang, bigram, CAST(count(*) AS BIGINT) AS cnt
    FROM bg
    GROUP BY lang, bigram
    HAVING count(*) >= 5
    """,
)
def text_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram counts per language (bigrams seen ≥5×).

    Bigrams are built array-side (sequence + transform over the token array)
    BEFORE the explode, so the shuffle carries (lang, bigram) pairs only —
    no window/self-join over token positions.
    """
    d = load(spark, sf_dir).documents
    t = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(t) - 2),
        lambda i: F.concat_ws(" ", F.element_at(t, i + 1), F.element_at(t, i + 2)),
    )
    return (
        d.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .where(F.col("cnt") >= 5)
    )


@op(
    "text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok WHERE token <> '' GROUP BY doc_id, token
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ), n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) DESC,
                                         tf.token ASC) AS rn
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token AS top_token, tfidf FROM scored WHERE rn = 1
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL TF-IDF: tf per (doc, token), idf = ln(N/df), top token per doc
    by tf·idf rounded to 4dp (tie-break token asc, SURVEY §2.K).

    The doc-frequency table is tiny (vocabulary-sized) → broadcast to the tf
    side, so the only real shuffle is the tf groupBy. N comes from a scalar
    agg (crossJoin of a 1-row frame — Catalyst folds it to a broadcast).
    Ordering uses the ROUNDED score so rank is reproducible across engines
    despite last-ulp ln() differences.
    """
    from pyspark.sql import Window

    d = load(spark, sf_dir).documents
    tf = (
        _tokens(d)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 4))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("token").alias("top_token"), "tfidf")
    )


@op(
    "text_lang_source_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(CAST(sum(CAST(n_chars AS DECIMAL(38,4))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus metadata: doc count, avg length (decimal-exact sum
    then one double division — SURVEY §2.0 rule 1), distinct sources, min/max
    length. Single map-side-combinable groupBy on a low-cardinality key."""
    d = load(spark, sf_dir).documents
    return d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum(F.col("n_chars").cast("decimal(38,4)")).cast("double") / F.count("*")
        ).cast("double").alias("avg_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )
