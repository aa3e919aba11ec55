#!/usr/bin/env python
"""Headline benchmark suite — the driver's perf gate (BENCH_r{N}.json).

Runs the six BASELINE.md queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line. Methodology mirrors BASELINE.md: one untimed warm run per query, then
one timed run with ``df.count()`` as the action; session cold-start excluded.

Query → BASELINE.md row mapping:
  q_pricing_summary → agg_groupby_basic (TPC-H Q1 shape)       0.32 s target
  q_star_join       → 5-table star join, ASIA filter (inline)  1.65 s
  q_window_topk     → win_topk_per_group                       0.41 s
  q_sessionize      → events user×day×type groupBy (inline)    0.37 s
  q_rfm             → tag_rfm                                  0.17 s
  q_vector_knn      → sim_cosine_knn (broadcast-index matmul)  27.2 s naive

Two curation-side rows (no BASELINE.md counterpart — regression-tracked
round-over-round instead, VERDICT r6 item 5): the 80+ corpus ops were
previously invisible to the per-round perf gate.
  q_clean_pipeline  → doc_clean_pipeline (C4-style clean chain)
  q_minhash         → dedup_near_minhash (shingle→minhash→band→bucket-join)
  q_bm25            → text_bm25_keywords (single-tf-scan BM25 top-3/doc)
  q_jaccard_capped  → dedup_jaccard_verify_capped (bucket-capped LSH verify)
  q_ivf             → sim_knn_ivf_kmeans (trained-quantizer ANN; r9, so the
                      r8 scale work stays regression-tracked — VERDICT r8 #6)
  q_kmv             → agg_kmv_set_cardinality (bottom-k sketch set algebra;
                      r10 — baseline is the exact distinct set-op counts
                      the sketch displaces, BASELINE.md)
  q_feat_pit        → feat_point_in_time (union+window point-in-time
                      features; r10 — baseline is the per-order range-join
                      form, BASELINE.md)
  q_overlap         → tag_audience_overlap (bitmap audience set algebra;
                      r11 — baseline is the per-pair distinct+intersect
                      fact re-scan it displaces, BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from userportrait.catalog import load, release_pins  # noqa: E402
from userportrait.registry import load_all_ops  # noqa: E402
from userportrait.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.md:22 — customer⋈orders⋈lineitem⋈nation⋈region, ASIA filter,
    revenue per nation. Dims broadcast; the two fact joins shuffle on keys."""
    t = load(spark, sf_dir)
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        t.customer.join(F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey)
        .join(F.broadcast(t.region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.md:21 — TPC-H Q1 shape with the baseline's plain-double
    arithmetic. The registry op (agg_groupby_basic) computes the same query
    decimal-exact for the oracle gate, which costs ~4× in the aggregate
    hash update; the throughput bench measures the baseline's own shape.
    Both plans are identical apart from the sum datatype."""
    li = load(spark, sf_dir).lineitem.filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_base_price"),
        F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("sum_disc_price"),
        F.avg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASELINE.md:24 — events grouped user × day × event_type."""
    e = load(spark, sf_dir).events
    return e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))


def main() -> int:
    ops = load_all_ops()
    from userportrait.ops.portrait import rfm_base

    queries = {
        "q_pricing_summary": q_pricing_summary,  # exact BASELINE.md:21 shape (plain double aggs)
        "q_star_join": q_star_join,
        "q_window_topk": ops["win_topk_per_group"].fn,
        "q_sessionize": q_sessionize,
        "q_rfm": rfm_base,  # exact BASELINE.md:25 shape (plain R/F/M agg)
        "q_vector_knn": ops["sim_cosine_knn"].fn,
        "q_clean_pipeline": ops["doc_clean_pipeline"].fn,
        "q_minhash": ops["dedup_near_minhash"].fn,
        "q_bm25": ops["text_bm25_keywords"].fn,
        "q_jaccard_capped": ops["dedup_jaccard_verify_capped"].fn,
        "q_ivf": ops["sim_knn_ivf_kmeans"].fn,
        "q_kmv": ops["agg_kmv_set_cardinality"].fn,
        "q_feat_pit": ops["feat_point_in_time"].fn,
        "q_overlap": ops["tag_audience_overlap"].fn,
    }
    # Queries whose op body EXECUTES work at plan-declaration time: the
    # blocked kNN pins per-chunk partials eagerly (so each broadcast can be
    # destroyed before the next chunk loads), minhash pins its signature
    # table (Catalyst would otherwise inline the 16 interpreted md5 chains
    # into every consumer), and the clean pipeline stages its near-dup edge
    # list to parquet. For these, building the DataFrame outside the timed
    # region would hide that work from the clock; re-declare per run so the
    # timed number includes it.
    eager = {"q_vector_knn", "q_minhash", "q_clean_pipeline", "q_jaccard_capped", "q_ivf"}
    spark = get_spark("userportrait-bench")
    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    from userportrait.ops.llm_dedup import clear_worker_caches

    for name, fn in queries.items():
        if name in eager:
            # The warm run is additionally reported as first_run_sec (r15,
            # additions-only): it is the coldest observation of the query —
            # no pins, no worker-lifetime shingle cache — so it honestly
            # bounds the cold-start cost that best-of-N cannot show.
            t0 = time.time()
            fn(spark, SF_DIR).count()  # warm: fill page cache, settle JIT
            first_run[name] = round(time.time() - t0, 3)
            release_pins()
            best = float("inf")
            for _ in range(3):  # eager queries re-run the whole pipeline
                # Cold-cache protocol (r15, VERDICT r14 #2): clear the
                # worker-lifetime shingle cache OUTSIDE the timed region so
                # each timed run pays its own hashing — the dedup-family
                # numbers previously measured a cache already warmed by the
                # prior runs. Within-run reuse (the scale-relevant part)
                # still counts; only cross-run warmth is removed.
                clear_worker_caches(spark)
                t0 = time.time()
                fn(spark, SF_DIR).count()
                best = min(best, time.time() - t0)
                # Free this run's checkpoint pins: the registry otherwise
                # retains every run's blocks for the whole session (ADVICE
                # r10) — and a pin-heavy query would measure its own
                # accumulated block pressure instead of the engine.
                release_pins()
            timings[name] = round(best, 3)
            continue
        # Build the DataFrame once: re-declaring the plan per run measures
        # py4j API chatter (~0.5 s of driver round-trips), not the engine.
        # Each timed count() still runs the full optimize+execute pipeline.
        df = fn(spark, SF_DIR)
        df.count()  # warm 1: plan + fill caches, untimed
        df.count()  # warm 2: let the JIT settle (C2 kicks in after a few runs)
        best = float("inf")
        for _ in range(5):  # best-of-5 timed runs: local-mode noise ~0.3 s
            t0 = time.time()
            df.count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    import re

    m = re.match(r"sf([0-9.]+)", os.path.basename(os.path.normpath(SF_DIR)))
    sf = float(m.group(1)) if m else -1.0
    print(
        json.dumps(
            {
                "metric": "suite_warm_wall_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # additions-only keys (r15): the eager queries' untimed->timed
                # first (coldest) run, per VERDICT r14 "Next round" #2/#5.
                "queries_first_run": first_run,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
