#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query → plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/capture_plans.py <tag> <suffix>   (e.g. r14 before)

The eager queries (q_vector_knn, q_minhash, q_clean_pipeline,
q_jaccard_capped, q_ivf) execute work at plan-declaration time (pins,
KMeans training, the edge-list parquet stage); declaring them here runs
that work, which is fine — we want the plan of the DataFrame the bench
actually counts.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from userportrait.catalog import release_pins
    from userportrait.registry import load_all_ops
    from userportrait.session import get_spark

    import bench

    ops = load_all_ops()
    from userportrait.ops.portrait import rfm_base

    queries = {
        "q_pricing_summary": bench.q_pricing_summary,
        "q_star_join": bench.q_star_join,
        "q_window_topk": ops["win_topk_per_group"].fn,
        "q_sessionize": bench.q_sessionize,
        "q_rfm": rfm_base,
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
    spark = get_spark("userportrait-plans")
    for name, fn in queries.items():
        if only and name not in only:
            continue
        df = fn(spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        release_pins()
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
