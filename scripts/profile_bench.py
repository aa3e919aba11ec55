#!/usr/bin/env python
"""Per-job profile of bench queries (guide §1: measure first).

Runs the selected bench queries exactly as bench.py does (same warm
discipline), but with spark.eventLog enabled and a per-run
setJobDescription label, then parses the event log to attribute wall
time to individual Spark jobs (callsite + duration + task totals).

Usage: python scripts/profile_bench.py [q_name,...]
Writes a readable report to stdout; not part of the bench contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from userportrait.catalog import release_pins
    from userportrait.registry import load_all_ops
    from userportrait.session import RUNTIME_CONFS

    cpus = int(os.environ["SPARK_GRAFT_CPUS"])
    builder = (
        SparkSession.builder.appName("userportrait-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

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
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else list(queries)

    walls: dict[str, float] = {}
    for name in only:
        fn = queries[name]
        # one warm run, untimed + unlabeled
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, SF_DIR).count()
        release_pins()
        spark.sparkContext.setJobDescription(f"timed:{name}")
        t0 = time.time()
        fn(spark, SF_DIR).count()
        walls[name] = time.time() - t0
        release_pins()
        spark.sparkContext.setJobDescription(None)

    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ----
    paths = []
    for root, _dirs, files in os.walk(EVDIR):
        for f in files:
            if f.startswith("events_") or f == app_id or f.startswith("local-"):
                paths.append(os.path.join(root, f))
    paths.sort()
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}

    def lines():
        for p in paths:
            with open(p) as fh:
                yield from fh

    if True:
        for line in lines():
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get("spark.job.description", "")
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "site": (ev.get("Stage Infos") or [{}])[-1].get("Stage Name", ""),
                }
            elif t == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0)),
                }

    per_q: dict[str, list] = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        if not j["desc"].startswith("timed:") or "t1" not in j:
            continue
        q = j["desc"][6:]
        per_q.setdefault(q, []).append(
            (jid, (j["t1"] - j["t0"]) / 1000.0, j["site"], j["stages"])
        )
    for q in only:
        rows = per_q.get(q, [])
        print(f"\n### {q}  wall={walls.get(q, -1):.3f}s  jobs={len(rows)}")
        for jid, dur, site, sids in sorted(rows, key=lambda r: -r[1]):
            st = "; ".join(
                f"s{sid}:{stages[sid]['ms']}ms/{stages[sid]['tasks']}t"
                for sid in sids
                if sid in stages
            )
            print(f"  job {jid}: {dur:7.3f}s  {site[:80]}")
            if st:
                print(f"        stages: {st}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
