"""State-store growth ladder for the two heaviest stateful streaming ops.

The §2.J ops carry batch-equivalence (correctness) proofs; this script adds
the SCALE evidence: replay the event stream at 1× (sf0.1) and 100×
(/tmp/userportrait_star100, key-offset replica) through stream_session and
stream_stream_join, and report the state-store's own metrics
(max numRowsTotal / memoryUsedBytes across microbatches, from
StreamingQueryProgress.stateOperators) plus output rows and wall time.
What to look for: state rows bounded by key cardinality × watermark horizon
(users × open sessions; clicks within the 1 h join horizon), NOT by stream
length — i.e. ~linear in distinct users for the replica (which offsets
user_id per copy) and eviction actually happening once the sentinel
advances the watermark.

Usage: python scripts/streaming_state_ladder.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /tmp/userportrait_star100)
Results land in PLANS.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from userportrait.ops import streaming as S  # noqa: E402
from userportrait.session import get_spark  # noqa: E402


def _query(src, which):
    if which == "session":
        return src.groupBy(S.F.session_window("ts", "30 minutes"), "user_id").agg(
            F.count("*").cast("bigint").alias("n_events")
        )
    if which == "funnel":
        # the stream_funnel_stages body (r9): per-user stage-frontier state
        import pandas as pd
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        stages = src.where(
            F.col("event_type").isin("view", "click", "purchase")
        ).select("user_id", "event_type", F.unix_micros("ts").alias("us"))

        def advance(key, pdfs, state: GroupState):
            v, c, p = state.get if state.exists else (None, None, None)
            # collect all chunks, then one global event-time sort (ADVICE r9)
            evts = sorted(
                (int(us), et)
                for pdf in pdfs
                for us, et in zip(pdf["us"], pdf["event_type"])
            )
            for us, et in evts:
                if et == "view":
                    if v is None:
                        v = us
                elif et == "click":
                    if c is None and v is not None and us > v:
                        c = us
                elif p is None and c is not None and us > c:
                    p = us
            state.update((v, c, p))
            if v is None:
                return
            yield pd.DataFrame(
                {"user_id": [key[0]], "stage": [3 if p is not None else 2 if c is not None else 1]}
            )

        return stages.groupBy("user_id").applyInPandasWithState(
            advance,
            outputStructType="user_id bigint, stage bigint",
            stateStructType="v bigint, c bigint, p bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    clicks = src.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = src.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )


def run(spark, sf_dir: str, which: str, delay_override: int | None = None) -> dict:
    """delay_override: the harness default watermark delay is the full
    event-time span (deterministic finite replay — nothing is ever late,
    so nothing is evicted mid-replay and join state grows with the
    stream). Passing a production-like delay (e.g. 3600 s) on the ORDERED
    flush replay keeps correctness (no disorder -> no drops) while letting
    the sentinel batch actually evict: final_state then shows the
    bounded-by-horizon behavior a cluster would see."""
    stage_dir, delay_s = S._stage(sf_dir, "flush")
    if delay_override is not None:
        delay_s = delay_override
    src = S._stream_events(spark, stage_dir, delay_s)
    qname = f"ladder_{which}_{os.getpid()}_{int(time.time() * 1000) % 1_000_000}"
    t0 = time.time()
    # noop sink: the measurement targets STATE, and a memory sink would
    # additionally accumulate every output row on the driver (OOMs the
    # single local JVM at 100x); output rows come from the sink progress.
    q = (
        _query(src, which)
        .writeStream.format("noop")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    state_rows = state_mem = 0
    final_rows = final_mem = 0
    out_rows = 0
    for p in q.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else p
        out_rows += max(0, prog.get("sink", {}).get("numOutputRows", 0) or 0)
        for so in prog.get("stateOperators", []):
            state_rows = max(state_rows, so.get("numRowsTotal", 0) or 0)
            state_mem = max(state_mem, so.get("memoryUsedBytes", 0) or 0)
            final_rows = so.get("numRowsTotal", 0) or 0
            final_mem = so.get("memoryUsedBytes", 0) or 0
    return {
        "op": which + ("" if delay_override is None else f"+wm{delay_override}s"),
        "sf_dir": sf_dir,
        "out_rows": out_rows,
        "peak_state_rows": state_rows,
        "peak_state_mb": round(state_mem / 1e6, 1),
        "final_state_rows": final_rows,
        "final_state_mb": round(final_mem / 1e6, 1),
        "wall_s": round(wall, 1),
    }


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/userportrait_star100"]
    spark = get_spark("streaming-state-ladder")
    for d in dirs:
        for which in ("session", "stream_join"):
            print(json.dumps(run(spark, d, which)), flush=True)
        print(json.dumps(run(spark, d, "stream_join", delay_override=3600)), flush=True)
    # production state-store config (streaming.py module docstring): RocksDB
    # keeps state off-heap/on-disk, so the big-state op must also hold there
    if os.environ.get("UP_LADDER_ROCKSDB", "1") == "1":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        for d in dirs:
            r = run(spark, d, "session")
            r["op"] = "session+rocksdb"
            print(json.dumps(r), flush=True)
