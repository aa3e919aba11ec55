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


# 12 h against the fixture's per-user gap distribution (p50 ≈ 12 h,
# p90 ≈ 40 h over a 30-day span): short enough that a real fraction of the
# audience lapses mid-stream, long enough that a measurable cohort keeps
# every gap under it (the surgical-eviction check needs both populations)
FUNNEL_TTL_S = int(os.environ.get("UP_FUNNEL_TTL_S", str(12 * 3600)))


def _funnel(src, ttl_s: int | None):
    """stream_funnel_stages' state machine; ttl_s=None is the op's
    NoTimeout form, an integer arms EventTimeTimeout: a user's state
    evicts once the WATERMARK passes (their last stage event + ttl) — the
    unbounded-deployment knob the op's docstring names (VERDICT r9
    missing #4). Lapsed users are dropped from the store; a user
    returning after eviction restarts their frontier (the documented TTL
    trade)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # keep the watermarked ts column in the projection: EventTimeTimeout
    # requires the watermark attribute to reach the stateful operator
    stages = src.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", F.unix_micros("ts").alias("us"), "ts")

    def advance(key, pdfs, state: GroupState):
        if ttl_s is not None and state.hasTimedOut:
            state.remove()
            return
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
        if ttl_s is not None and evts:
            # event-time TTL anchored at the user's newest event; clamped
            # above the current watermark (Spark rejects a timeout already
            # in the past)
            ts_ms = max(
                state.getCurrentWatermarkMs() + 1, evts[-1][0] // 1000 + ttl_s * 1000
            )
            state.setTimeoutTimestamp(ts_ms)
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
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if ttl_s is not None
        else GroupStateTimeout.NoTimeout,
    )


def _query(src, which):
    if which == "session":
        return src.groupBy(S.F.session_window("ts", "30 minutes"), "user_id").agg(
            F.count("*").cast("bigint").alias("n_events")
        )
    if which == "funnel":
        return _funnel(src, None)
    if which == "funnel_ttl":
        return _funnel(src, FUNNEL_TTL_S)
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


def run(spark, sf_dir: str, which: str, delay_override: int | None = None, variant: str = "flush") -> dict:
    """delay_override: the harness default watermark delay is the full
    event-time span (deterministic finite replay — nothing is ever late,
    so nothing is evicted mid-replay and join state grows with the
    stream). Passing a production-like delay (e.g. 3600 s) on the ORDERED
    flush replay keeps correctness (no disorder -> no drops) while letting
    the sentinel batch actually evict: final_state then shows the
    bounded-by-horizon behavior a cluster would see."""
    stage_dir, delay_s = S._stage(sf_dir, variant)
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


def funnel_ttl_compare(spark, sf_dir: str, ttl_s: int = FUNNEL_TTL_S, expect_eviction: bool = True) -> dict:
    """The TTL-eviction proof (VERDICT r9 "Next round" #6), on the
    time-ordered 32-chunk replay with a production-like 1 h watermark
    delay so the watermark actually advances mid-stream:

      (a) churn evicts (when expect_eviction): peak state rows of the
          TTL run < audience (the NoTimeout run's peak, which holds
          every user ever seen);
      (b) eviction is surgical, both directions: every user whose
          stage-event gaps all stay under the TTL ends at the SAME final
          stage as the NoTimeout run (their state never lapsed), AND
          every user whose final stage DIVERGES has a gap >= TTL —
          eviction-and-restart is the only cause of divergence, the
          documented TTL trade.

    Both runs use memory sinks (final stage = max emitted stage per
    user; stage is monotone for never-evicted users). Run once with a
    short TTL (churn proof: real evictions) and once with a long TTL
    (surgical proof on a NONEMPTY gap-safe cohort)."""
    stage_dir, _ = S._stage(sf_dir, "ordered")
    delay_s = 3600

    results = {}
    for mode, ttl in (("no_ttl", None), ("ttl", ttl_s)):
        src = S._stream_events(spark, stage_dir, delay_s)
        qname = f"ttlcmp_{mode}_{os.getpid()}"
        t0 = time.time()
        q = (
            _funnel(src, ttl)
            .writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        peak = 0
        for p in q.recentProgress:
            prog = json.loads(p.json) if hasattr(p, "json") else p
            for so in prog.get("stateOperators", []):
                peak = max(peak, so.get("numRowsTotal", 0) or 0)
        final = {
            r.user_id: r.mx
            for r in spark.table(qname)
            .groupBy("user_id")
            .agg(F.max("stage").alias("mx"))
            .collect()
        }
        results[mode] = {"peak_state_rows": peak, "final": final, "wall_s": round(time.time() - t0, 1)}

    # batch-side: the gap-safe audience (max gap between consecutive stage
    # events, and from last event to stream end, all under TTL)
    from userportrait.catalog import read_table
    from pyspark.sql import Window

    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", F.unix_micros("ts").alias("us"))
    )
    w = Window.partitionBy("user_id").orderBy("us")
    gaps = ev.withColumn("gap", F.col("us") - F.lag("us").over(w))
    max_gap = {
        r.user_id: (r.mx or 0)
        for r in gaps.groupBy("user_id").agg(F.max("gap").alias("mx")).collect()
    }
    ttl_us = ttl_s * 1_000_000
    safe = {u for u, g in max_gap.items() if g < ttl_us}
    audience = results["no_ttl"]["peak_state_rows"]
    n_safe = sum(1 for u in safe if u in results["no_ttl"]["final"])
    safe_mismatches = [
        u
        for u in safe
        if u in results["no_ttl"]["final"]
        and results["ttl"]["final"].get(u) != results["no_ttl"]["final"][u]
    ]
    divergent = [
        u
        for u, st in results["no_ttl"]["final"].items()
        if results["ttl"]["final"].get(u) != st
    ]
    unexplained = [u for u in divergent if max_gap.get(u, 0) < ttl_us]
    row = {
        "op": f"funnel_ttl_compare ttl={ttl_s}s",
        "sf_dir": sf_dir,
        "audience_peak_no_ttl": audience,
        "peak_state_rows_ttl": results["ttl"]["peak_state_rows"],
        "evicts_mid_stream": results["ttl"]["peak_state_rows"] < audience,
        "gap_safe_users": n_safe,
        "gap_safe_final_stage_mismatches": len(safe_mismatches),
        "divergent_users": len(divergent),
        "divergent_without_a_ttl_gap": len(unexplained),
        "wall_s_no_ttl": results["no_ttl"]["wall_s"],
        "wall_s_ttl": results["ttl"]["wall_s"],
    }
    if expect_eviction:
        assert row["evicts_mid_stream"], row
    assert not safe_mismatches, safe_mismatches[:5]
    assert not unexplained, unexplained[:5]
    return row


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/userportrait_star100"]
    spark = get_spark("streaming-state-ladder")
    # TTL-eviction proof pair: short TTL = churn, long TTL = surgical
    print(json.dumps(funnel_ttl_compare(spark, dirs[0], ttl_s=12 * 3600, expect_eviction=True)), flush=True)
    print(json.dumps(funnel_ttl_compare(spark, dirs[0], ttl_s=96 * 3600, expect_eviction=False)), flush=True)
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
