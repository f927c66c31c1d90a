"""Streaming state-scale evidence (VERDICT r3 item 5).

The applyInPandasWithState twins are proven batch-equal, but only at toy
state sizes. This drives the SHIPPED sessionization operator
(streaming.stateful.stream_sessionize) to a configurable number of ACTIVE
keys (default 1M — ~300x the bench events table's user count) and records,
per micro-batch, what the state store actually does:

- input rows and trigger latency,
- state rows total / updated / REMOVED (eviction),
- state-store memory bytes,

then proves bounded state end-to-end: the final source file contains one
far-future event, so the event-time watermark passes every open session's
end+gap, the EventTimeTimeout fires for ALL of them, the store drains to
~1 row, and the emitted session count equals the key count (every session
closed exactly once). An unbounded-state regression (lost timeout, wrong
watermark column) fails the assertions instead of silently eating memory.

Feeding: B parquet files, one micro-batch each (maxFilesPerTrigger=1,
availableNow). Batches 0..B-2 each carry one event per key, 5 min apart
(inside the 30-min session gap — sessions stay OPEN, so state holds K rows
by design); the last file is the watermark-advancing flush event.

Usage:  python tools/stream_state_ab.py          # one JSON line per batch
Env:    STREAM_AB_KEYS=1000000  STREAM_AB_BATCHES=3  STREAM_AB_DIR=...
Results recorded in BASELINE.md ("Streaming state-scale evidence"). Run in
isolation, like bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_job_spark.session import get_spark  # noqa: E402
from flink_job_spark.streaming.stateful import stream_sessionize  # noqa: E402

K = int(os.environ.get("STREAM_AB_KEYS", "1000000"))
B = int(os.environ.get("STREAM_AB_BATCHES", "3"))
BASE = os.environ.get("STREAM_AB_DIR", "/tmp/stream_state_ab")
T0 = "2024-01-01 00:00:00"


def materialize(spark) -> str:
    src = f"{BASE}/src_{K}_{B}"
    if os.path.exists(f"{src}/_done"):
        return src
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    for b in range(B):
        # one event per key, 5 min per batch: inside the 30-min gap, so
        # every key's session stays open and the store must hold K rows
        (spark.range(K)
              .select(F.col("id").alias("user_id"),
                      (F.to_timestamp(F.lit(T0))
                       + F.expr(f"INTERVAL {5 * b} MINUTES")).alias("ts"),
                      F.lit(1.0).alias("value"))
              .coalesce(8)
              .write.mode("overwrite").parquet(f"{src}/b{b:03d}.parquet"))
    # flush file: one far-future event drives the watermark past every open
    # session's end+gap -> EventTimeTimeout evicts ALL K sessions
    (spark.range(1)
          .select(F.lit(K).alias("user_id"),
                  (F.to_timestamp(F.lit(T0))
                   + F.expr("INTERVAL 10 DAYS")).alias("ts"),
                  F.lit(1.0).alias("value"))
          .write.mode("overwrite").parquet(f"{src}/zz_flush.parquet"))
    open(f"{src}/_done", "w").write("ok")
    return src


def main() -> None:
    spark = get_spark("stream-state-ab",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    src = materialize(spark)
    out = f"{BASE}/out_{K}_{B}"
    ckpt = f"{BASE}/ckpt_{K}_{B}"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*.parquet"))
    t0 = time.perf_counter()
    q = (stream_sessionize(stream).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)

    removed_total = 0
    max_rows = 0
    max_mem = 0
    for p in q.recentProgress:
        so = (p["stateOperators"] or [{}])[0]
        row = {
            "batch": p["batchId"],
            "input_rows": p["numInputRows"],
            "trigger_ms": p["durationMs"].get("triggerExecution"),
            "state_rows": so.get("numRowsTotal"),
            "state_updated": so.get("numRowsUpdated"),
            "state_removed": so.get("numRowsRemoved"),
            "state_mem_bytes": so.get("memoryUsedBytes"),
        }
        removed_total += so.get("numRowsRemoved") or 0
        max_rows = max(max_rows, so.get("numRowsTotal") or 0)
        max_mem = max(max_mem, so.get("memoryUsedBytes") or 0)
        print(json.dumps(row), flush=True)

    n_sessions = spark.read.schema(
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long").parquet(out).count()
    summary = {"variant": f"sessionize_{K}keys", "keys": K,
               "batches": B + 1, "wall_sec": wall,
               "peak_state_rows": max_rows,
               "peak_state_mb": round(max_mem / 1e6, 1),
               "evicted": removed_total, "sessions_emitted": n_sessions}
    print(json.dumps(summary), flush=True)

    # bounded-state proof: every key's session was evicted and emitted once
    assert max_rows >= K, f"state never reached {K} rows: {max_rows}"
    assert removed_total >= K, f"eviction missing: {removed_total} < {K}"
    assert n_sessions >= K, f"sessions lost: {n_sessions} < {K}"
    spark.stop()


if __name__ == "__main__":
    main()
