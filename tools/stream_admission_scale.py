"""Streaming-admission manifest scale A/B (r5, VERDICT r4 #6).

The incremental-dedup stream (streaming/dedup.py) short-circuits replayed
micro-batches via a completed-batch manifest. Through r4 the check read the
WHOLE manifest directory and collected every batch id on the driver — O(n)
file listings + O(n) driver rows per batch, so a long-lived stream paid
quadratic total manifest cost. r5 partitions the manifest by batch id and
reads ONLY the current batch's partition: O(1) per batch forever.

This harness isolates exactly that component: it materializes a manifest
with N completed batches in BOTH layouts (flat appended files vs
batch_id=N partitions) and times the per-batch "is batch b done?" check at
several N. No streaming query runs — the subject is the manifest check the
stream performs once per micro-batch.

Usage:  python tools/stream_admission_scale.py      # one JSON line per cell
Env:    ADMIT_AB_SIZES=1000,10000   ADMIT_AB_DIR=/tmp/admit_ab
Results recorded in BASELINE.md ("Streaming admission manifest A/B").
Run in isolation (no concurrent Spark), like bench.py.
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

SIZES = [int(s) for s in os.environ.get(
    "ADMIT_AB_SIZES", "1000,10000").split(",")]
BASE = os.environ.get("ADMIT_AB_DIR", "/tmp/admit_ab")
N_CHECKS = 5        # median of 5 single-batch checks per cell


def build_flat(spark, path: str, n: int) -> None:
    """The r4 layout: one appended parquet file per completed batch."""
    if os.path.exists(f"{path}/_DONE"):
        return
    shutil.rmtree(path, ignore_errors=True)
    # one task per id -> one file per id, exactly what n appends produce
    (spark.range(n).repartition(n, "id")
          .select(F.col("id").alias("batch_id"))
          .write.mode("overwrite").parquet(path))
    open(f"{path}/_DONE", "w").close()


def build_partitioned(spark, path: str, n: int) -> None:
    """The r5 layout: manifest partitioned by batch id."""
    if os.path.exists(f"{path}/_DONE"):
        return
    shutil.rmtree(path, ignore_errors=True)
    (spark.range(n)
          .select(F.col("id").alias("done"), F.col("id").alias("batch_id"))
          .write.mode("overwrite").partitionBy("batch_id").parquet(path))
    open(f"{path}/_DONE", "w").close()


def timed_checks(spark, label: str, thunk) -> None:
    ts = []
    for _ in range(N_CHECKS):
        t0 = time.perf_counter()
        thunk()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(json.dumps({"variant": label,
                      "sec_per_check": round(ts[len(ts) // 2], 4)}),
          flush=True)


def main() -> None:
    spark = get_spark("admit-ab",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(BASE, exist_ok=True)
    for n in SIZES:
        flat = f"{BASE}/flat_{n}"
        part = f"{BASE}/part_{n}"
        build_flat(spark, flat, n)
        build_partitioned(spark, part, n)
        probe = n // 2

        def flat_check(flat=flat, probe=probe):
            done = {r["batch_id"]
                    for r in spark.read.parquet(flat).collect()}
            assert probe in done

        def part_check(part=part, probe=probe):
            bdir = os.path.join(part, f"batch_id={probe}")
            assert spark.read.parquet(bdir).limit(1).count() > 0

        timed_checks(spark, f"flat_manifest_{n}", flat_check)
        timed_checks(spark, f"partitioned_manifest_{n}", part_check)
    spark.stop()


if __name__ == "__main__":
    main()
