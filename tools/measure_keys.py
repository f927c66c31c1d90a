"""Isolated per-key measurement: wall seconds (noop sink, bench
methodology) plus the Spark JOB COUNT per run — the r9/r10 verify notes
show bench-scale cost is job-count dominated, so optimization A/Bs need
both numbers.

Usage: [REPS=3] [SPARK_GRAFT_SF_DIR=...] [SPARK_GRAFT_CPUS=32] \
    python tools/measure_keys.py key1 key2 ...
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("REPS", "3"))

    from flink_job_spark.queries import all_queries
    from flink_job_spark.session import get_spark, unpersist_all

    spark = get_spark("measure-keys", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").limit(1).collect()
    spark.range(100).mapInPandas(lambda it: it, "id long").limit(1).collect()

    qs = all_queries()
    out: dict = {}
    sc = spark.sparkContext
    for name in keys:
        times, jobs = [], []
        for rep in range(reps):
            unpersist_all(spark)
            group = f"{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = qs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        out[name] = {"median_sec": statistics.median(times),
                     "times": times, "jobs": jobs}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
