"""Skew A/B evidence harness (VERDICT r2 item 7).

Generates a deliberately skewed fact table — ONE key owning 50% of the rows —
at ~100x the bench input size (60M rows vs lineitem sf0.1's 600k; SKEW_AB_N
overrides), materializes
it to parquet so every variant reads identical bytes, and wall-clocks the
naive vs structural-skew-mitigation plan for three workload shapes:

1. combine-INEFFECTIVE agg (exact count_distinct by the hot key): the shape
   salting exists for — the hot key's raw (key, value) pairs all land on one
   reducer in the naive plan.
2. combine-EFFECTIVE agg (sum by the hot key): the shape salting is NOT for —
   map-side partial aggregation already collapses the hot key to one row per
   map task; the salted variant pays an extra shuffle for nothing. Recorded
   to document WHEN to reach for the tool.
3. big-big join on the skewed key (2M-row dim, above broadcast threshold):
   naive with AQE skew-join OFF vs ON vs hot_key_split_join (structural
   isolation that also works where AQE cannot apply, e.g. streaming).

Usage:  python tools/skew_ab.py          # prints one JSON line per variant
Results are recorded in BASELINE.md ("Skew A/B evidence"). Run in isolation
(no concurrent Spark processes), like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_job_spark.operators.skew import hot_key_split_join, salted_agg  # noqa: E402
from flink_job_spark.session import get_spark, unpersist_all  # noqa: E402

N_FACT = int(os.environ.get("SKEW_AB_N", 60_000_000))  # default 100x lineitem sf0.1
N_COLD_KEYS = 100_000
N_DIM = 2_000_000        # above the 10 MB autoBroadcast threshold
HOT_KEY = 0


def materialize(spark, base: str) -> tuple[str, str]:
    fact_path, dim_path = f"{base}/fact", f"{base}/dim"
    if not os.path.exists(f"{base}/_done"):
        hot = spark.range(N_FACT // 2).select(
            F.lit(HOT_KEY).alias("k"), F.col("id").alias("v"),
            (F.col("id") % 1000).alias("w"))
        cold = spark.range(N_FACT // 2).select(
            (F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS)) + 1).alias("k"),
            F.col("id").alias("v"), (F.col("id") % 1000).alias("w"))
        hot.unionByName(cold).repartition(32).write.mode("overwrite").parquet(fact_path)
        spark.range(N_DIM).select(
            F.col("id").alias("k"),
            F.concat(F.lit("attr-"), F.col("id")).alias("attr")
        ).repartition(16).write.mode("overwrite").parquet(dim_path)
        open(f"{base}/_done", "w").write("ok")
    return fact_path, dim_path


def timed(spark, label, df):
    unpersist_all(spark)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"variant": label, "sec": dt}))
    return dt


def main():
    spark = get_spark("skew-ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    base = os.environ.get("SKEW_AB_DIR", "/tmp/skew_ab")
    os.makedirs(base, exist_ok=True)
    fact_path, dim_path = materialize(spark, base)
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)

    # sanity: the two distinct-agg variants agree (hash-sum over results)
    a = fact.groupBy("k").agg(F.countDistinct("v").alias("nd"))
    b = salted_agg(fact, ["k"], "v", {"nd": F.countDistinct("v")})
    ha = a.agg(F.expr("bit_xor(xxhash64(k, nd))")).first()[0]
    hb = b.agg(F.expr("bit_xor(xxhash64(k, nd))")).first()[0]
    assert ha == hb, "salted distinct-agg diverges from naive"
    unpersist_all(spark)

    timed(spark, "agg_distinct_naive",
          fact.groupBy("k").agg(F.countDistinct("v").alias("nd")))
    timed(spark, "agg_distinct_salted",
          salted_agg(fact, ["k"], "v", {"nd": F.countDistinct("v")}))
    timed(spark, "agg_sum_naive",
          fact.groupBy("k").agg(F.sum("v").alias("s")))
    timed(spark, "agg_sum_salted",
          salted_agg(fact, ["k"], "w", {"s": F.sum("v")}))

    join_cols = [F.count(F.lit(1)).alias("n"),
                 F.expr("bit_xor(xxhash64(attr))").alias("h")]
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timed(spark, "join_naive_aqe_skew_off",
          fact.join(dim, "k").agg(*join_cols))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timed(spark, "join_naive_aqe_skew_on",
          fact.join(dim, "k").agg(*join_cols))
    timed(spark, "join_hot_key_split",
          hot_key_split_join(fact, dim, "k", [HOT_KEY]).agg(*join_cols))

    # sanity: split join row-count equals naive join
    n1 = fact.join(dim, "k").count()
    n2 = hot_key_split_join(fact, dim, "k", [HOT_KEY]).count()
    assert n1 == n2, (n1, n2)
    print(json.dumps({"join_rows": n1}))
    spark.stop()


if __name__ == "__main__":
    main()
