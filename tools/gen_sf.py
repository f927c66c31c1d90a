"""Scale up the driver testdata deterministically (VERDICT r3 item 3).

Produces an sf1-equivalent dataset (default 10x sf0.1 — ~6M lineitem rows)
by replicating every table with key-space offsets, so that join fan-outs,
group cardinalities per key, and selectivities all match the source scale
factor — the growth profile a real 10x corpus has, not 10 copies of the
same keys:

- fact/dim keys shift by replica * 10^ceil(log10(max_key+1)) consistently
  across tables (orders.o_custkey moves WITH customer.c_custkey), so every
  join matches exactly as in the source replica.
- documents text is per-word replica-prefixed (replica 0 verbatim): shingle
  sets stay disjoint across replicas, so dedup pair structure grows
  LINEARLY (10 copies of identical text would grow candidate pairs
  quadratically and change the workload, not the scale).
- embeddings are hash-perturbed per (vec_id, dim, replica): no cross-replica
  exact duplicates, cosine-neighbor structure per replica preserved.
- region/nation stay fixed (they are bounded dimensions at every TPC-H sf).

Usage:
    python tools/gen_sf.py                # 10x sf0.1 -> /tmp/sfdata_sf1
Env: GEN_SF_SRC=/root/testdata/sf0.1  GEN_SF_DST=/tmp/sfdata_sf1  GEN_SF_R=10

Then: SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 python bench.py
and   python tools/record_sf_scale.py BENCH_FULL.json   (slope table).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from flink_job_spark.session import get_spark  # noqa: E402
from flink_job_spark.sources.tables import load_table  # noqa: E402

SRC = os.environ.get("GEN_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("GEN_SF_DST", "/tmp/sfdata_sf1")
R = int(os.environ.get("GEN_SF_R", "10"))


def key_span(df: DataFrame, col: str) -> int:
    mx = df.agg(F.max(col)).collect()[0][0] or 0
    return 10 ** math.ceil(math.log10(mx + 2))


def replicate(df: DataFrame, r_expr) -> DataFrame:
    """Cross-join with the replica range; r_expr(replica_col) -> column map."""
    spark = df.sparkSession
    reps = spark.range(R).withColumnRenamed("id", "__r")
    out = df.crossJoin(reps)
    for name, col in r_expr(F.col("__r")).items():
        out = out.withColumn(name, col)
    return out.drop("__r")


def main() -> None:
    spark = get_spark("gen-sf", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    t = {n: load_table(spark, SRC, n) for n in
         ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]}
    kc = key_span(t["customer"], "c_custkey")
    ks = key_span(t["supplier"], "s_suppkey")
    kp = key_span(t["part"], "p_partkey")
    ko = key_span(t["orders"], "o_orderkey")
    ke = key_span(t["events"], "event_id")
    ku = key_span(t["events"], "user_id")
    kd = key_span(t["documents"], "doc_id")
    kv = key_span(t["embeddings"], "vec_id")

    def write(name: str, df: DataFrame, parts: int) -> None:
        df.repartition(parts).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet")
        print(f"{name}: written", flush=True)

    write("region", t["region"], 1)
    write("nation", t["nation"], 1)
    write("customer", replicate(t["customer"], lambda r: {
        "c_custkey": F.col("c_custkey") + r * kc,
        "c_name": F.when(r == 0, F.col("c_name"))
                   .otherwise(F.concat("c_name", F.lit("#r"), r)),
    }), 8)
    write("supplier", replicate(t["supplier"], lambda r: {
        "s_suppkey": F.col("s_suppkey") + r * ks,
        "s_name": F.when(r == 0, F.col("s_name"))
                   .otherwise(F.concat("s_name", F.lit("#r"), r)),
    }), 4)
    write("part", replicate(t["part"], lambda r: {
        "p_partkey": F.col("p_partkey") + r * kp,
        "p_name": F.when(r == 0, F.col("p_name"))
                   .otherwise(F.concat("p_name", F.lit(" r"), r)),
    }), 8)
    write("orders", replicate(t["orders"], lambda r: {
        "o_orderkey": F.col("o_orderkey") + r * ko,
        "o_custkey": F.col("o_custkey") + r * kc,
    }), 16)
    write("lineitem", replicate(t["lineitem"], lambda r: {
        "l_orderkey": F.col("l_orderkey") + r * ko,
        "l_partkey": F.col("l_partkey") + r * kp,
        "l_suppkey": F.col("l_suppkey") + r * ks,
    }), 32)
    write("events", replicate(t["events"], lambda r: {
        "event_id": F.col("event_id") + r * ke,
        "user_id": F.col("user_id") + r * ku,
    }), 16)
    write("documents", replicate(t["documents"], lambda r: {
        "doc_id": F.col("doc_id") + r * kd,
        "text": F.when(r == 0, F.col("text")).otherwise(
            F.expr("array_join(transform(split(text, ' '), "
                   "w -> concat('r', CAST(__r AS STRING), w)), ' ')")),
        "n_chars": F.when(r == 0, F.col("n_chars")).otherwise(
            F.length(F.expr("array_join(transform(split(text, ' '), "
                            "w -> concat('r', CAST(__r AS STRING), w)), ' ')"))
            .cast("long")),
    }), 8)
    write("embeddings", replicate(t["embeddings"], lambda r: {
        "vec_id": F.col("vec_id") + r * kv,
        "embedding": F.when(r == 0, F.col("embedding")).otherwise(
            F.expr("transform(embedding, (x, i) -> x + CAST("
                   "(pmod(xxhash64(vec_id, i, __r), 1000) - 500) AS DOUBLE)"
                   " / 10000.0)")),
    }), 4)

    for n in ["lineitem", "orders", "events", "documents", "embeddings"]:
        print(n, spark.read.parquet(f"{DST}/{n}.parquet").count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
