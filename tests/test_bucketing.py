"""Bucketed co-located join: pre-shuffling both sides into matching buckets
removes the per-query Exchange — THE layout lever for repeated large joins
at 100 TB (pay the shuffle once at write time, never at read time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_job_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped afterwards
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    (orders.write.mode("overwrite").format("parquet")
           .bucketBy(8, "o_custkey").sortBy("o_custkey")
           .saveAsTable("orders_b"))
    (cust.withColumnRenamed("c_custkey", "o_custkey")
         .write.mode("overwrite").format("parquet")
         .bucketBy(8, "o_custkey").sortBy("o_custkey")
         .saveAsTable("customer_b"))
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, ct = bucketed_tables
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ot).join(spark.table(ct), "o_custkey")
        jvm = joined.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        p = joined._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in p, p
        assert "Exchange hashpartitioning" not in p, (
            f"bucketed join still shuffles:\n{p}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    ot, ct = bucketed_tables
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer") \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain_n = orders.join(cust, "o_custkey").count()
    bucketed_n = spark.table(ot).join(spark.table(ct), "o_custkey").count()
    assert bucketed_n == plain_n
    agg = (spark.table(ot).join(spark.table(ct), "o_custkey")
           .agg(F.sum("o_totalprice").cast("decimal(18,2)").alias("s")).first()["s"])
    agg_plain = (orders.join(cust, "o_custkey")
                 .agg(F.sum("o_totalprice").cast("decimal(18,2)").alias("s")).first()["s"])
    assert agg == agg_plain
