"""Sketch operators: approximate aggregates with their exact twins inline.

HLL++ (approx_count_distinct) and KLL-style quantile sketches
(approx_percentile) are the constant-memory aggregates a 100 TB pipeline uses
where exact distinct/percentile would need a full shuffle of distinct values.
Sketch estimates are engine-specific (DuckDB's approx_* uses different
internals), so these keys are registered rows-only — but each query returns
the EXACT value next to the estimate plus the relative error, making every
row self-evidencing; tests assert the error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

HLL_RSD = 0.02  # target relative standard deviation for approx_count_distinct


@register(
    "q_approx_distinct",
    None,  # HLL sketch estimates are engine-specific — rows-only, self-evidencing
    doc="HLL++ approximate distinct users per event_type, exact twin + relative "
        "error inline (constant-memory vs full distinct shuffle)",
    tags=("sketch", "agg"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_distinct"),
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_distinct"),
        )
        .select(
            "event_type", "exact_distinct", "approx_distinct",
            (F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
             / F.col("exact_distinct")).alias("rel_err"),
        )
    )


@register(
    "q_approx_quantiles",
    None,  # quantile sketches are engine-specific — rows-only, self-evidencing
    doc="approx_percentile sketch of event values (p50/p95/p99) with exact "
        "percentile twins and absolute errors inline",
    tags=("sketch", "agg"),
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.agg(
        F.expr("approx_percentile(value, array(0.5, 0.95, 0.99), 10000)").alias("ap"),
        F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("ep"),
    )
    return agg.select(
        F.col("ap")[0].alias("approx_p50"), F.col("ep")[0].alias("exact_p50"),
        F.col("ap")[1].alias("approx_p95"), F.col("ep")[1].alias("exact_p95"),
        F.col("ap")[2].alias("approx_p99"), F.col("ep")[2].alias("exact_p99"),
        (F.abs(F.col("ap")[0] - F.col("ep")[0])).alias("err_p50"),
        (F.abs(F.col("ap")[1] - F.col("ep")[1])).alias("err_p95"),
        (F.abs(F.col("ap")[2] - F.col("ep")[2])).alias("err_p99"),
    )
