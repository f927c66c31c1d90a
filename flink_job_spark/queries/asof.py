"""Point-in-time (as-of) join query over the `events` table.

For every purchase event, the user's most recent click at or before the
purchase instant — the canonical point-in-time feature-assembly shape (no
leakage from the future). The oracle uses DuckDB's native ASOF LEFT JOIN;
the Spark side is the scalable union-merge operator (operators/asof.py).
The click side is deduplicated to one row per (user_id, ts) — keep max
event_id — so tie behavior is deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_job_spark.operators.asof import asof_join
from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table


@register(
    "q_asof_join",
    """WITH clicks AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                MAX(event_id) AS click_id
         FROM events WHERE event_type = 'click' GROUP BY 1, 2
       ),
       purch AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id AS purchase_id
         FROM events WHERE event_type = 'purchase'
       )
       SELECT p.purchase_id, p.user_id,
              p.ts AS purchase_ts,
              c.ts AS click_ts,
              c.click_id,
              epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       FROM purch p ASOF LEFT JOIN clicks c
         ON p.user_id = c.user_id AND p.ts >= c.ts""",
    doc="as-of join: each purchase + the user's most recent click at or before "
        "it (union-merge plan, one shuffle; DuckDB native ASOF oracle)",
    tags=("asof", "join", "streaming"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", "ts")
    )
    joined = asof_join(purchases, clicks, key="user_id",
                       right_payload=["click_id"], prefix="click_")
    return joined.select(
        "purchase_id", "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("click_ts"),
        "click_click_id",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("click_ts").cast("timestamp"))).alias("gap_us"),
    ).withColumnRenamed("click_click_id", "click_id")
