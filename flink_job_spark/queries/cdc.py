"""CDC change-stream application → latest-state snapshot.

The reference's tech envelope reserves Debezium-style CDC slots (op, ts_ms,
source_ts_ms — mis:88-91; the snapshot path stamps op='INITIAL' only). This
operator completes that surface: given a keyed change stream with I/U/D
operations, produce the current state per key — keep each key's LAST change
in (ts, event_id) order unless that change is a delete.

Spark shape: one window over the key (single shuffle on user_id), rank by the
total change order descending, keep rn=1, drop deletes. At 100 TB this is the
standard "compact a CDC topic" plan: partition by key, no broadcast, no
driver state; in streaming the same semantics run as
``dropDuplicates``/max-ts ``applyInPandasWithState`` (see streaming/).

The `events` table plays the change stream: signup→I, error→D, others→U,
totally ordered per user by (ts, event_id) (unique in the testdata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

_OP = "CASE WHEN event_type = 'signup' THEN 'I' WHEN event_type = 'error' THEN 'D' ELSE 'U' END"


@register(
    "q_cdc_apply",
    f"""WITH changes AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             {_OP} AS op, value
      FROM events
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM changes
    )
    SELECT user_id, ts AS last_ts, op AS last_op, value AS last_value
    FROM ranked WHERE rn = 1 AND op <> 'D'""",
    doc="apply a keyed I/U/D change stream: latest non-delete state per key "
        "(one key-partitioned window, Debezium-slot semantics of mis:88-91)",
    tags=("cdc", "window"),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    changes = e.select(
        "user_id", "ts", "event_id",
        F.expr(_OP).alias("op"), "value",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", F.col("ts").alias("last_ts"),
                F.col("op").alias("last_op"), F.col("value").alias("last_value"))
    )
