"""Range (interval-containment) join — point-in-interval without a cross join.

Joining points to containing intervals with a raw ``BETWEEN`` predicate gives
Spark a BroadcastNestedLoopJoin (every point × every interval per key). The
scalable form bucketizes time:

1. pick a bucket width; explode each interval into the buckets it overlaps
   (intervals spanning b buckets produce b rows — bounded by
   interval_length/width),
2. map each point to its single bucket,
3. equi-join on (key, bucket) — hash shuffle, partition-prunable —
4. re-check exact containment to discard same-bucket near-misses.

Candidate volume scales with points + interval-bucket coverage, never
points × intervals. The width trades replication (long intervals → many
buckets) against selectivity (wide buckets → more false candidates); set it
near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 1800,
    closed_end: bool = False,
) -> DataFrame:
    """All (point, interval) pairs with same ``key`` and
    start <= point_ts < end (``closed_end=True`` makes the end inclusive).

    Output: all point columns + all interval columns (minus the duplicate key).
    """
    p_bucket = F.floor(F.unix_timestamp(F.col(point_ts).cast("timestamp"))
                       / bucket_seconds).alias("__bucket")
    p = points.select("*", p_bucket)

    s_bucket = F.floor(F.unix_timestamp(F.col(start_col).cast("timestamp"))
                       / bucket_seconds)
    e_bucket = F.floor(F.unix_timestamp(F.col(end_col).cast("timestamp"))
                       / bucket_seconds)
    iv = intervals.select(
        "*", F.explode(F.sequence(s_bucket, e_bucket)).alias("__iv_bucket")
    ).withColumnRenamed(key, "__iv_key")

    end_pred = (F.col(point_ts) <= F.col(end_col)) if closed_end \
        else (F.col(point_ts) < F.col(end_col))
    joined = p.join(
        iv,
        (F.col(key) == F.col("__iv_key")) & (F.col("__bucket") == F.col("__iv_bucket")),
    )
    return (
        joined
        .filter((F.col(start_col) <= F.col(point_ts)) & end_pred)
        .drop("__bucket", "__iv_bucket", "__iv_key")
    )
