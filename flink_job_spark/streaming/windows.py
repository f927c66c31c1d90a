"""Streaming windowed aggregations + dedup with event-time watermarks.

These wrap the SAME aggregation expressions as the batch window queries
(flink_job_spark.queries.windows) — batch is the oracle for the streaming
path. Unlike the reference's frozen snapshot 'watermark' (a cutoff literal,
SURVEY §2.7 #39), these are true event-time watermarks bounding state for
late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks require TIMESTAMP (not NTZ); under a UTC session the cast is
    value-preserving. Window bounds are cast back to NTZ downstream so the
    streaming output schema equals the batch twin's."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def stream_tumbling_agg(events: DataFrame, window: str = "1 hour",
                        watermark: str = "1 hour") -> DataFrame:
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


def stream_sliding_agg(events: DataFrame, window: str = "1 hour",
                       slide: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "n_events", "sum_value",
        )
    )


def stream_session_agg(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """State-bounded streaming dedup: first event per key within the watermark
    horizon (`dropDuplicatesWithinWatermark` — state is purged as the
    watermark advances, so this runs forever at 100 TB/day)."""
    return (
        _with_event_time(events).withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys or ["user_id", "event_type"])
    )


def stream_enrich_join(events: DataFrame, dim: DataFrame,
                       on: str) -> DataFrame:
    """Stream-static enrichment join: every micro-batch of the stream joins
    against the (batch) dimension table, re-read per batch — the streaming
    analog of the broadcast star join. No hint: Spark broadcasts the dim
    side when it is under autoBroadcastJoinThreshold and falls back to a
    shuffle join for an oversized dim (a forced broadcast would OOM instead);
    the stream side needs no watermark (no state is kept: the static side is
    re-evaluated each batch, so slowly-changing dims are picked up
    automatically)."""
    return events.join(dim, on, "left")


def stream_interval_join(left: DataFrame, right: DataFrame, key: str,
                         lower: str = "0 seconds",
                         upper: str = "10 minutes",
                         watermark: str = "1 hour",
                         exclude_same_id: bool = False) -> DataFrame:
    """Watermarked stream-stream interval join — Flink's interval join,
    spelled Structured-Streaming-native: both sides watermark their event
    time, the join condition is an equi-key plus a bounded time range
    (r.ts ∈ [l.ts − lower … l.ts + upper]), and the range bound + watermark
    let Spark EXPIRE buffered state — without the bound a stream-stream join
    buffers forever. State per key is O(events inside the interval window).

    ``exclude_same_id`` drops pairs with equal event_ids — ONLY correct for
    self-joins (two independent streams may legitimately share id values and
    must keep those matches).

    Output columns: key (under its own name), l_event_id, l_ts, r_event_id,
    r_ts."""
    l = (left.withColumn("ts", F.col("ts").cast("timestamp"))
             .withWatermark("ts", watermark)
             .select(F.col(key).alias("k"),
                     F.col("event_id").alias("l_event_id"),
                     F.col("ts").alias("l_ts")))
    r = (right.withColumn("ts", F.col("ts").cast("timestamp"))
              .withWatermark("ts", watermark)
              .select(F.col(key).alias("k"),
                      F.col("event_id").alias("r_event_id"),
                      F.col("ts").alias("r_ts")))
    cond = (
        (l["k"] == r["k"])
        & (r["r_ts"] >= l["l_ts"] - F.expr(f"INTERVAL {lower}"))
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {upper}"))
    )
    if exclude_same_id:
        cond = cond & (l["l_event_id"] != r["r_event_id"])
    return (l.join(r, cond)
             .select(l["k"].alias(key), "l_event_id", "l_ts",
                     "r_event_id", "r_ts"))


def stream_ohlc_agg(events: DataFrame, window: str = "1 hour",
                    watermark: str = "1 hour",
                    event_type: str = "purchase") -> DataFrame:
    """Streaming OHLC bars — the event-time twin of queries/insights.py's
    q_ohlc_bars, emitted per watermark-closed hour.

    open/close need the first/last value in event-time order, which a
    streaming aggregate can't get from a rank (no windows over unbounded
    streams): min_by/max_by over a TOTAL-ORDER key do it in O(1) state per
    bar. The key packs (µs-within-WINDOW, event_id) into one BIGINT —
    micros-within-window × 10^7 + event_id — which orders exactly like the
    batch twin's (ts, event_id) rank inside an epoch-aligned window (valid
    while event_id < 10^7 per bar; widen the multiplier with the id
    domain). The modulus is derived from the ``window`` argument — a
    hard-coded hour would silently invert open/close for any other bar
    width. high/low/count are plain aggregates. All values pass through
    unchanged (no arithmetic), so stream ≡ batch bit-for-bit."""
    import pandas as pd

    win_us = int(pd.Timedelta(window).value // 1000)
    if win_us * 10_000_000 >= 2 ** 63:
        raise ValueError(f"window {window!r} too wide for the packed "
                         "ordering key (max ~10 days)")
    e = (_with_event_time(events)
         .filter(F.col("event_type") == event_type))
    okey = ((F.unix_micros(F.col("ts")) % F.lit(win_us))
            * F.lit(10_000_000) + F.col("event_id"))
    return (
        e.withWatermark("ts", watermark)
         .groupBy(F.window("ts", window).alias("w"))
         .agg(F.min_by("value", okey).alias("open"),
              F.max("value").alias("high"),
              F.min("value").alias("low"),
              F.max_by("value", okey).alias("close"),
              F.count(F.lit(1)).cast("bigint").alias("n_trades"))
         .select(F.col("w.start").cast("timestamp_ntz").alias("hour"),
                 "open", "high", "low", "close", "n_trades")
    )
