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


# --- gap-based sessionization with event-time timeout --------------------------------

SESSION_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
])

# state: the one still-open session for this user
SESSION_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("end_us", T.LongType()),
    T.StructField("n", T.LongType()),
])

SESSION_GAP_SECONDS = 30 * 60


def _us(series: pd.Series) -> pd.Series:
    return series.astype("datetime64[us]").astype("int64")


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Emit every session CLOSED in this call; keep the open one in state.

    A session closes two ways: (a) a later event for the same user arrives
    more than the gap after the session's end (detected inline on the sorted
    batch), or (b) the event-time watermark passes end+gap with no new event
    (state timeout fires → flush). Timeout keeps state bounded: every idle
    user's state is dropped exactly one gap after their last event."""
    gap_us = SESSION_GAP_SECONDS * 1_000_000

    if state.hasTimedOut:
        start_us, end_us, n = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [key[0]],
            "session_start": pd.to_datetime([start_us], unit="us"),
            "session_end": pd.to_datetime([end_us], unit="us"),
            "n_events": [n],
        })
        return

    times: list[int] = []
    for pdf in pdfs:
        if len(pdf):
            times.extend(_us(pdf["ts"]).tolist())
    times.sort()

    if state.exists:
        start_us, end_us, n = state.get
    else:
        start_us = end_us = times[0]
        n = 0
        times = times  # first event still counted in the loop below

    closed = []
    for t in times:
        if t - end_us > gap_us and n > 0:
            closed.append((start_us, end_us, n))
            start_us, n = t, 0
        end_us = max(end_us, t)
        n += 1

    state.update((start_us, end_us, n))
    # wake up when the watermark passes the open session's close boundary
    state.setTimeoutTimestamp(end_us // 1000 + SESSION_GAP_SECONDS * 1000)

    if closed:
        yield pd.DataFrame({
            "user_id": [key[0]] * len(closed),
            "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
            "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
            "n_events": [c[2] for c in closed],
        })


def stream_sessionize(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessionization as a custom stateful operator: one open
    session per user in the state store (three scalars — O(active users)
    memory), closed sessions emitted exactly once, idle state reclaimed by
    EventTimeTimeout. This is the classic semantics F.session_window cannot
    express when you need the CLOSED-session event stream (not a windowed
    aggregate) — e.g. to feed a downstream funnel join."""
    with_time = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        with_time.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --- streaming EMA: sequential recurrence carried across micro-batches ---------------

EMA_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("ema", T.DoubleType()),
])
# (last ema) — one double per active user
EMA_STATE_SCHEMA = T.StructType([
    T.StructField("ema", T.DoubleType()),
])


def _ema_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Continue the alpha=1/2 halving recurrence from state: the batch twin
    (queries/analytics.py::q_ema_pandas) computes the identical sequence in
    one group scan; here the accumulator survives micro-batch boundaries,
    so streaming over time-ordered arrivals reproduces the batch answer
    bit-for-bit (same IEEE adds, same exact halvings)."""
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows).sort_values(["ts", "event_id"]).reset_index(drop=True)
    acc = state.get[0] if state.exists else None
    out = []
    for x in pdf["value"]:
        acc = float(x) if acc is None else (float(x) + acc) / 2
        out.append(acc)
    pdf["ema"] = out
    state.update((acc,))
    yield pdf[["user_id", "event_id", "ts", "value", "ema"]]


def stream_ema(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-user EMA as a custom stateful streaming operator: one double of
    state per active user, every event emitted exactly once with its
    smoothed value. The sequential recurrence is the op Structured
    Streaming's built-in windows cannot express — exactly why
    applyInPandasWithState exists. Correct only for per-user time-ordered
    arrival (the smoother is order-sensitive by definition); late events
    would need the asof-style union-merge replay instead."""
    with_time = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        with_time.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _ema_update,
            outputStructType=EMA_OUTPUT_SCHEMA,
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming CUSUM: numeric recurrence state carried across micro-batches ---------

# imported from the batch operator so stream/batch bit-identity cannot be
# broken by retuning one side (queries/analytics.py is the single source)
from flink_job_spark.queries.analytics import CUSUM_H, CUSUM_REF  # noqa: E402

CUSUM_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("cusum", T.DoubleType()),
    T.StructField("alarm", T.BooleanType()),
])

CUSUM_STATE_SCHEMA = T.StructType([
    T.StructField("acc", T.DoubleType()),
])


def _update_cusum(key, pdfs, state: GroupState):
    """Continue the per-user max(0, s + (x - k)) recurrence from GroupState.

    State is ONE double per key — the smallest possible stateful footprint —
    and the emitted per-row statistic is bit-identical to the batch operator
    (queries/analytics.py::q_cusum) as long as the source delivers each
    key's rows in event-time order across micro-batches (within a batch,
    rows are sorted here). A production deployment would add a watermark +
    EventTimeTimeout to retire silent keys, exactly as _sessionize does."""
    (acc,) = state.get if state.exists else (0.0,)
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"]).reset_index(drop=True)
    out = []
    for x in rows["value"]:
        acc = max(0.0, acc + (float(x) - CUSUM_REF))
        out.append(acc)
    state.update((acc,))
    yield pd.DataFrame({
        "user_id": rows["user_id"],
        "event_id": rows["event_id"],
        "cusum": out,
        "alarm": [c > CUSUM_H for c in out],
    })


def stream_cusum(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id, event_id, ts, value)."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_cusum,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming count windows: Flink countWindow across micro-batches ----------------

from flink_job_spark.queries.windows import COUNT_WINDOW_N  # noqa: E402

COUNTWIN_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("win_idx", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("win_start", T.TimestampType()),
    T.StructField("win_end", T.TimestampType()),
    T.StructField("value_cents", T.LongType()),
])

# (next window index, fill count, cents sum, min/max event-time micros)
COUNTWIN_STATE_SCHEMA = T.StructType([
    T.StructField("win_idx", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("cents", T.LongType()),
    T.StructField("min_us", T.LongType()),
    T.StructField("max_us", T.LongType()),
])


def _count_window_update(key, pdfs: Iterator[pd.DataFrame],
                         state: GroupState):
    """Fill the open window from state; every time it reaches
    COUNT_WINDOW_N rows, emit it closed and start the next. Only CLOSED
    windows are emitted (Flink's countWindow trigger); the partial tail
    stays in state — the batch twin's trailing-partial rows are the one
    intended difference, excluded in the equivalence test. cents arrive
    pre-computed by the JVM cents idiom, so the sums are the same exact
    integers as the batch plan's."""
    win_idx, n, cents, min_us, max_us = (
        state.get if state.exists else (0, 0, 0, None, None))
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows).sort_values(["ts", "event_id"]).reset_index(drop=True)
    (uid,) = key
    out = []
    for ts, c in zip(pdf["ts"], pdf["cents"]):
        us = int(pd.Timestamp(ts).value) // 1000
        n += 1
        cents += int(c)
        min_us = us if min_us is None else min(min_us, us)
        max_us = us if max_us is None else max(max_us, us)
        if n == COUNT_WINDOW_N:
            out.append((uid, win_idx, n,
                        pd.Timestamp(min_us * 1000),
                        pd.Timestamp(max_us * 1000), cents))
            win_idx, n, cents, min_us, max_us = win_idx + 1, 0, 0, None, None
    state.update((win_idx, n, cents, min_us, max_us))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "win_idx", "n_events",
                                         "win_start", "win_end",
                                         "value_cents"])


def stream_count_windows(events: DataFrame) -> DataFrame:
    """Flink countWindow(N) as a custom stateful operator: windows close
    by ELEMENT COUNT, which no built-in Structured Streaming window
    expresses (time/session windows only) — the state is five scalars per
    active user. The cents projection runs JVM-side BEFORE the Python
    operator so the streamed sums are the identical exact integers as the
    batch q_count_windows plan. Requires per-user time-ordered arrival,
    like every sequential operator in this module."""
    from flink_job_spark.queries.analytics import cents_col
    with_cents = (events
                  .withColumn("ts", F.col("ts").cast("timestamp"))
                  .withColumn("cents", cents_col(F.col("value"))))
    return (
        with_cents
        .groupBy("user_id")
        .applyInPandasWithState(
            _count_window_update,
            outputStructType=COUNTWIN_OUTPUT_SCHEMA,
            stateStructType=COUNTWIN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- streaming CEP: strict-contiguity pattern match across micro-batches ------------

from flink_job_spark.queries.behavior import CEP_GAP_DAYS  # noqa: E402

CEP_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("click1_ts", T.TimestampType()),
    T.StructField("click2_ts", T.TimestampType()),
    T.StructField("purchase_ts", T.TimestampType()),
])

# the last two events per user: (type, event-time micros) x 2
CEP_STATE_SCHEMA = T.StructType([
    T.StructField("t1", T.StringType()),
    T.StructField("us1", T.LongType()),
    T.StructField("t2", T.StringType()),
    T.StructField("us2", T.LongType()),
])

_CEP_GAP_US = CEP_GAP_DAYS * 86400 * 1_000_000


def _cep_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Strict contiguity needs exactly the previous TWO events per user in
    state (the Flink CEP NFA for a 3-step next()-pattern is a 2-slot
    buffer): on each arrival, match (click, click, purchase) against
    (buf1, buf2, current) with the per-step time bounds, emit the match,
    then shift the buffer. Identical matches to the batch key's two-lead
    window for per-user time-ordered arrival."""
    t1, us1, t2, us2 = state.get if state.exists else (None, None, None, None)
    rows = [pdf for pdf in pdfs if len(pdf)]
    if not rows:
        return
    pdf = pd.concat(rows).sort_values(["ts", "event_id"]).reset_index(drop=True)
    (uid,) = key
    out = []
    for et, ts in zip(pdf["event_type"], pdf["ts"]):
        us = int(pd.Timestamp(ts).value) // 1000
        if (t1 == "click" and t2 == "click" and et == "purchase"
                and us2 is not None and us1 is not None
                and us2 <= us1 + _CEP_GAP_US and us <= us2 + _CEP_GAP_US):
            out.append((uid, pd.Timestamp(us1 * 1000),
                        pd.Timestamp(us2 * 1000), pd.Timestamp(us * 1000)))
        t1, us1, t2, us2 = t2, us2, et, us
    state.update((t1, us1, t2, us2))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "click1_ts",
                                         "click2_ts", "purchase_ts"])


def stream_cep_pattern(events: DataFrame) -> DataFrame:
    """Flink-CEP-style pattern matching as a custom stateful operator:
    the batch twin (queries/behavior.py::q_cep_pattern) expresses strict
    contiguity with two lead()s; streaming keeps a 2-event buffer per
    user in GroupState so matches close across micro-batch boundaries —
    the smallest NFA state a next()-chain needs. Requires per-user
    time-ordered arrival like every sequential operator here."""
    with_time = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        with_time
        .groupBy("user_id")
        .applyInPandasWithState(
            _cep_update,
            outputStructType=CEP_OUTPUT_SCHEMA,
            stateStructType=CEP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
