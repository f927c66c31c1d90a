"""Windowed aggregations + dedup over the `events` stream table.

The reference has no windows (SURVEY §2.7 #43 — explicitly absent); these are
the Structured-Streaming-shaped extensions from the north star. Implemented
here as BATCH DataFrame plans (window()/session_window() work identically in
batch and streaming — the streaming wrappers in flink_job_spark.streaming
reuse these same expressions with watermarks).

Determinism notes for the oracle:
- double sums are order-dependent across engines → aggregate in DECIMAL(18,6)
  (exact, associative), cast the final sum back to DOUBLE.
- Spark window() buckets are epoch-aligned; DuckDB time_bucket is
  2000-01-01-aligned — identical for divisors of a day (1h, 30m used here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


# --- q_window_tumbling -------------------------------------------------------------

@register(
    "q_window_tumbling",
    """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
              time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) + INTERVAL '1 hour' AS window_end,
              event_type,
              COUNT(1) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       FROM events
       GROUP BY 1, 2, 3""",
    doc="tumbling 1h window: count + exact-decimal sum per event_type",
    tags=("window", "streaming"),
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )


# --- q_window_sliding ---------------------------------------------------------------

@register(
    "q_window_sliding",
    """WITH assigned AS (
         SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                  - k * INTERVAL '30 minutes' AS window_start,
                value
         FROM events, (SELECT unnest([0, 1]) AS k)
       )
       SELECT window_start,
              window_start + INTERVAL '1 hour' AS window_end,
              COUNT(1) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       FROM assigned
       GROUP BY 1, 2""",
    doc="sliding window 1h/30m: each event in 2 overlapping windows",
    tags=("window", "streaming"),
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events", "sum_value",
        )
    )


# --- q_session_window ------------------------------------------------------------------

@register(
    "q_session_window",
    f"""WITH flagged AS (
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                CASE WHEN CAST(ts AS TIMESTAMP)
                          - lag(CAST(ts AS TIMESTAMP), 1, TIMESTAMP '1970-01-01')
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '{SESSION_GAP_MIN} minutes'
                     THEN 1 ELSE 0 END AS new_session
         FROM events
       ),
       islands AS (
         SELECT user_id, ts,
                SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged
       )
       SELECT user_id,
              MIN(ts) AS session_start,
              MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS session_end,
              COUNT(1) AS n_events
       FROM islands GROUP BY user_id, session_id""",
    doc=f"session windows per user, {SESSION_GAP_MIN}-minute inactivity gap "
        "(Spark session_window ≡ gaps-and-islands oracle)",
    tags=("window", "streaming", "session"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# --- q_group_topk: top-k per group --------------------------------------------------

GROUP_TOPK = 3

@register(
    "q_group_topk",
    f"""WITH totals AS (
          SELECT event_type, user_id,
                 CAST(COUNT(1) AS BIGINT) AS n_events,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
          FROM events GROUP BY event_type, user_id
        )
        SELECT event_type, user_id, n_events, total_value,
               CAST(rank AS BIGINT) AS rank
        FROM (
          SELECT *, row_number() OVER (PARTITION BY event_type
                                       ORDER BY total_value DESC, user_id) AS rank
          FROM totals
        ) WHERE rank <= {GROUP_TOPK}""",
    doc=f"grouped top-{GROUP_TOPK}: highest-value users per event_type "
        "(partial-agg groupBy, then a rank window over the small aggregate)",
    tags=("topk", "window", "agg"),
)
def q_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank window runs over the AGGREGATE (|groups| × |users| rows), not
    the raw events — at 100 TB the heavy input is reduced by the combine-
    enabled groupBy first and only the small per-user totals are windowed.
    Value sums aggregate in DECIMAL(18,6) (exact, associative) so the ranking
    order is engine-independent."""
    e = load_table(spark, sf_dir, "events")
    totals = (
        e.groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("total_value"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id"))
    return (totals.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= GROUP_TOPK))


# --- q_range_join: point-in-interval containment at scale -----------------------------

@register(
    "q_range_join",
    f"""WITH flagged AS (
         SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                CASE WHEN CAST(ts AS TIMESTAMP)
                          - lag(CAST(ts AS TIMESTAMP), 1, TIMESTAMP '1970-01-01')
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '{SESSION_GAP_MIN} minutes'
                     THEN 1 ELSE 0 END AS new_session
         FROM events
       ),
       islands AS (
         SELECT event_id, user_id, ts,
                SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged
       ),
       bounds AS (
         SELECT user_id, session_id,
                MIN(ts) AS session_start,
                MAX(ts) + INTERVAL '{SESSION_GAP_MIN} minutes' AS session_end
         FROM islands GROUP BY user_id, session_id
       )
       SELECT i.event_id, i.user_id, i.ts, b.session_start, b.session_end
       FROM islands i JOIN bounds b
         ON b.user_id = i.user_id AND b.session_id = i.session_id""",
    doc="range join: every event matched to its containing session interval "
        "via bucketized equi-join (no cross join; oracle = gaps-and-islands)",
    tags=("window", "join", "range"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intervals = session_window output; points = the events themselves.
    The bucketized range_join turns BETWEEN-containment into an equi-join on
    (user_id, time-bucket) + exact recheck — candidate volume is points +
    interval bucket coverage, never points × intervals (operators/rangejoin.py)."""
    from flink_job_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    sessions = (
        e.groupBy(F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"),
                  "user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select("user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"))
    )
    points = e.select("event_id", "user_id", "ts")
    out = range_join(points, sessions, key="user_id", point_ts="ts",
                     start_col="session_start", end_col="session_end",
                     bucket_seconds=SESSION_GAP_MIN * 60)
    return out.select("event_id", "user_id", "ts", "session_start", "session_end")


# --- q_events_dedup ------------------------------------------------------------------------

@register(
    "q_events_dedup",
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
       FROM events
       QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) = 1""",
    doc="stream-style dedup: deterministic first event per (user_id, event_type) "
        "(the batch analog of dropDuplicates within watermark)",
    tags=("dedup", "streaming"),
)
def q_events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- q_window_running: per-user analytic window (lag gap + running sum) --------------

@register(
    "q_window_running",
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
              CAST(row_number() OVER w AS BIGINT) AS seq,
              epoch_us(CAST(ts AS TIMESTAMP))
                - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) AS gap_us,
              CAST(SUM(CAST(value AS DECIMAL(18,6)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    doc="per-user event sequencing: row_number, lag-gap to the previous event "
        "(µs), and an exact-decimal running value sum — the analytic-window "
        "trio (reference has no OVER clauses, SURVEY §2.6)",
    tags=("window", "analytic"),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hash-partition on user_id serves all three window functions (Spark
    plans a single Window node — one shuffle + one per-partition sort). The
    ordering key (ts, event_id) is a total order within a user, so lag and the
    ROWS-framed running sum are deterministic; the sum accumulates in
    DECIMAL(18,6) (exact, associative) so partial order inside a frame can't
    change the result across engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
    return e.select(
        "event_id", "user_id", "ts",
        F.row_number().over(w).cast("long").alias("seq"),
        (ts_us - prev_us).alias("gap_us"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(running)
         .cast("double").alias("running_value"),
    )


# --- q_pivot_events ---------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@register(
    "q_pivot_events",
    "SELECT user_id, "
    + ", ".join(
        f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0) AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES)
    + ", CAST(COUNT(1) AS BIGINT) AS n_total FROM events GROUP BY user_id",
    doc="pivot: per-user event counts spread into one column per event type "
        "(explicit value list → single shuffle, no discovery pass)",
    tags=("pivot", "agg"),
)
def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation — one groupBy(user_id) with a
    SUM(CASE WHEN type=t) per pivot value. With the value list known this is
    strictly better than ``groupBy().pivot(values)``, which Spark plans as
    TWO shuffles ((user, type) pre-agg → pivot_first re-agg) — and an
    open-ended pivot adds a whole distinct-values discovery job on top. One
    combine-enabled shuffle is the 100 TB floor, and this hits it."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            *[F.coalesce(F.sum(F.when(F.col("event_type") == t, 1)), F.lit(0))
               .cast("long").alias(f"n_{t}")
              for t in EVENT_TYPES],
            F.count(F.lit(1)).cast("long").alias("n_total"),
        )
    )


# --- q_gapfill_locf ----------------------------------------------------------------

@register(
    "q_gapfill_locf",
    """WITH hourly AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(1) AS DOUBLE) AS avg_value,
             CAST(COUNT(1) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT b.event_type, g.hour
      FROM bounds b, LATERAL (
        SELECT unnest(generate_series(b.h0, b.h1, INTERVAL '1 hour')) AS hour) g
    )
    SELECT g.event_type, g.hour,
           h.avg_value AS observed_avg,
           last_value(h.avg_value IGNORE NULLS)
             OVER (PARTITION BY g.event_type ORDER BY g.hour
                   ROWS UNBOUNDED PRECEDING) AS filled_avg,
           COALESCE(h.n_events, 0) AS n_events
    FROM grid g LEFT JOIN hourly h
      ON h.event_type = g.event_type AND h.hour = g.hour""",
    doc="time-series resample + gap-fill: hourly buckets per series, dense "
        "hour grid, missing buckets filled by last observation carried forward",
    tags=("timeseries", "window"),
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample-then-fill, the hypertable-style rollup: one bucket agg
    (exact-decimal mean → engine-identical doubles), a per-series hour grid
    via sequence+explode (rows ∝ series×hours, never events×hours), a
    grid⟕buckets equi-join, and ONE series-partitioned window for the
    last-observation-carried-forward fill. Leading gaps stay NULL in every
    engine. At 100 TB the only wide shuffle is the bucket agg; the grid side
    scales with |series|·|hours|."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg((F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
              / F.count(F.lit(1)).cast("double")).alias("avg_value"),
             F.count(F.lit(1)).alias("n_events"))
    ).persist()  # feeds both the bounds grid and the fill join
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select("event_type",
                F.explode(F.sequence("h0", "h1",
                                     F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    )
    w = (Window.partitionBy("event_type").orderBy("hour")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type", "hour",
            F.col("avg_value").alias("observed_avg"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_avg"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


# --- q_rolling_range: value-range rolling aggregate (last hour per user) -------------

ROLL_US = 3_600_000_000  # 1 hour in microseconds

@register(
    "q_rolling_range",
    f"""WITH t AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS ep, value
          FROM events
        )
        SELECT user_id, event_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(18,6)))
                      OVER (PARTITION BY user_id ORDER BY ep
                            RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS sum_1h,
               CAST(COUNT(1)
                      OVER (PARTITION BY user_id ORDER BY ep
                            RANGE BETWEEN {ROLL_US} PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_1h
        FROM t""",
    doc="per-user rolling 1-hour aggregate via a value-RANGE window frame — "
        "the frame is bounded by the ORDER-BY value (epoch micros), not row "
        "counts, so ties and gaps are handled identically in every engine",
    tags=("window", "rolling"),
)
def q_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on user_id, then a sorted linear scan per partition with a
    two-pointer frame — O(rows) state regardless of how dense the hour is.
    Decimal accumulation keeps the sliding add/evict exact (double sums would
    drift with eviction order and diverge between engines). RANGE (not ROWS)
    makes equal-timestamp ties frame-deterministic."""
    e = load_table(spark, sf_dir, "events")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep")
        .rangeBetween(-ROLL_US, Window.currentRow)
    )
    return (
        e.withColumn("ep", ep)
         .select(
             "user_id", "event_id", "ts",
             F.sum(F.col("value").cast("decimal(18,6)")).over(w)
              .cast("double").alias("sum_1h"),
             F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
         )
    )


# --- q_ntile: rank-based distribution stats per group --------------------------------

@register(
    "q_ntile",
    """SELECT event_id, event_type, value,
              CAST(ntile(4) OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS BIGINT) AS quartile,
              percent_rank() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS pr
       FROM events""",
    doc="quartile assignment + percent_rank per event_type — rank-based "
        "normalization for feature engineering; total order (value, event_id) "
        "makes tie placement engine-independent",
    tags=("window", "rank"),
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on event_type, one sort, both rank functions share the
    window. ntile/percent_rank only need the partition's row count — O(1)
    state per row during the scan. The (value, event_id) total order is the
    standard tie-break contract: without it, equal values straddle quartile
    boundaries differently per engine."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return e.select(
        "event_id", "event_type", "value",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )


# --- q_window_firstlast: first/last/nth_value frame surface --------------------

@register(
    "q_window_firstlast",
    """SELECT user_id, CAST(day AS TIMESTAMP) AS day,
              n_events, first_val, second_val, last_val FROM (
         SELECT user_id, CAST(ts AS DATE) AS day,
                row_number() OVER w AS rn,
                CAST(COUNT(1) OVER w2 AS BIGINT) AS n_events,
                first_value(value) OVER w2 AS first_val,
                nth_value(value, 2) OVER w2 AS second_val,
                last_value(value) OVER w2 AS last_val
         FROM events
         WINDOW w AS (PARTITION BY user_id, CAST(ts AS DATE)
                      ORDER BY ts, event_id),
                w2 AS (PARTITION BY user_id, CAST(ts AS DATE)
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
       ) WHERE rn = 1""",
    doc="first/last/nth_value window surface: per user-day, the first, "
        "second, and last event value under a (ts, event_id) total order — "
        "one output row per group via the rn=1 trick; completes the OVER "
        "coverage (ranking, lag, running sums) with the navigation family",
    tags=("window", "analytic"),
)
def q_window_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value under the DEFAULT frame (… AND CURRENT ROW) is the classic
    window bug — it returns the current row, not the partition's last. The
    explicit unbounded-following frame is pinned in both engines. The order
    key includes event_id so ties on ts can't flip first/last across
    engines. One shuffle on (user_id) grain; frames evaluate in-memory per
    partition-day group, O(group) state."""
    e = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    w2 = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        e.select(
            "user_id", "day",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(w2).cast("bigint").alias("n_events"),
            F.first("value").over(w2).alias("first_val"),
            F.nth_value("value", 2).over(w2).alias("second_val"),
            F.last("value").over(w2).alias("last_val"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
        # DATE-typed outputs render differently across engine→pandas paths;
        # the suite's convention is TIMESTAMP (q_rolling_distinct precedent)
        .withColumn("day", F.col("day").cast("timestamp_ntz"))
    )


# --- q_percentile_disc: exact discrete percentiles by rank ---------------------

@register(
    "q_percentile_disc",
    """WITH ranked AS (
         SELECT event_type, value,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS rn,
                CAST(COUNT(1) OVER (PARTITION BY event_type) AS BIGINT) AS n
         FROM events)
       SELECT event_type, n,
              MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50_disc,
              MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90_disc
       FROM ranked GROUP BY 1, 2""",
    doc="exact DISCRETE percentiles (p50/p90) per event_type: the value AT "
        "rank ceil(p·n) under a total order — an actual observed value, "
        "unlike the interpolated q_group_median; rank targets are integer "
        "formulas ((n+1) div 2, (9n+9) div 10) so no float ever rounds",
    tags=("quantile", "window", "agg"),
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_disc as rank selection: one per-key sort (the unavoidable
    cost of EXACT order statistics — the constant-memory alternative is the
    q_approx_quantiles sketch), then a conditional MAX collapses each group.
    The count window reuses the same partition hash, so it's one shuffle
    total. Ties are placed by the (value, event_id) total order, making the
    selected row engine-independent."""
    e = load_table(spark, sf_dir, "events")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type", "value",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    return ranked.groupBy("event_type", "n").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                     F.col("value"))).alias("p50_disc"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"),
                     F.col("value"))).alias("p90_disc"),
    )


# --- q_moving_avg: ROWS-frame trailing moving average --------------------------

MAVG_ROWS = 6   # current row + 6 preceding = 7-event trailing window

@register(
    "q_moving_avg",
    f"""SELECT event_id, user_id,
              CAST(sum7 AS DOUBLE) AS sum7,
              n7,
              CAST(sum7 AS DOUBLE) / CAST(n7 AS DOUBLE) AS avg7
       FROM (
         SELECT event_id, user_id,
                SUM(CAST(value AS DECIMAL(18,6))) OVER w AS sum7,
                CAST(COUNT(1) OVER w AS BIGINT) AS n7
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {MAVG_ROWS} PRECEDING AND CURRENT ROW)
       )""",
    doc=f"trailing moving average over the last {MAVG_ROWS + 1} events per "
        "user (ROWS frame — the count-based sibling of q_rolling_range's "
        "value-RANGE frame); the mean is an exact decimal sum over an exact "
        "count with ONE final IEEE division, so engines agree bitwise",
    tags=("window", "rolling"),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg() OVER a frame is a parity trap (engines divide in different
    orders/precisions); sum-and-count-then-divide is not. Short frames keep
    O(frame) running state per partition; one user_id shuffle, frames never
    re-scan. The (ts, event_id) total order pins which rows share a frame
    when timestamps tie."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(-MAVG_ROWS, Window.currentRow))
    return (
        e.select(
            "event_id", "user_id",
            F.sum(F.col("value").cast("decimal(18,6)")).over(w)
             .cast("double").alias("sum7"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("n7"),
        )
        .withColumn("avg7", F.col("sum7") / F.col("n7").cast("double"))
    )


# --- q_interval_union: merge overlapping activity intervals ------------------------

IVU_MINUTES = 5  # each event opens a [ts, ts+5min) activity interval


@register(
    "q_interval_union",
    f"""WITH iv AS (
          SELECT user_id, event_id, ts AS s,
                 ts + INTERVAL {IVU_MINUTES} MINUTE AS e
          FROM events),
        flagged AS (
          SELECT user_id, s, e,
                 CASE WHEN max(e) OVER (
                        PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                      OR s > max(e) OVER (
                        PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS new_iv,
                 event_id
          FROM iv),
        islands AS (
          SELECT user_id, s, e,
                 SUM(new_iv) OVER (
                   PARTITION BY user_id ORDER BY s, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM flagged),
        merged AS (
          SELECT user_id, island, min(s) AS s0, max(e) AS e1
          FROM islands GROUP BY user_id, island)
        SELECT user_id,
               CAST(COUNT(1) AS BIGINT) AS n_intervals,
               CAST(SUM(epoch_us(e1) - epoch_us(s0)) AS BIGINT) AS covered_us
        FROM merged GROUP BY user_id""",
    doc=f"interval union/coalescing: each event opens a {IVU_MINUTES}-minute "
        "activity interval; overlapping or touching intervals per user are "
        "merged (running-max island detection) and reported as merged-interval "
        "count + exact covered microseconds — the classic uptime/billing "
        "coverage operator (no double arithmetic anywhere: timestamps compare, "
        "durations are integer epoch-microsecond differences)",
    tags=("window", "intervals", "islands"),
)
def q_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing as gaps-and-islands: a new island starts where the
    interval's start exceeds the running max of all previous ends (running
    max, NOT lag(e) — with variable-length intervals an earlier interval can
    outlast its successor; the running max is what makes the merge correct in
    general). One user_id shuffle carries the flagging window, the island
    rollup, and the per-user rollup — the partitioning is reused across all
    three, so at 100 TB this is a single exchange whose per-key state is the
    O(1) running max. Durations are exact integer microseconds via the
    epoch-µs LTZ detour (NTZ timestamps don't cast to numbers); no IEEE op
    in the whole plan."""
    e = load_table(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    iv = e.select(
        "user_id", "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr(f"INTERVAL {IVU_MINUTES} MINUTES")).alias("e"),
    )
    w_prev = (Window.partitionBy("user_id").orderBy("s", "event_id")
                    .rowsBetween(Window.unboundedPreceding, -1))
    prev_max = F.max("e").over(w_prev)
    flagged = iv.select(
        "user_id", "s", "e", "event_id",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1)
         .otherwise(0).alias("new_iv"),
    )
    w_run = (Window.partitionBy("user_id").orderBy("s", "event_id")
                   .rowsBetween(Window.unboundedPreceding, 0))
    islands = flagged.withColumn("island", F.sum("new_iv").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("s0"), F.max("e").alias("e1"))
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(us(F.col("e1")) - us(F.col("s0"))).cast("bigint")
         .alias("covered_us"),
    )


# --- q_percent_rank: relative-standing window functions ------------------------

@register(
    "q_percent_rank",
    """SELECT c_custkey, c_mktsegment, c_acctbal,
              percent_rank() OVER w AS pr,
              cume_dist() OVER w AS cd,
              CAST(FLOOR(cume_dist() OVER w * 10) AS BIGINT) AS decile
       FROM customer WHERE c_nationkey = 1
       WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)""",
    doc="relative standing inside each market segment: percent_rank, "
        "cume_dist, and the cume_dist-derived decile bucket for nation-1 "
        "customers — the rank-normalization window family",
    tags=("windows", "rank"),
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist are rank-based (ties share a value), so an
    ORDER BY on the raw balance alone is deterministic — no row_number
    tie-break needed. Both engines evaluate (rank-1)/(n-1) and rank/n as a
    single double division of exact int64 operands, so the values are
    bit-identical. The nation filter is pushed to the scan; each segment
    partition sorts once and feeds all three window expressions (one
    exchange + one sort in the plan). The decile floors the SAME cume_dist
    double in both engines before the bigint cast (DuckDB CAST rounds,
    so the FLOOR must happen first — engine-parity trap)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 1)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    cd = F.cume_dist().over(w)
    return c.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        cd.alias("cd"),
        F.floor(cd * 10).cast("bigint").alias("decile"),
    )


# --- q_percentile_cont: exact interpolated quantiles ----------------------------

@register(
    "q_percentile_cont",
    """SELECT l_returnflag,
              quantile_cont(l_quantity, 0.25) AS p25_qty,
              quantile_cont(l_quantity, 0.5)  AS p50_qty,
              quantile_cont(l_quantity, 0.75) AS p75_qty,
              quantile_cont(l_extendedprice, 0.9) AS p90_price,
              CAST(COUNT(1) AS BIGINT) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    doc="exact interpolated percentiles (PERCENTILE_CONT semantics): "
        "quantity quartiles + the p90 price per return flag — the "
        "linear-interpolation quantile family next to q_percentile_disc's "
        "discrete picks and q_approx_quantiles' sketch",
    tags=("windows", "quantile", "agg"),
)
def q_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both engines interpolate lower + (upper-lower)*frac on the sorted
    group; the quartile fracs are dyadic (exact doubles) and the operands
    come off the same sorted doubles, so the arithmetic is bit-identical
    (verified engine-to-engine including the non-dyadic 0.9). Exact
    percentile holds O(group values) state — the correctness baseline;
    at 100 TB the constant-memory path is the KLL/GK sketch in
    q_approx_quantiles, with this key as its exactness oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.percentile("l_quantity", F.lit(0.25)).alias("p25_qty"),
               F.percentile("l_quantity", F.lit(0.5)).alias("p50_qty"),
               F.percentile("l_quantity", F.lit(0.75)).alias("p75_qty"),
               F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
               F.count(F.lit(1)).cast("bigint").alias("n"))
          .orderBy("l_returnflag")
    )


# --- q_time_rollup: multi-resolution time hierarchy (hypertable rollup) ---------

@register(
    "q_time_rollup",
    """WITH g AS (
         SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                user_id
         FROM events)
       SELECT day, hour,
              CAST(GROUPING(day)*2 + GROUPING(hour) AS BIGINT) AS grain,
              CAST(COUNT(1) AS BIGINT) AS n_events,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM g
       GROUP BY ROLLUP(day, hour)
       ORDER BY grain, day, hour""",
    doc="hypertable-style multi-resolution rollup: ONE pass over events "
        "produces the hour grain, the day grain, and the grand total "
        "(GROUP BY ROLLUP over the date_trunc hierarchy), each with exact "
        "event and distinct-user counts",
    tags=("windows", "rollup", "agg", "timeseries"),
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate ladder (minute->hour->day) as one ROLLUP:
    Spark expands the grouping sets BEFORE the shuffle and partial-aggs
    each grain map-side, so the exchange carries ~(hours + days + 1)
    groups per partition, not 3x the input. grain decodes grouping_id
    (0=hour rows, 1=day rows, 3=grand total). COUNT(DISTINCT user_id) is
    exact — Spark plans the distinct expansion; the sketch alternative
    for 100 TB is q_approx_distinct. NULL day/hour only on super-grain
    rows, exactly as the oracle's ROLLUP emits them."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    return (
        e.select(day, hour, "user_id")
         .rollup("day", "hour")
         .agg(F.grouping_id().cast("bigint").alias("grain"),
              F.count(F.lit(1)).cast("bigint").alias("n_events"),
              F.countDistinct("user_id").cast("bigint").alias("n_users"))
         .select("day", "hour", "grain", "n_events", "n_users")
         .orderBy("grain", "day", "hour")
    )


# --- q_count_windows: Flink-style count windows (every N events per key) --------

def count_windows(e: DataFrame, n: int) -> DataFrame:
    """Count-window assignment + aggregate over (user_id, ts, event_id,
    cents): rank under the (ts, event_id) total order, integer-divide by
    ``n``, aggregate per (user, window). Shared by the batch key and the
    fuzz suite; the streaming twin is streaming/stateful.py::
    stream_count_windows."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "ts", "cents",
        F.floor((F.row_number().over(w) - 1) / n)
         .cast("bigint").alias("win_idx"))
    return (
        seq.groupBy("user_id", "win_idx")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                F.min("ts").alias("win_start"),
                F.max("ts").alias("win_end"),
                F.sum("cents").cast("bigint").alias("value_cents"))
    )


COUNT_WINDOW_N = 5


@register(
    "q_count_windows",
    f"""WITH seq AS (
          SELECT user_id, ts, value,
                 (row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) - 1)
                   // {COUNT_WINDOW_N} AS win_idx
          FROM events)
       SELECT user_id, CAST(win_idx AS BIGINT) AS win_idx,
              CAST(COUNT(1) AS BIGINT) AS n_events,
              MIN(ts) AS win_start,
              MAX(ts) AS win_end,
              CAST(SUM(CAST(FLOOR(CAST(CAST(CAST(value AS DOUBLE) AS VARCHAR)
                   AS DECIMAL(19,8)) * 100) AS BIGINT)) AS BIGINT)
                AS value_cents
       FROM seq GROUP BY 1, 2""",
    doc=f"count windows (Flink countWindow parity): every {COUNT_WINDOW_N} "
        "consecutive events per user form a window regardless of time — "
        "row_number under the (ts, event_id) total order integer-divided "
        "by N, then an ordinary per-window aggregate; the trailing partial "
        "window is emitted like Flink's trigger-on-close",
    tags=("windows", "streaming", "flink-parity"),
)
def q_count_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference ecosystem's third window family next to time and
    session windows: windows close by ELEMENT COUNT. Batch formulation is
    rank-then-integer-divide under a total order (deterministic where
    Flink's runtime assignment is arrival-order-dependent); the window
    aggregate reuses the same user_id partition hash as the ranking
    window, so the whole key is one shuffle + one sort. Sums go through
    the exact-cents idiom; at 100 TB per-user sequences sort within
    partitions, nothing global."""
    from flink_job_spark.queries.analytics import cents_col
    e = load_table(spark, sf_dir, "events")
    return count_windows(
        e.select("user_id", "ts", "event_id",
                 cents_col(F.col("value")).alias("cents")),
        COUNT_WINDOW_N)


# --- q_running_median: expanding-frame order statistic --------------------------

@register(
    "q_running_median",
    """SELECT user_id, event_id, ts, value,
              median(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_median
       FROM events""",
    doc="running median per user: the expanding-frame ORDER STATISTIC "
        "window (median of everything seen so far at each event) — the "
        "robust online location estimate that running mean cannot give; "
        "interpolated on even counts, identically in both engines",
    tags=("windows", "quantile", "timeseries"),
)
def q_running_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics over an EXPANDING frame: each row's aggregate sees
    the full per-user prefix under the (ts, event_id) total order. Both
    engines interpolate lower+(upper-lower)*0.5 on even prefixes from the
    same sorted doubles, so the emitted medians are bit-identical. Cost is
    the per-user prefix buffer — bounded by the largest single user's
    history, NOT the table (one shuffle + one sort per user partition);
    the constant-memory alternative at extreme per-key cardinality is a
    streaming quantile sketch (q_approx_quantiles family)."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return e.select(
        "user_id", "event_id", "ts", "value",
        F.percentile("value", F.lit(0.5)).over(w).alias("run_median"))


# --- q_gapfill_lerp: resample + linear interpolation ----------------------------

@register(
    "q_gapfill_lerp",
    """WITH hourly AS (
      SELECT event_type,
             time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(1) AS DOUBLE) AS avg_value
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT b.event_type, g.hour
      FROM bounds b, LATERAL (
        SELECT unnest(generate_series(b.h0, b.h1, INTERVAL '1 hour')) AS hour) g
    ),
    joined AS (
      SELECT g.event_type, g.hour, h.avg_value AS observed_avg
      FROM grid g LEFT JOIN hourly h
        ON h.event_type = g.event_type AND h.hour = g.hour
    ),
    ctx AS (
      SELECT event_type, hour, observed_avg,
             last_value(observed_avg IGNORE NULLS) OVER wb AS pv,
             last_value(CASE WHEN observed_avg IS NOT NULL THEN hour END
                        IGNORE NULLS) OVER wb AS ph,
             first_value(observed_avg IGNORE NULLS) OVER wf AS nv,
             first_value(CASE WHEN observed_avg IS NOT NULL THEN hour END
                         IGNORE NULLS) OVER wf AS nh
      FROM joined
      WINDOW wb AS (PARTITION BY event_type ORDER BY hour
                    ROWS UNBOUNDED PRECEDING),
             wf AS (PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, hour, observed_avg,
           CASE WHEN observed_avg IS NOT NULL THEN observed_avg
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                ELSE pv + (nv - pv)
                     * (CAST(epoch_us(hour) - epoch_us(ph) AS DOUBLE)
                        / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE))
           END AS filled_lerp
    FROM ctx""",
    doc="time-series resample + LINEAR interpolation: interior gaps fill "
        "with the value on the straight line between the surrounding "
        "observations (edges stay NULL — no extrapolation) — the lerp "
        "companion to q_gapfill_locf's step fill",
    tags=("timeseries", "window"),
)
def q_gapfill_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same resample/grid skeleton as q_gapfill_locf, plus the forward
    window: each gap row sees (prev value, prev hour) from the backward
    carry and (next value, next hour) from the forward carry — both
    directions read the SAME per-series sort, so the plan stays one
    exchange + one sort. The interpolation fraction divides tz-free epoch
    micros (timestampdiff over NTZ — never the session timezone), and the
    lerp is written prev + (next-prev)*frac in BOTH engines: identical
    IEEE op order, bit-identical fills. Observed rows short-circuit to
    their own value (du=0 would give the same answer; the CASE makes the
    semantics explicit)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg((F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
              / F.count(F.lit(1)).cast("double")).alias("observed_avg"))
    ).persist()
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select("event_type",
                F.explode(F.sequence("h0", "h1",
                                     F.expr("INTERVAL 1 HOUR"))).alias("hour"))
    )
    joined = grid.join(hourly, ["event_type", "hour"], "left")
    wb = (Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("event_type").orderBy("hour")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_hour = F.when(F.col("observed_avg").isNotNull(), F.col("hour"))
    ctx = joined.select(
        "event_type", "hour", "observed_avg",
        F.last("observed_avg", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(wb).alias("ph"),
        F.first("observed_avg", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(wf).alias("nh"))
    us = lambda c: F.expr(  # noqa: E731  (tz-free epoch micros)
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({c} AS TIMESTAMP_NTZ))")
    frac = ((us("hour") - us("ph")).cast("double")
            / (us("nh") - us("ph")).cast("double"))
    lerp = (F.when(F.col("observed_avg").isNotNull(), F.col("observed_avg"))
             .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
             .otherwise(F.col("pv")
                        + (F.col("nv") - F.col("pv")) * frac))
    return ctx.select("event_type", "hour", "observed_avg",
                      lerp.alias("filled_lerp"))
