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

from flink_job_spark.operators.asof import asof_join, asof_nearest_join
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


@register(
    "q_asof_forward",
    """WITH clicks AS (
         SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'click'
       ),
       purch AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                MAX(event_id) AS purchase_id
         FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
       )
       SELECT c.click_id, c.user_id,
              c.ts AS click_ts,
              p.ts AS purchase_ts,
              p.purchase_id,
              epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       FROM clicks c ASOF LEFT JOIN purch p
         ON c.user_id = p.user_id AND c.ts <= p.ts""",
    doc="forward as-of join: each click + the user's NEXT purchase at or "
        "after it (time-to-conversion) — the same union-merge operator run "
        "on negated microseconds, so one code path serves both directions",
    tags=("asof", "join", "streaming"),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Direction reversal is a coordinate flip, not a second operator:
    'latest at or before' on -t IS 'earliest at or after' on t, and the
    operator's right-before-left tie order keeps equal timestamps matching
    (c.ts <= p.ts inclusive) under negation. The purchase timestamp rides
    along as an ordinary payload column, so nothing needs un-negating on
    the way out. Same one-shuffle union-merge plan as q_asof_join."""
    e = load_table(spark, sf_dir, "events")
    neg = lambda c: (-F.unix_micros(F.col(c).cast("timestamp"))).alias("ts_neg")  # noqa: E731
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"), neg("ts"))
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id"))
        .select("user_id", "purchase_id", F.col("ts").alias("pts"), neg("ts"))
    )
    joined = asof_join(clicks, purch, key="user_id",
                       left_ts="ts_neg", right_ts="ts_neg",
                       right_payload=["purchase_id", "pts"], prefix="p_")
    return joined.select(
        "click_id", "user_id", "click_ts",
        F.col("p_pts").alias("purchase_ts"),
        F.col("p_purchase_id").alias("purchase_id"),
        (F.unix_micros(F.col("p_pts").cast("timestamp"))
         - F.unix_micros(F.col("click_ts").cast("timestamp"))).alias("gap_us"),
    )


# --- q_first_touch: attribution window via forward as-of -----------------------

ATTRIB_DAYS = 7

@register(
    "q_first_touch",
    f"""WITH clicks AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                MIN(event_id) AS click_id
         FROM events WHERE event_type = 'click' GROUP BY 1, 2
       ),
       purch AS (
         SELECT event_id AS purchase_id, user_id,
                CAST(ts AS TIMESTAMP) AS ts,
                CAST(ts AS TIMESTAMP) - INTERVAL {ATTRIB_DAYS} DAY
                  AS boundary
         FROM events WHERE event_type = 'purchase'
       ),
       j AS MATERIALIZED (
         SELECT p.purchase_id, p.user_id, p.ts AS purchase_ts,
                c.ts AS click_ts, c.click_id
         FROM purch p ASOF LEFT JOIN clicks c
           ON p.user_id = c.user_id AND p.boundary <= c.ts)
       SELECT purchase_id, user_id, purchase_ts, click_ts, click_id,
              epoch_us(purchase_ts) - epoch_us(click_ts) AS age_us
       FROM j WHERE click_ts <= purchase_ts""",
    doc=f"first-touch attribution: each purchase credited to the user's "
        f"EARLIEST click inside the trailing {ATTRIB_DAYS}-day window — "
        "reduced to a forward as-of join FROM THE WINDOW BOUNDARY "
        "(earliest click ≥ t−7d, kept if ≤ t), so the marketing-"
        "attribution shape rides the same one-shuffle union-merge "
        "operator as q_asof_join instead of a range join",
    tags=("asof", "join", "streaming", "analytics"),
)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'First click within a trailing window' looks like a range join
    (purchases × every click in 7 days), but it is an as-of in disguise:
    the earliest click AT OR AFTER the window's left edge, checked against
    the right edge afterwards. Negated microseconds turn the operator's
    latest-at-or-before into earliest-at-or-after (q_asof_forward
    precedent); clicks pre-deduplicate per (user, ts) keeping MIN event_id
    (the 'first touch' tie rule, mirrored in the oracle), and purchases
    with no click in the window fall out of the final bound check exactly
    like the oracle's WHERE (fenced behind a MATERIALIZED CTE there —
    DuckDB otherwise pushes the upper bound INTO the ASOF join and rejects
    it as a second inequality). One shuffle, no per-key range blow-up."""
    e = load_table(spark, sf_dir, "events")
    boundary_neg = (
        -(F.unix_micros(F.col("ts").cast("timestamp"))
          - F.lit(ATTRIB_DAYS * 86_400_000_000))).alias("ts_neg")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("click_id"))
        .select("user_id", "click_id", F.col("ts").alias("click_ts"),
                (-F.unix_micros(F.col("ts").cast("timestamp"))).alias("ts_neg"))
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"), boundary_neg)
    )
    joined = asof_join(purch, clicks, key="user_id",
                       left_ts="ts_neg", right_ts="ts_neg",
                       right_payload=["click_id", "click_ts"], prefix="c_")
    return (
        joined.filter(F.col("c_click_ts") <= F.col("purchase_ts"))
              .select("purchase_id", "user_id", "purchase_ts",
                      F.col("c_click_ts").alias("click_ts"),
                      F.col("c_click_id").alias("click_id"),
                      (F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                       - F.unix_micros(F.col("c_click_ts").cast("timestamp")))
                      .alias("age_us"))
    )


# --- q_asof_nearest: nearest-in-time match (either direction) ------------------

@register(
    "q_asof_nearest",
    """WITH clicks AS (
         SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'click'
       ),
       purch AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                MAX(event_id) AS purchase_id
         FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
       )
       SELECT c.click_id, c.user_id, c.ts AS click_ts,
              p.ts AS near_ts, p.purchase_id AS near_purchase_id,
              epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       FROM clicks c LEFT JOIN LATERAL (
          SELECT ts, purchase_id FROM purch
          WHERE purch.user_id = c.user_id
          ORDER BY abs(epoch_us(purch.ts) - epoch_us(c.ts)), purch.ts
          LIMIT 1) p ON TRUE""",
    doc="nearest as-of join: each click + the user's CLOSEST purchase in "
        "time, before or after (ties to the earlier row) — completes the "
        "as-of family (backward / forward / nearest) by composing the two "
        "directional carries and taking the smaller gap",
    tags=("asof", "join", "streaming"),
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nearest(t) = argmin over {latest right <= t, earliest right >= t}
    of |gap| — so the operator is the backward carry composed with the
    forward carry (the negated-time trick of q_asof_forward), then a pure
    Column pick of the smaller gap, ties to the earlier (backward) side,
    matching the oracle's (absdiff, ts) lateral order. Two union-merge
    sorts on the same (user, time) key; a fused single-sort variant would
    carry both directions in one window pass — composition is chosen so
    all three directions share ONE audited operator. NULL semantics fall
    out: a user with only later purchases gets the forward match, only
    earlier gets backward, neither gets NULLs."""
    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("click_ts"), F.col("ts").alias("ts")))
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("purchase_id")))
    joined = asof_nearest_join(clicks, purch, key="user_id",
                               right_payload=["purchase_id"], prefix="near_")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return joined.select(
        "click_id", "user_id", "click_ts",
        F.col("near_ts").cast("timestamp_ntz").alias("near_ts"),
        F.col("near_purchase_id"),
        (us("near_ts") - us("click_ts")).alias("gap_us"),
    )


# --- q_asof_tolerance: as-of join with a max-staleness bound -------------------

ASOF_TOL_US = 24 * 3600 * 1_000_000   # 24 h attribution window, merge_asof-style

@register(
    "q_asof_tolerance",
    f"""WITH clicks AS (
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
              CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOL_US}
                   THEN c.ts END AS click_ts,
              CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOL_US}
                   THEN c.click_id END AS click_id,
              CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {ASOF_TOL_US}
                   THEN epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
       FROM purch p ASOF LEFT JOIN clicks c
         ON p.user_id = c.user_id AND p.ts >= c.ts""",
    doc="as-of join with tolerance (pandas merge_asof tolerance= / kdb wj "
        "window bound): the most recent click is matched only when it is "
        "at most 24 hours stale, else the purchase keeps NULL attribution "
        "— filtering AFTER the pick equals excluding BEFORE the pick, since "
        "any older candidate is staler than the picked one",
    tags=("asof", "join", "tolerance"),
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution windows are the production reason as-of joins carry a
    tolerance: a click from last week must not claim today's purchase.
    Because backward as-of picks the MAXIMUM event-time predecessor, the
    tolerance is a post-pick projection — same one-shuffle union-merge
    plan as q_asof_join, zero extra exchanges (plan-pinned) — rather than
    a join-condition change that would break the merge's monotonicity."""
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
    gap = (F.unix_micros(F.col("ts").cast("timestamp"))
           - F.unix_micros(F.col("click_ts").cast("timestamp")))
    ok = gap <= ASOF_TOL_US
    return joined.select(
        "purchase_id", "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(ok, F.col("click_ts")).alias("click_ts"),
        F.when(ok, F.col("click_click_id")).alias("click_id"),
        F.when(ok, gap).alias("gap_us"),
    )
