"""Product-analytics composites over the `events` table: table profiling,
conversion funnel, cohort retention.

These are the queries an analytics user runs daily on a 100 TB event store;
none exist in the reference (SURVEY §2.6 — no joins/GROUP BY at all), so they
are north-star extensions like queries/relational.py. All follow the same
scale discipline: partial-aggregated shuffles on the natural key, decimal
detours for order-free sums, and total-order tie-breaks for engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

# --- q_profile_table: one-pass per-column data profile -------------------------------

PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"]

@register(
    "q_profile_table",
    " UNION ALL ".join(
        f"""SELECT '{c}' AS col_name, COUNT(1) AS n_rows,
                   COUNT(1) - COUNT({c}) AS n_nulls,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM orders"""
        for c in PROFILE_COLS
    ),
    doc="per-column table profile (row/null/exact-distinct counts) in ONE "
        "aggregation pass — the schema-quality report a pipeline runs before "
        "trusting a new source",
    tags=("profile", "agg"),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All per-column stats ride a single groupBy().agg(): Spark plans one
    Expand (|cols| replicas for the distinct counts) and one shuffle, instead
    of |cols| scans of the table. Exact distincts are the oracle-comparable
    choice; at 100 TB swap countDistinct → approx_count_distinct and the plan
    loses the Expand entirely (noted, not default, to keep the oracle exact).
    The wide 1-row aggregate unpivots to (col_name, ...) rows via stack —
    driver never sees data."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in PROFILE_COLS:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n, __n - __nn_{c}, CAST(__nd_{c} AS BIGINT)" for c in PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_args}) "
        "AS (col_name, n_rows, n_nulls, n_distinct)"
    )


# --- q_funnel: signup → purchase conversion funnel -----------------------------------

@register(
    "q_funnel",
    """WITH s AS (
         SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
         FROM events WHERE event_type = 'signup' GROUP BY user_id
       ),
       p AS (
         SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS purchase_ts
         FROM events e JOIN s ON e.user_id = s.user_id
         WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts
         GROUP BY e.user_id
       )
       SELECT s.user_id, s.signup_ts, p.purchase_ts,
              p.purchase_ts IS NOT NULL AS converted,
              epoch_us(p.purchase_ts) - epoch_us(s.signup_ts) AS micros_to_convert
       FROM s LEFT JOIN p ON s.user_id = p.user_id""",
    doc="conversion funnel: first signup → first subsequent purchase per "
        "user, with conversion flag and time-to-convert — the standard "
        "product-analytics two-step funnel",
    tags=("funnel", "join", "agg"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each stage partial-aggregates to one row per user BEFORE joining, so
    the joins carry |users| rows, never |events|; both stage aggregates and
    both joins hash-partition on user_id, letting Spark reuse one exchange
    layout end-to-end. MIN(ts) is order-free — no tie-break needed."""
    e = load_table(spark, sf_dir, "events")
    s = (e.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("signup_ts")))
    p = (
        e.filter(F.col("event_type") == "purchase")
         .join(s, "user_id")
         .filter(F.col("ts") >= F.col("signup_ts"))
         .groupBy("user_id").agg(F.min("ts").alias("purchase_ts"))
    )
    micros = (F.unix_micros(F.col("purchase_ts").cast("timestamp"))
              - F.unix_micros(F.col("signup_ts").cast("timestamp")))
    return (
        s.join(p, "user_id", "left")
         .select(
             "user_id", "signup_ts", "purchase_ts",
             F.col("purchase_ts").isNotNull().alias("converted"),
             micros.alias("micros_to_convert"),
         )
    )


# --- q_cohort_retention: first-seen cohort × day-offset activity ---------------------

@register(
    "q_cohort_retention",
    """WITH firstseen AS (
         SELECT user_id,
                MIN(date_trunc('day', CAST(ts AS TIMESTAMP))) AS cohort_day
         FROM events GROUP BY user_id
       ),
       active AS (
         SELECT DISTINCT user_id,
                date_trunc('day', CAST(ts AS TIMESTAMP)) AS active_day
         FROM events
       )
       SELECT f.cohort_day,
              CAST(date_diff('day', f.cohort_day, a.active_day) AS BIGINT) AS day_offset,
              CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
       FROM active a JOIN firstseen f ON a.user_id = f.user_id
       GROUP BY 1, 2""",
    doc="cohort retention triangle: users grouped by first-seen day, counted "
        "per day-offset of later activity — the canonical retention report",
    tags=("cohort", "agg", "join"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) pairs dedup BEFORE the cohort join — the join carries
    distinct user-days (≤ users × days), never raw events. Every stage keys
    on user_id until the final small (cohort, offset) rollup, so one
    partitioning layout serves first-seen, dedup, and join."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "active_day", F.date_trunc("day", F.col("ts")))
    firstseen = e.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    active = e.select("user_id", "active_day").distinct()
    offset = F.datediff(F.col("active_day").cast("date"),
                        F.col("cohort_day").cast("date")).cast("long")
    return (
        active.join(firstseen, "user_id")
        .select("cohort_day", offset.alias("day_offset"), "user_id")
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


# --- q_impute_group_mean: null repair with per-group exact means ---------------------

IMPUTE_MOD = 13   # deterministic nulling: value dropped where event_id % MOD = 0

@register(
    "q_impute_group_mean",
    f"""WITH holes AS (
          SELECT event_id, event_type,
                 CASE WHEN event_id % {IMPUTE_MOD} = 0 THEN NULL
                      ELSE value END AS value
          FROM events
        ),
        means AS (
          SELECT event_type,
                 CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(COUNT(value) AS DOUBLE) AS grp_mean
          FROM holes GROUP BY event_type
        )
        SELECT h.event_id, h.event_type,
               COALESCE(h.value, m.grp_mean) AS value_filled,
               h.value IS NULL AS was_imputed
        FROM holes h JOIN means m ON h.event_type = m.event_type""",
    doc="missing-value imputation with per-group means — the ML-prep repair "
        "step; means aggregate exactly (decimal) then broadcast back onto "
        "the fact rows",
    tags=("impute", "agg", "join"),
)
def q_impute_group_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mean table is |groups| rows → broadcast join back onto the fact
    (zero fact shuffle; plan-pinned). Sum-then-divide in DECIMAL/DOUBLE with
    one division makes the mean identical across engines and partitionings —
    AVG() would accumulate in engine-specific double order. Deterministic
    %-nulling stands in for real missing data so the oracle sees the same
    holes."""
    e = load_table(spark, sf_dir, "events")
    holes = e.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % IMPUTE_MOD == 0, None)
         .otherwise(F.col("value")).alias("value"),
    )
    means = holes.groupBy("event_type").agg(
        (F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
         / F.count("value").cast("double")).alias("grp_mean")
    )
    return (
        holes.join(F.broadcast(means), "event_type")
        .select(
            "event_id", "event_type",
            F.coalesce(F.col("value"), F.col("grp_mean")).alias("value_filled"),
            F.col("value").isNull().alias("was_imputed"),
        )
    )


# --- q_minmax_scale: per-group feature scaling to [0,1] ------------------------------

@register(
    "q_minmax_scale",
    """WITH stats AS (
         SELECT event_type, MIN(value) AS mn, MAX(value) AS mx
         FROM events GROUP BY event_type
       )
       SELECT e.event_id, e.event_type, e.value,
              CASE WHEN s.mx = s.mn THEN 0.0
                   ELSE (e.value - s.mn) / (s.mx - s.mn) END AS scaled
       FROM events e JOIN stats s ON e.event_type = s.event_type""",
    doc="per-group min-max feature scaling to [0,1] — constant-group stats "
        "broadcast back onto the facts; degenerate (constant) groups scale "
        "to 0.0 instead of dividing by zero",
    tags=("scale", "agg", "join"),
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max are order-free (no decimal detour needed) and reduce to
    |groups| rows → broadcast join back, zero fact shuffle. The subtract/
    divide pair is the same two IEEE ops in every engine, so parity is exact
    without canonicalization."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx"))
    scaled = (
        F.when(F.col("mx") == F.col("mn"), F.lit(0.0))
         .otherwise((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")))
    )
    return (
        e.join(F.broadcast(stats), "event_type")
         .select("event_id", "event_type", "value", scaled.alias("scaled"))
    )
