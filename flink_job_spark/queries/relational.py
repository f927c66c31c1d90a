"""Relational extension queries: joins, multi-level aggregation, set ops,
deterministic sampling.

The reference has NO joins, set ops, GROUP BY, or DISTINCT aggregation
(SURVEY §2.6 — explicitly absent); a user switching an analytics workload onto
this engine needs them, so they are first-class query keys here. Each one is
written the way it should execute at 100 TB:

- dimension joins broadcast explicitly (`F.broadcast`) — a 25-row nation table
  must never shuffle a 100 TB fact table (plan-pinned in tests/test_plans.py);
- fact-fact joins stay unhinted so Catalyst/AQE picks sort-merge (with skew
  splitting) at scale and hash/broadcast when a side turns out tiny;
- grouped aggregates rely on partial (map-side) aggregation; double sums go
  through DECIMAL(18,6) — exact and associative, so the result is independent
  of partial-agg grouping order AND engine (SURVEY windows.py precedent);
- sampling is hash-deterministic (md5-bucket), never `rand()` — reproducible
  across retries, engines, and cluster sizes, which is what a training-data
  pipeline needs from a sampling operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

# deterministic per-stratum keep-rates (percent of md5 bucket space)
SAMPLE_RATES: dict[str, int] = {"en": 50, "de": 30, "fr": 30, "es": 30, "zh": 10}
EXCEPT_MOD = 500  # q_set_except: simulated row loss for o_orderkey % MOD == 0


# --- q_join_broadcast: star join, every dimension broadcast ------------------

@register(
    "q_join_broadcast",
    """SELECT r_name,
              COUNT(1) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       GROUP BY r_name""",
    doc="star join orders⋈customer⋈nation⋈region with broadcast dims, "
        "grouped exact-decimal revenue (reference has no joins, SURVEY §2.6)",
    tags=("join", "agg"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact table joined to three dimensions, each hinted broadcast.

    At 100 TB the orders fact is thousands of partitions; customer/nation/
    region stay MBs. Broadcasting pins a map-side hash join — zero fact
    shuffle before the final single-key aggregation (which partial-aggregates
    map-side to 5 rows per task first).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
         .groupBy("r_name")
         .agg(
             F.count(F.lit(1)).alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
              .cast("double").alias("total_price"),
         )
    )


# --- q_join_shuffle: fact-fact equi-join, Catalyst-chosen strategy -----------

@register(
    "q_join_shuffle",
    """SELECT o_orderpriority,
              COUNT(1) AS n_lines,
              CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                            AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority""",
    doc="large-large equi-join lineitem⋈orders, grouped discounted revenue; "
        "unhinted so AQE picks sort-merge w/ skew split at scale",
    tags=("join", "agg"),
)
def q_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides scale with the data → no broadcast hint; Catalyst/AQE picks
    sort-merge (both sides shuffle on the join key once) and can split skewed
    keys at runtime. The per-row revenue product is a single IEEE multiply —
    identical in any engine — then summed exactly as DECIMAL(18,6)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy("o_orderpriority")
          .agg(
              F.count(F.lit(1)).alias("n_lines"),
              F.sum(revenue.cast("decimal(18,6)")).cast("double").alias("revenue"),
          )
    )


# --- q_agg_rollup: hierarchical aggregation (event_type → day → total) -------

@register(
    "q_agg_rollup",
    """SELECT event_type,
              date_trunc('day', CAST(ts AS TIMESTAMP)) AS event_day,
              CAST(GROUPING(event_type, date_trunc('day', CAST(ts AS TIMESTAMP)))
                   AS BIGINT) AS gid,
              COUNT(1) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
       FROM events
       GROUP BY ROLLUP(event_type, date_trunc('day', CAST(ts AS TIMESTAMP)))""",
    doc="ROLLUP(event_type, day): per-day, per-type subtotals and grand total "
        "in one pass (reference has no GROUP BY at all, SURVEY §2.6)",
    tags=("agg", "rollup"),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle produces all three aggregation levels; Spark expands the
    grouping sets before the exchange and still partial-aggregates map-side,
    so the shuffle carries ≤ (types × days × 3) rows per task, not the data."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_day", F.date_trunc("day", F.col("ts"))
    )
    return (
        e.rollup("event_type", "event_day")
         .agg(
             F.grouping_id().cast("bigint").alias("gid"),
             F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)"))
              .cast("double").alias("sum_value"),
         )
         .select("event_type", "event_day", "gid", "n_events", "sum_value")
    )


# --- q_distinct_agg: exact COUNT(DISTINCT) per group -------------------------

@register(
    "q_distinct_agg",
    """SELECT event_type,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              COUNT(1) AS n_events
       FROM events
       GROUP BY event_type""",
    doc="grouped exact distinct aggregation (two-phase: distinct expand then "
        "final agg); the approx twin is q_approx_distinct",
    tags=("agg", "distinct"),
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark plans COUNT(DISTINCT) as partial-dedup on (event_type, user_id)
    before the final count — the shuffle carries distinct pairs, not events.
    At 100 TB with huge per-group cardinality, switch to q_approx_distinct
    (HLL) — same output shape, bounded memory."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
         .agg(
             F.countDistinct("user_id").alias("n_users"),
             F.count(F.lit(1)).alias("n_events"),
         )
    )


# --- q_set_except: multiset row-level diff (EXCEPT ALL) ----------------------

@register(
    "q_set_except",
    f"""SELECT * FROM orders
        EXCEPT ALL
        SELECT * FROM orders WHERE o_orderkey % {EXCEPT_MOD} <> 0""",
    doc="row-level multiset diff via exceptAll — the generalization of the "
        "reference's count-delta audit (mis:1288) to row granularity",
    tags=("setop", "audit"),
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference audits source-vs-target by COUNT delta then drills to the
    first bad row (SURVEY §2.6: 'poor-man's EXCEPT-cardinality'). exceptAll is
    the scalable row-level version: one hash-partition of each side on the
    full row, per-key count subtraction — no driver loop. The deterministic
    `% {EXCEPT_MOD}` target models rows lost by a partial load."""
    o = load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % EXCEPT_MOD != 0)
    return o.exceptAll(target)


# --- q_stratified_sample: deterministic hash-bucket sampling per stratum -----

def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in SAMPLE_RATES.items()
    )
    return f"CASE lang {whens} ELSE 0 END"


def _rate_case_col() -> F.Column:
    expr = F.lit(0)
    for lang, pct in SAMPLE_RATES.items():
        expr = F.when(F.col("lang") == lang, pct).otherwise(expr)
    return expr


@register(
    "q_stratified_sample",
    f"""SELECT doc_id, lang, source, n_chars,
               CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 % 100 AS sample_bucket
        FROM documents
        WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
                 % 100 < {_rate_case_sql()}""",
    doc="per-language stratified sample via deterministic md5 bucket — "
        "reproducible across engines/retries/cluster sizes (never rand())",
    tags=("sample", "filter"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data downsampling: keep `SAMPLE_RATES[lang]`% of each language
    stratum, selected by the first 32 bits of md5(doc_id) — a pure map-side
    filter (no shuffle, no state, plan-pinned), so at 100 TB it rides the scan.
    Unlike df.sample(), reruns and speculative tasks pick identical rows."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    return (
        d.withColumn("sample_bucket", bucket)
         .filter(F.col("sample_bucket") < _rate_case_col())
         .select("doc_id", "lang", "source", "n_chars", "sample_bucket")
    )


# --- q_group_sample: deterministic fixed-size per-group sample ----------------------

GROUP_SAMPLE_K = 20

@register(
    "q_group_sample",
    f"""SELECT event_type, event_id, CAST(rk AS BIGINT) AS rk FROM (
      SELECT event_type, event_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
      FROM events
    ) WHERE rk <= {GROUP_SAMPLE_K}""",
    doc=f"deterministic per-group sample: exactly {GROUP_SAMPLE_K} rows per "
        "group ranked by md5(id) — a seedless reservoir that is identical "
        "across retries, engines, and partitionings",
    tags=("sampling",),
)
def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-per-group sampling without rand(): rank rows inside each
    group by md5 of their id (uniform, deterministic) and keep the first k.
    Spark plans a WindowGroupLimit, which truncates EACH MAP PARTITION to its
    local top-k before the shuffle — so at 100 TB the exchange carries
    ~k·partitions rows per group, not the group's full contents (pinned in
    tests/test_plans.py)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id")
    return (
        e.select("event_type", "event_id")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
    )


# --- q_skew_salted_agg: two-phase salted aggregation over a hot key ------------------

SALT_N = 16

@register(
    "q_skew_salted_agg",
    """SELECT l_returnflag,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY l_returnflag""",
    doc="two-phase salted aggregation over a 3-value (maximally hot) grouping "
        "key: phase 1 shuffles (key, salt) shards, phase 2 merges ~16 rows "
        "per key — answers identical to a plain GROUP BY (the oracle)",
    tags=("skew", "agg"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem grouped by l_returnflag — 3 distinct values over 600k rows at
    sf0.1, the structural hot-key worst case. The salted plan bounds any one
    reducer's load to |key|/16 regardless of skew; decimal sums keep the
    two-phase merge exact (double sums would change with shard boundaries),
    so the result is bit-equal to the oracle's single GROUP BY."""
    from flink_job_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li, ["l_returnflag"], tiebreak_col="l_orderkey",
        aggs={
            "n_rows": F.count(F.lit(1)),
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(18,6)")),
        },
        n_salts=SALT_N,
    )
    return out.select(
        "l_returnflag",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
    )
