"""Operational-insight queries: co-purchase similarity, fraud/quality
digit audits, burst detection, calendar-gap islands, OHLC bars, and
subset-containment dedup.

The reference engine's only analytics are audit scans (SURVEY §2.3); this
pack covers the monitoring and recommendation shapes its users run
downstream, built on the repo's parity discipline: integer/exact-decimal
aggregation first, the engine-sensitive IEEE ops (divide, sqrt) applied
once per output row in a pinned order, deterministic tie-breaks on every
top-k, and serial windows only over cardinality-bounded domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.queries.dedup import (
    DUCK_INTER_CHAIN,
    SHINGLE_MAX_DOC_FREQ,
    doc_shingles,
    intersection_pairs_capped,
)
from flink_job_spark.queries.relational import (
    _OUT4,
    _VDEC,
    _out4_col,
    _vdec_col,
)
from flink_job_spark.sources.tables import load_table

ITEMSIM_MIN_CO = 3       # ignore pairs co-purchased fewer times (noise)
ITEMSIM_TOPK = 25
BURST_SIGMAS = 3.0       # minutes busier than mean + 3 sigma of their day
CONTAIN_THRESHOLD = 0.5  # |A∩B| / min(|A|,|B|)

# Benford expected first-digit probabilities, log10(1+1/d) pre-rounded to 6
# decimals so both engines compare against the IDENTICAL literal (libm log10
# never runs inside a query).
BENFORD_P = {1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691,
             5: 0.079181, 6: 0.066947, 7: 0.057992, 8: 0.051153,
             9: 0.045757}


# --- q_item_similarity: co-purchase cosine (item-item CF) ----------------------

def copurchase_counts(li: DataFrame):
    """(pairs, item_counts, basket_count): the shared co-purchase engine
    under q_item_similarity, q_lift_rules, and q_recommend_topn.

    The basket table collapses to DISTINCT (order, part) once and is
    persisted — it feeds the inverted-index self-join (pairs only ever
    materialize through a shared order, never a cross join), the per-item
    counts, AND the basket total. All counts are exact integers."""
    op = (li.select(F.col("l_orderkey").alias("o"),
                    F.col("l_partkey").alias("p"))
            .distinct().persist())
    ic = op.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    pc = (
        op.select(F.col("o"), F.col("p").alias("p1"))
          .join(op.select(F.col("o"), F.col("p").alias("p2")), "o")
          .filter(F.col("p1") < F.col("p2"))
          .groupBy("p1", "p2")
          .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
          .filter(F.col("co") >= ITEMSIM_MIN_CO)
    )
    nb = op.select("o").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets"))
    return pc, ic, nb



@register(
    "q_item_similarity",
    f"""WITH op AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        ic AS (SELECT p, CAST(COUNT(1) AS BIGINT) AS c FROM op GROUP BY p),
        pc AS (
          SELECT a.p AS p1, b.p AS p2, CAST(COUNT(1) AS BIGINT) AS co
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2
          HAVING COUNT(1) >= {ITEMSIM_MIN_CO})
        SELECT p1, p2, co,
               CAST(co AS DOUBLE) / sqrt(CAST(ca.c * cb.c AS DOUBLE))
                 AS cosine
        FROM pc JOIN ic ca ON ca.p = pc.p1 JOIN ic cb ON cb.p = pc.p2
        ORDER BY CAST(co AS DOUBLE) / sqrt(CAST(ca.c * cb.c AS DOUBLE)) DESC,
                 p1, p2
        LIMIT {ITEMSIM_TOPK}""",
    doc=f"item-item collaborative-filtering similarity: top-{ITEMSIM_TOPK} "
        "part pairs by co-purchase cosine co/sqrt(c1*c2) (pairs co-bought "
        f"≥{ITEMSIM_MIN_CO} times) — the recommender building block, from "
        "integer basket counts with one sqrt+divide per pair",
    tags=("insights", "join", "agg", "recsys", "topk"),
)
def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See :func:`copurchase_counts` for the plan. c1*c2 < 2^53 so the
    cosine's sqrt-then-divide is the only IEEE arithmetic, pinned in the
    same order in the oracle. Per-item count joins broadcast (the item
    aggregate is vocabulary-sized); top-k fuses via TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    pc, ic, _ = copurchase_counts(li)
    ca = ic.select(F.col("p").alias("p1"), F.col("c").alias("c1"))
    cb = ic.select(F.col("p").alias("p2"), F.col("c").alias("c2"))
    cosine = (F.col("co").cast("double")
              / F.sqrt((F.col("c1") * F.col("c2")).cast("double")))
    return (
        pc.join(F.broadcast(ca), "p1").join(F.broadcast(cb), "p2")
          .select("p1", "p2", "co", cosine.alias("cosine"))
          .orderBy(F.col("cosine").desc(), "p1", "p2")
          .limit(ITEMSIM_TOPK)
    )


# --- q_benford: first-digit distribution audit ---------------------------------

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN {p}" for d, p in BENFORD_P.items()) + " END"

@register(
    "q_benford",
    f"""WITH d AS (
          SELECT substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS digit
          FROM orders WHERE o_totalprice >= 1.0),
        c AS (SELECT digit, CAST(COUNT(1) AS BIGINT) AS n FROM d
              GROUP BY digit)
        SELECT digit, n,
               ROUND(CAST(n AS DOUBLE)
                     / CAST(SUM(n) OVER () AS DOUBLE), 6) AS observed_p,
               {_BENFORD_CASE} AS expected_p,
               ROUND(ROUND(CAST(n AS DOUBLE)
                           / CAST(SUM(n) OVER () AS DOUBLE), 6)
                     - {_BENFORD_CASE}, 6) AS excess
        FROM c""",
    doc="Benford first-digit audit of order values: observed vs expected "
        "leading-digit frequencies — the classic fabricated-data detector; "
        "expected probabilities are pre-rounded literals so no libm log10 "
        "runs inside either engine",
    tags=("insights", "audit", "agg", "quality"),
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The digit comes from an EXPLICIT floor-to-bigint then string head —
    cast-to-int rounds-to-nearest in DuckDB and truncates in Spark, the
    floor pins truncation in both. One combine-enabled shuffle to ≤9 digit
    cells; the corpus total rides a 9-row unbounded window (never a second
    scan), and each cell pays one division."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
    c = (o.filter(F.col("o_totalprice") >= 1.0)
          .select(digit.alias("digit"))
          .groupBy("digit")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    total = F.sum("n").over(Window.partitionBy())
    expected = F.when(F.col("digit") == "1", BENFORD_P[1])
    for dd in range(2, 10):
        expected = expected.when(F.col("digit") == str(dd), BENFORD_P[dd])
    obs = F.round(F.col("n").cast("double") / total.cast("double"), 6)
    return c.select(
        "digit", "n",
        obs.alias("observed_p"),
        expected.alias("expected_p"),
        F.round(obs - expected, 6).alias("excess"),
    )


# --- q_burst_minutes: per-day z-score burst detection --------------------------

@register(
    "q_burst_minutes",
    f"""WITH m AS (
          SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
                 date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute,
                 CAST(COUNT(1) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        st AS (
          SELECT d, CAST(COUNT(1) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS s,
                 CAST(SUM(c * c) AS BIGINT) AS ss
          FROM m GROUP BY d)
        SELECT CAST(minute AS TIMESTAMP) AS minute, c AS n_events,
               ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS day_mean,
               ROUND(sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                     / CAST(n AS DOUBLE), 6) AS day_sd
        FROM m JOIN st USING (d)
        WHERE CAST(c AS DOUBLE) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
              + {BURST_SIGMAS} * (sqrt(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
                                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                                  / CAST(n AS DOUBLE))""",
    doc=f"burst detection: minutes whose event count exceeds their day's "
        f"mean + {BURST_SIGMAS:g}σ (population σ from exact integer "
        "moments) — the traffic-anomaly monitor; the threshold expression "
        "is token-identical in both engines so the flag set is exact",
    tags=("insights", "agg", "timeseries", "events"),
)
def q_burst_minutes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two bounded aggregations: minute counts (one combine-enabled
    shuffle), then day moments n/Σc/Σc² over ≤1440 minutes per day. The
    tiny per-day stats broadcast back onto the minute rows; the z-threshold
    compares doubles computed by the identical IEEE sequence on both
    engines, so 'flagged' is never a rounding coin-flip. Integer moments
    stay below 2^53 (counts are per-minute)."""
    e = load_table(spark, sf_dir, "events")
    m = (e.groupBy(F.date_trunc("DAY", F.col("ts")).alias("d"),
                   F.date_trunc("MINUTE", F.col("ts")).alias("minute"))
          .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
          .persist())  # feeds BOTH the day moments and the probe side —
                       # without the barrier Spark scans events twice
    st = m.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"))
    n_d, s_d, ss_d = (F.col(x).cast("double") for x in ("n", "s", "ss"))
    sd = F.sqrt(n_d * ss_d - s_d * s_d) / n_d
    return (
        m.join(F.broadcast(st), "d")
         .filter(F.col("c").cast("double") > s_d / n_d + BURST_SIGMAS * sd)
         .select(F.col("minute").cast("timestamp").alias("minute"),
                 F.col("c").alias("n_events"),
                 F.round(s_d / n_d, 6).alias("day_mean"),
                 F.round(sd, 6).alias("day_sd"))
    )


# --- q_date_gaps: calendar-spine gap islands -----------------------------------

@register(
    "q_date_gaps",
    """WITH days AS (
         SELECT DISTINCT date_trunc('day', o_orderdate) AS d FROM orders
         WHERE o_orderdate IS NOT NULL),
       bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM days),
       spine AS (
         SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
         FROM bounds),
       missing AS (
         SELECT d FROM spine WHERE d NOT IN (SELECT d FROM days)),
       grp AS (
         SELECT d,
                date_diff('day', DATE '1970-01-01', d)
                  - ROW_NUMBER() OVER (ORDER BY d) AS g
         FROM missing)
       SELECT CAST(MIN(d) AS TIMESTAMP) AS gap_start,
              CAST(MAX(d) AS TIMESTAMP) AS gap_end,
              CAST(COUNT(1) AS BIGINT) AS n_days
       FROM grp GROUP BY g""",
    doc="data-freshness gap report: maximal runs of calendar days with NO "
        "orders, found by generating the min-to-max day spine, anti-joining "
        "observed days, and collapsing the misses with gaps-and-islands — "
        "the pipeline-monitoring query that catches silent feed outages",
    tags=("insights", "audit", "window", "timeseries"),
)
def q_date_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spine generates from ONE min/max aggregate row (sequence() on
    the driver-free 1-row frame — never a driver-side range loop), missing
    days fall out of a LEFT ANTI join, and the island id is the classic
    date-ordinal minus row_number constant. Everything after the first
    aggregate operates on calendar-bounded cardinality (≤ days-of-history
    rows), so the serial window is safe at any fact scale."""
    o = load_table(spark, sf_dir, "orders")
    # NULL order dates must not enter the spine NOR the observed set: the
    # oracle's NOT IN would go all-NULL and report zero gaps while the anti
    # join kept reporting every miss — filter them out in BOTH engines
    days = (o.filter(F.col("o_orderdate").isNotNull())
             .select(F.date_trunc("DAY", F.col("o_orderdate")).alias("d"))
             .distinct())
    bounds = days.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"),
                             F.expr("INTERVAL 1 DAY"))).alias("d"))
    missing = spine.join(days, "d", "left_anti")
    g = (F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
         - F.row_number().over(Window.orderBy("d")))
    return (
        missing.withColumn("g", g)
               .groupBy("g")
               .agg(F.min("d").cast("timestamp").alias("gap_start"),
                    F.max("d").cast("timestamp").alias("gap_end"),
                    F.count(F.lit(1)).cast("bigint").alias("n_days"))
               .drop("g")
    )


# --- q_ohlc_bars: hourly open/high/low/close -----------------------------------

@register(
    "q_ohlc_bars",
    """WITH r AS (
         SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value,
                ROW_NUMBER() OVER (
                  PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP))
                  ORDER BY ts, event_id) AS rn,
                COUNT(1) OVER (
                  PARTITION BY date_trunc('hour', CAST(ts AS TIMESTAMP)))
                  AS cnt
         FROM events WHERE event_type = 'purchase')
       SELECT CAST(hour AS TIMESTAMP) AS hour,
              MAX(CASE WHEN rn = 1 THEN value END) AS open,
              MAX(value) AS high, MIN(value) AS low,
              MAX(CASE WHEN rn = cnt THEN value END) AS close,
              CAST(COUNT(1) AS BIGINT) AS n_trades
       FROM r GROUP BY hour""",
    doc="hourly OHLC bars over purchase values: open/close are the "
        "first/last event by (ts, event_id) — a TOTAL order, so the bar "
        "endpoints are engine-deterministic even with tied timestamps — "
        "high/low are plain extremes; the time-series downsampling shape",
    tags=("insights", "window", "timeseries", "agg", "events"),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One hour-partitioned window ranks events by the total order
    (ts, event_id) — first/last-value via rank-1/rank-n conditional
    aggregates rather than first()/last() (whose result is partition-order
    luck) or min_by/max_by on a composite (portability varies). The window
    and the final groupBy share the hour partitioning, so the plan pays one
    exchange; per-hour state is bounded by events-per-hour."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase")
    hour = F.date_trunc("HOUR", F.col("ts"))
    w = Window.partitionBy("hour").orderBy("ts", "event_id")
    wc = Window.partitionBy("hour")
    r = (e.select(hour.alias("hour"), "ts", "event_id", "value")
          .withColumn("rn", F.row_number().over(w))
          .withColumn("cnt", F.count(F.lit(1)).over(wc)))
    return r.groupBy(F.col("hour").cast("timestamp").alias("hour")).agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("value")))
         .alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
    )


# --- q_shingle_containment: subset/quote detection -----------------------------

@register(
    "q_shingle_containment",
    f"""WITH {DUCK_INTER_CHAIN}
    SELECT i.d1, i.d2,
           CAST(i.i AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)
             AS containment
    FROM inter i JOIN sizes sa ON sa.doc_id = i.d1
                 JOIN sizes sb ON sb.doc_id = i.d2
    WHERE CAST(i.i AS DOUBLE) / CAST(least(sa.sz, sb.sz) AS DOUBLE)
          >= {CONTAIN_THRESHOLD}""",
    doc=f"asymmetric near-dup detection: document pairs where the smaller "
        f"doc's shingle set is ≥{CONTAIN_THRESHOLD:g} contained in the "
        "other — catches quotes/excerpts/supersets that symmetric Jaccard "
        "misses when sizes differ (same doc-freq-capped inverted index and "
        "hot-shingle correction as q_ngram_jaccard)",
    tags=("insights", "dedup"),
)
def q_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment C = |A∩B| / min(|A|,|B|): a 20-shingle excerpt fully
    inside a 2000-shingle doc scores 1.0 here but Jaccard 0.01 — the
    complementary metric every corpus-dedup pipeline runs next to Jaccard.
    Reuses :func:`intersection_pairs_capped` (one persisted shingle index,
    candidates only through shared non-hot shingles, exact full-set
    intersection via the hot correction); the single division per pair is
    the only IEEE op. Recall contract: pairs sharing ONLY stop-shingles are
    not candidates — identical to the Jaccard key, by design."""
    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d).persist()
    pairs = intersection_pairs_capped(sh, SHINGLE_MAX_DOC_FREQ)
    containment = (F.col("i").cast("double")
                   / F.least(F.col("sza"), F.col("szb")).cast("double"))
    return (
        pairs.select("d1", "d2", containment.alias("containment"))
             .filter(F.col("containment") >= CONTAIN_THRESHOLD)
    )


# --- q_pareto_cover: smallest revenue-covering part set ------------------------

PARETO_NUM, PARETO_DEN = 4, 5   # keep parts until cum revenue >= 4/5 (80%)

@register(
    "q_pareto_cover",
    f"""WITH pr AS (
          SELECT l_partkey,
                 SUM(CAST(CAST(CAST(l_extendedprice * (1 - l_discount)
                                    AS DOUBLE) AS VARCHAR)
                          AS DECIMAL(38,10))) AS rev
          FROM lineitem GROUP BY l_partkey),
        c AS (
          SELECT l_partkey, rev,
                 SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum,
                 SUM(rev) OVER () AS total
          FROM pr)
        SELECT l_partkey,
               CAST(CAST(ROUND(rev, 4) AS DECIMAL(38,4)) AS DOUBLE)
                 AS revenue,
               ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 6)
                 AS cum_share
        FROM c
        WHERE (cum - rev) * {PARETO_DEN} < total * {PARETO_NUM}""",
    doc=f"Pareto cover: the smallest prefix of parts (by exact-decimal "
        f"revenue, partkey tie-break) whose cumulative revenue reaches "
        f"{PARETO_NUM}/{PARETO_DEN} of the total — the 80/20 shortlist "
        "query; membership is decided by EXACT decimal cross-"
        "multiplication, never a rounded share",
    tags=("insights", "agg", "window", "topk"),
)
def q_pareto_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact stream combines to per-part exact-decimal revenue first
    (one shuffle); the running and grand totals ride windows over that
    bounded aggregate. The crossing row must be IN the answer, so the
    predicate is cum_before < target on exact decimals — comparing a
    rounded double share would flip membership of near-boundary rows
    between engines. The serial ORDER BY window runs over part
    cardinality; at catalog scale split it bucketed two-phase like
    q_skyline_2d (per-bucket prefix sums + broadcast bucket totals)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))) \
        .cast("double").cast("decimal(38,10)")
    pr = li.groupBy("l_partkey").agg(F.sum(rev).alias("rev"))
    wc = (Window.orderBy(F.col("rev").desc(), F.col("l_partkey"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy()
    c = (pr.withColumn("cum", F.sum("rev").over(wc))
           .withColumn("total", F.sum("rev").over(wt)))
    return (
        c.filter((F.col("cum") - F.col("rev")) * PARETO_DEN
                 < F.col("total") * PARETO_NUM)
         .select("l_partkey",
                 F.round(F.col("rev"), 4).cast("decimal(38,4)")
                  .cast("double").alias("revenue"),
                 F.round(F.col("cum").cast("double")
                         / F.col("total").cast("double"), 6)
                  .alias("cum_share"))
    )


# --- q_hhi_concentration: Herfindahl market concentration ----------------------

@register(
    "q_hhi_concentration",
    f"""WITH r AS (
          SELECT c_mktsegment,
                 CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 4)
                           AS DECIMAL(38,4)) AS DOUBLE) / 1000000.0 AS rm
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment, o_custkey),
        m AS (
          SELECT c_mktsegment,
                 CAST(COUNT(1) AS BIGINT) AS n_customers,
                 CAST(CAST(ROUND(SUM({_VDEC.format(x='rm * rm')}), 4)
                           AS DECIMAL(38,4)) AS DOUBLE) AS sumsq,
                 CAST(CAST(ROUND(SUM({_VDEC.format(x='rm')}), 4)
                           AS DECIMAL(38,4)) AS DOUBLE) AS tot
          FROM r GROUP BY c_mktsegment)
        SELECT c_mktsegment, n_customers,
               ROUND(sumsq / (tot * tot), 8) AS hhi
        FROM m""",
    doc="Herfindahl-Hirschman concentration index per market segment: "
        "Σ rᵢ² / (Σ rᵢ)² over per-customer revenue — the market-"
        "concentration audit; algebraically equal to the sum of squared "
        "shares but with ONE division, because summing per-customer "
        "share divisions would be accumulation-order-dependent",
    tags=("insights", "agg", "stats", "join"),
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two combine-enabled shuffles: (segment, customer) exact-decimal
    revenue, then segment moments. Revenues rescale to millions BEFORE
    squaring — rᵢ² at raw magnitude (~10¹⁴) would push the decimal sums
    past the 2⁵³ scaled-integer bound where decimal→double casts diverge
    by 1 ulp between engines (the documented wide-decimal trap); at ~10²
    the scale-4 rounding idiom stays exact. The only IEEE ops are the
    fixed rescale/square/divide chain, token-identical in the oracle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_mktsegment")
    r = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
         .groupBy("c_mktsegment", "o_custkey")
         .agg((_out4_col(F.sum(F.col("o_totalprice").cast("decimal(18,6)")))
               / F.lit(1000000.0)).alias("rm"))
    )
    m = r.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        _out4_col(F.sum(_vdec_col(F.col("rm") * F.col("rm")))).alias("sumsq"),
        _out4_col(F.sum(_vdec_col(F.col("rm")))).alias("tot"),
    )
    return m.select(
        "c_mktsegment", "n_customers",
        F.round(F.col("sumsq") / (F.col("tot") * F.col("tot")), 8)
         .alias("hhi"))


# --- q_gini: inequality coefficient per segment --------------------------------

@register(
    "q_gini",
    f"""WITH x AS (
          SELECT c_mktsegment,
                 CAST(c_acctbal AS DOUBLE) / 1000.0 AS xk,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal, c_custkey) AS i
          FROM customer WHERE c_acctbal > 0.0),
        m AS (
          SELECT c_mktsegment,
                 CAST(COUNT(1) AS BIGINT) AS n,
                 CAST(CAST(ROUND(SUM({_VDEC.format(x='i * xk')}), 4)
                           AS DECIMAL(38,4)) AS DOUBLE) AS s1,
                 CAST(CAST(ROUND(SUM({_VDEC.format(x='xk')}), 4)
                           AS DECIMAL(38,4)) AS DOUBLE) AS sx
          FROM x GROUP BY c_mktsegment)
        SELECT c_mktsegment, n,
               ROUND((2.0 * s1) / (CAST(n AS DOUBLE) * sx)
                     - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6)
                 AS gini
        FROM m""",
    doc="Gini inequality coefficient of positive account balances per "
        "market segment — G = 2Σi·x⁽ᵢ⁾/(nΣx) − (n+1)/n over the "
        "(balance, custkey)-ranked values; the rank-weighted sums ride "
        "exact decimal detours so G is engine-exact to the last division",
    tags=("insights", "agg", "stats", "window"),
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank i comes from a segment-partitioned window with a total
    order (balance, custkey) — ties would otherwise permute i·x between
    engines. i·x products rescale balances to thousands so the decimal
    sums stay inside the exact scale-4 casting envelope at any customer
    count; the closed-form G then costs three divisions in pinned order.
    Per-segment ranking serializes within a segment — at extreme
    cardinality switch to the two-phase bucketed ranking of
    q_skyline_2d (bucket offsets + in-bucket ranks)."""
    cst = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    x = (cst.filter(F.col("c_acctbal") > 0.0)
            .select("c_mktsegment",
                    (F.col("c_acctbal").cast("double") / F.lit(1000.0))
                    .alias("xk"),
                    F.row_number().over(w).alias("i")))
    m = x.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _out4_col(F.sum(_vdec_col(F.col("i") * F.col("xk")))).alias("s1"),
        _out4_col(F.sum(_vdec_col(F.col("xk")))).alias("sx"),
    )
    n_d = F.col("n").cast("double")
    return m.select(
        "c_mktsegment", "n",
        F.round((F.lit(2.0) * F.col("s1")) / (n_d * F.col("sx"))
                - (n_d + F.lit(1.0)) / n_d, 6).alias("gini"))


# --- q_lift_rules: association-rule support/confidence/lift --------------------

LIFT_TOPK = 20

@register(
    "q_lift_rules",
    f"""WITH op AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        ic AS (SELECT p, CAST(COUNT(1) AS BIGINT) AS c FROM op GROUP BY p),
        nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM op),
        pc AS (
          SELECT a.p AS p1, b.p AS p2, CAST(COUNT(1) AS BIGINT) AS co
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2
          HAVING COUNT(1) >= {ITEMSIM_MIN_CO})
        SELECT p1, p2, co,
               ROUND(CAST(co AS DOUBLE) / CAST(n AS DOUBLE), 6) AS support,
               ROUND(CAST(co AS DOUBLE) / CAST(ca.c AS DOUBLE), 6)
                 AS confidence,
               ROUND((CAST(co AS DOUBLE) * CAST(n AS DOUBLE))
                     / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
        FROM pc JOIN ic ca ON ca.p = pc.p1 JOIN ic cb ON cb.p = pc.p2
             CROSS JOIN nb
        ORDER BY (CAST(co AS DOUBLE) * CAST(n AS DOUBLE))
                 / CAST(ca.c * cb.c AS DOUBLE) DESC, p1, p2
        LIMIT {LIFT_TOPK}""",
    doc=f"association rules: top-{LIFT_TOPK} part pairs by lift "
        "(co·N/(c1·c2)) with support and p1→p2 confidence — the "
        "market-basket rule miner on the same exact basket counts as "
        "q_item_similarity; each metric is one pinned division",
    tags=("insights", "join", "agg", "recsys", "topk"),
)
def q_lift_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same :func:`copurchase_counts` engine (persisted basket table,
    inverted-index pair join, broadcast item counts); the basket total is
    a 1-row broadcast cross join. lift > 1 means the pair co-occurs more
    than independence predicts — all three metrics divide exact integers
    once, so the ranking is engine-deterministic with the (p1, p2)
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    pc, ic, nb = copurchase_counts(li)
    ca = ic.select(F.col("p").alias("p1"), F.col("c").alias("c1"))
    cb = ic.select(F.col("p").alias("p2"), F.col("c").alias("c2"))
    n_d = F.col("n_baskets").cast("double")
    lift = ((F.col("co").cast("double") * n_d)
            / (F.col("c1") * F.col("c2")).cast("double"))
    return (
        pc.join(F.broadcast(ca), "p1").join(F.broadcast(cb), "p2")
          .crossJoin(F.broadcast(nb))
          .select("p1", "p2", "co",
                  F.round(F.col("co").cast("double") / n_d, 6)
                   .alias("support"),
                  F.round(F.col("co").cast("double")
                          / F.col("c1").cast("double"), 6)
                   .alias("confidence"),
                  F.round(lift, 6).alias("lift"),
                  lift.alias("_lift_raw"))
          .orderBy(F.col("_lift_raw").desc(), "p1", "p2")
          .limit(LIFT_TOPK)
          .drop("_lift_raw")
    )


# --- q_recommend_topn: item-CF recommendations ---------------------------------

REC_TOPN = 3

@register(
    "q_recommend_topn",
    f"""WITH op AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        ic AS (SELECT p, CAST(COUNT(1) AS BIGINT) AS c FROM op GROUP BY p),
        pc AS (
          SELECT a.p AS p1, b.p AS p2, CAST(COUNT(1) AS BIGINT) AS co
          FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
          GROUP BY 1, 2
          HAVING COUNT(1) >= {ITEMSIM_MIN_CO}),
        sims AS (
          SELECT p1, p2,
                 {_VDEC.format(x='CAST(co AS DOUBLE) / sqrt(CAST(ca.c * cb.c AS DOUBLE))')}
                   AS cos
          FROM pc JOIN ic ca ON ca.p = pc.p1 JOIN ic cb ON cb.p = pc.p2),
        edges AS (
          SELECT p1 AS owned, p2 AS cand, cos FROM sims
          UNION ALL
          SELECT p2 AS owned, p1 AS cand, cos FROM sims),
        hist AS (
          SELECT DISTINCT o_custkey AS cust, l_partkey AS p
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        scored AS (
          SELECT h.cust, e.cand,
                 {_OUT4.format(s='SUM(e.cos)')} AS score,
                 CAST(COUNT(1) AS BIGINT) AS n_paths
          FROM hist h JOIN edges e ON e.owned = h.p
          WHERE NOT EXISTS (SELECT 1 FROM hist h2
                            WHERE h2.cust = h.cust AND h2.p = e.cand)
          GROUP BY h.cust, e.cand),
        ranked AS (
          SELECT cust, cand, score, n_paths,
                 ROW_NUMBER() OVER (PARTITION BY cust
                                    ORDER BY score DESC, cand) AS rn
          FROM scored)
        SELECT cust, cand, score, n_paths, CAST(rn AS BIGINT) AS rn
        FROM ranked WHERE rn <= {REC_TOPN}""",
    doc=f"item-CF recommendations: top-{REC_TOPN} unowned parts per "
        "customer, scored by the exact-decimal SUM of co-purchase cosines "
        "from the customer's owned parts — the end-to-end recommender on "
        "the q_item_similarity graph, with owned items anti-joined out",
    tags=("insights", "join", "agg", "recsys", "window", "topk"),
)
def q_recommend_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop scoring: the similarity edge list (both directions of each
    undirected pair) joins the customer→part ownership table on the owned
    end, candidate scores accumulate as EXACT decimals (each cosine takes
    the repr-detour — a double SUM would be accumulation-order-dependent
    across partitions), owned candidates fall out of an anti join, and a
    per-customer rank keeps the top-{REC_TOPN} with a candidate tie-break.
    The edge list is pair-count bounded (broadcastable); ownership
    shuffles once on the part key and once for the (cust, cand) rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pc, ic, _ = copurchase_counts(li)
    ca = ic.select(F.col("p").alias("p1"), F.col("c").alias("c1"))
    cb = ic.select(F.col("p").alias("p2"), F.col("c").alias("c2"))
    cos = _vdec_col(F.col("co").cast("double")
                    / F.sqrt((F.col("c1") * F.col("c2")).cast("double")))
    sims = (pc.join(F.broadcast(ca), "p1").join(F.broadcast(cb), "p2")
              .select("p1", "p2", cos.alias("cos")))
    edges = (sims.select(F.col("p1").alias("owned"),
                         F.col("p2").alias("cand"), "cos")
                 .unionByName(
                     sims.select(F.col("p2").alias("owned"),
                                 F.col("p1").alias("cand"), "cos")))
    hist = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
              .select(F.col("o_custkey").alias("cust"),
                      F.col("l_partkey").alias("p"))
              .distinct().persist())
    owned_pairs = hist.select(F.col("cust").alias("oc"),
                              F.col("p").alias("op"))
    # r10 measured-and-rejected (VERDICT r9 #6): aggregating BEFORE the
    # ownership anti join commutes exactly (the anti join removes whole
    # (cust, cand) groups) and would shuffle fewer rows at data scale, but
    # the same-session A/B at sf0.1 read old 3.45 s vs new 3.63 s medians
    # (6 alternating reps) — the map-side partial aggregation of the path
    # explosion costs more here than the anti join's post-shuffle sort
    # saves. Kept the anti-join-first form; revisit only with a real
    # cluster measurement.
    scored = (
        hist.join(F.broadcast(edges), hist["p"] == F.col("owned"))
            .join(owned_pairs,
                  (F.col("cust") == F.col("oc"))
                  & (F.col("cand") == F.col("op")),
                  "left_anti")
            .groupBy("cust", "cand")
            .agg(_out4_col(F.sum("cos")).alias("score"),
                 F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    )
    w = Window.partitionBy("cust").orderBy(F.col("score").desc(),
                                           F.col("cand"))
    return (scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
                  .filter(F.col("rn") <= REC_TOPN))


# --- q_twap: time-weighted average value per (event_type, day) ---------------------

# repr-detour into DECIMAL(19,10): wide enough to force DuckDB's INT128
# decimal storage (width 18 multiplies in raw int64 and overflows on
# value x microsecond products) yet narrow enough that the product with
# the DECIMAL(11,0) duration -> (31,10) sums exactly inside DECIMAL(38,10)
_TWAP_VAL = "CAST(CAST(CAST({x} AS DOUBLE) AS VARCHAR) AS DECIMAL(19,10))"


@register(
    "q_twap",
    f"""WITH ev AS (
          SELECT event_type, date_trunc('day', ts) AS day, ts, event_id,
                 {_TWAP_VAL.format(x='value')} AS v
          FROM events WHERE value IS NOT NULL),
        seg AS (
          SELECT event_type, day, v,
                 epoch_us(COALESCE(
                     lead(ts) OVER (PARTITION BY event_type, day
                                    ORDER BY ts, event_id),
                     day + INTERVAL 1 DAY) ) - epoch_us(ts) AS dur_us
          FROM ev)
        SELECT event_type, CAST(day AS TIMESTAMP) AS day,
               CAST(COUNT(1) AS BIGINT) AS n_events,
               CAST(SUM(dur_us // 1000000) AS BIGINT) AS active_s,
               CAST(CAST(ROUND(SUM(v * CAST(dur_us // 1000000 AS DECIMAL(5,0))), 4)
                         AS DECIMAL(38,4)) AS DOUBLE)
                 / CAST(NULLIF(SUM(dur_us // 1000000), 0) AS DOUBLE) AS twap
        FROM seg GROUP BY event_type, day""",
    doc="TWAP: time-weighted average of events.value per (event_type, day) — "
        "each observation holds until the next one of the same type that day "
        "(last one holds to midnight), weights are exact integer microsecond "
        "durations, the value x duration products accumulate in exact decimal, "
        "and the ONE IEEE division lands last — the fair average for "
        "irregularly-sampled gauges (price feeds, queue depths) where the "
        "arithmetic mean over-weights busy periods",
    tags=("analytics", "timeseries", "window", "agg"),
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hold-until-next weighting: LEAD over the (ts, event_id) total order
    within a (type, day) partition, defaulting to midnight, makes every
    day's weights sum to [first observation -> midnight] exactly. One
    shuffle on (event_type, day) carries both the LEAD window and the
    rollup. Same-ts observations get zero duration except the last in the
    total order — deterministic in both engines. The weighted sum rides
    DECIMAL(18,10) x DECIMAL(14,0) products (exact, associative — a double
    dot product would be partition-order-dependent); the division is the
    plan's only IEEE op. Weights are whole seconds (floored
    integer division of the exact microsecond span — sub-second residue is
    dropped by definition) and the weighted sum exits through the scale-4
    _OUT4 envelope, keeping BOTH division operands exactly representable
    doubles: decimal->double conversion at microsecond-weighted magnitudes
    is where the engines drift by 1 ulp. A day whose only
    observations sit inside the final second floors to zero total weight —
    TWAP is NULL there (try_divide / NULLIF), not a job-killing ANSI error."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    day = F.date_trunc("DAY", F.col("ts"))
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    ev = e.select(
        "event_type", day.alias("day"), "ts", "event_id",
        F.col("value").cast("double").cast("string")
         .cast("decimal(19,10)").alias("v"),
    )
    seg = ev.select(
        "event_type", "day", "v",
        (us(F.coalesce(F.lead("ts").over(w),
                       F.col("day") + F.expr("INTERVAL 1 DAY")))
         - us(F.col("ts"))).alias("dur_us"),
    )
    seg = seg.withColumn("dur_s", F.expr("dur_us div 1000000"))
    return seg.groupBy("event_type", F.col("day").cast("timestamp").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("dur_s").cast("bigint").alias("active_s"),
        F.try_divide(
            F.round(F.sum(F.col("v") * F.col("dur_s").cast("decimal(5,0)")), 4)
             .cast("decimal(38,4)").cast("double"),
            F.nullif(F.sum("dur_s"), F.lit(0)).cast("double")).alias("twap"),
    )


# --- q_bitmap_active_days: bit_or day-of-month bitmap rollup --------------------

@register(
    "q_bitmap_active_days",
    """WITH per AS (
          SELECT o_custkey,
                 CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
                   AS ym,
                 bit_or(CAST(1 AS BIGINT) << (dayofmonth(o_orderdate) - 1))
                   AS day_bitmap
          FROM orders GROUP BY 1, 2)
       SELECT ym,
              CAST(COUNT(1) AS BIGINT) AS n_customers,
              CAST(SUM(bit_count(day_bitmap)) AS BIGINT) AS total_active_days,
              CAST(MAX(bit_count(day_bitmap)) AS BIGINT) AS max_active_days,
              CAST(SUM(CASE WHEN bit_count(day_bitmap) >= 2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS multi_day_customers
       FROM per GROUP BY ym ORDER BY ym""",
    doc="bitmap-index rollup: per (customer, month) the active order days "
        "packed into one int64 via bit_or(1 << day-1), then a monthly "
        "popcount rollup — the compressed-bitmap presence idiom that keeps "
        "distinct-day state at 8 bytes/group instead of a day list",
    tags=("insights", "bitmap", "agg"),
)
def q_bitmap_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-month fits an int64 bitmap (31 < 64), so DISTINCT days per
    (customer, month) collapses to a bit_or aggregate — combine-enabled,
    constant 8-byte state, no exact-distinct hash set. At 100 TB the first
    shuffle is the only data-sized exchange; the month rollup above it is
    ~thousands of rows. bit_count(xor-free popcount) stays in codegen in
    both engines; all outputs are exact integers."""
    o = load_table(spark, sf_dir, "orders")
    per = (
        o.select(
            "o_custkey",
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint").alias("ym"),
            F.expr("shiftleft(CAST(1 AS BIGINT), "
                   "dayofmonth(o_orderdate) - 1)").alias("day_bit"),
        )
        .groupBy("o_custkey", "ym")
        .agg(F.bit_or("day_bit").alias("day_bitmap"))
    )
    pc = F.bit_count("day_bitmap")
    return (
        per.groupBy("ym")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                F.sum(pc).cast("bigint").alias("total_active_days"),
                F.max(pc).cast("bigint").alias("max_active_days"),
                F.sum(F.when(pc >= 2, 1).otherwise(0)).cast("bigint")
                 .alias("multi_day_customers"))
           .orderBy("ym")
    )


# --- q_bitmap_overlap: audience intersection via word-indexed bitmaps -----------

@register(
    "q_bitmap_overlap",
    """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        sizes AS (SELECT event_type, CAST(COUNT(1) AS BIGINT) AS n
                  FROM du GROUP BY 1),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(COUNT(1) AS BIGINT) AS n_common
          FROM du a JOIN du b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2)
       SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
              CAST(n_common AS DOUBLE)
                / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
       FROM pairs
       JOIN sizes sa ON sa.event_type = type_a
       JOIN sizes sb ON sb.event_type = type_b
       ORDER BY type_a, type_b""",
    doc="audience overlap via bitmap indexes: per event_type the user set "
        "packs into 64-bit words (word = id>>6, bit_or of 1<<(id&63)); "
        "pairwise intersection is a word-aligned equi-join + "
        "popcount(bit_and) — set intersection at 8 bytes per 64 users, "
        "never a row-level self-join",
    tags=("insights", "bitmap", "join", "agg"),
)
def q_bitmap_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The roaring-bitmap-index pattern in pure relational algebra: the
    distinct (segment, member) set compresses into word-indexed int64
    bitmaps, after which EVERY pairwise intersection costs
    |words_a ∩ words_b| ANDs + popcounts instead of a member-level join —
    at 100 TB the member-level shuffle happens ONCE (building the
    bitmaps, combine-enabled bit_or), and the segment-pair stage touches
    8 bytes per 64 members. The oracle states the same answer as the
    member self-join it replaces; jaccard divides exact BIGINTs once.
    Sizes come from the same bitmaps (sum of popcounts), so the bitmap is
    the single source of truth."""
    e = load_table(spark, sf_dir, "events")
    masks = (
        e.select("event_type",
                 F.expr("shiftright(user_id, 6)").alias("w"),
                 F.expr("shiftleft(CAST(1 AS BIGINT), "
                        "CAST(user_id % 64 AS INT))").alias("bit"))
         .groupBy("event_type", "w")
         .agg(F.bit_or("bit").alias("mask"))
         .persist())
    sizes = (masks.groupBy("event_type")
                  .agg(F.sum(F.bit_count("mask")).cast("bigint").alias("n")))
    a = masks.select(F.col("event_type").alias("type_a"), "w",
                     F.col("mask").alias("ma"))
    b = masks.select(F.col("event_type").alias("type_b"), "w",
                     F.col("mask").alias("mb"))
    pairs = (
        a.join(b, ["w"])
         .filter(F.col("type_a") < F.col("type_b"))
         .groupBy("type_a", "type_b")
         .agg(F.sum(F.bit_count(F.col("ma").bitwiseAND(F.col("mb"))))
               .cast("bigint").alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"),
                      F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"),
                      F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
             .select("type_a", "type_b", "n_a", "n_b", "n_common",
                     (F.col("n_common").cast("double")
                      / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
                        .cast("double")).alias("jaccard"))
             .orderBy("type_a", "type_b")
    )
