"""Behavioral and growth-curve analytics: session path mining, grouped
regression, seasonal indices, and corpus vocabulary growth.

Fourth-wave north-star extensions (the reference has no analytics at all,
SURVEY §2.3). House discipline throughout: sequences are ordered by a TOTAL
order (ts, event_id) so path strings are engine-deterministic; calendar
features come from epoch-day arithmetic, never engine dayofweek() enums
(q_seasonality precedent); regression/ratio statistics aggregate exact
decimal moments and spend their IEEE divisions last, in an op order the
oracle mirrors; growth curves turn "running distinct" — undistributable as
stated — into a per-word first-occurrence aggregate plus a bounded cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.functions.text import words, words_duck, ws_token_count, ws_token_count_duck
from flink_job_spark.queries import register
from flink_job_spark.queries.relational import _OUT4, _VDEC, _out4_col, _vdec_col
from flink_job_spark.queries.windows import SESSION_GAP_MIN
from flink_job_spark.sources.tables import fan_out_by, load_table

PATH_LEN = 3        # leading events kept per session path
PATH_TOPK = 15
VOCAB_CHECKPOINT = 50   # vocabulary-growth curve sampled every N documents


# --- q_session_paths: top entry paths through the product ----------------------

@register(
    "q_session_paths",
    f"""WITH flagged AS (
         SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                CASE WHEN CAST(ts AS TIMESTAMP)
                          - lag(CAST(ts AS TIMESTAMP), 1, TIMESTAMP '1970-01-01')
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '{SESSION_GAP_MIN} minutes'
                     THEN 1 ELSE 0 END AS new_session
         FROM events),
       islands AS (
         SELECT user_id, event_type, ts, event_id,
                SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
         FROM flagged),
       ranked AS (
         SELECT user_id, sid, event_type,
                ROW_NUMBER() OVER (PARTITION BY user_id, sid
                                   ORDER BY ts, event_id) AS rn
         FROM islands),
       paths AS (
         SELECT concat_ws('>',
                  MAX(CASE WHEN rn = 1 THEN event_type END),
                  MAX(CASE WHEN rn = 2 THEN event_type END),
                  MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
         FROM ranked WHERE rn <= {PATH_LEN}
         GROUP BY user_id, sid)
       SELECT path, CAST(COUNT(1) AS BIGINT) AS n_sessions
       FROM paths GROUP BY path
       ORDER BY COUNT(1) DESC, path
       LIMIT {PATH_TOPK}""",
    doc=f"session path mining: the top-{PATH_TOPK} opening event sequences "
        f"(first {PATH_LEN} events of each {SESSION_GAP_MIN}-minute-gap "
        "session, '>'-joined) — the clickstream entry-path report; paths "
        "are deterministic because every ordering is the (ts, event_id) "
        "total order",
    tags=("analytics", "window", "session", "topk"),
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (the q_session_window oracle's own
    construction), a per-session rank, and the path assembled by rank-slot
    conditional aggregates — concat_ws drops NULL slots in both engines, so
    1- and 2-event sessions produce 'view' / 'view>click' rather than
    dangling separators. Both windows and the session rollup share the
    user_id partitioning; the path count is one more combine-enabled
    shuffle on a tiny domain; top-k fuses."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ timestamps don't cast to numbers — epoch µs via the LTZ detour
    # (session TZ is UTC, value-preserving); the lag default mirrors the
    # oracle's 1970 sentinel so the first event always opens a session
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    prev = F.coalesce(F.lag(F.col("ts"), 1).over(wu),
                      F.lit("1970-01-01").cast("timestamp_ntz"))
    flagged = e.select(
        "user_id", "event_id", "event_type", "ts",
        F.when(us(F.col("ts")) - us(prev)
               > SESSION_GAP_MIN * 60 * 1_000_000, 1)
         .otherwise(0).alias("new_session"))
    islands = flagged.withColumn(
        "sid", F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, 0)))
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    ranked = islands.withColumn("rn", F.row_number().over(ws))
    slot = lambda i: F.max(F.when(F.col("rn") == i, F.col("event_type")))  # noqa: E731
    paths = (
        ranked.filter(F.col("rn") <= PATH_LEN)
              .groupBy("user_id", "sid")
              .agg(F.concat_ws(">", *[slot(i) for i in
                                      range(1, PATH_LEN + 1)]).alias("path"))
    )
    return (
        paths.groupBy("path")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
             .orderBy(F.col("n_sessions").desc(), "path")
             .limit(PATH_TOPK)
    )


# --- q_group_ols_slope: per-group simple regression ----------------------------

@register(
    "q_group_ols_slope",
    f"""WITH m AS (
         SELECT p_brand,
                CAST(l_quantity AS DECIMAL(18,6)) AS x,
                CAST(l_extendedprice AS DECIMAL(18,6)) AS y,
                {_VDEC.format(x='l_quantity * l_extendedprice')} AS xy,
                {_VDEC.format(x='l_quantity * l_quantity')} AS xx
         FROM lineitem JOIN part ON l_partkey = p_partkey)
       SELECT p_brand, CAST(COUNT(1) AS BIGINT) AS n,
              ROUND((CAST(COUNT(1) AS DOUBLE) * {_OUT4.format(s='SUM(xy)')}
                     - {_OUT4.format(s='SUM(x)')} * {_OUT4.format(s='SUM(y)')})
                    / (CAST(COUNT(1) AS DOUBLE) * {_OUT4.format(s='SUM(xx)')}
                       - {_OUT4.format(s='SUM(x)')} * {_OUT4.format(s='SUM(x)')}),
                    6) AS slope,
              ROUND(({_OUT4.format(s='SUM(y)')}
                     - ((CAST(COUNT(1) AS DOUBLE) * {_OUT4.format(s='SUM(xy)')}
                         - {_OUT4.format(s='SUM(x)')} * {_OUT4.format(s='SUM(y)')})
                        / (CAST(COUNT(1) AS DOUBLE) * {_OUT4.format(s='SUM(xx)')}
                           - {_OUT4.format(s='SUM(x)')} * {_OUT4.format(s='SUM(x)')}))
                       * {_OUT4.format(s='SUM(x)')})
                    / CAST(COUNT(1) AS DOUBLE), 6) AS intercept
       FROM m GROUP BY p_brand""",
    doc="per-brand simple OLS of price on quantity: slope and intercept "
        "from the five exact decimal moments in ONE grouped pass — the "
        "grouped-regression sibling of the global q_linreg_moments; the "
        "engine-sensitive divisions happen once per group in pinned order",
    tags=("analytics", "ml", "stats", "agg", "join"),
)
def q_group_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle: part's brand column broadcasts onto lineitem, the five
    moments (n, Σx, Σy, Σxy, Σx²) partial-aggregate map-side, and the
    closed-form slope/intercept is a fixed double expression over the
    scale-4-rounded exact sums — the UNROUNDED slope feeds the intercept
    so the published pair is self-consistent, and both round only at
    output. Built-in regr_slope() accumulates floats in partition order —
    unusable for parity."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
          .select("p_brand",
                  F.col("l_quantity").cast("decimal(18,6)").alias("x"),
                  F.col("l_extendedprice").cast("decimal(18,6)").alias("y"),
                  _vdec_col(F.col("l_quantity") * F.col("l_extendedprice"))
                    .alias("xy"),
                  _vdec_col(F.col("l_quantity") * F.col("l_quantity"))
                    .alias("xx"))
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = _out4_col(F.sum("x")), _out4_col(F.sum("y"))
    sxy, sxx = _out4_col(F.sum("xy")), _out4_col(F.sum("xx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return m.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"))


# --- q_seasonal_index: day-of-week demand index --------------------------------

@register(
    "q_seasonal_index",
    f"""WITH daily AS (
         SELECT date_trunc('day', o_orderdate) AS day,
                CAST((datediff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) + 3) % 7
                     AS BIGINT) AS dow,
                SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
         FROM orders GROUP BY 1, 2),
       dw AS (
         SELECT dow, CAST(COUNT(1) AS BIGINT) AS n_days,
                {_OUT4.format(s='SUM(rev)')} AS s
         FROM daily GROUP BY dow),
       tot AS (
         SELECT CAST(SUM(n_days) AS BIGINT) AS n_all,
                {_OUT4.format(s='SUM(CAST(CAST(s AS VARCHAR) AS DECIMAL(38,10)))')}
                  AS s_all
         FROM dw)
       SELECT dow, n_days,
              ROUND(s / CAST(n_days AS DOUBLE), 4) AS mean_rev,
              ROUND((s / CAST(n_days AS DOUBLE))
                    / (s_all / CAST(n_all AS DOUBLE)), 6) AS seasonal_index
       FROM dw CROSS JOIN tot""",
    doc="day-of-week seasonal index: each weekday's mean daily revenue as "
        "a ratio to the overall mean daily revenue — the demand-planning "
        "multiplier; day-of-week from epoch-day arithmetic ((d+3) mod 7, "
        "0=Monday) because engine dayofweek() numbering disagrees",
    tags=("analytics", "agg", "calendar", "timeseries"),
)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three bounded stages: exact-decimal day totals (one fact shuffle),
    a 7-row weekday rollup, and a 1-row grand total broadcast back as a
    cross join. The index divides two means computed by the identical
    pinned sequence; the grand total re-sums the weekday subtotals through
    the repr-decimal route so both engines add the same seven numbers."""
    o = load_table(spark, sf_dir, "orders")
    dow = F.pmod(
        F.datediff(F.to_date("o_orderdate"),
                   F.lit("1970-01-01").cast("date")) + 3, 7).cast("bigint")
    daily = (
        o.groupBy(F.date_trunc("DAY", F.col("o_orderdate")).alias("day"),
                  dow.alias("dow"))
         .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
               .alias("rev"))
    )
    dw = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _out4_col(F.sum("rev")).alias("s"))
    tot = dw.agg(
        F.sum("n_days").cast("bigint").alias("n_all"),
        _out4_col(F.sum(F.col("s").cast("string").cast("decimal(38,10)")))
          .alias("s_all"))
    mean_rev = F.col("s") / F.col("n_days").cast("double")
    mean_all = F.col("s_all") / F.col("n_all").cast("double")
    return dw.crossJoin(F.broadcast(tot)).select(
        "dow", "n_days",
        F.round(mean_rev, 4).alias("mean_rev"),
        F.round(mean_rev / mean_all, 6).alias("seasonal_index"))


# --- q_vocab_growth: Heaps-law corpus growth curve ------------------------------

@register(
    "q_vocab_growth",
    f"""WITH firsts AS (
         SELECT w, MIN(doc_id) AS first_doc
         FROM (SELECT doc_id, unnest({words_duck('text')}) AS w
               FROM documents)
         GROUP BY w),
       new_words AS (
         SELECT first_doc AS doc_id, CAST(COUNT(1) AS BIGINT) AS nw
         FROM firsts GROUP BY first_doc),
       per_doc AS (
         SELECT d.doc_id, {ws_token_count_duck('d.text')} AS toks,
                COALESCE(nw.nw, 0) AS nw
         FROM documents d LEFT JOIN new_words nw ON nw.doc_id = d.doc_id),
       cum AS (
         SELECT doc_id,
                CAST(SUM(toks) OVER (ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS cum_tokens,
                CAST(SUM(nw) OVER (ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS cum_vocab
         FROM per_doc)
       SELECT doc_id, cum_tokens, cum_vocab
       FROM cum WHERE doc_id % {VOCAB_CHECKPOINT} = {VOCAB_CHECKPOINT - 1}""",
    doc=f"vocabulary growth curve (Heaps' law): cumulative distinct words "
        f"vs cumulative tokens at every {VOCAB_CHECKPOINT}th document in "
        "doc_id order — the corpus-diversity diagnostic; 'running "
        "distinct' is made distributable by charging each word to its "
        "FIRST document and cumsumming those counts",
    tags=("analytics", "text", "window", "prep"),
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a document order cannot be distributed
    as stated, but vocab(d) = |{words first seen at doc ≤ d}| — so one
    word→min(doc_id) shuffle (combine-enabled), a per-doc new-word count,
    and a cumsum over the DOCUMENT-bounded spine replace it exactly. The
    serial window walks docs, not words; at corpus scale checkpoint the
    spine into buckets and prefix-sum bucket subtotals (q_skyline_2d's
    two-phase trick). Pure integers end to end."""
    d = load_table(spark, sf_dir, "documents")
    firsts = (
        d.select("doc_id", F.explode(words("text")).alias("w"))
         .groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    )
    new_words = (firsts.groupBy(F.col("first_doc").alias("doc_id"))
                       .agg(F.count(F.lit(1)).cast("bigint").alias("nw")))
    per_doc = (
        d.select("doc_id", ws_token_count("text").alias("toks"))
         .join(new_words, "doc_id", "left")
         .select("doc_id", "toks",
                 F.coalesce(F.col("nw"), F.lit(0)).alias("nw"))
    )
    wc = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_doc.select(
        "doc_id",
        F.sum("toks").over(wc).cast("bigint").alias("cum_tokens"),
        F.sum("nw").over(wc).cast("bigint").alias("cum_vocab"))
    return cum.filter(
        F.col("doc_id") % VOCAB_CHECKPOINT == VOCAB_CHECKPOINT - 1)


# --- q_holt_forecast: Holt linear-trend smoothing -------------------------------

@register(
    "q_holt_forecast",
    f"""WITH RECURSIVE daily AS (
         SELECT c_mktsegment AS seg, date_trunc('day', o_orderdate) AS day,
                {_OUT4.format(s='SUM(CAST(o_totalprice AS DECIMAL(18,6)))')}
                  AS x
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2),
       s AS (
         SELECT seg, day, x,
                ROW_NUMBER() OVER (PARTITION BY seg ORDER BY day) AS rn
         FROM daily),
       h(seg, day, x, rn, l, b) AS (
         SELECT seg, day, x, rn, x, CAST(0.0 AS DOUBLE) FROM s WHERE rn = 1
         UNION ALL
         SELECT s.seg, s.day, s.x, s.rn,
                (s.x + (h.l + h.b)) / 2,
                (((s.x + (h.l + h.b)) / 2 - h.l) + h.b) / 2
         FROM s JOIN h ON s.seg = h.seg AND s.rn = h.rn + 1)
       SELECT seg AS c_mktsegment, CAST(day AS TIMESTAMP) AS day, x,
              l AS level, b AS trend, l + b AS forecast
       FROM h""",
    doc="Holt linear-trend smoothing (alpha = beta = 1/2) of each "
        "segment's daily revenue: level/trend recurrences built ONLY from "
        "adds, subtracts and exact halvings, so the whole forecast series "
        "is engine-exact unrounded — grouped pandas scan vs recursive-CTE "
        "oracle; the one-step-ahead forecast is level + trend",
    tags=("analytics", "timeseries", "pandas", "stateful"),
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two coupled sequential recurrences (level, trend) — the forecasting
    sibling of q_ema_pandas, impossible for any window frame. alpha = beta
    = 1/2 keeps every step to IEEE adds plus exponent decrements, so
    python's C doubles, Spark, and DuckDB's recursive CTE agree BIT-FOR-BIT
    and the output is deliberately unrounded (the halving-tie round()
    trap). One Arrow group per segment; day totals exit the exact decimal
    sum through the shared scale-4 rendering before the recurrence so both
    engines smooth the identical x series."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_mktsegment")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
         .groupBy(F.col("c_mktsegment"),
                  F.date_trunc("DAY", F.col("o_orderdate")).alias("day"))
         .agg(_out4_col(F.sum(F.col("o_totalprice").cast("decimal(18,6)")))
               .alias("x"))
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ls, bs = [], []
        level = trend = None
        for x in pdf["x"]:
            x = float(x)
            if level is None:
                level, trend = x, 0.0
            else:
                new_level = (x + (level + trend)) / 2
                trend = ((new_level - level) + trend) / 2
                level = new_level
            ls.append(level)
            bs.append(trend)
        pdf["level"] = ls
        pdf["trend"] = bs
        pdf["forecast"] = [lv + tr for lv, tr in zip(ls, bs)]
        return pdf

    return (
        daily.groupBy("c_mktsegment").applyInPandas(
            holt, "c_mktsegment string, day timestamp_ntz, x double, "
                  "level double, trend double, forecast double")
             .select("c_mktsegment", F.col("day").cast("timestamp")
                     .alias("day"), "x", "level", "trend", "forecast")
    )


# --- q_stock_balance: clamped running inventory balance ------------------------------

STOCK_SUPP_MAX = 25  # suppliers tracked (bounds the oracle's recursion width)


@register(
    "q_stock_balance",
    f"""WITH RECURSIVE s AS (
         SELECT l_suppkey AS supp,
                CASE WHEN l_returnflag = 'R' THEN l_quantity
                     ELSE -l_quantity END AS delta,
                ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey,
                                            l_linenumber) AS rn
         FROM lineitem WHERE l_suppkey <= {STOCK_SUPP_MAX}),
       h(supp, rn, bal, peak, n_clamped) AS (
         SELECT supp, rn,
                GREATEST(CAST(0 AS DOUBLE), delta),
                GREATEST(CAST(0 AS DOUBLE), delta),
                CASE WHEN delta < 0 THEN 1 ELSE 0 END
         FROM s WHERE rn = 1
         UNION ALL
         SELECT s.supp, s.rn,
                GREATEST(CAST(0 AS DOUBLE), h.bal + s.delta),
                GREATEST(h.peak,
                         GREATEST(CAST(0 AS DOUBLE), h.bal + s.delta)),
                h.n_clamped + CASE WHEN h.bal + s.delta < 0
                                   THEN 1 ELSE 0 END
         FROM s JOIN h ON s.supp = h.supp AND s.rn = h.rn + 1)
       SELECT supp AS l_suppkey,
              CAST(MAX(rn) AS BIGINT) AS n_moves,
              MAX(CASE WHEN rn = mx THEN bal END) AS final_balance,
              MAX(peak) AS peak_balance,
              CAST(MAX(CASE WHEN rn = mx THEN n_clamped END) AS BIGINT)
                AS n_clamped
       FROM (SELECT h.*, MAX(rn) OVER (PARTITION BY supp) AS mx FROM h)
       GROUP BY supp""",
    doc="clamped running inventory: returns (+qty) and shipments (-qty) per "
        "supplier replayed in (shipdate, orderkey, linenumber) order with the "
        "balance floored at zero after every move — the non-linear recurrence "
        "(max-of-sum) no window cumsum can express; reports final balance, "
        "peak, and how many shipments hit an empty shelf",
    tags=("analytics", "stateful", "pandas", "inventory"),
)
def q_stock_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clamp makes each step depend non-linearly on the last — the same
    class as q_pack_bins' budget reset, so the engine shape is the grouped
    Arrow scan: ONE shuffle on l_suppkey, each group a single pandas pass
    carrying O(1) state (balance, peak, clamp count). Deltas are TPC-H
    integer-valued quantities, and both engines replay the identical
    (shipdate, orderkey, linenumber) total order, so the IEEE add sequence
    — and therefore every balance — is bit-for-bit reproducible against the
    recursive-CTE oracle. max(0, x+d) with d != 0 can't produce -0.0 (x-x
    rounds to +0.0 in IEEE), so GREATEST needs no sign normalization."""
    import pandas as pd

    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_suppkey") <= STOCK_SUPP_MAX)
          .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
                  "l_returnflag", "l_quantity"))

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["l_shipdate", "l_orderkey", "l_linenumber"]).reset_index(drop=True)
        bal = peak = 0.0
        n_clamped = 0
        for rf, qty in zip(pdf["l_returnflag"], pdf["l_quantity"]):
            delta = float(qty) if rf == "R" else -float(qty)
            nxt = bal + delta
            if nxt < 0:
                n_clamped += 1
                nxt = 0.0
            bal = nxt
            if bal > peak:
                peak = bal
        return pd.DataFrame({
            "l_suppkey": [pdf["l_suppkey"].iloc[0]],
            "n_moves": [len(pdf)],
            "final_balance": [bal],
            "peak_balance": [peak],
            "n_clamped": [n_clamped],
        })

    return fan_out_by(li, "l_suppkey").groupBy("l_suppkey").applyInPandas(
        replay, "l_suppkey bigint, n_moves bigint, final_balance double, "
                "peak_balance double, n_clamped bigint")


# --- q_cep_pattern: strict-contiguity event pattern (CEP / MATCH_RECOGNIZE) -----

CEP_GAP_DAYS = 1  # each step must follow within this window


@register(
    "q_cep_pattern",
    f"""WITH seq AS (
          SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                 lead(event_type, 1) OVER w AS t1,
                 lead(event_type, 2) OVER w AS t2,
                 lead(CAST(ts AS TIMESTAMP), 1) OVER w AS ts1,
                 lead(CAST(ts AS TIMESTAMP), 2) OVER w AS ts2
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, ts AS click1_ts, ts1 AS click2_ts, ts2 AS purchase_ts
       FROM seq
       WHERE event_type = 'click' AND t1 = 'click' AND t2 = 'purchase'
         AND ts1 <= ts + INTERVAL '{CEP_GAP_DAYS} days'
         AND ts2 <= ts1 + INTERVAL '{CEP_GAP_DAYS} days'""",
    doc="complex-event-processing pattern match (Flink CEP / SQL "
        "MATCH_RECOGNIZE with STRICT contiguity): click -> click -> "
        f"purchase as three CONSECUTIVE events per user, each within "
        f"{CEP_GAP_DAYS} day(s) of the previous — every match instance "
        "emitted, overlapping matches allowed",
    tags=("behavior", "cep", "window", "flink-parity"),
)
def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict contiguity (MATCH_RECOGNIZE's default NEXT semantics, Flink
    CEP's .next()) makes pattern matching a pure window expression: two
    lead()s over the per-user total order expose the following two events,
    and the pattern + time predicates filter match instances — no joins,
    no state machine, one shuffle + one sort. Relaxed contiguity
    ('followed-by', skipping unrelated events in between) is the
    q_funnel_strict3 family instead; the two keys together cover both CEP
    contiguity modes. Every row can start a match, so overlapping
    instances emit naturally, exactly like CEP's AFTER MATCH SKIP TO NEXT
    ROW."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.col("ts"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 1).over(w).alias("ts1"),
        F.lead("ts", 2).over(w).alias("ts2"))
    gap = F.expr(f"INTERVAL {CEP_GAP_DAYS} DAYS")
    return (
        seq.filter((F.col("event_type") == "click")
                   & (F.col("t1") == "click")
                   & (F.col("t2") == "purchase")
                   & (F.col("ts1") <= F.col("ts") + gap)
                   & (F.col("ts2") <= F.col("ts1") + gap))
           .select("user_id",
                   F.col("ts").alias("click1_ts"),
                   F.col("ts1").alias("click2_ts"),
                   F.col("ts2").alias("purchase_ts"))
    )


# --- q_attribution_linear: integer-exact multi-touch credit --------------------

ATTR_WINDOW_US = 24 * 3600 * 1_000_000
ATTR_CREDIT = 1_000_000   # micro-credit units split per purchase

@register(
    "q_attribution_linear",
    f"""WITH clicks AS (
          SELECT user_id, event_id AS click_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS cus,
                 CAST(CAST(ts AS DATE) AS TIMESTAMP) AS click_day
          FROM events WHERE event_type = 'click'),
        purch AS (
          SELECT user_id, event_id AS purchase_id,
                 epoch_us(CAST(ts AS TIMESTAMP)) AS pus
          FROM events WHERE event_type = 'purchase'),
        touches AS (
          SELECT p.purchase_id, c.click_id, c.click_day,
                 row_number() OVER (PARTITION BY p.purchase_id
                                    ORDER BY c.cus, c.click_id) AS rn,
                 COUNT(1) OVER (PARTITION BY p.purchase_id) AS n
          FROM purch p JOIN clicks c
            ON p.user_id = c.user_id
           AND c.cus <= p.pus AND c.cus >= p.pus - {ATTR_WINDOW_US})
       SELECT click_day,
              CAST(COUNT(1) AS BIGINT) AS n_touches,
              CAST(SUM({ATTR_CREDIT} // n
                       + CASE WHEN rn <= {ATTR_CREDIT} % n THEN 1 ELSE 0 END)
                   AS BIGINT) AS credit_millionths
       FROM touches
       GROUP BY click_day
       ORDER BY click_day""",
    doc="multi-touch linear attribution with EXACT credit: each purchase "
        f"splits {ATTR_CREDIT} micro-credit units equally across the "
        "user's clicks in the prior 24 h via largest-remainder "
        "apportionment (floor quota + the remainder to the earliest "
        "clicks), so credit sums are integers that conserve the total — "
        "the q_seat_allocation machinery applied per purchase, rolled up "
        "by click day",
    tags=("behavior", "attribution", "window"),
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Float credit (1/n per touch) would make day totals depend on IEEE
    fold order across engines AND executors; integer apportionment makes
    them exact and associative. The purchase-click pairing is the 1-D
    version of the spatial grid join (operators/spatial.py): clicks carry
    their home 24 h time bucket, purchases explode to (bucket, bucket-1),
    and the equi-join on (user_id, bucket) bounds candidates by local
    density — never a per-user cross product, and the join key includes
    user_id so time buckets alone can't hot-spot. Window functions then
    rank WITHIN purchase only (state O(clicks per purchase))."""
    e = load_table(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    clicks = (e.filter(F.col("event_type") == "click")
                .select("user_id", F.col("event_id").alias("click_id"),
                        us("ts").alias("cus"),
                        F.col("ts").cast("date").cast("timestamp")
                         .alias("click_day"))
                .withColumn("jb", (F.col("cus") / ATTR_WINDOW_US)
                            .cast("bigint")))
    purch = (e.filter(F.col("event_type") == "purchase")
               .select("user_id", F.col("event_id").alias("purchase_id"),
                       us("ts").alias("pus"))
               .withColumn("pb", (F.col("pus") / ATTR_WINDOW_US)
                           .cast("bigint"))
               .withColumn("jb", F.explode(F.array(F.col("pb"),
                                                   F.col("pb") - 1)))
               .drop("pb"))
    touches = (
        purch.join(clicks, ["user_id", "jb"])
             .filter((F.col("cus") <= F.col("pus"))
                     & (F.col("cus") >= F.col("pus") - ATTR_WINDOW_US))
    )
    wp = Window.partitionBy("purchase_id")
    ranked = touches.select(
        "purchase_id", "click_id", "click_day",
        F.row_number().over(wp.orderBy("cus", "click_id")).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"))
    credit = (F.expr(f"div({ATTR_CREDIT}, n)")
              + F.when(F.col("rn") <= F.lit(ATTR_CREDIT) % F.col("n"), 1)
                 .otherwise(0))
    return (ranked
            .groupBy("click_day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_touches"),
                 F.sum(credit).cast("bigint").alias("credit_millionths"))
            .orderBy("click_day"))
