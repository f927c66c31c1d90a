"""Model-evaluation and time-series analytics: the offline-metrics pack.

A training-data engine is judged by the models trained on its output, so the
evaluation queries — ROC AUC, feature selection, calibration — and the
time-series diagnostics that find data drift belong in the engine next to
the prep operators. The reference (damir-kalin/flink-job) has none of this
(its only aggregates are COUNT/MAX/SUM audit scans, SURVEY §2.3); these are
north-star extensions built on the repo's exactness discipline:

- every ranking/threshold statistic is computed from INTEGER counts (exact,
  associative, engine-independent) with the IEEE division(s) applied once,
  last, in an op order the DuckDB oracle mirrors token for token;
- running statistics over unbounded facts aggregate to a bounded domain
  FIRST (distinct scores, days, segment-months) so the serial window runs
  over cardinality-bounded data — the same trick as q_class_weights;
- Pearson-style statistics ride the exact-decimal moment idiom of
  q_correlation (built-in corr()/covar are accumulation-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.queries.relational import (
    _OUT4,
    _VDEC,
    _out4_col,
    _vdec_col,
)
from flink_job_spark.sources.tables import load_table

POS_EVENT = "purchase"          # the positive class for AUC / calibration
CHI2_TOPK = 20                  # discriminative words reported
CHI2_MIN_DF = 5                 # ignore words rarer than this (noise floor)
CHI2_LANG = "en"                # the class split: en vs rest
CALIB_BIN_W = 50.0              # score-bin width over events.value
CALIB_NBINS = 10
CONCUR_MINUTES = 5              # event "activity interval" length


def auc_rank_statistic(scored: DataFrame) -> DataFrame:
    """Exact AUC over (value, pos) rows — the fuzzable core of q_auc_exact
    (tests/test_behavior_properties.py checks it against brute-force pair
    counting). ``pos`` is 0/1; NULL values must already be filtered."""
    s = scored.groupBy("value").agg(
        F.sum("pos").cast("bigint").alias("npos"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("nneg"),
    )
    w = (Window.orderBy("value")
               .rowsBetween(Window.unboundedPreceding, -1))
    c = s.withColumn(
        "cumneg", F.coalesce(F.sum("nneg").over(w).cast("bigint"), F.lit(0)))
    return c.agg(
        F.sum("npos").cast("bigint").alias("n_pos"),
        F.sum("nneg").cast("bigint").alias("n_neg"),
        # try_divide: a single-class corpus has zero rankable pairs — AUC is
        # NULL, not a job-killing ANSI divide-by-zero (fuzz-found)
        F.try_divide(
            F.sum(F.col("npos") * (2 * F.col("cumneg") + F.col("nneg")))
             .cast("double"),
            (2 * F.sum("npos") * F.sum("nneg")).cast("double")).alias("auc"),
    )


def sweep_max_concurrent(e: DataFrame, minutes: int = CONCUR_MINUTES) -> DataFrame:
    """Sweep-line peak concurrency over a ``ts`` column — the fuzzable core
    of q_max_concurrent (fuzzed against brute-force interval counting)."""
    day = F.date_trunc("DAY", F.col("ts"))
    iv = e.select(
        day.alias("day"), F.col("ts").alias("s"),
        F.least(F.col("ts") + F.expr(f"INTERVAL {minutes} MINUTES"),
                day + F.expr("INTERVAL 1 DAY")).alias("e"))
    sweep = iv.select(
        "day",
        F.explode(F.array(
            F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
            F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
        )).alias("ev"),
    ).select("day", "ev.t", "ev.delta")
    w = Window.partitionBy("day").orderBy("t", "delta")
    run = sweep.withColumn("active", F.sum("delta").over(w))
    return run.groupBy("day").agg(
        F.max("active").cast("bigint").alias("max_concurrent"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).cast("bigint")
         .alias("n_events"),
    ).select(F.col("day").cast("timestamp").alias("day"),
             "max_concurrent", "n_events")


# --- q_auc_exact: exact ROC AUC by rank statistic ------------------------------

@register(
    "q_auc_exact",
    f"""WITH s AS (
          SELECT value,
                 CAST(SUM(CASE WHEN event_type = '{POS_EVENT}'
                               THEN 1 ELSE 0 END) AS BIGINT) AS npos,
                 CAST(SUM(CASE WHEN event_type <> '{POS_EVENT}'
                               THEN 1 ELSE 0 END) AS BIGINT) AS nneg
          FROM events WHERE value IS NOT NULL GROUP BY value),
        c AS (
          SELECT npos, nneg,
                 COALESCE(CAST(SUM(nneg) OVER (
                     ORDER BY value
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS cumneg
          FROM s)
        SELECT CAST(SUM(npos) AS BIGINT) AS n_pos,
               CAST(SUM(nneg) AS BIGINT) AS n_neg,
               CAST(SUM(npos * (2 * cumneg + nneg)) AS DOUBLE)
                 / CAST(2 * SUM(npos) * SUM(nneg) AS DOUBLE) AS auc
        FROM c""",
    doc=f"exact ROC AUC of events.value as a score for '{POS_EVENT}' events "
        "— the Mann-Whitney rank statistic with midrank tie handling, "
        "computed from integer pair counts (x2-scaled so ties need no "
        "fractions) and ONE final IEEE division",
    tags=("analytics", "ml", "eval", "window"),
)
def q_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC = P(score_pos > score_neg) + half P(=). Never rank the raw rows:
    the fact stream first collapses to per-DISTINCT-SCORE (npos, nneg)
    counts — one combine-enabled shuffle — and the serial running-negatives
    window scans only that bounded domain (quantize scores upstream if
    distinct values are unbounded at 100 TB). The x2 numerator
    npos*(2*cum_neg_below + nneg) counts each beaten negative twice and
    each tied negative once — integers end to end, so the single division
    at the end is the only IEEE op and both engines emit the identical
    double, unrounded."""
    e = load_table(spark, sf_dir, "events")
    pos = F.when(F.col("event_type") == POS_EVENT, 1).otherwise(0)
    # NULL scores are unrankable AND sort differently across engines
    # (Spark NULLS FIRST vs DuckDB NULLS LAST ascending) — drop them in both
    scored = (e.filter(F.col("value").isNotNull())
               .select("value", pos.alias("pos")))
    return auc_rank_statistic(scored)


# --- q_chi2_features: chi-squared feature selection ----------------------------

@register(
    "q_chi2_features",
    f"""WITH dw AS (
          SELECT DISTINCT doc_id, lang, word
          FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                FROM documents)
          WHERE word <> ''),
        tot AS (
          SELECT CAST(SUM(CASE WHEN lang = '{CHI2_LANG}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_c,
                 CAST(SUM(CASE WHEN lang <> '{CHI2_LANG}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_o
          FROM documents),
        wc AS (
          SELECT word,
                 CAST(SUM(CASE WHEN lang = '{CHI2_LANG}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN lang <> '{CHI2_LANG}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS b
          FROM dw GROUP BY word)
        SELECT word, a AS df_class, b AS df_other,
               ((CAST(n_c + n_o AS DOUBLE)
                 * CAST(a * (n_o - b) - b * (n_c - a) AS DOUBLE))
                * CAST(a * (n_o - b) - b * (n_c - a) AS DOUBLE))
               / (((CAST(a + b AS DOUBLE)
                    * CAST((n_c - a) + (n_o - b) AS DOUBLE))
                   * CAST(n_c AS DOUBLE)) * CAST(n_o AS DOUBLE)) AS chi2
        FROM wc CROSS JOIN tot
        WHERE a + b >= {CHI2_MIN_DF} AND (n_c - a) + (n_o - b) > 0
        ORDER BY chi2 DESC, word
        LIMIT {CHI2_TOPK}""",
    doc=f"chi-squared feature selection: the {CHI2_TOPK} words whose "
        f"document frequency most separates lang='{CHI2_LANG}' from the "
        "rest — the 2x2-contingency statistic from exact integer document "
        "counts, with the arithmetic falling to doubles only in a fixed "
        "multiply/divide order both engines share",
    tags=("analytics", "ml", "eval", "text"),
)
def q_chi2_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc, word) presence pairs collapse the corpus to per-word
    class counts in one shuffle; the 2-number class-totals row broadcasts
    back as a cross join (never a driver collect). chi2 =
    N*(ad-bc)^2 / (df*(N-df)*Nc*No): every operand is an exact BIGINT cast
    to double individually (all < 2^53), then multiplied/divided in ONE
    pinned parenthesization — the all-integer numerator would overflow
    64 bits at corpus scale, the all-double form is deterministic at any.
    Words present in every document are excluded (zero discriminative
    power and a zero denominator)."""
    d = load_table(spark, sf_dir, "documents")
    dw = (
        d.select("doc_id", "lang",
                 F.explode(F.split(F.col("text"), " ")).alias("word"))
         .filter(F.col("word") != "")
         .distinct()
    )
    is_c = F.when(F.col("lang") == CHI2_LANG, 1).otherwise(0)
    tot = d.agg(F.sum(is_c).cast("bigint").alias("n_c"),
                F.sum(1 - is_c).cast("bigint").alias("n_o"))
    wc = dw.groupBy("word").agg(
        F.sum(is_c).cast("bigint").alias("a"),
        F.sum(1 - is_c).cast("bigint").alias("b"),
    )
    j = wc.crossJoin(F.broadcast(tot))
    t = (F.col("a") * (F.col("n_o") - F.col("b"))
         - F.col("b") * (F.col("n_c") - F.col("a"))).cast("double")
    n_d = (F.col("n_c") + F.col("n_o")).cast("double")
    df_d = (F.col("a") + F.col("b")).cast("double")
    rest_d = ((F.col("n_c") - F.col("a"))
              + (F.col("n_o") - F.col("b"))).cast("double")
    chi2 = ((n_d * t) * t) / (
        ((df_d * rest_d) * F.col("n_c").cast("double"))
        * F.col("n_o").cast("double"))
    return (
        j.filter((F.col("a") + F.col("b") >= CHI2_MIN_DF)
                 & ((F.col("n_c") - F.col("a"))
                    + (F.col("n_o") - F.col("b")) > 0))
         .select("word", F.col("a").alias("df_class"),
                 F.col("b").alias("df_other"), chi2.alias("chi2"))
         .orderBy(F.col("chi2").desc(), F.col("word"))
         .limit(CHI2_TOPK)
    )


# --- q_max_concurrent: sweep-line peak concurrency -----------------------------

@register(
    "q_max_concurrent",
    f"""WITH iv AS (
          SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                 CAST(ts AS TIMESTAMP) AS s,
                 least(CAST(ts AS TIMESTAMP) + INTERVAL {CONCUR_MINUTES} MINUTE,
                       date_trunc('day', CAST(ts AS TIMESTAMP))
                         + INTERVAL 1 DAY) AS e
          FROM events),
        sweep AS (
          SELECT day, s AS t, 1 AS delta FROM iv
          UNION ALL
          SELECT day, e AS t, -1 AS delta FROM iv),
        run AS (
          SELECT day, delta,
                 SUM(delta) OVER (PARTITION BY day ORDER BY t, delta)
                   AS active
          FROM sweep)
        SELECT CAST(day AS TIMESTAMP) AS day,
               CAST(MAX(active) AS BIGINT) AS max_concurrent,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_events
        FROM run GROUP BY day""",
    doc=f"peak concurrency per day: each event opens a {CONCUR_MINUTES}-"
        "minute activity interval (clipped at midnight) and a sweep-line "
        "counts the maximum simultaneously-open intervals — the "
        "interval-overlap maximum no GROUP BY can express",
    tags=("analytics", "window", "events"),
)
def q_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic +1/-1 sweep: each interval emits (start, +1) and
    (end, -1), a per-day running sum walks them in (time, delta) order, and
    the day's max is the answer. Ends sort before coincident starts
    (delta -1 < +1), making intervals end-exclusive; the default RANGE
    frame aggregates tied sweep points as one peer group in both engines,
    so identical timestamps can't make the max order-dependent. The serial
    window is PARTITIONED BY DAY — bounded state, every day in parallel —
    and the explode carries two (t, delta) scalars per event, never the
    parent row."""
    e = load_table(spark, sf_dir, "events")
    return sweep_max_concurrent(e)


# --- q_autocorr_lag1: serial correlation of the daily revenue series -----------

@register(
    "q_autocorr_lag1",
    f"""WITH daily AS (
         SELECT date_trunc('day', o_orderdate) AS day,
                {_OUT4.format(s="SUM(CAST(o_totalprice AS DECIMAL(18,6)))")}
                  / 1000000.0 AS rev
         FROM orders GROUP BY 1),
       pairs AS (
         SELECT LAG(rev) OVER (ORDER BY day) AS x, rev AS y FROM daily),
       m AS (
         SELECT {_VDEC.format(x="x")} AS x,
                {_VDEC.format(x="y")} AS y,
                {_VDEC.format(x="x * y")} AS xy,
                {_VDEC.format(x="x * x")} AS xx,
                {_VDEC.format(x="y * y")} AS yy
         FROM pairs WHERE x IS NOT NULL)
       SELECT CAST(COUNT(1) AS BIGINT) AS n_pairs,
              ROUND((CAST(COUNT(1) AS DOUBLE) * {_OUT4.format(s="SUM(xy)")}
                     - {_OUT4.format(s="SUM(x)")} * {_OUT4.format(s="SUM(y)")})
                    / (sqrt(CAST(COUNT(1) AS DOUBLE) * {_OUT4.format(s="SUM(xx)")}
                            - {_OUT4.format(s="SUM(x)")} * {_OUT4.format(s="SUM(x)")})
                       * sqrt(CAST(COUNT(1) AS DOUBLE) * {_OUT4.format(s="SUM(yy)")}
                              - {_OUT4.format(s="SUM(y)")}
                                * {_OUT4.format(s="SUM(y)")})),
                    6) AS autocorr
       FROM m""",
    doc="lag-1 autocorrelation of the daily order-revenue series — Pearson "
        "r between consecutive days from exact decimal moments; the drift "
        "diagnostic that tells a pipeline whether yesterday predicts today",
    tags=("analytics", "stats", "window", "timeseries"),
)
def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two bounded stages: the fact stream combines to ~2.4k exact-decimal
    day totals (one shuffle), and only that series rides the serial LAG
    window (partition by year at larger spans, stitching boundary pairs).
    Day totals rescale to MILLIONS before any product — q_correlation's
    moment idiom is engine-exact only while the repr-detour decimals and
    their sums stay inside the scale-4 casting envelope, and raw day
    revenues (~1e6, products ~1e13) are outside it (review-verified: the
    direct double→DECIMAL(38,10) cast itself diverges between engines at
    that magnitude). After the rescale every product is ~1-100 and every
    sum fits; x/y/products all take the shared repr-string route (_VDEC)
    and the sums exit through the shared scale-4 rounding (_OUT4),
    token-identical to the oracle."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("DAY", F.col("o_orderdate")).alias("day"))
         .agg((_out4_col(F.sum(F.col("o_totalprice").cast("decimal(18,6)")))
               / F.lit(1000000.0)).alias("rev"))
    )
    pairs = daily.select(
        F.lag("rev").over(Window.orderBy("day")).alias("x"),
        F.col("rev").alias("y"),
    ).filter(F.col("x").isNotNull())
    m = pairs.select(
        _vdec_col(F.col("x")).alias("x"),
        _vdec_col(F.col("y")).alias("y"),
        _vdec_col(F.col("x") * F.col("y")).alias("xy"),
        _vdec_col(F.col("x") * F.col("x")).alias("xx"),
        _vdec_col(F.col("y") * F.col("y")).alias("yy"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = _out4_col(F.sum("x")), _out4_col(F.sum("y"))
    sxy, sxx, syy = (_out4_col(F.sum(c)) for c in ["xy", "xx", "yy"])
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return m.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.round(r, 6).alias("autocorr"))


# --- q_mom_growth: month-over-month growth per segment -------------------------

@register(
    "q_mom_growth",
    """WITH sm AS (
         SELECT c_mktsegment, date_trunc('month', o_orderdate) AS month,
                SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2),
       g AS (
         SELECT c_mktsegment, month, rev,
                LAG(rev) OVER (PARTITION BY c_mktsegment ORDER BY month)
                  AS prev
         FROM sm)
       SELECT c_mktsegment, CAST(month AS TIMESTAMP) AS month,
              CAST(rev AS DOUBLE) AS revenue,
              CAST(prev AS DOUBLE) AS prev_revenue,
              ROUND((CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
                    / CAST(prev AS DOUBLE), 6) AS growth
       FROM g WHERE prev IS NOT NULL""",
    doc="month-over-month revenue growth per market segment — the "
        "period-over-period reporting shape: exact-decimal month totals, "
        "a segment-partitioned LAG, and one IEEE division per output row",
    tags=("analytics", "window", "timeseries", "join"),
)
def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact stream reduces to (segment, month) exact totals first —
    one shuffle — and the LAG window walks only that bounded grid,
    partitioned by segment so nothing is serial across segments. Growth
    divides the two exact decimals cast double once each; the first month
    of each segment (no predecessor) is dropped, matching the oracle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_mktsegment")
    sm = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
         .groupBy("c_mktsegment",
                  F.date_trunc("MONTH", F.col("o_orderdate")).alias("month"))
         .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
               .alias("rev"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("month")
    g = sm.withColumn("prev", F.lag("rev").over(w))
    return (
        g.filter(F.col("prev").isNotNull())
         .select("c_mktsegment",
                 F.col("month").cast("timestamp").alias("month"),
                 F.col("rev").cast("double").alias("revenue"),
                 F.col("prev").cast("double").alias("prev_revenue"),
                 F.round((F.col("rev").cast("double")
                          - F.col("prev").cast("double"))
                         / F.col("prev").cast("double"), 6).alias("growth"))
    )


# --- q_calibration_bins: score calibration table -------------------------------

@register(
    "q_calibration_bins",
    f"""SELECT bin,
           CAST(COUNT(1) AS BIGINT) AS n,
           CAST(SUM(is_pos) AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(is_pos) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE), 6)
               AS pos_rate,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(COUNT(1) AS DOUBLE), 6) AS mean_score
    FROM (
      SELECT CAST(least(floor(value / {CALIB_BIN_W}), {CALIB_NBINS - 1})
                  AS BIGINT) AS bin,
             CASE WHEN event_type = '{POS_EVENT}' THEN 1 ELSE 0 END
               AS is_pos,
             value
      FROM events)
    GROUP BY bin""",
    doc=f"calibration table for events.value as a '{POS_EVENT}' score: "
        f"per fixed-width score bin (w={CALIB_BIN_W:g}, top bin clamped), "
        "the observed positive rate and mean score — the reliability-"
        "diagram input, from integer counts with one division per cell",
    tags=("analytics", "ml", "eval", "agg"),
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side bin assignment (explicit floor — CAST-to-int rounds in one
    engine and truncates in the other), one combine-enabled shuffle to
    {CALIB_NBINS} cells, and per-cell rates from exact counts with the
    division applied last. The same single-pass shape at any scale."""
    e = load_table(spark, sf_dir, "events")
    binc = F.least(F.floor(F.col("value") / CALIB_BIN_W),
                   F.lit(CALIB_NBINS - 1)).cast("bigint")
    is_pos = F.when(F.col("event_type") == POS_EVENT, 1).otherwise(0)
    n = F.count(F.lit(1))
    return (
        e.select(binc.alias("bin"), is_pos.alias("is_pos"), "value")
         .groupBy("bin")
         .agg(n.cast("bigint").alias("n"),
              F.sum("is_pos").cast("bigint").alias("n_pos"),
              F.round(F.sum("is_pos").cast("double") / n.cast("double"), 6)
               .alias("pos_rate"),
              F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                       .cast("double") / n.cast("double"), 6)
               .alias("mean_score"))
    )


# --- q_rolling_corr: trailing 7-day revenue/volume correlation -----------------------

CORR_FRAME = 7  # trailing window length, in observed days


@register(
    "q_rolling_corr",
    f"""WITH daily AS (
          SELECT date_trunc('day', o_orderdate) AS day,
                 CAST(SUM(CAST(FLOOR(CAST(CAST(CAST(o_totalprice AS DOUBLE) AS VARCHAR) AS DECIMAL(19,8)) * 100) AS BIGINT)) AS BIGINT) // 10000 AS x,
                 CAST(COUNT(1) AS BIGINT) AS y
          FROM orders GROUP BY 1),
        m AS (
          SELECT day, x, y,
                 CAST(COUNT(1) OVER w AS BIGINT) AS n,
                 SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
                 SUM(x * x) OVER w AS sxx, SUM(y * y) OVER w AS syy,
                 SUM(x * y) OVER w AS sxy
          FROM daily
          WINDOW w AS (ORDER BY day
                       ROWS BETWEEN {CORR_FRAME - 1} PRECEDING
                       AND CURRENT ROW))
        SELECT CAST(day AS TIMESTAMP) AS day, x AS rev_h, y AS n_orders, n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                          * SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 0.0)
                 AS corr{CORR_FRAME}
        FROM m""",
    doc=f"trailing {CORR_FRAME}-day Pearson correlation between daily revenue "
        "and daily order count — the co-movement drift monitor; every moment "
        "(sums, squares, cross products) is BIGINT-exact over the frame "
        "(revenue floored to $100 units keeps squares far from overflow) and "
        "the only IEEE ops are the final sqrt/multiply/divide in a pinned "
        "order; zero-variance frames yield NULL, not a crash",
    tags=("analytics", "timeseries", "window", "ml"),
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbounded-fact series aggregates to the bounded day grid first
    (one combine-enabled shuffle); the five moment sums then ride ONE
    serial window over day cardinality — O(days), not O(orders), and the
    frame is ROWS-based so ties cannot exist (day is the grouping key).
    Flooring revenue to $100 units puts x ~ 1e5 even at 100 TB day volumes,
    so n*sxx ~ 7e10 sits 8 orders of magnitude inside BIGINT; the
    correlation numerator/denominator are exact integers cast to double
    (all well under 2^53 - exactly representable), leaving sqrt, one
    multiply and one divide as the only rounding steps — identical IEEE
    tokens in both engines. corr is NULL over constant frames (NULLIF /
    try_divide), e.g. the first row's n=1 frame."""
    from flink_job_spark.queries.analytics import cents_col

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("DAY", F.col("o_orderdate")).alias("day"))
         .agg(F.sum(cents_col(F.col("o_totalprice"))).cast("bigint")
               .alias("cents"),
              F.count(F.lit(1)).cast("bigint").alias("y"))
         .select("day", F.expr("cents div 10000").alias("x"), "y")
    )
    w = (Window.orderBy("day")
               .rowsBetween(-(CORR_FRAME - 1), Window.currentRow))
    m = daily.select(
        "day", "x", "y",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n"),
        F.sum("x").over(w).alias("sx"), F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
    )
    return m.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("x").alias("rev_h"), F.col("y").alias("n_orders"), "n",
        F.try_divide(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
              .cast("double"),
            F.nullif(
                F.sqrt((F.col("n") * F.col("sxx")
                        - F.col("sx") * F.col("sx")).cast("double"))
                * F.sqrt((F.col("n") * F.col("syy")
                          - F.col("sy") * F.col("sy")).cast("double")),
                F.lit(0.0))).alias(f"corr{CORR_FRAME}"),
    )


# --- q_ks_test: two-sample Kolmogorov-Smirnov distance --------------------------

KS_A, KS_B = "click", "view"


@register(
    "q_ks_test",
    f"""WITH g AS (
          SELECT value,
                 CAST(SUM(CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c1,
                 CAST(SUM(CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END)
                      AS BIGINT) AS c2
          FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
          GROUP BY value),
        cum AS (
          SELECT SUM(c1) OVER (ORDER BY value
                               ROWS UNBOUNDED PRECEDING) AS cum1,
                 SUM(c2) OVER (ORDER BY value
                               ROWS UNBOUNDED PRECEDING) AS cum2,
                 SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
          FROM g)
       SELECT CAST(MAX(n1) AS BIGINT) AS n1,
              CAST(MAX(n2) AS BIGINT) AS n2,
              CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_num,
              CAST(MAX(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE))
                AS d_stat
       FROM cum""",
    doc=f"two-sample Kolmogorov-Smirnov distance between the '{KS_A}' and "
        f"'{KS_B}' value distributions — the distribution-shift test, "
        "computed entirely in exact integers (max |cum1*n2 - cum2*n1| over "
        "the merged value grid) with ONE final division",
    tags=("mleval", "stats", "window"),
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS distance = max_v |F1(v) - F2(v)|; cross-multiplying by n1*n2
    turns every comparison into int64 arithmetic (counts ~1e5, products
    ~1e10 — exact), so both engines take the max over IDENTICAL integers
    and the single closing division is the only IEEE op. The value grid
    collapses to DISTINCT observed values first (combine-enabled shuffle);
    the cumulative window then sorts the grid, whose size is bounded by
    the value domain, not the event count — the property that keeps the
    serial window safe at 100 TB. Ties are handled exactly: evaluating at
    grid points after grouping IS the right-continuous empirical CDF."""
    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("event_type").isin(KS_A, KS_B)))
    tagged = e.select("value",
                      F.when(F.col("event_type") == KS_A, 1).otherwise(0)
                       .alias("is_a"))
    return ks_stat(tagged)


def ks_stat(tagged: DataFrame) -> DataFrame:
    """Two-sample KS over ``tagged`` (value double, is_a 0/1): one row
    (n1, n2, d_num, d_stat) with d_num = max |cum1*n2 - cum2*n1| over the
    distinct-value grid — all-integer until the single closing division."""
    g = (tagged.groupBy("value")
         .agg(F.sum("is_a").cast("bigint").alias("c1"),
              F.sum(1 - F.col("is_a")).cast("bigint").alias("c2")))
    wcum = Window.orderBy("value").rowsBetween(Window.unboundedPreceding,
                                               Window.currentRow)
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    cum = g.select(
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c2").over(wcum).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"))
    d = F.max(F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")))
    return cum.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        d.cast("bigint").alias("d_num"),
        (d.cast("double")
         / (F.max("n1").cast("double") * F.max("n2").cast("double")))
        .alias("d_stat"),
    )


# --- q_rbo_rankings: rank-biased overlap of two top-K rankings ------------------

RBO_K = 20
RBO_SPLIT = "1996-01-01"  # era boundary: ranking A ships before, B after


@register(
    "q_rbo_rankings",
    f"""WITH rev AS (
          SELECT l_partkey AS k,
                 CASE WHEN l_shipdate < TIMESTAMP '{RBO_SPLIT} 00:00:00'
                      THEN 0 ELSE 1 END AS h,
                 CAST(SUM(CAST(FLOOR(CAST(CAST(CAST(l_extendedprice
                      AS DOUBLE) AS VARCHAR) AS DECIMAL(19,8)) * 100)
                      AS BIGINT)) AS BIGINT) AS c
          FROM lineitem GROUP BY 1, 2),
        ra AS (SELECT k, row_number() OVER (ORDER BY c DESC, k) AS pa
               FROM rev WHERE h = 0),
        rb AS (SELECT k, row_number() OVER (ORDER BY c DESC, k) AS pb
               FROM rev WHERE h = 1),
        com AS (SELECT pa, pb FROM ra JOIN rb ON ra.k = rb.k
                WHERE pa <= {RBO_K} AND pb <= {RBO_K}),
        depths AS (SELECT unnest(range(1, {RBO_K + 1})) AS d),
        xd AS (SELECT d,
                      CAST(SUM(CASE WHEN pa <= d AND pb <= d
                               THEN 1 ELSE 0 END) AS BIGINT) AS x
               FROM depths LEFT JOIN com ON TRUE GROUP BY d),
        acc AS (SELECT d, x,
                       SUM((CAST(x AS DOUBLE) / d)
                           / CAST(1 << (d - 1) AS DOUBLE))
                         OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS s
                FROM xd)
       SELECT CAST(d AS BIGINT) AS k, x AS x_k, 0.5 * s AS rbo
       FROM acc WHERE d = {RBO_K}""",
    doc=f"rank-biased overlap (p=1/2, depth {RBO_K}) between the top-part-"
        "by-revenue rankings of two shipping eras — the top-weighted "
        "ranking-similarity metric; every weight is a power of two so the "
        "only inexact op is the per-depth x/d division, folded in pinned "
        "order in both engines",
    tags=("mleval", "ranking", "stats"),
)
def q_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO = (1-p) Σ_d p^(d-1) · X_d/d over agreement depths: X_d counts
    items both rankings place in their top d. p=1/2 makes every geometric
    weight an exact dyadic double (computed as division by 1<<(d-1), not
    libm pow), so cross-engine equality needs only the same fold order —
    the cumulative window ordered by d, closed at d=K. The rankings order
    by EXACT revenue cents with a key tie-break; the depth×overlap join
    is a ≤K×K literal-range cross — constant work above the one
    data-sized aggregation, so the 100 TB cost is the revenue groupBy."""
    from flink_job_spark.queries.analytics import cents_col
    li = load_table(spark, sf_dir, "lineitem")
    rev = (li.select(F.col("l_partkey").alias("k"),
                     F.when(F.col("l_shipdate")
                            < F.lit(RBO_SPLIT).cast("timestamp_ntz"), 0)
                      .otherwise(1).alias("h"),
                     cents_col(F.col("l_extendedprice")).alias("cents"))
             .groupBy("k", "h")
             .agg(F.sum("cents").cast("bigint").alias("c")))
    wr = Window.orderBy(F.col("c").desc(), "k")
    ra = (rev.filter(F.col("h") == 0)
             .select("k", F.row_number().over(wr).alias("pa")))
    rb = (rev.filter(F.col("h") == 1)
             .select("k", F.row_number().over(wr).alias("pb")))
    com = (ra.join(rb, "k")
             .filter((F.col("pa") <= RBO_K) & (F.col("pb") <= RBO_K))
             .select("pa", "pb"))
    depths = spark.range(1, RBO_K + 1).select(F.col("id").alias("d"))
    xd = (depths.join(com, F.lit(True), "left")
                .groupBy("d")
                .agg(F.sum(F.when((F.col("pa") <= F.col("d"))
                                  & (F.col("pb") <= F.col("d")), 1)
                            .otherwise(0)).cast("bigint").alias("x")))
    ws = Window.orderBy("d").rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    term = ((F.col("x").cast("double") / F.col("d"))
            / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), "
                     "CAST(d - 1 AS INT)) AS DOUBLE)"))
    acc = xd.select("d", "x", F.sum(term).over(ws).alias("s"))
    return (acc.filter(F.col("d") == RBO_K)
               .select(F.col("d").cast("bigint").alias("k"),
                       F.col("x").alias("x_k"),
                       (F.lit(0.5) * F.col("s")).alias("rbo")))
