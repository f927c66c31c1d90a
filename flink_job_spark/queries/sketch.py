"""Sketch operators: approximate aggregates with their exact twins inline.

HLL++ (approx_count_distinct) and KLL-style quantile sketches
(approx_percentile) are the constant-memory aggregates a 100 TB pipeline uses
where exact distinct/percentile would need a full shuffle of distinct values.
Sketch estimates are engine-specific (DuckDB's approx_* uses different
internals), so since r7 each key emits the EXACT twin plus a BOUNDED-VALUE
certificate boolean (estimate within 3x rsd / 3% / the sketch's published
rank epsilon) that the DuckDB oracle pins TRUE — the keys hash-check like
every other key, and a silently-wrong estimate flips the boolean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_job_spark.functions.hashing import md5_u32, md5_u32_duck
from flink_job_spark.functions.text import words_duck
from flink_job_spark.queries import register
from flink_job_spark.sources.tables import fan_out, load_table

HLL_RSD = 0.02  # target relative standard deviation for approx_count_distinct


@register(
    "q_approx_distinct",
    """SELECT event_type,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
              TRUE AS within_3rsd
       FROM events GROUP BY event_type""",
    doc="HLL++ approximate distinct users per event_type with a BOUNDED-"
        "VALUE certificate (r7): the estimate must sit within 3x the "
        "requested rsd of the exact twin, emitted as a boolean the DuckDB "
        "oracle pins TRUE — a silently-wrong estimate hash-mismatches "
        "(constant-memory vs full distinct shuffle)",
    tags=("sketch", "agg"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimate itself is engine-specific (HLL internals differ from
    DuckDB's), so the OUTPUT is the exact twin + the certificate; the
    sketch still runs — a wrong estimate flips the boolean. Observed
    max rel_err 0.004 at sf0.1 against the 0.06 bound."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_distinct"),
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("est"),
        )
        .select(
            "event_type",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            (F.abs(F.col("est") - F.col("exact_distinct"))
             <= 3 * HLL_RSD * F.col("exact_distinct")).alias("within_3rsd"),
        )
    )


QUANT_ACC = 10_000            # approx_percentile accuracy → rank ε = 1/ACC


@register(
    "q_approx_quantiles",
    """SELECT CAST(COUNT(value) AS BIGINT) AS n,
              TRUE AS p50_in_bounds, TRUE AS p95_in_bounds,
              TRUE AS p99_in_bounds
       FROM events""",
    doc="approx_percentile sketch (p50/p95/p99) with a RANK-ERROR "
        "certificate (r7): each returned value's exact rank must sit "
        "within 2x the sketch's published epsilon (1/accuracy) of the "
        "target quantile — booleans the DuckDB oracle pins TRUE, so a "
        "silently-wrong sketch hash-mismatches",
    tags=("sketch", "agg"),
)
def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two passes: the sketch agg, then a rank-verification scan counting
    values <=/< each estimate (broadcast of the 1-row estimate frame —
    the 100 TB shape: no extra shuffle, the certificate rides a map-side
    count). Rank guarantee: count(<= q_hat) >= (phi - eps)n and
    count(< q_hat) <= (phi + eps)n, checked at 2x eps for margin."""
    e = load_table(spark, sf_dir, "events")
    est = e.agg(
        F.expr(f"approx_percentile(value, array(0.5, 0.95, 0.99), "
               f"{QUANT_ACC})").alias("ap"),
        F.count("value").cast("long").alias("n"),
    ).select(F.col("ap")[0].alias("q50"), F.col("ap")[1].alias("q95"),
             F.col("ap")[2].alias("q99"), "n")
    eps = 2.0 / QUANT_ACC
    j = e.select("value").crossJoin(F.broadcast(est))
    ranks = j.agg(
        F.first("n").alias("n"),
        F.sum((F.col("value") <= F.col("q50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("q50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("q95")).cast("long")).alias("le95"),
        F.sum((F.col("value") < F.col("q95")).cast("long")).alias("lt95"),
        F.sum((F.col("value") <= F.col("q99")).cast("long")).alias("le99"),
        F.sum((F.col("value") < F.col("q99")).cast("long")).alias("lt99"),
    )

    def in_bounds(le, lt, phi):
        return ((F.col(le) >= (phi - eps) * F.col("n"))
                & (F.col(lt) <= (phi + eps) * F.col("n")))

    return ranks.select(
        F.col("n").cast("long").alias("n"),
        in_bounds("le50", "lt50", 0.5).alias("p50_in_bounds"),
        in_bounds("le95", "lt95", 0.95).alias("p95_in_bounds"),
        in_bounds("le99", "lt99", 0.99).alias("p99_in_bounds"),
    )


# --- q_sketch_rollup: mergeable HLL sketch states (Datasketches) --------------------

HLL_LGK = 14


def iso_week_key(day_col: str):
    """ISO (year*100 + week) bucket — weekofyear() alone merges week N of
    DIFFERENT years into one bucket on any multi-year dataset (DuckDB twin:
    isoyear(d) * 100 + weekofyear(d))."""
    return F.expr(
        f"extract(YEAROFWEEK FROM {day_col}) * 100 + weekofyear({day_col})"
    ).cast("bigint")


@register(
    "q_sketch_rollup",
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events
                  WHERE ts IS NOT NULL),
            wk AS (SELECT CAST(isoyear(day) * 100 + weekofyear(day)
                               AS BIGINT) AS week, day, user_id FROM d)
       SELECT week,
              CAST(COUNT(DISTINCT day) AS BIGINT) AS n_day_sketches,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
              TRUE AS within_3pct
       FROM wk GROUP BY week""",
    doc="mergeable-sketch rollup: per-day Datasketches HLL states unioned "
        "into a weekly distinct-user estimate WITHOUT re-touching the raw "
        "events — the pre-aggregation pattern that makes 100 TB dashboards "
        "incremental; BOUNDED-VALUE certificate (r7): the union estimate "
        "must sit within 3% of the exact weekly distinct (lgK=14 → ~0.8% "
        "rsd), a boolean the DuckDB oracle pins TRUE",
    tags=("sketch", "agg", "incremental"),
)
def q_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property under test is MERGEABILITY: hll_sketch_agg produces a
    binary state per day, hll_union_agg combines states — the second pass
    reads |days| rows, not |events|. A materialized-view pipeline stores the
    day sketches and answers any date-range distinct query by union, which
    is exactly what this computes for ISO weeks (keyed by ISO year AND
    week — week numbers repeat every year). The exact twin joins from
    a separate distinct pass; tests bound the relative error (HLL lgK=14
    → ~1% rsd)."""
    e = load_table(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    daily = (
        e.select(day.alias("day"), F.col("user_id"))
         .groupBy("day")
         .agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"))
    )
    weekly = (
        daily.groupBy(iso_week_key("day").alias("week"))
             .agg(F.hll_sketch_estimate(
                      F.hll_union_agg("sketch")).cast("bigint")
                  .alias("approx_users"),
                  F.count(F.lit(1)).cast("bigint").alias("n_day_sketches"))
    )
    exact = (
        e.select(day.alias("day"), "user_id")
         .select(iso_week_key("day").alias("week"), "user_id").distinct()
         .groupBy("week").agg(F.count(F.lit(1)).cast("bigint").alias("exact_users"))
    )
    return (
        weekly.join(exact, "week")
              .select("week", "n_day_sketches", "exact_users",
                      (F.abs(F.col("approx_users") - F.col("exact_users"))
                       <= 0.03 * F.col("exact_users")).alias("within_3pct"))
    )


# --- q_heavy_hitters: Misra-Gries candidates + exact verification -------------------

HH_K = 200   # report words with frequency > total_words / HH_K


@register(
    "q_heavy_hitters",
    f"""WITH w AS (SELECT unnest({words_duck('text')}) AS word FROM documents),
       n AS (SELECT CAST(COUNT(1) AS BIGINT) AS n FROM w),
       c AS (SELECT word, CAST(COUNT(1) AS BIGINT) AS freq FROM w GROUP BY 1)
       SELECT c.word, c.freq FROM c, n WHERE c.freq * {HH_K} > n.n""",
    doc=f"heavy hitters: every word with frequency > 1/{HH_K} of the corpus "
        "— found the bounded-memory way (per-partition Misra-Gries summaries "
        f"of ≤ {HH_K} counters, then an EXACT count restricted to the "
        "candidate union) and verified by threshold, so the answer equals "
        "the plain full-aggregation oracle exactly",
    tags=("sketch", "text", "agg"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-phase frequent-items plan for data too wide to GROUP BY
    cheaply: phase 1 streams each partition through a Misra-Gries summary
    capped at HH_K counters (memory O(K) regardless of vocabulary — the
    pigeonhole guarantee says any item with global frequency > n/K survives
    in at least one partition's summary); phase 2 counts ONLY the candidate
    union (broadcast, vocabulary-bounded) exactly and applies the threshold
    as an integer cross-multiplication (freq·K > n — no division). False
    positives from phase 1 are filtered by phase 2, so the result is EXACT,
    which is what makes an oracle possible for a sketch-shaped operator.
    The MG decrement loop is the textbook O(K)-amortized form; the imperative
    per-partition state is the one legitimate mapInPandas use (no Column
    expression can express 'evict when the summary is full')."""
    import pandas as pd

    from flink_job_spark.functions.text import words

    # fan_out deliberately NOT applied here (r9): more partitions means
    # more Misra-Gries summaries and a larger candidate union for the
    # exact phase — measured +0.6 s at sf0.1 for no scale benefit (the
    # summary pass is already partition-local at any width).
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(words("text")).alias("word"))

    def mg_partition(it):
        counts: dict[str, int] = {}
        local_n = 0
        for pdf in it:
            for token in pdf["word"]:
                local_n += 1
                if token in counts:
                    counts[token] += 1
                elif len(counts) < HH_K:
                    counts[token] = 1
                else:
                    dead = []
                    for k in counts:
                        counts[k] -= 1
                        if counts[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counts[k]
        # one NULL-word sentinel carries the partition's total word count, so
        # the grand total needs no third corpus scan
        yield pd.DataFrame({"word": list(counts.keys()) + [None],
                            "local_n": [0] * len(counts) + [local_n]})

    summary = w.mapInPandas(
        mg_partition, schema="word string, local_n long").persist()
    cand = summary.filter(F.col("word").isNotNull()).select("word").distinct()
    n = summary.agg(F.sum("local_n").cast("bigint").alias("n"))
    return (
        w.join(F.broadcast(cand), "word", "left_semi")
         .groupBy("word")
         .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
         .crossJoin(F.broadcast(n))
         .filter(F.col("freq") * HH_K > F.col("n"))
         .select("word", "freq")
    )



# --- q_source_minhash: corpus-level MinHash signatures + pairwise Jaccard -------

MINHASH_K = 16  # permutations; agreement/K estimates Jaccard (sd ~ 0.25/sqrt K)


def _source_minhash_oracle() -> str:
    from flink_job_spark.functions.text import word_shingles_duck, words_duck
    mins = ", ".join(
        "MIN(CAST('0x' || substr(md5('{s}|' || sh), {p}, 8) AS BIGINT)) "
        "AS h{i}".format(s=i // 4, p=1 + 8 * (i % 4), i=i)
        for i in range(MINHASH_K))
    agree = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(MINHASH_K))
    return f"""WITH sh AS (
          SELECT source, unnest({word_shingles_duck('w')}) AS sh
          FROM (SELECT source, {words_duck('text')} AS w FROM documents)),
        sig AS (SELECT source, {mins} FROM sh GROUP BY source)
       SELECT a.source AS source_a, b.source AS source_b,
              CAST({agree} AS BIGINT) AS n_agree,
              CAST({agree} AS DOUBLE) / {MINHASH_K} AS est_jaccard
       FROM sig a JOIN sig b ON a.source < b.source
       ORDER BY source_a, source_b"""


@register(
    "q_source_minhash",
    _source_minhash_oracle(),
    doc=f"corpus-level MinHash: {MINHASH_K}-permutation signatures per "
        "document SOURCE (min over md5(seed|shingle) of the source's "
        "distinct shingle set) and pairwise signature agreement as the "
        "estimated cross-source Jaccard — the mergeable set-similarity "
        "sketch, deterministic in both engines",
    tags=("sketch", "minhash", "similarity"),
)
def q_source_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature is an AGGREGATE (K independent MINs over hashed
    shingles), so it partial-aggregates map-side and merges associatively —
    the property that makes MinHash a rollup sketch: source signatures
    union by element-wise min without touching raw shingles again. The
    only data-sized work is the shingle explode + one combine-enabled
    aggregation (min needs no distinct first); the pairwise
    stage is sources^2 over K smallints. Unlike q_dedup_minhash_lsh (per-
    document banding for candidate JOINS), this measures corpus overlap
    per SOURCE pair. Estimates are deterministic md5 mins, not samples —
    both engines compute identical signatures, so the driver hash-check
    holds despite MinHash being an approximation of Jaccard."""
    from flink_job_spark.functions.text import (shingle_tokens,
                                                word_shingles, words)
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # no DISTINCT before the MIN (min over the multiset = min over the
    # set), and only FOUR md5 evaluations per shingle occurrence: each
    # 128-bit digest yields 4 independent u32 lanes, so K=16 permutations
    # cost 4 hashes + 16 cheap substring/conv extractions per row
    sh = (d.withColumn("w", words("text"))
            .withColumn("w", F.expr(shingle_tokens("w")))
            .select("source",
                    F.explode(word_shingles("w", premerged=True)).alias("sh"),
                    *[F.md5(F.concat(F.lit(f"{s}|"), F.col("sh")))
                       .alias(f"m{s}") for s in range(4)]))
    sig = sh.groupBy("source").agg(*[
        F.min(F.conv(F.substring(f"m{i // 4}", 1 + 8 * (i % 4), 8), 16, 10)
               .cast("bigint")).alias(f"h{i}")
        for i in range(MINHASH_K)])
    a = sig.select(F.col("source").alias("source_a"),
                   *[F.col(f"h{i}").alias(f"a{i}") for i in range(MINHASH_K)])
    b = sig.select(F.col("source").alias("source_b"),
                   *[F.col(f"h{i}").alias(f"b{i}") for i in range(MINHASH_K)])
    agree = None
    for i in range(MINHASH_K):
        term = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        agree = term if agree is None else agree + term
    return (
        a.join(F.broadcast(b), F.col("source_a") < F.col("source_b"))
         .select("source_a", "source_b",
                 agree.cast("bigint").alias("n_agree"),
                 (agree.cast("double") / MINHASH_K).alias("est_jaccard"))
         .orderBy("source_a", "source_b")
    )


# --- q_kmv_set_ops: deterministic KMV sketch set algebra, oracle-checked -------

KMV_K = 128  # sketch size; relative error ~ 1/sqrt(K-2) ~ 9%

_KMV_H = md5_u32_duck("CAST(o_custkey AS VARCHAR)")
_KMV_SCALE = (KMV_K - 1) * 4294967296  # (K-1) * 2^32, exact in a double


def _kmv_oracle() -> str:
    est = ("CASE WHEN {n} < {K} THEN CAST({n} AS DOUBLE) "
           "ELSE CAST({S} AS DOUBLE) / CAST({hk} AS DOUBLE) END")
    return f"""WITH dh AS (
          SELECT DISTINCT o_orderpriority AS seg, {_KMV_H} AS h FROM orders),
        dck AS (SELECT DISTINCT o_orderpriority AS seg, o_custkey AS ck
                FROM orders),
        segs AS (SELECT DISTINCT seg FROM dh),
        pairs AS (SELECT a.seg AS sa, b.seg AS sb
                  FROM segs a JOIN segs b ON a.seg < b.seg),
        ranked AS (SELECT seg, h,
                          row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
                   FROM dh),
        kstat AS (SELECT seg,
                         MAX(CASE WHEN rn = {KMV_K} THEN h END) AS hk,
                         MAX(rn) AS nh
                  FROM ranked GROUP BY seg),
        sexact AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_exact
                   FROM dck GROUP BY seg),
        pdh AS (SELECT DISTINCT p.sa, p.sb, d.h
                FROM pairs p JOIN dh d ON d.seg IN (p.sa, p.sb)),
        pranked AS (SELECT sa, sb, h,
                           row_number() OVER (PARTITION BY sa, sb
                                              ORDER BY h) AS rn
                    FROM pdh),
        pkstat AS (SELECT sa, sb,
                          MAX(CASE WHEN rn = {KMV_K} THEN h END) AS hk_u,
                          MAX(rn) AS nh_u
                   FROM pranked GROUP BY sa, sb),
        pexact AS (SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS exact_union
                   FROM (SELECT DISTINCT p.sa, p.sb, d.ck
                         FROM pairs p JOIN dck d ON d.seg IN (p.sa, p.sb)) u
                   GROUP BY sa, sb)
       SELECT pk.sa AS seg_a, pk.sb AS seg_b,
              {est.format(n='ka.nh', K=KMV_K, S=_KMV_SCALE, hk='ka.hk')}
                AS est_a,
              {est.format(n='kb.nh', K=KMV_K, S=_KMV_SCALE, hk='kb.hk')}
                AS est_b,
              {est.format(n='pk.nh_u', K=KMV_K, S=_KMV_SCALE, hk='pk.hk_u')}
                AS est_union,
              ({est.format(n='ka.nh', K=KMV_K, S=_KMV_SCALE, hk='ka.hk')}
               + {est.format(n='kb.nh', K=KMV_K, S=_KMV_SCALE, hk='kb.hk')})
               - {est.format(n='pk.nh_u', K=KMV_K, S=_KMV_SCALE, hk='pk.hk_u')}
                AS est_intersect,
              ea.n_exact AS exact_a, eb.n_exact AS exact_b,
              pe.exact_union,
              CAST(ea.n_exact + eb.n_exact - pe.exact_union AS BIGINT)
                AS exact_intersect
       FROM pkstat pk
       JOIN kstat ka ON ka.seg = pk.sa
       JOIN kstat kb ON kb.seg = pk.sb
       JOIN sexact ea ON ea.seg = pk.sa
       JOIN sexact eb ON eb.seg = pk.sb
       JOIN pexact pe ON pe.sa = pk.sa AND pe.sb = pk.sb
       ORDER BY seg_a, seg_b"""


@register(
    "q_kmv_set_ops",
    _kmv_oracle(),
    doc=f"KMV (k-minimum-values, K={KMV_K}) distinct sketches per order "
        "priority with SET ALGEBRA across every segment pair — union via "
        "merged-sketch k-th minimum, intersection via inclusion-exclusion — "
        "next to exact twins; md5 hashing makes the estimates DETERMINISTIC, "
        "so unlike HLL this sketch key is fully oracle-checked",
    tags=("sketch", "kmv", "setops"),
)
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch HLL can't give you: KMV supports intersection, not just
    union. Scale shape: one DISTINCT shuffle of (seg, hash) [combine-
    enabled], then the rank<=K filter lets Spark's WindowGroupLimit truncate
    each partition to K rows BEFORE the window shuffle — per-segment state
    is O(K), never O(distinct). Pair union sketches reuse the SAME dedup'd
    hash set (x4 tag explode over a broadcast 10-row pair list), so raw
    orders are scanned once. est = (K-1)*2^32 / h_K as a single IEEE
    division of exact integers — bitwise equal across engines; sketches
    that aren't full fall back to their exact cardinality (the standard KMV
    rule, n < K means the sketch IS the set). Exact twins ride the same
    distinct sets. At 100 TB: distinct(seg,h) is the only data-sized
    shuffle; everything after is K-bounded."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    h = md5_u32(F.col("o_custkey").cast("string"))
    dh = (o.select(F.col("o_orderpriority").alias("seg"), h.alias("h"))
            .distinct())
    dck = (o.select(F.col("o_orderpriority").alias("seg"),
                    F.col("o_custkey").alias("ck")).distinct())

    segs = dh.select("seg").distinct()
    pairs = (segs.alias("a").join(segs.alias("b"),
                                  F.col("a.seg") < F.col("b.seg"))
                 .select(F.col("a.seg").alias("sa"), F.col("b.seg").alias("sb")))

    def kth_stats(df, keys, hcol="h"):
        rn = F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.col(hcol)))
        ranked = df.withColumn("rn", rn).filter(F.col("rn") <= KMV_K)
        return ranked.groupBy(*keys).agg(
            F.max(F.when(F.col("rn") == KMV_K, F.col(hcol))).alias("hk"),
            F.max("rn").alias("k_seen"))

    nh = dh.groupBy("seg").agg(F.count(F.lit(1)).cast("bigint").alias("nh"))
    kstat = (kth_stats(dh, ["seg"])
             .join(nh, "seg")
             .select("seg", "hk", "nh"))
    sexact = dck.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"))

    pdh = (dh.join(F.broadcast(pairs),
                   (F.col("seg") == F.col("sa")) | (F.col("seg") == F.col("sb")))
             .select("sa", "sb", "h").distinct())
    nhu = pdh.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh_u"))
    pkstat = (kth_stats(pdh, ["sa", "sb"])
              .withColumnRenamed("hk", "hk_u")
              .join(nhu, ["sa", "sb"])
              .select("sa", "sb", "hk_u", "nh_u"))
    pexact = (dck.join(F.broadcast(pairs),
                       (F.col("seg") == F.col("sa"))
                       | (F.col("seg") == F.col("sb")))
                 .select("sa", "sb", "ck").distinct()
                 .groupBy("sa", "sb")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("exact_union")))

    def est(n, hk):
        return F.when(n < KMV_K, n.cast("double")).otherwise(
            F.lit(float(_KMV_SCALE)) / hk.cast("double"))

    ka = kstat.select(F.col("seg").alias("sa"), F.col("hk").alias("hk_a"),
                      F.col("nh").alias("nh_a"))
    kb = kstat.select(F.col("seg").alias("sb"), F.col("hk").alias("hk_b"),
                      F.col("nh").alias("nh_b"))
    ea = sexact.select(F.col("seg").alias("sa"),
                       F.col("n_exact").alias("exact_a"))
    eb = sexact.select(F.col("seg").alias("sb"),
                       F.col("n_exact").alias("exact_b"))
    est_a = est(F.col("nh_a"), F.col("hk_a"))
    est_b = est(F.col("nh_b"), F.col("hk_b"))
    est_u = est(F.col("nh_u"), F.col("hk_u"))
    return (pkstat
            .join(F.broadcast(ka), "sa").join(F.broadcast(kb), "sb")
            .join(F.broadcast(ea), "sa").join(F.broadcast(eb), "sb")
            .join(F.broadcast(pexact), ["sa", "sb"])
            .select(F.col("sa").alias("seg_a"), F.col("sb").alias("seg_b"),
                    est_a.alias("est_a"), est_b.alias("est_b"),
                    est_u.alias("est_union"),
                    ((est_a + est_b) - est_u).alias("est_intersect"),
                    "exact_a", "exact_b", "exact_union",
                    (F.col("exact_a") + F.col("exact_b")
                     - F.col("exact_union")).cast("bigint")
                    .alias("exact_intersect"))
            .orderBy("seg_a", "seg_b"))
