"""Training-data preparation composites: sequence packing, mixture
resampling, block-level dedup, benchmark contamination, entropy scoring,
deterministic global shuffle, and lossless format roundtrips.

These are the corpus-assembly steps an LLM pretraining pipeline runs after
filtering/dedup and before writing training shards; none exist in the
reference (its surface is snapshot ingest + audit, SURVEY §2), so they are
north-star extensions in the spirit of queries/text.py. Shared discipline:

* tokenization/normalization comes from functions/text.py so every text key
  in the engine agrees on what a "word"/"token" is;
* sampling and shuffling are md5-deterministic (never rand()) so retries,
  speculative tasks, and other engines reproduce the same rows;
* doubles are summed through exact-decimal detours or avoided (min/max/count)
  so results are partition-order-free;
* per-key scale notes explain what changes at 100 TB (usually: nothing, or
  one bounded broadcast).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from flink_job_spark.functions.text import (
    norm_text,
    norm_text_duck,
    word_shingles,
    word_shingles_duck,
    words,
    words_duck,
    ws_token_count,
    ws_token_count_duck,
)
from flink_job_spark.functions.hashing import md5_u32, md5_u32_duck
from flink_job_spark.queries import register
from flink_job_spark.sources.tables import fan_out, fan_out_by, load_table

# --- q_sequence_pack: offset-based sequence packing ----------------------------------

PACK_BUDGET = 96  # whitespace tokens per packed training sequence

@register(
    "q_sequence_pack",
    f"""WITH t AS (
          SELECT source, doc_id, {ws_token_count_duck('text')} AS tok
          FROM documents
        ),
        o AS (
          SELECT source, doc_id, tok,
                 COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS start_off
          FROM t
        )
        SELECT source,
               CAST(floor(start_off / {PACK_BUDGET}) AS BIGINT) AS seq_id,
               CAST(COUNT(1) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS seq_tokens,
               MIN(doc_id) AS first_doc
        FROM o GROUP BY source, CAST(floor(start_off / {PACK_BUDGET}) AS BIGINT)""",
    doc=f"offset-based sequence packing: concatenate each source's docs in "
        f"doc_id order and cut the token stream at {PACK_BUDGET}-token "
        "boundaries (GPT-style pack-then-split); a doc belongs to the "
        "sequence its first token lands in",
    tags=("prep", "packing", "window"),
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing = one window cumsum PARTITIONED BY source (never a global
    order), then a partial-aggregated groupBy on (source, seq_id) — two
    shuffles on the same key, and AQE coalesces them. At 100 TB each source
    shard packs independently, which is exactly how training shards are laid
    out; a skewed mega-source would be further split by a bucket column in
    the partition key (same math, seq ids offset per bucket)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy("doc_id") \
              .rowsBetween(Window.unboundedPreceding, -1)
    t = d.select("source", "doc_id", ws_token_count("text").alias("tok"))
    o = t.withColumn("start_off", F.coalesce(F.sum("tok").over(w), F.lit(0)))
    return (
        o.withColumn("seq_id", F.floor(F.col("start_off") / PACK_BUDGET).cast("bigint"))
         .groupBy("source", "seq_id")
         .agg(
             F.count(F.lit(1)).alias("n_docs"),
             F.sum("tok").cast("bigint").alias("seq_tokens"),
             F.min("doc_id").alias("first_doc"),
         )
    )


# --- q_mixture_resample: data-dependent domain mixture -------------------------------

# target mixture weights per source domain; unlisted sources get weight 1
MIX_WEIGHTS = {"src0": 6.0, "src1": 4.0, "src2": 2.0, "src3": 2.0}
MIX_BUDGET_FRAC = 0.4  # resampled corpus targets 40% of the input rows

def _weight_case_spark() -> F.Column:
    expr = F.lit(1.0)
    for s, wgt in sorted(MIX_WEIGHTS.items()):
        expr = F.when(F.col("source") == s, F.lit(wgt)).otherwise(expr)
    return expr

def _weight_case_duck() -> str:
    branches = " ".join(
        f"WHEN source = '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items())
    )
    return f"CASE {branches} ELSE 1.0 END"

@register(
    "q_mixture_resample",
    f"""WITH c AS (
          SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs,
                 {_weight_case_duck()} AS wgt
          FROM documents GROUP BY source
        ),
        tot AS (
          SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total, SUM(wgt) AS w_total
          FROM c
        ),
        r AS (
          SELECT c.source, c.n_docs,
                 LEAST(1.0, (c.wgt / tot.w_total) * (tot.n_total * {MIX_BUDGET_FRAC})
                            / c.n_docs) AS rate
          FROM c, tot
        )
        SELECT d.source, r.n_docs,
               CAST(COALESCE(SUM(CASE WHEN
                 {md5_u32_duck("CAST(d.doc_id AS VARCHAR)")}
                   / 4294967296.0 < r.rate THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_kept
        FROM documents d JOIN r ON d.source = r.source
        GROUP BY d.source, r.n_docs""",
    doc="domain-mixture resampling: per-source keep rates derived from "
        "target mixture weights and the observed per-source counts (budget "
        f"= {MIX_BUDGET_FRAC:.0%} of input), selection by md5 bucket — the "
        "mixture step that turns a raw crawl into a weighted training mix",
    tags=("prep", "sampling"),
)
def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass mixture: pass 1 is a tiny per-source count aggregate (one
    combine-enabled shuffle, |sources| rows); the rates join back as a
    BROADCAST, so pass 2 is map-side — filter + re-aggregate. At 100 TB the
    rate table is still |domains| rows, the big side never shuffles for the
    join, and the md5 selection keeps resampling deterministic across
    retries. Rate arithmetic is a fixed expression tree over exact counts,
    so Spark and DuckDB compute bit-identical doubles."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs")) \
         .withColumn("wgt", _weight_case_spark())
    tot = c.agg(F.sum("n_docs").cast("bigint").alias("n_total"),
                F.sum("wgt").alias("w_total"))
    r = c.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs",
        F.least(
            F.lit(1.0),
            (F.col("wgt") / F.col("w_total"))
            * (F.col("n_total") * F.lit(MIX_BUDGET_FRAC)) / F.col("n_docs"),
        ).alias("rate"),
    )
    bucket = md5_u32(F.col("doc_id").cast("string")) / F.lit(4294967296.0)
    return (
        d.join(F.broadcast(r), "source")
         .withColumn("keep", (bucket < F.col("rate")).cast("int"))
         .groupBy("source", "n_docs")
         .agg(F.coalesce(F.sum("keep"), F.lit(0)).cast("bigint").alias("n_kept"))
    )


# --- q_block_dedup: non-overlapping block-level exact dedup --------------------------

BLOCK_WORDS = 16


def _doc_block_hashes(d: DataFrame) -> DataFrame:
    """(doc_id, block_hash) for every non-overlapping BLOCK_WORDS-word block.

    The md5 is computed INSIDE a transform over the starts array, so only the
    32-char scalar hash explodes. The earlier formulation exploded start
    indexes first and sliced after — every exploded row then carried the
    doc's FULL words array (O(blocks × doclen) row width through the explode),
    which showed up as 2-3× degradation under full-registry memory
    contention even though the plan shape was identical."""
    return (
        fan_out(d).select("doc_id", words("text").alias("w"))
         .select(
             "doc_id",
             F.explode(F.expr(
                 f"transform(sequence(1, size(w), {BLOCK_WORDS}), "
                 f"s -> md5(concat_ws(' ', slice(w, s, {BLOCK_WORDS}))))"
             )).alias("block_hash"),
         )
    )

@register(
    "q_block_dedup",
    f"""WITH w AS (
          SELECT doc_id, {words_duck('text')} AS w FROM documents
        ),
        b AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(w, s, s + {BLOCK_WORDS} - 1), ' '))
                   AS block_hash
          FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1, {BLOCK_WORDS})) AS s
                FROM w)
        ),
        f AS (
          SELECT block_hash, MIN(doc_id) AS first_doc FROM b GROUP BY block_hash
        )
        SELECT b.doc_id,
               CAST(COUNT(1) AS BIGINT) AS n_blocks,
               CAST(COALESCE(SUM(CASE WHEN f.first_doc < b.doc_id THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_dup_blocks
        FROM b JOIN f USING (block_hash)
        GROUP BY b.doc_id""",
    doc=f"block-level exact dedup: split each doc into non-overlapping "
        f"{BLOCK_WORDS}-word blocks, hash them, and count per doc how many "
        "blocks already appeared in an earlier doc (min-doc-id ownership) — "
        "the C4-style within-corpus repetition filter at sub-document "
        "granularity",
    tags=("prep", "dedup"),
)
def q_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocks explode map-side off a single words array; block ownership is
    `min(doc_id) OVER (PARTITION BY block_hash)` — ONE shuffle on the block
    hash, then the per-doc rollup, and the expensive normalize+shingle
    projection runs exactly once (a groupBy+join-back formulation would scan
    and hash the corpus twice). Window state per partition is one running
    min, not the group's rows. At 100 TB the shuffled footprint is bounded
    by total blocks; the window never buffers beyond a partition's stream
    because min needs no frame."""
    d = load_table(spark, sf_dir, "documents")
    b = _doc_block_hashes(d)
    first_doc = F.min("doc_id").over(Window.partitionBy("block_hash"))
    return (
        b.withColumn("first_doc", first_doc)
         .groupBy("doc_id")
         .agg(
             F.count(F.lit(1)).alias("n_blocks"),
             F.coalesce(
                 F.sum((F.col("first_doc") < F.col("doc_id")).cast("int")), F.lit(0)
             ).cast("bigint").alias("n_dup_blocks"),
         )
    )


# --- q_exact_substr: sliding-window duplicate-span dedup (ExactSubstr) ---------------

EXSUB_K = 16  # window width in words (the paper's 50-token spans, corpus-scaled)


@register(
    "q_exact_substr",
    f"""WITH w AS (
          SELECT doc_id, {words_duck('text')} AS w FROM documents
        ),
        win AS (
          SELECT doc_id, len(w) AS n_words,
                 unnest(range(1, greatest(len(w) - {EXSUB_K - 1}, 1) + 1)) AS s, w
          FROM w
        ),
        h AS (
          SELECT doc_id, n_words, s,
                 md5(array_to_string(list_slice(w, s, s + {EXSUB_K - 1}), ' ')) AS h
          FROM win
        ),
        f AS (SELECT h, MIN(doc_id) AS first_doc FROM h GROUP BY h),
        b AS (
          SELECT h.doc_id, h.n_words, h.s,
                 CASE WHEN f.first_doc < h.doc_id THEN 1 ELSE 0 END AS dup
          FROM h JOIN f USING (h)
        ),
        tot AS (
          SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_windows,
                 CAST(COALESCE(SUM(dup), 0) AS BIGINT) AS n_dup_windows
          FROM b GROUP BY doc_id
        ),
        d AS (SELECT doc_id, s, LEAST({EXSUB_K}, n_words) AS wd FROM b WHERE dup = 1),
        sp AS (
          SELECT doc_id, s, wd,
                 MAX(s + wd - 1) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
          FROM d
        ),
        agg AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN prev_end IS NULL OR s > prev_end + 1
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
                 CAST(SUM(GREATEST(0, s + wd - 1
                                      - GREATEST(COALESCE(prev_end, 0), s - 1)))
                      AS BIGINT) AS n_dup_words
          FROM sp GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_windows, t.n_dup_windows,
               CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(a.n_dup_words, 0) AS BIGINT) AS n_dup_words
        FROM tot t LEFT JOIN agg a USING (doc_id)""",
    doc=f"ExactSubstr span dedup (Lee et al. 2022): hash every SLIDING "
        f"{EXSUB_K}-word window, own each window by its earliest doc, then "
        "merge overlapping duplicated windows per doc into maximal spans — "
        "per doc: window/duplicate counts, merged span count and the exact "
        "number of words covered by duplicated text (what the paper cuts "
        "out of the corpus); the sub-document sibling of q_block_dedup that "
        "catches duplicates at ANY alignment, not just block boundaries",
    tags=("prep", "dedup"),
)
def q_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper builds a corpus-wide suffix array; the distributed
    re-expression is windowed hashing — every sliding K-word window hashes
    map-side inside a transform (only (doc_id, s, 32-char) rows explode, the
    words array never leaves the row), ownership is one min-window over the
    hash shuffle, and span merging is a per-doc prefix-max window (the
    classic interval-union-by-running-max trick: a window opens a new span
    iff it starts past the running coverage end + 1, and contributes
    exactly the coverage it extends). Two shuffles total — one on the
    window hash, one on doc_id — both bounded by total corpus words; the
    prefix-max window streams (no frame buffering). At 100 TB the hash
    shuffle is the cost, the same bound MinHash shingling already pays."""
    return exact_substr_spans(load_table(spark, sf_dir, "documents"))


def exact_substr_spans(d: DataFrame) -> DataFrame:
    """Shared core of q_exact_substr over any (doc_id, text) frame —
    imported (not reimplemented) by tools/exsub_ab.py for the scale A/B."""
    b = (
        fan_out(d).select("doc_id", words("text").alias("w"))
         .select(
             "doc_id", F.size("w").alias("n_words"),
             F.posexplode(F.expr(
                 f"transform(sequence(1, greatest(size(w) - {EXSUB_K - 1}, 1)), "
                 f"s -> md5(concat_ws(' ', slice(w, s, {EXSUB_K}))))"
             )).alias("pos", "h"),
         )
         .select("doc_id", "n_words", (F.col("pos") + 1).alias("s"), "h")
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("h"))
    b = b.withColumn("dup", (first_doc < F.col("doc_id")).cast("int"))

    tot = b.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.coalesce(F.sum("dup"), F.lit(0)).cast("bigint").alias("n_dup_windows"),
    )

    dups = (b.filter(F.col("dup") == 1)
             .select("doc_id", "s",
                     F.least(F.lit(EXSUB_K), F.col("n_words")).alias("wd")))
    prev = Window.partitionBy("doc_id").orderBy("s") \
                 .rowsBetween(Window.unboundedPreceding, -1)
    dups = dups.withColumn("prev_end", F.max(F.col("s") + F.col("wd") - 1).over(prev))
    spans = dups.groupBy("doc_id").agg(
        F.sum((F.col("prev_end").isNull()
               | (F.col("s") > F.col("prev_end") + 1)).cast("int"))
         .cast("bigint").alias("n_spans"),
        F.sum(F.greatest(
            F.lit(0).cast("bigint"),
            (F.col("s") + F.col("wd") - 1
             - F.greatest(F.coalesce(F.col("prev_end"), F.lit(0)),
                          F.col("s") - 1)).cast("bigint"),
        )).cast("bigint").alias("n_dup_words"),
    )
    return (
        tot.join(spans, "doc_id", "left")
           .select("doc_id", "n_windows", "n_dup_windows",
                   F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
                   F.coalesce("n_dup_words", F.lit(0)).cast("bigint")
                    .alias("n_dup_words"))
    )


# --- q_contamination: benchmark n-gram overlap ---------------------------------------

CONTAM_K = 8          # n-gram width used for decontamination
EVAL_MOD = 13         # doc_id % 13 == 0 plays the role of the eval benchmark

@register(
    "q_contamination",
    f"""WITH w AS (
          SELECT doc_id, {words_duck('text')} AS w FROM documents
        ),
        g AS (
          SELECT doc_id,
                 unnest({word_shingles_duck('w', CONTAM_K)}) AS g
          FROM w
        ),
        bench AS (
          SELECT DISTINCT g FROM g WHERE doc_id % {EVAL_MOD} = 0
        ),
        train AS (
          SELECT DISTINCT doc_id, g FROM g WHERE doc_id % {EVAL_MOD} <> 0
        )
        SELECT t.doc_id,
               CAST(COUNT(1) AS BIGINT) AS n_grams,
               CAST(COALESCE(SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_hit
        FROM train t LEFT JOIN bench b ON t.g = b.g
        GROUP BY t.doc_id""",
    doc=f"benchmark decontamination: {CONTAM_K}-gram overlap of every "
        "training doc against the eval set's n-gram inventory (eval = "
        f"doc_id%{EVAL_MOD}==0 here) — the leakage check run before any "
        "corpus ships",
    tags=("prep", "contamination"),
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval inventory is DISTINCT n-grams of the (small) benchmark —
    broadcast to the train side, so the corpus-sized relation never
    shuffles for the join; per-doc dedup of train n-grams is one groupBy
    keyed (doc_id, gram) with map-side combine. At 100 TB the broadcast
    bound is the benchmark suite (MBs), independent of corpus size; if the
    eval inventory ever outgrew broadcast, the same plan degrades to a
    shuffle join on the gram hash — semantics unchanged."""
    from flink_job_spark.functions.text import shingle_tokens

    d = fan_out(load_table(spark, sf_dir, "documents"))
    g = (
        d.select("doc_id", words("text").alias("w"))
         .select("doc_id", F.expr(shingle_tokens("w")).alias("st"))
         .select("doc_id", F.explode(
             word_shingles("st", CONTAM_K, premerged=True)).alias("g"))
    )
    bench = g.filter(F.col("doc_id") % EVAL_MOD == 0).select("g").distinct()
    train = g.filter(F.col("doc_id") % EVAL_MOD != 0).distinct()
    return (
        train.join(F.broadcast(bench.withColumn("hit", F.lit(1))), "g", "left")
             .groupBy("doc_id")
             .agg(
                 F.count(F.lit(1)).alias("n_grams"),
                 F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hit"),
             )
    )


# --- q_group_median: exact interpolated quantiles per group --------------------------

@register(
    "q_group_median",
    """SELECT l_returnflag,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 4) AS p25,
              ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 4) AS median,
              ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 4) AS p75
       FROM lineitem GROUP BY l_returnflag""",
    doc="exact per-group interpolated quantiles (p25/median/p75) — the "
        "distribution summary behind length/score cutoffs when a pipeline "
        "picks filtering thresholds from the data",
    tags=("prep", "agg", "quantile"),
)
def q_group_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile() is a sort-based aggregate: one shuffle on the group
    key, each group's values sorted within its reducer. Correct but
    memory-bound by the largest group at 100 TB — which is why
    q_approx_quantiles (KLL-style sketch, constant memory, mergeable) is the
    registered scale path; this key is the exactness baseline the sketch is
    judged against. Both engines define quantiles by the same 1-based linear
    interpolation, so values match to rounding."""
    # fan_out: the sort-based exact percentile buffers all values in the
    # partial agg — single-task on the bench's one-rowgroup scan otherwise
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    price = F.col("l_extendedprice").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.percentile(price, F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile(price, F.lit(0.5)), 4).alias("median"),
        F.round(F.percentile(price, F.lit(0.75)), 4).alias("p75"),
    )


# --- q_word_entropy: unigram entropy quality signal ----------------------------------

@register(
    "q_word_entropy",
    f"""WITH c AS (
          SELECT doc_id, w AS word, CAST(COUNT(1) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest({words_duck('text')}) AS w FROM documents)
          GROUP BY doc_id, w
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_words,
               CAST(COUNT(1) AS BIGINT) AS n_distinct_words,
               ROUND(ln(CAST(SUM(c) AS DOUBLE))
                     - CAST(SUM(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,18)))
                            AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 4) AS entropy
        FROM c GROUP BY doc_id""",
    doc="per-document unigram word entropy (H = ln N - Σ c·ln c / N) — the "
        "low-entropy gate that drops boilerplate/keyword-stuffed docs from "
        "training corpora",
    tags=("prep", "text", "quality"),
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two combine-enabled shuffles, both on bounded state: (doc, word)
    counts then per-doc rollup. The Σ c·ln c term rides an exact DECIMAL
    detour — each double term is cast to DECIMAL(38,18) before summing, so
    the aggregate is partition-order-free and engine-comparable (double
    addition is not associative; decimal addition is)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    c = (
        d.select("doc_id", F.explode(words("text")).alias("word"))
         .groupBy("doc_id", "word")
         .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("bigint")
    clogc = F.sum(
        (F.col("c") * F.log(F.col("c").cast("double"))).cast("decimal(38,18)")
    )
    return c.groupBy("doc_id").agg(
        n.alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.round(
            F.log(n.cast("double")) - clogc.cast("double") / n.cast("double"), 4
        ).alias("entropy"),
    )


# --- q_train_shuffle: deterministic global shuffle + sharding ------------------------

SHARD_SIZE = 64

@register(
    "q_train_shuffle",
    f"""WITH r AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
                   AS pos
          FROM documents
        )
        SELECT doc_id, CAST(floor(pos / {SHARD_SIZE}) AS BIGINT) AS shard, pos FROM r""",
    doc="deterministic global training-order shuffle: permute docs by "
        f"md5(doc_id), cut into {SHARD_SIZE}-doc shards with in-shard "
        "positions — the reproducible corpus shuffle written before "
        "training, identical on every rerun (never rand())",
    tags=("prep", "shuffle"),
)
def q_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The md5 sort key IS the shuffle: ordering by a uniform hash of the id
    is a deterministic random permutation. Expressed here as one global
    window for oracle parity; the 100 TB path is repartitionByRange(md5_key)
    + per-partition row_number + per-partition offset (computed from
    partition counts, the q_skip_offset technique) — same permutation, no
    single-reducer sort. Shard files then write out partitioned by `shard`."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    r = d.select("doc_id").withColumn(
        "pos", (F.row_number().over(w) - 1).cast("bigint")
    )
    return r.select(
        "doc_id", F.floor(F.col("pos") / SHARD_SIZE).cast("bigint").alias("shard"), "pos"
    )


# --- format roundtrips: CSV / JSON lines sources -------------------------------------

_ROUNDTRIP_DIRS: set[str] = set()


def _cleanup_roundtrip_dirs() -> None:
    import shutil
    for d in _ROUNDTRIP_DIRS:
        shutil.rmtree(d, ignore_errors=True)


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    # pid-scoped: a path shared across processes races when two runs at the
    # same scale factor overwrite gen/part files mid-read (flaky parity);
    # pid scoping means no later run reuses the dir, so each process removes
    # its own copies at exit instead of accreting full-table copies in /tmp
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join(tempfile.gettempdir(),
                     f"fjs_roundtrip_{os.getpid()}_{tag}_{fmt}")
    if not _ROUNDTRIP_DIRS:
        import atexit
        atexit.register(_cleanup_roundtrip_dirs)
    _ROUNDTRIP_DIRS.add(d)
    return d

@register(
    "q_csv_roundtrip",
    """SELECT c_mktsegment,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
              MIN(c_name) AS min_name
       FROM customer GROUP BY c_mktsegment""",
    doc="CSV source/sink roundtrip: write `customer` as headered CSV, read "
        "it back under the declared schema, aggregate — proves the CSV codec "
        "path (quoting, decimals, nulls) is lossless against the parquet "
        "original",
    tags=("formats", "source", "sink"),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema-on-read CSV: the declared StructType (taken from the parquet
    original) drives parsing, so decimals come back as DECIMAL not DOUBLE —
    the oracle aggregates the original table, and equality proves the text
    codec loses nothing. The decimal SUM is exact, hence order-free. At
    100 TB, CSV input splits by line ranges and this is a plain scan+agg;
    mode=FAILFAST would surface any corrupt line instead of nulling it."""
    c = load_table(spark, sf_dir, "customer")
    path = _roundtrip_dir(sf_dir, "csv")
    c.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(c.schema).option("header", True).csv(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        # c_acctbal is a 2-decimal double: sum through exact DECIMAL so the
        # aggregate is partition-order-free (double SUM is not associative)
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
        F.min("c_name").alias("min_name"),
    )

@register(
    "q_json_roundtrip",
    """SELECT event_type,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              MIN(CAST(ts AS TIMESTAMP)) AS min_ts,
              MAX(CAST(ts AS TIMESTAMP)) AS max_ts,
              MIN(value) AS min_value,
              MAX(value) AS max_value
       FROM events GROUP BY event_type""",
    doc="JSON-lines source/sink roundtrip: write `events` as JSONL, read "
        "back under the declared schema (NTZ timestamps, doubles), "
        "aggregate — proves the JSON codec path is value-preserving",
    tags=("formats", "source", "sink"),
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubles survive JSON because Spark serializes them round-trippably;
    the checks deliberately use only order-free exact aggregates (count,
    min/max) — a double SUM would be partition-order-dependent and is the
    kind of nondeterminism this suite bans. Timestamps stay NTZ end to end
    (reference semantics, SURVEY §1.2). JSONL splits by line at any scale."""
    e = load_table(spark, sf_dir, "events")
    path = _roundtrip_dir(sf_dir, "json")
    # default NTZ JSON format truncates to milliseconds; pin microseconds
    ntz_fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    e.write.mode("overwrite").option("timestampNTZFormat", ntz_fmt).json(path)
    back = (
        spark.read.schema(e.schema)
        .option("timestampNTZFormat", ntz_fmt)
        .json(path)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )

@register(
    "q_orc_roundtrip",
    """SELECT s_nationkey,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
              MIN(s_name) AS min_name
       FROM supplier GROUP BY s_nationkey""",
    doc="ORC source/sink roundtrip: write `supplier` as ORC, read it back, "
        "aggregate — proves the columnar-ORC codec path against the parquet "
        "original (the third major on-disk format after parquet/CSV/JSON)",
    tags=("formats", "source", "sink"),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC is Spark-native and splittable like parquet; schema travels in the
    file footer so no declared StructType is needed on re-read. Aggregates
    are exact (count/min + decimal-detour sum) hence order-free. At 100 TB
    ORC scans get the same predicate pushdown/column pruning as parquet."""
    s = load_table(spark, sf_dir, "supplier")
    path = _roundtrip_dir(sf_dir, "orc")
    s.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_acctbal"),
        F.min("s_name").alias("min_name"),
    )


@register(
    "q_avro_roundtrip",
    """SELECT c_mktsegment,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_acctbal,
              MIN(c_name) AS min_name,
              CAST(SUM(CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_alt
       FROM customer GROUP BY c_mktsegment""",
    doc="Avro source/sink roundtrip: per Arrow batch, serialize "
        "`customer` rows into a REAL Avro object container file "
        "(deflate codec, zigzag varints, union-null column) with the "
        "native functions/avro.py writer, decode it back with the "
        "native reader, aggregate — proves the interchange format "
        "training pipelines exchange is lossless here without the "
        "external spark-avro jar",
    tags=("formats", "source", "sink"),
)
def q_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode→decode pass is one Arrow-batched map stage (each batch
    becomes one OCF, the shape of a per-task Avro part file), so at
    100 TB the codec work rides the scan partitioning with zero extra
    shuffle; the only Exchange is the final aggregation, same as the
    CSV/ORC twins. A union-null column (alt_name, NULL on custkey%7==0)
    proves null transport; doubles survive because Avro stores raw IEEE
    bytes. Spark's own `avro` source is an external jar not shipped
    here — the native OCF twins are the coverage, and the plan shape
    (scan → map codec → agg) is identical to what spark-avro would do."""
    import pandas as pd

    from flink_job_spark.functions.avro import (make_schema, read_ocf,
                                                write_ocf)

    avro_schema = make_schema("customer", [
        ("c_custkey", "long", False), ("c_name", "string", False),
        ("c_nationkey", "int", False), ("c_acctbal", "double", False),
        ("c_mktsegment", "string", False), ("alt_name", "string", True)])
    out_schema = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("alt_name", T.StringType()),
    ])

    def roundtrip(it):
        for pdf in it:
            rows = [
                (int(k), n, int(nk), float(b), s,
                 None if k % 7 == 0 else n.upper())
                for k, n, nk, b, s in zip(
                    pdf["c_custkey"], pdf["c_name"], pdf["c_nationkey"],
                    pdf["c_acctbal"], pdf["c_mktsegment"])
            ]
            _, back = read_ocf(write_ocf(avro_schema, rows))
            yield pd.DataFrame(back, columns=[f.name for f in out_schema])

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    back = c.mapInPandas(roundtrip, schema=out_schema)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
         .alias("sum_acctbal"),
        F.min("c_name").alias("min_name"),
        F.sum(F.when(F.col("alt_name").isNull(), 1).otherwise(0))
         .cast("long").alias("n_null_alt"),
    )


# --- q_partition_prune: partitioned layout + partition-pruned read -------------------

PRUNE_MONTH = "1995-03"

@register(
    "q_partition_prune",
    f"""SELECT '{PRUNE_MONTH}' AS o_month,
               CAST(COUNT(1) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders WHERE strftime(o_orderdate, '%Y-%m') = '{PRUNE_MONTH}'""",
    doc="hive-partitioned layout + partition-pruned read: write `orders` "
        "partitioned by order month, read back filtering ONE month, "
        "aggregate — the directory-pruning path that turns a 100 TB scan "
        "into a one-partition scan (mirrors the reference's month "
        "partitioning on LOAD_DTTM, mis:905)",
    tags=("formats", "layout", "pruning"),
)
def q_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The month filter is satisfied from DIRECTORY NAMES (PartitionFilters
    in the plan — pinned in tests/test_plans.py): Spark lists only
    o_month=1995-03 and never opens any other file. This is the read-side
    payoff of the reference's month-partitioned sink; at 100 TB a
    single-month audit touches 1/84th of the files no matter how big the
    table gets. The write side demonstrates dynamic partition write (one
    directory per observed month)."""
    o = load_table(spark, sf_dir, "orders")
    path = _roundtrip_dir(sf_dir, "part")
    # cluster by the partition column before the dynamic-partition write
    # (guide §6: avoids one-task-writes-every-directory on the bench's
    # single-partition scan AND many-files-per-directory after a blind
    # fan-out; each month lands as one file written in parallel)
    (fan_out_by(o.withColumn("o_month",
                             F.date_format("o_orderdate", "yyyy-MM")),
                "o_month")
      .write.mode("overwrite").partitionBy("o_month").parquet(path))
    back = spark.read.parquet(path).filter(F.col("o_month") == PRUNE_MONTH)
    return back.groupBy("o_month").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_cust"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


# --- q_weighted_sample: deterministic weighted sampling (Efraimidis–Spirakis) --------

WSAMPLE_K = 50

@register(
    "q_weighted_sample",
    f"""WITH k AS (
          SELECT doc_id, n_chars,
                 pow((CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                           AS BIGINT) + 0.5) / 4294967296.0,
                     1.0 / CAST(n_chars AS DOUBLE)) AS es_key
          FROM documents
        )
        SELECT doc_id, n_chars FROM k
        ORDER BY es_key DESC, doc_id LIMIT {WSAMPLE_K}""",
    doc=f"weighted sampling without replacement (top-{WSAMPLE_K} by "
        "Efraimidis–Spirakis key u^(1/w), weight = doc length, u from md5) — "
        "length-weighted corpus subsampling that is reproducible across "
        "engines and retries (never rand())",
    tags=("prep", "sampling"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E-S key makes weighted sampling a deterministic top-k: u is the
    md5 bucket (uniform, never 0 thanks to +0.5), and P(doc in sample) is
    proportional to weight. Spark fuses orderBy+limit into
    TakeOrderedAndProject — each map partition keeps its local top-k, the
    driver merges k·partitions rows, nothing global ever sorts. That plan
    survives any corpus size; k is the only memory bound.

    pow() here is libm-adjacent but NOT in the parity surface: the key never
    leaves the plan (output is doc_id/n_chars), so engines diverge only if a
    <=2-ulp pow difference FLIPS the order of two docs — requiring two keys
    within ~1e-16 of each other, P ≈ 1e-11 over this corpus's pairs. The
    keys that do emit transcendental-derived VALUES (decay, tfidf, entropy)
    avoid libm entirely; this ranking-only use is the documented exception."""
    d = load_table(spark, sf_dir, "documents")
    u = (md5_u32(F.col("doc_id").cast("string")) + F.lit(0.5)) / F.lit(4294967296.0)
    es_key = F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double"))
    return (
        d.select("doc_id", "n_chars", es_key.alias("es_key"))
         .orderBy(F.col("es_key").desc(), "doc_id")
         .limit(WSAMPLE_K)
         .select("doc_id", "n_chars")
    )


# --- q_triangle_count: triangles in the shared-block graph ---------------------------

@register(
    "q_triangle_count",
    f"""WITH b AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(w, s, s + {BLOCK_WORDS} - 1), ' '))
                   AS block_hash
          FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1, {BLOCK_WORDS})) AS s
                FROM (SELECT doc_id, {words_duck('text')} AS w FROM documents))
        ),
        e AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM b x JOIN b y
            ON x.block_hash = y.block_hash AND x.doc_id < y.doc_id
        )
        SELECT CAST(COUNT(1) AS BIGINT) AS n_triangles,
               (SELECT CAST(COUNT(1) AS BIGINT) FROM e) AS n_edges
        FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""",
    doc="triangle counting on the shared-block similarity graph (edge = two "
        "docs sharing a 16-word block): the oriented-edge two-join algorithm "
        "— triangle density tells a dedup pipeline whether near-dup clusters "
        "are cliques (template families) or chains (drift)",
    tags=("prep", "graph", "join"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges are oriented low→high at construction, so each triangle is
    counted exactly once by the wedge join (e1.b=e2.a) closed by e3 — the
    standard O(m^1.5)-work formulation, all equi-joins, no NestedLoop. The
    edge list is built by the block-hash inverted index (pairs sharing no
    block never materialize) and persisted: three scans of one cached edge
    set, not three recomputes. At 100 TB wedge skew (a hub doc in e2.a) is
    the known hotspot — AQE skew-join splits it; degree-capping hubs first
    is the documented mitigation, same as the LSH stop-shingle cap."""
    d = load_table(spark, sf_dir, "documents")
    b = _doc_block_hashes(d)
    x = b.alias("x")
    y = b.alias("y")
    e = (
        x.join(y, (F.col("x.block_hash") == F.col("y.block_hash"))
                  & (F.col("x.doc_id") < F.col("y.doc_id")))
         .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
         .distinct()
         .persist()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
          .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
          .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tri.crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges"))))


# --- q_class_weights: inverse-frequency class weights --------------------------------

@register(
    "q_class_weights",
    """WITH c AS (SELECT label, COUNT(1) AS cnt FROM embeddings GROUP BY label)
       SELECT label, CAST(cnt AS BIGINT) AS n,
              ROUND(CAST(SUM(cnt) OVER () AS DOUBLE)
                    / (CAST(COUNT(1) OVER () AS DOUBLE) * CAST(cnt AS DOUBLE)),
                    6) AS weight
       FROM c""",
    doc="inverse-frequency class weights from the embedding labels: "
        "weight = N / (k * n_label), the balanced-loss reweighting computed "
        "before training on an imbalanced corpus (invariant: sum of "
        "n * weight = N)",
    tags=("prep", "agg", "ml"),
)
def q_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One combine-enabled shuffle to k label counts; the N and k totals are
    a window over the k-row aggregate (trivially small — at 100 TB the label
    cardinality, not the corpus, bounds this step). Division order is pinned
    to N / (k * n) in both engines so the single IEEE divide agrees."""
    e = load_table(spark, sf_dir, "embeddings")
    c = e.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy()
    return c.select(
        "label",
        F.col("cnt").cast("bigint").alias("n"),
        F.round(
            F.sum("cnt").over(w).cast("double")
            / (F.count(F.lit(1)).over(w).cast("double")
               * F.col("cnt").cast("double")),
            6,
        ).alias("weight"),
    )


# --- q_boilerplate_coverage: corpus-frequent block coverage per doc ------------------

BOILER_DF_CAP = 2   # a block in > this many distinct docs is boilerplate

@register(
    "q_boilerplate_coverage",
    f"""WITH w AS (
          SELECT doc_id, {words_duck('text')} AS w FROM documents
        ),
        b AS (
          SELECT doc_id,
                 md5(array_to_string(list_slice(w, s, s + {BLOCK_WORDS} - 1), ' '))
                   AS block_hash
          FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1, {BLOCK_WORDS})) AS s
                FROM w)
        ),
        o AS (
          SELECT doc_id, block_hash, COUNT(1) AS n_occ
          FROM b GROUP BY doc_id, block_hash
        ),
        f AS (
          SELECT doc_id, block_hash, n_occ,
                 COUNT(1) OVER (PARTITION BY block_hash) AS df
          FROM o
        )
        SELECT doc_id,
               CAST(SUM(n_occ) AS BIGINT) AS n_blocks,
               CAST(COALESCE(SUM(CASE WHEN df > {BOILER_DF_CAP} THEN n_occ
                                      ELSE 0 END), 0) AS BIGINT) AS n_boiler,
               ROUND(CAST(COALESCE(SUM(CASE WHEN df > {BOILER_DF_CAP} THEN n_occ
                                             ELSE 0 END), 0) AS DOUBLE)
                     / CAST(SUM(n_occ) AS DOUBLE), 6) AS coverage
        FROM f GROUP BY doc_id""",
    doc=f"per-doc boilerplate coverage: fraction of its {BLOCK_WORDS}-word "
        f"blocks whose corpus document-frequency exceeds {BOILER_DF_CAP} — "
        "the frequency-based C4/RefinedWeb boilerplate detector that "
        "complements q_block_dedup's earlier-doc ownership view",
    tags=("prep", "dedup", "text"),
)
def q_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three bounded shuffles: (doc, block) occurrence rollup (combine-
    enabled), document-frequency as a COUNT window over the already-distinct
    (doc, block) rows — counting rows IS counting distinct docs, which
    sidesteps Spark's unsupported COUNT(DISTINCT)-over-window — then the
    per-doc rollup. Shuffled footprint is bounded by total distinct
    (doc, block) pairs; no join-back rescans the corpus."""
    d = load_table(spark, sf_dir, "documents")
    b = _doc_block_hashes(d)
    o = b.groupBy("doc_id", "block_hash").agg(F.count(F.lit(1)).alias("n_occ"))
    f = o.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("block_hash")))
    boiler = F.coalesce(
        F.sum(F.when(F.col("df") > BOILER_DF_CAP, F.col("n_occ"))
               .otherwise(F.lit(0))), F.lit(0))
    return (
        f.groupBy("doc_id")
         .agg(
             F.sum("n_occ").cast("bigint").alias("n_blocks"),
             boiler.cast("bigint").alias("n_boiler"),
             F.round(boiler.cast("double")
                     / F.sum("n_occ").cast("double"), 6).alias("coverage"),
         )
    )


# --- q_cross_val_folds: deterministic k-fold assignment with leakage guard -----------

CV_FOLDS = 5

@register(
    "q_cross_val_folds",
    f"""WITH k AS (
      SELECT doc_id, md5({norm_text_duck('text')}) AS content_key FROM documents
    ),
    f AS (
      SELECT doc_id, content_key,
             CAST({md5_u32_duck("content_key")}
                  % {CV_FOLDS} AS INT) AS fold
      FROM k
    )
    SELECT fold, CAST(COUNT(1) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT content_key) AS BIGINT) AS n_keys
    FROM f GROUP BY fold""",
    doc=f"deterministic {CV_FOLDS}-fold cross-validation split keyed on the "
        "CONTENT hash, not the row id — duplicate documents always land in "
        "the same fold, so no near-identical text leaks across the "
        "train/eval boundary; per-fold doc and distinct-content counts",
    tags=("prep", "ml"),
)
def q_cross_val_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold = md5 bucket of the CONTENT key: duplicates share a fold by
    construction (the leakage failure mode of row-id splits), assignment is
    reproducible across engines and retries, and rebalancing is impossible
    to get wrong because nothing is sampled. Map-only until one
    fold-cardinality aggregate."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    key = F.md5(norm_text("text"))
    fold = (md5_u32(key) % CV_FOLDS).cast("int")
    return (d.select(fold.alias("fold"), key.alias("content_key"))
             .groupBy("fold")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                  F.countDistinct("content_key").cast("bigint").alias("n_keys")))


# --- q_schema_evolution: mergeSchema across parquet generations ----------------

@register(
    "q_schema_evolution",
    """SELECT CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_mktsegment END
                AS c_mktsegment,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
       FROM customer GROUP BY 1""",
    doc="schema evolution: two parquet generations (gen1 lacks the "
        "c_mktsegment column gen2 added), read as ONE dataset via "
        "mergeSchema — old files surface NULL for the new column instead of "
        "failing; the additive-column path every long-lived table hits",
    tags=("formats", "source", "schema"),
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution the parquet-native way: the footer schemas
    of all files union by NAME (mergeSchema=true), missing columns read as
    NULL — no rewrite of old data, the same contract Iceberg formalizes with
    schema-id tracking. The oracle recreates the merged view from the
    original table, proving no rows or values are lost. At 100 TB,
    mergeSchema's footer union is a driver-side listing cost only; pin the
    final schema in the table catalog to skip even that."""
    c = load_table(spark, sf_dir, "customer")
    base = _roundtrip_dir(sf_dir, "schemaevo")
    even = F.col("c_custkey") % 2 == 0
    c.filter(even).select("c_custkey", "c_name", "c_acctbal") \
        .write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
    c.filter(~even).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment") \
        .write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    back = spark.read.option("mergeSchema", True).parquet(
        os.path.join(base, "gen=1"), os.path.join(base, "gen=2"))
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
         .cast("double").alias("sum_acctbal"),
    )


# --- q_csv_badrecords: PERMISSIVE corrupt-record handling ----------------------

BAD_LINES = 7

@register(
    "q_csv_badrecords",
    f"""SELECT CAST(COUNT(1) + {BAD_LINES} AS BIGINT) AS n_rows,
              CAST(COUNT(1) AS BIGINT) AS n_good,
              CAST({BAD_LINES} AS BIGINT) AS n_corrupt,
              CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
       FROM customer""",
    doc=f"fault-tolerant CSV ingestion: a source directory polluted with "
        f"{BAD_LINES} malformed lines is read in PERMISSIVE mode — corrupt "
        "rows surface in _corrupt_record and are COUNTED, clean rows "
        "aggregate losslessly; the errors-as-data ingestion contract "
        "(FAILFAST would abort a 100 TB load for one bad line, DROPMALFORMED "
        "would hide the problem)",
    tags=("formats", "source", "audit"),
)
def q_csv_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third CSV mode nobody tests until production: PERMISSIVE keeps
    the raw offending line in a side column instead of failing or silently
    dropping. The parsed frame is cached before touching _corrupt_record —
    Spark disallows filtering the internal corrupt column on the lazy parse
    (SPARK-38523-adjacent restriction); at scale the cache is one pass over
    data that was being read anyway. The oracle knows the injected count
    closed-form and checks the clean-row aggregate against the original
    table, proving corrupt lines contaminated nothing."""
    c = load_table(spark, sf_dir, "customer")
    path = _roundtrip_dir(sf_dir, "badcsv")
    c.write.mode("overwrite").option("header", False).csv(path)
    # plain file I/O: a 7-row createDataFrame + text write costs ~5 s of
    # JVM/commit overhead for what is one local file append
    with open(os.path.join(path, "part-junk.csv"), "w") as fh:
        for i in range(BAD_LINES):
            fh.write(f"not_a_key_{i}|garbage\n")
    # copy first: StructType.add mutates in place and DataFrame.schema
    # returns the CACHED object — adding to it would corrupt c.schema for
    # every later use in this session
    from pyspark.sql import types as T
    schema = T.StructType(list(c.schema.fields)).add("_corrupt_record", "string")
    parsed = (
        spark.read.schema(schema)
        .option("header", False)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    ).cache()
    good = F.col("_corrupt_record").isNull()
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(good.cast("int")).cast("bigint").alias("n_good"),
        F.sum((~good).cast("int")).cast("bigint").alias("n_corrupt"),
        F.sum(F.when(good, F.col("c_acctbal").cast("decimal(18,2)")))
         .cast("double").alias("sum_acctbal"),
    )


# --- q_pack_bins: whole-document next-fit bin packing --------------------------------

BINPACK_BUDGET = 128  # whitespace tokens per packed context window

PACK_SCHEMA = ("source string, doc_id long, n_tokens long, bin_idx long, "
               "bin_fill long")


def pack_next_fit(rows: DataFrame, budget: int = BINPACK_BUDGET) -> DataFrame:
    """Next-fit packing of (source, doc_id, t) rows — the fuzzable core of
    q_pack_bins (tests/test_behavior_properties.py runs it against a
    brute-force reference on arbitrary inputs)."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        b, fill = 1, 0
        first = True
        for t in pdf["t"]:
            t = int(t)
            if first:
                b, fill, first = 1, t, False
            elif fill + t > budget:
                b, fill = b + 1, t
            else:
                fill += t
            bins.append(b)
            fills.append(fill)
        pdf["bin_idx"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf.rename(columns={"t": "n_tokens"})

    return fan_out_by(rows, "source").groupBy("source").applyInPandas(
        pack, PACK_SCHEMA)



@register(
    "q_pack_bins",
    f"""WITH RECURSIVE s AS (
          SELECT source, doc_id, {ws_token_count_duck('text')} AS t,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                   AS rn
          FROM documents),
        p(source, doc_id, t, rn, bin, fill) AS (
          SELECT source, doc_id, t, rn, CAST(1 AS BIGINT), t
          FROM s WHERE rn = 1
          UNION ALL
          SELECT s.source, s.doc_id, s.t, s.rn,
                 CASE WHEN p.fill + s.t > {BINPACK_BUDGET}
                      THEN p.bin + 1 ELSE p.bin END,
                 CASE WHEN p.fill + s.t > {BINPACK_BUDGET}
                      THEN s.t ELSE p.fill + s.t END
          FROM s JOIN p ON s.source = p.source AND s.rn = p.rn + 1)
        SELECT source, doc_id, t AS n_tokens,
               CAST(bin AS BIGINT) AS bin_idx,
               CAST(fill AS BIGINT) AS bin_fill
        FROM p""",
    doc=f"whole-document next-fit packing: walk each source's docs in "
        f"doc_id order and open a new bin whenever adding the next doc "
        f"would exceed {BINPACK_BUDGET} tokens — the no-split sibling of "
        "q_sequence_pack for pipelines that must not truncate documents; "
        "grouped pandas scan vs recursive-CTE oracle",
    tags=("prep", "pandas", "stateful"),
)
def q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit is inherently sequential — bin state resets when the budget
    trips, which no cumulative-sum-and-divide can express (q_sequence_pack's
    floor(offset/budget) works only because IT splits documents at
    boundaries; keeping docs whole makes the remainder carry) — so it rides
    applyInPandas: one Arrow group per source, a python loop over the
    doc_id-sorted rows, two integers of state. Pure integer arithmetic, so
    batch, oracle, and any replay agree bit-for-bit. An over-budget doc
    occupies a bin alone (fill > budget), same as the oracle's CASE."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    rows = d.select("source", "doc_id", ws_token_count("text").alias("t"))
    return pack_next_fit(rows)


# --- q_k_anonymity: quasi-identifier suppression audit --------------------------

KANON_K = 5          # minimum group size an equivalence class may publish at
KANON_BAND = 2000.0  # acctbal generalization width (the coarsening step)


@register(
    "q_k_anonymity",
    f"""WITH cells AS (
          SELECT c_nationkey AS nat, c_mktsegment AS seg,
                 CAST(FLOOR(c_acctbal / {KANON_BAND}) AS BIGINT) AS band,
                 CAST(COUNT(1) AS BIGINT) AS n
          FROM customer GROUP BY 1, 2, 3)
       SELECT CASE WHEN n >= {KANON_K} THEN CAST(nat AS VARCHAR)
                   ELSE '*' END AS nation_qi,
              CASE WHEN n >= {KANON_K} THEN seg ELSE '*' END AS segment_qi,
              CASE WHEN n >= {KANON_K} THEN CAST(band AS VARCHAR)
                   ELSE '*' END AS band_qi,
              CAST(SUM(n) AS BIGINT) AS n_rows,
              CAST(COUNT(1) AS BIGINT) AS n_cells
       FROM cells GROUP BY 1, 2, 3
       ORDER BY nation_qi, segment_qi, band_qi""",
    doc=f"k-anonymity suppression (k={KANON_K}): customers generalize to the "
        f"(nation, segment, balance-band-of-{KANON_BAND:g}) quasi-identifier; "
        "equivalence classes smaller than k collapse into one suppressed "
        "'*' bucket — the privacy gate a training-data release runs before "
        "publishing grouped records",
    tags=("prep", "privacy", "agg"),
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two combine-enabled aggregations and nothing else: the first builds
    the equivalence-class histogram (the only data-sized shuffle — at
    100 TB it's one exchange on the QI key), the second folds sub-k cells
    into the suppressed bucket over cell-count-sized input. The band is
    FLOOR of the same IEEE double division in both engines (cast AFTER
    floor — DuckDB CAST(double AS BIGINT) rounds). Publishing n >= k cells
    and only the aggregate mass of the rest is exactly the k-anonymity
    contract: no published row set smaller than k."""
    c = load_table(spark, sf_dir, "customer")
    cells = (
        c.select(F.col("c_nationkey").alias("nat"),
                 F.col("c_mktsegment").alias("seg"),
                 F.floor(F.col("c_acctbal") / KANON_BAND)
                  .cast("bigint").alias("band"))
         .groupBy("nat", "seg", "band")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    keep = F.col("n") >= KANON_K
    return (
        cells.select(
            F.when(keep, F.col("nat").cast("string")).otherwise("*")
             .alias("nation_qi"),
            F.when(keep, F.col("seg")).otherwise("*").alias("segment_qi"),
            F.when(keep, F.col("band").cast("string")).otherwise("*")
             .alias("band_qi"),
            "n")
        .groupBy("nation_qi", "segment_qi", "band_qi")
        .agg(F.sum("n").cast("bigint").alias("n_rows"),
             F.count(F.lit(1)).cast("bigint").alias("n_cells"))
        .orderBy("nation_qi", "segment_qi", "band_qi")
    )


@register(
    "q_xml_roundtrip",
    """SELECT p_brand,
              CAST(COUNT(1) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                AS sum_price,
              MIN(p_name) AS min_name,
              MAX(p_partkey) AS max_key
       FROM part GROUP BY p_brand""",
    doc="XML source/sink roundtrip: write `part` as element-per-row XML, "
        "read it back under the declared schema, aggregate — proves the "
        "XML codec path (entity escaping, decimals-from-text, typed "
        "elements) is lossless against the parquet original",
    tags=("formats", "source", "sink"),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ships the XML data source natively (the former spark-xml
    package): rowTag framing on read, element-per-column on write. The
    declared StructType drives parsing so doubles come back typed, and
    p_name's punctuation exercises entity escaping. The aggregate goes
    through exact DECIMAL before the final double cast, so it is
    partition-order-free. XML files split per-file (rowTag framing is not
    line-splittable like CSV/JSONL) — at 100 TB you write many medium
    files, which the parallel write here already does."""
    p = load_table(spark, sf_dir, "part")
    path = _roundtrip_dir(sf_dir, "xml")
    (p.write.mode("overwrite").format("xml")
      .option("rootTag", "parts").option("rowTag", "part").save(path))
    back = (spark.read.schema(p.schema).format("xml")
            .option("rowTag", "part").load(path))
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double")
         .alias("sum_price"),
        F.min("p_name").alias("min_name"),
        F.max("p_partkey").alias("max_key"),
    )


# --- q_shard_snake: balanced shard assignment by snake order -------------------------

SNAKE_SHARDS = 8


@register(
    "q_shard_snake",
    f"""WITH t AS (
          SELECT source, doc_id, {ws_token_count_duck('text')} AS tok
          FROM documents
        ),
        r AS (
          SELECT source, doc_id, tok,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY tok DESC, doc_id) - 1 AS r
          FROM t
        ),
        s AS (
          SELECT source, doc_id, tok,
                 CASE WHEN (r // {SNAKE_SHARDS}) % 2 = 0
                      THEN r % {SNAKE_SHARDS}
                      ELSE {SNAKE_SHARDS - 1} - (r % {SNAKE_SHARDS}) END AS shard
          FROM r
        )
        SELECT source, CAST(shard AS INTEGER) AS shard,
               CAST(COUNT(1) AS BIGINT) AS n_docs,
               CAST(SUM(tok) AS BIGINT) AS sum_tokens,
               CAST(MAX(tok) AS BIGINT) AS max_tokens
        FROM s GROUP BY source, shard""",
    doc=f"balanced training-shard assignment: within each source, docs rank "
        f"by token count (desc, doc_id tie-break) and deal into "
        f"{SNAKE_SHARDS} shards in SNAKE order (0..N-1 then N-1..0), the "
        "deterministic parallel-friendly approximation of LPT bin packing — "
        "per-shard doc/token rollups; snake keeps every shard's token total "
        "within one max-document of the mean, which plain round-robin does "
        "not",
    tags=("prep", "sampling", "layout"),
)
def q_shard_snake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank window partitions by source, so it parallelizes across
    sources (the global-sort variant would need a range-partitioned rank;
    per-source is what shard writers actually do — one output directory per
    source). Integer division pins the snake flip in both engines (DuckDB
    needs `//` — its `/` is float division; Spark truncates the double via
    CAST, identical to floor here because r >= 0).
    Shuffles: one for the window, one combine-enabled rollup — both keyed
    on source, the natural write-partitioning at 100 TB; a pathological
    single giant source would salt the rank the same way q_train_shuffle's
    docstring records."""
    # no fan_out (r9): the token count is one cheap regex count and the
    # window shuffle immediately re-partitions by source anyway — the
    # extra exchange measured as pure overhead on this sub-second key
    d = load_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", ws_token_count("text").alias("tok"))
    r = F.row_number().over(
        Window.partitionBy("source").orderBy(F.col("tok").desc(), "doc_id")) - 1
    t = t.withColumn("r", r)
    k = (F.col("r") / SNAKE_SHARDS).cast("bigint")  # floor: r >= 0
    pos = F.col("r") % SNAKE_SHARDS
    shard = F.when(k % 2 == 0, pos).otherwise(F.lit(SNAKE_SHARDS - 1) - pos)
    return (
        t.withColumn("shard", shard.cast("int"))
         .groupBy("source", "shard")
         .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
              F.sum("tok").cast("bigint").alias("sum_tokens"),
              F.max("tok").cast("bigint").alias("max_tokens"))
    )


# --- q_mix_temperature: temperature-scaled source mixture ----------------------------

MIX_TEMP_ALPHA = 0.5        # p_i^alpha with alpha = 1/2 -> one exact sqrt
MIX_TEMP_BUDGET = 1_000_000  # token budget the shares allocate


@register(
    "q_mix_temperature",
    f"""WITH c AS (
          SELECT source, CAST(COUNT(1) AS BIGINT) AS n_docs,
                 CAST(SUM(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source
        ),
        w AS (
          SELECT source, n_docs, n_tokens,
                 sqrt(CAST(n_tokens AS DOUBLE)) AS w FROM c
        ),
        tot AS (
          SELECT CAST(SUM(CAST(CAST(w AS VARCHAR) AS DECIMAL(38, 12)))
                      AS DOUBLE) AS tw
          FROM w
        )
        SELECT source, n_docs, n_tokens,
               round(w, 6) AS weight,
               round(w / tw, 6) AS share,
               CAST(FLOOR((w / tw) * {MIX_TEMP_BUDGET}) AS BIGINT) AS alloc_tokens
        FROM w, tot""",
    doc=f"temperature-scaled source mixing (the multilingual/multi-domain "
        f"sampling formula p_i^a / sum p_j^a at a={MIX_TEMP_ALPHA}): "
        "per-source TOKEN totals -> sqrt weights -> normalized shares -> "
        f"floor token allocations from a {MIX_TEMP_BUDGET:,}-token budget — "
        "the upsampling schedule that keeps small sources from vanishing; "
        "sqrt is ONE correctly-rounded IEEE op on an integer-valued double "
        "and the weight total rides the exact-decimal detour, so every "
        "share is engine-exact",
    tags=("prep", "sampling"),
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One combine-enabled count by source, then source-cardinality-sized
    arithmetic: the weight table is as big as the number of sources (tiny
    by definition at any corpus size), broadcast back as a 1-row total.
    The only floats are sqrt (correctly rounded, both engines), the share
    division and the budget multiply — each pinned to one op on identical
    operands; the cross-source SUM is where engines could reorder, so it
    runs in exact decimal (VARCHAR hop = shortest-repr rounding, the
    similarity.py idiom)."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(ws_token_count("text")).cast("bigint").alias("n_tokens"))
    w = c.withColumn("w", F.sqrt(F.col("n_tokens").cast("double")))
    tot = w.agg(
        F.sum(F.col("w").cast("string").cast("decimal(38,12)"))
         .cast("double").alias("tw"))
    return (
        w.crossJoin(F.broadcast(tot))
         .select("source", "n_docs", "n_tokens",
                 F.round("w", 6).alias("weight"),
                 F.round(F.col("w") / F.col("tw"), 6).alias("share"),
                 F.floor((F.col("w") / F.col("tw")) * MIX_TEMP_BUDGET)
                  .cast("bigint").alias("alloc_tokens"))
    )
