"""Similarity search over the `embeddings` table (array<float> vectors).

- q_ann_cosine_topk:      brute-force cosine top-k (the exactness baseline);
                          broadcast the tiny query set, rank with a window —
                          at scale this is a map-side broadcast join + per-query
                          top-k (no shuffle of the big side beyond the ranking).
- q_embedding_cosine_dup: exact all-pairs near-dup above a cosine threshold
                          (quadratic — correctness baseline only).
- q_embedding_cosine_lsh: the scale path: banded sign-LSH (random-hyperplane
                          family, axis-aligned instantiation for engine
                          portability) → equi-join on band buckets → cosine
                          verify on candidates only. Candidate volume scales
                          with bucket collision rates, not n².

Scores are rounded to 6 decimals in BOTH engines; the underlying doubles are
bit-identical (see functions/vectors.py), so rounding is too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.functions.vectors import (
    as_double_array,
    cosine,
    cosine_duck,
    sign_bucket,
    sign_bucket_duck,
)
from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

TOPK = 10
N_QUERY_VECS = 5
COSINE_DUP_THRESHOLD = 0.4
LSH_BAND_DIMS = 4   # dims per sign band
LSH_BANDS = 4       # bands → dims 1..16 used


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", as_double_array("embedding").alias("v"))


# --- q_ann_cosine_topk ------------------------------------------------------------

@register(
    "q_ann_cosine_topk",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
  q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}),
  scored AS (
    SELECT q.qid, e.vec_id, round({cosine_duck('q.qv', 'e.v')}, 6) AS score
    FROM q CROSS JOIN e WHERE e.vec_id <> q.qid
  )
  SELECT qid, vec_id, score, CAST(rank AS BIGINT) AS rank FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
    FROM scored
  ) WHERE rank <= {TOPK}""",
    doc=f"brute-force cosine top-{TOPK} for {N_QUERY_VECS} query vectors "
        "(broadcast queries, rank per query)",
    tags=("similarity", "ann"),
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vecs(spark, sf_dir)
    q = (e.filter(F.col("vec_id") < N_QUERY_VECS)
          .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv")))
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(cosine("qv", "v"), 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
                  .filter(F.col("rank") <= TOPK))


# --- q_embedding_cosine_dup (exact baseline) ---------------------------------------

@register(
    "q_embedding_cosine_dup",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
  SELECT a.vec_id AS v1, b.vec_id AS v2, round({cosine_duck('a.v', 'b.v')}, 6) AS score
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round({cosine_duck('a.v', 'b.v')}, 6) >= {COSINE_DUP_THRESHOLD}""",
    doc=f"exact embedding near-dup: all-pairs cosine ≥ {COSINE_DUP_THRESHOLD} "
        "(quadratic correctness baseline)",
    tags=("similarity", "dedup"),
)
def q_embedding_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vecs(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("v1"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("v2"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("v1") < F.col("v2"))
        .select("v1", "v2", F.round(cosine("va", "vb"), 6).alias("score"))
        .filter(F.col("score") >= COSINE_DUP_THRESHOLD)
    )


# --- q_embedding_cosine_lsh (the scale path) ------------------------------------------

_DUCK_BANDS = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band, {sign_bucket_duck('v', LSH_BAND_DIMS, b * LSH_BAND_DIMS)} AS bh FROM e"
    for b in range(LSH_BANDS)
)

@register(
    "q_embedding_cosine_lsh",
    f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
  bandrows AS ({_DUCK_BANDS}),
  cand AS (
    SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
    FROM bandrows a JOIN bandrows b
      ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id
  )
  SELECT c.v1, c.v2, round({cosine_duck('ea.v', 'eb.v')}, 6) AS score
  FROM cand c JOIN e ea ON ea.vec_id = c.v1 JOIN e eb ON eb.vec_id = c.v2
  WHERE round({cosine_duck('ea.v', 'eb.v')}, 6) >= {COSINE_DUP_THRESHOLD}""",
    doc=f"sign-LSH banded near-dup: {LSH_BANDS} bands × {LSH_BAND_DIMS} sign dims "
        f"→ bucket equi-join → cosine verify ≥ {COSINE_DUP_THRESHOLD}",
    tags=("similarity", "lsh"),
)
def q_embedding_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vecs(spark, sf_dir)
    bandrows = e.select(
        "vec_id",
        F.posexplode(
            F.array(*[sign_bucket("v", LSH_BAND_DIMS, b * LSH_BAND_DIMS)
                      for b in range(LSH_BANDS)])
        ).alias("band", "bh"),
    )
    cand = (
        bandrows.alias("a")
        .join(bandrows.alias("b"),
              (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh"))
              & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("v1"), F.col("b.vec_id").alias("v2"))
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("v1"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("v2"), F.col("v").alias("vb"))
    return (
        cand.join(ea, "v1").join(eb, "v2")
        .select("v1", "v2", F.round(cosine("va", "vb"), 6).alias("score"))
        .filter(F.col("score") >= COSINE_DUP_THRESHOLD)
    )
