"""Text-analysis queries over the `documents` table (LLM-pipeline extensions,
beyond the reference surface; BASELINE.json north star).

All pure Column expressions — language ID, quality scoring, token counting,
fingerprinting run JVM-side with whole-stage codegen; at 100 TB these are
embarrassingly parallel map-only plans (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_job_spark.functions.text import (
    bpe_token_count,
    bpe_token_count_duck,
    fingerprint_columns,
    fingerprint_columns_duck,
    lang_hit_columns,
    lang_hit_columns_duck,
    norm_text,
    pred_lang,
    pred_lang_duck,
    quality_columns,
    quality_columns_duck,
    ws_token_count,
    ws_token_count_duck,
)
from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

# --- q_token_count ------------------------------------------------------------

@register(
    "q_token_count",
    f"""SELECT doc_id,
               {ws_token_count_duck('text')} AS ws_tokens,
               {bpe_token_count_duck('text')} AS bpe_tokens
        FROM documents""",
    doc="token counting: whitespace + BPE-ish pre-tokenizer regex (map-only)",
    tags=("text",),
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_token_count("text").alias("ws_tokens"),
        bpe_token_count("text").alias("bpe_tokens"),
    )


# --- q_text_quality -------------------------------------------------------------

_QD = quality_columns_duck("text")

@register(
    "q_text_quality",
    "SELECT doc_id, "
    + ", ".join(f"{sql} AS {name}" for name, sql in _QD.items())
    + " FROM documents",
    doc="quality scoring: length/alpha/punct/stopword ratios + fixed-weight score",
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cols = quality_columns("text")
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


# --- q_lang_id -------------------------------------------------------------------

_LD = lang_hit_columns_duck("text")

@register(
    "q_lang_id",
    "SELECT doc_id, "
    + ", ".join(f"{sql} AS {name}" for name, sql in _LD.items())
    + f", {pred_lang_duck(_LD)} AS pred_lang FROM documents",
    doc="language ID via stopword/CJK marker hit counts, deterministic argmax",
    tags=("text",),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    hits = lang_hit_columns("text")
    return d.select(
        "doc_id",
        *[c.alias(n) for n, c in hits.items()],
        pred_lang(hits).alias("pred_lang"),
    )


# --- q_doc_fingerprint -------------------------------------------------------------

_FD = fingerprint_columns_duck("text")

@register(
    "q_doc_fingerprint",
    "SELECT doc_id, "
    + ", ".join(f"{sql} AS {name}" for name, sql in _FD.items())
    + " FROM documents",
    doc="document fingerprinting: normalized-text MD5 + min rolling char-8-gram hash",
    tags=("text",),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # normalize ONCE into an attribute; the shingle lambda then references it
    # instead of re-running the regex per character position
    normed = d.select("doc_id", norm_text("text").alias("__norm"))
    cols = fingerprint_columns("__norm")
    return normed.select("doc_id", *[c.alias(n) for n, c in cols.items()])
