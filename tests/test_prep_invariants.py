"""Structural invariants of the training-data-prep operators — properties
that must hold regardless of corpus content (conservation laws the oracle
comparison can't express by itself)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_job_spark.queries import all_queries
from flink_job_spark.queries.prep import MIX_BUDGET_FRAC, PACK_BUDGET, WSAMPLE_K
from flink_job_spark.sources.tables import load_table


def test_sequence_pack_conserves_docs_and_tokens(spark, sf_dir):
    """Packing is a partition of the corpus: every doc lands in exactly one
    sequence, token totals are conserved, and no sequence is assigned beyond
    the final token offset."""
    d = load_table(spark, sf_dir, "documents")
    packed = all_queries()["q_sequence_pack"].fn(spark, sf_dir)
    agg = packed.agg(F.sum("n_docs").alias("docs"), F.sum("seq_tokens").alias("tok")
                     ).collect()[0]
    assert agg["docs"] == d.count()
    total_tok = d.select(
        F.sum(F.regexp_count("text", F.lit(r"\S+")))).collect()[0][0]
    assert agg["tok"] == total_tok
    # sequences within a source are dense from 0 (offset packing leaves no holes)
    bad = packed.groupBy("source").agg(
        F.min("seq_id").alias("mn"), F.max("seq_id").alias("mx"),
        F.count(F.lit(1)).alias("n")).filter(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0


def test_mixture_resample_respects_budget_and_bounds(spark, sf_dir):
    """Kept counts never exceed the stratum size, and the overall kept total
    is within sampling noise of the configured budget fraction."""
    r = all_queries()["q_mixture_resample"].fn(spark, sf_dir).collect()
    assert all(row["n_kept"] <= row["n_docs"] for row in r)
    total = sum(row["n_docs"] for row in r)
    kept = sum(row["n_kept"] for row in r)
    assert 0.5 * MIX_BUDGET_FRAC * total < kept < 1.5 * MIX_BUDGET_FRAC * total


def test_weighted_sample_is_exactly_k_and_deterministic(spark, sf_dir):
    q = all_queries()["q_weighted_sample"]
    a = [r["doc_id"] for r in q.fn(spark, sf_dir).collect()]
    b = [r["doc_id"] for r in q.fn(spark, sf_dir).collect()]
    assert len(a) == WSAMPLE_K
    assert a == b  # md5-keyed: identical across reruns


def test_train_shuffle_is_a_permutation(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    r = all_queries()["q_train_shuffle"].fn(spark, sf_dir)
    n = d.count()
    assert r.count() == n
    assert r.select("pos").distinct().count() == n       # bijective positions
    assert r.agg(F.max("pos")).collect()[0][0] == n - 1  # dense 0..n-1


def test_block_dedup_bounds(spark, sf_dir):
    """No doc can have more duplicate blocks than blocks, and the lowest
    doc_id can never have a duplicate block (min-id ownership)."""
    r = all_queries()["q_block_dedup"].fn(spark, sf_dir)
    assert r.filter(F.col("n_dup_blocks") > F.col("n_blocks")).count() == 0
    first = r.orderBy("doc_id").limit(1).collect()[0]
    assert first["n_dup_blocks"] == 0


def test_pack_budget_sanity():
    assert PACK_BUDGET > 0


def test_k_anonymity_invariants(spark, sf_dir):
    """Every published equivalence class holds >= k rows; the suppressed
    bucket absorbs exactly the rest (mass conservation)."""
    from flink_job_spark.queries import all_queries
    from flink_job_spark.queries.prep import KANON_K

    rows = all_queries()["q_k_anonymity"].fn(spark, sf_dir).collect()
    total = sum(r["n_rows"] for r in rows)
    n_customers = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert total == n_customers
    for r in rows:
        if r["nation_qi"] != "*":
            assert r["n_cells"] == 1
            assert r["n_rows"] >= KANON_K, r
        else:
            assert r["segment_qi"] == "*" and r["band_qi"] == "*"
    assert sum(1 for r in rows if r["nation_qi"] == "*") <= 1
