"""Structural invariants of the ML/analytics batch added in round 2:
class weights, vector dimension stats, k-NN classification, boilerplate
coverage, 2-D skyline, and PageRank — conservation laws and dominance
properties the cell-by-cell oracle comparison can't express."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_job_spark.queries import all_queries
from flink_job_spark.queries.similarity import KNN_K, N_QUERY_VECS
from flink_job_spark.sources.tables import load_table


def test_class_weights_rebalance_to_corpus_size(spark, sf_dir):
    """weight = N/(k*n) makes every class contribute N/k reweighted rows, so
    sum(n * weight) returns the corpus size (up to the output rounding)."""
    rows = all_queries()["q_class_weights"].fn(spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    reweighted = sum(r["n"] * r["weight"] for r in rows)
    assert abs(reweighted - total) < 1e-2 * total
    assert all(r["weight"] > 0 for r in rows)


def test_vector_dim_stats_bounds(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    n_vecs = e.count()
    rows = all_queries()["q_vector_dim_stats"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["n"] == n_vecs
        assert r["variance"] >= 0
        assert r["vmin"] <= r["mean"] <= r["vmax"]


def test_knn_classify_votes_are_bounded_and_deterministic(spark, sf_dir):
    q = all_queries()["q_knn_classify"]
    a = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    b = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert a == b
    assert len(a) == N_QUERY_VECS
    for _, _, _, n_votes in a:
        assert 1 <= n_votes <= KNN_K


def test_boilerplate_coverage_is_a_ratio(spark, sf_dir):
    rows = all_queries()["q_boilerplate_coverage"].fn(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert len(rows) == d.count()
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_blocks"]
        assert abs(r["coverage"] - r["n_boiler"] / r["n_blocks"]) < 1e-6


def test_skyline_is_exactly_the_non_dominated_set(spark, sf_dir):
    """Quadratic ground truth on the collected point set: every kept point
    is non-dominated, every dropped point is dominated by some kept point
    (minimize price, maximize qty)."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = {(r["price"], r["qty"])
           for r in li.select(F.col("l_extendedprice").alias("price"),
                              F.col("l_quantity").alias("qty"))
                      .distinct().collect()}
    sky = {(r["price"], r["qty"])
           for r in all_queries()["q_skyline_2d"].fn(spark, sf_dir).collect()}

    def dominated(p, by):
        return (by[0] <= p[0] and by[1] >= p[1]) and by != p

    assert sky <= pts
    for p in sky:
        assert not any(dominated(p, q) for q in pts)
    for p in pts - sky:
        assert any(dominated(p, q) for q in sky)


def test_pagerank_conserves_mass(spark, sf_dir):
    """Undirected graph -> no dangling nodes -> total rank stays 1 (up to
    the per-iteration rounding); every rank stays positive."""
    rows = all_queries()["q_pagerank"].fn(spark, sf_dir).collect()
    total = sum(r["rank"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-3)
    assert all(r["rank"] > 0 for r in rows)
    assert len(rows) == len({r["node"] for r in rows})
