"""IVF ANN quality gate: recall@10 of the k-means-trained coarse quantizer
vs the exact brute-force baseline (VERDICT r1 #7)."""

from __future__ import annotations

from flink_job_spark.queries import all_queries


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def test_ivf_kmeans_recall_at_10(spark, sf_dir):
    qs = all_queries()
    truth = _topk_sets(qs["q_ann_cosine_topk"].fn(spark, sf_dir))
    got = _topk_sets(qs["q_ann_ivf_kmeans"].fn(spark, sf_dir))
    spark.catalog.clearCache()
    assert set(got) == set(truth)  # same query set answered
    recalls = [len(got[q] & truth[q]) / len(truth[q]) for q in truth]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.9, f"recall@10 = {recall:.3f} ({recalls})"


def test_kmeans_centroids_deterministic(spark, sf_dir):
    """Two runs produce bit-identical centroids (seeded init + exact-decimal
    means: no FP order dependence anywhere)."""
    from flink_job_spark.queries.similarity import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
        _vecs,
        kmeans_lite_centroids,
    )

    e = _vecs(spark, sf_dir).persist()
    a = kmeans_lite_centroids(spark, e, IVF_CENTROIDS, KMEANS_ITERS)
    b = kmeans_lite_centroids(spark, e, IVF_CENTROIDS, KMEANS_ITERS)
    spark.catalog.clearCache()
    assert a == b  # exact float equality, including norms
