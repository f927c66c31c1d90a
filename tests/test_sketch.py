"""Sketch operators: the inline exact twins bound the estimation error."""

from __future__ import annotations

from flink_job_spark.queries import all_queries


def test_approx_distinct_error_bound(spark, sf_dir):
    rows = all_queries()["q_approx_distinct"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["exact_distinct"] > 0
        # HLL++ at rsd=0.02: allow 3 sigma
        assert r["rel_err"] <= 0.06, r


def test_approx_quantiles_error_bound(spark, sf_dir):
    r = all_queries()["q_approx_quantiles"].fn(spark, sf_dir).first()
    spread = r["exact_p99"] - r["exact_p50"]
    for p in ("p50", "p95", "p99"):
        assert r[f"err_{p}"] <= max(0.05 * spread, 1e-9), r


def test_sketch_rollup_union_error_bound(spark, sf_dir):
    """Weekly estimates from unioned day sketches stay within 5% of exact
    (lgK=14 → ~1% rsd; 5% is a generous determinism-safe bound)."""
    from flink_job_spark.queries import all_queries

    rows = all_queries()["q_sketch_rollup"].fn(spark, sf_dir).collect()
    assert rows, "no weeks produced"
    for r in rows:
        assert r["n_day_sketches"] >= 1
        assert r["rel_err"] < 0.05, (r["week"], r["rel_err"])
