"""Sketch operators: the bounded-value certificates (r7) must hold —
each key's boolean is also pinned TRUE by its DuckDB oracle."""

from __future__ import annotations

from flink_job_spark.queries import all_queries


def test_approx_distinct_error_bound(spark, sf_dir):
    rows = all_queries()["q_approx_distinct"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["exact_distinct"] > 0
        # HLL++ at rsd=0.02: the certificate allows 3 sigma
        assert r["within_3rsd"], r


def test_approx_quantiles_error_bound(spark, sf_dir):
    r = all_queries()["q_approx_quantiles"].fn(spark, sf_dir).first()
    assert r["n"] > 0
    for p in ("p50", "p95", "p99"):
        assert r[f"{p}_in_bounds"], r


def test_sketch_rollup_union_error_bound(spark, sf_dir):
    """Weekly estimates from unioned day sketches stay within 5% of exact
    (lgK=14 → ~1% rsd; 5% is a generous determinism-safe bound)."""
    from flink_job_spark.queries import all_queries

    rows = all_queries()["q_sketch_rollup"].fn(spark, sf_dir).collect()
    assert rows, "no weeks produced"
    for r in rows:
        assert r["n_day_sketches"] >= 1
        assert r["within_3pct"], r
