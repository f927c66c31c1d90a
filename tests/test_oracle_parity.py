"""Differential oracle tests: every registered query vs its DuckDB oracle —
a local replica of the driver's t2 gate (SURVEY §5)."""

from __future__ import annotations

import pytest

from flink_job_spark.queries import all_queries
from tests.compare import assert_frames_match

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle)
NO_ORACLE = sorted(n for n, s in QUERIES.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    ddf = duck.execute(spec.oracle).df()
    assert_frames_match(sdf, ddf, name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    assert sdf.count() >= 0
