"""Property-based fuzz of the bucketized range join: for ANY point/interval
sets, range_join must return exactly the brute-force containment pairs —
bucket-boundary points, zero-length intervals, intervals spanning many
buckets, and both end-inclusivity modes included."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from flink_job_spark.operators.rangejoin import range_join

BASE = dt.datetime(2024, 1, 1)

POINT_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("pts", T.TimestampType()),
    T.StructField("pid", T.LongType()),
])
IV_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("start", T.TimestampType()),
    T.StructField("end", T.TimestampType()),
    T.StructField("iid", T.LongType()),
])

# offsets in seconds; bucket width below is 60s so these cross many buckets
points_st = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 600)), max_size=10)
ivs_st = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 600), st.integers(0, 300)),
    max_size=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(points=points_st, ivs=ivs_st, closed=st.booleans())
def test_range_join_matches_brute_force(spark, points, ivs, closed):
    prows = [(k, BASE + dt.timedelta(seconds=s), i)
             for i, (k, s) in enumerate(points)]
    irows = [(k, BASE + dt.timedelta(seconds=s),
              BASE + dt.timedelta(seconds=s + d), i)
             for i, (k, s, d) in enumerate(ivs)]
    pdf = spark.createDataFrame(prows, POINT_SCHEMA)
    idf = spark.createDataFrame(irows, IV_SCHEMA)

    got = {(r["pid"], r["iid"])
           for r in range_join(pdf, idf, key="k", point_ts="pts",
                               start_col="start", end_col="end",
                               bucket_seconds=60, closed_end=closed).collect()}
    want = {
        (pid, iid)
        for (pk, pts, pid) in prows
        for (ik, s, e, iid) in irows
        if pk == ik and s <= pts and (pts <= e if closed else pts < e)
    }
    assert got == want
