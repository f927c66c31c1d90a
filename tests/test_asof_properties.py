"""Property-based fuzz of the union-merge as-of operator: for ANY small
left/right tables, asof_join must agree with a brute-force python reference —
including the edge cases fixtures never cover (equal timestamps, keys with no
right rows, duplicate left timestamps, empty sides)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from flink_job_spark.operators.asof import asof_join

LEFT_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("lid", T.LongType()),
])
RIGHT_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("payload", T.LongType()),
])

rows_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=0, max_size=12)
rows_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20), st.integers(-5, 5)),
    min_size=0, max_size=12)


def brute_force(left, right):
    out = set()
    for i, (k, ts) in enumerate(left):
        prior = [(rts, p) for (rk, rts, p) in right if rk == k and rts <= ts]
        if prior:
            best = max(prior)  # latest ts; unique per (k, ts) by construction
            out.add((k, ts, i, best[0], best[1]))
        else:
            out.add((k, ts, i, None, None))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=rows_left, right=rows_right)
def test_asof_join_matches_brute_force(spark, left, right):
    # right side unique per (key, ts): keep the max payload like the queries do
    uniq = {}
    for k, ts, p in right:
        uniq[(k, ts)] = max(p, uniq.get((k, ts), p))
    right_rows = [(k, ts, p) for (k, ts), p in uniq.items()]
    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], LEFT_SCHEMA)
    rdf = spark.createDataFrame(right_rows, RIGHT_SCHEMA)

    got = {
        (r["k"], r["ts"], r["lid"], r["a_ts"], r["a_payload"])
        for r in asof_join(ldf, rdf, key="k",
                           right_payload=["payload"], prefix="a_").collect()
    }
    assert got == brute_force(left, right_rows)
