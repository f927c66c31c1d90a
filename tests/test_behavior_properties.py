"""Property-based fuzz of the wave-6/7 sequential operators: for ANY small
random input, the distributed implementation must agree with a brute-force
python reference — covering the edges fixtures never do (budget-boundary
docs, over-budget docs, tied scores, all-positive/all-negative labels,
coincident interval endpoints, midnight clipping)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from flink_job_spark.queries.mleval import (
    CONCUR_MINUTES,
    auc_rank_statistic,
    sweep_max_concurrent,
)
from flink_job_spark.queries.prep import BINPACK_BUDGET, pack_next_fit

# --- next-fit packing ----------------------------------------------------------

PACK_IN = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("t", T.LongType()),
])

pack_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.integers(0, BINPACK_BUDGET * 2)),
    min_size=1, max_size=16)


def brute_pack(rows):
    out = {}
    by_src = {}
    for doc_id, (src, t) in enumerate(rows):
        by_src.setdefault(src, []).append((doc_id, t))
    for src, docs in by_src.items():
        b, fill = 1, 0
        first = True
        for doc_id, t in sorted(docs):
            if first:
                b, fill, first = 1, t, False
            elif fill + t > BINPACK_BUDGET:
                b, fill = b + 1, t
            else:
                fill += t
            out[(src, doc_id)] = (t, b, fill)
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=pack_rows)
def test_pack_next_fit_matches_brute_force(spark, rows):
    df = spark.createDataFrame(
        [(src, i, t) for i, (src, t) in enumerate(rows)], PACK_IN)
    got = {(r["source"], r["doc_id"]): (r["n_tokens"], r["bin_idx"],
                                        r["bin_fill"])
           for r in pack_next_fit(df).collect()}
    assert got == brute_pack(rows)


# --- exact AUC -------------------------------------------------------------------

SCORE_IN = T.StructType([
    T.StructField("value", T.DoubleType()),
    T.StructField("pos", T.IntegerType()),
])

score_rows = st.lists(
    st.tuples(st.sampled_from([0.0, 0.5, 1.0, 1.5, 2.0, 3.25]),
              st.integers(0, 1)),
    min_size=2, max_size=24)


def brute_auc(rows):
    pos = [v for v, p in rows if p == 1]
    neg = [v for v, p in rows if p == 0]
    if not pos or not neg:
        return None
    num2 = sum(2 if p > n else (1 if p == n else 0)
               for p in pos for n in neg)
    # same final IEEE division as the operator: exact ints then one divide
    return (len(pos), len(neg), num2 / (2 * len(pos) * len(neg)))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=score_rows)
def test_auc_matches_brute_force_pair_counting(spark, rows):
    expected = brute_auc(rows)
    df = spark.createDataFrame(rows, SCORE_IN)
    r = auc_rank_statistic(df).collect()[0]
    if expected is None:
        assert r["auc"] is None  # 0/0 pairs -> NULL, never a crash
        return
    assert (r["n_pos"], r["n_neg"]) == expected[:2]
    assert r["auc"] == expected[2]  # bit-identical: same ints, same division


# --- sweep-line max concurrency --------------------------------------------------

DAY0 = datetime.datetime(2024, 1, 1)
GAP_US = CONCUR_MINUTES * 60 * 1_000_000

EVT_IN = T.StructType([T.StructField("ts", T.TimestampNTZType())])

# offsets in seconds within ~2 days, incl. clustering near midnight
ts_offsets = st.lists(
    st.integers(0, 2 * 86_400 - 1), min_size=1, max_size=24)


def brute_max_concurrent(offsets):
    per_day = {}
    for off in offsets:
        ts = DAY0 + datetime.timedelta(seconds=off)
        day = datetime.datetime(ts.year, ts.month, ts.day)
        end = min(ts + datetime.timedelta(minutes=CONCUR_MINUTES),
                  day + datetime.timedelta(days=1))
        per_day.setdefault(day, []).append((ts, end))
    out = {}
    for day, ivs in per_day.items():
        pts = sorted({t for iv in ivs for t in iv})
        best = 0
        for t in pts:
            # end-exclusive: active at t iff s <= t < e
            best = max(best, sum(1 for s, e in ivs if s <= t < e))
        out[day] = (best, len(ivs))
    return out


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(offsets=ts_offsets)
def test_sweep_max_concurrent_matches_brute_force(spark, offsets):
    rows = [(DAY0 + datetime.timedelta(seconds=o),) for o in offsets]
    df = spark.createDataFrame(rows, EVT_IN)
    got = {r["day"].replace(tzinfo=None): (r["max_concurrent"],
                                           r["n_events"])
           for r in sweep_max_concurrent(df).collect()}
    assert got == brute_max_concurrent(offsets)
