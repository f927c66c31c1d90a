"""Property-based fuzz of the wave-16/17/18 scale operators: for ANY small
random input the distributed implementation must agree with a brute-force
python reference — BFS frontier expansion vs naive level search, the
bloom-pruned join vs the plain join (exactness regardless of false
positives), the KS integer cross-product vs a direct CDF walk, and the
day-bitmap popcount vs a plain distinct set."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_job_spark.queries.analytics import bfs_levels
from flink_job_spark.queries.mleval import ks_stat
from flink_job_spark.queries.relational import bloom_pruned_join

# --- BFS ------------------------------------------------------------------------

EDGE = T.StructType([T.StructField("a", T.LongType()),
                     T.StructField("b", T.LongType())])
NODE = T.StructType([T.StructField("node", T.LongType())])

edges_st = st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                    min_size=0, max_size=20)
seeds_st = st.sets(st.integers(0, 9), min_size=1, max_size=3)


def brute_bfs(edges, seeds, max_hops):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lvl = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = {n for f in frontier for n in adj[f]} - lvl.keys()
        for n in nxt:
            lvl[n] = h
        frontier = nxt
    return lvl


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edges_st, seeds=seeds_st)
def test_bfs_levels_match_brute_force(spark, edges, seeds):
    ed = spark.createDataFrame(edges, EDGE) if edges else \
        spark.createDataFrame([], EDGE)
    sd = spark.createDataFrame([(s,) for s in sorted(seeds)], NODE)
    got = {r["node"]: r["lvl"] for r in bfs_levels(ed, sd, 3).collect()}
    assert got == brute_bfs(edges, seeds, 3)


# --- bloom-pruned join ----------------------------------------------------------

BIG = T.StructType([T.StructField("k", T.LongType()),
                    T.StructField("payload", T.LongType())])
SEL = T.StructType([T.StructField("sk", T.LongType())])

big_st = st.lists(st.tuples(st.integers(0, 30), st.integers(0, 100)),
                  min_size=0, max_size=24)
sel_st = st.sets(st.integers(0, 30), min_size=0, max_size=8)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(big=big_st, sel=sel_st)
def test_bloom_pruned_join_is_exact(spark, big, sel):
    """False positives must be invisible: the pruned join equals the plain
    inner join for every input, including empty sides."""
    b = spark.createDataFrame(big, BIG) if big else \
        spark.createDataFrame([], BIG)
    s = spark.createDataFrame([(k,) for k in sorted(sel)], SEL) if sel else \
        spark.createDataFrame([], SEL)
    got = sorted((r["k"], r["payload"])
                 for r in bloom_pruned_join(b, s, "k", "sk").collect())
    want = sorted((k, p) for k, p in big if k in sel)
    assert got == want


def test_bloom_pruned_join_survives_colliding_names(spark):
    """Internal columns are namespaced: a probe side that already carries
    p0/w0/mask-style names, and big_key == sel_key, must both work."""
    b = spark.createDataFrame([(1, 7), (2, 8), (3, 9)],
                              "k long, p0 long")
    s = spark.createDataFrame([(1,), (3,)], "k long")
    got = sorted((r["k"], r["p0"])
                 for r in bloom_pruned_join(b, s, "k", "k").collect())
    assert got == [(1, 7), (3, 9)]


# --- KS statistic ---------------------------------------------------------------

TAGGED = T.StructType([T.StructField("value", T.DoubleType()),
                       T.StructField("is_a", T.IntegerType())])

ks_rows = st.lists(
    st.tuples(st.sampled_from([0.0, 0.25, 0.5, 1.0, 2.0, 3.5]),
              st.integers(0, 1)),
    min_size=2, max_size=24).filter(
        lambda rows: any(p for _, p in rows) and any(1 - p for _, p in rows))


def brute_ks(rows):
    a = sorted(v for v, p in rows if p == 1)
    b = sorted(v for v, p in rows if p == 0)
    grid = sorted({v for v, _ in rows})
    n1, n2 = len(a), len(b)
    d_num = max(abs(sum(x <= g for x in a) * n2 - sum(x <= g for x in b) * n1)
                for g in grid)
    return n1, n2, d_num, d_num / (n1 * n2)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ks_rows)
def test_ks_stat_matches_cdf_walk(spark, rows):
    df = spark.createDataFrame(rows, TAGGED)
    r = ks_stat(df).collect()[0]
    n1, n2, d_num, d = brute_ks(rows)
    assert (r["n1"], r["n2"], r["d_num"]) == (n1, n2, d_num)
    assert r["d_stat"] == d  # same exact ints, one identical division


# --- day bitmap -----------------------------------------------------------------

days_st = st.lists(st.integers(1, 31), min_size=1, max_size=20)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(days=days_st)
def test_day_bitmap_popcount_equals_distinct(spark, days):
    df = spark.createDataFrame([(d,) for d in days], "day int")
    r = (df.select(F.expr("shiftleft(CAST(1 AS BIGINT), day - 1)")
                    .alias("bit"))
           .agg(F.bit_count(F.bit_or("bit")).alias("n")).collect()[0])
    assert r["n"] == len(set(days))


# --- count windows --------------------------------------------------------------

import datetime as _dt

CW = T.StructType([T.StructField("user_id", T.LongType()),
                   T.StructField("ts", T.TimestampNTZType()),
                   T.StructField("event_id", T.LongType()),
                   T.StructField("cents", T.LongType())])

cw_rows = st.lists(
    st.tuples(st.integers(0, 2),      # user
              st.integers(0, 20),     # ts offset (ties allowed)
              st.integers(0, 500)),   # cents
    min_size=1, max_size=24)


def brute_count_windows(rows, n):
    out = {}
    by_user = {}
    for eid, (u, toff, c) in enumerate(rows):
        by_user.setdefault(u, []).append((toff, eid, c))
    for u, evs in by_user.items():
        for i, (toff, eid, c) in enumerate(sorted(evs)):
            w = i // n
            k = (u, w)
            ts = _dt.datetime(2024, 1, 1) + _dt.timedelta(minutes=toff)
            if k not in out:
                out[k] = [0, ts, ts, 0]
            agg = out[k]
            agg[0] += 1
            agg[1] = min(agg[1], ts)
            agg[2] = max(agg[2], ts)
            agg[3] += c
    return {k: tuple(v) for k, v in out.items()}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=cw_rows)
def test_count_windows_match_brute_force(spark, rows):
    from flink_job_spark.queries.windows import count_windows
    data = [(u, _dt.datetime(2024, 1, 1) + _dt.timedelta(minutes=toff),
             eid, c) for eid, (u, toff, c) in enumerate(rows)]
    df = spark.createDataFrame(data, CW)
    got = {(r["user_id"], r["win_idx"]):
           (r["n_events"], r["win_start"], r["win_end"], r["value_cents"])
           for r in count_windows(df, 3).collect()}
    assert got == brute_count_windows(rows, 3)


# --- nearest as-of ---------------------------------------------------------------

NL = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("ts", T.TimestampNTZType()),
                   T.StructField("lid", T.LongType())])
NR = T.StructType([T.StructField("k", T.LongType()),
                   T.StructField("ts", T.TimestampNTZType()),
                   T.StructField("val", T.LongType())])

near_left = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
                     min_size=1, max_size=12)
near_right = st.sets(st.tuples(st.integers(0, 2), st.integers(0, 20)),
                     min_size=0, max_size=12)


def _t(m):
    return _dt.datetime(2024, 1, 1) + _dt.timedelta(minutes=m)


def brute_nearest(left, right):
    out = {}
    for lid, (k, lt) in enumerate(left):
        cands = [(abs(lt - rt), rt) for (rk, rt) in right if rk == k]
        if not cands:
            out[lid] = (None, None)
        else:
            _, rt = min(cands)          # ties -> smaller rt (earlier)
            out[lid] = (_t(rt), rt * 10)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=near_left, right=near_right)
def test_asof_nearest_matches_brute_argmin(spark, left, right):
    from flink_job_spark.operators.asof import asof_nearest_join
    ldf = spark.createDataFrame(
        [(k, _t(m), lid) for lid, (k, m) in enumerate(left)], NL)
    rdf = spark.createDataFrame(
        [(k, _t(m), m * 10) for (k, m) in sorted(right)], NR) if right else \
        spark.createDataFrame([], NR)
    got = {r["lid"]: (r["near_ts"], r["near_val"])
           for r in asof_nearest_join(ldf, rdf, key="k",
                                      right_payload=["val"]).collect()}
    assert got == brute_nearest(left, right)


def test_asof_nearest_is_dst_safe(spark):
    """Regression: the micros used for ordering/gaps must be tz-free.
    Under a fall-back-DST session timezone an NTZ->LTZ routing makes the
    01:00-02:00 hour ambiguous and picks the farther match."""
    from flink_job_spark.operators.asof import asof_nearest_join
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        left = spark.createDataFrame(
            [(1, _dt.datetime(2024, 11, 3, 1, 30), 0)], NL)
        right = spark.createDataFrame(
            [(1, _dt.datetime(2024, 11, 3, 1, 0), 10),
             (1, _dt.datetime(2024, 11, 3, 1, 45), 20)], NR)
        r = asof_nearest_join(left, right, key="k",
                              right_payload=["val"]).collect()
        assert r[0]["near_val"] == 20  # 15 min beats 30 min
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
