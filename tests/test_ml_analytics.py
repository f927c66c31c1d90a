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


def test_inverted_index_postings_match_df(spark, sf_dir):
    rows = all_queries()["q_inverted_index"].fn(spark, sf_dir).collect()
    for r in rows:
        ids = [int(x) for x in r["postings"].split(",")]
        assert len(ids) == r["df"]
        assert ids == sorted(set(ids))


def test_bm25_scores_positive_and_only_matching_docs(spark, sf_dir):
    from flink_job_spark.queries.text import BM25_QUERY
    from flink_job_spark.functions.text import words

    d = load_table(spark, sf_dir, "documents")
    matching = {
        r["doc_id"]
        for r in d.select("doc_id", words("text").alias("w"))
                  .filter(F.arrays_overlap(
                      "w", F.array(*[F.lit(t) for t in BM25_QUERY])))
                  .collect()
    }
    rows = all_queries()["q_bm25_search"].fn(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == matching
    assert all(r["score"] > 0 for r in rows)


def test_rfm_tiles_are_balanced(spark, sf_dir):
    from flink_job_spark.queries.analytics import RFM_TILES

    rows = all_queries()["q_rfm_segments"].fn(spark, sf_dir).collect()
    n = len(rows)
    for dim in ("r", "f", "m"):
        counts = {}
        for r in rows:
            assert 1 <= r[dim] <= RFM_TILES
            counts[r[dim]] = counts.get(r[dim], 0) + 1
        assert max(counts.values()) - min(counts.values()) <= 1
        assert sum(counts.values()) == n


def test_target_encoding_loo_mean_averages_to_group_mean(spark, sf_dir):
    """The average of a group's leave-one-out means equals the group mean
    (each row is excluded exactly once, symmetrically)."""
    rows = all_queries()["q_target_encoding"].fn(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders")
    true_means = {
        r["cat"]: r["mu"]
        for r in o.groupBy(F.col("o_orderpriority").alias("cat"))
                  .agg(F.avg("o_totalprice").alias("mu")).collect()
    }
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r["cat"], []).append(r["loo_mean"])
    for cat, vals in by_cat.items():
        assert all(v is not None for v in vals)
        loo_avg = sum(vals) / len(vals)
        assert abs(loo_avg - true_means[cat]) < 1e-3 * abs(true_means[cat])


def test_quantile_normalize_spans_unit_interval_per_segment(spark, sf_dir):
    rows = all_queries()["q_quantile_normalize"].fn(spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0
        by_seg.setdefault(r["segment"], []).append(r["q"])
    for seg, qs in by_seg.items():
        assert min(qs) == 0.0
        assert max(qs) == 1.0
        assert len(set(qs)) == len(qs)  # custkey tie-break -> unique ranks


def test_asof_forward_picks_earliest_following_purchase(spark, sf_dir):
    """Ground truth by brute force on the collected event set: the matched
    purchase is the minimum purchase ts at or after each click."""
    e = load_table(spark, sf_dir, "events").collect()
    purch = {}
    for r in e:
        if r["event_type"] == "purchase":
            purch.setdefault(r["user_id"], []).append(r["ts"])
    rows = all_queries()["q_asof_forward"].fn(spark, sf_dir).collect()
    assert rows
    n_matched = 0
    for r in rows:
        following = [t for t in purch.get(r["user_id"], [])
                     if t >= r["click_ts"]]
        if r["purchase_ts"] is None:
            assert not following
        else:
            n_matched += 1
            assert r["purchase_ts"] == min(following)
            assert r["gap_us"] >= 0
    assert n_matched > 0


def test_feature_hash_conserves_tokens(spark, sf_dir):
    from flink_job_spark.queries.text import FEATURE_HASH_DIM
    from flink_job_spark.functions.text import words

    d = load_table(spark, sf_dir, "documents")
    true_tokens = {r["doc_id"]: r["n"]
                   for r in d.select("doc_id",
                                     F.size(words("text")).alias("n")).collect()}
    rows = all_queries()["q_feature_hash"].fn(spark, sf_dir).collect()
    per_doc = {}
    for r in rows:
        assert 0 <= r["bucket"] < FEATURE_HASH_DIM
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n"]
    assert per_doc == true_tokens


def test_media_ahash_is_64_balanced_bits(spark, sf_dir):
    rows = all_queries()["q_media_ahash"].fn(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert len(rows) == d.count()
    for r in rows:
        bits = r["ahash_bits"]
        assert len(bits) == 64 and set(bits) <= {"0", "1"}
    # a constant hash would be a broken fingerprint: demand variety
    assert len({r["ahash_bits"] for r in rows}) > 1


def test_dedup_incremental_verdicts_partition_the_batch(spark, sf_dir):
    from flink_job_spark.queries.dedup import INCR_BATCH_MOD, INCR_BATCH_REM

    d = load_table(spark, sf_dir, "documents")
    n_batch = d.filter(
        (F.col("doc_id") % INCR_BATCH_MOD) == INCR_BATCH_REM).count()
    rows = all_queries()["q_dedup_incremental"].fn(spark, sf_dir).collect()
    assert len(rows) == n_batch
    verdicts = {r["verdict"] for r in rows}
    assert verdicts <= {"dup_historical", "dup_in_batch", "unique"}
    # at most one 'unique' survivor per content key
    uniq = [r["content_key"] for r in rows if r["verdict"] == "unique"]
    assert len(uniq) == len(set(uniq))


def test_ema_pandas_lies_between_running_min_and_max(spark, sf_dir):
    """An average of observed values can never escape their range; first
    value seeds the smoother exactly."""
    rows = all_queries()["q_ema_pandas"].fn(spark, sf_dir).collect()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for seq in by_user.values():
        assert seq[0]["ema"] == seq[0]["value"]
        lo = hi = seq[0]["value"]
        for r in seq[1:]:
            lo, hi = min(lo, r["value"]), max(hi, r["value"])
            assert lo <= r["ema"] <= hi


def test_quality_gate_passes_clean_testdata_and_counts_scans(spark, sf_dir):
    """The generated testdata satisfies every expectation; the six rules
    must each report full-table check counts."""
    rows = {r["rule"]: r
            for r in all_queries()["q_quality_gate"].fn(spark, sf_dir).collect()}
    assert len(rows) == 6
    o_n = load_table(spark, sf_dir, "orders").count()
    li_n = load_table(spark, sf_dir, "lineitem").count()
    for rule, r in rows.items():
        assert r["passed"] == 1, f"{rule} failed on clean data"
        assert r["n_violations"] == 0
    assert rows["orderkey_unique"]["n_checked"] == o_n
    assert rows["lineitem_fk_orders"]["n_checked"] == li_n


def test_quality_gate_catches_injected_violations(spark, sf_dir):
    """Corrupt a copy of the tables and the right rules must trip — the
    gate is only useful if violations actually surface."""
    import os
    import tempfile

    from flink_job_spark.sources.tables import load_table as lt

    o = lt(spark, sf_dir, "orders")
    li = lt(spark, sf_dir, "lineitem")
    with tempfile.TemporaryDirectory() as tmp:
        bad_o = o.limit(500).union(
            o.limit(1).select(
                *[F.col(c) if c != "o_totalprice" else (-F.col(c)).alias(c)
                  for c in o.columns]))
        bad_o.write.parquet(os.path.join(tmp, "orders.parquet"))
        li.limit(200).write.parquet(os.path.join(tmp, "lineitem.parquet"))
        for t in ["region", "nation", "customer", "supplier", "part",
                  "events", "documents", "embeddings"]:
            lt(spark, sf_dir, t).limit(1).write.parquet(
                os.path.join(tmp, f"{t}.parquet"))
        rows = {r["rule"]: r
                for r in all_queries()["q_quality_gate"].fn(spark, tmp).collect()}
        assert rows["totalprice_positive"]["n_violations"] == 1
        assert rows["totalprice_positive"]["passed"] == 0
        # the duplicated first order row also trips uniqueness
        assert rows["orderkey_unique"]["n_violations"] >= 1


def test_linreg_moments_solve_matches_direct_lstsq(spark, sf_dir):
    """Drive the moments through the driver-side normal-equation solve: the
    Gram matrix must be positive definite and the solved coefficients must
    agree with numpy's direct least-squares on the raw collected data —
    i.e. the distributed sufficient statistics lose nothing."""
    import numpy as np

    m = {r["term"]: r["value"]
         for r in all_queries()["q_linreg_moments"].fn(spark, sf_dir).collect()}
    n = m["n"]
    G = np.array([
        [m["s_x1x1"], m["s_x1x2"], m["s_x1"]],
        [m["s_x1x2"], m["s_x2x2"], m["s_x2"]],
        [m["s_x1"],  m["s_x2"],  n],
    ])
    b = np.array([m["s_x1y"], m["s_x2y"], m["s_y"]])
    assert np.all(np.linalg.eigvalsh(G) > 0)  # PD: solvable, no collinearity
    w = np.linalg.solve(G, b)

    li = load_table(spark, sf_dir, "lineitem")
    raw = np.array(li.select("l_quantity", "l_discount",
                             "l_extendedprice").collect())
    X = np.column_stack([raw[:, 0], raw[:, 1], np.ones(len(raw))])
    w_direct = np.linalg.lstsq(X, raw[:, 2], rcond=None)[0]
    assert np.allclose(w, w_direct, rtol=1e-5), (w, w_direct)
    assert n == len(raw)


def test_decay_score_bounded_by_undecayed_sum(spark, sf_dir):
    """Halving weights are in (0,1]: each user's decayed score magnitude
    can never exceed the plain sum of |value|."""
    bounds = {r["user_id"]: r["b"]
              for r in load_table(spark, sf_dir, "events")
                       .groupBy("user_id")
                       .agg(F.sum(F.abs("value")).alias("b")).collect()}
    rows = all_queries()["q_decay_score"].fn(spark, sf_dir).collect()
    assert len(rows) == len(bounds)
    for r in rows:
        assert abs(r["decay_score"]) <= bounds[r["user_id"]] + 1e-6


def test_funnel_strict3_stage_timestamps_are_ordered(spark, sf_dir):
    rows = all_queries()["q_funnel_strict3"].fn(spark, sf_dir).collect()
    assert rows
    stages = {1: 0, 2: 0, 3: 0}
    for r in rows:
        stages[r["stage_reached"]] += 1
        if r["stage_reached"] >= 2:
            assert r["click_ts"] >= r["signup_ts"]
        else:
            assert r["click_ts"] is None
        if r["stage_reached"] == 3:
            assert r["purchase_ts"] >= r["click_ts"]
        else:
            assert r["purchase_ts"] is None
    assert stages[3] > 0  # the synthetic events do convert


def test_cross_val_folds_cover_corpus_without_leakage(spark, sf_dir):
    """Folds partition the corpus; duplicate contents never straddle a fold
    boundary (checked directly on the underlying assignment)."""
    from flink_job_spark.queries.prep import CV_FOLDS
    from flink_job_spark.functions.text import norm_text

    d = load_table(spark, sf_dir, "documents")
    rows = all_queries()["q_cross_val_folds"].fn(spark, sf_dir).collect()
    assert {r["fold"] for r in rows} <= set(range(CV_FOLDS))
    assert sum(r["n_docs"] for r in rows) == d.count()
    # leakage check: every content key maps to exactly one fold
    key = F.md5(norm_text("text"))
    fold = (F.conv(F.substring(F.md5(key), 1, 8), 16, 10)
            .cast("bigint") % CV_FOLDS).cast("int")
    straddlers = (d.select(key.alias("k"), fold.alias("f")).distinct()
                   .groupBy("k").count().filter(F.col("count") > 1).count())
    assert straddlers == 0


def test_media_ahash_pairs_verify_against_hashes(spark, sf_dir):
    """Every mined pair must actually be within the Hamming budget of the
    per-image hashes, and every within-budget pair SHARING A BAND must be
    found (the documented LSH recall contract)."""
    from flink_job_spark.queries.multimodal import (
        AHASH_BANDS, AHASH_HAMMING_MAX)

    hashes = {r["media_id"]: r["ahash_bits"]
              for r in all_queries()["q_media_ahash"].fn(spark, sf_dir).collect()}
    got = {(r["m1"], r["m2"]): r["hamming"]
           for r in all_queries()["q_media_ahash_pairs"].fn(spark, sf_dir).collect()}

    def ham(a, b):
        return sum(x != y for x, y in zip(a, b))

    def shares_band(a, b):
        return any(a[16 * i:16 * (i + 1)] == b[16 * i:16 * (i + 1)]
                   for i in range(AHASH_BANDS))

    for (m1, m2), h in got.items():
        assert h == ham(hashes[m1], hashes[m2])
        assert h <= AHASH_HAMMING_MAX
    import itertools
    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(hashes), 2)
        if ham(hashes[a], hashes[b]) <= AHASH_HAMMING_MAX
        and shares_band(hashes[a], hashes[b])
    }
    assert set(got) == expected


def test_hits_matches_python_power_iteration(spark, sf_dir):
    """auth1/auth2 re-derived by a dict-based two-step power iteration over
    the same distinct edge set — integer-exact, so equality is ==, no
    tolerance."""
    from flink_job_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = {
        (r["o_custkey"] * 2, r["l_suppkey"] * 2 + 1)
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"]).collect()
    }
    auth1: dict[int, int] = {}
    for s, t in edges:
        auth1[t] = auth1.get(t, 0) + 1
    hub1: dict[int, int] = {}
    for s, t in edges:
        hub1[s] = hub1.get(s, 0) + auth1[t]
    auth2: dict[int, int] = {}
    for s, t in edges:
        auth2[t] = auth2.get(t, 0) + hub1[s]

    from flink_job_spark.queries.analytics import HITS_TOPK

    want = sorted(auth2.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOPK]
    rows = all_queries()["q_hits_scores"].fn(spark, sf_dir).collect()
    got = [(r["node"], r["auth2"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == want
    for r in rows:
        assert r["auth1"] == auth1[r["node"]]
