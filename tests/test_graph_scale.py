"""Small-scale regression guards for the BASELINE.md graph/dedup A/B claims
(tools/graph_ab.py, tools/dedup_ab.py): the round-count laws and the
LSH-candidate-reduction law must hold structurally, not just in the recorded
wall-clocks. If an edit to the operators breaks a law, these fail long
before anyone re-runs the big harnesses."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _chain(spark, n_nodes: int, chain_len: int):
    pairs = (spark.range(n_nodes)
             .filter(F.pmod("id", F.lit(chain_len)) != chain_len - 1)
             .select(F.col("id").alias("d1"), (F.col("id") + 1).alias("d2")))
    docs = spark.range(n_nodes).select(F.col("id").alias("doc_id"))
    return docs, pairs


def _labels(df) -> dict:
    return {r["doc_id"]: r["component"] for r in df.collect()}


def test_minlabel_rounds_equal_diameter_star_rounds_log(spark):
    """On chains of length 16: min-label needs ~diameter rounds (15 hops for
    the min label to reach the far end, +1 to detect the fixpoint), star
    contraction O(log n). Both must produce identical components."""
    from flink_job_spark.queries.dedup import (connected_components,
                                               connected_components_star)

    docs, pairs = _chain(spark, 64, 16)
    s1: dict = {}
    s2: dict = {}
    lab = _labels(connected_components(docs, pairs, max_iters=30, stats=s1))
    star = _labels(connected_components_star(docs, pairs, max_iters=30,
                                             stats=s2))
    assert lab == star
    assert len(set(lab.values())) == 4        # 64 nodes / 16-chains
    assert all(lab[d] == (d // 16) * 16 for d in lab)
    # diameter law: 15 propagation rounds + 1 fixpoint-detect round
    assert s1["rounds"] == 16, s1
    # star law: O(log n) with a small constant, far under the diameter
    assert s2["rounds"] <= math.ceil(math.log2(16)) + 2, s2
    assert s2["rounds"] < s1["rounds"]


def test_star_rounds_flat_on_shallow_clusters(spark):
    """On diameter-2 star clusters (the near-dup shape) BOTH variants
    converge in a scale-independent handful of rounds — the property that
    makes them 100 TB-viable on real dedup graphs."""
    from flink_job_spark.queries.dedup import (connected_components,
                                               connected_components_star)

    # 40 clusters x 25 members, member m of cluster c linked to rep node c
    pairs = (spark.range(1000)
             .select((F.col("id") + 40).alias("d1"),
                     F.pmod("id", F.lit(40)).alias("d2")))
    docs = (pairs.select(F.col("d1").alias("doc_id"))
            .union(pairs.select("d2")).distinct())
    s1: dict = {}
    s2: dict = {}
    lab = _labels(connected_components(docs, pairs, max_iters=10, stats=s1))
    star = _labels(connected_components_star(docs, pairs, max_iters=10,
                                             stats=s2))
    assert lab == star
    assert len(set(lab.values())) == 40
    assert s1["rounds"] <= 3 and s2["rounds"] <= 3, (s1, s2)


def test_lsh_candidates_shrink_vs_all_pairs_with_planted_recall(spark):
    """The dedup_ab corpus law at test scale: LSH candidates are orders of
    magnitude below n(n-1)/2, and the planted near-dups (Jaccard ~0.73)
    are recalled at >= the banded-minhash expectation."""
    from flink_job_spark.queries.dedup import minhash_lsh_pairs

    n, vocab = 400, 200_000
    word = ("CASE WHEN id % 10 = 1 AND j IN (3, 17) "
            f"THEN concat('w', pmod(xxhash64(id * 64 + j + 1000000), {vocab})) "
            "ELSE concat('w', pmod(xxhash64((id - CASE WHEN id % 10 = 1 "
            f"THEN 1 ELSE 0 END) * 64 + j), {vocab})) END")
    docs = (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    F.expr("array_join(transform(sequence(0, 39), "
                           f"j -> {word}), ' ')").alias("text")))
    stats: dict = {}
    verified = minhash_lsh_pairs(docs, stats=stats).persist()
    n_verified = verified.count()
    n_cand = stats["candidates"].count()
    all_pairs = n * (n - 1) // 2
    planted = (spark.range(n).filter("id % 10 = 1")
               .select((F.col("id") - 1).alias("d1"), F.col("id").alias("d2")))
    n_planted = planted.count()
    hit = verified.join(planted, ["d1", "d2"]).count()
    verified.unpersist()
    assert n_cand * 50 < all_pairs, (n_cand, all_pairs)
    # banded-minhash expectation 1-(1-J^2)^4 ~ 0.95 at J~0.73; allow slack
    assert hit >= 0.8 * n_planted, (hit, n_planted)
    # verify step keeps only real near-dups: no flood of false positives
    assert n_verified <= n_cand
    assert n_verified >= hit


def test_pagerank_deep_iterations_checkpoint_bounded(spark):
    """50 supersteps on a small chain graph (r5, VERDICT r4 #2): the loop
    must (a) complete — pre-checkpoint lineage stalled the identical shape
    past ~15 rounds, (b) keep total rank mass ~1, and (c) not accumulate
    checkpoint blocks: at CC_CHECKPOINT_EVERY=8 the loop retains at most
    ONE live checkpoint's RDDs (each release fires when the next lands)."""
    from flink_job_spark.queries.analytics import pagerank_ranks
    from flink_job_spark.queries.dedup import CC_CHECKPOINT_EVERY
    from flink_job_spark.session import persistent_rdd_ids, unpersist_all

    unpersist_all(spark)
    base = persistent_rdd_ids(spark)
    pairs = (spark.range(64).filter(F.pmod("id", F.lit(16)) != 15)
             .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst")))
    sym = pairs.union(pairs.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    r = pagerank_ranks(sym, iters=50).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("rank"), 3).alias("mass")).collect()[0]
    assert r["n"] == 64
    assert abs(r["mass"] - 1.0) < 0.01
    # live persisted RDDs: the edges persist + at most one checkpoint
    # generation — NOT one per 8 iterations (50/8 = 6 checkpoints fired)
    live = persistent_rdd_ids(spark) - base
    assert len(live) <= 3, f"checkpoint blocks accumulate: {len(live)} live"
    assert CC_CHECKPOINT_EVERY == 8
    unpersist_all(spark)


def test_bfs_deep_hops_checkpoint_bounded(spark):
    """A 33-hop BFS walks a 32-long chain end to end (r5): every level
    must be present exactly once per node, and the checkpoint cadence must
    not leak — persisted frames at the end are the per-level frontiers
    plus at most one live checkpoint generation."""
    from flink_job_spark.queries.analytics import bfs_levels
    from flink_job_spark.session import persistent_rdd_ids, unpersist_all

    unpersist_all(spark)
    base = persistent_rdd_ids(spark)
    n, clen = 64, 32
    pairs = (spark.range(n).filter(F.pmod("id", F.lit(clen)) != clen - 1)
             .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b")))
    seeds = (spark.range(n).filter(F.pmod("id", F.lit(clen)) == 0)
             .select(F.col("id").alias("node")))
    out = bfs_levels(pairs, seeds, clen + 1)
    got = {(r["node"], r["lvl"]) for r in out.collect()}
    # node k of chain c sits at level k - 32c exactly
    assert got == {(k, k % clen) for k in range(n)}
    live = persistent_rdd_ids(spark) - base
    # sym + level0 + one frontier per hop (33) + <= one checkpoint gen (2)
    assert len(live) <= 2 + (clen + 1) + 2, f"{len(live)} live RDDs"
    unpersist_all(spark)


def test_label_propagation_deep_iterations_checkpoint_bounded(spark):
    """25 LPA supersteps on two disjoint 16-chains: the loop must (a)
    complete (same lineage-stall shape as pagerank/min-label — synchronous
    LPA legitimately OSCILLATES on path graphs, so a fixed deep iteration
    count is exactly the reuse case), (b) agree NODE-FOR-NODE with a plain
    Python twin of the update rule (majority neighbor label, tie -> min),
    and (c) retain at most one live checkpoint generation."""
    from collections import Counter

    from flink_job_spark.queries.analytics import label_propagation_labels
    from flink_job_spark.session import persistent_rdd_ids, unpersist_all

    unpersist_all(spark)
    base = persistent_rdd_ids(spark)
    pairs = (spark.range(32).filter(F.pmod("id", F.lit(16)) != 15)
             .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst")))
    sym = pairs.union(pairs.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
    rows = label_propagation_labels(sym, iters=25).collect()
    assert len(rows) == 32
    got = {r["node"]: r["label"] for r in rows}
    assert len(got) == 32

    # independent sequential twin of the synchronous update rule
    nbrs = {v: [] for v in range(32)}
    for v in range(32):
        if v % 16 != 15:
            nbrs[v].append(v + 1)
            nbrs[v + 1].append(v)
    labels = {v: v for v in range(32)}
    for _ in range(25):
        nxt = {}
        for v in range(32):
            cnt = Counter(labels[u] for u in nbrs[v])
            top = max(cnt.values())
            nxt[v] = min(l for l, c in cnt.items() if c == top)
        labels = nxt
    assert got == labels
    # labels never cross components
    assert all(lab < 16 for v, lab in got.items() if v < 16)
    assert all(lab >= 16 for v, lab in got.items() if v >= 16)

    live = persistent_rdd_ids(spark) - base
    assert len(live) <= 3, f"checkpoint blocks accumulate: {len(live)} live"
    unpersist_all(spark)
