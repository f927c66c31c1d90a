"""Graph-operator scale A/B evidence (VERDICT r3 item 1).

The four most expensive bench keys are iterative graph plans (q_pagerank,
q_bfs_reach, q_dedup_components, q_dedup_components_star), but until this
harness their 100 TB story was argued, not measured. Mirrors the skew/spatial
A/B pattern: generate synthetic graphs 10-100x the bench graph (sf0.1's
customer-supplier graph has ~100k distinct edges), materialize to parquet so
every variant reads identical bytes, and wall-clock the SHIPPED operators
(imported, not reimplemented):

1. **Components, shallow clustered graph** (the near-dup shape: power-law
   cluster sizes, diameter 2) at 1M/4M/16M edges: min-label loop
   (connected_components) vs large/small-star contraction
   (connected_components_star). Expectation to verify: min-label wins on
   shallow graphs (fewest Spark jobs per round, rounds = diameter), and both
   scale near-linearly in |E|.
2. **Components, deep chains** (diameter 32): the shape min-label is
   documented to lose — rounds = diameter vs O(log n) star rounds. The
   honest when-to-use-which measurement.
3. **BFS** (bfs_levels, 3 hops) at the same three scales: wall-clock
   linearity in |E|.
4. **PageRank supersteps** (pagerank_ranks, 3 iterations) at the same three
   scales: wall-clock linearity in |E| (each superstep = one join shuffle +
   one combine-enabled agg shuffle).

Every components variant pair is cross-checked for identical clustering
(component-count + membership checksum) before its timing counts.

Usage:  python tools/graph_ab.py          # prints one JSON line per cell
Env:    GRAPH_AB_SIZES=1000000,4000000,16000000  GRAPH_AB_DIR=/tmp/graph_ab
Results recorded in BASELINE.md ("Graph A/B evidence"). Run in isolation
(no concurrent Spark processes), like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_job_spark.queries.analytics import bfs_levels, pagerank_ranks  # noqa: E402
from flink_job_spark.queries.dedup import (  # noqa: E402
    connected_components,
    connected_components_star,
)
from flink_job_spark.session import get_spark, unpersist_all  # noqa: E402

SIZES = [int(s) for s in os.environ.get(
    "GRAPH_AB_SIZES", "1000000,4000000,16000000").split(",")]
# 1M nodes: the chain cell's subject is ROUND COUNT (diameter vs O(log n)),
# not volume — at 4M nodes the 31-round min-label loop additionally hits
# driver-side lineage-analysis stall (exactly the failure mode the star
# variant's localCheckpoint avoids; documented in BASELINE.md), so the
# measured cell stays at a size where BOTH variants terminate.
CHAIN_NODES = int(os.environ.get("GRAPH_AB_CHAIN_NODES", "1000000"))
CHAIN_LEN = 32           # component diameter: min-label needs ~31 rounds
N_CLUSTER_DIV = 40       # avg cluster size (power-law distributed)
CELLS = os.environ.get("GRAPH_AB_CELLS", "clustered,chains").split(",")


def materialize(spark, base: str) -> dict[str, str]:
    """Write each graph once; all variants then read identical parquet."""
    paths = {}
    for n in SIZES:
        p = f"{base}/clustered_{n}"
        paths[f"clustered_{n}"] = p
        if not os.path.exists(f"{p}/_SUCCESS"):
            nc = n // N_CLUSTER_DIV
            # power-law cluster sizes: u^3 densifies low cluster ids (the
            # hash-derived-not-LCG rule: md5/xxhash uniforms, no lattices)
            u = (F.pmod(F.xxhash64("id"), F.lit(1_000_003)).cast("double")
                 / 1_000_003.0)
            c = F.floor(F.pow(u, F.lit(3.0)) * nc).cast("long")
            # star to the cluster rep (node id = nc + member id keeps rep ids
            # disjoint from member ids): diameter-2 components, like near-dup
            # clusters around a canonical doc
            (spark.range(n)
                  .select((F.col("id") + nc).alias("d1"), c.alias("d2"))
                  .write.mode("overwrite").parquet(p))
    p = f"{base}/chains_{CHAIN_NODES}"
    paths["chains"] = p
    if not os.path.exists(f"{p}/_SUCCESS"):
        (spark.range(CHAIN_NODES)
              .filter(F.pmod("id", F.lit(CHAIN_LEN)) != CHAIN_LEN - 1)
              .select(F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
              .write.mode("overwrite").parquet(p))
    return paths


def cc_checksum(labels) -> tuple:
    r = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("component").alias("ncomp"),
        F.coalesce(F.expr("bit_xor(xxhash64(doc_id, component))"),
                   F.lit(0)).alias("h"),
    ).collect()[0]
    return (r["n"], r["ncomp"], r["h"])


def timed_cc(spark, label, fn, docs, pairs, max_iters) -> tuple:
    unpersist_all(spark)
    stats: dict = {}
    t0 = time.perf_counter()
    chk = cc_checksum(fn(docs, pairs, max_iters=max_iters, stats=stats))
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"variant": label, "sec": dt,
                      "rounds": stats.get("rounds"),
                      "n_nodes": chk[0], "n_components": chk[1]}), flush=True)
    return dt, chk


def timed_action(spark, label, thunk) -> float:
    unpersist_all(spark)
    t0 = time.perf_counter()
    extra = thunk()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"variant": label, "sec": dt, **(extra or {})}),
          flush=True)
    return dt


def main() -> None:
    spark = get_spark("graph-ab",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    base = os.environ.get("GRAPH_AB_DIR", "/tmp/graph_ab")
    os.makedirs(base, exist_ok=True)
    paths = materialize(spark, base)

    # 1+3+4: clustered graphs at three scales
    for n in (SIZES if "clustered" in CELLS else []):
        pairs = spark.read.parquet(paths[f"clustered_{n}"])
        docs = (pairs.select(F.col("d1").alias("doc_id"))
                .union(pairs.select("d2")).distinct())
        t_lab, chk_lab = timed_cc(spark, f"cc_minlabel_clustered_{n}",
                                  connected_components, docs, pairs, 15)
        t_star, chk_star = timed_cc(spark, f"cc_star_clustered_{n}",
                                    connected_components_star, docs, pairs, 15)
        assert chk_lab == chk_star, (
            f"variant disagreement at n={n}: {chk_lab} vs {chk_star}")

        edges = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        seeds = pairs.select(F.col("d2").alias("node")).distinct().limit(1000)

        def bfs_thunk(edges=edges, seeds=seeds):
            out = (bfs_levels(edges, seeds, 3)
                   .groupBy("lvl").count().collect())
            return {"levels": {int(r["lvl"]): int(r["count"]) for r in out}}

        timed_action(spark, f"bfs_3hop_clustered_{n}", bfs_thunk)

        sym = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        sym = sym.union(sym.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))

        def pr_thunk(sym=sym):
            r = pagerank_ranks(sym, iters=3).agg(
                F.count(F.lit(1)), F.round(F.sum("rank"), 3)).collect()[0]
            return {"n_nodes": int(r[0]), "rank_mass": float(r[1])}

        timed_action(spark, f"pagerank_3iter_clustered_{n}", pr_thunk)

    # 2: deep chains — the shape that separates the two components plans
    if "chains" in CELLS:
        pairs = spark.read.parquet(paths["chains"])
        docs = (pairs.select(F.col("d1").alias("doc_id"))
                .union(pairs.select("d2")).distinct())
        t_lab, chk_lab = timed_cc(spark, f"cc_minlabel_chain{CHAIN_LEN}",
                                  connected_components, docs, pairs,
                                  CHAIN_LEN + 5)
        t_star, chk_star = timed_cc(spark, f"cc_star_chain{CHAIN_LEN}",
                                    connected_components_star, docs, pairs, 15)
        assert chk_lab == chk_star, (
            f"chain variant disagreement: {chk_lab} vs {chk_star}")

    # 5 (r5, VERDICT r4 #2): DEEP-iteration cells for the exported loops —
    # 50 PageRank supersteps and a full 32-hop BFS on the chain graph.
    # Before the checkpoint-every-8 cadence landed in pagerank_ranks /
    # bfs_levels, the identical lineage shape stalled min-label components
    # past ~15 driver rounds; these cells prove the loops now complete with
    # per-iteration cost that stays FLAT (the stall showed as super-linear
    # driver time, not executor time).
    if "deep" in CELLS:
        pairs = spark.read.parquet(paths["chains"])
        edges = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        # chain heads (id % CHAIN_LEN == 0): a 32-hop frontier walks every
        # chain end to end — max_hops equals the graph diameter
        seeds = (pairs.select(F.col("d1").alias("node"))
                 .filter(F.pmod("node", F.lit(CHAIN_LEN)) == 0)
                 .limit(1000))

        def bfs_deep_thunk(edges=edges, seeds=seeds):
            out = (bfs_levels(edges, seeds, CHAIN_LEN)
                   .groupBy().agg(F.count(F.lit(1)).alias("n"),
                                  F.max("lvl").alias("max_lvl")).collect()[0])
            return {"n_nodes": int(out["n"]), "max_lvl": int(out["max_lvl"])}

        timed_action(spark, f"bfs_{CHAIN_LEN}hop_chain", bfs_deep_thunk)

        sym = pairs.select(F.col("d1").alias("src"), F.col("d2").alias("dst"))
        sym = sym.union(sym.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))

        def pr_deep_thunk(sym=sym, iters=50):
            r = pagerank_ranks(sym, iters=iters).agg(
                F.count(F.lit(1)), F.round(F.sum("rank"), 3)).collect()[0]
            return {"n_nodes": int(r[0]), "rank_mass": float(r[1]),
                    "iters": iters}

        timed_action(spark, "pagerank_50iter_chain", pr_deep_thunk)

    spark.stop()


if __name__ == "__main__":
    main()
