"""Scale evidence for the grid-bucketed spatial join (q_spatial_close_pairs).

Measures close-pair counting at CONSTANT point density (the honest way
spatial data grows: more area, same local density) across n = 10k .. 10M
points, comparing:

  naive : self cross-join + distance filter — O(n^2) candidate pairs
  grid  : 3x3-neighborhood explode + home-cell equi-join — O(n * density)

Run isolated (no other Spark process):
    PYTHONPATH=/root/repo python tools/spatial_ab.py
Results land in stdout as a markdown table to paste into BASELINE.md.

The expectation this records: naive time grows ~9x when n grows 3x
(quadratic), grid time grows ~linearly in n, and both agree on the pair
count exactly (int64 distances, no floats).
"""

from __future__ import annotations

import math
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

GRID = 200
DIST = 150
DENSITY = 6e-4          # points per unit^2  (~24 points per 200x200 cell)


def points(spark: SparkSession, n: int):
    side = int(math.sqrt(n / DENSITY))
    ids = spark.range(n).select(F.col("id").alias("ck"))

    def coord(axis: str):
        from flink_job_spark.functions.hashing import md5_u32
        return md5_u32(F.concat(F.lit(axis + "|"),
                                F.col("ck").cast("string"))) % side

    return ids.select("ck", coord("x").alias("x"), coord("y").alias("y")), side


def grid_pairs(p):
    from flink_job_spark.operators.spatial import grid_close_pairs
    return grid_close_pairs(p, GRID, DIST).count()


def naive_pairs(p):
    a = p.select(F.col("ck").alias("a_ck"), F.col("x").alias("a_x"),
                 F.col("y").alias("a_y"))
    b = p.select(F.col("ck").alias("b_ck"), F.col("x").alias("b_x"),
                 F.col("y").alias("b_y"))
    dx, dy = F.col("a_x") - F.col("b_x"), F.col("a_y") - F.col("b_y")
    return (a.crossJoin(b)
             .filter((F.col("a_ck") < F.col("b_ck"))
                     & (dx * dx + dy * dy <= DIST * DIST))
             .count())


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "-1")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n, run_naive in [(10_000, True), (30_000, True), (100_000, False),
                         (1_000_000, False), (10_000_000, False)]:
        p, side = points(spark, n)
        p = p.persist()
        n_cnt = p.count()
        t0 = time.time()
        g = grid_pairs(p)
        tg = time.time() - t0
        tn = cn = None
        if run_naive:
            t0 = time.time()
            cn = naive_pairs(p)
            tn = time.time() - t0
            assert cn == g, (cn, g)
        p.unpersist()
        rows.append((n_cnt, side, g, tg, tn))
        print(f"n={n_cnt:>10,} side={side:>7,} pairs={g:>10,} "
              f"grid={tg:7.2f}s naive={'%.2fs' % tn if tn else '—':>9}",
              flush=True)
    print("\n| n points | area side | close pairs | grid join | naive join |")
    print("| --- | --- | --- | --- | --- |")
    for n_cnt, side, g, tg, tn in rows:
        print(f"| {n_cnt:,} | {side:,} | {g:,} | {tg:.2f} s | "
              f"{('%.2f s' % tn) if tn else 'infeasible (skipped)'} |")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
