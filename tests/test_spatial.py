"""grid_close_pairs unit properties: floor-cell correctness on NEGATIVE
coordinates (ADVICE r3: true-division + bigint cast truncates toward zero,
doubling cell 0 and dropping cross-origin close pairs) vs a brute-force
quadratic oracle."""

from __future__ import annotations

import itertools


def _brute(pts, dist):
    out = set()
    for (ak, ax, ay), (bk, bx, by) in itertools.combinations(pts, 2):
        if (ax - bx) ** 2 + (ay - by) ** 2 <= dist * dist:
            out.add((min(ak, bk), max(ak, bk)))
    return out


def test_grid_close_pairs_negative_coords_match_brute(spark):
    from flink_job_spark.operators.spatial import grid_close_pairs

    # hash-scatter points straddling the origin in all four quadrants,
    # plus deliberate cross-origin near pairs
    pts = [(i, ((i * 2654435761) % 199) - 99,
               ((i * 40503) % 199) - 99) for i in range(160)]
    pts += [(1000, -1, -1), (1001, 1, 1), (1002, -2, 3), (1003, 3, -2)]
    df = spark.createDataFrame(pts, "ck long, x long, y long")
    got = {(r["a_ck"], r["b_ck"])
           for r in grid_close_pairs(df, grid=8, dist=8).collect()}
    want = _brute(pts, 8)
    assert got == want
    assert want, "vacuous test: no close pairs generated"
    # the specific truncation bug: pairs crossing cell boundaries at 0
    assert (1000, 1001) in got


def test_grid_close_pairs_cell_is_floor_division(spark):
    """Points at -1 and +1 with grid 10 must land in DIFFERENT home cells
    (-1 and 0) yet still pair via the 1-ring — floor, not trunc-to-zero."""
    from flink_job_spark.operators.spatial import grid_close_pairs
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, -1, 0), (2, 1, 0)], "ck long, x long, y long")
    cells = (df.select(
        F.expr("(x - pmod(x, 10)) div 10").alias("cx")).collect())
    assert sorted(c["cx"] for c in cells) == [-1, 0]
    pairs = grid_close_pairs(df, grid=10, dist=5).collect()
    assert len(pairs) == 1 and (pairs[0]["a_ck"], pairs[0]["b_ck"]) == (1, 2)
