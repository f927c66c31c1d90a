"""Grid-bucketed spatial candidate generation.

The blocking pattern every radius join uses (geo points, embedding LSH
cells, visual-hash bands): with cell size >= radius, any pair within the
radius differs by at most 1 in each cell coordinate, so "explode side A to
its 3x3 cell neighborhood, equi-join side B on its home cell" is a
COMPLETE and NON-DUPLICATING candidate generator — each close pair is
found exactly once because a point has exactly one home cell. Candidates
are bounded by local density x n, never n^2.

Shared by queries/relational.py::q_spatial_close_pairs (the registry key)
and tools/spatial_ab.py (the BASELINE.md scale evidence), so the recorded
linear-vs-quadratic numbers always describe the shipped plan.

Scale note (the 100 TB story): the only data-sized move is the (cell)
hash equi-join of 9n exploded rows vs n home rows; a hot cell degrades it
exactly like a hot join key degrades any join and calls for the same
mitigation (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_close_pairs(points: DataFrame, grid: int, dist: int,
                     payload: list[str] = ()) -> DataFrame:
    """points: (ck, x, y [, payload...]) with int64 coords. Returns one row
    per unordered pair within `dist` (a_ck < b_ck), carrying a-side payload
    columns prefixed ``a_``. Requires grid >= dist (asserted) — the 1-ring
    completeness guarantee."""
    if grid < dist:
        raise ValueError(f"grid {grid} must be >= dist {dist} for 1-ring "
                         "completeness")
    # Pure-integer floor division: (x - pmod(x, g)) div g == floor(x / g)
    # computed entirely in int64 — correct for NEGATIVE coords (true-division
    # + bigint cast truncates toward zero, doubling cell 0's width) and exact
    # for |coord| > 2^53 (double rounding could shift a point's cell and
    # silently drop close pairs). Supported range: coord > LONG_MIN + grid
    # (the subtraction must not underflow); asserted cheap via the docstring
    # contract, not a runtime scan.
    cell = [F.expr(f"(x - pmod(x, {int(grid)})) div {int(grid)}").alias("cx"),
            F.expr(f"(y - pmod(y, {int(grid)})) div {int(grid)}").alias("cy")]
    nbr = F.explode(F.array(*[
        F.struct((F.col("cx") + dx).alias("jx"), (F.col("cy") + dy).alias("jy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("nb")
    a = (points.select("ck", "x", "y", *payload, *cell)
               .select("ck", "x", "y", *payload, nbr)
               .select(F.col("ck").alias("a_ck"), F.col("x").alias("a_x"),
                       F.col("y").alias("a_y"),
                       *[F.col(c).alias(f"a_{c}") for c in payload],
                       F.col("nb.jx").alias("jx"), F.col("nb.jy").alias("jy")))
    b = (points.select(F.col("ck").alias("b_ck"), F.col("x").alias("b_x"),
                       F.col("y").alias("b_y"), *cell)
               .withColumnRenamed("cx", "jx").withColumnRenamed("cy", "jy"))
    dx, dy = F.col("a_x") - F.col("b_x"), F.col("a_y") - F.col("b_y")
    return (a.join(b, ["jx", "jy"])
             .filter((F.col("a_ck") < F.col("b_ck"))
                     & (dx * dx + dy * dy <= dist * dist)))
