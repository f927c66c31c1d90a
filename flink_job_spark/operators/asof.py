"""As-of (point-in-time) join — the time-series operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
``right_ts <= left_ts``. The naive formulation is a range join (quadratic
blow-up per key); this is the scalable union-merge form:

1. tag both sides and UNION them (right rows sort before left rows at equal
   timestamps, so same-instant matches are included),
2. ONE shuffle on the key, sort within partitions by (ts, tag),
3. running ``last(ignorenulls=True)`` over rows-unbounded-preceding carries
   each right row's payload forward to every following left row,
4. keep the left rows.

Cost at any scale: one hash shuffle + one sort per partition — the same shape
as a groupBy, independent of time-range density. This is the standard
point-in-time-correct join for training-data assembly (features as-of label
time, no leakage from the future).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` payload at or
    before its timestamp (NULLs when no prior right row exists).

    ``right`` should be unique per (key, right_ts) — pre-aggregate it if not,
    or the carried payload at duplicate timestamps is nondeterministic.
    Output: all left columns + ``{prefix}ts`` + ``{prefix}<payload>``.
    """
    from pyspark.sql import types as T

    payload = right_payload if right_payload is not None else [
        c for c in right.columns if c not in (key, right_ts)
    ]

    # The right row travels as ONE struct so the carried match is atomic:
    # per-column last(ignorenulls=True) would resurrect an OLDER row's value
    # for any column the latest row holds as NULL, emitting a chimera of
    # several right rows instead of the as-of row (with its NULLs intact).
    row_struct_t = T.StructType(
        [T.StructField("ts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload])
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(F.col(right_ts).alias("ts"),
                 *[F.col(c) for c in payload]).alias("__r"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(row_struct_t).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    merged = r.unionByName(l)

    w = (Window.partitionBy(key)
               .orderBy("__ts", "__tag")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = merged.select(
        "*",
        F.last("__r", ignorenulls=True).over(w).alias("__asof"),
    )
    return carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__asof.ts").alias(f"{prefix}ts"),
        *[F.col(f"__asof.{c}").alias(f"{prefix}{c}") for c in payload],
    )
