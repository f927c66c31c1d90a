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


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    prefix: str = "near_",
) -> DataFrame:
    """Nearest as-of join: every ``left`` row + the ``right`` row whose
    timestamp is CLOSEST in either direction (ties to the earlier right
    row). Composition of the backward carry and the forward carry (the
    negated-micros coordinate flip), then a pure Column pick of the
    smaller absolute gap — all three as-of directions share the one
    audited union-merge operator. ``right`` should be unique per
    (key, right_ts), like asof_join."""
    payload = right_payload if right_payload is not None else [
        c for c in right.columns if c not in (key, right_ts)
    ]

    def us(c):
        # tz-free epoch micros: timestampdiff over TIMESTAMP_NTZ never
        # routes through the session timezone, so ordering and gaps stay
        # monotonic even under a DST session tz (an LTZ->NTZ cast of an
        # LTZ input still renders via the session tz — this operator
        # follows the repo's NTZ-everywhere convention, SURVEY §1.2)
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" CAST({c} AS TIMESTAMP_NTZ))")

    back = asof_join(left, right, key, left_ts, right_ts, payload,
                     prefix="__nb_")
    right_neg = right.select(
        F.col(key), *[F.col(c) for c in payload],
        F.col(right_ts).alias("__nr_ts"),
        (-us(right_ts)).alias("__nn_ts"))
    both = asof_join(back.withColumn("__nn_ts", -us(left_ts)),
                     right_neg, key, "__nn_ts", "__nn_ts",
                     payload + ["__nr_ts"], prefix="__nf_")
    gap_prev = us(left_ts) - us("__nb_ts")
    gap_next = us("__nf___nr_ts") - us(left_ts)
    use_prev = (F.col("__nb_ts").isNotNull()
                & (F.col("__nf___nr_ts").isNull() | (gap_prev <= gap_next)))
    near_ts = F.when(use_prev, F.col("__nb_ts")) \
               .otherwise(F.col("__nf___nr_ts"))
    return both.select(
        *[F.col(c) for c in left.columns],
        near_ts.alias(f"{prefix}ts"),
        *[F.when(use_prev, F.col(f"__nb_{c}")).otherwise(F.col(f"__nf_{c}"))
           .alias(f"{prefix}{c}") for c in payload],
    )
